"""Training-data pipeline extensions beyond reference parity.

The reference (pouchdb/mapreduce) has none of these; they are the
"north-star" operators a 100 TB training-data pipeline needs
(SURVEY.md §7.1 step 12), built on the same Spark-first principles as
the core engine: JVM-side expressions, inverted-index / LSH-bucket
joins instead of cross joins, broadcast for small sides, Pandas UDFs
only where Python is genuinely required (multimodal decode).

Modules:
    text        tokenization, shingles, quality scoring, language ID,
                fingerprinting
    dedup       exact, n-gram Jaccard (inverted index), MinHash+LSH,
                SimHash, embedding-cosine near-dup
    similarity  brute-force cosine top-k; random-hyperplane LSH ANN
    multimodal  opaque-binary columns + Pandas-UDF feature plumbing
"""
