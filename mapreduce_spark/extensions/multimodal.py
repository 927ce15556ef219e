"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Pandas-UDF decode/feature plumbing.

The container has no image/audio libraries, so the *decode* step is
stubbed (import-gated ``NotImplementedError`` / deterministic fake),
but everything Spark-side is real and tested: the media schema, the
``mapInPandas`` batch shape (Arrow ``bytes`` in, fixed-width feature
vectors out), and the partitioning story (feature extraction is a
narrow map — repartition ONLY to right-size batches for accelerator
feeders, never for correctness).

At 100 TB the binary column dominates I/O: keep media in its own
parquet files (column pruning means metadata-only queries never touch
the bytes), and size ``spark.sql.files.maxPartitionBytes`` so one task
holds a few hundred MB of payload.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType(), True),
            T.StructField("n_bytes", T.LongType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_sum_mod", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Demo media table: the text payload as a binary column.  Stands
    in for real image/audio bytes so the binary plumbing is testable
    with the shipped fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "UTF-8").alias("data"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode("text", "UTF-8")).cast("long").alias(
                "n_bytes"
            ),
        ).alias("meta"),
    )


def decode_image(data: bytes):
    """Real decoder — requires an imaging library, absent here."""
    try:
        import PIL.Image  # noqa: F401
        import io
        return PIL.Image.open(io.BytesIO(data))
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decode needs PIL; install pillow on the cluster "
            "and this path lights up unchanged"
        ) from exc


def sample_frames(data: bytes, every_n: int = 30):
    """Video frame sampling — stubbed (no codec libs in container)."""
    raise NotImplementedError(
        "frame sampling needs pyav/ffmpeg; the Spark-side plumbing "
        "(mapInPandas over binary, FEATURE_SCHEMA out) is what this "
        "module tests"
    )


def _fake_features(data: bytes, width: int = 4) -> list[float]:
    """Deterministic stand-in for a real encoder: leading-byte
    aggregates.  Replaced by a model forward pass on a real cluster;
    the Arrow batch shape is identical."""
    if not data:
        return [0.0] * width
    return [
        float(len(data)),
        float(sum(data[:64]) % 9973),
        float(data[0]),
        float(data[-1]),
    ][:width]


def extract_features(media: DataFrame,
                     batch_rows: int = 256) -> DataFrame:
    """Binary → fixed-width feature vectors via mapInPandas.

    One Arrow batch of (media_id, data) in, FEATURE_SCHEMA out.  The
    inner loop is where a real encoder (CLIP/whisper/…) would run;
    ``byte_sum_mod`` is the deterministic fake so tests and oracles
    can check the full pipeline end-to-end.
    """
    src = media.select("media_id", "data")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) if data is not None else b""
                feats = _fake_features(raw)
                out.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(raw),
                        "byte_sum_mod": int(sum(raw) % 9973),
                        "features": feats,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return src.mapInPandas(run, FEATURE_SCHEMA)
