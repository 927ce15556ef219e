"""Engine: the public API surface of the PySpark map/reduce view engine.

Mirrors the reference's whole entry-point surface (SURVEY.md §2):

    db.query(fun, opts)  → Engine.query(fun, **opts) -> QueryResult
    db.viewCleanup()     → Engine.view_cleanup()

with ``fun`` one of 'ddoc/view', 'view' (shorthand), a temporary view
definition (MapSpec / (table, python_fn) / {'map':…, 'reduce':…}), and
opts the validated QueryOptions set (reduce, group, group_level, key,
keys, startkey, endkey, inclusive_end, descending, limit, skip,
include_docs, stale, …).

Query lifecycle (SURVEY.md §3 "Spark lifecycle"): validate → resolve
view → refresh (incremental, unless stale) → assemble the LSM view →
DataFrame pipeline: pushdown range filter on key_enc → optional
group/reduce → order → offset/limit → optional doc join → envelope.

Incremental maintenance (M1/M2/X2): the materialized view is a base
(sorted, range-partitioned Parquet) plus an ordered stack of
(tombstone, delta) layers; each refresh maps only changed docs,
tombstones their previous emits by doc id, and appends a layer;
compaction folds layers into a new base version.  ``last_seq`` in the
registry is the exactly-once checkpoint (atomic JSON rename).  At 100 TB
this mirrors an LSM / lakehouse MERGE: refresh cost is O(changes), the
read path adds only broadcast anti-joins against small tombstone sets,
and compaction restores pristine range-pruned scans.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import tempfile
from dataclasses import dataclass
from typing import Any, Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from mapreduce_spark.errors import (
    BuiltInError,
    NotFoundError,
    QueryParseError,
)
from mapreduce_spark.operators.mapphase import (
    VIEW_SCHEMA,
    MapSpec,
    build_view_python_on,
    build_view_structured_on,
)
from mapreduce_spark.operators.query import (
    attach_docs,
    fused_sort,
    query_map,
    query_reduced,
    row_order,
)
from mapreduce_spark.operators.reduce import check_reduce
from mapreduce_spark.plans.registry import Registry, signature
from mapreduce_spark.plans.spec import UNSET, QueryOptions, options_from
from mapreduce_spark.sources.docs import (
    TABLES,
    as_docs,
    doc_id_col,
    doc_json_frame,
    load_table,
)

log = logging.getLogger("mapreduce_spark.engine")

# Minimum total input bytes before a structured build's scan is fanned
# out across the cores (see ``extensions.util.fanout_width``).  Below
# this the serial encode is cheaper than the round-robin exchange plus
# the extra AQE shuffle-stage job it adds (~0.1-0.3 s of scheduler
# round-trip under co-tenant contention — the drift mode
# tests/test_jobcount.py pins against).  1 MiB of parquet is several
# MB decoded ≈ >0.5 s of serial encode, which dominates that overhead.
# Env-tunable for clusters whose scheduling or scan economics differ;
# at real scale the splits>=cores check makes the whole probe a no-op.
_FANOUT_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_FANOUT_MIN_BYTES", 1 << 20)
)


def observed(obs: Observation) -> dict | None:
    """``Observation.get``, tolerating a metrics row that never
    materialized.

    When the observed batch is EMPTY and the plan holds a shuffle above
    the CollectMetrics node (the interpreted map path's repartition, a
    raw table's latest-per-id window), AQE's empty-relation propagation
    can eliminate the whole subtree — CollectMetrics included — so the
    listener never receives a row and ``Observation.get`` trips a JVM
    ``GenericRowWithSchema`` assertion.  That state is observable ONLY
    for an empty input (a non-empty scan always executes the metrics
    node), so callers treat ``None`` as "zero rows seen"."""
    try:
        return obs.get
    except Exception as e:  # Py4JJavaError wrapping the Scala assert
        if "java.lang.AssertionError" in str(e):
            return None
        raise

MAP_RESULT_COLS = [
    "id", "key_json", "value_json", "value_num", "value_num_arr",
]
REDUCED_RESULT_COLS = ["key_json", "value_json", "value_num",
                       "value_num_arr"]


@dataclass
class ViewDef:
    """In-memory view definition: map + reduce + source table."""

    map_def: Any  # MapSpec | list[MapSpec] | (table, python_fn)
    reduce_def: Any = None  # None | '_sum' | '_count' | … | callable

    @property
    def table(self) -> str:
        m = self.map_def
        if isinstance(m, MapSpec):
            return m.table
        if isinstance(m, list):
            return m[0].table
        if hasattr(m, "specs"):  # VariantJSView (compiled raw JS)
            return m.table
        return m[0]

    @property
    def _spec_list(self) -> list | None:
        """MapSpec list when the view is statically structured
        (MapSpec / list of MapSpecs / VariantJSView), else None."""
        m = self.map_def
        if hasattr(m, "specs"):
            m = m.specs
        specs = m if isinstance(m, list) else [m]
        if all(isinstance(s, MapSpec) for s in specs):
            return specs
        return None

    @property
    def _fusable_specs(self) -> list | None:
        """Specs eligible for the fused one-scan ddoc frame: exploded
        (array-emit forEach) specs change row multiplicity per view,
        which the shared emit-array explode cannot express — they
        build/refresh per-view (still fully JVM)."""
        specs = self._spec_list
        if specs is None or any(s.explode is not None for s in specs):
            return None
        return specs

    @property
    def sig(self) -> str:
        return signature(self.map_def, self.reduce_def)

    @property
    def sum_statically_invalid(self) -> bool:
        """True when a structured view emits values that fail the
        upstream ``_sum`` contract BY CONSTRUCTION: any MapSpec with a
        str/bool/obj/link value or no value at all.  These emit
        value_num/value_num_arr as literal-NULL columns, which lets
        Catalyst fold the per-row runtime guard away (when(guard,
        NULL) → NULL, per union branch too) — so the error must be
        static.  Deliberately conservative for multi-emit views: the
        error fires even if the offending emit's where-guard happens
        to match zero docs (upstream would lazily succeed there).
        Dynamic Python/interpreted views return False — their values
        are real columns and the runtime guard handles parity."""
        specs = self._spec_list
        if specs is None:
            return False
        return any(
            s.value is None or s.value[0] not in ("num", "num_arr")
            for s in specs
        )

    @property
    def value_hint(self) -> tuple | None:
        """Static value-shape hint for _sum (('num',) | ('num_arr', w)).

        Derivable only for structured MapSpec views; Python map fns are
        dynamic → None (runtime probe).  Mixed number/array emits widen
        to the max array width (CouchDB sum: a number counts as [n])."""
        specs = self._spec_list
        if specs is None:
            return None
        widths: list[int] = []
        for s in specs:
            if s.value is None:
                return None
            vk = s.value[0]
            if vk == "num":
                widths.append(0)
            elif vk == "num_arr":
                widths.append(len(s.value[1]))
            else:
                return None
        w = max(widths)
        return ("num_arr", w) if w > 0 else ("num",)


class QueryResult:
    """Result envelope: {total_rows, offset, rows} (SURVEY §2 P7)."""

    def __init__(self, df: DataFrame, *, offset: int = 0,
                 total_rows_df: DataFrame | None = None,
                 total_rows_value: int | None = None,
                 reduced: bool = False,
                 update_seq: int | None = None) -> None:
        self.df = df
        self.offset = offset
        self.reduced = reduced
        self._total_df = total_rows_df
        self._total_value = total_rows_value
        # seq the index was built at, when requested (update_seq=True
        # query option; upstream update_seq parity)
        self.update_seq = update_seq

    @property
    def total_rows(self) -> int | None:
        """Total rows in the (unfiltered) view.  Persisted views answer
        from registry statistics maintained at materialization time —
        zero Spark jobs, like the reference's index metadata; only
        unpersisted temporary views fall back to a count job."""
        if self._total_value is not None:
            return self._total_value
        if self._total_df is None:
            return None
        return self._total_df.count()

    def rows(self) -> list[dict]:
        """Collect as reference-shaped row dicts (tests / small results)."""
        out = []
        for r in self.df.collect():
            d = r.asDict()
            row = {"key": json.loads(d["key_json"])}
            row["value"] = (
                json.loads(d["value_json"])
                if d.get("value_json") is not None
                else None
            )
            if "id" in d:
                row["id"] = d["id"]
            if "doc_json" in d:
                row["doc"] = (
                    json.loads(d["doc_json"])
                    if d["doc_json"] is not None
                    else None
                )
            out.append(row)
        return out


class Engine:
    """A PySpark-native CouchDB-style map/reduce view engine."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        storage_dir: str | None = None,
        *,
        compact_after: int = 8,
    ) -> None:
        self.spark = spark
        self.sf_dir = sf_dir
        self.storage_dir = storage_dir or tempfile.mkdtemp(
            prefix="mrviews-"
        )
        self.registry = Registry(self.storage_dir)
        self.compact_after = compact_after
        self._defs: dict[str, ViewDef] = {}

    # ------------------------------------------------------------------
    # design docs
    # ------------------------------------------------------------------

    def put_design(self, ddoc: str, views: dict[str, dict]) -> None:
        """Register views: {name: {'map': …, 'reduce': …}}.

        ``map`` accepts a MapSpec / list of MapSpecs, a ``(table,
        python_fn)`` tuple, or — upstream design-doc parity (F1) — a
        ``(table, "function(doc) {…}")`` JS source pair, compiled to
        MapSpec(s) so JS views run the structured JVM path."""
        reg_views = {}
        for name, v in views.items():
            red = self._normalize_reduce(v.get("reduce"))
            check_reduce(red)
            vd = ViewDef(self._normalize_map(v["map"]), red)
            self._defs[vd.sig] = vd
            reg_views[name] = {"sig": vd.sig}
        self.registry.put_design(ddoc, reg_views)

    def _normalize_map(self, m: Any, *,
                       allow_variant: bool = True) -> Any:
        """Compile JS map sources; pass every other form through.

        Typed tables compile to MapSpec(s) (JVM path, guards pushed
        into the scan) when the source fits the compilable subset;
        out-of-subset sources (``.split()``, loops,
        ``parseInt``, accumulator objects …) fall back to the
        statement-level interpreter over Arrow-batched doc dicts —
        upstream runs arbitrary JS (`[U pouchdb-abstract-
        mapreduce#evalFunc]`), so a compile miss must never be a user
        error.  Raw doc sources compile to drift-guarded Variant
        expressions (functions/jsvariant.py) when sampled inference
        types every referenced field — at 100 TB the per-doc Python
        interpreter is the costliest residual on the build path — and
        interpret otherwise; a contract violation mid-build falls back
        transparently (same signature, see update_view).  Temporary
        views skip the variant tier (``allow_variant=False``): their
        result DataFrame is evaluated by the CALLER, so a drift raise
        there could not be caught and retried engine-side."""
        from mapreduce_spark.functions.jscompile import (
            JSCompileError,
            compile_js_map,
            compile_js_map_fn,
            looks_like_js,
        )

        if looks_like_js(m):
            table, src = m
            t = TABLES.get(table)
            if t is not None and t.raw_json:
                if allow_variant:
                    from mapreduce_spark.functions.jsvariant import (
                        compile_js_map_variant,
                    )

                    try:
                        return compile_js_map_variant(
                            self.spark, self.sf_dir, table, src
                        )
                    except JSCompileError as ce:
                        log.info(
                            "raw-source JS map stays on the "
                            "interpreter tier (%s)", ce,
                        )
                return (table, compile_js_map_fn(src))
            schema = self._load_table(table).schema
            try:
                return compile_js_map(src, table, schema)
            except JSCompileError as ce:
                log.info(
                    "JS map does not fit the compiled subset (%s); "
                    "running interpreted", ce,
                )
                return (table, compile_js_map_fn(src))
        return m

    def _normalize_reduce(self, r: Any) -> Any:
        """Compile a JS reduce source string (upstream ddoc parity, F1/
        A4); pass builtin names / Python callables / None through.

        The common shapes (``sum(values)``, ``values.length``, the
        rereduce-guarded count) lower to JVM-native builtins; the rest
        of the subset runs interpreted through the distributed
        partial/final custom-reduce phases."""
        from mapreduce_spark.functions.jsreduce import (
            compile_js_reduce,
            looks_like_js_reduce,
        )

        if looks_like_js_reduce(r):
            return compile_js_reduce(r)
        return r

    def build_views(self, names: list[str],
                    max_parallel: int = 4) -> None:
        """Materialize several views concurrently.

        Independent views contend only for cluster slots, so building
        them from driver threads lets the Spark scheduler interleave
        their stages (the per-view registry lock still serializes
        same-view builds).  This is the deployment shape for "refresh
        all design docs" — wall time ≈ slowest view, not the sum.
        """
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_parallel) as ex:
            list(ex.map(self.update_view, names))

    def build_ddoc(self, ddoc: str, max_parallel: int = 4) -> None:
        """Materialize ALL views of a design doc — from ONE source
        scan where possible (SURVEY §2 M1; CouchDB builds a ddoc's
        views together, [U couchdb couch_mrview], and at 100 TB the
        scan dominates the build, so N separate per-view scans are
        N−1 wasted passes).

        Structured views (MapSpec / compiled-JS, incl. the variant
        tier) over the SAME table that are on their FIRST build fuse
        into a single job: every view's emits are computed per source
        row (per-emit CASE guards replace the pushed-down WHERE — the
        scan must read rows other views keep anyway), written with one
        range exchange on (view, key_enc) and one partitioned-by-view
        sink whose subdirectories become the per-view base layers.
        Everything else — interpreted views, other tables, incremental
        refreshes — falls back to the per-view path, as does the whole
        group on a raw-doc contract drift.
        """
        views = self.registry.design_views(ddoc)
        fusable: list[tuple[str, ViewDef]] = []
        rest: list[str] = []
        seen_sigs: set[str] = set()
        for name, sig in views.items():
            if sig in seen_sigs:
                # identical definitions share one index (registry
                # contract): build the shared view once
                continue
            seen_sigs.add(sig)
            vdef = self._defs.get(sig)
            entry = self.registry.get_view(sig)
            built = entry is not None and (
                entry.get("base") is not None or entry.get("layers")
            )
            if (
                vdef is not None
                and not built
                and vdef._fusable_specs is not None
            ):
                fusable.append((f"{ddoc}/{name}", vdef))
            else:
                rest.append(f"{ddoc}/{name}")
        by_table: dict[str, list[tuple[str, ViewDef]]] = {}
        for name, vdef in fusable:
            by_table.setdefault(vdef.table, []).append((name, vdef))

        def run_group(group: list[tuple[str, ViewDef]]) -> list[str]:
            """Fuse one table's views; returns the names needing the
            per-view fallback (raw-doc contract drift)."""
            try:
                self._build_fused([v for _, v in group])
                return []
            except Exception as e:
                from mapreduce_spark.functions.jsvariant import (
                    is_drift_error,
                )

                if not is_drift_error(e):
                    raise
                log.warning(
                    "fused ddoc build hit a raw-doc contract drift; "
                    "falling back to per-view builds: %s",
                    str(e)[:200],
                )
                return [n for n, _ in group]

        groups = []
        for table, group in by_table.items():
            if len(group) < 2:
                rest.extend(n for n, _ in group)
            else:
                groups.append(group)
        # table groups and per-view builds are independent jobs —
        # overlap them on the scheduler like build_views does
        from concurrent.futures import ThreadPoolExecutor

        fallback: list[str] = []
        with ThreadPoolExecutor(max_workers=max_parallel) as ex:
            futs = [ex.submit(run_group, g) for g in groups]
            rest_futs = [ex.submit(self.update_view, n) for n in rest]
            for f in futs:
                fallback.extend(f.result())
            for f in rest_futs:
                f.result()
        if fallback:
            self.build_views(fallback, max_parallel)

    def _fused_frame(self, vdefs: list[ViewDef],
                     src: DataFrame, *,
                     view_guards: list | None = None,
                     extra_entries: list | None = None) -> DataFrame:
        """One-scan frame of every view's emits, tagged ``_vw`` (the
        vdef ordinal).  Each (view, emit-site) contributes a CASE-
        guarded struct per source row; nulls (guard false) drop after
        ONE explode — all JVM, no union (a union would re-instance the
        scan per branch: Spark does not CSE across union children).

        ``view_guards[i]`` (optional) ANDs an extra Column into every
        emit of view i — the fused REFRESH uses it for the per-view
        ``seq > last_seq_i`` bound and the not-deleted filter.
        ``extra_entries`` appends pre-built (possibly guarded) struct
        Columns to the emit array — the refresh's ``_vw = -1``
        changed-doc sentinel rides the same scan this way."""
        from mapreduce_spark.extensions.util import right_size
        from mapreduce_spark.operators.mapphase import (
            spec_needs_vdoc,
            spec_output_columns,
            with_vdoc,
        )

        # the fixture tables are single-row-group parquet files, so the
        # scan feeding the (JVM, codegen'd) fused encode can never run
        # on more than one task no matter how Spark splits the file —
        # spread the encode across the cores with one small round-robin
        # exchange of the raw rows.  At scale the input has more splits
        # than cores and right_size is a no-op; below _FANOUT_MIN_BYTES
        # the serial encode is cheaper than the exchange + extra AQE
        # job.  Measured (r15, quiet window, lineitem group alone):
        # wall 17.7→4.3 s at +10 CPU-s (shuffle-row decode replacing
        # the vectorized scan under the encode); the persist below
        # keeps the range-partitioner's sampling pass from re-running
        # the widened encode.
        src = right_size(src, min_bytes=_FANOUT_MIN_BYTES)
        if any(
            spec_needs_vdoc(s) for v in vdefs for s in v._spec_list
        ):
            src = with_vdoc(src)
        entries = []
        for i, vdef in enumerate(vdefs):
            for j, spec in enumerate(vdef._spec_list):
                cols = spec_output_columns(spec)
                cols["emit_ord"] = F.lit(j)
                struct = F.struct(
                    F.lit(i).alias("_vw"),
                    *[cols[f.name].cast(f.dataType).alias(f.name)
                      for f in VIEW_SCHEMA.fields],
                )
                guard = (
                    F.expr(spec.where) if spec.where else F.lit(True)
                )
                if view_guards is not None:
                    guard = guard & view_guards[i]
                entries.append(F.when(guard, struct))
        entries.extend(extra_entries or [])
        # compute the emit array in its OWN projection and explode the
        # materialized column: inlining the array into the Generate
        # evaluates the full encode expression tree on the Generate's
        # (non-codegen) path — measured 2.6× slower at sf0.1
        return (
            src.select(F.array(*entries).alias("_emits"))
            .select(F.explode("_emits").alias("r"))
            .filter(F.col("r").isNotNull())
            .select("r.*")
        )

    def _build_fused(self, vdefs: list[ViewDef]) -> None:
        import tempfile as _tf

        t = TABLES[vdefs[0].table]
        sigs = [v.sig for v in vdefs]
        # sorted + deduped: the per-sig lock is non-reentrant, and a
        # ddoc may name the same definition twice (shared index)
        locks = [self.registry.view_lock(s) for s in sorted(set(sigs))]
        for lk in locks:
            lk.__enter__()
        fused = None
        try:
            src = self._source_df(vdefs[0])
            seq_col = F.expr(t.seq_expr).cast("long")
            obs = Observation()
            src = src.observe(obs, F.max(seq_col).alias("mx"))
            fused = self._fused_frame(vdefs, self._pre_map(t, src))
            # the range partitioner SAMPLES its child — a second full
            # execution of the fused encode work; cache the (small,
            # ≈ Σ view sizes) emit rows across the sample+write passes
            fused = fused.persist(StorageLevel.MEMORY_AND_DISK)
            # one range exchange on (view, key) keeps each view's rows
            # contiguous AND key-ordered; the CollectMetrics with the
            # per-view counts sits ABOVE it so the range partitioner's
            # sampling pass cannot double-count
            vobs = Observation()
            metrics = []
            for i in range(len(vdefs)):
                vw = F.col("_vw") == i
                metrics.append(
                    F.count(F.when(vw, 1)).alias(f"rows{i}")
                )
                metrics.append(
                    F.max(F.when(vw, F.size("value_num_arr")))
                    .alias(f"w{i}")
                )
                metrics.append(
                    F.approx_count_distinct(
                        F.when(vw, F.col("key_enc"))
                    ).alias(f"keys{i}")
                )
            tmp = _tf.mkdtemp(prefix="fused-",
                              dir=self.registry.storage_dir)
            (
                fused.repartitionByRange("_vw", "key_enc", "id")
                .observe(vobs, *metrics)
                .sortWithinPartitions("_vw", "key_enc", "id",
                                      "emit_ord")
                .write.partitionBy("_vw")
                .mode("overwrite")
                .parquet(tmp)
            )
            m = vobs.get
            mx = int(obs.get["mx"] or 0)
            for i, vdef in enumerate(vdefs):
                sig = vdef.sig
                entry = self.registry.ensure_view(sig)
                vdir = self.registry.view_dir(sig)
                base_rel = "base-v1"
                dest = os.path.join(vdir, base_rel)
                os.makedirs(vdir, exist_ok=True)
                shutil.rmtree(dest, ignore_errors=True)
                part = os.path.join(tmp, f"_vw={i}")
                if os.path.isdir(part):
                    os.rename(part, dest)
                else:  # a view whose guards matched nothing
                    self.spark.createDataFrame(
                        [], VIEW_SCHEMA
                    ).write.mode("overwrite").parquet(dest)
                entry.update(
                    base=base_rel, base_version=1, last_seq=mx,
                    stats={
                        "rows": int(m[f"rows{i}"] or 0),
                        "sum_w": (
                            int(m[f"w{i}"])
                            if m[f"w{i}"] is not None else -1
                        ),
                        "keys": int(m[f"keys{i}"] or 0),
                    },
                    counts=None,
                )
                self.registry.set_view(sig, entry)
            shutil.rmtree(tmp, ignore_errors=True)
        finally:
            if fused is not None:
                fused.unpersist()
            for lk in reversed(locks):
                lk.__exit__(None, None, None)

    # ------------------------------------------------------------------
    # fused incremental refresh (M1 at 100 TB: one changes scan per
    # ddoc, not per view)
    # ------------------------------------------------------------------

    def refresh_ddoc(self, ddoc: str, max_parallel: int = 4,
                     to_seq: int | None = None) -> None:
        """Refresh ALL views of a design doc from ONE changes scan
        (SURVEY §2 M1; upstream updates a ddoc's views as one group,
        [U pouchdb-abstract-mapreduce#updateView] batching, CouchDB
        couch_mrview updater).  ``build_ddoc`` fuses the FIRST build;
        without this, a K-view ddoc pays K scans of every changes
        batch — at 100 TB the scan dominates, so that is K−1 wasted
        passes per refresh.

        Built structured views over the same table fuse: one scan from
        ``min(last_seq)`` feeds per-view CASE-guarded emits (guard =
        spec WHERE ∧ ``seq > last_seq_i``), plus a ``_vw = -1``
        sentinel row per changed doc carrying (id, seq) — so the
        tombstone sets, per-view probes and checkpoint bumps all come
        from the same pass, zero source re-scans.  Views with unequal
        ``last_seq`` still share the scan (the per-view seq guard
        re-aligns them).  Everything else — unbuilt views, interpreted
        views, other tables — takes the per-view ``update_view`` path,
        as does the whole group on a raw-doc contract drift."""
        views = self.registry.design_views(ddoc)
        fusable: list[tuple[str, ViewDef]] = []
        rest: list[str] = []
        seen_sigs: set[str] = set()
        for name, sig in views.items():
            if sig in seen_sigs:
                continue
            seen_sigs.add(sig)
            vdef = self._defs.get(sig)
            entry = self.registry.get_view(sig)
            built = entry is not None and (
                entry.get("base") is not None or entry.get("layers")
            )
            if vdef is not None and built \
                    and vdef._fusable_specs is not None:
                fusable.append((f"{ddoc}/{name}", vdef))
            else:
                rest.append(f"{ddoc}/{name}")
        by_table: dict[str, list[tuple[str, ViewDef]]] = {}
        for name, vdef in fusable:
            by_table.setdefault(vdef.table, []).append((name, vdef))

        def run_group(group: list[tuple[str, ViewDef]]) -> list[str]:
            try:
                self._refresh_fused([v for _, v in group], to_seq=to_seq)
                return []
            except Exception as e:
                from mapreduce_spark.functions.jsvariant import (
                    is_drift_error,
                )

                if not (
                    is_drift_error(e)
                    or "requires built views" in str(e)
                ):
                    raise
                log.warning(
                    "fused ddoc refresh fell back to per-view "
                    "refreshes: %s", str(e)[:200],
                )
                return [n for n, _ in group]

        groups = []
        for table, group in by_table.items():
            if len(group) < 2:
                rest.extend(n for n, _ in group)
            else:
                groups.append(group)
        from concurrent.futures import ThreadPoolExecutor

        fallback: list[str] = []
        with ThreadPoolExecutor(max_workers=max_parallel) as ex:
            futs = [ex.submit(run_group, g) for g in groups]
            rest_futs = [
                ex.submit(self.update_view, n, None, to_seq)
                for n in rest
            ]
            for f in futs:
                fallback.extend(f.result())
            for f in rest_futs:
                f.result()
        for n in fallback:
            self.update_view(n, None, to_seq)

    def _fused_refresh_frame(
        self, vdefs: list[ViewDef], last_seqs: list[int],
        to_seq: int | None = None, changes: DataFrame | None = None,
    ) -> tuple[DataFrame, list]:
        """The one-scan refresh frame + its observation metrics.

        Emit rows are tagged ``_vw`` ∈ [0, K); every changed doc also
        yields exactly one ``_vw = -1`` sentinel whose ``value_num``
        holds its seq (deleted docs included — they tombstone without
        emitting).  Metrics (rows_i, w_i, n_i, mx) ride the same pass
        so no piece of the refresh re-reads the source."""
        t = TABLES[vdefs[0].table]
        if changes is not None:
            src = changes
        else:
            src = self._source_df(
                vdefs[0], since=min(last_seqs), to_seq=to_seq
            )
        src = src.withColumn(
            "_fseq", F.expr(t.seq_expr).cast("long")
        )
        collapsed = self._collapse_latest(t, src)
        live = F.lit(True)
        if "_deleted" in collapsed.columns:
            live = ~F.coalesce(F.col("_deleted"), F.lit(False))
        guards = []
        for ls in last_seqs:
            g = live
            if changes is None:
                # explicit changes frames are the caller's batch as-is
                # (update_view parity: tombstone regardless of seq);
                # the changes-feed path re-aligns unequal checkpoints
                g = g & (F.col("_fseq") > int(ls))
            guards.append(g)
        sent_cols = {
            "id": doc_id_col(t.name),
            "emit_ord": F.lit(0),
            "key_enc": F.lit(""),
            "key_json": F.lit("null"),
            "value_num": F.col("_fseq").cast("double"),
        }
        sentinel = F.struct(
            F.lit(-1).alias("_vw"),
            *[
                sent_cols.get(f.name, F.lit(None))
                .cast(f.dataType).alias(f.name)
                for f in VIEW_SCHEMA.fields
            ],
        )
        frame = self._fused_frame(
            vdefs, collapsed, view_guards=guards,
            extra_entries=[sentinel],
        )
        is_sent = F.col("_vw") == -1
        metrics = [
            F.max(F.when(is_sent, F.col("value_num"))).alias("mx")
        ]
        for i, ls in enumerate(last_seqs):
            vw = F.col("_vw") == i
            metrics.append(F.count(F.when(vw, 1)).alias(f"rows{i}"))
            metrics.append(
                F.max(F.when(vw, F.size("value_num_arr")))
                .alias(f"w{i}")
            )
            metrics.append(
                F.approx_count_distinct(F.when(vw, F.col("key_enc")))
                .alias(f"keys{i}")
            )
            n_pred = is_sent if changes is not None else (
                is_sent & (F.col("value_num") > int(ls))
            )
            metrics.append(F.count(F.when(n_pred, 1)).alias(f"n{i}"))
        return frame, metrics

    def _refresh_fused(self, vdefs: list[ViewDef],
                       to_seq: int | None = None,
                       changes: DataFrame | None = None) -> None:
        """Fused-refresh body: one delta scan → per-view layer appends.

        Per view the outcome is identical to ``_update_view_impl``'s
        incremental branch (delta layer, lcounts/tombstone file,
        O(changes) removed-count accounting, stats and ``last_seq``
        bump, compaction trigger) — the metamorphic test pins
        fused ≡ per-view ≡ rebuild."""
        import tempfile as _tf

        sigs = [v.sig for v in vdefs]
        locks = [self.registry.view_lock(s) for s in sorted(set(sigs))]
        for lk in locks:
            lk.__enter__()
        tmp = None
        try:
            entries = [self.registry.ensure_view(v.sig) for v in vdefs]
            if any(
                e["base"] is None and not e["layers"] for e in entries
            ):
                # raced an un-built view past the pre-lock check: the
                # fused shape assumes existing checkpoints — build the
                # stragglers per-view, then re-enter
                raise RuntimeError(
                    "_refresh_fused requires built views"
                )
            last_seqs = [int(e["last_seq"]) for e in entries]
            frame, metrics = self._fused_refresh_frame(
                vdefs, last_seqs, to_seq, changes
            )
            vobs = Observation()
            tmp = _tf.mkdtemp(prefix="fusedref-",
                              dir=self.registry.storage_dir)
            (
                frame.observe(vobs, *metrics)
                .write.partitionBy("_vw")
                .mode("overwrite").parquet(tmp)
            )
            m = observed(vobs)
            if m is None:  # empty batch folded away (see observed())
                return
            mx = int(m["mx"] or 0)
            ids_part = os.path.join(tmp, "_vw=-1")
            for i, (vdef, entry) in enumerate(zip(vdefs, entries)):
                n_i = int(m[f"n{i}"] or 0)
                if n_i == 0:
                    continue
                sig = vdef.sig
                vdir = self.registry.view_dir(sig)
                batch = entry["next_batch"]
                delta_rel = f"delta-{batch}"
                delta_path = os.path.join(vdir, delta_rel)
                part = os.path.join(tmp, f"_vw={i}")
                shutil.rmtree(delta_path, ignore_errors=True)
                if os.path.isdir(part):
                    os.rename(part, delta_path)
                else:  # changed docs exist but none passed the guards
                    self.spark.createDataFrame(
                        [], VIEW_SCHEMA
                    ).write.mode("overwrite").parquet(delta_path)
                ids = self.spark.read.schema(
                    "id string, value_num double"
                ).parquet(ids_part)
                if changes is None:
                    ids = ids.filter(
                        F.col("value_num") > int(last_seqs[i])
                    )
                tomb_ids = ids.select("id").distinct()
                lcounts_rel = f"lcounts-{batch}"
                tomb_path = os.path.join(vdir, lcounts_rel)
                # (changed ids as 0) ∪ (delta rows as 1) → sum per id:
                # one exchange instead of distinct+groupBy+join (same
                # rewrite as update_view — round 14; duplicate ids add
                # zeros, so the result is row-identical)
                lc = (
                    ids.select(
                        "id", F.lit(0).cast("long").alias("n")
                    )
                    .union(
                        self.spark.read.schema(VIEW_SCHEMA)
                        .parquet(delta_path)
                        .select(
                            "id", F.lit(1).cast("long").alias("n")
                        )
                    )
                    .groupBy("id")
                    .agg(F.sum("n").cast("long").alias("n"))
                )
                lobs = Observation()
                lc = lc.observe(
                    lobs, F.min("id").alias("lo"),
                    F.max("id").alias("hi"),
                )
                if n_i <= 1_000_000:
                    lc = lc.coalesce(1)
                lc.write.mode("overwrite").parquet(tomb_path)
                lb = observed(lobs)
                removed = 0
                if entry.get("stats") is not None:
                    self._ensure_counts(entry, vdir)
                    removed = self._removed_count(
                        entry, vdir, tomb_path, n_i,
                        bounds=(lb["lo"], lb["hi"]) if lb else None,
                    )
                    if removed is None:
                        removed = (
                            self._assemble_view(sig)
                            .select("id")
                            .join(F.broadcast(tomb_ids), "id",
                                  "left_semi")
                            .count()
                        )
                entry["layers"].append(
                    {"batch": batch, "delta": delta_rel,
                     "tomb": lcounts_rel, "lcounts": lcounts_rel}
                )
                entry["next_batch"] = batch + 1
                entry["last_seq"] = max(entry["last_seq"], mx)
                prev = entry.get("stats")
                if prev is not None:
                    w_i = m[f"w{i}"]
                    dw = int(w_i) if w_i is not None else -1
                    entry["stats"] = {
                        "rows": prev["rows"]
                        + int(m[f"rows{i}"] or 0) - removed,
                        "sum_w": max(prev["sum_w"], dw),
                        # additive upper bound (deletes only shrink
                        # the distinct set); compaction re-observes
                        # the exact layout and tightens it
                        "keys": (
                            prev["keys"] + int(m[f"keys{i}"] or 0)
                            if prev.get("keys") is not None else None
                        ),
                    }
                self.registry.set_view(sig, entry)
                if len(entry["layers"]) >= self.compact_after:
                    if entry.get("manifest") is not None:
                        self._compact_scoped_locked(sig, entry)
                    else:
                        self._compact(sig, entry)
        finally:
            if tmp is not None:
                shutil.rmtree(tmp, ignore_errors=True)
            for lk in reversed(locks):
                lk.__exit__(None, None, None)

    def view_cleanup(self) -> dict:
        res = self.registry.view_cleanup()
        for sig in res["removed"]:
            self._defs.pop(sig, None)
        return res

    # ------------------------------------------------------------------
    # query
    # ------------------------------------------------------------------

    def query(self, fun: Any, *, doc_tables: list[str] | None = None,
              **opts: Any) -> QueryResult:
        return self.query_batch(fun, [opts], doc_tables=doc_tables)[0]

    def query_batch(self, fun: Any, queries: list[dict], *,
                    doc_tables: list[str] | None = None
                    ) -> list[QueryResult]:
        """CouchDB multi-query (`POST …/_view` body ``{queries:[…]}``):
        run several option sets against ONE view in one call.

        The Spark win over N separate ``query()`` calls: the refresh
        (at most one maintenance pass, not N) and the LSM view assembly
        are shared — every sub-query's plan branches off the same
        assembled frame, so a persisted index is consulted exactly the
        way the reference serves a batched request.  Each sub-query
        keeps fully independent options (range, grouping, pagination,
        include_docs), and all option sets are validated up front so a
        malformed entry fails the whole batch before any work
        (upstream parity: the request is rejected as a unit)."""
        vdef, persisted = self._resolve(fun)
        check_reduce(vdef.reduce_def)
        has_reduce = vdef.reduce_def is not None
        olist = [
            options_from(q).validated(has_reduce=has_reduce)
            for q in queries
        ]

        last_seq: int | None = None
        stats: dict | None = None
        if persisted:
            # only the default staleness mode refreshes before the read;
            # stale='ok' and stale='update_after' both serve the current
            # index immediately (upstream parity — update_after refreshes
            # once, after the response is assembled, see below)
            if any(o.stale is None for o in olist):
                self.update_view(vdef)
            view = self._assemble_view(vdef.sig)
            entry = self.registry.get_view(vdef.sig)
            stats = (entry or {}).get("stats")
            last_seq = entry["last_seq"] if entry else 0
        else:
            view = self._build(vdef, self._source_df(vdef))

        results = [
            self._run_query(
                vdef, view, o, stats,
                last_seq if o.update_seq else None, doc_tables,
            )
            for o in olist
        ]
        if persisted and any(o.stale == "update_after" for o in olist):
            self.update_view(vdef)  # refresh after; lazy dfs stay valid
        return results

    def _run_query(self, vdef: ViewDef, view: DataFrame,
                   o: QueryOptions, stats: dict | None,
                   upd_seq: int | None,
                   doc_tables: list[str] | None) -> QueryResult:
        will_reduce = (
            vdef.reduce_def is not None if o.reduce is None else o.reduce
        )
        if will_reduce:
            if vdef.reduce_def == "_sum" and vdef.sum_statically_invalid:
                # structured views emit value_num/value_num_arr as
                # LITERAL NULL columns when the value kind is not
                # numeric, and Catalyst folds the runtime value guard
                # away with them (when(guard, NULL) → NULL) — so the
                # upstream builtin_reduce_error must be raised here,
                # before any job, from the static value kinds
                raise BuiltInError(
                    "builtin_reduce_error: _sum requires numbers or "
                    "arrays of numbers"
                )
            red = query_reduced(
                view, o, vdef.reduce_def, value_hint=vdef.value_hint,
                observed_width=(
                    stats.get("sum_w") if stats is not None else None
                ),
                keys_bound=(
                    stats.get("keys") if stats is not None else None
                ),
            )
            res = QueryResult(
                red.select(*REDUCED_RESULT_COLS),
                offset=o.skip,
                reduced=True,
                update_seq=upd_seq,
            )
        else:
            rows_bound = stats.get("rows") if stats is not None else None
            rows = query_map(view, o, rows_bound=rows_bound)
            keep_ord = "_key_ord" in rows.columns
            if o.include_docs:
                docs = self._docs_for_join(
                    [vdef.table] + (doc_tables or []),
                    conflicts=o.conflicts,
                    attachments=o.attachments,
                )
                # an applied limit statically bounds the id set we'd
                # broadcast; key=/keys= lookups WITHOUT a limit are
                # bounded by the predicate but not statically, so the
                # prune decision is left to AQE at runtime (no extra
                # driver-side cardinality-probe job — a hot key
                # matching millions degrades to the shuffled semi,
                # which is correct at that size)
                if o.limit is not None and o.limit <= 10_000:
                    prune = "broadcast"
                elif rows_bound is not None and rows_bound <= 100_000:
                    # the id set is bounded by the (small) view itself:
                    # static broadcast skips the AQE measurement
                    # round-trip; past 100k ids the broadcast fan-out
                    # cost at cluster scale outweighs it → adaptive
                    prune = "broadcast"
                elif o.key is not UNSET or o.keys is not UNSET:
                    prune = "adaptive"
                else:
                    prune = "none"
                rows = attach_docs(rows, docs, prune=prune)
                if o.sorted or keep_ord:
                    order = (
                        [F.col("_key_ord")] if keep_ord else []
                    ) + row_order(o.descending)
                    # post-join row count ≤ index rows (left join on a
                    # unique doc id); an applied limit tightens it
                    b = rows_bound
                    if o.limit is not None:
                        b = o.limit if b is None else min(b, o.limit)
                    rows = fused_sort(rows, order, b)
                cols = MAP_RESULT_COLS + ["doc_json"]
            else:
                cols = MAP_RESULT_COLS
            res = QueryResult(
                rows.select(*cols),
                offset=o.skip,
                total_rows_df=view,
                total_rows_value=(
                    stats["rows"] if stats is not None else None
                ),
                update_seq=upd_seq,
            )
        return res

    def explain(self, fun: Any, *, mode: str = "formatted",
                doc_tables: list[str] | None = None,
                **opts: Any) -> str:
        """The physical plan of a query, without executing it.

        Spark-first observability parity with ``EXPLAIN``: lets users
        verify the properties this engine promises — range predicates
        reaching the parquet scan as PushedFilters, broadcast
        semi-join doc fetches, partial aggregation below the exchange
        — for THEIR view and options.  ``mode``: 'simple' |
        'extended' | 'codegen' | 'cost' | 'formatted'."""
        opts.setdefault("stale", "ok")  # observational: never refresh
        res = self.query(fun, doc_tables=doc_tables, **opts)
        jvm = self.spark.sparkContext._jvm
        return jvm.org.apache.spark.sql.api.python.PythonSQLUtils \
            .explainString(res.df._jdf.queryExecution(), mode)

    def info(self, view_name: str) -> dict:
        """View-index metadata (CouchDB ``GET _design/…/_info``
        ``view_index`` shape): signature, update_seq, sizes, layer
        depth.  Answers purely from the registry + a directory walk —
        zero Spark jobs."""
        vdef, _ = self._resolve(view_name)
        entry = self.registry.get_view(vdef.sig)
        built = entry is not None and (
            entry["base"] is not None or entry["layers"]
        )
        file_bytes = 0
        if built:
            vdir = self.registry.view_dir(vdef.sig)
            for root, _dirs, files in os.walk(vdir):
                for f in files:
                    try:
                        file_bytes += os.path.getsize(
                            os.path.join(root, f)
                        )
                    except OSError:
                        pass
        stats = (entry or {}).get("stats") or {}
        return {
            "signature": vdef.sig,
            # ddoc language: interpreted-JS views report javascript;
            # structured MapSpec views report "query" (the Mango-style
            # declarative class; compiled-from-JS ones land here too);
            # Python callables report python
            "language": (
                "javascript" if "JSMapFunction" in repr(vdef.map_def)
                else "query" if isinstance(
                    vdef.map_def, (MapSpec, list)
                )
                else "python"
            ),
            "update_seq": entry["last_seq"] if entry else 0,
            "sizes": {
                "file": file_bytes,
                "active": stats.get("rows", 0) if built else 0,
            },
            "updater_running": False,  # update_view is synchronous
            "compact_running": False,
            "layer_count": len(entry["layers"]) if entry else 0,
            "compacted_version": (
                entry["base_version"] if entry else 0
            ),
        }

    def _resolve(self, fun: Any) -> tuple[ViewDef, bool]:
        if isinstance(fun, str):
            ddoc, _, view = fun.partition("/")
            if not view:
                ddoc, view = fun, fun
            sig = self.registry.resolve(ddoc, view)
            if sig is None or sig not in self._defs:
                raise NotFoundError(
                    "missing_named_view",
                    reason=f"ddoc {ddoc!r} has no view {view!r}",
                )
            return self._defs[sig], True
        # temporary view (S7): ephemeral, never persisted
        if isinstance(fun, dict):
            return ViewDef(
                self._normalize_map(fun["map"], allow_variant=False),
                self._normalize_reduce(fun.get("reduce"))), False
        if isinstance(fun, (MapSpec, list, tuple)):
            return ViewDef(
                self._normalize_map(fun, allow_variant=False)), False
        raise QueryParseError(f"cannot resolve view from {fun!r}")

    # ------------------------------------------------------------------
    # build / refresh / assemble
    # ------------------------------------------------------------------

    def _source_df(self, vdef: ViewDef, *, since: int | None = None,
                   to_seq: int | None = None) -> DataFrame:
        """Raw-schema source rows (the changes-feed scan, S1).

        The exact seq filter applies always; for composite seq
        expressions a conservative single-column bound
        (DocTable.seq_lo_pred/seq_hi_pred) is layered on top so the
        scan gets parquet row-group pruning — without it an
        incremental refresh of a multi-column-seq table reads the
        whole table at 100 TB (arithmetic predicates never reach
        PushedFilters)."""
        t = TABLES[vdef.table]
        df = self._load_table(vdef.table)
        if since is not None:
            df = df.filter(F.expr(t.seq_expr).cast("long") > since)
            if t.seq_lo_pred:
                df = df.filter(
                    F.expr(t.seq_lo_pred.format(seq=int(since)))
                )
        if to_seq is not None:
            df = df.filter(F.expr(t.seq_expr).cast("long") <= to_seq)
            if t.seq_hi_pred:
                df = df.filter(
                    F.expr(t.seq_hi_pred.format(seq=int(to_seq)))
                )
        return df

    def _pre_map(self, t: Any, raw_df: DataFrame) -> DataFrame:
        """Doc-space normalization before any map fn sees a row.

        A raw source is a changes LOG: several versions of a doc may
        coexist (edits append, deletes are tombstone rows).  CouchDB's
        by-seq indexer sees each doc once at its latest rev, so
        collapse to latest-per-_id before mapping — one shuffle on
        _id, the inherent cost of log compaction (fixture tables are
        snapshots: exactly one row per pk, no collapse needed).
        Applies per refresh batch too: two edits of one doc in a batch
        emit only the newer.  Deleted docs never reach a map fn."""
        raw_df = self._collapse_latest(t, raw_df)
        if "_deleted" in raw_df.columns:
            raw_df = raw_df.filter(
                ~F.coalesce(F.col("_deleted"), F.lit(False))
            )
        return raw_df

    def _collapse_latest(self, t: Any, raw_df: DataFrame) -> DataFrame:
        """Latest row per ``_id`` for changes-log tables (KEEPING
        deleted-doc tombstone rows — the fused refresh needs their ids
        for tombstoning even though they never reach a map fn)."""
        if t.raw_json:
            from pyspark.sql import Window

            w = Window.partitionBy("_id").orderBy(
                F.expr(t.seq_expr).cast("long").desc()
            )
            raw_df = (
                raw_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        return raw_df

    def _build(self, vdef: ViewDef, raw_df: DataFrame) -> DataFrame:
        """Run the map phase over raw-schema rows (non-deleted only).

        Structured (JVM-codegen) specs repartition the input to core
        count first: the fixture files are single-row-group parquet, so
        the encode otherwise serializes onto one task — and the range
        partitioner's sampling pass re-runs it serially a second time
        (r15 measurement: q18's build chain was wall-bound on exactly
        this).  The round-robin exchange's map side is the serial scan
        either way, so it adds little; at scale (splits ≥ cores) and
        below _FANOUT_MIN_BYTES (dimension tables, where the extra AQE
        job costs more than the fan-out buys) ``right_size`` is a
        no-op.  The Python/interpreted path stays on the scan splits:
        fanning it out multiplies Python-worker init across tasks,
        measured as a clear CPU loss (r15)."""
        from mapreduce_spark.extensions.util import right_size

        raw_df = self._pre_map(TABLES[vdef.table], raw_df)
        m = vdef.map_def
        if hasattr(m, "specs"):  # VariantJSView: compiled raw JS
            m = m.specs
        if isinstance(m, (MapSpec, list)):
            raw_df = right_size(raw_df, min_bytes=_FANOUT_MIN_BYTES)
        if isinstance(m, MapSpec):
            return build_view_structured_on(raw_df, m)
        if isinstance(m, list):
            out = None
            for i, spec in enumerate(m):
                d = build_view_structured_on(raw_df, spec)
                if spec.explode is None:
                    d = d.withColumn("emit_ord", F.lit(i))
                out = d if out is None else out.unionByName(d)
            return out
        table, fn = m
        return build_view_python_on(raw_df, table, fn)

    def update_view(self, vdef_or_name: Any,
                    changes: DataFrame | None = None,
                    to_seq: int | None = None) -> None:
        """Incremental view refresh (M1): map changed docs, tombstone
        their previous emits, append a (tomb, delta) layer; full build
        on first touch; compact when the layer stack grows.

        Variant-compiled raw-JS views (functions/jsvariant.py) are
        drift-guarded: a doc violating the sampled field contract
        raises mid-build, and the refresh transparently retries on the
        interpreter tier — the signature is source-derived and
        identical across tiers, so the persisted view (layers already
        written by the compiled tier are value-identical on the docs
        it accepted) simply continues under the swapped map fn."""
        vdef = (
            vdef_or_name
            if isinstance(vdef_or_name, ViewDef)
            else self._resolve(vdef_or_name)[0]
        )
        try:
            return self._update_view_impl(vdef, changes, to_seq)
        except Exception as e:
            from mapreduce_spark.functions.jsvariant import (
                VariantJSView,
                is_drift_error,
            )

            m = vdef.map_def
            if not (isinstance(m, VariantJSView) and is_drift_error(e)):
                raise
            log.warning(
                "raw-doc contract drift in view %s; retrying this "
                "refresh on the interpreter tier: %s",
                vdef.sig, str(e)[:200],
            )
            from mapreduce_spark.functions.jscompile import (
                compile_js_map_fn,
            )

            vdef.map_def = (m.table, compile_js_map_fn(m.source))
            return self._update_view_impl(vdef, changes, to_seq)

    def _update_view_impl(self, vdef: ViewDef,
                          changes: DataFrame | None = None,
                          to_seq: int | None = None) -> None:
        sig = vdef.sig
        t = TABLES[vdef.table]
        with self.registry.view_lock(sig):
            entry = self.registry.ensure_view(sig)
            vdir = self.registry.view_dir(sig)

            seq_col = F.expr(t.seq_expr).cast("long")
            if entry["base"] is None and not entry["layers"]:
                src = changes if changes is not None else self._source_df(
                    vdef, to_seq=to_seq
                )
                # seq checkpoint piggybacks on the build scan (observe =
                # zero extra pass over the batch; `max` is idempotent
                # under the range partitioner's extra sampling pass, so
                # the CollectMetrics accumulator stays correct)
                obs = Observation()
                src = src.observe(obs, F.max(seq_col).alias("mx"))
                base_rel = "base-v1"
                built = self._build(vdef, src)
                # the range partitioner SAMPLES its child to pick
                # bounds — a second full execution of the build plan.
                # Cache the built rows across the sample+write passes
                # when that second execution is expensive: the Python
                # interpreter path (it doubles the dominant cost;
                # measured 10.2 s → ~6 s for the sf0.1 interpreted
                # fixture view) and a structured encode that ``_build``
                # fanned out (the sampling pass would re-run the
                # widened encode — the fused path persists for the
                # same reason).  A structured encode running on its
                # scan splits re-samples a cheap columnar scan; the
                # persist would only spend memory on it.
                from mapreduce_spark.extensions.util import (
                    fanout_width,
                )

                m = vdef.map_def
                if hasattr(m, "specs"):
                    m = m.specs
                heavy = isinstance(vdef.map_def, tuple) and callable(
                    vdef.map_def[1]
                )
                cache = heavy or (
                    isinstance(m, (MapSpec, list))
                    and fanout_width(src, min_bytes=_FANOUT_MIN_BYTES)
                )
                if cache:
                    built = built.persist(StorageLevel.MEMORY_AND_DISK)
                try:
                    stats = self._write_sorted(
                        built, os.path.join(vdir, base_rel)
                    )
                finally:
                    if cache:
                        built.unpersist()
                # per-doc emit counts are written LAZILY at the first
                # refresh (_ensure_counts) — read-only views never pay
                # the extra id-column pass
                m0 = observed(obs)
                entry.update(
                    base=base_rel, base_version=1,
                    last_seq=int((m0 or {}).get("mx") or 0),
                    stats=stats, counts=None,
                )
                self.registry.set_view(sig, entry)
                return

            src = changes if changes is not None else self._source_df(
                vdef, since=entry["last_seq"], to_seq=to_seq
            )
            # probe (did anything change? new checkpoint seq) rides the
            # delta-write scan instead of a scan of its own; count is
            # safe here because the delta write is single-pass
            obs = Observation()
            src_obs = src.observe(
                obs,
                F.max(seq_col).alias("mx"),
                F.count(F.lit(1)).alias("n"),
            )
            batch = entry["next_batch"]
            delta_rel = f"delta-{batch}"
            delta_path = os.path.join(vdir, delta_rel)
            # delta stats ride the delta-write pass (single-pass scan,
            # so count is safe without an exchange barrier)
            dobs = Observation()
            self._build(vdef, src_obs).observe(
                dobs,
                F.count(F.lit(1)).alias("rows"),
                F.max(F.size("value_num_arr")).alias("w"),
                F.approx_count_distinct("key_enc").alias("keys"),
            ).write.mode("overwrite").parquet(delta_path)
            probe = observed(obs)
            if probe is None or not probe["n"]:
                shutil.rmtree(delta_path, ignore_errors=True)
                return
            # ONE (id, n) file per batch serves both roles: the n ≥ 0
            # per-doc emit counts (future refreshes look up superseded
            # row counts in O(changes) instead of scanning the view)
            # AND the doc-id tombstone set — the tombstone ids are
            # exactly lcounts' id column (n = 0 rows are deletes /
            # no-longer-emitting docs), and every tombstone reader
            # projects ``schema("id string")`` so parquet column
            # pruning never materializes n.  Folding the two files
            # saves a write job + a source re-scan per refresh.
            lcounts_rel = tomb_rel = f"lcounts-{batch}"
            tomb_path = os.path.join(vdir, lcounts_rel)
            # (changed ids as 0) ∪ (delta rows as 1) → sum per id: the
            # emit count for emitters, an explicit 0 for tombstone-only
            # docs.  ONE exchange end to end — the previous
            # distinct(src) ⟕ groupBy(delta) join shape paid three
            # (distinct, groupBy, join) plus a broadcast, ~2 extra AQE
            # jobs per refresh on q18's scheduling-latency-bound path
            # (round 14); duplicate src rows only add zeros, so the
            # result is row-identical to the join form.
            lc = (
                src.select(
                    doc_id_col(vdef.table).alias("id"),
                    F.lit(0).cast("long").alias("n"),
                )
                .union(
                    self.spark.read.schema(VIEW_SCHEMA)
                    .parquet(delta_path)
                    .select("id", F.lit(1).cast("long").alias("n"))
                )
                .groupBy("id")
                .agg(F.sum("n").cast("long").alias("n"))
            )
            # tombstone-id [min,max] rides the lcounts write pass —
            # _removed_count's pruning bounds without a job of its own
            lobs = Observation()
            lc = lc.observe(
                lobs, F.min("id").alias("lo"), F.max("id").alias("hi")
            )
            if int(probe["n"] or 0) <= 1_000_000:
                # typical refresh: one small file beats partition spray
                lc = lc.coalesce(1)
            lc.write.mode("overwrite").parquet(tomb_path)
            lb = observed(lobs)
            # rows this batch supersedes: live (pre-batch) emits of the
            # changed docs, answered from the per-doc emit-count
            # metadata (counts file / manifest sidecar / layer lcounts)
            # in O(changes) — keeping total_rows a zero-job registry
            # lookup at query time (the reference's index-metadata
            # shape) without the old O(view) id-column scan.
            removed = 0
            if entry.get("stats") is not None:
                self._ensure_counts(entry, vdir)
                removed = self._removed_count(
                    entry, vdir, tomb_path, int(probe["n"] or 0),
                    bounds=(lb["lo"], lb["hi"]) if lb else None,
                )
                if removed is None:
                    # pre-metadata storage layout: legacy one-shot
                    # id-pruned view scan (tombstone ids = the lcounts
                    # id column just written, like every other reader)
                    tomb_ids = (
                        self.spark.read.schema("id string")
                        .parquet(tomb_path)
                    )
                    removed = (
                        self._assemble_view(sig)
                        .select("id")
                        .join(F.broadcast(tomb_ids), "id", "left_semi")
                        .count()
                    )
            entry["layers"].append(
                {"batch": batch, "delta": delta_rel, "tomb": tomb_rel,
                 "lcounts": lcounts_rel}
            )
            entry["next_batch"] = batch + 1
            entry["last_seq"] = max(entry["last_seq"], int(probe["mx"]))
            dm = dobs.get
            prev = entry.get("stats")
            if prev is not None:
                dw = int(dm["w"]) if dm["w"] is not None else -1
                entry["stats"] = {
                    "rows": prev["rows"] + int(dm["rows"] or 0) - removed,
                    # max over live pieces; exact width is re-observed
                    # at every compaction (see _compact)
                    "sum_w": max(prev["sum_w"], dw),
                    # additive distinct-key upper bound (see fused path)
                    "keys": (
                        prev["keys"] + int(dm["keys"] or 0)
                        if prev.get("keys") is not None else None
                    ),
                }
            self.registry.set_view(sig, entry)
            if len(entry["layers"]) >= self.compact_after:
                if entry.get("manifest") is not None:
                    self._compact_scoped_locked(sig, entry)
                else:
                    self._compact(sig, entry)

    def _write_sorted(self, view: DataFrame, path: str) -> dict:
        """Persist a view sorted+range-partitioned by key_enc so Parquet
        row-group min/max stats give index-like range pruning (X1/X3).

        Returns view statistics observed on the write pass itself (zero
        extra scans): exact row count and max ``value_num_arr`` width —
        the registry metadata that lets ``total_rows`` and dynamic-view
        ``_sum`` answer without a probe job later.  The CollectMetrics
        node sits ABOVE the range exchange, so the partitioner's extra
        sampling pass over the child never double-counts.
        """
        obs = Observation()
        (
            view.repartitionByRange("key_enc", "id")
            .observe(
                obs,
                F.count(F.lit(1)).alias("rows"),
                F.max(F.size("value_num_arr")).alias("w"),
                F.approx_count_distinct("key_enc").alias("keys"),
            )
            .sortWithinPartitions("key_enc", "id", "emit_ord")
            .write.mode("overwrite")
            .parquet(path)
        )
        m = obs.get
        return {
            "rows": int(m["rows"] or 0),
            "sum_w": int(m["w"]) if m["w"] is not None else -1,
            # HLL distinct-key ESTIMATE (default rsd ≈5%, and not a
            # true bound in either direction): feeds only the
            # small-result sort-fusion gate (operators/query.
            # fused_sort), which picks between two CORRECT plans —
            # never treat it as a correctness-bearing bound
            "keys": int(m["keys"] or 0),
        }

    # ------------------------------------------------------------------
    # per-doc emit-count metadata (O(changes) refresh accounting)
    # ------------------------------------------------------------------

    def _write_counts(self, data_path: str, out_path: str,
                      rows_bound: int | None = None) -> None:
        """Persist per-doc emit counts (id, n) for a base version.

        One column-pruned (id-only) pass over the just-written files —
        build/compaction-time cost, never per-refresh.  Written id-
        sorted and range-partitioned so the per-refresh lookup's
        ``isin`` predicate prunes to the matching row groups via
        parquet min/max stats (the reference keeps the same per-doc
        emit bookkeeping in its index metadata).

        Small views (``rows_bound`` ≤ 1M, registry stats) write ONE
        sorted file instead: same min/max pruning, minus the range
        partitioner's bounds-sampling job and its double execution of
        the aggregation."""
        counts = (
            self.spark.read.schema(VIEW_SCHEMA).parquet(data_path)
            .groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        if rows_bound is not None and rows_bound <= 1_000_000:
            counts = counts.coalesce(1)
        else:
            counts = counts.repartitionByRange("id")
        (
            counts.sortWithinPartitions("id")
            .write.mode("overwrite").parquet(out_path)
        )

    def _ensure_counts(self, entry: dict, vdir: str) -> None:
        """Lazily materialize the base counts file on first refresh.

        Read-only views (the common case) never pay the pass; a view
        entering maintenance pays it once per base version, amortized
        over every subsequent refresh."""
        if (
            entry.get("manifest") is None
            and entry.get("counts") is None
            and entry.get("base")
        ):
            counts_rel = f"counts-{entry['base']}"
            self._write_counts(
                os.path.join(vdir, entry["base"]),
                os.path.join(vdir, counts_rel),
                rows_bound=(entry.get("stats") or {}).get("rows"),
            )
            entry["counts"] = counts_rel

    def _base_counts(self, entry: dict, vdir: str) -> DataFrame | None:
        """(id, n) live emit counts of the BASE piece, or None when the
        storage predates count metadata (caller falls back)."""
        if entry.get("manifest") is not None:
            if not entry.get("sidecar_n"):
                return None
            side = self.spark.read.schema(
                "id string, file string, n long"
            ).parquet(os.path.join(vdir, entry["sidecar"]))
            return side.groupBy("id").agg(
                F.sum("n").cast("long").alias("n")
            )
        if entry["base"] is None:
            return self.spark.createDataFrame([], "id string, n long")
        c = entry.get("counts")
        if c is None:
            return None
        return self.spark.read.schema("id string, n long").parquet(
            os.path.join(vdir, c)
        )

    def _removed_count(self, entry: dict, vdir: str, tomb_path: str,
                       n_hint: int,
                       bounds: tuple | None = None) -> int | None:
        """Live (pre-batch) emits of the changed docs, in O(changes).

        The newest piece containing a doc holds its live emit count:
        base counts (counts file / manifest sidecar) rank 0, each
        layer's lcounts rank = its batch number.  Small change sets
        collect to an ``isin`` predicate (pushed into the id-sorted
        counts parquet → row-group pruning); large ones keep a
        broadcast semi-join (amortized by the batch size).  Returns
        None when any piece predates count metadata."""
        base_counts = self._base_counts(entry, vdir)
        if base_counts is None:
            return None
        tomb = self.spark.read.schema("id string").parquet(tomb_path)
        pieces = [base_counts.withColumn("_rk", F.lit(0))]
        for l in entry["layers"]:
            lc = l.get("lcounts")
            if lc is None:
                return None
            pieces.append(
                self.spark.read.schema("id string, n long")
                .parquet(os.path.join(vdir, lc))
                .withColumn("_rk", F.lit(l["batch"]))
            )
        allc = pieces[0]
        for p in pieces[1:]:
            allc = allc.unionByName(p)
        # Measured (PLANS.md round-7 "isin vs broadcast-semi"): an
        # isin with k literal ids costs O(k) in plan compile/codegen —
        # 0.7 s at 1k ids, 9.6 s at 20k, 50 s at 100k — while a
        # broadcast left-semi is flat ~0.6 s at every k.  The only
        # thing isin bought was parquet row-group pruning on the
        # id-sorted counts file; a [min,max] BETWEEN derived from the
        # change batch (one tiny agg over the one-file lcounts) keeps
        # exactly that pruning with an O(1)-size plan and beat isin at
        # EVERY measured size, clustered or random ids.  Huge batches
        # (≳10M changed docs) skip the broadcast (build-side memory)
        # for a shuffle semi-join.
        # the [lo,hi] pruning bounds normally ride the lcounts write
        # as an Observation (zero jobs — round 14); the agg fallback
        # covers callers without a fresh write pass to piggyback on
        if bounds is None:
            b = tomb.agg(F.min("id").alias("lo"),
                         F.max("id").alias("hi")).collect()[0]
            bounds = (b["lo"], b["hi"])
        lo, hi = bounds
        if lo is None:
            return 0
        allc = allc.filter(F.col("id").between(lo, hi))
        if n_hint <= 10_000_000:
            allc = allc.join(F.broadcast(tomb), "id", "left_semi")
        else:
            allc = allc.join(tomb, "id", "left_semi")
        from pyspark.sql import Window

        w = Window.partitionBy("id").orderBy(F.col("_rk").desc())
        live = (
            allc.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
        )
        row = live.agg(F.sum("n").alias("s")).collect()[0]
        return int(row["s"] or 0)

    def _compact(self, sig: str, entry: dict) -> None:
        """Fold base+layers into a new base version (X7 auto_compaction)."""
        vdir = self.registry.view_dir(sig)
        assembled = self._assemble_view(sig)
        newv = entry["base_version"] + 1
        base_rel = f"base-v{newv}"
        entry["stats"] = self._write_sorted(
            assembled, os.path.join(vdir, base_rel)
        )
        old_counts = [entry["counts"]] if entry.get("counts") else []
        if entry.get("manifest") is not None:
            # manifest mode: referenced files may span several part
            # generations — GC every distinct top-level dir, plus the
            # sidecar
            old = sorted(
                {r.split("/", 1)[0] for r in entry["manifest"]}
                | {entry["base"]}
            )
            if entry.get("sidecar"):
                old.append(entry["sidecar"])
            entry["manifest"] = None
            entry["sidecar"] = None
        else:
            old = [entry["base"]]
        old += old_counts
        old += list(dict.fromkeys(
            p
            for l in entry["layers"]
            for p in (l["delta"], l["tomb"], l.get("lcounts"))
            if p
        ))
        # old versions become unreferenced; GC is deferred (vacuum) so
        # lazy DataFrames handed out before the compaction stay valid.
        # counts=None: the new base's counts file re-materializes
        # lazily on the next refresh (_ensure_counts)
        entry.update(base=base_rel, base_version=newv, layers=[],
                     counts=None)
        entry["garbage"] = entry.get("garbage", []) + old
        self.registry.set_view(sig, entry)

    # ------------------------------------------------------------------
    # partition-scoped compaction (SURVEY §7.3 — M1 at 100 TB)
    # ------------------------------------------------------------------

    def compact(self, view_name_or_sig: str) -> dict:
        """Full compaction on demand (CouchDB ``POST _compact/<ddoc>``
        parity): fold base+layers into one fresh sorted base version.
        On a manifest-mode view this also consolidates the spliced
        part generations back into a monolithic base (demotion), which
        is the right move after heavy scoped-compaction churn.
        Returns {"base_version": new}."""
        sig = (
            view_name_or_sig
            if view_name_or_sig in (self.registry._read()["views"])
            else self._resolve(view_name_or_sig)[0].sig
        )
        with self.registry.view_lock(sig):
            entry = self.registry.get_view(sig)
            if entry is None or (entry["base"] is None
                                 and not entry["layers"]):
                raise NotFoundError("no_base_to_compact", reason=sig)
            self._compact(sig, entry)
            return {"base_version": entry["base_version"]}

    def compact_scoped(self, view_name_or_sig: str) -> dict:
        """Compact by rewriting ONLY the base files that hold emits of
        changed docs, instead of the whole view.

        The mechanism is a minimal lakehouse shape on plain Parquet:

        - the base becomes a **manifest** — an explicit file list in
          the registry entry (initially every file of ``base-v<N>``);
        - an id→file **sidecar** (2-column, id-sorted Parquet) records
          which base file holds each doc's emits;
        - compaction semi-joins the accumulated tombstone ids against
          the sidecar to find the *affected* files, rewrites exactly
          those (minus tombstoned rows, plus the folded deltas) into a
          new ``part-<N>`` directory, and splices the manifest:
          untouched files carry over byte-identical, zero I/O.

        Cost is O(affected + changes) instead of O(view): at 100 TB a
        refresh touching 0.1% of docs rewrites ~0.1% of files (plus
        the sidecar maintenance scan, a 2-column pass over affected
        parts only).  Range pruning survives: every file remains
        internally sorted by ``key_enc`` with row-group min/max stats;
        the manifest is simply allowed to contain overlapping key
        ranges (like any LSM level), which pruning handles per file.

        Returns {"affected": n_rewritten, "kept": n_untouched}.
        """
        sig = (
            view_name_or_sig
            if view_name_or_sig in (self.registry._read()["views"])
            else self._resolve(view_name_or_sig)[0].sig
        )
        with self.registry.view_lock(sig):
            entry = self.registry.get_view(sig)
            if entry is None or entry["base"] is None:
                raise NotFoundError("no_base_to_compact", reason=sig)
            vdir = self.registry.view_dir(sig)
            if entry.get("manifest") is None:
                self._init_manifest(sig, entry, vdir)
            if not entry["layers"]:
                return {"affected": 0, "kept": len(entry["manifest"])}
            return self._compact_scoped_locked(sig, entry)

    def _compact_scoped_locked(self, sig: str, entry: dict) -> dict:
        """Scoped-compaction body; caller holds the view lock, the
        entry is in manifest mode with at least one layer.  Also the
        auto-compaction target when a manifest-mode view crosses
        ``compact_after`` during ``update_view`` — once a view opts
        into scoped compaction, maintenance keeps it scoped instead of
        silently reverting to the O(view) full rewrite."""
        vdir = self.registry.view_dir(sig)
        files = {
            rel: os.path.join(vdir, rel) for rel in entry["manifest"]
        }
        sidecar = self.spark.read.schema(
            "id string, file string, n long"
        ).parquet(os.path.join(vdir, entry["sidecar"]))
        tombs = None
        for l in entry["layers"]:
            t = self.spark.read.schema("id string").parquet(
                os.path.join(vdir, l["tomb"])
            )
            tombs = t if tombs is None else tombs.unionByName(t)
        tombs = tombs.distinct()
        affected_rel = [
            r.file
            for r in sidecar.join(
                F.broadcast(tombs), "id", "left_semi"
            ).select("file").distinct().collect()
        ]
        affected = [files[rel] for rel in affected_rel if rel in files]
        kept = [rel for rel in entry["manifest"]
                if rel not in set(affected_rel)]

        # fold: (affected-file rows ⊖ all tombs) ⊕ assembled deltas
        read_view = self.spark.read.schema(VIEW_SCHEMA).parquet
        pieces = []
        if affected:
            pieces.append(
                read_view(*affected).join(
                    F.broadcast(tombs), "id", "left_anti"
                )
            )
        pieces.append(self._assemble_deltas(entry, vdir))
        folded = pieces[0]
        for p in pieces[1:]:
            folded = folded.unionByName(p)

        newv = entry["base_version"] + 1
        part_rel = f"part-{newv}"
        part_dir = os.path.join(vdir, part_rel)
        self._write_sorted(folded, part_dir)
        part_files = [
            f"{part_rel}/{f}" for f in sorted(os.listdir(part_dir))
            if f.endswith(".parquet")
        ]
        side_rel = f"sidecar-{newv}"
        self._write_sidecar(
            sig, vdir, part_files, side_rel,
            carry_from=(entry["sidecar"], affected_rel),
        )

        garbage = affected_rel + list(dict.fromkeys(
            p
            for l in entry["layers"]
            for p in (l["delta"], l["tomb"], l.get("lcounts"))
            if p
        )) + [entry["sidecar"]]
        entry.update(
            manifest=kept + part_files,
            sidecar=side_rel,
            base_version=newv,
            layers=[],
        )
        entry["garbage"] = entry.get("garbage", []) + garbage
        self.registry.set_view(sig, entry)
        return {"affected": len(affected_rel), "kept": len(kept)}

    def _init_manifest(self, sig: str, entry: dict, vdir: str) -> None:
        """Promote a monolithic base to manifest form: list its files
        and build the first id→file sidecar (one 2-column pass)."""
        base_dir = os.path.join(vdir, entry["base"])
        rels = [
            f"{entry['base']}/{f}" for f in sorted(os.listdir(base_dir))
            if f.endswith(".parquet")
        ]
        side_rel = f"sidecar-{entry['base_version']}"
        self._write_sidecar(sig, vdir, rels, side_rel)
        entry["manifest"] = rels
        entry["sidecar"] = side_rel
        entry["sidecar_n"] = True
        if entry.get("counts"):
            # manifest mode: live counts now come from the sidecar
            entry["garbage"] = entry.get("garbage", []) + [entry["counts"]]
            entry["counts"] = None
        self.registry.set_view(sig, entry)

    def _write_sidecar(self, sig: str, vdir: str, new_rels: list[str],
                       side_rel: str,
                       carry_from: tuple | None = None) -> None:
        """Sidecar = (id, file-relpath, n emits of id in that file) over
        the given files; with ``carry_from`` = (old sidecar rel,
        replaced rels), rows of untouched files copy over without
        touching their data files.  The ``n`` column doubles as the
        per-doc emit-count metadata in manifest mode (live count of a
        doc = Σn over its sidecar rows) — the O(changes) refresh
        accounting reads it instead of scanning the view."""
        new_paths = [os.path.join(vdir, r) for r in new_rels]
        rel_map = {os.path.join(vdir, r): r for r in new_rels}
        df = (
            self.spark.read.schema(VIEW_SCHEMA).parquet(*new_paths)
            .select("id", F.input_file_name().alias("file"))
            .groupBy("id", "file")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        # input_file_name → file:// URI of the absolute path; map back
        # to manifest-relative names driver-side via a literal map
        mapping = F.create_map(
            *[
                x
                for abs_p, rel in rel_map.items()
                for x in (F.lit(f"file://{abs_p}"), F.lit(rel))
            ]
        )
        df = df.select(
            "id",
            F.coalesce(
                mapping[F.col("file")],
                F.element_at(
                    F.split(F.col("file"), f"/{os.path.basename(vdir)}/"),
                    -1,
                ),
            ).alias("file"),
            "n",
        )
        if carry_from is not None:
            old_rel, replaced = carry_from
            old = self.spark.read.schema(
                "id string, file string, n long"
            ).parquet(os.path.join(vdir, old_rel))
            if replaced:
                old = old.filter(~F.col("file").isin(replaced))
            df = old.unionByName(df)
        df.repartition(F.col("id")).write.mode("overwrite").parquet(
            os.path.join(vdir, side_rel)
        )

    def _assemble_deltas(self, entry: dict, vdir: str) -> DataFrame:
        """The layers folded among themselves (each delta anti-joined
        against strictly-later tombstones) — the delta half of
        _assemble_view, reused by scoped compaction."""
        read_view = self.spark.read.schema(VIEW_SCHEMA).parquet
        layers = entry["layers"]
        tombs = None
        for l in layers:
            t = self.spark.read.schema("id string").parquet(
                os.path.join(vdir, l["tomb"])
            ).withColumn("_tb", F.lit(l["batch"]))
            tombs = t if tombs is None else tombs.unionByName(t)
        out = None
        for l in layers:
            later = tombs.filter(F.col("_tb") > l["batch"]).select("id")
            d = read_view(os.path.join(vdir, l["delta"])).join(
                F.broadcast(later), "id", "left_anti"
            )
            out = d if out is None else out.unionByName(d)
        return out

    def vacuum(self, sig: str | None = None) -> None:
        """Delete storage versions orphaned by compaction."""
        state = self.registry._read()
        sigs = [sig] if sig else list(state["views"])
        for s in sigs:
            entry = state["views"].get(s)
            if not entry:
                continue
            vdir = self.registry.view_dir(s)
            emptied = set()
            for rel in entry.get("garbage", []):
                p = os.path.join(vdir, rel)
                if os.path.isfile(p):  # scoped compaction: single files
                    try:
                        os.remove(p)
                    except OSError:
                        pass
                    emptied.add(os.path.dirname(p))
                else:
                    shutil.rmtree(p, ignore_errors=True)
            # a part dir whose data files were all GC'd individually
            # holds only write markers (_SUCCESS) — drop it too
            for d in emptied:
                if os.path.isdir(d) and not any(
                    f.endswith(".parquet") for f in os.listdir(d)
                ):
                    shutil.rmtree(d, ignore_errors=True)
            entry["garbage"] = []
            self.registry.set_view(s, entry)

    def _assemble_view(self, sig: str) -> DataFrame:
        """Effective view = ((base ⊖ t1) ⊕ d1) ⊖ t2 ⊕ d2 … — each layer
        anti-joined against the union of strictly-later tombstones
        (broadcast: tombstone sets are per-batch changed-doc ids)."""
        entry = self.registry.get_view(sig)
        vdir = self.registry.view_dir(sig)
        if entry is None or (entry["base"] is None and not entry["layers"]):
            return self.spark.createDataFrame([], VIEW_SCHEMA)
        # schemas are static (VIEW_SCHEMA / id-only tombstones): passing
        # them explicitly skips parquet footer inference — otherwise
        # every assemble runs a schema-read job before any query work
        read_view = self.spark.read.schema(VIEW_SCHEMA).parquet
        if entry.get("manifest") is not None:
            # manifest-based base (scoped compaction): explicit file
            # list, possibly spliced across part generations
            base = read_view(
                *[os.path.join(vdir, r) for r in entry["manifest"]]
            )
        elif entry["base"]:
            base = read_view(os.path.join(vdir, entry["base"]))
        else:
            base = self.spark.createDataFrame([], VIEW_SCHEMA)
        layers = entry["layers"]
        if not layers:
            return base
        tombs = None
        for l in layers:
            tdf = self.spark.read.schema("id string").parquet(
                os.path.join(vdir, l["tomb"])
            ).withColumn("_tb", F.lit(l["batch"]))
            tombs = tdf if tombs is None else tombs.unionByName(tdf)
        pieces = []
        srcs = [(0, base)] + [
            (
                l["batch"],
                read_view(os.path.join(vdir, l["delta"])),
            )
            for l in layers
        ]
        for b, df in srcs:
            later = tombs.filter(F.col("_tb") > b).select("id")
            pieces.append(
                df.join(F.broadcast(later), "id", "left_anti")
            )
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    # ------------------------------------------------------------------
    # docs join side (J1/J2)
    # ------------------------------------------------------------------

    def _load_table(self, name: str) -> DataFrame:
        """A fresh read of the raw table — cheap per query because
        :func:`load_table` caches the footer SCHEMA per path (the
        part that costs a Spark job) while re-listing files, so
        appended changes-feed batches stay visible."""
        return load_table(self.spark, self.sf_dir, name)

    def _docs_for_join(self, tables: list[str],
                       *, conflicts: bool = False,
                       attachments: bool = False) -> DataFrame:
        """(_id, doc_json) across the tables reachable by this query.

        Rebuilt per query (driver-side plan construction, zero jobs —
        the schema cache in ``load_table`` removes the per-query
        footer-inference job) so appended source batches are never
        served stale."""
        out = None
        for tbl in dict.fromkeys(tables):
            t = TABLES[tbl]
            d = as_docs(self._load_table(tbl), tbl)
            dj = doc_json_frame(
                d, conflicts=conflicts, attachments=attachments,
                # declared-unique pk ⇒ unique _id ⇒ no duplicate-id
                # collapse exchange on the doc-fetch side
                unique_id=t.pk_unique and not t.raw_json,
            )
            out = dj if out is None else out.unionByName(dj)
        return out
