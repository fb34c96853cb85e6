"""End-to-end validation orchestration: plan → collect per-bucket
sketches → merge → evaluate → verdicts + violations, resumable.

Reference analogs: the skip-already-profiled filter
(kg_governor/data_profiling/profile_data.py:66-84) becomes an anti-join
against the checkpoint ledger's completed-bucket set; the
JSON-per-column side-effect writes (model/column_profile.py:58-64)
become transactional appends of mergeable sketch rows.

Scale design (10^12 rows, 1000 executors):
- ONE main scan per run computes, per logical bucket: row count, every
  row-level violation count, an HLL++ sketch of doc_id
  (hll_sketch_agg — binary, mergeable), and an exact fixed-width
  histogram of the drift column. All are algebraic aggregates with
  map-side partials; the shuffle moves only n_buckets tiny rows.
- Uniqueness adds the one unavoidable key shuffle (groupBy doc_id),
  bucket-local because buckets hash the same key.
- Resume: completed bucket ids are read from the ledger; on an Iceberg
  table partitioned by bucket(N, doc_id) the NOT IN filter prunes file
  scans, so a restarted job reads only unvalidated data. Sketch merges
  are idempotent: dedupe on bucket_id (earliest run wins) before merge
  (SURVEY.md §7.2 hard-parts 1-3).
- Verdicts are keyed on the logical bucket, never
  spark_partition_id(), so N- and 4N-executor runs produce identical
  pass/fail matrices (tested in tests/test_validate.py).
"""

from __future__ import annotations

import json
import math
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from kglids_spark.operators import constraints as C
from kglids_spark.operators import drift as D
from kglids_spark.plans.buckets import BUCKET_COL, DEFAULT_BUCKETS, with_bucket
from kglids_spark.sources.tables import TableStore

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("bucket_id", T.IntegerType(), False),
        T.StructField("constraint_id", T.StringType(), False),
        T.StructField("n_checked", T.LongType(), False),
        T.StructField("n_violations", T.LongType(), False),
        T.StructField("passed", T.BooleanType(), False),
    ]
)

GLOBAL_BUCKET = -1  # verdict rows for table-level constraints

# Above this bucket count the merged-sketch collect switches from the
# single-action global aggregate to a two-level aggregation, so no
# single task ever materializes all buckets (VERDICT r2 "What's wrong
# #2"). At or below it, one final task holding n_buckets × ~5 KB sketch
# rows (≤ ~5 MB at 1024) is cheaper than an extra job.
MERGE_COLLECT_MAX = 1024


@dataclass
class ValidationResult:
    verdicts: DataFrame
    violations: DataFrame
    metrics: dict
    # per-group drift localization — only when validate(..., drift_by=...)
    group_drift: DataFrame | None = None


def _stats_pass(
    df_b: DataFrame,
    row_cs: list[C.Constraint],
    unique_cs: list[C.Constraint],
    drift_spec: D.HistSpec | None,
    key: str,
    dup_counts: DataFrame | None = None,
    kll_col: str | None = None,
    metric_cols: list[str] = (),
) -> DataFrame:
    """The main per-bucket aggregation (one scan) + the uniqueness
    shuffle, joined into one sketch row per bucket. ``dup_counts`` is
    the persisted (bucket, key, count>1) frame shared with violation
    extraction so the uniqueness shuffle runs exactly once.

    ``kll_col``: also attach a mergeable KLL quantile sketch of that
    column per bucket (north-star stats-collector mechanism:
    groupBy(bucket).applyInPandas over Arrow batches — the one
    statistic JVM aggregates can't express mergeably). Sketch bytes
    ride the same bucket_stats row, so resume/merge semantics are
    identical to the histogram and HLL sketches."""
    viol_sums = [
        F.sum(C.violation_expr(c, df_b).cast("long")).alias(f"v_{i}")
        for i, c in enumerate(row_cs)
    ]
    aggs = [F.count(F.lit(1)).alias("n_rows"), F.hll_sketch_agg(F.col(key)).alias("hll_key")]
    aggs += viol_sums
    if drift_spec is not None:
        aggs.append(D.histogram_array_expr(drift_spec).alias("hist"))
    # metric constraints: mergeable per-bucket sums — the cross-bucket
    # merge (driver side, n_buckets rows) reconstructs the EXACT global
    # stat, so metric verdicts share resume semantics with the sketches
    for m in metric_cols:
        # try_cast: ANSI mode is on, a plain cast THROWS on non-numeric
        # strings instead of nulling
        c = F.col(m).try_cast("double")
        aggs += [
            # null_rate counts RAW nulls — the double cast would turn a
            # non-numeric column into 100% "missing" (cast-null ≠ null)
            F.count(F.col(m)).alias(f"_m_nn_{m}"),
            F.count(c).alias(f"_m_n_{m}"),
            F.sum(c).alias(f"_m_s_{m}"),
            F.sum(c * c).alias(f"_m_q_{m}"),
            F.min(c).alias(f"_m_lo_{m}"),
            F.max(c).alias(f"_m_hi_{m}"),
        ]
    stats = df_b.groupBy(BUCKET_COL).agg(*aggs)

    if row_cs:
        stats = stats.withColumn(
            "viol_counts",
            F.map_from_arrays(
                F.array(*[F.lit(c.cid) for c in row_cs]),
                F.array(*[F.coalesce(F.col(f"v_{i}"), F.lit(0)) for i in range(len(row_cs))]),
            ),
        ).drop(*[f"v_{i}" for i in range(len(row_cs))])
    else:
        stats = stats.withColumn("viol_counts", F.create_map().cast("map<string,long>"))

    for uc in unique_cs:
        if dup_counts is not None and uc.column == key:
            per_bucket = dup_counts.groupBy(BUCKET_COL).agg(
                F.count(F.lit(1)).alias("dup_keys")
            )
        else:
            per_bucket, _ = C.evaluate_uniqueness(df_b, uc.column, BUCKET_COL)
        dup = per_bucket.select(
            F.col(BUCKET_COL), F.col("dup_keys").alias(f"u_{uc.cid}")
        )
        stats = stats.join(dup, BUCKET_COL, "left").withColumn(
            "viol_counts",
            F.map_concat(
                "viol_counts",
                F.create_map(F.lit(uc.cid), F.coalesce(F.col(f"u_{uc.cid}"), F.lit(0))),
            ),
        ).drop(f"u_{uc.cid}")
    if drift_spec is None:
        stats = stats.withColumn("hist", F.lit(None).cast("array<long>"))
    if kll_col is not None:
        from kglids_spark.operators.arrow_stats import bucket_sketches_prebucketed

        kll = bucket_sketches_prebucketed(
            df_b.select(BUCKET_COL, kll_col), kll_col
        ).select(
            BUCKET_COL,
            F.col("min_value").alias("v_min"),
            F.col("max_value").alias("v_max"),
            "kll",
        )
        stats = stats.join(kll, BUCKET_COL, "left")
    else:
        stats = (
            stats.withColumn("v_min", F.lit(None).cast("double"))
            .withColumn("v_max", F.lit(None).cast("double"))
            .withColumn("kll", F.lit(None).cast("binary"))
        )
    return stats


def _dedupe_earliest(stats: DataFrame) -> DataFrame:
    """Idempotent-merge rule: earliest (completed_at, run_id) wins per
    bucket, so re-validated buckets from resumed runs never double
    count."""
    w_first = F.row_number().over(
        Window.partitionBy("bucket_id").orderBy("completed_at", "run_id")
    )
    return stats.withColumn("_rn", w_first).filter(F.col("_rn") == 1).drop("_rn")


def _slim_projection(
    df_b: DataFrame,
    row_cs: list[C.Constraint],
    key: str,
    drift_spec: D.HistSpec | None,
    unique_cols: list[str] = (),
    metric_cols: list[str] = (),
) -> tuple[DataFrame, list[C.Constraint]]:
    """Project the bucketed frame down to exactly the columns the
    constraint suite touches, materializing size(array) for
    consistency constraints. The wide token arrays (the bulk of the
    bytes at 10^12 rows) are decoded ONCE here; the slim frame then
    feeds both the stats aggregation and the violation-row extraction,
    halving input I/O when both passes run."""
    cols: dict[str, None] = {key: None, BUCKET_COL: None}
    extra: list = []
    rewritten: list[C.Constraint] = []
    for c in row_cs:
        if c.kind == "tok_len_consistency":
            size_col = f"__size_{c.params['array_col']}"
            extra.append(F.size(F.col(c.params["array_col"])).alias(size_col))
            rewritten.append(
                C.Constraint(c.cid, "tok_len_precomputed", c.column, {"size_col": size_col})
            )
            cols[c.column] = None
        elif c.kind == "element_range":
            # materialize the exists-probe here so the wide token array
            # never enters the slim frame — only a boolean rides along
            # (cid-hashed name: two element_range constraints on the
            # same column must not collide)
            import hashlib

            flag = f"__elemviol_{hashlib.md5(c.cid.encode()).hexdigest()[:8]}"
            arr = F.col(c.column)
            lo, hi = F.lit(c.params["lo"]), F.lit(c.params["hi"])
            extra.append(
                (
                    arr.isNotNull()
                    & F.exists(arr, lambda x: x.isNull() | (x < lo) | (x > hi))
                ).alias(flag)
            )
            rewritten.append(
                C.Constraint(c.cid, "element_precomputed", c.column, {"flag": flag})
            )
        elif c.kind == "vector_sanity":
            # same discipline as element_range: the whole probe
            # (finite / dim / norm) collapses to one boolean here, so
            # the wide float-vector column never enters the slim frame
            import hashlib

            flag = f"__vecviol_{hashlib.md5(c.cid.encode()).hexdigest()[:8]}"
            extra.append(C.vector_sanity_probe(c).alias(flag))
            rewritten.append(
                C.Constraint(c.cid, "element_precomputed", c.column, {"flag": flag})
            )
        else:
            if c.column:
                cols[c.column] = None
            if c.kind == "referential_flag":
                cols[c.params["flag"]] = None
            if c.kind in ("expression", "compliance"):
                if not c.params.get("columns"):
                    raise ValueError(
                        f"{c.cid}: {c.kind} constraints must declare the "
                        "columns they read (constraints.expression/"
                        "compliance(..., columns=[...])) so the slim scan "
                        "stays slim"
                    )
                for x in c.params["columns"]:
                    cols[x] = None
            rewritten.append(c)
    if drift_spec is not None:
        cols[drift_spec.column] = None
    for uc in unique_cols:
        cols[uc] = None
    for mc in metric_cols:
        cols[mc] = None
    return df_b.select(*[F.col(x) for x in cols], *extra), rewritten


def validate(df: DataFrame, constraints: list[C.Constraint], **kwargs) -> ValidationResult:
    """Run the constraint suite (see ``_validate_impl`` for the full
    contract). Wraps the pass in the wide-array reader-batch profile
    (session.WIDE_ARRAY_SCAN_CONF): the token scans that dominate this
    pass want small column vectors, while the session default stays
    tuned for narrow scans (bench_ab.py A/B, BENCH.md round 3)."""
    from kglids_spark.session import WIDE_ARRAY_SCAN_CONF, scoped_sql_conf

    with scoped_sql_conf(df.sparkSession, WIDE_ARRAY_SCAN_CONF):
        return _validate_impl(df, constraints, **kwargs)


def _validate_impl(
    df: DataFrame,
    constraints: list[C.Constraint],
    *,
    key: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    ledger: TableStore | None = None,
    run_id: str | None = None,
    baseline_hist: list[int] | None = None,
    baseline_snapshot_id: str | None = None,
    baseline_store: TableStore | None = None,
    drift_spec: D.HistSpec | None = None,
    extract_violation_rows: bool = True,
    max_violations_per_constraint: int | None = None,
    dims: dict[str, DataFrame] | None = None,
    kll_col: str | None = "auto",
    drift_by: str | None = None,
) -> ValidationResult:
    """``dims`` maps a referential constraint's dim_table name to its
    DataFrame for dim-table RI (vs a literal valid_values vocabulary).

    ``drift_by`` localizes the drift verdict to a grouping column
    (north_star: WHICH skewed ``source`` feed moved the n_tok mixture,
    not just that it moved): ``result.group_drift`` holds one row per
    group (group, n_rows, ks, psi, ks_pass, psi_pass) from
    ``drift.grouped_drift`` against the SAME resolved baseline as the
    global verdict — explicit ``baseline_hist`` > snapshot > self. Like
    FD (a global property), it is recomputed over the full input each
    run rather than per resumable bucket; per-group histograms and both
    statistics reduce entirely in-plan, so the frame is lazy and safe
    at millions of groups (the CLI caps what it collects). Under a
    self-baseline the global verdict is trivially passing while groups
    are compared to the run's own mixture — still the localization you
    want. Requires a drift constraint in the suite.

    ``baseline_snapshot_id`` resolves the drift baseline from a
    ``bucket_stats`` table AS OF that snapshot (TableStore time travel
    — the north-star "KS/PSI vs a baseline Iceberg snapshot"):
    per-bucket histograms from the snapshot are deduped (earliest run
    per bucket) and merged. The snapshot is read from
    ``baseline_store`` if given, else from ``ledger`` — use a separate
    store when the current run ledgers into a different table than the
    baseline run (the run ledger also drives resume bucket-skipping,
    which a baseline read must not interfere with). An explicit
    ``baseline_hist`` wins over both."""
    spark = df.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    t_start = time.time()
    chash = C.constraint_set_hash(constraints)

    row_cs = C.row_constraints(constraints)
    unique_cs = [c for c in constraints if c.kind == "unique"]
    drift_cs = [c for c in constraints if c.kind in ("drift_ks", "drift_psi")]
    schema_cs = [c for c in constraints if c.kind == "schema_type"]
    metric_cs = [c for c in constraints if c.kind == "metric"]
    fd_cs = [c for c in constraints if c.kind == "fd"]
    volume_cs = [c for c in constraints if c.kind == "volume"]
    metric_cols = sorted({c.column for c in metric_cs})
    if drift_cs and drift_spec is None:
        drift_spec = D.HistSpec(column=drift_cs[0].column)
    if drift_by is not None and not drift_cs:
        raise ValueError("drift_by requires a drift_ks/drift_psi constraint in the suite")
    # two-column projection captured BEFORE the RI flag joins below
    # mutate df — the grouped pass needs neither the flags nor the key
    drift_by_df = (
        df.select(F.col(drift_by), F.col(drift_spec.column))
        if drift_by is not None
        else None
    )

    # dim-table RI: pre-join a membership flag so the constraint stays a
    # row-level expression inside the single-pass aggregate. Catalyst
    # broadcasts small dims; big dims become a shuffle join feeding the
    # same single scan (never a second pass).
    for i, c in enumerate(row_cs):
        if c.kind == "referential" and c.params.get("valid_values") is None:
            dim_name = c.params.get("dim_table")
            if not dims or dim_name not in dims:
                raise ValueError(
                    f"{c.cid}: pass dims={{'{dim_name}': <DataFrame>}} or literal valid_values"
                )
            flag = f"__ri_ok_{i}"
            dim = dims[dim_name].select(F.col(c.column)).distinct().withColumn(flag, F.lit(True))
            df = df.join(dim, on=c.column, how="left")
            row_cs[i] = C.Constraint(c.cid, "referential_flag", c.column, {"flag": flag})

    df_b = with_bucket(df, key, n_buckets)

    # ---- resume: skip completed buckets -------------------------------
    completed: set[int] = set()
    if ledger is not None and ledger.exists("bucket_stats"):
        prior = ledger.read("bucket_stats").filter(
            (F.col("constraint_hash") == chash) & (F.col("n_buckets") == n_buckets)
        )
        completed = {r.bucket_id for r in prior.select("bucket_id").distinct().collect()}
    remaining_df = df_b
    if completed:
        # On Iceberg: bucket partition pruning turns this into file skips.
        remaining_df = df_b.filter(~F.col(BUCKET_COL).isin(list(completed)))

    # ---- slim projection: decode wide arrays once ----------------------
    # (size(tokens) is materialized here; stats + violation extraction
    # both read the persisted slim frame, so the heavy parquet scan of
    # the token arrays happens exactly once per run)
    slim_df, row_cs = _slim_projection(
        remaining_df, row_cs, key, drift_spec, [uc.column for uc in unique_cs],
        metric_cols,
    )
    if extract_violation_rows:
        slim_df = slim_df.persist()

    # ---- collect sketches for remaining buckets ------------------------
    # uniqueness shuffle: computed once, shared by stats and violations
    dup_counts = None
    if unique_cs and any(uc.column == key for uc in unique_cs):
        dup_counts = (
            slim_df.filter(F.col(key).isNotNull())
            .groupBy(BUCKET_COL, key)
            .count()
            .filter(F.col("count") > 1)
            .persist()
        )
    if kll_col == "auto":
        # default: sketch the drift column (n_tok in the north-star
        # suite) so quantiles ship with every run's bucket_stats
        kll_col = drift_spec.column if drift_spec is not None else None
    new_stats = _stats_pass(
        slim_df, row_cs, unique_cs, drift_spec, key, dup_counts, kll_col=kll_col,
        metric_cols=metric_cols,
    )
    new_stats = (
        new_stats.withColumn("run_id", F.lit(run_id))
        .withColumn("constraint_hash", F.lit(chash))
        .withColumn("n_buckets", F.lit(n_buckets))
        .withColumn("completed_at", F.lit(time.time()))
    )

    stats_snapshot = None
    if ledger is not None:
        stats_snapshot = ledger.append("bucket_stats", new_stats)
        all_stats = ledger.read("bucket_stats").filter(
            (F.col("constraint_hash") == chash) & (F.col("n_buckets") == n_buckets)
        )
    else:
        all_stats = new_stats

    # ---- idempotent merge: earliest run wins per bucket ----------------
    # ONE action returns both the per-bucket sketch rows and the
    # cross-bucket HLL union estimate (collect_list + hll_union_agg in
    # the same aggregate): a separate estimate job would re-run the
    # whole input scan (or force a persist) and add ~1s of fixed
    # per-pass job overhead that the N-vs-4N efficiency pays at 4N.
    # Past MERGE_COLLECT_MAX buckets the global collect_list would
    # funnel every sketch row through ONE final task (a straggler at
    # 10^4-10^5 buckets on a real cluster), so the merge tiers: level 1
    # groups ~sqrt(n_buckets) buckets per task (collect_list + partial
    # HLL union), the driver assembles the G small groups, and a tiny
    # local-list job finishes the HLL union over G sketches.
    merged = _dedupe_earliest(all_stats)
    if n_buckets <= MERGE_COLLECT_MAX:
        agg_row = merged.groupBy().agg(
            F.collect_list(F.struct(*merged.columns)).alias("rows"),
            F.hll_sketch_estimate(F.hll_union_agg("hll_key")).alias("est"),
        ).collect()[0]
        merged_rows = list(agg_row.rows)
        est = int(agg_row.est) if agg_row.est is not None else 0
    else:
        n_groups = max(int(math.isqrt(n_buckets)), 1)
        lvl1 = (
            merged.groupBy(F.pmod(F.col("bucket_id"), F.lit(n_groups)).alias("_g"))
            .agg(
                F.collect_list(F.struct(*merged.columns)).alias("rows"),
                F.hll_union_agg("hll_key").alias("hll_group"),
            )
            .collect()
        )
        merged_rows = [r for grp in lvl1 for r in grp.rows]
        group_sketches = [
            (bytes(grp.hll_group),) for grp in lvl1 if grp.hll_group is not None
        ]
        est = 0
        if group_sketches:
            est_df = spark.createDataFrame(group_sketches, "hll binary")
            est_val = est_df.agg(
                F.hll_sketch_estimate(F.hll_union_agg("hll"))
            ).collect()[0][0]
            est = int(est_val) if est_val is not None else 0

    # ---- baseline from a ledger snapshot (time travel) -----------------
    if baseline_hist is None and baseline_snapshot_id is not None:
        src = baseline_store or ledger
        if src is None:
            raise ValueError("baseline_snapshot_id requires a ledger or baseline_store")
        # filter to THIS constraint suite + bucketing before the merge:
        # a ledger holding appends from runs with a different constraint
        # hash or bucket count would otherwise silently mix incompatible
        # per-bucket histograms (colliding bucket_ids under different
        # bucketings) into the drift baseline
        prior = _dedupe_earliest(
            src.read("bucket_stats", snapshot_id=baseline_snapshot_id).filter(
                (F.col("constraint_hash") == chash) & (F.col("n_buckets") == n_buckets)
            )
        )
        n_cells = drift_spec.n_cells if drift_spec is not None else None
        hists = [
            list(r.hist)
            for r in prior.select("hist").collect()
            if r.hist is not None and (n_cells is None or len(r.hist) == n_cells)
        ]
        if not hists:
            raise ValueError(
                f"snapshot {baseline_snapshot_id} holds no histograms compatible "
                f"with the current drift spec ({n_cells} cells)"
            )
        baseline_hist = D.merge_histograms(hists)

    # ---- verdicts -------------------------------------------------------
    verdict_rows: list[tuple] = []
    n_rows_total = 0
    baseline = baseline_hist
    merged_hist: list[int] = []
    # compliance is counted per bucket (it rides the scan, checkpoints,
    # and resumes like every row constraint) but VERDICTED globally: a
    # per-bucket ratio would flip with bucket boundaries, so totals
    # accumulate here and one GLOBAL row is emitted after the loop
    compliance_cs = [c for c in row_cs if c.kind == "compliance"]
    compliance_totals = {c.cid: 0 for c in compliance_cs}
    for r in merged_rows:
        n_rows_total += r.n_rows
        vc = r.viol_counts or {}
        for c in row_cs + unique_cs:
            nv = int(vc.get(c.cid, 0))
            if c.kind == "compliance":
                compliance_totals[c.cid] += nv
                continue
            verdict_rows.append((int(r.bucket_id), c.cid, int(r.n_rows), nv, nv == 0))
        if drift_spec is not None and r.hist is not None:
            merged_hist = D.merge_histograms([merged_hist, list(r.hist)]) if merged_hist else list(r.hist)

    for c in compliance_cs:
        nv = compliance_totals[c.cid]
        # exact integer arithmetic (unbounded Python ints): a dataset
        # with exactly min_ratio compliant rows passes — the float
        # form (1-r)*n flips at the boundary (constraints.
        # compliance_fraction). Empty input fails: a ratio over
        # nothing asserts nothing (the metric_range contract).
        num, den = C.compliance_fraction(c)
        ok = n_rows_total > 0 and (n_rows_total - nv) * den >= num * n_rows_total
        verdict_rows.append((GLOBAL_BUCKET, c.cid, n_rows_total, nv, bool(ok)))

    sketch_metrics = {}
    if kll_col is not None and merged_rows:
        from kglids_spark.operators.sketches import merge_serialized

        blobs = [bytes(r.kll) for r in merged_rows if getattr(r, "kll", None) is not None]
        if blobs:
            q25, q50, q75 = merge_serialized(blobs).quantiles([0.25, 0.5, 0.75])
            mins = [r.v_min for r in merged_rows if r.v_min is not None]
            maxs = [r.v_max for r in merged_rows if r.v_max is not None]
            sketch_metrics = {
                f"{kll_col}_min": min(mins) if mins else None,
                f"{kll_col}_max": max(maxs) if maxs else None,
                f"{kll_col}_median_kll": q50,
                f"{kll_col}_iqr_kll": (q75 - q25) if q25 is not None else None,
            }

    metric_values: dict = {}
    if metric_cs:
        import math as _math

        for m in metric_cols:
            nn = sum(getattr(r, f"_m_nn_{m}", 0) or 0 for r in merged_rows)
            n = sum(getattr(r, f"_m_n_{m}", 0) or 0 for r in merged_rows)
            s = sum(getattr(r, f"_m_s_{m}", 0.0) or 0.0 for r in merged_rows)
            q = sum(getattr(r, f"_m_q_{m}", 0.0) or 0.0 for r in merged_rows)
            lows = [getattr(r, f"_m_lo_{m}", None) for r in merged_rows]
            highs = [getattr(r, f"_m_hi_{m}", None) for r in merged_rows]
            lows = [v for v in lows if v is not None]
            highs = [v for v in highs if v is not None]
            mean = s / n if n else None
            var = max(q / n - mean * mean, 0.0) if n else None
            metric_values[m] = {
                "null_rate": 1.0 - (nn / n_rows_total) if n_rows_total else None,
                "mean": mean,
                "stddev": _math.sqrt(var) if var is not None else None,
                "min": min(lows) if lows else None,
                "max": max(highs) if highs else None,
            }
        # empty input / all-null column -> stat is None -> verdict FAILS
        # (metric_range's documented contract); a verdict row is always
        # emitted, like schema constraints below
        for c in metric_cs:
            val = metric_values[c.column][c.params["stat"]]
            ok = val is not None and c.params["lo"] <= val <= c.params["hi"]
            verdict_rows.append(
                (GLOBAL_BUCKET, c.cid, n_rows_total, int(not ok), bool(ok))
            )

    # functional dependencies: GLOBAL properties (a new row can
    # contradict a row validated in a prior run), so they re-evaluate
    # over the FULL input each run — like drift, unlike row-level kinds.
    # The scan reads only determinant + dependent columns (pruned); one
    # map-side-combined groupBy shuffle per constraint; verdict counts
    # come from a single 1-row action over the grouped frame.
    fd_metrics: dict = {}
    fd_viol_frames: list[DataFrame] = []
    fd_grouped_persisted: list[DataFrame] = []
    for c in fd_cs:
        dets = list(c.params["determinants"])
        # conditional FD: the where predicate scopes BOTH the evidence
        # groupBy and the violation semi-join below (an out-of-scope
        # row must neither create a bad group nor be flagged by one)
        fd_df = df
        if c.params.get("where"):
            fd_df = fd_df.filter(F.expr(c.params["where"]))
        grouped = (
            fd_df.filter(F.col(c.column).isNotNull())
            .groupBy(*[F.col(d) for d in dets])
            .agg((F.min(c.column) != F.max(c.column)).alias("_fd_bad"))
        )
        if extract_violation_rows:
            grouped = grouped.persist()
            fd_grouped_persisted.append(grouped)
        row = grouped.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_fd_bad").cast("long")).alias("bad"),
        ).collect()[0]
        n_groups = int(row["n"] or 0)
        n_bad = int(row["bad"] or 0)
        verdict_rows.append((GLOBAL_BUCKET, c.cid, n_groups, n_bad, n_bad == 0))
        fd_metrics[c.cid] = n_bad
        if extract_violation_rows:
            bad_groups = grouped.filter(F.col("_fd_bad")).select(
                *[F.col(d).alias(f"_fd_det_{j}") for j, d in enumerate(dets)]
            )
            # null-safe equality: a NULL determinant forms its own group
            # (GROUP BY semantics), so its rows must match it in the
            # semi-join too — plain equi-join would drop them
            cond = None
            for j, d in enumerate(dets):
                term = fd_df[d].eqNullSafe(bad_groups[f"_fd_det_{j}"])
                cond = term if cond is None else (cond & term)
            fd_viol_frames.append(
                fd_df.join(bad_groups, cond, "left_semi").select(
                    F.col(key), F.lit(c.cid).alias("constraint_id")
                )
            )

    # volume: table-level row-count bound over the MERGED totals, so a
    # resumed run checks the bound against all buckets ever validated
    # under this constraint hash — zero extra scans
    for c in volume_cs:
        ok = c.params["lo"] <= n_rows_total <= c.params["hi"]
        verdict_rows.append(
            (GLOBAL_BUCKET, c.cid, int(n_rows_total), int(not ok), bool(ok))
        )

    drift_metrics = {}
    if drift_cs and merged_hist:
        if baseline is None:
            baseline = merged_hist  # self-comparison => trivially passing
        for c in drift_cs:
            # Drift is a table-level property: per-bucket histograms are
            # kept only as mergeable sketches. Per-bucket PSI/KS verdicts
            # would fail from sampling noise alone on small buckets
            # (observed: clean 625-row buckets exceed PSI 0.2 vs the
            # global distribution purely from epsilon-smoothed noise).
            gstat = (
                D.ks_statistic(merged_hist, baseline)
                if c.kind == "drift_ks"
                else D.psi(merged_hist, baseline)
            )
            thr = c.params["threshold"]
            verdict_rows.append((GLOBAL_BUCKET, c.cid, n_rows_total, int(gstat > thr), gstat <= thr))
            drift_metrics[c.cid] = gstat

    # per-group drift localization (drift_by): same resolved baseline,
    # same thresholds as the global verdict; stays a lazy DataFrame —
    # nothing per-group ever reaches the driver here
    group_drift = None
    if drift_by_df is not None and drift_cs and merged_hist:
        ks_thr = next(
            (c.params["threshold"] for c in drift_cs if c.kind == "drift_ks"), 0.1
        )
        psi_thr = next(
            (c.params["threshold"] for c in drift_cs if c.kind == "drift_psi"), 0.2
        )
        group_drift = D.grouped_drift(
            drift_by_df,
            drift_spec,
            baseline if baseline is not None else merged_hist,
            drift_by,
            ks_threshold=ks_thr,
            psi_threshold=psi_thr,
        )

    # schema constraints: table-level verdicts
    schema_fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in schema_cs:
        ok = schema_fields.get(c.column) == c.params["expected"]
        verdict_rows.append((GLOBAL_BUCKET, c.cid, 1, int(not ok), ok))

    verdicts = spark.createDataFrame(verdict_rows, VERDICT_SCHEMA)

    # ---- violation rows --------------------------------------------------
    # Incremental when a ledger is present: extract only for buckets not
    # already validated, append to the ledger, and return the merged set
    # — a resumed run never re-extracts completed buckets.
    if extract_violation_rows:
        # slim_df covers exactly the remaining (unvalidated) buckets, so
        # a resumed run never re-extracts completed ones
        viols_new = C.extract_violations(slim_df, row_cs, key=key)
        for uc in unique_cs:
            if dup_counts is not None and uc.column == key:
                uviol = dup_counts.select(
                    F.col(key), F.lit(uc.cid).alias("constraint_id")
                )
            else:
                _, uviol = C.evaluate_uniqueness(slim_df, uc.column, BUCKET_COL)
                if uc.column != key:
                    uviol = uviol.withColumnRenamed(uc.column, key)
            viols_new = viols_new.unionByName(uviol)
        # deterministic per-constraint cap (hash-minimum selection, the
        # verdict-identity discipline): verdict COUNTS are unaffected —
        # they come from the stats pass — only the materialized row
        # sample is bounded. Applied before the ledger append, so the
        # ledger stores <= cap rows per constraint per run.
        if max_violations_per_constraint is not None:
            viols_new = C.cap_violations(
                viols_new, max_violations_per_constraint, key=key
            )
        if ledger is not None:
            ledger.append(
                "violations",
                viols_new.withColumn("constraint_hash", F.lit(chash))
                .withColumn("n_buckets", F.lit(n_buckets))
                .withColumn("run_id", F.lit(run_id)),
            )
            viols = (
                ledger.read("violations")
                .filter((F.col("constraint_hash") == chash) & (F.col("n_buckets") == n_buckets))
                .select(key, "constraint_id")
            )
            # re-cap the MERGED read: each resumed run appends its own
            # <= cap rows per constraint, so the union can exceed the
            # cap — the returned set must honor it (deterministic:
            # hash-minimum over the merged rows)
            if max_violations_per_constraint is not None:
                viols = C.cap_violations(
                    viols, max_violations_per_constraint, key=key
                )
        else:
            # materialize now, while the slim frame is still cached —
            # otherwise the lazy violations frame would re-scan the
            # input after slim_df is unpersisted below
            viols = viols_new.persist()
            viols.count()
        # FD violation rows are recomputed per run (global property) and
        # unioned into the RESULT only — never appended to the ledger,
        # which would duplicate them across resumed runs. Materialized
        # eagerly so the persisted grouped frames can be released.
        for fv in fd_viol_frames:
            if max_violations_per_constraint is not None:
                fv = C.cap_violations(fv, max_violations_per_constraint, key=key)
            fv = fv.persist()
            fv.count()
            viols = viols.unionByName(fv)
        for g in fd_grouped_persisted:
            g.unpersist()
    else:
        viols = spark.createDataFrame([], f"{key} string, constraint_id string")

    # ---- lineage metrics -------------------------------------------------
    if extract_violation_rows:
        slim_df.unpersist()
    if dup_counts is not None:
        dup_counts.unpersist()
    elapsed = time.time() - t_start
    # executor metrics ride the lineage row (north_star: "lineage
    # (snapshot id, constraint-set hash, executor metrics)"); guarded —
    # the py4j status APIs are best-effort across Spark builds
    exec_metrics: dict = {}
    try:
        sc = spark.sparkContext
        exec_metrics = {
            "n_executors": int(sc._jsc.sc().getExecutorMemoryStatus().size()),
            "default_parallelism": int(sc.defaultParallelism),
            "master": sc.master,
        }
    except Exception:  # pragma: no cover
        pass
    metrics = {
        "run_id": run_id,
        "constraint_hash": chash,
        "n_buckets": n_buckets,
        "buckets_completed_prior": len(completed),
        "buckets_this_run": len(merged_rows) - len(completed),
        "rows_validated": int(n_rows_total),
        "distinct_key_estimate": int(est),
        "elapsed_sec": elapsed,
        "sequences_per_sec": (int(n_rows_total) / elapsed) if elapsed > 0 else 0.0,
        **({"stats_snapshot": stats_snapshot} if stats_snapshot else {}),
        **({"executors": exec_metrics} if exec_metrics else {}),
        **sketch_metrics,
        **drift_metrics,
        **fd_metrics,
        **{
            f"{stat}({m})": v
            for m, stats_ in metric_values.items()
            for stat, v in stats_.items()
            if v is not None
        },
    }
    if ledger is not None:
        lineage = spark.createDataFrame(
            # json, not repr: the cli history surface promises
            # machine-readable lines, and a repr string forces
            # consumers into ast.literal_eval
            [(run_id, chash, n_buckets, time.time(), json.dumps(metrics, default=str))],
            "run_id string, constraint_hash string, n_buckets int, ts double, metrics string",
        )
        ledger.append("runs", lineage)
    return ValidationResult(
        verdicts=verdicts, violations=viols, metrics=metrics, group_drift=group_drift
    )
