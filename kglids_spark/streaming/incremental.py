"""Incremental validation with Structured Streaming.

The reference is batch-only (SURVEY.md §2.8); its closest incremental
behaviors are skip-existing-profiles (profile_data.py:66-84) and the
on-demand Flask profiler (kglids_server.py:70-99). This module gives
the engine a streaming ingestion path anyway, because a 10^12-row
training table is appended continuously in practice:

- validate_stream: file-source stream over a tokens directory →
  foreachBatch(validate) → each micro-batch appends verdicts to the
  same resumable ledger as batch runs (exactly-once per bucket via the
  idempotent sketch merge; the stream checkpoint gives at-least-once
  batch delivery, and the ledger dedupe makes the merge idempotent).
- windowed_event_counts: watermarked tumbling-window aggregation, the
  canonical late-data pattern, used by tests as a streaming smoke.
- stateful_sessionize: custom stateful operator via
  applyInPandasWithState — per-user session counting with an explicit
  cross-batch state struct (the batch twin is entry_queries
  sessionize_events, lag + gap-flag cumsum).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kglids_spark.operators import constraints as C
from kglids_spark.operators.validate import validate
from kglids_spark.sources.tables import TableStore
from kglids_spark.sources.tokens import TOKENS_SCHEMA


def validate_stream(
    spark: SparkSession,
    input_dir: str,
    ledger_root: str,
    constraints: list[C.Constraint],
    checkpoint_dir: str,
    n_buckets: int = 64,
    trigger_once: bool = True,
):
    """Stream new parquet files from ``input_dir`` through the batch
    validator. Returns the StreamingQuery (caller stops it)."""
    stream = spark.readStream.schema(TOKENS_SCHEMA).parquet(input_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        ledger = TableStore(batch_df.sparkSession, ledger_root)
        validate(
            batch_df,
            constraints,
            n_buckets=n_buckets,
            ledger=ledger,
            run_id=f"stream-epoch-{epoch_id}",
            extract_violation_rows=False,
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_sessionize(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-user session counts as a custom stateful streaming operator
    (applyInPandasWithState). State per user = (last event epoch,
    sessions so far, events so far); a new session starts when the gap
    from the previous event exceeds ``gap_seconds``. Each micro-batch
    emits the user's running totals (update semantics) — on a fully
    drained, time-ordered input the final row per user equals the
    batch lag+cumsum sessionization (entry_queries.sessionize_events).

    The per-batch work is vectorized numpy over the Arrow batch (diff
    against the previous-event epoch), not a per-row Python loop; the
    state struct is what Spark checkpoints, so a restarted stream
    resumes session counting without reprocessing history.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            ts = pdf["ts"].to_numpy().astype("datetime64[s]").astype("int64")
            first_prev = ts[0] - gap_seconds - 1 if last_ts is None else last_ts
            prev = np.concatenate(([first_prev], ts[:-1]))
            n_sessions += int((ts - prev > gap_seconds).sum())
            n_events += len(ts)
            last_ts = int(ts[-1])
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_sessions long, n_events long",
        stateStructType="last_ts long, n_sessions long, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_exact(
    docs_stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup for continuously-ingested corpora:
    normalize → md5 content digest → ``dropDuplicatesWithinWatermark``
    on the digest. State is BOUNDED — Spark evicts digest state older
    than the watermark, so this holds on an unbounded stream where a
    plain ``dropDuplicates`` would grow state forever; duplicates
    arriving within the watermark of the first copy are dropped
    exactly, later re-arrivals are a documented (and at training-data
    scale, desired-cheap) miss that the periodic batch pass
    (dedup.exact_duplicates, its batch twin) catches. Emits the first
    arrival of each digest unchanged."""
    from kglids_spark.operators.text import content_digest_expr

    s = docs_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withColumn(
        "digest", content_digest_expr(F.col(text_col))
    )
    return s.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["digest"])


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the standard
    late-data-tolerant streaming aggregate."""
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def fd_monitor_stream(
    rows_stream: DataFrame,
    determinant: str,
    dependent: str,
) -> DataFrame:
    """Incremental functional-dependency monitor: per determinant key,
    stateful (lo, hi) bounds over the non-null dependent values seen so
    far (applyInPandasWithState) — a violation surfaces the moment any
    batch makes lo != hi, INCLUDING cross-batch contradictions the
    per-batch twin (constraints.fd_violating_groups on the batch) cannot
    see. Emits (determinant, violated, n_rows) updates per key per
    batch; state per key is two strings, so memory is
    O(distinct determinants), the same bound the batch evaluator's
    groupBy carries.

    This is the streaming face of the batch ``fd`` constraint kind
    (validate.py) — the batch path re-evaluates globally per run; this
    localizes WHICH ingestion batch first broke the dependency. NULL
    determinants: Spark's groupBy-with-state keys NULL like GROUP BY,
    matching the batch semantics; NULL dependents carry no evidence and
    are filtered before grouping."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    if determinant in ("violated", "n_rows"):
        raise ValueError(
            f"determinant column {determinant!r} collides with the "
            "monitor's output columns — rename it upstream"
        )

    def fn(key, pdfs, state):
        lo, hi, n = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            vals = pdf[dependent].dropna()
            n += len(pdf)
            if len(vals):
                bmin, bmax = str(vals.min()), str(vals.max())
                lo = bmin if lo is None or bmin < lo else lo
                hi = bmax if hi is None or bmax > hi else hi
        state.update((lo, hi, n))
        yield pd.DataFrame(
            {
                determinant: [key[0]],
                "violated": [lo is not None and lo != hi],
                "n_rows": [n],
            }
        )

    src = rows_stream.filter(F.col(dependent).isNotNull()).select(
        F.col(determinant), F.col(dependent).cast("string").alias(dependent)
    )
    det_type = rows_stream.schema[determinant].dataType.simpleString()
    # backtick-quote the interpolated name: a determinant like
    # 'user-id' or 'order col' is a legal DataFrame column but would
    # fail bare-DDL parsing
    quoted = f"`{determinant}`"
    return src.groupBy(determinant).applyInPandasWithState(
        fn,
        outputStructType=f"{quoted} {det_type}, violated boolean, n_rows long",
        stateStructType="lo string, hi string, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def quality_filter_stream(
    spark: SparkSession,
    input_dir: str,
    weights: dict,
    bias: float,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: str = "xxhash64",
    buckets: int = 8192,
    md5_width: int = 2,
    trigger_once: bool = True,
):
    """Streaming quality gate: each ingestion micro-batch is scored
    under a FIXED pre-trained hashed-n-gram LR model
    (quality_classifier.score_quality_lr — the model was fit offline
    by train_quality_lr and broadcasts into every batch), surviving
    documents (quality_prob >= threshold) land under
    ``out_dir``/docs and a one-row verdict (epoch, n_docs, n_kept,
    mean_prob) under ``out_dir``/verdicts — so a quality regression is
    localized to the ingestion batch that shipped it, which the batch
    scorer (a whole-table statement) cannot do.

    foreachBatch keeps the scoring in the batch engine (the per-doc
    aggregation is map-side-combined; no streaming state grows), and
    both writes use dynamic epoch-partition overwrite so an
    at-least-once batch replay replaces its own output instead of
    duplicating it (the drift_monitor_stream discipline)."""
    from kglids_spark.operators.quality_classifier import score_quality_lr

    schema = spark.read.parquet(input_dir).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        scored = score_quality_lr(
            batch_df,
            weights,
            bias,
            text_col=text_col,
            id_col=id_col,
            hasher=hasher,
            buckets=buckets,
            md5_width=md5_width,
        )
        joined = batch_df.join(scored, id_col)
        kept = joined.filter(F.col("quality_prob") >= threshold).withColumn(
            "epoch", F.lit(int(epoch_id))
        )
        kept.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("epoch").parquet(f"{out_dir}/docs")
        row = joined.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("quality_prob") >= threshold).cast("long")
            ).alias("n_kept"),
            F.avg("quality_prob").alias("mean_prob"),
        ).collect()[0]
        sess.createDataFrame(
            [
                (
                    int(epoch_id),
                    int(row.n_docs),
                    int(row.n_kept or 0),
                    float(row.mean_prob) if row.mean_prob is not None else None,
                )
            ],
            "epoch long, n_docs long, n_kept long, mean_prob double",
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("epoch").parquet(f"{out_dir}/verdicts")

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def near_dup_filter_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    trigger_once: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming incremental NEAR-dup gate: each ingestion micro-batch
    is screened against the MinHash-signature ledger of everything the
    stream has already admitted (dedup.incremental_dedup_minhash —
    LSH band-bucket candidates + signature-Jaccard verify), then
    within-batch near-dups collapse to their keep-min-id survivor
    (dedup.fuzzy_dedup_survivors). Survivors land under
    ``out_dir``/docs and their signatures extend the ledger under
    ``out_dir``/sig_ledger, so admission is monotone: once a document
    ships, every later near-duplicate of it is dropped, across any
    number of batches, without ever re-reading shipped text —
    streaming_dedup_exact's bounded-watermark state cannot give that
    guarantee for REWORDED re-crawls, and its exact-digest key misses
    them entirely.

    State is the ledger, not the stream engine: foreachBatch keeps
    every join in the batch engine (the ledger is scanned map-side
    against the broadcast batch buckets — see incremental_dedup_minhash
    for the 10^12-row plan), and both writes are epoch-partitioned
    with dynamic overwrite so an at-least-once batch replay replaces
    its own output and its own ledger shard instead of duplicating
    either (the quality_filter_stream discipline). A replayed batch
    re-reads a ledger that may already contain its own epoch's
    signatures — harmless: self-pairs estimate Jaccard 1.0 only for
    docs already shipped BY that epoch, which the overwrite replaces
    wholesale. The (num_perm, bands, shingle_n, seed, threshold)
    tuple is the ledger's contract; changing it against an existing
    ledger produces incomparable signatures (minhash_dedup_ledger
    docstring), so it is pinned in a params.json the stream refuses
    to contradict."""
    import json
    import os

    from kglids_spark.operators import dedup as DD

    params = {
        "num_perm": num_perm,
        "bands": bands,
        "shingle_n": shingle_n,
        "seed": seed,
        "threshold": threshold,
    }
    params_path = os.path.join(out_dir, "params.json")
    if os.path.exists(params_path):
        with open(params_path) as f:
            prior = json.load(f)
        if prior != params:
            raise ValueError(
                f"near_dup_filter_stream: ledger at {out_dir} was built "
                f"with {prior}, got {params} — signatures are "
                "incomparable across parameter changes; use a fresh "
                "out_dir or the ledger's parameters"
            )
    else:
        os.makedirs(out_dir, exist_ok=True)
        with open(params_path, "w") as f:
            json.dump(params, f)

    schema = spark.read.parquet(input_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # bounds per-epoch work (and, with availableNow, drains the
        # backlog as a SEQUENCE of micro-batches instead of one big one
        # — each later file then really screens against the earlier
        # files' ledger)
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    ledger_dir = f"{out_dir}/sig_ledger"
    docs_dir = f"{out_dir}/docs"

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        kw = dict(
            text_col=text_col,
            id_col=id_col,
            num_perm=num_perm,
            shingle_n=shingle_n,
            seed=seed,
        )
        try:
            ledger = sess.read.parquet(ledger_dir).where(
                F.col("epoch") != int(epoch_id)
            ).select("id", "sig")
        except Exception:
            ledger = None  # first batch: no ledger yet
        batch = DD.fuzzy_dedup_survivors(
            batch_df, bands=bands, threshold=threshold, **kw
        )
        kept = DD.incremental_dedup_minhash(
            batch, ledger, bands=bands, threshold=threshold, **kw
        )
        kept.withColumn("epoch", F.lit(int(epoch_id))).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "epoch"
        ).parquet(docs_dir)
        # survivors' signatures extend the ledger (epoch-partitioned:
        # a replay overwrites its own shard). Read back from the docs
        # shard just written so the signature pass scans the small
        # survivor set, not the raw batch.
        shipped = sess.read.parquet(docs_dir).where(F.col("epoch") == int(epoch_id))
        DD.minhash_dedup_ledger(shipped, **kw).withColumn(
            "epoch", F.lit(int(epoch_id))
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("epoch").parquet(ledger_dir)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drift_monitor_stream(
    spark: SparkSession,
    input_dir: str,
    baseline_hist: list[int],
    spec,
    out_dir: str,
    checkpoint_dir: str,
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.2,
    trigger_once: bool = True,
    group_col: str | None = None,
):
    """Per-micro-batch distribution-drift monitor: each batch's
    histogram (one map-side indicator-sum aggregate, drift.py:39-60)
    is compared against a FIXED baseline histogram (e.g. resolved from
    a ledger snapshot, the batch path's "KS/PSI vs a baseline Iceberg
    snapshot") and a one-row verdict (epoch, n_rows, ks, psi, passes)
    is appended to ``out_dir`` as parquet. The stream thereby flags
    WHICH ingestion batch drifted, which the batch validator — a
    whole-table statement — cannot localize.

    ``group_col`` sharpens the localization one level further — WHICH
    FEED inside the batch drifted: verdict rows become one per
    (epoch, group) via drift.grouped_drift, whose KS/PSI folds reduce
    entirely in-plan, so even a million-feed batch never collects
    per-group rows to the driver (the parquet write streams from the
    executors; semantics stay pinned to evaluate_drift by the batch
    operator's tests).

    foreachBatch keeps the heavy work in the batch engine: the
    histogram aggregate is the same O(n_cells)-row reduction as the
    batch drift pass, so state never grows with the stream."""
    from kglids_spark.operators import drift as D

    stream = spark.readStream.schema(TOKENS_SCHEMA).parquet(input_dir)

    def process_grouped(batch_df: DataFrame, epoch_id: int) -> None:
        g = D.grouped_drift(
            batch_df, spec, baseline_hist, group_col, ks_threshold, psi_threshold
        ).withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
        # same idempotent replay discipline as the global path: the
        # dynamic overwrite replaces exactly this epoch's partition
        g.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("epoch").parquet(out_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        row = batch_df.agg(
            D.histogram_array_expr(spec).alias("hist"),
            F.count(F.lit(1)).alias("n_rows"),
        ).collect()[0]
        verdict = D.evaluate_drift(
            list(row.hist), baseline_hist, ks_threshold, psi_threshold
        )
        # idempotent under foreachBatch's at-least-once replay: the
        # write overwrites only THIS epoch's partition, so a batch
        # re-run after a crash-before-checkpoint replaces its verdict
        # row instead of appending a duplicate
        sess.createDataFrame(
            [
                (
                    int(epoch_id),
                    int(row.n_rows),
                    float(verdict["ks"]),
                    float(verdict["psi"]),
                    bool(verdict["ks_pass"]),
                    bool(verdict["psi_pass"]),
                )
            ],
            "epoch long, n_rows long, ks double, psi double, ks_pass boolean, psi_pass boolean",
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("epoch").parquet(out_dir)

    writer = (
        stream.writeStream.foreachBatch(
            process if group_col is None else process_grouped
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def token_drift_monitor_stream(
    spark: SparkSession,
    input_dir: str,
    baseline_cells: list[int],
    out_dir: str,
    checkpoint_dir: str,
    array_col: str = "tokens",
    vocab_size: int = 50257,
    nbins: int = 64,
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.2,
    trigger_once: bool = True,
    group_col: str | None = None,
):
    """Per-micro-batch TOKEN-ID distribution drift: each batch's
    vocabulary-usage histogram (drift.token_histogram_df — the explode
    combines map-side into ≤ nbins+2 cells, so only a dictionary ever
    leaves the executors) is compared against a fixed baseline
    snapshot's cells, appending one verdict row (epoch, n_docs,
    n_tokens, ks, psi, passes) per batch. This catches WHICH ingestion
    batch swapped tokenizers / remapped the vocabulary — the failure
    mode the scalar n_tok monitor (drift_monitor_stream) is blind to,
    localized the way the batch-path token_distribution_drift (a
    whole-table statement) cannot.

    Statistics and cell layout are shared verbatim with the batch
    operator (token_distribution_drift calls the same ks_statistic /
    psi over the same bucketing), so the stream's verdicts are pinned
    to the batch twin's on identical rows. Idempotent under
    foreachBatch's at-least-once replay: the per-epoch dynamic
    overwrite replaces exactly this epoch's verdict partition.

    ``group_col`` sharpens the localization one level further — WHICH
    FEED inside the batch swapped tokenizers: verdict rows become one
    per (epoch, group) via drift.grouped_token_drift, whose KS/PSI
    folds reduce entirely in-plan (the parquet write streams from the
    executors; a million-feed batch never collects per-group rows to
    the driver)."""
    from kglids_spark.operators import drift as D

    if len(baseline_cells) > nbins + 2:
        raise ValueError(
            f"baseline has {len(baseline_cells)} cells, expected <= {nbins + 2}"
        )

    stream = spark.readStream.schema(TOKENS_SCHEMA).parquet(input_dir)

    def process_grouped(batch_df: DataFrame, epoch_id: int) -> None:
        g = D.grouped_token_drift(
            batch_df,
            baseline_cells,
            group_col,
            array_col=array_col,
            vocab_size=vocab_size,
            nbins=nbins,
            ks_threshold=ks_threshold,
            psi_threshold=psi_threshold,
        ).withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
        g.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("epoch").parquet(out_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        n_docs = batch_df.count()
        verdict = D.token_distribution_drift(
            batch_df,
            baseline_cells,
            array_col=array_col,
            vocab_size=vocab_size,
            nbins=nbins,
            ks_threshold=ks_threshold,
            psi_threshold=psi_threshold,
        )
        sess.createDataFrame(
            [
                (
                    int(epoch_id),
                    int(n_docs),
                    int(sum(verdict["cells"])),
                    float(verdict["ks"]),
                    float(verdict["psi"]),
                    bool(verdict["ks_pass"]),
                    bool(verdict["psi_pass"]),
                )
            ],
            "epoch long, n_docs long, n_tokens long, ks double, psi double, "
            "ks_pass boolean, psi_pass boolean",
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("epoch").parquet(out_dir)

    writer = (
        stream.writeStream.foreachBatch(
            process if group_col is None else process_grouped
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compliance_monitor_stream(
    spark: SparkSession,
    input_dir: str,
    constraints: list,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    files_per_trigger: int | None = None,
):
    """Incremental ratio-compliance gate: each micro-batch counts its
    violations for every compliance constraint and the verdict is
    CUMULATIVE — the pass/fail reflects all rows ever streamed, which
    is the batch operator's global-ratio semantics (a per-batch ratio
    would flap on small batches; the question "is ≥ 99% of everything
    we ingested compliant" has one running answer). Appends one row
    per (epoch, constraint): n_rows, n_violations, cum_rows,
    cum_violations, passed.

    State lives in the output table itself: the cumulative totals
    re-derive from prior epochs' rows (epoch < current), so the
    foreachBatch needs no state store and the per-epoch dynamic
    overwrite keeps replays idempotent — a crashed epoch re-runs,
    re-reads the SAME prior rows, and replaces its own partition.
    The pass rule is the engine's exact integer boundary comparison
    (constraints.compliance_fraction). ``files_per_trigger`` bounds
    each micro-batch for testing multi-epoch behavior."""
    from kglids_spark.operators import constraints as C

    comp = [c for c in constraints if c.kind == "compliance"]
    if not comp or len(comp) != len(constraints):
        raise ValueError(
            "compliance_monitor_stream takes compliance constraints only "
            f"(got kinds {sorted({c.kind for c in constraints})})"
        )
    fracs = {c.cid: C.compliance_fraction(c) for c in comp}

    reader = spark.readStream.schema(TOKENS_SCHEMA)
    if files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(files_per_trigger))
    stream = reader.parquet(input_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.sum(C.violation_expr(c, batch_df).cast("long")).alias(f"_v{i}")
            for i, c in enumerate(comp)
        ]
        row = batch_df.agg(*aggs).collect()[0]
        prior = {c.cid: (0, 0) for c in comp}
        try:
            # epoch < current: replays re-read the same prior rows and
            # replace their own partition — idempotent by construction
            for r in (
                sess.read.parquet(out_dir)
                .filter(F.col("epoch") < int(epoch_id))
                .groupBy("constraint_id")
                .agg(
                    F.sum("n_rows").alias("n"), F.sum("n_violations").alias("v")
                )
                .collect()
            ):
                prior[r.constraint_id] = (int(r.n or 0), int(r.v or 0))
        except AnalysisException as ex:
            # ONLY the first epoch's missing output table is benign; a
            # torn footer / listing failure must raise — swallowing it
            # would silently reset the cumulative totals and let a
            # failing stream report passed=True (review r5)
            msg = str(ex)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
        out_rows = []
        n = int(row["_n"] or 0)
        for i, c in enumerate(comp):
            nv = int(row[f"_v{i}"] or 0)
            pn, pv = prior.get(c.cid, (0, 0))
            cum_n, cum_v = pn + n, pv + nv
            num, den = fracs[c.cid]
            ok = cum_n > 0 and (cum_n - cum_v) * den >= num * cum_n
            out_rows.append(
                (int(epoch_id), c.cid, n, nv, cum_n, cum_v, bool(ok))
            )
        sess.createDataFrame(
            out_rows,
            "epoch long, constraint_id string, n_rows long, n_violations long, "
            "cum_rows long, cum_violations long, passed boolean",
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("epoch").parquet(out_dir)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
