"""Sequence packing: assign documents to fixed-capacity training bins.

A 10^12-token pretraining pipeline packs tokenized documents into
fixed-length context windows (e.g. 8192 tokens). The natural layout is
a GLOBAL running sum of n_tok in a deterministic document order, with
bin_id = floor(running_sum_before_doc / seq_len) — but a naive
``Window.orderBy(...)`` with no partition key collapses the whole table
into ONE task (Spark warns WindowExec: "No Partition Defined"), which
is a non-starter at scale.

Scale design — the classic two-phase distributed prefix sum:
1. per-bucket partial sums: one map-side-combined groupBy over the
   logical buckets (plans/buckets.bucket_expr ordering is NOT used here
   — packing needs a TOTAL order, so buckets are contiguous ranges of
   the sort key, derived from a deterministic hash prefix);
2. the n_buckets partial sums (tiny) come to the driver, a running
   offset per bucket is computed and joined back (broadcast);
3. intra-bucket running sums use a per-bucket window (parallel across
   buckets), + the bucket's offset = the exact global prefix sum.

The result is identical to the single-task global window for any
bucket count (tested), so verdict-style identity holds under N vs 4N
parallelism.

No reference analog (the reference profiles CSV lakes, it does not
build training batches); this is part of the beyond-reference
training-pipeline family (driver brief), next to dedup/ANN/text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_RANGE_BUCKETS = 256


def _order_key(key: str) -> F.Column:
    # deterministic, data-independent total order: hash of the doc key
    # (spreads adjacent source docs across bins — the usual shuffle-
    # before-pack); ties broken by the key itself. The unsigned shift
    # keeps the key non-negative so Spark's SIGNED long sort agrees
    # with the top-bits range bucketing below.
    return F.shiftrightunsigned(F.xxhash64(F.col(key)), 1)


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    *,
    key: str = "doc_id",
    n_tok_col: str = "n_tok",
    n_buckets: int = DEFAULT_RANGE_BUCKETS,
    order_col: F.Column | None = None,
    bucket_col: F.Column | None = None,
) -> DataFrame:
    """Assign each document the training bin where it STARTS under
    greedy concatenation in a deterministic global order.

    Returns the input columns + ``pack_offset`` (global token offset of
    the document's first token) + ``bin_id`` (= pack_offset // seq_len)
    + ``bin_pos`` (token offset within the bin). Documents may span
    bins (offset + n_tok can cross a boundary) — splitting is the
    reader's job; the assignment here is exact and total-order stable.

    Custom ordering: pass ``order_col`` (any orderable type) together
    with ``bucket_col``, a coarse int key that is MONOTONE in
    ``order_col`` (every row of bucket b sorts before every row of
    b+1) — e.g. an md5-hex order with its first byte as bucket for a
    cross-engine-portable layout. Default: xxhash64-derived order with
    top-16-bit range buckets.
    """
    if (order_col is None) != (bucket_col is None):
        raise ValueError("order_col and bucket_col must be passed together")
    if order_col is None:
        okey = _order_key(key)
        # contiguous range buckets over the hash order: the top 16 bits
        # of the 63-bit order key → bucket b holds exactly the keys
        # that sort between buckets b-1 and b+1 (monotone in okey), so
        # per-bucket sums compose into a global prefix
        top16 = F.shiftrightunsigned(okey, 63 - 16)  # [0, 2^16)
        bkt = F.floor(top16 * n_buckets / (1 << 16)).cast("int")
    else:
        okey, bkt = order_col, bucket_col.cast("int")
    df_b = df.withColumn("_pack_bucket", bkt).withColumn("_okey", okey)

    # phase 1: per-bucket totals (map-side combined; n_buckets rows)
    totals = (
        df_b.groupBy("_pack_bucket")
        .agg(F.sum(n_tok_col).alias("_bucket_tokens"))
        .collect()
    )
    # phase 2: driver-side running offsets over the observed buckets
    # (plans/offsets.py — sorted numpy exclusive cumsum, no Python
    # loop; see test_packing large-bucket property test)
    from kglids_spark.plans.offsets import exclusive_offsets

    offs = exclusive_offsets(
        [(r._pack_bucket, int(r._bucket_tokens or 0)) for r in totals]
    )
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(offs, "_pack_bucket int, _bucket_offset long")
    )

    # phase 3: intra-bucket exclusive running sum (parallel windows)
    w = (
        Window.partitionBy("_pack_bucket")
        .orderBy("_okey", key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum(n_tok_col).over(w), F.lit(0))
    out = (
        df_b.join(off_df, "_pack_bucket")
        .withColumn("pack_offset", (F.col("_bucket_offset") + within).cast("long"))
        # integral `div`, NOT `/`: long / int is double-valued in Spark
        # and loses exactness past ~2^53 — at which point bin_id stops
        # matching floor(pack_offset / seq_len) and the row lands in
        # the wrong bin
        .withColumn("bin_id", F.expr(f"pack_offset div {int(seq_len)}"))
        .withColumn("bin_pos", F.pmod(F.col("pack_offset"), F.lit(seq_len)).cast("int"))
        .drop("_pack_bucket", "_okey", "_bucket_offset")
    )
    return out


def bin_fill_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-bin packing diagnostics: docs starting in the bin and tokens
    contributed by those docs (> seq_len means the tail spills into the
    next bin; the packer allows spanning)."""
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("docs_started"),
            F.sum("n_tok").alias("tokens_started"),
            F.min("bin_pos").alias("first_pos"),
        )
        .withColumn("capacity", F.lit(seq_len))
    )


def chunk_sequences(
    df: DataFrame,
    max_len: int,
    stride: int | None = None,
    min_len: int = 1,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Split each token sequence into fixed-length windows — the
    universal pre-packing step for documents longer than the model
    context (disjoint chunks at the default stride = max_len;
    overlapping sliding windows at stride < max_len, the standard
    eval/perplexity protocol). Returns
    (id, chunk_id, tokens, n_tok) with chunk_id 0-based in document
    order; trailing chunks shorter than ``min_len`` are dropped.
    NULL/empty token arrays yield no chunks.

    Pure map-side expression — chunk starts come from ``sequence``
    over the ONCE-projected token array (the split_words discipline),
    each chunk is a ``slice``, and the explode emits rows where the
    input partition lives. Zero shuffle."""
    if max_len <= 0:
        raise ValueError(f"max_len must be positive, got {max_len}")
    if stride is None:
        stride = max_len
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    if not 1 <= min_len <= max_len:
        raise ValueError(f"min_len must be in [1, {max_len}], got {min_len}")
    base = df.select(F.col(id_col).alias("id"), F.col(tokens_col).alias("_t"))
    t = F.col("_t")
    starts = F.when(
        F.size(t) >= 1, F.sequence(F.lit(0), F.size(t) - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.filter(
        F.transform(starts, lambda s: F.slice(t, s + 1, max_len)),
        lambda c: F.size(c) >= min_len,
    )
    out = base.select(
        "id", F.posexplode(chunks).alias("chunk_id", tokens_col)
    )
    return out.select(
        F.col("id").alias(id_col),
        "chunk_id",
        tokens_col,
        F.size(tokens_col).alias("n_tok"),
    )
