"""Single-pass column profiler.

Replaces the reference's one-pandas-task-per-column profiler, which
re-reads a k-column CSV k times (reference: kg_governor/data_profiling/
profile_data.py:89-135 — the I/O pathology called out in SURVEY.md
§3.1). Here every statistic for every column is an aggregate expression
in ONE ``df.agg(...)`` pass: Catalyst prunes the scan to referenced
columns, computes partial aggregates map-side (whole-stage codegen, no
Python in the loop), and a single-row result comes back to the driver,
which unpivots it into one profile row per column.

Profile record fields mirror the reference's ColumnProfile
(kg_governor/data_profiling/model/column_profile.py:8-56):
data_type, total_values_count, distinct_values_count,
missing_values_count, true_ratio, min_value, max_value, mean, median,
iqr. Embedding fields are out of scope (model weights absent from the
reference checkout — .MISSING_LARGE_BLOBS).

Fine-grained type detection (reference: kg_governor/data_profiling/
fine_grained_type_detector.py:16-41) is re-expressed as vectorized
signals in the same pass:
  - int column with value set within {0,1}        -> boolean
  - string column fully numeric-castable          -> int/float
  - string column >50% date-parseable             -> date
  - everything else                               -> string
ML-based natural_language/named_entity types are a documented
divergence (they need fastText/spaCy weights); such columns profile as
`string`.
"""

from __future__ import annotations

from urllib.parse import quote_plus

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# NA markers coerced to null at read time (reference: profile_data.py:111-116)
NA_MARKERS = [" ", "?", "-"]

# formats accepted by the date detector; the reference uses the
# `dateparser` library (locale en-CA, strict) — divergence documented in
# SURVEY.md §2.7 F5.
DATE_FORMATS = [
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "MM/dd/yyyy",
    "dd-MM-yyyy",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
]

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("column_id", T.StringType(), False),
        T.StructField("dataset_id", T.StringType(), True),
        T.StructField("table_id", T.StringType(), False),
        T.StructField("column_name", T.StringType(), False),
        T.StructField("data_type", T.StringType(), False),
        T.StructField("total_values_count", T.LongType(), True),
        T.StructField("distinct_values_count", T.LongType(), True),
        T.StructField("missing_values_count", T.LongType(), True),
        T.StructField("true_ratio", T.DoubleType(), True),
        T.StructField("min_value", T.DoubleType(), True),
        T.StructField("max_value", T.DoubleType(), True),
        T.StructField("mean", T.DoubleType(), True),
        T.StructField("median", T.DoubleType(), True),
        T.StructField("iqr", T.DoubleType(), True),
    ]
)

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)
_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _sanitize(col: F.Column, dtype: T.DataType) -> F.Column:
    """NA-marker coercion for string columns (reference P3)."""
    if isinstance(dtype, T.StringType):
        return F.when(F.trim(col).isin([m.strip() for m in NA_MARKERS]) | (col == ""), None).otherwise(col)
    return col


def _try_ts(col: F.Column) -> F.Column:
    parsed = F.try_to_timestamp(col)
    for fmt in DATE_FORMATS:
        parsed = F.coalesce(parsed, F.try_to_timestamp(col, F.lit(fmt)))
    return parsed


def column_id(dataset_id: str, table_id: str, column_name: str) -> str:
    """Percent-encoded hierarchical id (reference:
    kg_governor/data_profiling/utils.py:4-17)."""
    return "/".join(quote_plus(p) for p in (dataset_id, table_id, column_name) if p != "")


# --- heuristic NL / named-entity signals (vocab-free) ---------------------
# The reference classifies string columns as natural_language_text /
# named_entity with fastText word-id coverage + spaCy NER over a 1000-row
# sample (fine_grained_type_detector.py:44-67). Model weights are absent
# from this environment (documented divergence), so the discriminator is
# re-expressed as four vectorized column signals — average token count,
# alpha-character ratio, stopword-hit ratio, title-case ratio — all
# JVM-side expressions, no sample collection, no Python loop.
_STOPWORD_RE = (
    r"(?i)(^|\s)(the|a|an|of|and|in|to|is|are|was|for|on|with|that|it|as|at|by|from)(\s|$)"
)
_TITLECASE_RE = r"^([A-Z][a-z]+)( [A-Z][a-z]+)*$"


def _nl_signal_exprs(c: F.Column, name: str) -> list[F.Column]:
    ntok = F.size(F.split(F.trim(c), r"\s+"))
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z ]", "")) / F.greatest(
        F.length(c), F.lit(1)
    )
    return [
        F.avg(ntok).alias(f"{name}__avg_tokens"),
        F.avg(alpha).alias(f"{name}__alpha_ratio"),
        F.avg(c.rlike(_STOPWORD_RE).cast("double")).alias(f"{name}__stopword_ratio"),
        F.avg(c.rlike(_TITLECASE_RE).cast("double")).alias(f"{name}__titlecase_ratio"),
    ]


def classify_string_signals(
    avg_tokens: float | None,
    alpha_ratio: float | None,
    stopword_ratio: float | None,
    titlecase_ratio: float | None,
) -> str:
    """named_entity / natural_language_text / string from the four
    signals. Title-case short phrases are entities (the reference's
    'every non-punct token is an entity' rule); stopword-bearing multi-
    token values are prose; everything else stays string. Mirrors the
    reference's precedence (NE refines NL, both checked before STRING,
    fine_grained_type_detector.py:34-41)."""
    t, a = avg_tokens or 0.0, alpha_ratio or 0.0
    s, tc = stopword_ratio or 0.0, titlecase_ratio or 0.0
    if tc >= 0.5 and 1.0 <= t <= 5.0 and a >= 0.8:
        return "named_entity"
    if s >= 0.5 and t >= 3.0 and a >= 0.7:
        return "natural_language_text"
    return "string"


def _agg_exprs(
    name: str, dtype: T.DataType, exact: bool
) -> tuple[list[F.Column], list[F.Column]]:
    """Aggregate expressions for one column, aliased `{name}__{stat}`,
    returned as (main exprs, distinct-count exprs). The split matters in
    exact mode: Spark's distinct-aggregate rewrite groups the partial
    aggregation by the distinct key, so a count_distinct mixed with an
    exact percentile in ONE agg builds a percentile buffer per distinct
    VALUE (measured 4× slower on a high-cardinality double column).
    profile_table runs the two lists as separate scans when exact."""
    c = _sanitize(F.col(name), dtype)

    def q(col: F.Column) -> F.Column:
        if exact:
            return F.percentile(col, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
        return F.percentile_approx(col, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), 10000)

    distinct = F.count_distinct(c) if exact else F.approx_count_distinct(c)
    distinct_exprs = [distinct.alias(f"{name}__distinct")]
    exprs = [F.count(c).alias(f"{name}__nonnull")]
    if isinstance(dtype, _NUMERIC_TYPES):
        d = c.cast("double")
        exprs += [
            F.min(d).alias(f"{name}__min"),
            F.max(d).alias(f"{name}__max"),
            F.avg(d).alias(f"{name}__mean"),
            q(d).alias(f"{name}__q"),
        ]
    elif isinstance(dtype, T.BooleanType):
        exprs += [F.avg(c.cast("double")).alias(f"{name}__true_ratio")]
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        e = F.unix_timestamp(c).cast("double")
        exprs += [
            F.min(e).alias(f"{name}__min"),
            F.max(e).alias(f"{name}__max"),
            F.avg(e).alias(f"{name}__mean"),
            q(e).alias(f"{name}__q"),
        ]
    elif isinstance(dtype, T.StringType):
        num = c.try_cast("double")
        ts = F.unix_timestamp(_try_ts(c)).cast("double")
        nonnull = F.count(c)
        exprs += [
            # detection signals: fraction of non-null values that parse
            (F.count(num) / F.greatest(nonnull, F.lit(1))).alias(f"{name}__num_ratio"),
            F.avg((num == F.round(num)).cast("double")).alias(f"{name}__int_ratio"),
            (F.count(ts) / F.greatest(nonnull, F.lit(1))).alias(f"{name}__date_ratio"),
            # stats under both interpretations; the winner is picked at unpivot
            F.min(num).alias(f"{name}__nmin"),
            F.max(num).alias(f"{name}__nmax"),
            F.avg(num).alias(f"{name}__nmean"),
            q(num).alias(f"{name}__nq"),
            F.min(ts).alias(f"{name}__tmin"),
            F.max(ts).alias(f"{name}__tmax"),
            F.avg(ts).alias(f"{name}__tmean"),
            q(ts).alias(f"{name}__tq"),
        ]
        exprs += _nl_signal_exprs(c, name)
    return exprs, distinct_exprs


def profile_table(
    df: DataFrame,
    table_id: str,
    dataset_id: str = "",
    exact: bool = False,
    columns: list[str] | None = None,
) -> DataFrame:
    """Profile every (scalar) column of ``df`` in one aggregation pass.

    ``exact=True`` switches approx sketches (HLL++ distinct,
    percentile_approx) to exact aggregates for oracle tests; production
    keeps the mergeable approximations (north_star).
    """
    spark = df.sparkSession
    fields = [
        f
        for f in df.schema.fields
        if (columns is None or f.name in columns)
        and not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType))
    ]
    exprs: list[F.Column] = [F.count(F.lit(1)).alias("__total")]
    distinct_exprs: list[F.Column] = []
    for f in fields:
        m, d = _agg_exprs(f.name, f.dataType, exact)
        exprs += m
        distinct_exprs += d
    if exact and distinct_exprs:
        # exact mode: count_distinct in a SEPARATE scan from the exact
        # percentiles (see _agg_exprs) — two lean scans, results merged
        # driver-side (both are single rows)
        row = df.agg(*exprs).collect()[0].asDict()
        row.update(df.agg(*distinct_exprs).collect()[0].asDict())
    else:
        # approx mode: HLL++ and percentile_approx are both mergeable
        # partial aggregates; one scan is optimal
        row = df.agg(*(exprs + distinct_exprs)).collect()[0].asDict()

    total = row["__total"]
    out_rows = []
    for f in fields:
        name, dtype = f.name, f.dataType
        g = lambda s, n=name: row.get(f"{n}__{s}")
        nonnull = g("nonnull") or 0
        missing = total - nonnull
        distinct = g("distinct")
        true_ratio = None
        mn = mx = mean = median = iqr = None

        def unpack_q(qv):
            if qv is None:
                return None, None
            q25, q50, q75 = [float(x) if x is not None else None for x in qv]
            iqr_ = (q75 - q25) if (q75 is not None and q25 is not None) else None
            return q50, iqr_

        if isinstance(dtype, _NUMERIC_TYPES):
            mn, mx, mean = g("min"), g("max"), g("mean")
            median, iqr = unpack_q(g("q"))
            # {0,1}-valued integral column -> boolean (reference rule,
            # fine_grained_type_detector.py:20-23)
            if (
                isinstance(dtype, _INTEGRAL_TYPES)
                and nonnull > 0
                and mn is not None
                and mn >= 0
                and mx is not None
                and mx <= 1
            ):
                data_type = "boolean"
                true_ratio = mean
            elif isinstance(dtype, _INTEGRAL_TYPES):
                data_type = "int"
            else:
                data_type = "float"
        elif isinstance(dtype, T.BooleanType):
            data_type = "boolean"
            true_ratio = g("true_ratio")
        elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            data_type = "date"
            mn, mx, mean = g("min"), g("max"), g("mean")
            median, iqr = unpack_q(g("q"))
        elif isinstance(dtype, T.StringType):
            num_ratio = g("num_ratio") or 0.0
            date_ratio = g("date_ratio") or 0.0
            int_ratio = g("int_ratio") or 0.0
            if nonnull > 0 and num_ratio >= 1.0:
                data_type = "int" if int_ratio >= 1.0 else "float"
                mn, mx, mean = g("nmin"), g("nmax"), g("nmean")
                median, iqr = unpack_q(g("nq"))
                if data_type == "int" and mn is not None and mn >= 0 and mx is not None and mx <= 1:
                    data_type = "boolean"
                    true_ratio = mean
            elif date_ratio > 0.5:
                data_type = "date"
                mn, mx, mean = g("tmin"), g("tmax"), g("tmean")
                median, iqr = unpack_q(g("tq"))
            else:
                data_type = classify_string_signals(
                    g("avg_tokens"), g("alpha_ratio"), g("stopword_ratio"), g("titlecase_ratio")
                )
        else:
            data_type = "string"

        out_rows.append(
            (
                column_id(dataset_id, table_id, name),
                dataset_id,
                table_id,
                name,
                data_type,
                int(total),
                int(distinct) if distinct is not None else None,
                int(missing),
                float(true_ratio) if true_ratio is not None else None,
                float(mn) if mn is not None else None,
                float(mx) if mx is not None else None,
                float(mean) if mean is not None else None,
                float(median) if median is not None else None,
                float(iqr) if iqr is not None else None,
            )
        )
    return spark.createDataFrame(out_rows, PROFILE_SCHEMA)


def fine_grained_string_types(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-string-column NL/NE signals + decided fine-grained type, one
    scan (reference detect_column_data_type string path,
    fine_grained_type_detector.py:28-41, without model weights).
    Returns (column_name, data_type, avg_tokens, alpha_ratio,
    stopword_ratio, titlecase_ratio)."""
    spark = df.sparkSession
    fields = [
        f
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType) and (columns is None or f.name in columns)
    ]
    exprs: list[F.Column] = []
    for f in fields:
        exprs += _nl_signal_exprs(_sanitize(F.col(f.name), f.dataType), f.name)
    row = df.agg(*exprs).collect()[0].asDict()
    out = []
    for f in fields:
        sig = tuple(
            row.get(f"{f.name}__{s}")
            for s in ("avg_tokens", "alpha_ratio", "stopword_ratio", "titlecase_ratio")
        )
        out.append((f.name, classify_string_signals(*sig), *[float(x or 0.0) for x in sig]))
    return spark.createDataFrame(
        out,
        "column_name string, data_type string, avg_tokens double, alpha_ratio double, "
        "stopword_ratio double, titlecase_ratio double",
    )


def profile_tables(
    spark: SparkSession, tables: dict[str, DataFrame], dataset_id: str = "", exact: bool = False
) -> DataFrame:
    """Profile several tables into one profiles DataFrame (the engine's
    analog of the reference's profile-JSON directory).

    Runs under the wide-array reader-batch profile: profile_table's
    aggregations are eager (they collect), and profiling scans every
    column including wide token arrays — the regime the 1024-row
    reader batch was measured 3-5x faster in (session.py, BENCH.md
    "The GC fix")."""
    from kglids_spark.session import WIDE_ARRAY_SCAN_CONF, scoped_sql_conf

    out = None
    with scoped_sql_conf(spark, WIDE_ARRAY_SCAN_CONF):
        for name, df in tables.items():
            p = profile_table(df, name, dataset_id=dataset_id, exact=exact)
            out = p if out is None else out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# reference profile-JSON format (S4/S5 sink/source parity)

# exact key order of the reference's serialized profile
# (kg_governor/data_profiling/model/column_profile.py:35-56)
_REFERENCE_PROFILE_KEYS = [
    "column_id", "dataset_name", "dataset_id", "path", "table_name",
    "table_id", "column_name", "data_source", "data_type",
    "total_values_count", "distinct_values_count", "missing_values_count",
    "true_ratio", "min_value", "max_value", "mean", "median", "iqr",
    "embedding", "embedding_scaling_factor",
]


def to_reference_profile_dict(row, data_source: str = "", path: str = "") -> dict:
    """One profiles-DataFrame row → the reference's profile dict, same
    keys in the same order (column_profile.py:35-56). ``embedding`` is
    None — the reference's model weights are absent from the checkout
    (.MISSING_LARGE_BLOBS), documented divergence."""
    d = row.asDict() if hasattr(row, "asDict") else dict(row)
    out = {
        "column_id": d["column_id"],
        "dataset_name": d.get("dataset_id", ""),
        "dataset_id": d.get("dataset_id", ""),
        "path": path,
        "table_name": d["table_id"],
        "table_id": d["table_id"],
        "column_name": d["column_name"],
        "data_source": data_source,
        "data_type": d["data_type"],
        "total_values_count": float(d["total_values_count"]),
        "distinct_values_count": float(d["distinct_values_count"]),
        "missing_values_count": float(d["missing_values_count"]),
        "true_ratio": d.get("true_ratio"),
        "min_value": d.get("min_value"),
        "max_value": d.get("max_value"),
        "mean": d.get("mean"),
        "median": d.get("median"),
        "iqr": d.get("iqr"),
        "embedding": None,
        "embedding_scaling_factor": None,
    }
    assert list(out) == _REFERENCE_PROFILE_KEYS
    return out


def save_reference_profiles(profiles: DataFrame, base_dir: str, data_source: str = "") -> int:
    """Write profiles in the reference's on-disk layout: one JSON per
    column, a subdirectory per data_type, filename = md5(column_id)
    (column_profile.py:58-64 — same json.dump flags, byte-comparable).
    Returns the number of files written. Driver-side loop: profile
    output is one row per COLUMN, small by construction."""
    import hashlib
    import json
    import os

    n = 0
    for row in profiles.collect():
        d = to_reference_profile_dict(row, data_source=data_source)
        type_dir = os.path.join(base_dir, d["data_type"])
        os.makedirs(type_dir, exist_ok=True)
        fname = hashlib.md5(d["column_id"].encode()).hexdigest()
        with open(os.path.join(type_dir, f"{fname}.json"), "w") as f:
            json.dump(d, f, ensure_ascii=False, indent=4)
        n += 1
    return n


def load_reference_profiles(spark: SparkSession, base_dir: str) -> DataFrame:
    """Read a reference-layout profile directory back into a profiles
    DataFrame (S5 source parity; the reference bulk-loads with
    mp.Pool.imap_unordered, build_data_global_schema.py:61-63)."""
    import glob
    import json
    import os

    rows = []
    for p in sorted(glob.glob(os.path.join(base_dir, "*", "*.json"))):
        with open(p) as f:
            d = json.load(f)
        rows.append(
            (
                d["column_id"], d["dataset_id"], d["table_id"], d["column_name"],
                d["data_type"],
                int(d["total_values_count"]), int(d["distinct_values_count"]),
                int(d["missing_values_count"]),
                d.get("true_ratio"), d.get("min_value"), d.get("max_value"),
                d.get("mean"), d.get("median"), d.get("iqr"),
            )
        )
    return spark.createDataFrame(rows, PROFILE_SCHEMA)


def correlation_profile(
    df: DataFrame, columns: list[str] | None = None, table_id: str = ""
) -> DataFrame:
    """Pearson correlation of every numeric column pair in ONE
    aggregation pass (n·(n-1)/2 ``corr`` aggregates over a single
    scan — profile column counts are small, so the expression fan-out
    is bounded; the scan is the cost and it happens once).

    A standard profiler output the reference lacks (its profiles are
    per-column only; cross-column structure is left to the learned
    EDA layer) — included because correlation screens are the first
    thing a feature-engineering pass asks of a training table.
    Returns (table_id, col1, col2, corr) for col1 < col2."""
    fields = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, _NUMERIC_TYPES)
        and (columns is None or f.name in columns)
    ]
    pairs = [(a, b) for i, a in enumerate(fields) for b in fields[i + 1 :]]
    if not pairs:
        return df.sparkSession.createDataFrame(
            [], "table_id string, col1 string, col2 string, corr double"
        )
    row = df.agg(
        *[F.corr(F.col(a), F.col(b)).alias(f"{a}\x1f{b}") for a, b in pairs]
    ).collect()[0]
    out = [
        (table_id, a, b, float(row[f"{a}\x1f{b}"]) if row[f"{a}\x1f{b}"] is not None else None)
        for a, b in pairs
    ]
    return df.sparkSession.createDataFrame(
        out, "table_id string, col1 string, col2 string, corr double"
    )


def iqr_outliers(
    df: DataFrame,
    column: str,
    k: float = 1.5,
    exact: bool = True,
) -> DataFrame:
    """Tukey-fence outlier profile of a numeric column: one row
    (q1, q3, lo_fence, hi_fence, n_checked, n_below, n_above,
    outlier_rate) with fences at Q1 − k·IQR and Q3 + k·IQR (k=1.5 is
    Tukey's convention; k=3 the "far out" variant). The data-derived
    sibling of the fixed-bound ``range`` constraint — it flags the
    tail the bounds author didn't anticipate.

    Two passes by necessity (the fences depend on the quantiles):
    a quantile aggregate — exact interpolated ``percentile`` for
    oracle parity, or the one-pass mergeable ``approx_percentile``
    KLL sketch at 10^12 rows (``exact=False``) — then one
    zero-shuffle conditional-count aggregate under the broadcast
    1-row fence frame. NULLs are excluded from both passes (that is
    ``not_null``'s job). An all-NULL / empty column yields NULL
    quantiles and zero counts rather than an error."""
    col = F.col(column).cast("double")
    if exact:
        qf = df.agg(
            F.percentile(col, F.lit(0.25)).alias("q1"),
            F.percentile(col, F.lit(0.75)).alias("q3"),
        )
    else:
        qf = df.agg(
            F.percentile_approx(col, F.lit(0.25), F.lit(10000)).cast("double").alias("q1"),
            F.percentile_approx(col, F.lit(0.75), F.lit(10000)).cast("double").alias("q3"),
        )
    fences = qf.select(
        "q1",
        "q3",
        (F.col("q1") - F.lit(float(k)) * (F.col("q3") - F.col("q1"))).alias("lo_fence"),
        (F.col("q3") + F.lit(float(k)) * (F.col("q3") - F.col("q1"))).alias("hi_fence"),
    )
    joined = df.select(col.alias("_v")).crossJoin(F.broadcast(fences))
    v = F.col("_v")
    return joined.agg(
        F.first("q1").alias("q1"),
        F.first("q3").alias("q3"),
        F.first("lo_fence").alias("lo_fence"),
        F.first("hi_fence").alias("hi_fence"),
        F.count(v).alias("n_checked"),
        # coalesce: an all-NULL or empty column sums NULL, not 0
        F.coalesce(F.sum((v < F.col("lo_fence")).cast("long")), F.lit(0)).alias(
            "n_below"
        ),
        F.coalesce(F.sum((v > F.col("hi_fence")).cast("long")), F.lit(0)).alias(
            "n_above"
        ),
        (
            (
                F.coalesce(F.sum((v < F.col("lo_fence")).cast("long")), F.lit(0))
                + F.coalesce(F.sum((v > F.col("hi_fence")).cast("long")), F.lit(0))
            )
            / F.nullif(F.count(v), F.lit(0))
        ).alias("outlier_rate"),
    )


def iqr_outlier_rows(
    df: DataFrame, column: str, k: float = 1.5, exact: bool = True
) -> DataFrame:
    """The rows outside the Tukey fences of :func:`iqr_outliers` —
    the triage view (df's full schema plus a ``fence_side`` column,
    'below'/'above'). Same two-pass shape; the filter under the
    broadcast fence frame pushes into the scan."""
    fences = iqr_outliers(df, column, k=k, exact=exact).select(
        "lo_fence", "hi_fence"
    )
    col = F.col(column).cast("double")
    joined = df.crossJoin(F.broadcast(fences))
    side = F.when(col < F.col("lo_fence"), F.lit("below")).when(
        col > F.col("hi_fence"), F.lit("above")
    )
    return (
        joined.withColumn("fence_side", side)
        .filter(F.col("fence_side").isNotNull())
        .drop("lo_fence", "hi_fence")
    )


def iqr_outliers_grouped(
    df: DataFrame,
    column: str,
    group_col: str,
    k: float = 1.5,
    exact: bool = True,
) -> DataFrame:
    """Per-group Tukey-fence outlier profile: one row per value of
    ``group_col`` with that group's OWN quartiles, fences, and tail
    counts — outlier-failure LOCALIZATION, the fence sibling of
    grouped_drift/grouped_verdicts (the global profile says *that* the
    tail moved; this says *which feed* moved it, with fences fitted
    per feed so a long-form source is not judged by a short-form
    source's quartiles).

    Two passes like the global op: a per-group quantile aggregate,
    then one conditional-count aggregate joined back on the group (the
    fence frame is dictionary-sized — one row per group — so the join
    broadcasts). ``exact=True`` uses the exact interpolated
    ``percentile`` for oracle parity — note its aggregation buffer
    holds the group's values, fine at query scale; at 10^12 rows use
    ``exact=False`` (mergeable KLL ``percentile_approx``, bounded
    buffer). NULL values are excluded; NULL groups form their own
    group (GROUP BY semantics); a group with <1 non-null value yields
    NULL quantiles and zero counts."""
    col = F.col(column).cast("double")
    pfun = (
        (lambda c: F.percentile(c, F.lit(0.25)))
        if exact
        else (lambda c: F.percentile_approx(c, F.lit(0.25), F.lit(10000)).cast("double"))
    )
    pfun75 = (
        (lambda c: F.percentile(c, F.lit(0.75)))
        if exact
        else (lambda c: F.percentile_approx(c, F.lit(0.75), F.lit(10000)).cast("double"))
    )
    qf = df.groupBy(F.col(group_col)).agg(
        pfun(col).alias("q1"), pfun75(col).alias("q3")
    )
    fences = qf.select(
        group_col,
        "q1",
        "q3",
        (F.col("q1") - F.lit(float(k)) * (F.col("q3") - F.col("q1"))).alias("lo_fence"),
        (F.col("q3") + F.lit(float(k)) * (F.col("q3") - F.col("q1"))).alias("hi_fence"),
    )
    left = df.select(F.col(group_col), col.alias("_v"))
    fr = fences.select(
        F.col(group_col).alias("_g"), "q1", "q3", "lo_fence", "hi_fence"
    )
    # eqNullSafe: a NULL group forms its own group (GROUP BY
    # semantics) and must match its own fence row — a plain equi-join
    # would drop its fences
    joined = left.join(
        F.broadcast(fr), left[group_col].eqNullSafe(fr["_g"]), "left"
    ).drop("_g")
    v = F.col("_v")
    return (
        joined.groupBy(F.col(group_col))
        .agg(
            F.first("q1").alias("q1"),
            F.first("q3").alias("q3"),
            F.first("lo_fence").alias("lo_fence"),
            F.first("hi_fence").alias("hi_fence"),
            F.count(v).alias("n_checked"),
            F.coalesce(F.sum((v < F.col("lo_fence")).cast("long")), F.lit(0)).alias(
                "n_below"
            ),
            F.coalesce(F.sum((v > F.col("hi_fence")).cast("long")), F.lit(0)).alias(
                "n_above"
            ),
            (
                (
                    F.coalesce(F.sum((v < F.col("lo_fence")).cast("long")), F.lit(0))
                    + F.coalesce(F.sum((v > F.col("hi_fence")).cast("long")), F.lit(0))
                )
                / F.nullif(F.count(v), F.lit(0))
            ).alias("outlier_rate"),
        )
    )
