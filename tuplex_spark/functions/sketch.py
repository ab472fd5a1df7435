"""Deterministic cardinality / frequency sketches.

Spark ships approx_count_distinct (HLL++) and DuckDB ships its own HLL —
different algorithms, so their estimates never agree and an oracle
cannot grade them.  The sketches here are chosen to be DETERMINISTIC
functions of the data (content-addressed md5 order statistics), so the
DuckDB twin reproduces them bit-for-bit while the plan shape stays the
one you want at 100 TB.

KMV (k-minimum-values) distinct estimate: hash every value to a uniform
64-bit point, keep the k smallest distinct hashes, estimate
``(k-1) / max_k`` in the unit interval.  The k-smallest step is
``distinct -> TakeOrdered(k)`` — Spark computes per-partition top-k and
merges on the driver, so the shuffle carries at most k rows per
partition regardless of corpus size (no collect of the distinct set).
Standard error ~ 1/sqrt(k-2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# md5 high-8-bytes (big-endian hex parse) as unsigned 64-bit value.
# Spark: conv(hex, 16, 10) yields the unsigned decimal as a string;
# DuckDB: '0x'-prefixed cast to UBIGINT parses the same big-endian hex
# (DuckDB's md5_number_upper is little-endian — NOT equivalent).
_HASH64 = "conv(substring(md5(cast({c} as string)), 1, 16), 16, 10)"
_HASH64_DUCK = \
    "('0x' || substring(md5(CAST({c} AS VARCHAR)), 1, 16))::UBIGINT"


def _hash_frac(col: str):
    # 2^64-1 exceeds a Java long: route the literal through a string
    h = F.expr(_HASH64.format(c=col)).cast("decimal(20,0)")
    full = F.expr("CAST('18446744073709551615' AS DECIMAL(20,0))")
    return (h / full).cast("double")


def kmv_distinct(df: DataFrame, col: str, k: int = 1024) -> DataFrame:
    """One-row DataFrame ``(estimate, k_used, kth_hash)``: KMV distinct
    estimate of ``col``.  When the column has fewer than k distinct
    values the count is exact (we saw them all).

    Plan: project hash -> distinct (partial aggregation) ->
    TakeOrdered(k) -> tiny final agg.  Nothing unbounded crosses the
    shuffle; the candidate set on the driver is exactly k doubles."""
    hashed = df.select(_hash_frac(col).alias("h")).distinct()
    smallest = hashed.orderBy("h").limit(k)
    return (smallest
            .agg(F.count("h").alias("n"), F.max("h").alias("kth"))
            .select(
                F.when(F.col("n") < k, F.col("n").cast("double"))
                 .otherwise(F.round((F.col("n") - 1) / F.col("kth"), 6))
                 .alias("estimate"),
                F.col("n").cast("long").alias("k_used"),
                F.round("kth", 6).alias("kth_hash")))


def kmv_distinct_sql(table: str, col: str, k: int = 1024) -> str:
    """DuckDB twin — identical hash, identical order statistic."""
    h64 = _HASH64_DUCK.format(c=col)
    return f"""
WITH hashed AS (
  SELECT DISTINCT
    CAST({h64} AS DECIMAL(20,0)) / CAST(18446744073709551615 AS DECIMAL(20,0))
      AS h
  FROM {table}
), smallest AS (
  SELECT CAST(h AS DOUBLE) AS h FROM hashed ORDER BY h LIMIT {k}
)
SELECT CASE WHEN count(h) < {k} THEN CAST(count(h) AS DOUBLE)
            ELSE round((count(h) - 1) / max(h), 6) END AS estimate,
       count(h)::BIGINT AS k_used,
       round(max(h), 6) AS kth_hash
FROM smallest"""


def kmv_distinct_by(df: DataFrame, col: str, group_cols: list[str],
                    k: int = 256) -> DataFrame:
    """Per-GROUP KMV distinct estimate — distinct users per event type
    / distinct domains per day at 100 TB, with per-group driver-free
    bounded state.  Exact below k per group.

    Plan: (group, hash) distinct (partial-aggregated) -> per-group
    k-smallest via a row_number window, which Spark lowers to a
    map-side WindowGroupLimit prune (at most k rows per group per
    partition cross the group exchange) -> per-group final agg.  Two
    bounded shuffles, nothing proportional to group cardinality
    reaches any single buffer beyond k doubles."""
    from pyspark.sql import Window
    hashed = (df.select(*group_cols, _hash_frac(col).alias("h"))
              .distinct())
    w = Window.partitionBy(*group_cols).orderBy("h")
    smallest = (hashed.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= k).drop("__rn"))
    return (smallest.groupBy(*group_cols)
            .agg(F.count("h").alias("n"), F.max("h").alias("kth"))
            .select(
                *group_cols,
                F.when(F.col("n") < k, F.col("n").cast("double"))
                 .otherwise(F.round((F.col("n") - 1) / F.col("kth"), 6))
                 .alias("estimate"),
                F.col("n").cast("long").alias("k_used"),
                F.round("kth", 6).alias("kth_hash")))


def kmv_distinct_by_sql(table: str, col: str, group_cols: list[str],
                        k: int = 256) -> str:
    """DuckDB twin — identical hash, identical per-group order
    statistic."""
    h64 = _HASH64_DUCK.format(c=col)
    g = ", ".join(group_cols)
    return f"""
WITH hashed AS (
  SELECT DISTINCT {g},
    CAST(CAST({h64} AS DECIMAL(20,0))
         / CAST(18446744073709551615 AS DECIMAL(20,0)) AS DOUBLE) AS h
  FROM {table}
), smallest AS (
  SELECT {g}, h FROM (
    SELECT {g}, h,
           row_number() OVER (PARTITION BY {g} ORDER BY h) AS rn
    FROM hashed) WHERE rn <= {k}
)
SELECT {g},
       CASE WHEN count(h) < {k} THEN CAST(count(h) AS DOUBLE)
            ELSE round((count(h) - 1) / max(h), 6) END AS estimate,
       count(h)::BIGINT AS k_used,
       round(max(h), 6) AS kth_hash
FROM smallest GROUP BY {g}"""


def kmv_quantiles(df: DataFrame, value_col: str, key_col: str,
                  probs: list[float], k: int = 1024,
                  tag: str | None = None) -> DataFrame:
    """Deterministic quantile sketch: exact linear-interpolated
    quantiles over the k rows whose content hash (md5 of the unique
    ``key_col``) is smallest — a content-addressed uniform row sample,
    so the DuckDB twin reproduces the estimate bit-for-bit (unlike
    percentile_approx's KLL, whose merge order is nondeterministic).
    Below k rows the sample is the whole column and the quantiles are
    exact.

    The reference has no median/percentile at all (SURVEY §2.4); LLM
    pipelines slice corpora by doc-length/token percentiles constantly.

    Plan shape at 100 TB: narrow (hash, value) projection ->
    TakeOrdered(k) (per-partition top-k, merged on the driver: at most
    k rows per partition cross, k doubles land) -> single-row
    sort_array(collect_list) agg bounded at k doubles -> per-prob
    interpolation math.  One bounded shuffle, driver state = k doubles.

    Interpolation is spelled out as order-statistic arithmetic
    (``v[lo] + (v[hi] - v[lo]) * frac`` at ``pos = p*(n-1)``) rather
    than delegated to percentile()/quantile_cont(), so both engines run
    the IDENTICAL double expression — no cross-engine ulp drift.

    Output: one row per prob — (p, quantile, sample_n) plus a leading
    ``col`` tag when ``tag`` is given (for unioning several columns)."""
    sample = (df.filter(F.col(value_col).isNotNull())
              .select(_hash_frac(key_col).alias("h"),
                      F.col(value_col).cast("double").alias("v"))
              .orderBy("h").limit(k))
    agg = sample.agg(F.sort_array(F.collect_list("v")).alias("vs"),
                     F.count("v").alias("n"))
    out = (agg.select(F.posexplode(F.array(*[F.lit(float(p))
                                             for p in probs]))
                      .alias("pi", "p"), "vs", "n")
           .selectExpr(
               "p",
               # n = 0 (empty/all-null column): element_at's 1-based
               # index would be 0 and throw — both engines answer NULL
               "CASE WHEN n = 0 THEN NULL ELSE "
               "round(element_at(vs, CAST(floor(p*(n-1)) AS INT) + 1)"
               " + (element_at(vs, least(CAST(floor(p*(n-1)) AS INT) + 2,"
               "                         CAST(n AS INT)))"
               "    - element_at(vs, CAST(floor(p*(n-1)) AS INT) + 1))"
               "   * (p*(n-1) - floor(p*(n-1))), 6) END AS quantile",
               "CAST(n AS BIGINT) AS sample_n"))
    if tag is not None:
        out = out.select(F.lit(tag).alias("col"), "p", "quantile",
                         "sample_n")
    return out


def kmv_quantiles_sql(table: str, value_col: str, key_col: str,
                      probs: list[float], k: int = 1024,
                      tag: str | None = None) -> str:
    """DuckDB twin — identical hash, identical order statistics,
    identical interpolation arithmetic (see kmv_quantiles)."""
    h64 = _HASH64_DUCK.format(c=key_col)
    vals = ", ".join(f"(CAST({float(p)!r} AS DOUBLE))" for p in probs)
    tag_sel = f"'{tag}' AS col, " if tag is not None else ""
    return f"""
SELECT {tag_sel}p,
       CASE WHEN n = 0 THEN NULL ELSE
       round(vs[CAST(floor(p*(n-1)) AS INT) + 1]
         + (vs[least(CAST(floor(p*(n-1)) AS INT) + 2, CAST(n AS INT))]
            - vs[CAST(floor(p*(n-1)) AS INT) + 1])
           * (p*(n-1) - floor(p*(n-1))), 6) END AS quantile,
       n AS sample_n
FROM (
  SELECT list_sort(list(v)) AS vs, count(v)::BIGINT AS n
  FROM (
    SELECT CAST({value_col} AS DOUBLE) AS v
    FROM {table}
    WHERE {value_col} IS NOT NULL
    ORDER BY CAST({h64} AS DECIMAL(20,0))
             / CAST(18446744073709551615 AS DECIMAL(20,0))
    LIMIT {k}
  )
), (VALUES {vals}) AS probs(p)"""


def exact_heavy_hitters(df: DataFrame, col: str, k: int = 20) -> DataFrame:
    """Exact top-k frequent values — the deterministic baseline the
    sketch family is judged against.  groupBy count partial-aggregates
    map-side; TakeOrdered bounds what reaches the driver to k rows."""
    return (df.groupBy(F.col(col).alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("value"))
            .limit(k))


def exact_heavy_hitters_sql(table: str, col: str, k: int = 20) -> str:
    return f"""
SELECT {col} AS value, count(*)::BIGINT AS cnt
FROM {table} GROUP BY 1 ORDER BY cnt DESC, value LIMIT {k}"""
