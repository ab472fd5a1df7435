"""DSIR — Data Selection via Importance Resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023): select pretraining documents whose hashed-n-gram
distribution looks like a TARGET corpus (e.g. Wikipedia/books) rather
than the raw crawl, by importance weights between two bag-of-hashed-
n-grams models.

    log w(doc) = sum_b  n_b(doc) * [ log p_hat(b) - log q_hat(b) ]

with b ranging over ``n_buckets`` hash buckets of word unigrams +
bigrams, p_hat fit on the target corpus, q_hat on the source corpus
(both Laplace-smoothed), and documents kept by Gumbel-top-k on the
weights (sampling without replacement, the paper's resampling step).

Engine-exactness design: cross-engine ``ln`` is NOT bitwise-portable
(JVM Math.log and libm may differ in the last ulp), and the repo's
integer-exact discipline (rarity_scores) forbids avg-of-logs drift.
So the only logs ever taken run in PYTHON, on the BOUNDED bucket-count
table (<= n_buckets integer rows per side — the kmeans/BPE
bounded-driver-state contract), and are immediately quantized to
integer NANO-NATS.  Both engines then compute each document's weight
as an INTEGER sum of nano-nat ratios (order-independent, exact) with
one final division + round(6) — bitwise identical by construction.
The per-row Gumbel key does take one engine-side ln of an exactly
representable md5-uniform, with the result rounded to 6 decimals
(drift window ~ulp/1e-6 ~ 1e-8 per row).

Reference parity note: the reference engine has no data-selection
operators at all — this module is part of the beyond-reference
training-pipeline surface, like functions/dedup.py and sampling.py.

Scale shape at 100 TB: fitting is two explode aggregations collapsing
to <= n_buckets rows each (map-side partial agg; collects bounded by
n_buckets, never corpus-proportional); weighting is one explode +
broadcast join with the <= n_buckets ratio table + one map-side-
combined sum per doc; selection is one TakeOrderedAndProject (no
global sort materialization).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .text import TOKENS_SQL, tokens

# nano-nat quantization of the Python-computed log ratios: |ratio| is
# bounded by log of the count range (~40 nats), so int64 sums stay
# below 2^63 for any document under ~1e11 grams
_NANO = 1_000_000_000


def _grams(toks: Column) -> Column:
    """Word unigrams + bigrams from a MATERIALIZED token array (the
    staged-array discipline of word_shingles_from)."""
    bidx = F.sequence(F.lit(1), F.size(toks) - 1)
    bigrams = F.when(F.size(toks) < 2, F.array().cast("array<string>")) \
        .otherwise(F.transform(
            bidx, lambda i: F.array_join(F.slice(toks, i, 2), " ")))
    return F.concat(toks, bigrams)


def _grams_sql(t: str) -> str:
    """DuckDB twin of :func:`_grams` over a token-array expression."""
    return (f"list_concat({t}, CASE WHEN len({t}) < 2 THEN []::VARCHAR[] "
            f"ELSE list_transform(generate_series(1, len({t}) - 1), "
            f"i -> array_to_string(list_slice({t}, i, i + 1), ' ')) END)")


def _bucket(gram: Column, n_buckets: int) -> Column:
    """md5-low-32 hash bucket in [0, n_buckets) — the engine-portable
    hash used across this package (sampling._hash_bucket)."""
    h = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(int(n_buckets)))


def _bucket_sql(gram_expr: str, n_buckets: int) -> str:
    return (f"(CAST(('0x' || substr(md5({gram_expr}), 1, 8)) AS BIGINT) "
            f"% {int(n_buckets)})")


def _gram_buckets(df: DataFrame, text_col: str, id_col: str,
                  n_buckets: int) -> DataFrame:
    """(id, b) — one row per gram OCCURRENCE (multiplicity kept: the
    weight sums over occurrences)."""
    st = df.select(F.col(id_col).alias("id"),
                   tokens(text_col).alias("__toks"))
    return (st.select("id", F.explode(_grams(F.col("__toks")))
                      .alias("g"))
              .select("id", _bucket(F.col("g"), n_buckets).alias("b")))


def _gram_buckets_sql(source: str, text_col: str, id_col: str,
                      n_buckets: int) -> str:
    toks = TOKENS_SQL.format(c=text_col)
    return f"""SELECT id, {_bucket_sql('g', n_buckets)} AS b
  FROM (SELECT {id_col} AS id, unnest({_grams_sql('t')}) AS g
        FROM (SELECT {id_col}, {toks} AS t FROM {source}))"""


def dsir_log_ratio_table(source: DataFrame, target: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         n_buckets: int = 2048,
                         alpha: int = 1) -> list[tuple[int, int]]:
    """Fit both hashed-n-gram models and return the quantized ratio
    table ``[(bucket, nano_nats), ...]`` for ALL n_buckets buckets:

        nano_nats(b) = round(1e9 * [ ln(ct_b + alpha) - ln(Ct + alpha*B)
                                   - ln(cs_b + alpha) + ln(Cs + alpha*B) ])

    computed in Python from exact integer counts, so the table — the
    ONLY place a logarithm runs — is engine-independent.  Driver state
    is two <= n_buckets integer count maps (the bounded-collect
    contract; n_buckets is a model hyperparameter, never
    corpus-proportional)."""
    def counts(df):
        rows = (_gram_buckets(df, text_col, id_col, n_buckets)
                .groupBy("b").agg(F.count(F.lit(1)).alias("c"))
                .collect())
        return {int(r.b): int(r.c) for r in rows}

    cs, ct = counts(source), counts(target)
    tot_s = sum(cs.values()) + alpha * n_buckets
    tot_t = sum(ct.values()) + alpha * n_buckets
    out = []
    for b in range(n_buckets):
        r = (math.log(ct.get(b, 0) + alpha) - math.log(tot_t)
             - math.log(cs.get(b, 0) + alpha) + math.log(tot_s))
        out.append((b, round(r * _NANO)))
    return out


def _ratio_values_sql(table: list[tuple[int, int]]) -> str:
    return ", ".join(f"({b}, {r})" for b, r in table)


def dsir_log_ratio_table_duckdb(con, source_sql: str, target_sql: str,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                n_buckets: int = 2048,
                                alpha: int = 1
                                ) -> list[tuple[int, int]]:
    """Fit the SAME ratio table from DuckDB instead of Spark (for
    oracle construction without a SparkSession): bucket counts are
    exact integers under the identical md5 arithmetic, and the log
    quantization is the same Python code — so the two fitters agree
    bitwise on any corpus, by construction."""
    def counts(src):
        gb = _gram_buckets_sql(src, text_col, id_col, n_buckets)
        rows = con.execute(
            f"SELECT b, count(*) FROM ({gb}) GROUP BY b").fetchall()
        return {int(b): int(c) for b, c in rows}

    cs, ct = counts(source_sql), counts(target_sql)
    tot_s = sum(cs.values()) + alpha * n_buckets
    tot_t = sum(ct.values()) + alpha * n_buckets
    out = []
    for b in range(n_buckets):
        r = (math.log(ct.get(b, 0) + alpha) - math.log(tot_t)
             - math.log(cs.get(b, 0) + alpha) + math.log(tot_s))
        out.append((b, round(r * _NANO)))
    return out


def dsir_weights(df: DataFrame, target: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 n_buckets: int = 2048, alpha: int = 1,
                 ratio_table: list[tuple[int, int]] | None = None
                 ) -> DataFrame:
    """Per-document DSIR importance weight: (id_col, logw), logw
    rounded to 6 decimals.  ``df`` is the source/raw corpus (q is fit
    on it), ``target`` the corpus whose distribution we want (p).
    Documents with no grams (NULL/empty text) get logw = 0.0 — an
    empty product, kept so selection downstream sees every row.

    Pass ``ratio_table`` (from :func:`dsir_log_ratio_table`) to reuse
    a fitted model across calls (weights + sample share one fit)."""
    if ratio_table is None:
        ratio_table = dsir_log_ratio_table(df, target, text_col,
                                           id_col, n_buckets, alpha)
    spark = df.sparkSession
    ratios = spark.createDataFrame(ratio_table, "b long, r long")
    gb = _gram_buckets(df, text_col, id_col, n_buckets)
    sums = (gb.join(F.broadcast(ratios), "b")
              .groupBy("id")
              .agg(F.sum("r").alias("rsum")))
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return (ids.join(sums, "id", "left")
               .select(F.col("id").alias(id_col),
                       F.round(F.coalesce(F.col("rsum"), F.lit(0))
                               .cast("double") / _NANO, 6)
                        .alias("logw")))


def dsir_weights_sql(ratio_table: list[tuple[int, int]],
                     table: str = "documents", text_col: str = "text",
                     id_col: str = "doc_id",
                     n_buckets: int = 2048) -> str:
    """DuckDB twin of :func:`dsir_weights` — the SAME Python-fitted
    nano-nat table spliced as VALUES, identical md5 buckets and
    integer sum."""
    gb = _gram_buckets_sql(table, text_col, id_col, n_buckets)
    return f"""
WITH ratio(b, r) AS (VALUES {_ratio_values_sql(ratio_table)}),
gb AS ({gb}),
sums AS (
  SELECT id, sum(r)::BIGINT AS rsum
  FROM gb JOIN ratio USING (b) GROUP BY id
)
SELECT i.id AS {id_col},
       round(COALESCE(s.rsum, 0)::DOUBLE / {_NANO}, 6) AS logw
FROM (SELECT DISTINCT {id_col} AS id FROM {table}) i
LEFT JOIN sums s USING (id)"""


# Gumbel uniform: md5 low 48 bits + half-offset — exactly representable
# in a double, never 0 or 1
_U48 = 1 << 48


def _gumbel_key(id_c: Column, seed: str) -> Column:
    u = ((F.conv(F.substring(
            F.md5(F.concat(id_c.cast("string"), F.lit(seed))), 1, 12),
            16, 10).cast("double") + F.lit(0.5)) / F.lit(float(_U48)))
    return -F.log(-F.log(u))


def _gumbel_key_sql(id_expr: str, seed: str) -> str:
    u = (f"((CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR) || "
         f"'{seed}'), 1, 12)) AS BIGINT)::DOUBLE + 0.5) / {float(_U48)})")
    return f"(-ln(-ln({u})))"


def dsir_sample(df: DataFrame, target: DataFrame, n_keep: int,
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 2048, alpha: int = 1,
                seed: str = "dsir",
                ratio_table: list[tuple[int, int]] | None = None
                ) -> DataFrame:
    """The paper's resampling step: keep ``n_keep`` documents by
    Gumbel-top-k over logw (== sampling without replacement with
    probability proportional to the importance weight).  The Gumbel
    noise is content-addressed (md5 of id + seed — the sampling.py
    determinism contract: stable under repartitioning and across
    engines), and the selection key rounds to 6 decimals before the
    top-k so both engines cut the same set.

    Returns (id_col, logw, key) for the kept rows."""
    w = dsir_weights(df, target, text_col, id_col, n_buckets, alpha,
                     ratio_table)
    keyed = w.select(
        id_col, "logw",
        F.round(F.col("logw") + _gumbel_key(F.col(id_col), seed), 6)
         .alias("key"))
    return (keyed.orderBy(F.col("key").desc(), F.col(id_col).asc())
                 .limit(int(n_keep)))


def dsir_sample_sql(ratio_table: list[tuple[int, int]], n_keep: int,
                    table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id", n_buckets: int = 2048,
                    seed: str = "dsir") -> str:
    """DuckDB twin of :func:`dsir_sample` — identical weights, Gumbel
    keys and (key DESC, id ASC) cut."""
    wsql = dsir_weights_sql(ratio_table, table, text_col, id_col,
                            n_buckets)
    gk = _gumbel_key_sql(id_col, seed)
    return f"""
SELECT {id_col}, logw, key FROM (
  SELECT {id_col}, logw, round(logw + {gk}, 6) AS key
  FROM ({wsql}) _w
) ORDER BY key DESC, {id_col} ASC LIMIT {int(n_keep)}"""
