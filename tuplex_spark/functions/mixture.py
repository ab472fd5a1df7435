"""Deterministic corpus mixture sampling — the "data mixture" step of
every published pretraining recipe (GPT-3 / PaLM / LLaMA train on
weighted source mixtures: so-many % web, % books, % code ...): given
per-source mixture weights and a total token budget, keep a
deterministic subset of each source whose expected token mass hits
``budget * weight_s``, without ever exceeding what the source has.

Exactness design (the rarity_scores integer discipline): the keep
decision is the content-addressed md5 cut of sampling.hash_sample, but
the per-source fraction ``min(1, budget*w_s / avail_s)`` is never
computed as a float — the comparison cross-multiplies into integer
arithmetic carried in decimal(38,0) (Spark) / HUGEINT (DuckDB):

    keep  iff  hash(id) * avail_s * 1_000_000  <  2^32 * budget * w_ppm_s

(magnitudes: 2^32 * 1e12 tokens * 1e6 ppm ~ 4e27 — inside both
engines' 38-digit decimals), so membership is bitwise engine-portable
and stable under repartitioning, like every sampling.py operator.

Weights are integer PARTS-PER-MILLION (callers normalize; they need
not sum to 1e6 — each source is budgeted independently, which also
expresses oversampling caps).

Scale shape at 100 TB: one explode-free token-count aggregation per
source (size(split) is a scan projection; the agg collapses to
#sources rows), an AQE-broadcast join of that tiny frame back onto the
corpus, and a scan-fused keep filter.  No driver state at all — the
cut lives in the plan as column arithmetic.

Reference parity note: the reference has no sampling/mixing operators
(LogicalOperatorType stops at CACHE) — beyond-reference surface, like
functions/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sampling import _BUCKETS, _hash_bucket, _hash_bucket_sql
from .text import TOKENS_SQL, tokens

_PPM = 1_000_000


def _check_weights(weights_ppm: dict[str, int]) -> None:
    for s, w in weights_ppm.items():
        if "'" in s or "\\" in s:
            raise ValueError(f"source {s!r} contains SQL-literal "
                             "specials")
        if not (isinstance(w, int) and w >= 0):
            raise ValueError(f"weight for {s!r} must be a non-negative "
                             f"int (ppm), got {w!r}")


def mixture_plan(df: DataFrame, weights_ppm: dict[str, int],
                 token_budget: int, text_col: str = "text",
                 source_col: str = "source") -> DataFrame:
    """The audit table: per source, available tokens, the ppm weight,
    the token target (budget * ppm / 1e6, integer floor), and whether
    the source is exhausted (target >= available -> the whole source
    is kept).  Sources present in the corpus but absent from
    ``weights_ppm`` get weight 0 (dropped); weights for absent sources
    are ignored (they have no rows to keep)."""
    _check_weights(weights_ppm)
    wmap = F.create_map(*[F.lit(x) for kv in weights_ppm.items()
                          for x in kv])
    avail = (df.groupBy(F.col(source_col).alias("source"))
               .agg(F.sum(F.size(tokens(text_col))).cast("long")
                     .alias("avail_tokens"),
                    F.count(F.lit(1)).cast("long").alias("n_docs")))
    ppm = F.coalesce(F.element_at(wmap, F.col("source")), F.lit(0)) \
        .cast("long")
    # floor division in exact integer space (Spark decimal "/" rounds
    # HALF_UP, so divide via floor() to match DuckDB's // floor)
    target = F.floor(ppm.cast("decimal(20,0)")
                     * F.lit(int(token_budget)) / F.lit(_PPM)) \
        .cast("long")
    return avail.select(
        "source", "n_docs", "avail_tokens",
        ppm.alias("weight_ppm"),
        target.alias("target_tokens"),
        (target >= F.col("avail_tokens")).alias("exhausted"))


def mixture_sample(df: DataFrame, weights_ppm: dict[str, int],
                   token_budget: int, key_col: str = "doc_id",
                   text_col: str = "text", source_col: str = "source",
                   salt: str = "mix") -> DataFrame:
    """Keep rows so each source's EXPECTED kept-token mass is
    ``token_budget * weight_ppm / 1e6`` (capped at the whole source).
    All input columns pass through.  The decision is per-document
    (md5 of the row key + salt — the sampling.py determinism
    contract), so kept sets are stable under repartitioning and
    identical in the DuckDB twin."""
    _check_weights(weights_ppm)
    if token_budget < 0:
        raise ValueError("token_budget must be >= 0")
    plan = (mixture_plan(df, weights_ppm, token_budget, text_col,
                         source_col)
            .select("source", "avail_tokens", "weight_ppm"))
    j = df.join(F.broadcast(plan),
                df[source_col] == plan["source"], "left")
    h = _hash_bucket(F.col(key_col), salt).cast("decimal(20,0)")
    # keep iff h * avail * 1e6 < 2^32 * budget * ppm  (all integers;
    # a 0-token source keeps nothing under any weight, matching the
    # fraction reading min(1, target/avail) with avail=0 -> moot)
    lhs = h * F.col("avail_tokens").cast("decimal(20,0)") * F.lit(_PPM)
    rhs = (F.lit(_BUCKETS).cast("decimal(20,0)")
           * F.lit(int(token_budget))
           * F.col("weight_ppm").cast("decimal(20,0)"))
    return j.filter(lhs < rhs).select(*[df[c] for c in df.columns])


def mixture_plan_sql(weights_ppm: dict[str, int], token_budget: int,
                     table: str = "documents", text_col: str = "text",
                     source_col: str = "source") -> str:
    """DuckDB twin of :func:`mixture_plan` — identical integer
    arithmetic (HUGEINT intermediates, floor division)."""
    _check_weights(weights_ppm)
    toks = TOKENS_SQL.format(c=text_col)
    wvals = ", ".join(f"('{s}', {int(w)})"
                      for s, w in weights_ppm.items())
    return f"""
WITH w(source, ppm) AS (VALUES {wvals}),
avail AS (
  SELECT {source_col} AS source,
         count(*)::BIGINT AS n_docs,
         sum(len({toks}))::BIGINT AS avail_tokens
  FROM {table} GROUP BY 1
)
SELECT a.source, a.n_docs, a.avail_tokens,
       COALESCE(w.ppm, 0)::BIGINT AS weight_ppm,
       (COALESCE(w.ppm, 0)::HUGEINT * {int(token_budget)}
        // {_PPM})::BIGINT AS target_tokens,
       (COALESCE(w.ppm, 0)::HUGEINT * {int(token_budget)} // {_PPM}
        >= a.avail_tokens) AS exhausted
FROM avail a LEFT JOIN w USING (source)"""


def mixture_sample_sql(weights_ppm: dict[str, int], token_budget: int,
                       table: str = "documents",
                       key_col: str = "doc_id",
                       text_col: str = "text",
                       source_col: str = "source",
                       salt: str = "mix") -> str:
    """DuckDB twin of :func:`mixture_sample` — the identical md5 cut
    under the identical cross-multiplied integer comparison."""
    _check_weights(weights_ppm)
    toks = TOKENS_SQL.format(c=text_col)
    wvals = ", ".join(f"('{s}', {int(w)})"
                      for s, w in weights_ppm.items())
    h = _hash_bucket_sql(f"d.{key_col}", salt)
    return f"""
SELECT d.* FROM {table} d
JOIN (
  SELECT {source_col} AS source,
         sum(len({toks}))::BIGINT AS avail_tokens
  FROM {table} GROUP BY 1
) a ON d.{source_col} = a.source
LEFT JOIN (VALUES {wvals}) w(source, ppm) ON d.{source_col} = w.source
WHERE {h}::HUGEINT * a.avail_tokens * {_PPM}
      < {_BUCKETS}::HUGEINT * {int(token_budget)}
        * COALESCE(w.ppm, 0)"""
