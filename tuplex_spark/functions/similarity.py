"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  One projection + TakeOrdered; distributes trivially (no shuffle until
  the final top-k tree-reduce).
- ``ivf_topk``: IVF-style bucketed ANN — vectors are assigned to their
  nearest of C deterministic seed centroids at "index build" time;
  queries probe only the nearest ``nprobe`` buckets.  At 100 TB the
  assignment is a narrow projection and the probe is a partition-pruned
  scan on the centroid id — the classic scale path.

Dot products run as ``F.aggregate(F.zip_with(...))`` — JVM-side
higher-order functions, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a: Column, b: Column) -> Column:
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id"
                ) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = F.round(cosine_sim(F.col(vec_col), q), 6)
    return (df.select(F.col(id_col), cos.alias("cosine"))
              .orderBy(F.col("cosine").desc(), F.col(id_col))
              .limit(k))


def assign_centroids(df: DataFrame, centroids: list[tuple[int, list[float]]],
                     vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to the nearest centroid (max cosine,
    deterministic tie-break on centroid id)."""
    best_id, best_cos = None, None
    for cid, cvec in centroids:
        q = F.array(*[F.lit(float(x)) for x in cvec])
        cos = F.round(cosine_sim(F.col(vec_col), q), 6)
        if best_id is None:
            best_id, best_cos = F.lit(cid), cos
        else:
            better = cos > best_cos
            best_id = F.when(better, F.lit(cid)).otherwise(best_id)
            best_cos = F.when(better, cos).otherwise(best_cos)
    return df.withColumn("centroid", best_id)


def ivf_topk(df: DataFrame, query_vec: list[float],
             centroids: list[tuple[int, list[float]]], k: int = 10,
             nprobe: int = 2, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k probing only the nprobe nearest centroid buckets."""
    import math

    def py_cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    ranked = sorted(centroids,
                    key=lambda c: (-round(py_cos(query_vec, c[1]), 6), c[0]))
    probe_ids = [cid for cid, _ in ranked[:nprobe]]
    assigned = assign_centroids(df, centroids, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = F.round(cosine_sim(F.col(vec_col), q), 6)
    return (assigned.filter(F.col("centroid").isin(probe_ids))
            .select(F.col(id_col), cos.alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


# ---- SQL twins (DuckDB oracle) -------------------------------------------

def _vec_sql(vec):
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]::DOUBLE[]"


def cosine_topk_sql(query_vec, k=10, table="embeddings",
                    vec_col="embedding", id_col="vec_id"):
    q = _vec_sql(query_vec)
    return f"""
SELECT {id_col},
       round(list_dot_product({vec_col}::DOUBLE[], {q})
         / (sqrt(list_dot_product({vec_col}::DOUBLE[], {vec_col}::DOUBLE[]))
            * sqrt(list_dot_product({q}, {q}))), 6) AS cosine
FROM {table}
ORDER BY cosine DESC, {id_col}
LIMIT {k}"""


def ivf_topk_sql(query_vec, centroids, k=10, nprobe=2, table="embeddings",
                 vec_col="embedding", id_col="vec_id"):
    import math

    def py_cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(x * x for x in b)))

    ranked = sorted(centroids,
                    key=lambda c: (-round(py_cos(query_vec, c[1]), 6), c[0]))
    probe_ids = [cid for cid, _ in ranked[:nprobe]]
    q = _vec_sql(query_vec)
    cent_rows = ", ".join(
        f"({cid}, {_vec_sql(cv)})" for cid, cv in centroids)
    return f"""
WITH cent(cid, cvec) AS (VALUES {cent_rows}),
scored AS (
  SELECT e.{id_col}, e.{vec_col},
         c.cid,
         round(list_dot_product(e.{vec_col}::DOUBLE[], c.cvec)
           / (sqrt(list_dot_product(e.{vec_col}::DOUBLE[],
                                    e.{vec_col}::DOUBLE[]))
              * sqrt(list_dot_product(c.cvec, c.cvec))), 6) AS ccos
  FROM {table} e CROSS JOIN cent c
), assigned AS (
  SELECT {id_col}, {vec_col} FROM (
    SELECT *, row_number() OVER (
      PARTITION BY {id_col} ORDER BY ccos DESC, cid) AS rn
    FROM scored) WHERE rn = 1
    AND cid IN ({", ".join(str(i) for i in probe_ids)})
)
SELECT {id_col},
       round(list_dot_product({vec_col}::DOUBLE[], {q})
         / (sqrt(list_dot_product({vec_col}::DOUBLE[], {vec_col}::DOUBLE[]))
            * sqrt(list_dot_product({q}, {q}))), 6) AS cosine
FROM assigned
ORDER BY cosine DESC, {id_col}
LIMIT {k}"""
