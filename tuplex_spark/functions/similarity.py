"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  One projection + TakeOrdered; distributes trivially (no shuffle until
  the final top-k tree-reduce).
- ``ivf_topk``: IVF-style bucketed ANN — vectors are assigned to their
  nearest of C deterministic seed centroids at "index build" time;
  queries probe only the nearest ``nprobe`` buckets.  At 100 TB the
  assignment is a narrow projection and the probe is a partition-pruned
  scan on the centroid id — the classic scale path.

Execution shape: vector inner loops run as Arrow-batched pandas UDFs
with STRICT left-to-right accumulation (``acc = acc + E[:,d]*y[d]`` is a
float64 IEEE add per element, the same order as DuckDB's
list_dot_product loop, so oracle twins agree bitwise); everything around
them — rounding, argmax, filters, top-k — stays in Column expressions.

Two pure-Column formulations were measured and rejected:
- ``F.aggregate(F.zip_with(...))`` per row pair runs on Catalyst's
  INTERPRETED higher-order-function path (~10-100x slower than
  vectorized when evaluated millions of times — 14s for ivf at sf0.01).
- unrolling dots into 48 x 64 ``element_at`` terms (and chaining
  ``best = when(cos > best, ...).otherwise(best)``, a 2^C expression
  blow-up) overflowed janino's 64 KB method limit: 18s of
  compile-fail-fallback for a 500-row input, then interpreted
  evaluation.  Projection staging behind nondeterministic barriers did
  not rescue it.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

# Above this many driver-computed plan-embedded floats, ADC scoring,
# PQ encoding, and the residual subtraction move from plan literals /
# JVM struct-argmins to an Arrow pass with the constants in the UDF
# closure: literal F.array(...) tables and per-bucket when()-chains
# are whole-stage-codegen-friendly at graded params (m=4, c=8,
# nprobe=2 -> 64 doubles) but at FAISS-like production params (m=16,
# c=256, nprobe=32 -> 131k doubles) they overflow janino's 64 KB
# generated-method limit, and c-way struct references to a pandas-UDF
# column make every Catalyst pass re-hash the UDF's pickled closure
# per reference (measured ~15 CPU-min of driver plan-hashing at
# nlist=256).  The Arrow paths perform the IDENTICAL left-to-right
# accumulation on the identical driver doubles (asserted bitwise in
# tests/test_functions.py).
ADC_LITERAL_MAX = 1024


def _pdot(a: Column, b: Column) -> Column:
    """Arrow-vectorized dot product of two array<double> columns with
    strict left-to-right per-element accumulation."""
    @F.pandas_udf("double")
    def dot_udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
        import numpy as np
        X = np.vstack(xs.to_numpy()).astype(np.float64)
        Y = np.vstack(ys.to_numpy()).astype(np.float64)
        acc = X[:, 0] * Y[:, 0]
        for d in range(1, X.shape[1]):
            acc = acc + X[:, d] * Y[:, d]
        return pd.Series(acc)

    return dot_udf(a.cast("array<double>"), b.cast("array<double>"))


def _pdot_multi(a: Column, mat: list[list[float]],
                with_self: bool = False) -> Column:
    """Dots of the vector column against each constant vector in ``mat``,
    in one Arrow pass -> array<double> of len(mat).  ``with_self=True``
    appends the vector's SELF-dot (x·x, same strict left-to-right
    accumulation as :func:`_pdot`) as the final element — one Arrow
    pass instead of a second ArrowEvalPython for the norm."""
    const = [[float(x) for x in row] for row in mat]

    @F.pandas_udf("array<double>")
    def multi_udf(xs: pd.Series) -> pd.Series:
        import numpy as np
        X = np.vstack(xs.to_numpy()).astype(np.float64)
        outs = []
        for row in const:
            acc = X[:, 0] * row[0]
            for d in range(1, X.shape[1]):
                acc = acc + X[:, d] * row[d]
            outs.append(acc)
        if with_self:
            acc = X[:, 0] * X[:, 0]
            for d in range(1, X.shape[1]):
                acc = acc + X[:, d] * X[:, d]
            outs.append(acc)
        return pd.Series(list(np.stack(outs, axis=1)))

    return multi_udf(a.cast("array<double>"))


def vec_norm(a: Column) -> Column:
    """sqrt(dot(v, v)) with the strict accumulation order."""
    return F.sqrt(_pdot(a, a))


def _pcos(a: Column, b: Column) -> Column:
    """Cosine of two array<double> columns in ONE Arrow pass (dot and
    both norms, strict left-to-right accumulation — bitwise-identical
    to the DuckDB twin's three list_dot_product calls).  Computing the
    norms per PAIR beats two corpus-wide per-doc norm passes whenever
    candidates are sparser than the corpus — the LSH regime."""
    @F.pandas_udf("double")
    def cos_udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
        import numpy as np
        X = np.vstack(xs.to_numpy()).astype(np.float64)
        Y = np.vstack(ys.to_numpy()).astype(np.float64)
        dot = X[:, 0] * Y[:, 0]
        na = X[:, 0] * X[:, 0]
        nb = Y[:, 0] * Y[:, 0]
        for d in range(1, X.shape[1]):
            dot = dot + X[:, d] * Y[:, d]
            na = na + X[:, d] * X[:, d]
            nb = nb + Y[:, d] * Y[:, d]
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    return cos_udf(a.cast("array<double>"), b.cast("array<double>"))


def dot_fold_sql(a: str, b: str) -> str:
    """SQL for the dot product of two vector columns as a zip_with +
    aggregate fold: acc starts at 0.0 and adds CAST(x)*CAST(y) strictly
    left-to-right — the same order (and 0.0 seed) as DuckDB's
    list_dot_product loop, so oracle twins agree bitwise.

    Three formulations were measured on 256k sf0.1 pairs (warm):
    - this fold: 0.60s
    - a 64-term unrolled element_at/getItem chain: 1.2-1.4s — the
      generated method outgrows HotSpot's 8000-bytecode JIT limit and
      runs as interpreted bytecode (plus ~2.3s of py4j Column
      construction per query when composed, and doubled janino compile
      when a filter duplicates it)
    - the Arrow-UDF cosine (_pcos): ~160 us/pair in worker time x2
      evaluations — 5.4 Python-worker-minutes for 2M sf1 pairs and the
      source of dedup_embedding's 12-146s run-to-run swings
    The module-header warning about interpreted higher-order functions
    holds for MANY HOF evaluations per row (_pdot_multi's C=48 constant
    vectors: 14s at sf0.01) — a single zip_with per row is fine."""
    return (f"aggregate(zip_with({a}, {b}, "
            f"(x, y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)), "
            f"0.0D, (acc, t) -> acc + t)")


def norm_fold_sql(a: str) -> str:
    """SQL for sqrt(dot(v, v)) with the same fold order/seed."""
    return f"SQRT({dot_fold_sql(a, a)})"


def jvm_cosine(a: str, b: str) -> Column:
    """Cosine of two vector columns (by NAME) as a pure JVM expression —
    see :func:`dot_fold_sql` for why this beats both the Arrow UDF and
    an unrolled chain for the per-candidate-pair verify stage of LSH
    dedup.  Use :func:`_pcos` only when the call site cannot name its
    columns."""
    return F.expr(f"({dot_fold_sql(a, b)})"
                  f" / ({norm_fold_sql(a)} * {norm_fold_sql(b)})")


def py_norm(vec: list[float]) -> float:
    """Python-side norm with the same left-to-right IEEE summation order
    as the vectorized chain (and DuckDB's loop)."""
    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


# -- generic array-column helpers (JVM higher-order functions; fine for
#    one-off expressions, interpreted — hot paths use the Arrow form) ------

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
    """Exact top-k by cosine similarity against a literal query vector.
    One narrow whole-stage-codegen projection + TakeOrdered; the query
    norm is a Python constant.

    For a SINGLE query vector the dot/norm unroll to ~2*dim element_at
    terms — small enough to codegen (the janino 64 KB failure needed
    48 hyperplanes' worth) and faster than an Arrow round-trip.  The
    expression is assembled as SQL text parsed once: chaining hundreds
    of Column objects costs ~1s of py4j round-trips per build.  The sum
    chain is left-to-right, matching DuckDB's list_dot_product."""
    cos = _single_query_cos(vec_col, query_vec)
    return (df.select(F.col(id_col), cos.alias("cosine"))
              .orderBy(F.col("cosine").desc(), F.col(id_col))
              .limit(k))


def _single_query_cos(vec_col: str, query_vec: list[float]) -> Column:
    """Rounded cosine against one literal query vector as a codegen'd
    SQL expression (see cosine_topk docstring for why this form)."""
    dim = len(query_vec)
    qn = py_norm(query_vec)

    def e(d):
        # per-element scalar cast (an array-level cast referenced 2*dim
        # times would re-copy the array per reference if inlined)
        return f"CAST(element_at({vec_col}, {d + 1}) AS DOUBLE)"

    dot = " + ".join(f"{e(d)} * {float(query_vec[d])!r}"
                     for d in range(dim))
    nrm = " + ".join(f"{e(d)} * {e(d)}" for d in range(dim))
    return F.expr(f"round(({dot}) / (sqrt({nrm}) * {qn!r}), 6)")


def batch_cosine_topk(df: DataFrame, queries: DataFrame, k: int = 5,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      q_id_col: str = "q_id", q_vec_col: str = "q_vec"
                      ) -> DataFrame:
    """Per-query exact top-k for a TABLE of query vectors — the
    retrieval-pipeline shape (cosine_topk/ivf_topk take one vector).

    The query batch is collected (bounded: a retrieval batch is by
    construction small enough to broadcast — the same bounded-fetch
    contract as the centroid seeds) and rides into ONE Arrow pass over
    the corpus as a constant matrix (_pdot_multi), so the corpus is
    scanned exactly once no matter how many queries.  Per-query top-k
    is a row_number window capped at k: Spark lowers filter(rn <= k)
    to WindowGroupLimit, pruning each partition to k rows per query
    MAP-SIDE before the exchange — at 100 TB the shuffle carries
    ≤ Q*k rows per partition, never the scored corpus.

    Output: (q_id, id_col, cosine, rnk) — self-matches are kept (a
    query drawn from the corpus ranks itself first at cosine 1.0).
    Accumulation is strict left-to-right, bitwise-matching DuckDB's
    list_dot_product twin."""
    from pyspark.sql import Window

    qrows = queries.select(q_id_col, q_vec_col).collect()
    qrows.sort(key=lambda r: r[0])
    qids = [r[0] for r in qrows]
    qvecs = [[float(x) for x in r[1]] for r in qrows]
    qnorms = [py_norm(v) for v in qvecs]

    v = F.col(vec_col)
    # stage the Q dots AND the norm in one projection BEFORE the
    # explode: inlining vec_norm beside posexplode leaves its Arrow
    # eval ABOVE the Generate, recomputing the norm once per query
    # instead of once per vector (plan-asserted in tests/test_plans.py)
    staged = df.select(F.col(id_col),
                       _pdot_multi(v, qvecs).alias("_dots"),
                       vec_norm(v).alias("_nrm"))
    scored = staged.select(
        F.col(id_col), F.col("_nrm"),
        F.posexplode("_dots").alias("_qi", "_dot"))
    qid_arr = F.array(*[F.lit(q) for q in qids])
    qn_arr = F.array(*[F.lit(n) for n in qnorms])
    scored = scored.select(
        F.element_at(qid_arr, F.col("_qi") + 1).alias("q_id"),
        F.col(id_col),
        F.round(F.col("_dot")
                / (F.col("_nrm")
                   * F.element_at(qn_arr, F.col("_qi") + 1)), 6)
         .alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def batch_cosine_topk_sql(k: int = 5, table: str = "embeddings",
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          query_pred: str = "vec_id < 6") -> str:
    """DuckDB twin: queries drawn from the same table by predicate,
    cross-joined, per-query row_number ≤ k."""
    return f"""
WITH q AS (
  SELECT {id_col} AS q_id, {vec_col}::DOUBLE[] AS qv
  FROM {table} WHERE {query_pred}
), scored AS (
  SELECT q.q_id, e.{id_col},
         round(list_dot_product(e.{vec_col}::DOUBLE[], q.qv)
           / (sqrt(list_dot_product(e.{vec_col}::DOUBLE[],
                                    e.{vec_col}::DOUBLE[]))
              * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
  FROM {table} e CROSS JOIN q
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY cosine DESC, {id_col}) AS rnk
  FROM scored)
SELECT q_id, {id_col}, cosine, rnk::INT AS rnk FROM ranked
WHERE rnk <= {k}"""


def batch_ivf_topk(df: DataFrame, queries: DataFrame,
                   centroids: list[tuple[int, list[float]]],
                   k: int = 5, nprobe: int = 2,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   q_id_col: str = "q_id", q_vec_col: str = "q_vec"
                   ) -> DataFrame:
    """Batch IVF retrieval — the 100 TB shape: each query row explodes
    to its ``nprobe`` nearest centroids and EQUI-JOINS the
    centroid-assigned corpus on the centroid id, so queries travel to
    buckets and the corpus is never broadcast or re-scanned per query
    (against an ivf_build index the join side is partition-pruned
    parquet).  Per-query top-k is a WindowGroupLimit-pruned
    row_number, as in batch_cosine_topk.

    Probe selection per query is a sort_array over (rounded ccos,
    -cid) structs — cosine desc with smallest-cid tie-break, the same
    deterministic ranking as _rank_probes, so the DuckDB twin agrees
    exactly.  The per-candidate cosine is the zip_with+aggregate fold:
    candidates are queries x nprobe buckets (sparse); for a corpus-hot
    verify path see dedup.embedding_dup_pairs' JIT'd struct-dot."""
    from pyspark.sql import Window

    cn = [py_norm(cv) for _, cv in centroids]
    qd = _pdot_multi(F.col(q_vec_col), [cv for _, cv in centroids])
    qstaged = queries.select(q_id_col, q_vec_col, qd.alias("_qd"),
                             vec_norm(F.col(q_vec_col)).alias("_qn"))
    structs = F.array(*[
        F.struct(F.round(F.col("_qd")[i] / (F.col("_qn") * F.lit(cn[i])),
                         6).alias("c"),
                 F.lit(-cid).alias("n"))
        for i, (cid, _) in enumerate(centroids)])
    probes = F.transform(
        F.slice(F.sort_array(structs, False), 1, nprobe),
        lambda s: -s["n"])
    qx = qstaged.select(q_id_col, q_vec_col, "_qn",
                        F.explode(probes).alias("centroid"))
    corpus = assign_centroids(df, centroids, vec_col) \
        .withColumn("_nv", vec_norm(F.col(vec_col)))
    joined = qx.join(corpus, "centroid")
    cos = F.round(F.expr(dot_fold_sql(q_vec_col, vec_col))
                  / (F.col("_nv") * F.col("_qn")), 6)
    scored = joined.select(F.col(q_id_col).alias("q_id"),
                           F.col(id_col), cos.alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def batch_ivf_topk_sql(cent_sql: str | None = None, k: int = 5,
                       nprobe: int = 2,
                       table: str = "embeddings",
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       query_pred: str = "vec_id < 6") -> str:
    """DuckDB twin: identical probe ranking (rounded cosine desc, cid
    tie-break), identical corpus assignment, identical per-candidate
    cosine.  ``cent_sql`` selects (cid, cvec DOUBLE[]) — defaults to
    the same first-8-vectors seed set the graded query fetches, so the
    twin needs no Spark session at oracle-build time."""
    if cent_sql is None:
        cent_sql = (f"SELECT {id_col} AS cid, "
                    f"{vec_col}::DOUBLE[] AS cvec "
                    f"FROM {table} WHERE {id_col} < 8")
    return f"""
WITH cent AS ({cent_sql}),
q AS (
  SELECT {id_col} AS q_id, {vec_col}::DOUBLE[] AS qv
  FROM {table} WHERE {query_pred}
), qprobe AS (
  SELECT q_id, qv, cid AS centroid FROM (
    SELECT q.q_id, q.qv, c.cid,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
             round(list_dot_product(q.qv, c.cvec)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(c.cvec, c.cvec))), 6) DESC,
             c.cid) AS prn
    FROM q CROSS JOIN cent c) WHERE prn <= {nprobe}
), assigned AS (
  SELECT {id_col}, {vec_col}, centroid FROM (
    SELECT e.{id_col}, e.{vec_col}, c.cid AS centroid,
           row_number() OVER (PARTITION BY e.{id_col} ORDER BY
             round(list_dot_product(e.{vec_col}::DOUBLE[], c.cvec)
               / (sqrt(list_dot_product(e.{vec_col}::DOUBLE[],
                                        e.{vec_col}::DOUBLE[]))
                  * sqrt(list_dot_product(c.cvec, c.cvec))), 6) DESC,
             c.cid) AS rn
    FROM {table} e CROSS JOIN cent c) WHERE rn = 1
), scored AS (
  SELECT p.q_id, a.{id_col},
         round(list_dot_product(p.qv, a.{vec_col}::DOUBLE[])
           / (sqrt(list_dot_product(a.{vec_col}::DOUBLE[],
                                    a.{vec_col}::DOUBLE[]))
              * sqrt(list_dot_product(p.qv, p.qv))), 6) AS cosine
  FROM qprobe p JOIN assigned a USING (centroid)
)
SELECT q_id, {id_col}, cosine, rnk::INT AS rnk FROM (
  SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY cosine DESC, {id_col}) AS rnk
  FROM scored) WHERE rnk <= {k}"""


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Per-vector symmetric int8 scalar quantization — the standard 4x
    storage cut for embedding corpora (float32 -> int8 + one scale).

    ``scale = max(|x|)/127``; ``q_d = round(x_d / scale)`` (HALF_UP —
    ties away from zero, the rounding both Spark's round() and DuckDB's
    round() use, so the twin is exact); a zero vector quantizes to all
    zeros with scale 0.  Output keeps the original columns plus
    ``q_scale`` and ``q_vec array<int>``.

    Plan shape: one narrow projection, JVM higher-order transforms
    (no Python), no shuffle — at 100 TB this is a pure map over the
    vector table feeding a columnar write."""
    v = F.col(vec_col).cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    out = df.withColumn("q_scale", scale)
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.when(F.col("q_scale") == 0.0, F.lit(0))
                   .otherwise(F.round(x / F.col("q_scale"), 0)
                              .cast("int")))
    return out.withColumn("q_vec", q)


def quantize_int8_sql(table: str = "embeddings",
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> str:
    """DuckDB twin of the graded quantization digest query: per-vector
    scale + exact integer digests of the quantized vector + the
    sequential-fold reconstruction error (same IEEE order as the Spark
    aggregate fold)."""
    return f"""
SELECT {id_col},
       round(s, 6) AS q_scale,
       CAST(list_sum(q) AS BIGINT) AS q_sum,
       CAST(list_min(q) AS INT) AS q_min,
       CAST(list_max(q) AS INT) AS q_max,
       round(list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(v, (x, i) -> abs(x - q[i] * s))),
               (a, b) -> a + b) / len(v), 9) AS mae
FROM (
  SELECT {id_col}, v, s,
         list_transform(v, x -> CASE WHEN s = 0 THEN 0
                                     ELSE CAST(round(x / s) AS INT)
                                END) AS q
  FROM (
    SELECT {id_col}, {vec_col}::DOUBLE[] AS v,
           list_max(list_transform({vec_col}::DOUBLE[],
                                   x -> abs(x))) / 127.0 AS s
    FROM {table}))"""


def kmeans_seeds(df: DataFrame, c: int = 8, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> list[tuple[int, list[float]]]:
    """Deterministic k-means init: the ``c`` vectors whose md5 content
    hash (of the id) is smallest — the same content-addressed uniform
    pick as sampling.py/sketch.py, so the DuckDB twin selects the
    identical seed set with no RNG and no Spark session.  Centroid ids
    are 0..c-1 in (hash, id) order.

    Plan: orderBy(h).limit(c) lowers to TakeOrdered — per-partition
    top-c, at most c rows per partition cross to the driver."""
    from .sketch import _hash_frac
    rows = (df.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v"),
                      _hash_frac(id_col).alias("h"))
            .orderBy("h", "id").limit(c).collect())
    return [(i, [float(x) for x in r["v"]]) for i, r in enumerate(rows)]


def _kmeans_avg_aggs(dim: int) -> list[Column]:
    """Per-dimension centroid mean, rounded to 6 decimals so the
    distributed (order-nondeterministic) double sum agrees with the
    DuckDB twin's avg — the same absorption margin every graded
    aggregate here uses."""
    return [F.round(F.avg(F.element_at(F.col("_v"), d + 1)), 6)
             .alias(f"c{d}") for d in range(dim)]


def py_dot(a, b) -> float:
    """Strict left-to-right float dot — the Python mirror of
    list_dot_product / _pdot, so driver-computed constants embed
    bitwise-identical doubles in both engines."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _argmin_centroid_l2(dn: Column,
                        centroids: list[tuple[int, list[float]]]
                        ) -> Column:
    """greatest-struct argmin over per-centroid rounded SQUARED L2
    distances (``dn`` = array of dots with the self-dot appended, from
    _pdot_multi(with_self=True)).  dist2 = (v.v - 2.0*v.c) + c.c with
    the centroid self-dot a driver constant (py_dot) — the exact
    left-assoc expression the DuckDB twin writes, so the rounded
    values and the smallest-cid tie-break agree bitwise."""
    sd = dn[len(centroids)]
    structs = []
    for i, (cid, cvec) in enumerate(centroids):
        d2 = F.round((sd - F.lit(2.0) * dn[i]) + F.lit(py_dot(cvec, cvec)),
                     6)
        structs.append(F.struct((-d2).alias("c"), F.lit(-cid).alias("n")))
    best = structs[0] if len(structs) == 1 else F.greatest(*structs)
    return (-best.getField("n")).cast("int")


def _argmin_l2_sql(dn: str, centroids: list[tuple[int, list[float]]]
                   ) -> str:
    """:func:`_argmin_centroid_l2` as ONE SQL-text expression over a
    NAMED dots column (``dn`` — the staged alias of the
    _pdot_multi(with_self=True) output).  Parses to the identical
    expression tree (same round/greatest/tie-break, driver constants
    embedded via repr — the exact-round-trip discipline
    _single_query_cos established), but costs one parse instead of
    ~5*c py4j Column round-trips per call site — measured 0.65 s off
    a single m=4/c=8 encode build."""
    sd = f"{dn}[{len(centroids)}]"
    structs = ", ".join(
        f"struct(-round(({sd} - 2.0D * {dn}[{i}])"
        f" + {py_dot(cv, cv)!r}D, 6) AS c, {-int(cid)} AS n)"
        for i, (cid, cv) in enumerate(centroids))
    inner = structs if len(centroids) == 1 else f"greatest({structs})"
    return f"CAST(-(({inner}).n) AS INT)"


def _argmax_cos_sql(dn: str, centroids: list[tuple[int, list[float]]]
                    ) -> str:
    """:func:`_argmax_centroid` as ONE SQL-text expression over a
    NAMED dots-with-self column; the vector norm is
    ``SQRT(dn[C])`` textually (same value the Column form staged) and
    each centroid norm a py_norm driver constant — identical rounded
    cosines, identical smallest-cid tie-break, one parse."""
    nrm = f"SQRT({dn}[{len(centroids)}])"
    structs = ", ".join(
        f"struct(round({dn}[{i}] / ({nrm} * {py_norm(cv)!r}D), 6) AS c,"
        f" {-int(cid)} AS n)"
        for i, (cid, cv) in enumerate(centroids))
    inner = structs if len(centroids) == 1 else f"greatest({structs})"
    return f"CAST(-(({inner}).n) AS INT)"


def _assign_l2(df: DataFrame, centroids: list[tuple[int, list[float]]],
               vec_col: str,
               max_literals: int | None = None) -> DataFrame:
    """assign_centroids under squared-L2 (the PQ/codebook metric) —
    same ONE-Arrow-pass shape as the cosine version.  Above
    ``max_literals`` embedded floats (c*dim; defaults to
    ADC_LITERAL_MAX) the argmin moves INTO the Arrow pass
    (:func:`_pq_codes_arrow` with the centroid set as one full-dim
    "subspace") — the JVM greatest-struct form references the UDF
    column c times and pays the plan-hashing blow-up
    _pq_codes_arrow's docstring describes.  Every graded trajectory
    (kmeans twins at c=8, pq_train at c<=256 over dim/m subvectors)
    stays on the exact literal path."""
    if max_literals is None:
        max_literals = ADC_LITERAL_MAX
    v = F.col(vec_col)
    if len(centroids) * len(centroids[0][1]) <= max_literals:
        dn = _pdot_multi(v, [cv for _, cv in centroids], with_self=True)
        # stage the dots column behind an alias and build the argmin
        # as ONE parsed SQL expression (see _argmin_l2_sql) instead of
        # ~5*c py4j Column calls per assignment build
        staged = df.select("*", dn.alias("__dn"))
        return (staged.withColumn(
                    "centroid",
                    F.expr(_argmin_l2_sql("__dn", centroids)))
                .drop("__dn"))
    code = _pq_codes_arrow(v.cast("array<double>"),
                           [list(centroids)]).getItem(0)
    return df.withColumn("centroid", code)


def kmeans_fit(df: DataFrame, c: int = 8, rounds: int = 3,
               vec_col: str = "embedding", id_col: str = "vec_id",
               dim: int = 64,
               metric: str = "cosine") -> list[tuple[int, list[float]]]:
    """Distributed spherical k-means (Lloyd iterations under cosine):
    learned IVF centroids instead of arbitrary seed vectors.

    Each round is (1) an assignment pass — the C dots ride ONE Arrow
    batch per vector (:func:`_pdot_multi`), argmax by rounded cosine
    with smallest-cid tie-break, exactly the :func:`assign_centroids`
    contract the IVF queries already grade — and (2) a groupBy-avg
    update (map-side partial aggregation; the exchange carries C
    partial rows per partition).  Empty clusters keep their previous
    centroid.  Driver state per round is exactly C centroids; rounds
    are a fixed constant — at 100 TB this is ``rounds`` bounded jobs,
    each one scan + one C-row aggregate, no unbounded collect anywhere.

    Determinism: init is content-addressed (:func:`kmeans_seeds`);
    every centroid component is rounded to 6 decimals at the round
    boundary, so both engines iterate over bitwise-identical centroid
    values and the DuckDB twin (:func:`kmeans_sql`) replays the exact
    trajectory.  The reference has no clustering ops at all
    (SURVEY §2.4) — parity-plus.

    ``metric="l2"`` runs classic Lloyd under squared Euclidean
    distance instead — the codebook metric product quantization
    (:func:`pq_train`) needs; assignment stays one Arrow pass
    (:func:`_assign_l2`), updates are the same rounded means."""
    if metric not in ("cosine", "l2"):
        raise ValueError(f"kmeans metric {metric!r}")
    base = df.select(F.col(id_col).alias("_id"),
                     F.col(vec_col).cast("array<double>").alias("_v"))
    cents = kmeans_seeds(df, c, vec_col, id_col)
    for _ in range(rounds):
        assigned = (assign_centroids(base, cents, "_v")
                    if metric == "cosine"
                    else _assign_l2(base, cents, "_v"))
        # Per-round update as ONE narrow exploded aggregate —
        # groupBy(centroid, dim-pos) over posexplode — instead of dim
        # separate avg(element_at(...)) agg columns.  Same per-(cid, d)
        # value multiset, same round(avg, 6) absorption margin, but the
        # wide form paid ~1s/round of driver-side Column construction +
        # analysis for a 64-dim update and another ~0.4s executing the
        # 64-agg codegen; the exploded form is a 3-column plan.  The
        # (c*dim)-row result rides Arrow (toPandas), not row pickle.
        pdf = (assigned.select("centroid",
                               F.posexplode("_v").alias("_d", "_x"))
               .groupBy("centroid", "_d")
               .agg(F.round(F.avg("_x"), 6).alias("_m"))
               .toPandas())
        pv = pdf.pivot(index="centroid", columns="_d", values="_m")
        upd = {int(cid): [float(x) for x in row]
               for cid, row in zip(pv.index, pv.to_numpy())}
        cents = [(cid, upd.get(cid, vec)) for cid, vec in cents]
    return cents


def kmeans_result(df: DataFrame, c: int = 8, rounds: int = 3,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  dim: int = 64) -> DataFrame:
    """Graded form of :func:`kmeans_fit`: ``rounds-1`` collected
    iterations, then the FINAL assignment + update left in-plan, the
    centroid array exploded to (cid, d, val, n_members) rows — C*dim
    rows, every component value-hashed against the oracle."""
    cents = kmeans_fit(df, c, rounds - 1, vec_col, id_col, dim)
    base = df.select(F.col(id_col).alias("_id"),
                     F.col(vec_col).cast("array<double>").alias("_v"))
    assigned = assign_centroids(base, cents, "_v")
    upd = (assigned.groupBy("centroid")
           .agg(*_kmeans_avg_aggs(dim),
                F.count(F.lit(1)).alias("n")))
    prev = df.sparkSession.createDataFrame(
        [(cid, vec) for cid, vec in cents], "cid int, pv array<double>")
    j = prev.join(upd, prev.cid == upd.centroid, "left")
    # empty cluster: carry the previous centroid UNROUNDED (round-0
    # seeds are raw data vectors) — the twin's COALESCE does the same
    vals = F.array(*[F.coalesce(F.col(f"c{d}"),
                                F.element_at(F.col("pv"), d + 1))
                     for d in range(dim)])
    return (j.select(F.col("cid"),
                     F.coalesce(F.col("n"), F.lit(0)).cast("long")
                      .alias("n_members"),
                     F.posexplode(vals).alias("d", "val"))
            .select("cid", F.col("d").cast("int").alias("d"),
                    "val", "n_members"))


def _kmeans_ctes(c: int, rounds: int, table: str, vec_col: str,
                 id_col: str, dim: int, metric: str = "cosine",
                 prefix: str = "", vec_sql: str | None = None,
                 materialized: bool = False) -> list[str]:
    """The round-by-round CTE chain shared by :func:`kmeans_sql`,
    :func:`kmeans_cent_sql` and :func:`pq_topk_sql` — identical seed
    pick, assignment ranking, rounded per-dimension means, and
    empty-cluster carryover.  ``metric="l2"`` ranks by the same
    rounded squared-distance expression :func:`_argmin_centroid_l2`
    computes; ``prefix`` namespaces the CTEs so several chains (PQ
    subspaces) coexist in one query; ``vec_sql`` overrides the vector
    expression (e.g. a subvector slice)."""
    from .sketch import _HASH64_DUCK
    h = _HASH64_DUCK.format(c=id_col)
    vexpr = vec_sql or f"{vec_col}::DOUBLE[]"
    if metric == "cosine":
        rank = ("round(list_dot_product(b.v, c.cvec)"
                " / (sqrt(list_dot_product(b.v, b.v))"
                " * sqrt(list_dot_product(c.cvec, c.cvec))), 6)"
                " DESC")
    else:
        rank = ("round((list_dot_product(b.v, b.v)"
                " - 2.0*list_dot_product(b.v, c.cvec))"
                " + list_dot_product(c.cvec, c.cvec), 6) ASC")
    avgs = ", ".join(f"round(avg(v[{d + 1}]), 6)" for d in range(dim))
    p = prefix
    # base and cent{r} are each referenced more than once; without
    # MATERIALIZED DuckDB may inline them and the expansion compounds
    # per round (the BPE-sym lesson).  Opt-in so the long-green
    # single-chain oracles keep their exact historical SQL text.
    M = "MATERIALIZED " if materialized else ""
    ctes = [f"""{p}base AS {M}(
  SELECT {id_col} AS id, {vexpr} AS v, {h} AS hh
  FROM {table}
)""", f"""{p}cent0 AS {M}(
  SELECT CAST(row_number() OVER (ORDER BY hh, id) - 1 AS INT) AS cid,
         v AS cvec
  FROM (SELECT hh, id, v FROM {p}base ORDER BY hh, id LIMIT {c})
)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""{p}asg{r} AS (
  SELECT id, v, cid FROM (
    SELECT b.id, b.v, c.cid,
           row_number() OVER (PARTITION BY b.id
             ORDER BY {rank}, c.cid) AS rn
    FROM {p}base b CROSS JOIN {p}cent{r - 1} c) WHERE rn = 1
)""")
        ctes.append(f"""{p}upd{r} AS (
  SELECT cid, count(*)::BIGINT AS n, [{avgs}] AS cvec
  FROM {p}asg{r} GROUP BY cid
)""")
        ctes.append(f"""{p}cent{r} AS {M}(
  SELECT p.cid, COALESCE(u.cvec, p.cvec) AS cvec
  FROM {p}cent{r - 1} p LEFT JOIN {p}upd{r} u USING (cid)
)""")
    return ctes


def kmeans_sql(c: int = 8, rounds: int = 3, table: str = "embeddings",
               vec_col: str = "embedding", id_col: str = "vec_id",
               dim: int = 64) -> str:
    """DuckDB twin of :func:`kmeans_result`: the CTE chain replayed
    round by round, final centroids exploded per component."""
    ctes = _kmeans_ctes(c, rounds, table, vec_col, id_col, dim)
    return (f"WITH {', '.join(ctes)}\n"
            f"SELECT c.cid, CAST(gs.d AS INT) AS d,\n"
            f"       c.cvec[gs.d + 1] AS val,\n"
            f"       COALESCE(u.n, 0) AS n_members\n"
            f"FROM cent{rounds} c\n"
            f"LEFT JOIN upd{rounds} u USING (cid)\n"
            f"CROSS JOIN (SELECT unnest(generate_series(0, {dim - 1}))"
            f" AS d) gs")


def kmeans_cent_sql(c: int = 8, rounds: int = 3,
                    table: str = "embeddings",
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    dim: int = 64) -> str:
    """DuckDB twin of :func:`kmeans_fit`'s return value as a
    (cid, cvec) table — drops into :func:`batch_ivf_topk_sql`'s
    ``cent_sql`` slot to replay TRAINED-centroid retrieval."""
    ctes = _kmeans_ctes(c, rounds, table, vec_col, id_col, dim)
    return (f"WITH {', '.join(ctes)}\n"
            f"SELECT cid, cvec FROM cent{rounds}")


def pq_topk_sql(m: int = 4, c: int = 8, rounds: int = 2, k: int = 10,
                table: str = "embeddings", vec_col: str = "embedding",
                id_col: str = "vec_id", dim: int = 64,
                query_where: str = "vec_id = 0") -> str:
    """DuckDB twin of pq_train -> pq_encode -> :func:`pq_topk`: per
    subspace, the L2 k-means trajectory replays in its own prefixed
    CTE chain, the corpus encodes by the identical rounded-distance
    argmin, and the ADC score is the identical left-assoc term sum
    over the replayed codebooks — bitwise agreement end to end."""
    sub = dim // m
    ctes: list[str] = []
    encs: list[str] = []
    for s in range(m):
        p = f"s{s}_"
        vs = f"({vec_col}::DOUBLE[])[{s * sub + 1}:{(s + 1) * sub}]"
        ctes += _kmeans_ctes(c, rounds, table, vec_col, id_col, sub,
                             metric="l2", prefix=p, vec_sql=vs,
                             materialized=True)
        encs.append(f"""{p}enc AS MATERIALIZED (
  SELECT id, cid FROM (
    SELECT b.id, c.cid,
           row_number() OVER (PARTITION BY b.id
             ORDER BY round((list_dot_product(b.v, b.v)
               - 2.0*list_dot_product(b.v, c.cvec))
               + list_dot_product(c.cvec, c.cvec), 6) ASC, c.cid) AS rn
    FROM {p}base b CROSS JOIN {p}cent{rounds} c) WHERE rn = 1
)""")
    q = (f"q AS (SELECT {vec_col}::DOUBLE[] AS qv FROM {table} "
         f"WHERE {query_where})")
    terms = []
    joins = []
    for s in range(m):
        p = f"s{s}_"
        qs = f"(q.qv)[{s * sub + 1}:{(s + 1) * sub}]"
        terms.append(
            f"((list_dot_product({qs}, {qs})"
            f" - 2.0*list_dot_product({qs}, c{s}.cvec))"
            f" + list_dot_product(c{s}.cvec, c{s}.cvec))")
        joins.append(f"JOIN {p}enc e{s} ON e{s}.id = e0.id\n"
                     f"JOIN {p}cent{rounds} c{s} ON c{s}.cid = e{s}.cid"
                     if s else
                     f"JOIN {p}cent{rounds} c0 ON c0.cid = e0.cid")
    return (f"WITH {', '.join(ctes + encs)}, {q}\n"
            f"SELECT e0.id AS {id_col},\n"
            f"       round({' + '.join(terms)}, 6) AS adc\n"
            f"FROM s0_enc e0\n" + "\n".join(joins) + ", q\n"
            f"ORDER BY adc, e0.id\nLIMIT {k}")


def ivfpq_topk_sql(k: int = 10, nlist: int = 8, m: int = 4,
                   cpq: int = 8, rounds: int = 2, nprobe: int = 2,
                   table: str = "embeddings",
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   dim: int = 64,
                   query_where: str = "vec_id = 0") -> str:
    """DuckDB twin of :func:`ivfpq_topk`: the coarse L2 trajectory,
    the final assignment + residuals, each subspace's residual-PQ
    trajectory and encode, the probe ranking, and the per-row ADC
    terms all replay with the identical rounding/tie-break/accumulation
    discipline — bitwise agreement end to end."""
    sub = dim // m
    R = rounds
    l2rank = ("round((list_dot_product(b.v, b.v)"
              " - 2.0*list_dot_product(b.v, c.cvec))"
              " + list_dot_product(c.cvec, c.cvec), 6) ASC")
    ctes = _kmeans_ctes(nlist, R, table, vec_col, id_col, dim,
                        metric="l2", prefix="co_", materialized=True)
    ctes.append(f"""co_asgF AS MATERIALIZED (
  SELECT id, v, cid FROM (
    SELECT b.id, b.v, c.cid,
           row_number() OVER (PARTITION BY b.id
             ORDER BY {l2rank}, c.cid) AS rn
    FROM co_base b CROSS JOIN co_cent{R} c) WHERE rn = 1
)""")
    ctes.append(f"""resid AS MATERIALIZED (
  SELECT a.id AS {id_col}, a.cid AS centroid,
         list_transform(list_zip(a.v, c.cvec), p -> p[1] - p[2]) AS r
  FROM co_asgF a JOIN co_cent{R} c ON c.cid = a.cid
)""")
    for s in range(m):
        p = f"s{s}_"
        ctes += _kmeans_ctes(cpq, R, "resid", vec_col, id_col, sub,
                             metric="l2", prefix=p, materialized=True,
                             vec_sql=f"r[{s * sub + 1}:{(s + 1) * sub}]")
        ctes.append(f"""{p}enc AS MATERIALIZED (
  SELECT id, cid FROM (
    SELECT b.id, c.cid,
           row_number() OVER (PARTITION BY b.id
             ORDER BY {l2rank}, c.cid) AS rn
    FROM {p}base b CROSS JOIN {p}cent{R} c) WHERE rn = 1
)""")
    ctes.append(f"""q AS (
  SELECT {vec_col}::DOUBLE[] AS qv FROM {table} WHERE {query_where}
)""")
    ctes.append(f"""probe AS (
  SELECT cid, cvec FROM co_cent{R}, q
  ORDER BY round((list_dot_product(q.qv, q.qv)
    - 2.0*list_dot_product(q.qv, cvec))
    + list_dot_product(cvec, cvec), 6) ASC, cid
  LIMIT {nprobe}
)""")
    terms = []
    joins = []
    for s in range(m):
        qs = (f"(list_transform(list_zip(q.qv, p.cvec), "
              f"lp -> lp[1] - lp[2]))[{s * sub + 1}:{(s + 1) * sub}]")
        terms.append(
            f"((list_dot_product({qs}, {qs})"
            f" - 2.0*list_dot_product({qs}, c{s}.cvec))"
            f" + list_dot_product(c{s}.cvec, c{s}.cvec))")
        joins.append(
            f"JOIN s{s}_enc e{s} ON e{s}.id = e.{id_col}\n"
            f"JOIN s{s}_cent{R} c{s} ON c{s}.cid = e{s}.cid")
    return (f"WITH {', '.join(ctes)}\n"
            f"SELECT e.{id_col},\n"
            f"       round({' + '.join(terms)}, 6) AS adc\n"
            f"FROM resid e\nJOIN probe p ON p.cid = e.centroid\n"
            + "\n".join(joins) + ", q\n"
            f"ORDER BY adc, e.{id_col}\nLIMIT {k}")


def quantized_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                   rerank: int = 4, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """Asymmetric retrieval over the int8-quantized corpus — the shape
    a 100 TB embedding store actually queries: stage 1 scans ONLY the
    quantized table (4x smaller than float32), scoring each row by the
    cosine of the float64 query against the RECONSTRUCTED vector
    (``r_d = q_d * scale`` inside the dot — the query side is never
    quantized); stage 2 fetches the top ``rerank*k`` candidates' float
    vectors by an id equi-join (AQE broadcasts the bounded candidate
    set) and reranks them with the exact cosine.

    Plan at scale: one narrow scan of the quantized table ->
    TakeOrdered(rerank*k) -> broadcast semi-join back to the float
    table restricted to rerank*k rows -> TakeOrdered(k).  The float
    corpus is never fully scanned at query time.

    Zero vectors (scale 0) reconstruct to all-zeros with an undefined
    cosine; both engines exclude them (``q_scale > 0``).

    Output: (id, cosine_q approx score, cosine exact score), top-k by
    exact cosine.  Accumulation left-to-right — bitwise vs the twin."""
    dim = len(query_vec)
    m = rerank * k
    qn = py_norm(query_vec)
    qz = quantize_int8(df, vec_col, id_col) \
        .select(id_col, "q_scale", "q_vec")

    def e(d):
        return f"(CAST(element_at(q_vec, {d + 1}) AS DOUBLE) * q_scale)"

    num = " + ".join(f"{e(d)} * {float(query_vec[d])!r}"
                     for d in range(dim))
    nrm = " + ".join(f"{e(d)} * {e(d)}" for d in range(dim))
    approx = F.expr(f"round(({num}) / (sqrt({nrm}) * {qn!r}), 6)")
    cand = (qz.filter(F.col("q_scale") > 0)
            .select(F.col(id_col), approx.alias("cosine_q"))
            .orderBy(F.col("cosine_q").desc(), F.col(id_col))
            .limit(m))
    exact = _single_query_cos(vec_col, query_vec)
    rer = cand.join(df.select(id_col, vec_col), id_col)
    return (rer.select(F.col(id_col), "cosine_q", exact.alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


def quantized_topk_sql(k: int = 10, rerank: int = 4,
                       table: str = "embeddings",
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       query_where: str = "vec_id = 0") -> str:
    """DuckDB twin of :func:`quantized_topk` — identical quantization
    (HALF_UP, bitwise-locked by the vec_quantize digests), identical
    reconstruction arithmetic and accumulation order, identical
    candidate cut and rerank.  The query vector is drawn by predicate
    at SQL time (no Spark session needed at oracle build)."""
    m = rerank * k
    r = "list_transform(z.q8, x -> CAST(x AS DOUBLE) * z.s)"
    return f"""
WITH q AS (
  SELECT {vec_col}::DOUBLE[] AS qv FROM {table} WHERE {query_where}
), qz AS (
  SELECT {id_col}, s,
         list_transform(v, x -> CASE WHEN s = 0 THEN 0
                                     ELSE CAST(round(x / s) AS INT)
                                END) AS q8
  FROM (
    SELECT {id_col}, {vec_col}::DOUBLE[] AS v,
           list_max(list_transform({vec_col}::DOUBLE[],
                                   x -> abs(x))) / 127.0 AS s
    FROM {table})
), cand AS (
  SELECT z.{id_col},
         round(list_dot_product({r}, q.qv)
           / (sqrt(list_dot_product({r}, {r}))
              * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine_q
  FROM qz z, q WHERE z.s > 0
  ORDER BY cosine_q DESC, z.{id_col} LIMIT {m}
)
SELECT c.{id_col}, c.cosine_q,
       round(list_dot_product(e.{vec_col}::DOUBLE[], q.qv)
         / (sqrt(list_dot_product(e.{vec_col}::DOUBLE[],
                                  e.{vec_col}::DOUBLE[]))
            * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
FROM cand c JOIN {table} e USING ({id_col}), q
ORDER BY cosine DESC, c.{id_col}
LIMIT {k}"""


# ---- product quantization (PQ) ------------------------------------------
#
# The standard 100 TB embedding-compression/serving pair to scalar int8
# (quantize_int8): split each vector into m subvectors, learn a c-entry
# codebook per SUBSPACE (L2 k-means), store each vector as m small codes
# (dim*4 bytes -> m bytes at c<=256), and answer queries with
# asymmetric-distance computation (ADC): a per-query m x c distance
# table, scored JVM-side as m element_at lookups per row — no float
# vectors are touched at query time.  Jegou/Douze/Schmid, "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011.  The reference
# has no vector ops at all — parity-plus.


def pq_train(df: DataFrame, m: int = 4, c: int = 8, rounds: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id",
             dim: int = 64) -> list[list[tuple[int, list[float]]]]:
    """Learn the m per-subspace codebooks — the SAME L2-Lloyd
    trajectory as m independent :func:`kmeans_fit` runs over the sliced
    subvectors (which is what the DuckDB twins replay), executed FUSED:
    ONE seed collect and ONE job per round cover all m subspaces,
    instead of m threads each paying their own seed TakeOrdered plus a
    per-round aggregate job (m*(rounds+1) jobs -> rounds+1; measured
    ~1s off ann_pq and ~2x that off the two ivfpq lifecycles at sf0.1,
    and at 100 TB it is m-fold fewer corpus scans per round).

    Fusion preserves the trajectory bitwise:
    - seeds: the per-subspace :func:`kmeans_seeds` picks the c rows
      with the smallest (md5-hash, id) — a function of the id column
      only, so every subspace picks the SAME rows; collecting the full
      cast-to-double vectors once and slicing driver-side yields the
      identical per-subspace seed doubles.
    - assignment: per subspace the identical slice + _pdot_multi +
      rounded-d2 argmin expressions (the exact :func:`_assign_l2`
      literal form) ride one projection; past ADC_LITERAL_MAX total
      codewords the whole argmin moves into :func:`_pq_codes_arrow`
      exactly as pq_encode does (bitwise-locked to the literal path in
      tests/test_functions.py).
    - update: ONE posexplode of the full vector with
      (s, codes[s], pos % sub) grouping computes the same per-
      (subspace, cid, d) value multisets the per-subspace exploded
      aggregate grouped, under the same round(avg, 6) absorption
      margin every graded mean here uses."""
    from .sketch import _hash_frac
    sub = dim // m
    if sub * m != dim:
        raise ValueError(f"pq_train: dim {dim} not divisible by m {m}")
    rows = (df.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v"),
                      _hash_frac(id_col).alias("h"))
            .orderBy("h", "id").limit(c).collect())
    seeds = [[float(x) for x in r["v"]] for r in rows]
    books = [[(i, v[s * sub:(s + 1) * sub]) for i, v in enumerate(seeds)]
             for s in range(m)]
    base = df.select(F.col(vec_col).cast("array<double>").alias("_v"))
    for _ in range(rounds):
        v = F.col("_v")
        # assignment ALWAYS via the single-UDF :func:`_pq_codes_arrow`
        # (bitwise-locked to the literal JVM argmin in
        # tests/test_functions.py): the literal form here would put m
        # pandas-UDF columns x (c+1) struct references each into ONE
        # plan, and Catalyst re-hashes a UDF's pickled closure per
        # reference per transform pass — measured 2.5s of pure driver
        # gaps for the m=4, c=8 graded shape (vs 1.1s of actual job
        # time); one UDF node with one reference sidesteps the class
        # (the _pq_codes_arrow rationale, now applied at every m*c)
        codes_col = _pq_codes_arrow(v, books)
        # stage the codes BELOW the explode (the batch_cosine_topk
        # lesson: a UDF column beside posexplode re-evaluates per
        # exploded row)
        staged = base.select(codes_col.alias("_codes"), v)
        sidx = (F.col("_p") / sub).cast("int")
        pdf = (staged
               .select("_codes", F.posexplode("_v").alias("_p", "_x"))
               .select(sidx.alias("_s"),
                       F.element_at("_codes", sidx + 1).alias("_cid"),
                       (F.col("_p") % sub).alias("_d"), "_x")
               .groupBy("_s", "_cid", "_d")
               .agg(F.round(F.avg("_x"), 6).alias("_m"))
               .toPandas())
        newbooks = []
        for s in range(m):
            sd = pdf[pdf["_s"] == s]
            if len(sd):
                pv = sd.pivot(index="_cid", columns="_d", values="_m")
                upd = {int(cid): [float(x) for x in row]
                       for cid, row in zip(pv.index, pv.to_numpy())}
            else:
                upd = {}
            newbooks.append([(cid, upd.get(cid, vec))
                             for cid, vec in books[s]])
        books = newbooks
    return books


def _pq_codes_arrow(v: Column,
                    books: list[list[tuple[int, list[float]]]]
                    ) -> Column:
    """All m subspace codes in ONE Arrow pass with the codebooks in
    the UDF closure — the production-params encode path.  The JVM
    formulation (m greatest-struct argmins over a _pdot_multi column)
    is exact but references the UDF output column m*c times: every
    Catalyst transform pass re-copies those references and re-hashes
    the UDF's pickled closure per copy (TreeNode.hashCode over
    SimplePythonFunction's command bytes — measured ~15 CPU-minutes
    of pure driver plan-hashing at m=16, c=256, nlist=256).  One UDF
    node with one reference sidesteps the whole class.

    Discipline matches the literal path: strict left-to-right
    per-dimension accumulation for every dot, d2 = (sd - 2*dot) + cc
    with cc a driver py_dot constant, HALF_UP rounding to 6 decimals
    (floor(x*1e6 + 0.5)/1e6 — agrees with Spark's BigDecimal HALF_UP
    everywhere except a value within one float ulp of an exact
    0.5e-6 boundary, unobserved on trained codebooks), argmin with
    smallest-cid tie-break."""
    mats = [[[float(x) for x in cv] for _, cv in sorted(book)]
            for book in books]
    cids = [[int(cid) for cid, _ in sorted(book)] for book in books]
    ccs = [[py_dot(cv, cv) for cv in mat] for mat in mats]

    @F.pandas_udf("array<int>")
    def codes_udf(xs: pd.Series) -> pd.Series:
        import numpy as np
        X = np.vstack(xs.to_numpy()).astype(np.float64)
        out = np.empty((X.shape[0], len(mats)), dtype=np.int32)
        off = 0
        for s, mat in enumerate(mats):
            M = np.array(mat, dtype=np.float64)           # (c, sub)
            sub = M.shape[1]
            Xs = X[:, off:off + sub]
            off += sub
            sd = Xs[:, 0] * Xs[:, 0]
            dots = Xs[:, [0]] * M[None, :, 0]
            for d in range(1, sub):
                sd = sd + Xs[:, d] * Xs[:, d]
                dots = dots + Xs[:, [d]] * M[None, :, d]
            d2 = (sd[:, None] - 2.0 * dots) \
                + np.array(ccs[s], dtype=np.float64)[None, :]
            r6 = np.floor(d2 * 1e6 + 0.5) / 1e6
            # argmin first-occurrence == smallest sorted-cid position
            out[:, s] = np.array(cids[s], dtype=np.int32)[
                np.argmin(r6, axis=1)]
        return pd.Series(list(out))

    return codes_udf(v)


def pq_encode(df: DataFrame,
              books: list[list[tuple[int, list[float]]]],
              vec_col: str = "embedding", id_col: str = "vec_id",
              dim: int = 64, keep: list[str] = (),
              max_literals: int = ADC_LITERAL_MAX) -> DataFrame:
    """Encode the corpus: per subspace, argmin rounded squared-L2 over
    the codebook (smallest-cid tie-break) -> (id, codes array<int>).
    m Arrow passes ride one projection; no shuffle.  At c<=256 the
    codes column is the 4x->32x storage cut (64 doubles -> 4 bytes
    here).  Above ``max_literals`` total codewords (m*c — production
    codebooks) the whole encode collapses into ONE Arrow pass
    (:func:`_pq_codes_arrow`) to dodge the plan-hashing blow-up its
    docstring describes."""
    m = len(books)
    sub = dim // m
    v = F.col(vec_col).cast("array<double>")
    if m * len(books[0]) <= max_literals:
        # stage the m dots columns, then ONE parsed SQL expression for
        # all m argmins (the _argmin_l2_sql rationale)
        dns = [
            _pdot_multi(F.slice(v, s * sub + 1, sub),
                        [cv for _, cv in book], with_self=True)
            .alias(f"__dn{s}")
            for s, book in enumerate(books)]
        staged = df.select(F.col(id_col),
                           *[F.col(c) for c in keep], *dns)
        argmins = ", ".join(_argmin_l2_sql(f"__dn{s}", book)
                            for s, book in enumerate(books))
        return staged.select(F.col(id_col),
                             *[F.col(c) for c in keep],
                             F.expr(f"array({argmins})").alias("codes"))
    return df.select(F.col(id_col), *[F.col(c) for c in keep],
                     _pq_codes_arrow(v, books).alias("codes"))


def _adc_score_arrow(codes_col: Column, cent_col: Column,
                     dtables: dict[int, list[list[float]]],
                     m: int) -> Column:
    """ADC score via ONE Arrow pass with the per-bucket m x c distance
    tables in the UDF closure (zero plan literals): score =
    sum_s dtables[bucket][s][code_s], accumulated strictly
    left-to-right over subspaces — bitwise the literal path's
    ``term_0 + term_1 + ...`` chain."""
    keys = sorted(int(b) for b in dtables)
    tbl = [dtables[b] for b in keys]

    @F.pandas_udf("double")
    def adc_udf(codes: pd.Series, cents: pd.Series) -> pd.Series:
        import numpy as np
        C = np.vstack(codes.to_numpy()).astype(np.int64)       # (n, m)
        D = np.array(tbl, dtype=np.float64)               # (B, m, c)
        bi = np.searchsorted(np.array(keys, dtype=np.int64),
                             cents.to_numpy().astype(np.int64))
        rows = D[bi[:, None], np.arange(m)[None, :], C]        # (n, m)
        acc = rows[:, 0]
        for s in range(1, m):
            acc = acc + rows[:, s]
        return pd.Series(acc)

    return adc_udf(codes_col, cent_col)


def pq_topk(df: DataFrame, query_vec: list[float],
            books: list[list[tuple[int, list[float]]]], k: int = 10,
            vec_col: str = "embedding", id_col: str = "vec_id",
            dim: int = 64,
            max_literals: int = ADC_LITERAL_MAX) -> DataFrame:
    """ADC top-k over the PQ-encoded corpus: the driver computes the
    m x c table of subquery-to-codeword squared distances (py_dot —
    bitwise the twin's list_dot_product arithmetic), and each encoded
    row's score is m literal-array lookups summed left-to-right —
    whole-stage codegen, no Arrow, no float vectors at query time.
    Above ``max_literals`` table entries (production-sized codebooks)
    the identical lookups ride one Arrow pass instead — see
    ADC_LITERAL_MAX.  Returns (id, adc) ascending (approximate
    distance), ties on id.

    At 100 TB the encode runs once at ingest (pq_encode) and queries
    scan ONLY the codes column — with c<=256 that is a ~32x smaller
    scan than the float embeddings, and the same codes table serves
    every query."""
    m = len(books)
    sub = dim // m
    enc = pq_encode(df, books, vec_col, id_col, dim)
    # dense cid->distance tables (cids are 0..c-1 from kmeans_seeds)
    tbls = []
    for s, book in enumerate(books):
        qs = [float(x) for x in query_vec[s * sub:(s + 1) * sub]]
        qq = py_dot(qs, qs)
        dt = [0.0] * len(book)
        for cid, cvec in book:
            dt[cid] = (qq - 2.0 * py_dot(qs, cvec)) + py_dot(cvec, cvec)
        tbls.append(dt)
    if m * len(books[0]) <= max_literals:
        # one parsed SQL chain instead of m*c py4j lit calls (the
        # _argmin_l2_sql rationale); identical left-assoc term sum
        term = F.expr(" + ".join(
            "element_at(array(%s), codes[%d] + 1)"
            % (", ".join(f"{x!r}D" for x in tbls[s]), s)
            for s in range(m)))
    else:
        term = _adc_score_arrow(F.col("codes"), F.lit(0), {0: tbls}, m)
    return (enc.select(F.col(id_col), F.round(term, 6).alias("adc"))
               .orderBy("adc", id_col)
               .limit(k))


def _coarse_residuals(df: DataFrame,
                      coarse: list[tuple[int, list[float]]],
                      vec_col: str, id_col: str,
                      max_literals: int = ADC_LITERAL_MAX) -> DataFrame:
    """(id, centroid, resid): assign each vector to its nearest coarse
    centroid (squared L2) and subtract that centroid element-wise —
    the IVF-PQ residual, computed JVM-side (zip_with against the
    literal centroid array selected by bucket id).  Above
    ``max_literals`` embedded doubles (nlist * dim — production
    quantizers) the subtraction rides one Arrow pass with the centroid
    matrix in the UDF closure instead: elementwise IEEE subtract, no
    accumulation, so both paths agree bitwise."""
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("_v"))
    assigned = _assign_l2(base, coarse, "_v")
    if len(coarse) * len(coarse[0][1]) <= max_literals:
        cents_lit = F.array(*[F.array(*[F.lit(float(x)) for x in cv])
                              for _, cv in sorted(coarse)])
        resid = F.zip_with(F.col("_v"),
                           F.element_at(cents_lit, F.col("centroid") + 1),
                           lambda a, b: a - b)
    else:
        keys = sorted(int(cid) for cid, _ in coarse)
        cmat = [[float(x) for x in cv]
                for _, cv in sorted(coarse, key=lambda c: int(c[0]))]

        @F.pandas_udf("array<double>")
        def resid_udf(vs: pd.Series, cents: pd.Series) -> pd.Series:
            import numpy as np
            X = np.vstack(vs.to_numpy()).astype(np.float64)
            Cm = np.array(cmat, dtype=np.float64)
            bi = np.searchsorted(np.array(keys, dtype=np.int64),
                                 cents.to_numpy().astype(np.int64))
            return pd.Series(list(X - Cm[bi]))

        resid = resid_udf(F.col("_v"), F.col("centroid"))
    return assigned.select("id", "centroid", resid.alias("resid"))


def ivfpq_topk(df: DataFrame, query_vec: list[float], k: int = 10,
               nlist: int = 8, m: int = 4, cpq: int = 8,
               rounds: int = 2, nprobe: int = 2,
               vec_col: str = "embedding", id_col: str = "vec_id",
               dim: int = 64,
               max_literals: int = ADC_LITERAL_MAX) -> DataFrame:
    """IVF-PQ — the FAISS-style production ANN index, composed from
    the graded pieces: a coarse L2 k-means quantizer partitions the
    corpus into ``nlist`` buckets, product quantization encodes each
    vector's RESIDUAL (v - coarse centroid; residuals are far more
    compressible than raw vectors), and a query probes ``nprobe``
    buckets scoring rows by ADC over a per-bucket distance table built
    from the query's own residual against that bucket.

    Plan shape: train = (rounds coarse + m*rounds PQ) bounded
    driver-loop jobs; encode = one narrow pass (assignment + residual
    + m code argmins, all JVM/Arrow batched); query = bucket filter
    (on a materialized index this is ivf_build's directory pruning) +
    m table lookups per surviving row via a when()-chain over the
    nprobe probed buckets + TakeOrdered.  At 100 TB the scan is the
    codes column of the probed buckets only.

    Returns (id, adc) ascending approximate distance, ties on id."""
    coarse, books, res = _ivfpq_fit_res(df, nlist, m, cpq, rounds,
                                        vec_col, id_col, dim)
    enc = pq_encode(res, books, vec_col="resid", id_col="id",
                    dim=dim, keep=["centroid"])
    probes = _ivfpq_probes(query_vec, coarse, nprobe)
    return _ivfpq_adc(enc, query_vec, coarse, books, probes,
                      id_col, dim, k, max_literals)


def _ivfpq_fit_res(df, nlist, m, cpq, rounds, vec_col, id_col, dim):
    """Train coarse quantizer + residual PQ codebooks; also returns
    the checkpointed residual table so in-plan callers (ivfpq_topk)
    encode without recomputing the coarse assignment."""
    sub = dim // m
    if sub * m != dim:
        raise ValueError(f"ivfpq: dim {dim} not divisible by m {m}")
    coarse = kmeans_fit(df, c=nlist, rounds=rounds, vec_col=vec_col,
                        id_col=id_col, dim=dim, metric="l2")
    # materialize the residual table ONCE: without the barrier every
    # PQ training round of every subspace re-runs the coarse
    # assignment Arrow pass + subtraction (m * rounds corpus passes)
    res = _coarse_residuals(df, coarse, vec_col, id_col) \
        .localCheckpoint(eager=False)
    books = pq_train(res, m=m, c=cpq, rounds=rounds, vec_col="resid",
                     id_col="id", dim=dim)
    return coarse, books, res


def ivfpq_fit(df: DataFrame, nlist: int = 8, m: int = 4, cpq: int = 8,
              rounds: int = 2, vec_col: str = "embedding",
              id_col: str = "vec_id", dim: int = 64
              ) -> tuple[list[tuple[int, list[float]]],
                         list[list[tuple[int, list[float]]]]]:
    """Train the IVF-PQ index parameters once: the coarse L2 k-means
    quantizer plus the m residual-PQ codebooks.  Returns
    ``(coarse, books)`` — the driver-held index metadata (nlist*dim +
    m*cpq*dim/m floats) that :func:`ivfpq_build` / :func:`ivfpq_query`
    consume.  Training cost: (rounds coarse + m*rounds PQ) bounded
    jobs over ONE checkpointed residual pass."""
    coarse, books, _ = _ivfpq_fit_res(df, nlist, m, cpq, rounds,
                                      vec_col, id_col, dim)
    return coarse, books


def ivfpq_encode(df: DataFrame, coarse: list[tuple[int, list[float]]],
                 books: list[list[tuple[int, list[float]]]],
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 dim: int = 64) -> DataFrame:
    """(id, centroid, codes): assign + residual + m code argmins in
    one narrow pass — the ingest-time transform of the IVF-PQ
    lifecycle."""
    res = _coarse_residuals(df, coarse, vec_col, id_col)
    return pq_encode(res, books, vec_col="resid", id_col="id",
                     dim=dim, keep=["centroid"])


def ivfpq_build(df: DataFrame, coarse: list[tuple[int, list[float]]],
                books: list[list[tuple[int, list[float]]]],
                path: str, vec_col: str = "embedding",
                id_col: str = "vec_id", dim: int = 64) -> None:
    """Materialize the IVF-PQ serving index: encode the corpus
    (:func:`ivfpq_encode`) and write (id, codes) as parquet
    PARTITIONED BY the coarse centroid.

    This is the 100 TB serving shape the FAISS IVFADC index maps to on
    Spark: each coarse bucket is its own directory, so a query's
    nprobe filter is partition PRUNING (the scan never opens
    non-probed buckets' files — plan-asserted in
    tests/test_functions.py), and the pruned scan reads ONLY the codes
    column (m bytes/vector at cpq<=256, a ~32x cut vs the floats).
    Build cost: one narrow encode pass + one shuffle-free write;
    queries pay pruned-scan + ADC + top-k with NO training and NO
    encoding (ivfpq_topk, by contrast, retrains per call — the demo
    shape)."""
    (ivfpq_encode(df, coarse, books, vec_col, id_col, dim)
     .select("id", "codes", "centroid")
     .write.mode("overwrite").partitionBy("centroid").parquet(path))


def ivfpq_query(spark, path: str, query_vec: list[float],
                coarse: list[tuple[int, list[float]]],
                books: list[list[tuple[int, list[float]]]],
                k: int = 10, nprobe: int = 2, id_col: str = "vec_id",
                dim: int = 64,
                max_literals: int = ADC_LITERAL_MAX) -> DataFrame:
    """Top-k over a materialized :func:`ivfpq_build` index: rank the
    coarse buckets by the query's squared L2 (driver arithmetic,
    py_dot discipline), scan ONLY the nprobe probed partitions
    (directory pruning), score each row by per-bucket ADC over its m
    codes, TakeOrdered(k).  No training, no encoding, no float
    vectors at query time."""
    probes = _ivfpq_probes(query_vec, coarse, nprobe)
    enc = spark.read.parquet(path)
    return _ivfpq_adc(enc, query_vec, coarse, books, probes,
                      id_col, dim, k, max_literals)


def _ivfpq_probes(query_vec, coarse, nprobe: int) -> list[int]:
    """Probe ranking: rounded squared L2 of the query to each coarse
    centroid, ascending, smallest-cid ties — mirrored by the twin."""
    qd = {cid: round((py_dot(query_vec, query_vec)
                      - 2.0 * py_dot(query_vec, cv))
                     + py_dot(cv, cv), 6)
          for cid, cv in coarse}
    return [cid for cid, _ in sorted(coarse,
                                     key=lambda c: (qd[c[0]], c[0]))
            ][:nprobe]


def _ivfpq_adc(enc: DataFrame, query_vec: list[float], coarse, books,
               probes: list[int], id_col: str, dim: int, k: int,
               max_literals: int = ADC_LITERAL_MAX) -> DataFrame:
    """Shared IVF-PQ scoring stage over an encoded (id, centroid,
    codes) table: per probed bucket, the m x cpq distance tables of
    the query RESIDUAL subvectors against the codebooks (driver
    floats, py_dot discipline); each surviving row's score is m table
    lookups summed left-to-right.  Literal when()-chain under
    ``max_literals`` entries (whole-stage codegen, zero Exchange —
    plan-asserted), one Arrow pass above it (see ADC_LITERAL_MAX)."""
    m = len(books)
    sub = dim // m
    cvecs = dict(coarse)
    dtables: dict[int, list[list[float]]] = {}
    for b in probes:
        qr = [float(q) - float(c) for q, c in zip(query_vec, cvecs[b])]
        tbls = []
        for s, book in enumerate(books):
            qs = qr[s * sub:(s + 1) * sub]
            qq = py_dot(qs, qs)
            dt = [0.0] * len(book)
            for cid, cw in book:
                dt[cid] = (qq - 2.0 * py_dot(qs, cw)) + py_dot(cw, cw)
            tbls.append(dt)
        dtables[int(b)] = tbls
    if len(probes) * m * len(books[0]) <= max_literals:
        # one parsed SQL chain of CASE-per-bucket table lookups (the
        # _argmin_l2_sql rationale); identical when/otherwise tree and
        # left-assoc subspace sum
        def tbl(b, s):
            return ("element_at(array(%s), codes[%d] + 1)"
                    % (", ".join(f"{x!r}D"
                                 for x in dtables[int(b)][s]), s))

        score = F.expr(" + ".join(
            "CASE %s ELSE 0.0D END"
            % " ".join(f"WHEN (centroid = {int(b)}) THEN {tbl(b, s)}"
                       for b in probes)
            for s in range(m)))
    else:
        score = _adc_score_arrow(F.col("codes"), F.col("centroid"),
                                 dtables, m)
    return (enc.filter(F.col("centroid").isin([int(b) for b in probes]))
               .select(F.col("id").alias(id_col),
                       F.round(score, 6).alias("adc"))
               .orderBy("adc", id_col)
               .limit(k))


def _argmax_centroid(dots: Column, nrm: Column,
                     centroids: list[tuple[int, list[float]]]) -> Column:
    """greatest-struct argmax over per-centroid rounded cosines.
    ``dots`` is the array<double> of raw dot products (index-aligned with
    ``centroids``); ties on cosine pick the smallest centroid id."""
    structs = []
    for i, (cid, cvec) in enumerate(centroids):
        ccos = F.round(dots[i] / (nrm * F.lit(py_norm(cvec))), 6)
        structs.append(F.struct(ccos.alias("c"), F.lit(-cid).alias("n")))
    best = structs[0] if len(structs) == 1 else F.greatest(*structs)
    return (-best.getField("n")).cast("int")


def _cos_assign_arrow(v: Column,
                      centroids: list[tuple[int, list[float]]]
                      ) -> Column:
    """Cosine centroid assignment in ONE Arrow pass with the centroid
    matrix in the UDF closure — the production-nlist path (same
    plan-hashing rationale as :func:`_pq_codes_arrow`).  Discipline
    matches the JVM form: strict left-to-right dots/self-dot, cosine =
    dot / (sqrt(self) * py_norm(c)) with the centroid norm a driver
    constant, HALF_UP rounding to 6 decimals, argmax with smallest-cid
    tie-break."""
    cids = [int(cid) for cid, _ in centroids]
    mats = [[float(x) for x in cv] for _, cv in centroids]
    norms = [py_norm(cv) for cv in mats]

    @F.pandas_udf("int")
    def assign_udf(xs: pd.Series) -> pd.Series:
        import numpy as np
        X = np.vstack(xs.to_numpy()).astype(np.float64)
        M = np.array(mats, dtype=np.float64)               # (C, dim)
        nv = np.array(norms, dtype=np.float64)
        carr = np.array(cids, dtype=np.int64)
        n, ndim = X.shape
        C = M.shape[0]
        IMAX = np.iinfo(np.int64).max

        def half_up6(x):
            # HALF_UP = half AWAY FROM ZERO (Java BigDecimal / DuckDB
            # round): cosines can be negative, where floor(p+0.5)
            # would round toward +inf instead (verified against
            # DuckDB round(x,6) on 20k boundary values)
            p6 = x * 1e6
            return np.where(p6 >= 0.0, np.floor(p6 + 0.5),
                            np.ceil(p6 - 0.5)) / 1e6

        # exact strict left-to-right self-dot per row (the contract's
        # norm — NOT einsum/(X*X).sum, which reorder the accumulation)
        sd = X[:, 0] * X[:, 0]
        for d in range(1, ndim):
            sd = sd + X[:, d] * X[:, d]
        nx = np.sqrt(sd)

        # TWO-PHASE exact argmax.  Phase 1 screens with a BLAS matmul
        # (reordered accumulation — NOT the contract values): any
        # centroid whose exact rounded cosine ties the row max has an
        # exact cosine within 1e-6 of the exact max (the rounding
        # grid), and |blas - strict| <= dim*eps*||x||*||c|| / norms
        # < 1e-14 on unit-scale data, so every true winner sits within
        # 1e-6 + 2e-14 of the approximate max — the 2.5e-6 margin
        # over-covers it.  Phase 2 recomputes the contract's strict
        # left-to-right dot ONLY for the screened candidates (~1-3 per
        # row) and does the rounded argmax / smallest-cid tie-break on
        # those exact values, so the result is bitwise the dense
        # strict kernel's (locked by
        # test_cos_assign_arrow_path_matches_literal) at ~1/dim the
        # memory traffic — measured 12.7x on the sf1 SemDeDup
        # assignment kernel (C=2500).
        MARGIN = 2.5e-6
        out = np.full(n, IMAX, dtype=np.int64)
        rows_l, cols_l = [], []
        blk = max(256, (32 << 20) // max(C * 8, 1))
        denom_nx = nx[:, None]
        for s0 in range(0, n, blk):
            xb = X[s0:s0 + blk]
            with np.errstate(divide="ignore", invalid="ignore"):
                cosA = (xb @ M.T) / (denom_nx[s0:s0 + blk] * nv[None, :])
                mx = np.nanmax(cosA, axis=1) if C else None
                cand = cosA >= (mx - MARGIN)[:, None]
            r, c = np.nonzero(cand)
            rows_l.append(r + s0)
            cols_l.append(c)
        rows = np.concatenate(rows_l) if rows_l else np.empty(0, np.int64)
        cols = np.concatenate(cols_l) if cols_l else np.empty(0, np.int64)

        # phase 2: strict dots for candidate (row, centroid) pairs,
        # chunked to bound the (P, dim) gathers
        rmax = np.full(n, -np.inf)
        r6_all = np.empty(rows.shape[0])
        CH = 1 << 18
        for p0 in range(0, rows.shape[0], CH):
            rr = rows[p0:p0 + CH]
            cc = cols[p0:p0 + CH]
            Xc = X[rr]
            Mc = M[cc]
            acc = Xc[:, 0] * Mc[:, 0]
            for d in range(1, ndim):
                acc = acc + Xc[:, d] * Mc[:, d]
            with np.errstate(divide="ignore", invalid="ignore"):
                r6 = half_up6(acc / (nx[rr] * nv[cc]))
            r6_all[p0:p0 + CH] = r6
            np.maximum.at(rmax, rr, r6)
        if rows.shape[0]:
            is_best = r6_all == rmax[rows]
            np.minimum.at(out, rows[is_best], carr[cols[is_best]])

        # rows the screen produced no candidate for (NaN cosines from
        # zero norms) get the dense strict kernel — bitwise the old
        # path, and it keeps the no-candidate case impossible by
        # construction everywhere else
        miss = np.nonzero(out == IMAX)[0]
        for i in miss:
            x = X[i]
            acc = x[0] * M[:, 0]
            for d in range(1, ndim):
                acc = acc + x[d] * M[:, d]
            with np.errstate(divide="ignore", invalid="ignore"):
                r6 = half_up6(acc / (nx[i] * nv))
            ib = r6 == r6.max()
            out[i] = np.where(ib, carr, IMAX).min()
        return pd.Series(out.astype("int32"))

    return assign_udf(v.cast("array<double>"))


def assign_centroids(df: DataFrame, centroids: list[tuple[int, list[float]]],
                     vec_col: str = "embedding",
                     max_literals: int | None = None) -> DataFrame:
    """Assign each vector to the nearest centroid (max rounded cosine,
    deterministic tie-break on centroid id).  All input columns are
    preserved; one ``centroid`` int column is appended.

    The C dot products AND the self-dot for the norm ride in ONE Arrow
    pass (_pdot_multi with_self — a separate vec_norm doubled the
    ArrowEvalPython nodes per assignment); the argmax is a linear
    greatest() over (cos, -cid) structs — an earlier
    ``when(cos > best).otherwise(best)`` chain duplicated the best-tree
    2^C times and overflowed janino's 64 KB method limit.  Above
    ``max_literals`` embedded floats (C*dim; defaults to
    ADC_LITERAL_MAX) the argmax moves INTO the Arrow pass
    (:func:`_cos_assign_arrow`) — C struct references to the UDF
    column pay the Catalyst plan-hashing blow-up _pq_codes_arrow's
    docstring describes.  Every graded trajectory (kmeans twins at
    c=8) stays on the exact literal path."""
    if max_literals is None:
        max_literals = ADC_LITERAL_MAX
    v = F.col(vec_col)
    if len(centroids) * len(centroids[0][1]) <= max_literals:
        dn = _pdot_multi(v, [cv for _, cv in centroids], with_self=True)
        # staged alias + one parsed SQL argmax (the _argmin_l2_sql
        # rationale) — identical expression tree, far cheaper build
        staged = df.select("*", dn.alias("__dn"))
        return (staged.withColumn(
                    "centroid",
                    F.expr(_argmax_cos_sql("__dn", centroids)))
                .drop("__dn"))
    return df.withColumn("centroid", _cos_assign_arrow(v, centroids))


def ivf_topk(df: DataFrame, query_vec: list[float],
             centroids: list[tuple[int, list[float]]], k: int = 10,
             nprobe: int = 2, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k probing only the nprobe nearest centroid buckets
    (in one pass over the raw table; see ivf_build/ivf_query for the
    materialized partition-pruned variant)."""
    probe_ids = _rank_probes(query_vec, centroids, nprobe)
    qn = py_norm(query_vec)
    v = F.col(vec_col)
    # one Arrow pass computes the C centroid dots AND the query dot
    dots = _pdot_multi(v, [cv for _, cv in centroids] + [query_vec])
    nrm = vec_norm(v)
    staged = df.select(
        F.col(id_col),
        _argmax_centroid(dots, nrm, centroids).alias("centroid"),
        F.round(dots[len(centroids)] / (nrm * F.lit(qn)), 6).alias("cosine"))
    return (staged.filter(F.col("centroid").isin(probe_ids))
            .select(F.col(id_col), "cosine")
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


def _rank_probes(query_vec, centroids, nprobe: int) -> list[int]:
    def py_cos(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc / (py_norm(a) * py_norm(b))

    ranked = sorted(centroids,
                    key=lambda c: (-round(py_cos(query_vec, c[1]), 6), c[0]))
    return [cid for cid, _ in ranked[:nprobe]]


def ivf_build(df: DataFrame, centroids: list[tuple[int, list[float]]],
              path: str, vec_col: str = "embedding",
              id_col: str = "vec_id") -> None:
    """Materialize the IVF index: centroid assignment + parquet write
    PARTITIONED BY the centroid id.

    This is the 100 TB shape ivf_topk's docstring promises: each bucket
    becomes its own directory, so a query's nprobe filter is partition
    PRUNING — the scan never opens non-probed buckets' files (asserted
    on the plan in tests/test_functions.py).  Build cost is one narrow
    assignment pass + one shuffle-free write; re-queries pay only
    pruned-scan + top-k."""
    assigned = assign_centroids(df, centroids, vec_col)
    (assigned.select(id_col, vec_col, "centroid")
     .write.mode("overwrite").partitionBy("centroid").parquet(path))


def ivf_query(spark, path: str, query_vec: list[float],
              centroids: list[tuple[int, list[float]]], k: int = 10,
              nprobe: int = 2, vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Top-k over a materialized ivf_build index, scanning only the
    ``nprobe`` buckets nearest the query (directory-level pruning)."""
    probe_ids = _rank_probes(query_vec, centroids, nprobe)
    idx = spark.read.parquet(path).filter(F.col("centroid").isin(probe_ids))
    cos = _single_query_cos(vec_col, query_vec)
    return (idx.select(F.col(id_col), cos.alias("cosine"))
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


def ivf_built_sql(cent_sql: str, k: int = 10, nprobe: int = 2,
                  table: str = "embeddings", vec_col: str = "embedding",
                  id_col: str = "vec_id",
                  query_where: str = "vec_id = 0") -> str:
    """DuckDB twin of the FULL IVF lifecycle (kmeans_fit ->
    :func:`ivf_build` -> :func:`ivf_query`): centroids come from the
    replayed training trajectory (``cent_sql``, e.g.
    :func:`kmeans_cent_sql`), probe ranking / corpus assignment /
    final cosine use the identical rounding and smallest-cid
    tie-breaks.  The materialized partitioned-parquet index is
    Spark-side plumbing the oracle need not replicate: the
    partition-pruned scan returns exactly the probed buckets' rows,
    which ``assigned ... AND cid IN probe`` reconstructs."""
    return f"""
WITH cent AS ({cent_sql}),
q AS (SELECT {vec_col}::DOUBLE[] AS qv FROM {table}
      WHERE {query_where}),
probe AS (
  SELECT cid FROM cent, q
  ORDER BY round(list_dot_product(cvec, q.qv)
    / (sqrt(list_dot_product(cvec, cvec))
       * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC, cid
  LIMIT {nprobe}
), scored AS (
  SELECT e.{id_col}, e.{vec_col}, c.cid,
         round(list_dot_product(e.{vec_col}::DOUBLE[], c.cvec)
           / (sqrt(list_dot_product(e.{vec_col}::DOUBLE[],
                                    e.{vec_col}::DOUBLE[]))
              * sqrt(list_dot_product(c.cvec, c.cvec))), 6) AS ccos
  FROM {table} e CROSS JOIN cent c
), assigned AS (
  SELECT {id_col}, {vec_col} FROM (
    SELECT *, row_number() OVER (
      PARTITION BY {id_col} ORDER BY ccos DESC, cid) AS rn
    FROM scored) WHERE rn = 1 AND cid IN (SELECT cid FROM probe)
)
SELECT a.{id_col},
       round(list_dot_product(a.{vec_col}::DOUBLE[], q.qv)
         / (sqrt(list_dot_product(a.{vec_col}::DOUBLE[],
                                  a.{vec_col}::DOUBLE[]))
            * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
FROM assigned a, q
ORDER BY cosine DESC, a.{id_col}
LIMIT {k}"""


def ivf_topk_sql(query_vec, centroids, k=10, nprobe=2, table="embeddings",
                 vec_col="embedding", id_col="vec_id"):
    probe_ids = _rank_probes(query_vec, centroids, nprobe)
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
