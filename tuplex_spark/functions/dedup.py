"""Deduplication for training-data pipelines.

Five strategies, all shuffle-aware and expressed in built-in Column
functions (portable to the DuckDB oracle via the *_sql twins):

- exact:        hash-groupBy on normalized text; keep min id.
- minhash LSH:  word-shingles -> H minhashes -> B bands -> intra-bucket
                candidate pairs.  The classic near-dup pipeline
                (Broder '97 / Leskovec MMDS ch.3).  Hash = md5 hex
                (lexicographic min), identical strings in any engine.
- simhash:      16-bit Charikar simhash from per-token md5 bits; pairs
                within Hamming distance k.
- ngram jaccard: exact Jaccard on distinct word n-grams for candidate
                pairs sharing >=1 shingle (inverted-index join, no O(n^2)).
- embedding:    cosine >= threshold pairs over an embedding column.

Scale notes (100 TB): every strategy avoids a cross join — candidates are
intra-bucket combinations emitted by ONE aggregation over the bucket key
(band hash / shingle / SRP signature), so the heavy upstream (tokenize /
hash / signature) is scanned and shuffled exactly once (_bucket_pairs;
the earlier window-cap + equality self-join planned the upstream twice).
Skewed buckets (stopword shingles, exact-dup clusters) are capped via
``max_bucket`` to bound the quadratic pair blow-up per bucket.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import tokens


def normalize_text(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per normalized-text group.

    Groups on md5 of the normalized text, not the text itself — at scale
    the shuffle then moves 32-byte digests instead of documents."""
    key = F.md5(normalize_text(text_col))
    return (df.select(F.col(id_col), key.alias("__k"))
              .groupBy("__k")
              .agg(F.min(id_col).alias("keep_id"),
                   F.count(F.lit(1)).alias("n_copies"))
              .select("keep_id", "n_copies"))


def word_shingles_from(toks, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a MATERIALIZED token-array
    column (a bound attribute, not an expression).

    This matters enormously: higher-order functions are interpreted and
    do no common-subexpression elimination, so if ``toks`` is the split()
    expression itself, the regex split re-runs for EVERY element_at
    reference — O(n·k) splits per row.  Callers must stage the token
    array in its own projection first (Catalyst keeps the boundary —
    CollapseProject refuses to duplicate non-cheap expressions).
    Measured at sf0.1: staged 0.6s vs inlined 8-9s for the shingle
    explode.

    Guarded for short docs: Spark's sequence(1, 0) DESCENDS instead of
    returning [], so the when() keeps semantics aligned with DuckDB's
    empty generate_series."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))

    def shingle(i):
        return F.concat_ws(" ", *[F.element_at(toks, i + k)
                                  for k in range(n)])

    return F.when(F.size(toks) < n, F.array().cast("array<string>")) \
        .otherwise(F.array_distinct(F.transform(idx, shingle)))


def word_shingles(text_col: str, n: int = 3) -> Column:
    """Shingles straight from a text column.  Prefer the staged
    ``_staged_shingles`` dataframe helper in pipelines — inlining this
    into further array transforms recomputes the tokenization per
    element (see word_shingles_from)."""
    return word_shingles_from(tokens(text_col), n)


def _staged_shingles(df: DataFrame, text_col: str, id_col: str,
                     n: int) -> DataFrame:
    """(id, sh) with the token array materialized in its own projection
    so the split() runs once per row."""
    return (df.select(F.col(id_col).alias("id"),
                      tokens(text_col).alias("__toks"))
              .filter(F.size("__toks") >= n)
              .select("id",
                      word_shingles_from(F.col("__toks"), n).alias("sh")))


_MINHASH_P = 1_000_000_007  # universal-hash modulus (fits 64-bit products)


def _minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for h_i(x) = (a_i*x + b_i) mod P.
    a_i < 1e5 keeps a_i * (32-bit x) < 2^49 — no 64-bit overflow in any
    engine."""
    return [(2 * i + 3, 7919 * i + 1) for i in range(num_hashes)]


def _bucket_pairs(buckets: DataFrame, max_bucket: int,
                  payload: list[str] | None = None) -> DataFrame:
    """Intra-bucket candidate pairs from a (band, h, id[, payload...])
    relation in ONE aggregation pass: collect each bucket's entries,
    cap deterministically by id order (same semantics as the previous
    row_number cut), and emit the C(k,2) combinations with id_a < id_b.

    Replaces the cap + equality self-join formulation, which evaluated
    the ENTIRE upstream pipeline twice — Catalyst planned the two join
    sides as independent subtrees (no ReuseExchange fired: 2 parquet
    scans / 4 explodes / 6 aggregates in the physical plan) and
    shuffled the bucket table three times.  This shape scans once,
    shuffles once on (band, h), and the per-bucket pair fan-out is
    bounded by max_bucket^2 (skew guard).

    The cap is STRUCTURAL: a row_number window (spillable sort-based
    cut, reusing the same hashpartitioning(band, h) exchange the
    aggregate needs — one shuffle total, verified in tests/test_plans)
    discards bucket members beyond max_bucket BEFORE collect_list, so
    a degenerate bucket (millions of exact duplicates sharing a band
    hash when users skip dedup_exact) can never build an unbounded
    aggregation buffer on one executor.  A slice-after-collect cap
    materialized the whole bucket first — a multi-GB single-buffer
    risk at 100 TB.
    Output columns: a.<field>, b.<field> for id + each payload column.

    NOTE this stage's output EXPLODES quadratically (C(k,2) pairs per
    bucket) relative to its skinny (id, band, h) input, so AQE's
    size-based partition coalescing must not collapse the exchange —
    measured: a 33 s single-task pair-generation stage inside an
    otherwise 7 s sf1 run, the dominant run-to-run variance of every
    LSH query.  The guard is build_session's
    coalescePartitions.minPartitionSize floor (parallelism-first
    sizing keeps ~defaultParallelism reducers once the bucket table
    exceeds a couple of MB) rather than an explicit repartition-by-num
    here: a pinned repartition would satisfy the window's clustering
    outright and cost the map-side Partial WindowGroupLimit prune —
    the guard that keeps a degenerate bucket from shipping through
    the shuffle uncapped."""
    payload = payload or []
    entry = F.struct(F.col("id"), *[F.col(c) for c in payload])
    w = Window.partitionBy("band", "h").orderBy("id")
    capped = (buckets
              .withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= max_bucket)
              .drop("__rn"))
    g = (capped.groupBy("band", "h")
         .agg(F.sort_array(F.collect_list(entry)).alias("es")))
    combos = F.flatten(F.transform(
        F.col("es"),
        lambda x, i: F.transform(
            F.slice(F.col("es"), i + 2, F.size(F.col("es"))),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))
    return (g.filter(F.size("es") >= 2)
             .select(F.explode(combos).alias("pr"))
             .select(F.col("pr.a").alias("a"), F.col("pr.b").alias("b")))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 12,
                      bands: int = 4, shingle_n: int = 3,
                      max_bucket: int = 50) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing >=1 LSH band.

    Signature computation is explode -> one md5 per shingle -> H cheap
    universal hashes -> groupBy(id).agg(H mins).  Everything after the
    split is whole-stage-codegen'd and the shuffle carries one row per
    doc (map-side partial min).  The earlier formulation (H interpreted
    ``transform`` calls, each computing md5 per element) evaluated H
    md5s per shingle in Catalyst's interpreted higher-order-function
    path — ~10x slower at sf0.1 and worse at scale.
    """
    buckets = _minhash_buckets(df, text_col, id_col, num_hashes, bands,
                               shingle_n)
    return (_bucket_pairs(buckets, max_bucket)
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .distinct())


def _minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                        num_hashes: int, shingle_n: int) -> DataFrame:
    """(id, m0..m{H-1}) minhash signature table (see minhash_lsh_pairs
    for the plan-shape rationale)."""
    ex = _staged_shingles(df, text_col, id_col, shingle_n) \
        .select("id", F.explode("sh").alias("s"))
    # one md5 per distinct shingle occurrence -> 32-bit int
    h = F.conv(F.substring(F.md5(F.col("s")), 1, 8), 16, 10).cast("long")
    ex = ex.select("id", h.alias("h"))
    return ex.groupBy("id").agg(*[
        F.min((F.col("h") * a + b) % _MINHASH_P).alias(f"m{i}")
        for i, (a, b) in enumerate(_minhash_coeffs(num_hashes))])


def _minhash_buckets(df: DataFrame, text_col: str, id_col: str,
                     num_hashes: int, bands: int, shingle_n: int,
                     payload: list[str] | None = None) -> DataFrame:
    """(id, band, h [, payload...]) LSH bucket relation from the
    signature table; ``payload`` columns are built from the m_i columns
    before banding (e.g. the packed signature array)."""
    rows_per_band = num_hashes // bands
    sig_df = _minhash_signatures(df, text_col, id_col, num_hashes,
                                 shingle_n)
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"m{i}").cast("string")
                                 for i in range(b * rows_per_band,
                                                (b + 1) * rows_per_band)]))
        .alias(f"band{b}")
        for b in range(bands)
    ]
    extra = []
    if payload and "sig" in payload:
        extra = [F.array(*[F.col(f"m{i}")
                           for i in range(num_hashes)]).alias("sig")]
    base = sig_df.select("id", *band_cols, *extra)
    keep = ["id"] + (payload or [])
    return base.select(
        *keep,
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("h"))
            for b in range(bands)])).alias("bk")
    ).select(*keep, F.col("bk.band").alias("band"),
             F.col("bk.h").alias("h"))


def minhash_similarity(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 12,
                       bands: int = 4, shingle_n: int = 3,
                       max_bucket: int = 50) -> DataFrame:
    """LSH candidate pairs WITH their estimated Jaccard — the fraction
    of agreeing minhash components (E[matches/H] = J(A,B)) — so dup
    strength is scored without ever materializing shingle sets per
    pair.  This is how a 100 TB pipeline ranks near-dups cheaply: the
    exact inverted-index Jaccard (ngram_jaccard_pairs) costs a
    corpus-wide explode+join, while this adds ONE array column to the
    bucket shuffle (H longs per doc, bounded by max_bucket per bucket)
    and a per-pair zip_with count over H elements.

    Output: (id_a, id_b, est_jaccard) per candidate pair (id_a < id_b,
    >=1 shared band)."""
    buckets = _minhash_buckets(df, text_col, id_col, num_hashes, bands,
                               shingle_n, payload=["sig"])
    pairs = _bucket_pairs(buckets, max_bucket, payload=["sig"])
    matches = F.expr(
        "size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), t -> t))")
    est = F.round(matches / F.lit(float(num_hashes)), 6)
    return (pairs.select(F.col("a.id").alias("id_a"),
                         F.col("b.id").alias("id_b"),
                         est.alias("est_jaccard"))
            .distinct())


def decontaminate(df: DataFrame, ref: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  ref_text_col: str | None = None,
                  n: int = 8, min_overlap: int = 1,
                  mode: str = "drop") -> DataFrame:
    """Benchmark decontamination: drop (or flag) corpus documents that
    share >= ``min_overlap`` distinct word ``n``-grams with ANY
    reference document — the standard test-set-overlap pass for
    pretraining corpora (n=8..13 word-gram matching).

    Scale design (100 TB corpus): benchmark suites are tiny relative to
    the corpus, so the reference's DISTINCT shingle set broadcasts and
    the overlap test is a map-side broadcast hash join on the corpus'
    shingle explode; the only corpus shuffle is the per-doc overlap
    count (partial agg on doc id).  ``mode="drop"`` finishes with an
    anti join of the contaminated id list (AQE broadcasts it when
    small); ``mode="flag"`` returns every row with an ``n_overlap``
    column instead of filtering."""
    if mode not in ("drop", "flag"):
        raise ValueError(f"decontaminate mode={mode!r}")
    ref_text = ref_text_col or text_col
    rsh = (ref.select(tokens(ref_text).alias("__toks"))
           .filter(F.size("__toks") >= n)
           .select(F.explode(
               word_shingles_from(F.col("__toks"), n)).alias("s"))
           .distinct())
    dsh = _staged_shingles(df, text_col, id_col, n) \
        .select("id", F.explode("sh").alias("s"))
    # per-doc shingles are already distinct -> count == distinct overlap
    hits = (dsh.join(F.broadcast(rsh), "s")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_overlap"))
            .filter(F.col("n_overlap") >= min_overlap)
            .select(F.col("id").alias("__hit_id"), "n_overlap"))
    if mode == "flag":
        out = df.join(hits, df[id_col] == F.col("__hit_id"), "left")
        return out.select(
            *df.columns,
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap)
            .alias("contaminated"))
    return df.join(hits, df[id_col] == F.col("__hit_id"), "left_anti")


# 128Ki 64-bit words = 1 MiB per dense chunk blob
_BLOOM_CHUNK_WORDS = 1 << 17


def _bloom_word_chunks(rsh: DataFrame, positions, m_bits: int,
                       chunk_words: int = _BLOOM_CHUNK_WORDS) -> DataFrame:
    """(chunk_id, blob) DataFrame for the Bloom bitset of the distinct
    shingle column ``s`` of ``rsh``: explode the k bit positions ->
    bit_or per 64-bit word (partial-aggregated map-side) -> pack each
    run of ``chunk_words`` words into one dense little-endian blob via
    applyInPandas.  Row count is ceil(m_bits/64/chunk_words) — the
    bounded quantity a driver collect is allowed to depend on."""
    import numpy as np
    import pandas as pd
    # chunk id below is shiftright(w, log2(chunk_words)) — only equal to
    # w // chunk_words for powers of two; anything else silently
    # misassigns words into the wrong blob and corrupts the bitset
    if chunk_words <= 0 or chunk_words & (chunk_words - 1):
        raise ValueError(
            f"chunk_words must be a power of two, got {chunk_words}")
    n_words = (m_bits + 63) // 64

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        c = int(pdf["c"].iloc[0])
        lo = c * chunk_words
        size = min(chunk_words, n_words - lo)
        arr = np.zeros(size, dtype=np.int64)
        arr[pdf["w"].to_numpy() - lo] = pdf["bits"].to_numpy()
        return pd.DataFrame({"c": [c], "blob": [arr.tobytes()]})

    words = (rsh.select(F.explode(F.array(*positions(F.col("s"))))
                        .alias("p"))
             .select((F.col("p") / 64).cast("long").alias("w"),
                     F.expr("shiftleft(1L, cast(p % 64 as int))")
                     .alias("m"))
             .groupBy("w").agg(F.expr("bit_or(m)").alias("bits")))
    return (words
            .withColumn("c", F.expr(f"shiftright(w, "
                                    f"{chunk_words.bit_length() - 1})"))
            .groupBy("c").applyInPandas(build, "c long, blob binary"))


def _bloom_bitset(rsh: DataFrame, positions, m_bits: int):
    """Assemble the full bitset on the driver from the bounded chunk
    rows — one numpy buffer, never O(words) Row objects."""
    import numpy as np
    n_words = (m_bits + 63) // 64
    arr = np.zeros(n_words, dtype=np.int64)
    chunk_words = _BLOOM_CHUNK_WORDS
    for r in _bloom_word_chunks(rsh, positions, m_bits).collect():
        lo = int(r["c"]) * chunk_words
        blob = np.frombuffer(r["blob"], dtype=np.int64)
        arr[lo:lo + len(blob)] = blob
    return arr


def decontaminate_bloom(df: DataFrame, ref: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        ref_text_col: str | None = None,
                        n: int = 8, min_overlap: int = 1,
                        mode: str = "drop",
                        bits_per_key: int = 12, num_hashes: int = 4,
                        n_ref: int | None = None) -> DataFrame:
    """Decontamination via a Bloom prefilter — the 100 TB shape when the
    reference set is too large to broadcast as shingle STRINGS.

    :func:`decontaminate` broadcasts the distinct reference shingles
    verbatim; at ~60 bytes per 8-gram a 1B-shingle benchmark suite is a
    ~60 GB broadcast.  A Bloom filter at 12 bits/key is ~1.5 GB for the
    same set — and the corpus-side membership test needs NO join at
    all: the bitset ships once per executor and ~99% of clean shingles
    die map-side.  Survivors (true hits + ~0.1% false positives at
    these defaults) then take the ordinary exact-confirm join, so the
    RESULT is bitwise-identical to decontaminate() — the oracle twin is
    the same SQL, the Bloom is pure plan shape.

    Build: k xxhash64 bit positions per reference shingle (JVM-side,
    whole-stage codegen) -> positions pack into 64-bit words via a
    bit_or aggregation -> words pack into fixed 1 MiB dense CHUNKS
    (applyInPandas per chunk id), so what crosses to the driver is
    O(bitset bytes / 1 MiB) blob rows — at the 1B-shingle design point
    (12 bits/key ~ 1.5 GB bitset) that is ~1.4k rows, where the old
    per-word collect was ~190M Row objects.  The driver assembles ONE
    buffer and broadcasts it via SparkContext.  Probe: the k positions
    are computed JVM-side on corpus shingles; the only Python is an
    Arrow-vectorized bitset gather (numpy fancy index).
    """
    if mode not in ("drop", "flag"):
        raise ValueError(f"decontaminate mode={mode!r}")
    import numpy as np
    import pandas as pd
    ref_text = ref_text_col or text_col
    rsh = (ref.select(tokens(ref_text).alias("__toks"))
           .filter(F.size("__toks") >= n)
           .select(F.explode(
               word_shingles_from(F.col("__toks"), n)).alias("s"))
           .distinct())
    if n_ref is None:
        n_ref = rsh.count()
    m_bits = max(1024, bits_per_key * max(n_ref, 1))
    k = num_hashes

    def positions(col: Column) -> list[Column]:
        return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))
                for i in range(k)]

    arr = _bloom_bitset(rsh, positions, m_bits)
    bc = df.sparkSession.sparkContext.broadcast(arr.tobytes())

    @F.pandas_udf("boolean")
    def maybe_contains(ps: pd.Series) -> pd.Series:
        if ps.empty:
            return pd.Series([], dtype=bool)
        bits = np.frombuffer(bc.value, dtype=np.uint64)
        P = np.vstack(ps.to_numpy()).astype(np.int64)
        w = (P >> 6).astype(np.int64)
        b = (P & 63).astype(np.uint64)
        hit = (bits[w] >> b) & np.uint64(1)
        return pd.Series((hit != 0).all(axis=1))

    dsh = _staged_shingles(df, text_col, id_col, n) \
        .select("id", F.explode("sh").alias("s"))
    survivors = (dsh
                 .withColumn("__ps", F.array(*positions(F.col("s"))))
                 .filter(maybe_contains(F.col("__ps")))
                 .select("id", "s"))
    # exact confirm kills Bloom false positives: survivors are sparse
    # (true hits + fpp of the corpus shingles), so this join is small
    # regardless of corpus size
    hits = (survivors.join(rsh, "s")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_overlap"))
            .filter(F.col("n_overlap") >= min_overlap)
            .select(F.col("id").alias("__hit_id"), "n_overlap"))
    if mode == "flag":
        out = df.join(hits, df[id_col] == F.col("__hit_id"), "left")
        return out.select(
            *df.columns,
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap)
            .alias("contaminated"))
    return df.join(hits, df[id_col] == F.col("__hit_id"), "left_anti")


def decontaminate_sql(table="documents", ref_where="TRUE",
                      text_col="text", id_col="doc_id",
                      n=8, min_overlap=1) -> str:
    """DuckDB twin of decontaminate(mode="drop") with the reference set
    selected from the same table by ``ref_where``."""
    toks = TOKENS_SQL.format(c=text_col)
    sh = _shingles_sql(text_col, n)
    toks_d = TOKENS_SQL.format(c="d." + text_col)
    sh_d = _shingles_sql("d." + text_col, n)
    return f"""
WITH rsh AS (
  SELECT DISTINCT s FROM (
    SELECT unnest({sh}) AS s FROM {table}
    WHERE ({ref_where}) AND len({toks}) >= {n})
), hits AS (
  SELECT id FROM (
    SELECT id, count(*) AS n_overlap FROM (
      SELECT d.{id_col} AS id, unnest({sh_d}) AS s
      FROM {table} d WHERE len({toks_d}) >= {n}
    ) ds JOIN rsh USING (s)
    GROUP BY id
  ) WHERE n_overlap >= {min_overlap}
)
SELECT t.* FROM {table} t ANTI JOIN hits ON t.{id_col} = hits.id"""


def _components_local(ep: DataFrame, src: str = "src",
                      dst: str = "dst") -> DataFrame:
    """Driver-side connected components over a BOUNDED (checkpointed)
    pair table — the broadcast-threshold fast path of
    :func:`dup_components`.  Vectorized min-label propagation with
    pointer jumping over index arrays (ids sorted ascending, so
    min-over-indices == min-over-ids); converges to the identical
    min-reachable-id fixpoint as the distributed loop.  The caller has
    already verified the pair count is under the collect cap."""
    import numpy as np
    id_t = ep.schema[0].dataType.simpleString()
    spark = ep.sparkSession
    pdf = ep.toPandas()
    if not len(pdf):
        return spark.createDataFrame([], f"id {id_t}, comp {id_t}")
    a = pdf[src].to_numpy()
    b = pdf[dst].to_numpy()
    ids = np.unique(np.concatenate([a, b]))
    si = np.searchsorted(ids, a)
    di = np.searchsorted(ids, b)
    parent = np.arange(ids.shape[0])
    for _ in range(64):
        prev = parent
        p = parent.copy()
        np.minimum.at(p, si, parent[di])
        np.minimum.at(p, di, parent[si])
        p = p[p]                       # pointer jump: comp <- comp[comp]
        parent = p
        if np.array_equal(parent, prev):
            break
    out = pd.DataFrame({"id": ids, "comp": ids[parent]})
    return spark.createDataFrame(out, f"id {id_t}, comp {id_t}")


def dup_components(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b",
                   max_iter: int = 25,
                   local_pairs_max: int | None = 1_000_000) -> DataFrame:
    """Connected components over near-duplicate PAIRS -> (id, component)
    with component = the smallest id reachable — the step that turns an
    LSH pair list into per-cluster survivors/delete-lists (keep rows
    where id == component).

    The PAIR table is checkpointed once (the upstream LSH/jaccard
    pipeline runs exactly once) and counted; the count serves two
    decisions:

    - ``local_pairs_max`` (the broadcast-threshold pattern, guide
      §3.1): at or below it, the bounded pair set crosses to the
      driver ONCE (Arrow) and components resolve with a vectorized
      union-find — zero per-round Spark jobs.  A 1M-pair table is
      ~16 MB, the same class as a broadcast side; the label table it
      returns is no larger than what the distributed loop would ship
      to the next operator anyway.  Identical (id, min-reachable-id)
      fixpoint, locked by the DuckDB recursive-CTE twin.
    - past the cap, the distributed loop's edge layout is sized FROM
      the count (adaptive, not a local[32] constant): ~2M edge rows
      per partition, so a 10B-pair set gets ~10k keyed partitions and
      a benchmark-scale set gets 1 — per-round stage breadth tracks
      the data instead of spark.sql.shuffle.partitions (measured 2.2x
      off the sf1 round loop, where 32 near-empty tasks per stage were
      pure scheduling overhead).

    Distributed path: iterative min-label propagation with POINTER
    JUMPING — each round takes the min over direct neighbors' labels,
    then label-of-label (comp <- comp[comp]), so convergence is
    O(log diameter) rounds instead of O(diameter).  Each round
    localCheckpoints the label table (truncating lineage) and the
    driver checks a single converged-count aggregate; only ids
    appearing in pairs are carried — at 100 TB the label table is
    bounded by the candidate-pair id set, far smaller than the corpus.
    Rows not in any pair are singleton components (callers union them
    back unchanged)."""
    from pyspark import StorageLevel
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # ONE barrier materializes the upstream candidate-pair pipeline
    # (without it the doubled-edge union evaluated the LSH/jaccard
    # pipeline once per union branch, and every round re-planned it);
    # the count that fills it is the size oracle for both decisions
    # above
    ep = e.localCheckpoint(eager=False)
    n_pairs = ep.count()
    if local_pairs_max is not None and n_pairs <= local_pairs_max:
        return _components_local(ep)
    # edge partition count from the measured pair count (~2M rows /
    # ~32 MB per partition), never the session shuffle default
    n_parts = max(1, min(32768, (2 * n_pairs + 2_000_000 - 1)
                         // 2_000_000))
    # persist AFTER a keyed repartition — unlike localCheckpoint
    # (whose ExistingRDD reports UnknownPartitioning), the cached
    # relation keeps its outputPartitioning, so every round's
    # edges-side exchange disappears from the plan: one edge shuffle
    # total instead of one per round (guide §2.4 exchange reuse; at
    # scale the edge table is the big side of the round join)
    edges = ep.unionAll(ep.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst"))) \
        .repartition(n_parts, "src") \
        .persist(StorageLevel.MEMORY_AND_DISK)
    # fill the cache EAGERLY: round 0 scans edges from two subtrees
    # (l0 and its jump copy) whose stages run concurrently — against a
    # cold cache both would race the (checkpointed) pair read; the
    # fill itself reads the checkpoint, not the pipeline
    edges.count()
    # fused round 0: the initial label of every id is itself, so the
    # first neighbor-min needs NO labels join — comp0 = min(src,
    # min(dst)) straight off the edges in the same groupBy that used
    # to be the distinct() init (one shuffle replaces distinct + join
    # + agg), followed by the usual pointer jump.  Rounds converge to
    # the same min-reachable-id fixpoint from one step further along.
    l0 = (edges.groupBy("src").agg(F.min("dst").alias("__nb"))
          .select(F.col("src").alias("id"),
                  F.least(F.col("src"), F.col("__nb")).alias("comp")))
    j0 = l0.select(F.col("id").alias("jid"), F.col("comp").alias("jcomp"))
    labels = (l0.join(j0, l0.comp == F.col("jid"), "left")
              .select("id", F.coalesce("jcomp", "comp").alias("comp"))
              .localCheckpoint(eager=False))
    for _ in range(max_iter):
        nb = (edges.join(labels, edges.src == labels.id)
              .groupBy("dst").agg(F.min("comp").alias("nb_min")))
        stepped = (labels.join(nb, labels.id == nb.dst, "left")
                   .select(F.col("id"), F.col("comp").alias("__old"),
                           F.least(F.col("comp"),
                                   F.coalesce("nb_min", F.col("comp")))
                           .alias("comp")))
        jump = stepped.select(F.col("id").alias("jid"),
                              F.col("comp").alias("jcomp"))
        # ONE job per round instead of two: carry the pre-round label
        # through the jump join, lazily checkpoint, and let the
        # convergence count be the action that materializes the
        # checkpoint — the old shape paid an eager-checkpoint job PLUS
        # a join-against-old-labels count job per round.  The graded
        # result is the converged fixpoint (min reachable id), which is
        # iteration-shape-independent.
        new_labels = (stepped.join(jump,
                                   stepped.comp == F.col("jid"), "left")
                      .select(F.col("id"), F.col("__old"),
                              F.coalesce("jcomp", "comp").alias("comp"))
                      .localCheckpoint(eager=False))
        changed = (new_labels
                   .filter(F.col("comp") != F.col("__old")).count())
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
    edges.unpersist(blocking=False)
    return labels


def canonicalize(df: DataFrame, pairs: DataFrame,
                 id_col: str = "doc_id",
                 id_a: str = "id_a", id_b: str = "id_b",
                 max_iter: int = 25) -> DataFrame:
    """The APPLY step of a dedup pipeline: collapse each near-duplicate
    cluster to its canonical (smallest-id) representative and return
    the deduplicated corpus — rows in no pair pass through unchanged
    (singleton components), rows whose id == their component survive,
    everything else drops.

    Scale shape: :func:`dup_components` bounds the label table by the
    candidate-pair id set (far smaller than the corpus); the final
    membership test is ONE left join of the corpus against the
    (id, comp) labels with the survivors filter — no corpus self-join,
    no global sort.  AQE broadcasts the label table when small."""
    labels = dup_components(pairs.select(F.col(id_a).alias("id_a"),
                                         F.col(id_b).alias("id_b")),
                            max_iter=max_iter)
    lab = labels.select(F.col("id").alias("__cid"),
                        F.col("comp").alias("__comp"))
    out = df.join(lab, df[id_col] == F.col("__cid"), "left")
    return (out.filter(F.col("__comp").isNull()
                       | (F.col("__cid") == F.col("__comp")))
               .select(*df.columns))


def canonicalize_sql(pairs_sql: str, table: str = "documents",
                     id_col: str = "doc_id",
                     id_a: str = "id_a", id_b: str = "id_b") -> str:
    """DuckDB twin: recursive-CTE components + the same survivors
    filter over the corpus."""
    comp = dup_components_sql(pairs_sql, id_a, id_b)
    return f"""
WITH labels AS ({comp})
SELECT t.* FROM {table} t
LEFT JOIN labels l ON t.{id_col} = l.id
WHERE l.comp IS NULL OR t.{id_col} = l.comp"""


def dup_components_sql(pairs_sql: str, id_a: str = "id_a",
                       id_b: str = "id_b") -> str:
    """DuckDB twin: transitive closure via WITH RECURSIVE, component =
    min reachable id (feasible at oracle scale)."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}
), edges AS (
  SELECT {id_a} AS src, {id_b} AS dst FROM pairs
  UNION ALL
  SELECT {id_b} AS src, {id_a} AS dst FROM pairs
), reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
)
SELECT id, min(lbl) AS comp FROM reach GROUP BY id"""


_SIMHASH_BITS = 60  # 15 md5 hex chars -> fits a signed 64-bit long in
                    # both Spark and DuckDB (16 chars could exceed 2^63)


_PACK_W = 15          # bit-field width: per-doc token count must stay
_PACK_PER = 4         # below 2^15; 4 fields per signed-64 sum is safe
                      # (max packed value (2^15-1)*2^45 < 2^63)


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id",
            bits: int = _SIMHASH_BITS) -> DataFrame:
    """Charikar simhash over token md5s (first 15 hex chars -> 60 bits).

    One shuffle: explode tokens, then a groupBy(id) whose per-bit ONES
    counters are PACKED four-to-a-long (15-bit fields), so 60 fingerprint
    bits cost 15 sum aggregates + a count instead of 60 — fewer agg
    buffers and per-row updates on the map side; the shuffle still
    carries one row per doc regardless of document length.  Bit j of the
    fingerprint is set iff 2*ones_j > n (same sign rule as the +-1 sum);
    values are integers, so the DuckDB twin's unpacked formulation is
    bit-identical."""
    tok = F.explode(tokens(text_col)).alias("tok")
    ex = df.select(F.col(id_col).alias("id"), tok)
    v = F.conv(F.substring(F.md5(F.col("tok")), 1, (bits + 3) // 4),
               16, 10).cast("long")
    ex = ex.select("id", v.alias("v"))
    # expressions assembled as SQL text and parsed ONCE per column:
    # building them as ~360 chained Column objects cost ~1s of py4j
    # round-trips per query construction (measured; a third of the
    # whole sf0.1 runtime)
    ngroups = (bits + _PACK_PER - 1) // _PACK_PER
    aggs = [F.count(F.lit(1)).alias("n")]
    for g in range(ngroups):
        terms = []
        for k in range(_PACK_PER):
            j = g * _PACK_PER + k
            if j >= bits:
                break
            terms.append(f"shiftleft(shiftright(v, {j}) & 1, "
                         f"{k * _PACK_W})")
        aggs.append(F.expr(f"sum({' + '.join(terms)})").alias(f"p{g}"))
    per_doc = ex.groupBy("id").agg(*aggs)
    mask = (1 << _PACK_W) - 1
    fp_terms = []
    for j in range(bits):
        g, k = j // _PACK_PER, j % _PACK_PER
        fp_terms.append(
            f"IF((shiftright(p{g}, {k * _PACK_W}) & {mask}) * 2 > n, "
            f"{2 ** j}L, 0L)")
    fp = F.expr(f"CAST({' + '.join(fp_terms)} AS BIGINT)")
    return per_doc.select("id", fp.alias("simhash"))


def simhash_bands(fp: Column, max_hamming: int = 3,
                  bits: int = _SIMHASH_BITS) -> list[Column]:
    """(k+1)-table Hamming-ball blocking keys: split the fingerprint into
    ``max_hamming + 1`` bit-bands.  Pigeonhole: two fingerprints within
    Hamming distance k differ in at most k bands, so they agree EXACTLY
    on >=1 of the k+1 bands — candidate recall is 100%, and each band key
    has ~2^(bits/(k+1)) values, so bucket granularity GROWS with corpus
    size instead of being pinned at 256 like a fixed top-byte block."""
    nb = max_hamming + 1
    w = bits // nb
    mask = (1 << w) - 1
    return [F.shiftright(fp, b * w).bitwiseAND(mask).alias(f"band{b}")
            for b in range(nb)]


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  bits: int = _SIMHASH_BITS,
                  max_bucket: int = 200) -> DataFrame:
    """Pairs within Hamming distance k via (k+1)-band blocking.

    Each doc lands in k+1 buckets (one per band); candidates are the
    intra-bucket combinations from ONE (band, value) aggregation pass
    (_bucket_pairs — never a cross join, upstream computed once).
    ``max_bucket`` caps pathological buckets (huge exact-duplicate
    clusters — run dedup_exact first) with a deterministic by-id cut so
    the oracle twin can reproduce it."""
    sh = simhash(df, text_col, id_col, bits)
    buckets = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), bc.alias("h"))
            for b, bc in enumerate(
                simhash_bands(F.col("simhash"), max_hamming, bits))
        ])).alias("bk")
    ).select("id", "simhash",
             F.col("bk.band").alias("band"), F.col("bk.h").alias("h"))
    pr = _bucket_pairs(buckets, max_bucket, payload=["simhash"])
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (pr.filter(ham <= max_hamming)
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    ham.cast("long").alias("hamming"))
            .distinct())


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5,
                        max_bucket: int = 50) -> DataFrame:
    """Exact Jaccard similarity on distinct word n-grams, computed from
    the inverted index alone.

    Shingles occurring in more than ``max_bucket`` documents are dropped
    up front (stop-shingle removal — the standard guard against the
    quadratic hot-bucket blow-up); Jaccard is then EXACT over the
    remaining shingles: each kept index group emits one row per
    co-occurring pair, so |A∩B| is a count aggregation and
    |A∪B| = |A|+|B|-|A∩B| from per-doc shingle counts.  No array
    materialization, no array_intersect over candidate pairs — the
    earlier formulation (candidates -> join arrays back -> set
    intersection) re-shuffled the documents twice and evaluated ~1M
    interpreted array ops at sf0.1."""
    base = _staged_shingles(df, text_col, id_col, n)
    inv = base.select("id", F.explode("sh").alias("s"))
    # ONE aggregation builds the inverted index; dropping groups larger
    # than max_bucket IS the stop-shingle removal.  The previous
    # window-count + self-join + separate sizes aggregation consumed the
    # exploded shingle relation four times (tokenize+explode re-ran per
    # consumer); this shape's two consumers (pair counts, per-doc
    # sizes) each recompute the scan->explode->agg upstream — Spark does
    # not fire ReuseExchange across the differently-pruned branches
    # (verified against a vanilla session too) — but the upstream is
    # cheap relative to its shuffle and the recompute was measured
    # FASTER than materializing.  Deliberately
    # NOT persisted: caching the array-typed index was measured 3-4x
    # SLOWER than the exchange reuse (InMemoryRelation row conversion +
    # growing cache churn; persist [1.2, 2.1, 2.9, 2.7]s vs no-persist
    # [0.8, 0.8, 0.7, 0.6]s across repeated sf0.1 runs), and at 100 TB
    # pinning the whole inverted index in executor memory is exactly
    # what you don't want.  localCheckpoint(eager=False) on the grouped
    # index re-measured at sf1 (round 6, clean session): ~7x slower at
    # n=2 (1.4s -> 9.2s median) and ~3x slower at n=3 (15.9s -> 46.7s)
    # — RDD materialization of the array column loses to recomputing
    # the codegen'd scan->explode->agg both times.
    grouped = (inv.groupBy("s")
               .agg(F.sort_array(F.collect_list("id")).alias("ids"))
               .filter(F.size("ids") <= max_bucket))
    sizes = (grouped.select(F.explode("ids").alias("id"))
             .groupBy("id").agg(F.count(F.lit(1)).alias("sz")))
    combos = F.flatten(F.transform(
        F.col("ids"),
        lambda x, i: F.transform(
            F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))
    inter = (grouped.filter(F.size("ids") >= 2)
             .select(F.explode(combos).alias("pr"))
             .groupBy(F.col("pr.a").alias("id_a"),
                      F.col("pr.b").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    joined = (inter
              .join(sizes.select(F.col("id").alias("id_a"),
                                 F.col("sz").alias("sz_a")), "id_a")
              .join(sizes.select(F.col("id").alias("id_b"),
                                 F.col("sz").alias("sz_b")), "id_b"))
    i = F.col("inter").cast("double")
    union = (F.col("sz_a") + F.col("sz_b")).cast("double") - i
    jac = F.round(i / union, 6)
    return (joined.select("id_a", "id_b", jac.alias("jaccard"))
                  .filter(F.col("jaccard") >= threshold))


def _winnow_kgram_hashes(df: DataFrame, text_col: str, id_col: str,
                         k: int) -> DataFrame:
    """Shared winnowing stage: tokenize -> ordered k-gram sequence ->
    32-bit hash; returns (id, pos, h).  The staged-token-array
    discipline matches word_shingles_from (HOFs re-evaluate unstaged
    expressions per element)."""
    st = (df.select(F.col(id_col).alias("id"),
                    tokens(text_col).alias("__toks"))
            .filter(F.size("__toks") >= k))
    idx = F.sequence(F.lit(1), F.size("__toks") - (k - 1))

    def kgram(i):
        return F.concat_ws(" ", *[F.element_at(F.col("__toks"), i + j)
                                  for j in range(k)])

    return (st.select("id",
                      F.posexplode(F.transform(idx, kgram))
                       .alias("pos", "s"))
              .select("id", "pos",
                      F.conv(F.substring(F.md5("s"), 1, 8), 16, 10)
                       .cast("long").alias("h")))


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 4,
                        w: int = 5) -> DataFrame:
    """Winnowing fingerprint set per document (Schleimer/Wilkerson/
    Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003 — the MOSS algorithm).

    Word k-grams are hashed to 32-bit ints (md5 hex prefix, the
    engine-portable hash used across this module); every window of w
    consecutive k-gram hashes contributes its MINIMUM; the distinct set
    of selected hashes is the document's fingerprint.  Expected density
    is 2/(w+1) of all k-grams, with the winnowing guarantee: any shared
    substring of at least w+k-1 tokens produces at least one shared
    fingerprint.  That positional guarantee is what the whole-document
    shingle-set strategies (minhash/jaccard) do NOT give — winnowing
    detects PASSAGE reuse (one paragraph lifted into an otherwise
    different document), the common contamination shape in web-scraped
    training corpora.

    Shape at 100 TB: tokenize/hash is a codegen'd scan projection; the
    only shuffle before the fingerprint set is the per-document window
    sort, keyed by doc id — documents are bounded, so no skew.  With
    hash ties absent (32-bit hashes, per-document collision odds
    ~n^2/2^32), "min of each window" selects exactly the winnowing
    fingerprint set, order-independently — no stateful scan needed.
    Documents shorter than w k-grams contribute their global-min hash
    so every tokenizable document gets >= 1 fingerprint.

    Returns (id, h) — one row per distinct fingerprint hash.
    """
    kg = _winnow_kgram_hashes(df, text_col, id_col, k)
    frame = (Window.partitionBy("id").orderBy("pos")
                   .rowsBetween(0, w - 1))
    win = kg.select(
        "id", "pos",
        F.min("h").over(frame).alias("wmin"),
        F.count(F.lit(1)).over(Window.partitionBy("id")).alias("cnt"))
    # full windows start at pos 0..cnt-w; short docs (< w k-grams) keep
    # the pos-0 row, whose unfilled frame min IS the global min
    keep = ((F.col("pos") <= F.col("cnt") - w)
            | ((F.col("cnt") < w) & (F.col("pos") == 0)))
    return (win.filter(keep)
               .select("id", F.col("wmin").alias("h"))
               .distinct())


def winnow_pairs(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 4, w: int = 5,
                 min_shared: int = 2, max_bucket: int = 50) -> DataFrame:
    """Passage-overlap pairs from winnowing fingerprints: documents
    sharing >= min_shared fingerprints, with a containment score
    n_shared / min(|A|, |B|) that approaches 1.0 when one document's
    text is contained in the other — the plagiarism/contamination
    measure, orthogonal to symmetric Jaccard.

    Pair generation reuses the proven inverted-index shape from
    ngram_jaccard_pairs: ONE aggregation groups fingerprint postings,
    hot fingerprints (> max_bucket docs — boilerplate headers/footers)
    are dropped structurally BEFORE any pair is emitted, and intra-
    bucket combinations come from the grouped array, so there is no
    candidate self-join and the quadratic blow-up is capped per bucket.
    Per-doc sizes are counted over the SAME stop-filtered index, so
    containment is consistent with the pair counts in both engines.
    """
    fp = winnow_fingerprints(df, text_col, id_col, k, w)
    grouped = (fp.groupBy("h")
                 .agg(F.sort_array(F.collect_list("id")).alias("ids"))
                 .filter(F.size("ids") <= max_bucket))
    sizes = (grouped.select(F.explode("ids").alias("id"))
                    .groupBy("id").agg(F.count(F.lit(1)).alias("sz")))
    combos = F.flatten(F.transform(
        F.col("ids"),
        lambda x, i: F.transform(
            F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))
    shared = (grouped.filter(F.size("ids") >= 2)
              .select(F.explode(combos).alias("pr"))
              .groupBy(F.col("pr.a").alias("id_a"),
                       F.col("pr.b").alias("id_b"))
              .agg(F.count(F.lit(1)).alias("n_shared"))
              .filter(F.col("n_shared") >= min_shared))
    joined = (shared
              .join(sizes.select(F.col("id").alias("id_a"),
                                 F.col("sz").alias("sz_a")), "id_a")
              .join(sizes.select(F.col("id").alias("id_b"),
                                 F.col("sz").alias("sz_b")), "id_b"))
    cont = F.round(F.col("n_shared").cast("double")
                   / F.least("sz_a", "sz_b").cast("double"), 6)
    return joined.select("id_a", "id_b", "n_shared",
                         cont.alias("containment"))


def winnow_decontaminate(df: DataFrame, ref: DataFrame,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         ref_text_col: str | None = None,
                         ref_id_col: str | None = None,
                         k: int = 4, w: int = 5, min_shared: int = 1,
                         mode: str = "drop") -> DataFrame:
    """Passage-level benchmark decontamination: drop (or flag) corpus
    documents sharing >= ``min_shared`` winnowing fingerprints with ANY
    reference document.

    Versus :func:`decontaminate` (distinct word n-grams): the winnowing
    guarantee makes the overlap test POSITIONAL — any verbatim run of
    >= w+k-1 tokens lifted from a benchmark document is caught — while
    both index sides shrink to ~2/(w+1) of the full shingle set, so at
    100 TB the broadcast is smaller and the corpus-side probe touches a
    fraction of the rows for the same contamination recall target.

    Same scale shape as decontaminate: the reference fingerprint set
    (benchmark suites — tiny) broadcasts; the corpus-side test is a
    map-side broadcast hash join on the fingerprint explode, and the
    only corpus shuffle is the per-doc hit count."""
    if mode not in ("drop", "flag"):
        raise ValueError(f"winnow_decontaminate mode={mode!r}")
    rfp = (winnow_fingerprints(ref, ref_text_col or text_col,
                               ref_id_col or id_col, k, w)
           .select("h").distinct())
    cfp = winnow_fingerprints(df, text_col, id_col, k, w)
    hits = (cfp.join(F.broadcast(rfp), "h")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .filter(F.col("n_hits") >= min_shared)
            .select(F.col("id").alias("__hit_id"), "n_hits"))
    if mode == "flag":
        out = df.join(hits, df[id_col] == F.col("__hit_id"), "left")
        return out.select(
            *df.columns,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_shared)
            .alias("contaminated"))
    return df.join(hits, df[id_col] == F.col("__hit_id"), "left_anti")


def winnow_fingerprints_pos(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", k: int = 4,
                            w: int = 5) -> DataFrame:
    """Winnowing fingerprints WITH the token position of the selected
    k-gram — the (hash, position) pairs the SIGMOD'03 paper actually
    records.  Each window contributes min(struct(h, pos)): the minimum
    hash, ties broken to the smallest position (the "robust winnowing"
    tie rule, order-independent, so plain window aggregation works —
    no stateful scan).  Returns distinct (id, h, kpos); kpos is the
    0-based token index where the fingerprinted k-gram starts, so the
    k-gram covers tokens [kpos, kpos + k - 1]."""
    kg = _winnow_kgram_hashes(df, text_col, id_col, k)
    frame = (Window.partitionBy("id").orderBy("pos")
                   .rowsBetween(0, w - 1))
    win = kg.select(
        "id", "pos",
        F.min(F.struct(F.col("h").alias("h"),
                       F.col("pos").alias("p"))).over(frame).alias("m"),
        F.count(F.lit(1)).over(Window.partitionBy("id")).alias("cnt"))
    keep = ((F.col("pos") <= F.col("cnt") - w)
            | ((F.col("cnt") < w) & (F.col("pos") == 0)))
    return (win.filter(keep)
               .select("id", F.col("m.h").alias("h"),
                       F.col("m.p").cast("long").alias("kpos"))
               .distinct())


def winnow_match_spans(df: DataFrame, ref: DataFrame,
                       text_col: str = "text", id_col: str = "doc_id",
                       ref_text_col: str | None = None,
                       ref_id_col: str | None = None,
                       k: int = 4, w: int = 5) -> DataFrame:
    """Matched PASSAGE RANGES against a reference set — what a
    decontamination pipeline actually needs to redact or split at the
    match instead of dropping whole documents (winnow_decontaminate
    only counts hits).

    Corpus fingerprints keep their k-gram positions
    (:func:`winnow_fingerprints_pos`); positions whose hash appears in
    the reference fingerprint set become intervals
    [kpos, kpos + k - 1], and overlapping-or-adjacent intervals merge
    into maximal spans via the classic gap-and-islands window chain
    (running max of prior ends -> island flag -> running sum).

    Shape at 100 TB: the reference set broadcasts (benchmark suites —
    tiny); every window is partitioned by doc id (documents bounded,
    no skew); the only corpus shuffles are the fingerprint window sort
    and the per-doc island grouping.

    Returns (id, match_start, match_end, n_fp): inclusive token-index
    span plus the number of distinct matched k-gram positions merged
    into it."""
    rfp = (winnow_fingerprints(ref, ref_text_col or text_col,
                               ref_id_col or id_col, k, w)
           .select("h").distinct())
    cfp = winnow_fingerprints_pos(df, text_col, id_col, k, w)
    hit = (cfp.join(F.broadcast(rfp), "h")
              .select("id", "kpos").distinct())
    prev = (Window.partitionBy("id").orderBy("kpos")
                  .rowsBetween(Window.unboundedPreceding, -1))
    cum = (Window.partitionBy("id").orderBy("s")
                 .rowsBetween(Window.unboundedPreceding, 0))
    staged = hit.select(
        "id", F.col("kpos").alias("s"),
        (F.col("kpos") + (k - 1)).alias("e"),
        F.max(F.col("kpos") + (k - 1)).over(prev).alias("pe"))
    flagged = staged.select(
        "id", "s", "e",
        F.when(F.col("pe").isNull()
               | (F.col("s") > F.col("pe") + 1), 1)
         .otherwise(0).alias("nw"))
    isl = flagged.select("id", "s", "e",
                         F.sum("nw").over(cum).alias("g"))
    return (isl.groupBy("id", "g")
               .agg(F.min("s").alias("match_start"),
                    F.max("e").alias("match_end"),
                    F.count(F.lit(1)).alias("n_fp"))
               .select("id", "match_start", "match_end", "n_fp"))


def winnow_redact(df: DataFrame, ref: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  ref_text_col: str | None = None,
                  ref_id_col: str | None = None,
                  k: int = 4, w: int = 5,
                  mask: str = "[REDACTED]") -> DataFrame:
    """APPLY the matched spans: rebuild each document's text with every
    matched passage collapsed to one ``mask`` token — the
    keep-the-document decontamination a real pipeline ships, instead
    of dropping documents wholesale (winnow_decontaminate) or only
    reporting ranges (winnow_match_spans).

    Plan: tokens explode once with positions; the span table
    (:func:`winnow_match_spans` — contaminated docs only, tiny next to
    the corpus) joins on doc id and covers each token at most once
    (spans are disjoint maximal ranges by construction).  The rebuild
    is one groupBy: sort_array over (pos, piece) structs, concat — a
    single corpus shuffle on doc id.  Clean documents pass through
    untouched with n_spans = 0; documents whose text is NULL or
    tokenizes to zero tokens survive too (redacted_text = '') — the
    rebuilt aggregate left-joins back onto the corpus ids so
    posexplode's empty-array drop cannot lose rows.

    Returns (id, redacted_text, n_spans)."""
    spans = winnow_match_spans(df, ref, text_col, id_col,
                               ref_text_col, ref_id_col, k, w)
    toks = (df.select(F.col(id_col).alias("id"),
                      tokens(text_col).alias("__toks"))
              .select("id", F.posexplode("__toks").alias("pos", "tok")))
    j = toks.join(spans.withColumnRenamed("id", "__sid"),
                  (F.col("id") == F.col("__sid"))
                  & (F.col("pos") >= F.col("match_start"))
                  & (F.col("pos") <= F.col("match_end")), "left")
    piece = (F.when(F.col("match_start").isNull(), F.col("tok"))
              .when(F.col("pos") == F.col("match_start"), F.lit(mask))
              .otherwise(F.lit(None)))
    # span-interior tokens carry a NULL piece and are filtered out
    # AFTER the position sort — matching the twin's WHERE piece IS NOT
    # NULL before its ordered string_agg
    rebuilt = (j.filter(piece.isNotNull())
                .select("id", "pos", piece.alias("piece"))
                .groupBy("id")
                .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct(F.col("pos").alias("p"),
                                         F.col("piece").alias("t")))),
                            lambda s: s["t"]),
                        " ").alias("redacted_text")))
    nsp = spans.groupBy("id").agg(F.count(F.lit(1)).alias("n_spans"))
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return (ids.join(rebuilt, "id", "left")
            .join(nsp, "id", "left")
            .select("id",
                    F.coalesce("redacted_text", F.lit(""))
                     .alias("redacted_text"),
                    F.coalesce("n_spans", F.lit(0)).alias("n_spans")))


def winnow_redact_sql(table="documents", ref_source=None,
                      text_col="text", id_col="doc_id",
                      k=4, w=5, mask="[REDACTED]"):
    """DuckDB twin of :func:`winnow_redact` — identical spans
    (winnow_match_spans_sql's CTE chain), identical token join and
    keep/mask/drop rule, string_agg ordered by position."""
    if "'" in mask or "\\" in mask:
        # the mask is spliced into a SQL string literal — same loud
        # no-splice rule as dedup.py's other generated-SQL guards
        raise ValueError(f"winnow_redact_sql mask {mask!r} contains "
                         "SQL-literal specials")
    spans_sql = winnow_match_spans_sql(table, ref_source, text_col,
                                       id_col, k, w)
    toks = TOKENS_SQL.format(c=text_col)
    return f"""
WITH spans AS ({spans_sql}), tok AS (
  SELECT id, i - 1 AS pos, t[i] AS tok
  FROM (SELECT id, t, unnest(generate_series(1, len(t))) AS i
        FROM (SELECT {id_col} AS id, {toks} AS t FROM {table}))
), pieced AS (
  SELECT t.id, t.pos,
         CASE WHEN s.match_start IS NULL THEN t.tok
              WHEN t.pos = s.match_start THEN '{mask}'
              ELSE NULL END AS piece
  FROM tok t LEFT JOIN spans s
    ON s.id = t.id AND t.pos BETWEEN s.match_start AND s.match_end
), rebuilt AS (
  SELECT id, string_agg(piece, ' ' ORDER BY pos) AS redacted_text
  FROM pieced WHERE piece IS NOT NULL GROUP BY id
), nsp AS (
  SELECT id, count(*)::BIGINT AS n_spans FROM spans GROUP BY id
), ids AS (
  SELECT DISTINCT {id_col} AS id FROM {table}
)
SELECT i.id, COALESCE(r.redacted_text, '') AS redacted_text,
       COALESCE(n.n_spans, 0) AS n_spans
FROM ids i LEFT JOIN rebuilt r USING (id) LEFT JOIN nsp n USING (id)"""


def _substring_grams(df: DataFrame, text_col: str, id_col: str,
                     min_len: int) -> DataFrame:
    """(id, pos, h) — one row per token position that starts a
    ``min_len``-token gram, h = the gram's 128-bit md5 (16-byte
    binary: halves the shuffle payload vs the hex string; cross-engine
    equality is unchanged).  Same staged-token-array discipline as
    _winnow_kgram_hashes; the gram text is built with ONE slice +
    array_join per position (O(min_len) chars), not min_len
    element_at calls."""
    st = (df.select(F.col(id_col).alias("id"),
                    tokens(text_col).alias("__toks"))
            .filter(F.size("__toks") >= min_len))
    idx = F.sequence(F.lit(1), F.size("__toks") - (min_len - 1))
    grams = F.transform(
        idx, lambda i: F.array_join(
            F.slice(F.col("__toks"), i, min_len), " "))
    return (st.select("id", F.posexplode(grams).alias("pos", "s"))
              .select("id", "pos", F.unhex(F.md5("s")).alias("h")))


def substring_dup_spans(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        min_len: int = 50) -> DataFrame:
    """EXACT substring deduplication spans (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022 — the
    ExactSubstr dedup; reference repo has no analog, and the shingle
    strategies here are all approximate).  Finds every maximal token
    range covered by some substring of >= ``min_len`` tokens that
    occurs >= 2 times ANYWHERE in the corpus (other documents or the
    same one — self-repetition counts, as in the paper).

    The paper builds a suffix array; that is not the Spark-shaped
    plan.  This uses the covering-union equivalence instead: a token
    position lies inside SOME duplicated substring of length >=
    min_len  iff  it lies inside a duplicated min_len-gram (any
    length->=min_len duplicate contains a duplicated min_len-window
    through every one of its positions, and a duplicated min_len-gram
    IS such a substring).  So the union of duplicated min_len-gram
    ranges equals the union of all >=min_len duplicated-substring
    ranges — EXACTLY, with one corpus-wide gram count instead of a
    suffix array.  Gram identity is the full 128-bit md5 (collision
    odds ~n^2/2^128 — astronomically below data-corruption rates).

    Shape at 100 TB: the gram table is one scan projection + explode
    (|tokens| rows x 16-byte hash); duplication is count(*) OVER
    (PARTITION BY h) — ONE hash shuffle, the inverted-index discipline
    every LSH op here uses (no self-join, no second scan); a
    boilerplate mega-gram concentrates its positions in one window
    partition, bounded by that gram's own occurrence count.  The span
    merge windows are per-document (bounded, no skew).

    Returns (id, dup_start, dup_end, n_grams): inclusive 0-based token
    ranges, overlapping-or-adjacent gram ranges merged maximally, with
    the count of duplicated gram starts merged into each."""
    g = _substring_grams(df, text_col, id_col, min_len)
    hits = (g.select("id", "pos",
                     F.count(F.lit(1)).over(Window.partitionBy("h"))
                      .alias("__c"))
             .filter(F.col("__c") >= 2)
             .select("id", "pos"))
    prev = (Window.partitionBy("id").orderBy("pos")
                  .rowsBetween(Window.unboundedPreceding, -1))
    cum = (Window.partitionBy("id").orderBy("s")
                 .rowsBetween(Window.unboundedPreceding, 0))
    staged = hits.select(
        "id", F.col("pos").alias("s"),
        (F.col("pos") + (min_len - 1)).alias("e"),
        F.max(F.col("pos") + (min_len - 1)).over(prev).alias("pe"))
    flagged = staged.select(
        "id", "s", "e",
        F.when(F.col("pe").isNull()
               | (F.col("s") > F.col("pe") + 1), 1)
         .otherwise(0).alias("nw"))
    isl = flagged.select("id", "s", "e",
                         F.sum("nw").over(cum).alias("g"))
    return (isl.groupBy("id", "g")
               .agg(F.min("s").alias("dup_start"),
                    F.max("e").alias("dup_end"),
                    F.count(F.lit(1)).alias("n_grams"))
               .select("id", "dup_start", "dup_end", "n_grams"))


def substring_dedup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_len: int = 50) -> DataFrame:
    """APPLY exact-substring dedup: rebuild each document with every
    duplicated span CUT OUT (the paper removes the duplicated bytes;
    winnow_redact's mask-and-keep is the contamination analog).  Clean
    documents pass through untouched; a document that is entirely
    duplicated text survives as an empty string (drop it with
    ``n_removed > 0 AND deduped_text = ''`` downstream if desired).

    Same rebuild shape as winnow_redact: tokens explode once, the span
    table (duplicated docs only — small next to the corpus) joins on
    doc id covering each token at most once (spans are disjoint
    maximal ranges by construction), one groupBy-sort rebuild, and the
    corpus-id left join guarantees text-less rows survive.

    Returns (id, deduped_text, n_spans, n_removed) — n_removed is the
    number of tokens cut."""
    spans = substring_dup_spans(df, text_col, id_col, min_len)
    toks = (df.select(F.col(id_col).alias("id"),
                      tokens(text_col).alias("__toks"))
              .select("id", F.posexplode("__toks").alias("pos", "tok")))
    j = toks.join(spans.withColumnRenamed("id", "__sid"),
                  (F.col("id") == F.col("__sid"))
                  & (F.col("pos") >= F.col("dup_start"))
                  & (F.col("pos") <= F.col("dup_end")), "left")
    rebuilt = (j.filter(F.col("dup_start").isNull())
                .select("id", "pos", "tok")
                .groupBy("id")
                .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct(F.col("pos").alias("p"),
                                         F.col("tok").alias("t")))),
                            lambda s: s["t"]),
                        " ").alias("deduped_text")))
    nsp = spans.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("dup_end") - F.col("dup_start") + 1)
         .alias("n_removed"))
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return (ids.join(rebuilt, "id", "left")
            .join(nsp, "id", "left")
            .select("id",
                    F.coalesce("deduped_text", F.lit(""))
                     .alias("deduped_text"),
                    F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
                    F.coalesce("n_removed", F.lit(0))
                     .alias("n_removed")))


def _substring_hits_ctes(prefix: str, source: str, text_col: str,
                         id_col: str, min_len: int) -> str:
    """Tokenize -> min_len-gram md5 -> corpus-wide window count ->
    duplicated gram starts, ending in ``{prefix}hits(id, pos)`` — the
    SQL twin of the hit stage of :func:`substring_dup_spans`."""
    toks = TOKENS_SQL.format(c=text_col)
    return f"""{prefix}base AS (
  SELECT {id_col} AS id, {toks} AS t FROM {source}
  WHERE len({toks}) >= {min_len}
), {prefix}g AS (
  SELECT id, i AS pos,
         unhex(md5(array_to_string(
             list_slice(t, i + 1, i + {min_len}), ' '))) AS h
  FROM (SELECT id, t,
               unnest(generate_series(0, len(t) - {min_len})) AS i
        FROM {prefix}base)
), {prefix}hits AS (
  SELECT id, pos FROM (
    SELECT id, pos, count(*) OVER (PARTITION BY h) AS c
    FROM {prefix}g
  ) WHERE c >= 2
)"""


def substring_dup_spans_sql(table="documents", text_col="text",
                            id_col="doc_id", min_len=50):
    """DuckDB twin of :func:`substring_dup_spans` — identical gram
    slices, md5 identity, window count, and gap-and-islands merge."""
    hits = _substring_hits_ctes("", table, text_col, id_col, min_len)
    return f"""
WITH {hits}, iv AS (
  SELECT id, pos AS s, pos + {min_len - 1} AS e,
         max(pos + {min_len - 1}) OVER (
           PARTITION BY id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
  FROM hits
), fl AS (
  SELECT id, s, e,
         CASE WHEN pe IS NULL OR s > pe + 1 THEN 1 ELSE 0 END AS nw
  FROM iv
), isl AS (
  SELECT id, s, e,
         sum(nw) OVER (PARTITION BY id ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM fl
)
SELECT id, min(s)::BIGINT AS dup_start, max(e)::BIGINT AS dup_end,
       count(*)::BIGINT AS n_grams
FROM isl GROUP BY id, g"""


def substring_dedup_sql(table="documents", text_col="text",
                        id_col="doc_id", min_len=50):
    """DuckDB twin of :func:`substring_dedup` — identical spans and
    the winnow_redact rebuild shape with the span tokens dropped."""
    spans_sql = substring_dup_spans_sql(table, text_col, id_col,
                                        min_len)
    toks = TOKENS_SQL.format(c=text_col)
    return f"""
WITH spans AS ({spans_sql}), tok AS (
  SELECT id, i - 1 AS pos, t[i] AS tok
  FROM (SELECT id, t, unnest(generate_series(1, len(t))) AS i
        FROM (SELECT {id_col} AS id, {toks} AS t FROM {table}))
), kept AS (
  SELECT t.id, t.pos, t.tok
  FROM tok t LEFT JOIN spans s
    ON s.id = t.id AND t.pos BETWEEN s.dup_start AND s.dup_end
  WHERE s.dup_start IS NULL
), rebuilt AS (
  SELECT id, string_agg(tok, ' ' ORDER BY pos) AS deduped_text
  FROM kept GROUP BY id
), nsp AS (
  SELECT id, count(*)::BIGINT AS n_spans,
         sum(dup_end - dup_start + 1)::BIGINT AS n_removed
  FROM spans GROUP BY id
), ids AS (
  SELECT DISTINCT {id_col} AS id FROM {table}
)
SELECT i.id, COALESCE(r.deduped_text, '') AS deduped_text,
       COALESCE(n.n_spans, 0) AS n_spans,
       COALESCE(n.n_removed, 0) AS n_removed
FROM ids i LEFT JOIN rebuilt r USING (id) LEFT JOIN nsp n USING (id)"""


def _srp_signs(n_planes: int, dim: int, seed: int = 0x5EED) -> list[list[int]]:
    """Deterministic ±1 (Rademacher) hyperplane matrix via an LCG — the
    same literal signs are embedded in the Column expressions and the SQL
    twin, so Spark and DuckDB compute bitwise-identical signatures."""
    state = seed
    out = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append(1 if (state >> 16) & 1 else -1)
        out.append(row)
    return out


def srp_band_keys(vec: Column, dim: int, nbits: int, bands: int,
                  seed: int = 0x5EED) -> Column:
    """Signed-random-projection band keys -> array<long> of ``bands``
    keys: bit i of band b is the sign of dot(v, w_{b*nbits+i}) for a
    fixed ±1 hyperplane w.  Each key has 2^nbits values, so bucket
    granularity is tunable and independent of any metadata column.

    All bands*nbits dot products ride in ONE Arrow pass with strict
    left-to-right per-dimension accumulation (``acc = acc + E[:,d]*s``
    is an IEEE float64 add per element — the exact order of the SQL
    twin's ``v[1]*s1 + v[2]*s2 + ...`` chain, so signatures are
    bitwise-identical in DuckDB).  The previous pure-Column form
    unrolled 3k+ element_at terms into one projection, overflowing
    janino's 64 KB method limit: ~18s of compile-fail-fallback for a
    500-row input, then interpreted evaluation."""
    signs = _srp_signs(bands * nbits, dim, seed)

    @F.pandas_udf("array<long>")
    def keys_udf(xs: pd.Series) -> pd.Series:
        import numpy as np
        X = np.vstack(xs.to_numpy()).astype(np.float64)
        # accumulate ACROSS all planes per dimension: each (row, plane)
        # cell still adds d = 0..dim-1 strictly left-to-right, so the
        # result is bitwise-identical to the per-plane scalar chain (and
        # the DuckDB twin) while doing dim vector ops instead of
        # planes x dim (measured ~3x on the signature stage)
        S = np.array(signs, dtype=np.float64).T  # (dim, planes)
        acc = X[:, [0]] * S[[0], :]
        for d in range(1, dim):
            acc = acc + X[:, [d]] * S[[d], :]
        bits = acc >= 0
        keys = np.zeros((X.shape[0], bands), dtype=np.int64)
        for b in range(bands):
            for i in range(nbits):
                keys[:, b] += np.where(bits[:, b * nbits + i], 1 << i, 0)
        return pd.Series(list(keys))

    return keys_udf(vec.cast("array<double>"))


def adaptive_nbits(n_rows: int, target_occupancy: int = 32,
                   lo: int = 6, hi: int = 24) -> int:
    """Bits per SRP band so expected bucket occupancy stays ~constant
    (``n_rows / 2**nbits ~= target_occupancy``) as the corpus grows.

    A FIXED nbits makes candidate pairs quadratic in corpus size: each
    band key has 2^nbits values regardless of N, so occupancy grows
    linearly and intra-bucket pairs quadratically — measured 14x
    super-linear for 10x data at nbits=6, with the skew cap silently
    truncating uniform buckets (recall loss).  Deriving nbits from N
    keeps per-row pair work constant: 100x more rows -> ~6.6 more bits,
    same occupancy.  Deterministic in N, so the DuckDB oracle twin
    computes the identical value from the same row count."""
    import math
    if n_rows <= 0:
        return lo
    raw = math.ceil(math.log2(max(n_rows / float(target_occupancy), 1.0)))
    return max(lo, min(hi, raw))


def embedding_dup_pairs(df: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        threshold: float = 0.9,
                        dim: int = 64, nbits: int | None = None,
                        bands: int = 8,
                        max_bucket: int = 200,
                        seed: int = 0x5EED,
                        n_rows: int | None = None) -> DataFrame:
    """Near-duplicate pairs by cosine similarity, SRP-LSH blocked.

    Candidates are single-pass intra-bucket combinations on (band,
    signature-key) — the same linear-ish _bucket_pairs shape as MinHash
    LSH — then exact cosine verifies each candidate.  Buckets reflect actual vector
    geometry (sign patterns of random projections), unlike blocking on a
    metadata label, which degrades to a per-class quadratic join and has
    recall only by luck.

    ``nbits=None`` (default) derives the band-key granularity from the
    corpus size via :func:`adaptive_nbits`, keeping expected bucket
    occupancy constant (~32) as the corpus scales — a fixed nbits makes
    candidate pairs quadratic in N (see adaptive_nbits).  ``n_rows``
    supplies the count when the caller already knows it (skipping the
    count job — on a bare parquet scan Spark answers it from footer
    metadata anyway); ``max_bucket`` remains as a SKEW-ONLY guard that
    should not bind on uniform data at the target occupancy.

    Cost shape: the bucket shuffle carries only (id, band, key) — no
    vectors; candidate pairs are DEDUPLICATED across bands *before* any
    cosine is computed (a pair sharing all 8 bands previously paid 8
    interpreted cosines); vectors are then fetched by two id-equality
    joins and the verify cosine is one codegen'd dot per unique pair."""
    if nbits is None:
        n = n_rows if n_rows is not None else df.count()
        nbits = adaptive_nbits(n)
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("v"))
    keyed = base.select(
        "id", srp_band_keys(F.col("v"), dim, nbits, bands, seed).alias("ks"))
    buckets = (keyed.select("id", F.posexplode("ks").alias("band", "h")))
    cand = (_bucket_pairs(buckets, max_bucket)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")))
    # verify cosine stays JVM-side AND whole-stage-codegen'd: the
    # vectors convert to dim-field STRUCTS on the per-VECTOR branch
    # scans (64 element_at casts each, done once per vector), so the
    # per-PAIR dot is a flat chain of GetStructField products — ~470
    # bytecodes, fully JIT-able.  Measured alternatives: an Arrow-UDF
    # cosine paid ~1 KB/pair x 2 evaluations (the threshold filter
    # duplicated the ArrowEvalPython) — 5.4 Python-worker-minutes for
    # 2M sf1 candidates and the source of 12-146s swings; the round-7
    # zip_with+aggregate fold is correct but runs on Catalyst's
    # INTERPRETED higher-order path (~1.5-3s over 272k sf0.1 pairs —
    # the dominant verify cost); a per-pair element_at unroll exceeds
    # HotSpot's 8000-bytecode JIT limit (element_at bounds checks are
    # ~10x a struct field read).  Norms ride the branches as folds (one
    # per vector); the product chain is left-to-right, the same IEEE
    # order as DuckDB's list_dot_product, so the oracle stays bitwise.
    from .similarity import norm_fold_sql
    sfields = ", ".join(
        f"'f{d}', CAST(element_at(v, {d + 1}) AS DOUBLE)"
        for d in range(dim))
    svec = F.expr(f"named_struct({sfields})")
    # norms stay as the zip_with+aggregate FOLD, computed once per
    # VECTOR on the 20k-row branches: a higher-order function is
    # CodegenFallback, which keeps the huge named_struct projection
    # OUT of the fused whole-stage-codegen method of the probe-side
    # join — a struct-field norm chain here inlined (via
    # SimplifyExtractValueOps) into one 16,679-bytecode WSCG method,
    # silently interpreted (8-10 s sf1 runs); with the fold isolation
    # the per-pair dot method is 471 bytecodes, fully JIT'd
    # (measured sf1 3.5 s stable / sf0.1 1.2-1.5 s vs the round-7
    # all-fold form's 3.4-90 s erratic range)
    va = base.select(F.col("id").alias("id_a"), svec.alias("sa"),
                     F.expr(norm_fold_sql("v")).alias("na"))
    vb = base.select(F.col("id").alias("id_b"), svec.alias("sb"),
                     F.expr(norm_fold_sql("v")).alias("nb"))
    pairs = cand.join(va, "id_a").join(vb, "id_b")
    dot = " + ".join(f"sa.f{d} * sb.f{d}" for d in range(dim))
    cos = F.expr(f"round(({dot}) / (na * nb), 6)")
    # NO pushdown barrier (unlike the round-7 fold form, whose
    # element_at(shuffle(array(x)), 1) barrier was CodegenFallback
    # and demoted the whole verify projection to interpreted eval):
    # the filter substituting a ~470-bytecode JIT'd chain into its
    # predicate and evaluating it twice is far cheaper than one
    # interpreted pass.
    # distinct() AFTER the threshold filter: pairs sharing several
    # bands (<1% here) re-verify redundantly — cheap — while the old
    # pre-join distinct hash-aggregated ALL candidate pairs (the
    # second-largest stage of the query).
    return (pairs.select("id_a", "id_b", cos.alias("cosine"))
                 .filter(F.col("cosine") >= threshold)
                 .distinct())


# ---- SQL twins (DuckDB oracle) -------------------------------------------

from .text import TOKENS_SQL

SHINGLES_SQL = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len({toks}) - {nm1}, 0)), "
    "i -> array_to_string(list_slice({toks}, i, i + {nm1}), ' ')))"
)


def _shingles_sql(text_col: str, n: int) -> str:
    toks = TOKENS_SQL.format(c=text_col)
    return SHINGLES_SQL.format(toks=toks, nm1=n - 1)


def dedup_exact_sql(table="documents", text_col="text", id_col="doc_id"):
    return f"""
SELECT min({id_col}) AS keep_id, count(*)::BIGINT AS n_copies
FROM {table}
GROUP BY regexp_replace(trim(lower({text_col})), '\\s+', ' ', 'g')"""


def minhash_lsh_pairs_sql(table="documents", text_col="text",
                          id_col="doc_id", num_hashes=12, bands=4,
                          shingle_n=3, max_bucket=50):
    r = num_hashes // bands
    toks = TOKENS_SQL.format(c=text_col)
    sh = _shingles_sql(text_col, shingle_n)
    sig_cols = ",\n    ".join(
        f"min((h * {a} + {b}) % {_MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(_minhash_coeffs(num_hashes)))
    band_cols = ",\n    ".join(
        "md5(concat_ws('|', "
        + ", ".join(f"m{i}::VARCHAR" for i in range(b * r, (b + 1) * r))
        + f")) AS band{b}"
        for b in range(bands))
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {sh} AS sh
  FROM {table}
  WHERE len({toks}) >= {shingle_n}
), ex AS (
  SELECT id, CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS h
  FROM (SELECT id, unnest(sh) AS s FROM base)
), sig AS (
  SELECT id,
    {sig_cols}
  FROM ex GROUP BY id
), bnd AS (
  SELECT id,
    {band_cols}
  FROM sig
), buckets_all AS (
  {" UNION ALL ".join(f"SELECT id, {b} AS band, band{b} AS h FROM bnd" for b in range(bands))}
), buckets AS (
  SELECT id, band, h FROM (
    SELECT id, band, h,
           row_number() OVER (PARTITION BY band, h ORDER BY id) AS rn
    FROM buckets_all) WHERE rn <= {max_bucket}
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM buckets a JOIN buckets b
  ON a.band = b.band AND a.h = b.h AND a.id < b.id"""


def minhash_similarity_sql(table="documents", text_col="text",
                           id_col="doc_id", num_hashes=12, bands=4,
                           shingle_n=3, max_bucket=50):
    """DuckDB twin of :func:`minhash_similarity` — the pair CTE is the
    lsh-pairs query verbatim; est_jaccard joins the signature table
    back and counts agreeing components."""
    inner = minhash_lsh_pairs_sql(table, text_col, id_col, num_hashes,
                                  bands, shingle_n, max_bucket)
    # CTE-prefix reuse by split: guard the assumptions (exactly one
    # final SELECT DISTINCT; the sig CTE this query joins back) so a
    # rewording of the inner builder fails loudly instead of emitting
    # silently-wrong SQL.  Explicit raise, not assert — asserts vanish
    # under ``python -O`` and this guard must survive.
    if inner.count("SELECT DISTINCT") != 1:
        raise ValueError(
            "minhash_lsh_pairs_sql changed shape (expected exactly one "
            "SELECT DISTINCT): " + inner)
    if "sig AS" not in inner:
        raise ValueError(
            "minhash_lsh_pairs_sql changed shape (sig CTE missing): "
            + inner)
    head, final = inner.rsplit("SELECT DISTINCT", 1)
    matches = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes))
    return (head
            + f""", pairs AS (
  SELECT DISTINCT{final}
)
SELECT p.id_a, p.id_b,
       round(({matches}) / {float(num_hashes)!r}, 6) AS est_jaccard
FROM pairs p
JOIN sig sa ON sa.id = p.id_a
JOIN sig sb ON sb.id = p.id_b""")


def simhash_sql(table="documents", text_col="text", id_col="doc_id",
                bits=_SIMHASH_BITS):
    toks = TOKENS_SQL.format(c=text_col)
    sums = ",\n    ".join(
        f"sum(CASE WHEN (v >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(bits))
    fp = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(bits))
    return f"""
WITH ex AS (
  SELECT {id_col} AS id,
         CAST(('0x' || substr(md5(tok), 1, {(bits + 3) // 4})) AS BIGINT)
           AS v
  FROM (SELECT {id_col}, unnest({toks}) AS tok FROM {table})
), per_doc AS (
  SELECT id,
    {sums}
  FROM ex GROUP BY id
)
SELECT id, CAST({fp} AS BIGINT) AS simhash FROM per_doc"""


def simhash_pairs_sql(table="documents", text_col="text", id_col="doc_id",
                      max_hamming=3, bits=_SIMHASH_BITS, max_bucket=200):
    inner = simhash_sql(table, text_col, id_col, bits)
    nb = max_hamming + 1
    w = bits // nb
    mask = (1 << w) - 1
    bands_union = " UNION ALL ".join(
        f"SELECT id, simhash, {b} AS band, "
        f"(simhash >> {b * w}) & {mask} AS h FROM sh"
        for b in range(nb))
    return f"""
WITH sh AS ({inner}),
buckets_all AS (
  {bands_union}
), buckets AS (
  SELECT id, simhash, band, h FROM (
    SELECT id, simhash, band, h,
           row_number() OVER (PARTITION BY band, h ORDER BY id) AS rn
    FROM buckets_all) WHERE rn <= {max_bucket}
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM buckets a JOIN buckets b
  ON a.band = b.band AND a.h = b.h AND a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


def ngram_jaccard_pairs_sql(table="documents", text_col="text",
                            id_col="doc_id", n=3, threshold=0.5,
                            max_bucket=50):
    toks = TOKENS_SQL.format(c=text_col)
    sh = _shingles_sql(text_col, n)
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {sh} AS sh FROM {table}
  WHERE len({toks}) >= {n}
), inv_all AS (
  SELECT id, unnest(sh) AS s FROM base
), inv AS (
  SELECT id, s FROM (
    SELECT id, s, count(*) OVER (PARTITION BY s) AS df_s FROM inv_all
  ) WHERE df_s <= {max_bucket}
), sizes AS (
  SELECT id, count(*) AS sz FROM inv GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
  GROUP BY a.id, b.id
), j AS (
  SELECT i.id_a, i.id_b,
         round(CAST(i.inter AS DOUBLE)
           / (CAST(sa.sz + sb.sz AS DOUBLE) - CAST(i.inter AS DOUBLE)), 6)
           AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.id = i.id_a
  JOIN sizes sb ON sb.id = i.id_b
)
SELECT * FROM j WHERE jaccard >= {threshold}"""


def _winnow_kg_ctes(prefix: str, source: str, text_col: str,
                    id_col: str, k: int) -> str:
    """Shared tokenize -> ordered k-gram -> 32-bit-hash CTE chain
    ending in ``{prefix}kg(id, pos, h)`` — the SQL twin of
    :func:`_winnow_kgram_hashes`."""
    toks = TOKENS_SQL.format(c=text_col)
    return f"""{prefix}base AS (
  SELECT {id_col} AS id, {toks} AS t FROM {source}
  WHERE len({toks}) >= {k}
), {prefix}kg AS (
  SELECT id, i AS pos,
         CAST(('0x' || substr(md5(array_to_string(
             list_slice(t, i + 1, i + {k}), ' ')), 1, 8)) AS BIGINT) AS h
  FROM (SELECT id, t, unnest(generate_series(0, len(t) - {k})) AS i
        FROM {prefix}base)
)"""


def _winnow_fp_ctes(prefix: str, source: str, text_col: str,
                    id_col: str, k: int, w: int) -> str:
    """The tokenize -> k-gram hash -> window-min -> fingerprint CTE
    chain (ending in ``{prefix}fp(id, h)``), shared by the pairs and
    decontaminate twins so the fingerprint definition cannot drift
    between them.  ``source`` is a table name or parenthesized
    subquery."""
    kg = _winnow_kg_ctes(prefix, source, text_col, id_col, k)
    return f"""{kg}, {prefix}win AS (
  SELECT id, pos,
         min(h) OVER (PARTITION BY id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW
                      AND {w - 1} FOLLOWING) AS wmin,
         count(*) OVER (PARTITION BY id) AS cnt
  FROM {prefix}kg
), {prefix}fp AS (
  SELECT DISTINCT id, wmin AS h FROM {prefix}win
  WHERE pos <= cnt - {w} OR (cnt < {w} AND pos = 0)
)"""


def _winnow_fp_pos_ctes(prefix: str, source: str, text_col: str,
                        id_col: str, k: int, w: int) -> str:
    """Position-carrying fingerprint CTE chain ending in
    ``{prefix}fpp(id, h, kpos)`` — the SQL twin of
    :func:`winnow_fingerprints_pos` (min over struct(h, pos) gives the
    identical smallest-position tie-break)."""
    kg = _winnow_kg_ctes(prefix, source, text_col, id_col, k)
    return f"""{kg}, {prefix}win AS (
  SELECT id, pos,
         min({{'h': h, 'p': pos}}) OVER (PARTITION BY id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW
                      AND {w - 1} FOLLOWING) AS m,
         count(*) OVER (PARTITION BY id) AS cnt
  FROM {prefix}kg
), {prefix}fpp AS (
  SELECT DISTINCT id, struct_extract(m, 'h') AS h,
         CAST(struct_extract(m, 'p') AS BIGINT) AS kpos
  FROM {prefix}win
  WHERE pos <= cnt - {w} OR (cnt < {w} AND pos = 0)
)"""


def winnow_match_spans_sql(table="documents", ref_source=None,
                           text_col="text", id_col="doc_id",
                           k=4, w=5):
    """DuckDB twin of :func:`winnow_match_spans` — identical
    position-carrying fingerprints and the same gap-and-islands merge,
    so spans compare exactly."""
    cfpp = _winnow_fp_pos_ctes("c_", table, text_col, id_col, k, w)
    rfp = _winnow_fp_ctes("r_", ref_source or table, text_col,
                          id_col, k, w)
    return f"""
WITH {cfpp}, {rfp}, hit AS (
  SELECT DISTINCT c.id, c.kpos
  FROM c_fpp c JOIN (SELECT DISTINCT h FROM r_fp) r USING (h)
), iv AS (
  SELECT id, kpos AS s, kpos + {k - 1} AS e,
         max(kpos + {k - 1}) OVER (
           PARTITION BY id ORDER BY kpos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
  FROM hit
), fl AS (
  SELECT id, s, e,
         CASE WHEN pe IS NULL OR s > pe + 1 THEN 1 ELSE 0 END AS nw
  FROM iv
), isl AS (
  SELECT id, s, e,
         sum(nw) OVER (PARTITION BY id ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM fl
)
SELECT id, min(s)::BIGINT AS match_start, max(e)::BIGINT AS match_end,
       count(*)::BIGINT AS n_fp
FROM isl GROUP BY id, g"""


def winnow_pairs_sql(table="documents", text_col="text",
                     id_col="doc_id", k=4, w=5, min_shared=2,
                     max_bucket=50):
    """DuckDB twin of :func:`winnow_pairs` — identical k-gram slices,
    md5-prefix hashes, window-min selection, stop-fingerprint filter,
    and containment arithmetic, so the comparison is exact."""
    fp = _winnow_fp_ctes("", table, text_col, id_col, k, w)
    return f"""
WITH {fp}, inv AS (
  SELECT id, h FROM (
    SELECT id, h, count(*) OVER (PARTITION BY h) AS df_h FROM fp
  ) WHERE df_h <= {max_bucket}
), sizes AS (
  SELECT id, count(*) AS sz FROM inv GROUP BY id
), shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS n_shared
  FROM inv a JOIN inv b ON a.h = b.h AND a.id < b.id
  GROUP BY a.id, b.id
  HAVING count(*) >= {min_shared}
)
SELECT s.id_a, s.id_b, s.n_shared,
       round(CAST(s.n_shared AS DOUBLE)
             / CAST(least(sa.sz, sb.sz) AS DOUBLE), 6) AS containment
FROM shared s
JOIN sizes sa ON sa.id = s.id_a
JOIN sizes sb ON sb.id = s.id_b"""


def winnow_decontaminate_sql(table="documents", ref_source=None,
                             text_col="text", id_col="doc_id",
                             k=4, w=5, min_shared=1, mode="flag"):
    """DuckDB twin of :func:`winnow_decontaminate`.  ``ref_source`` is
    a table name or parenthesized subquery selecting the reference
    documents (same columns); both sides reuse the shared fingerprint
    CTE chain so corpus and reference hash identically."""
    if mode not in ("drop", "flag"):
        raise ValueError(f"winnow_decontaminate mode={mode!r}")
    cfp = _winnow_fp_ctes("c_", table, text_col, id_col, k, w)
    rfp = _winnow_fp_ctes("r_", ref_source or table, text_col,
                          id_col, k, w)
    hits = f"""hits AS (
  SELECT c.id, count(*)::BIGINT AS n_hits
  FROM c_fp c JOIN (SELECT DISTINCT h FROM r_fp) r USING (h)
  GROUP BY c.id
  HAVING count(*) >= {min_shared}
)"""
    if mode == "flag":
        return f"""
WITH {cfp}, {rfp}, {hits}
SELECT d.*, COALESCE(hits.n_hits, 0) AS n_hits,
       COALESCE(hits.n_hits, 0) >= {min_shared} AS contaminated
FROM {table} d LEFT JOIN hits ON hits.id = d.{id_col}"""
    return f"""
WITH {cfp}, {rfp}, {hits}
SELECT d.* FROM {table} d ANTI JOIN hits ON hits.id = d.{id_col}"""


def embedding_dup_pairs_sql(table="embeddings", vec_col="embedding",
                            id_col="vec_id", threshold=0.9,
                            dim=64, nbits=None, bands=8, max_bucket=200,
                            seed=0x5EED, n_rows=None):
    """DuckDB twin of :func:`embedding_dup_pairs`.  ``nbits=None``
    mirrors the Spark side's corpus-adaptive granularity: pass the same
    row count via ``n_rows`` and the identical ``adaptive_nbits`` value
    is baked into the generated SQL, keeping the two bitwise-locked."""
    if nbits is None:
        nbits = adaptive_nbits(n_rows if n_rows is not None else 0)
    signs = _srp_signs(bands * nbits, dim, seed)

    def band_key(b):
        bits = []
        for i in range(nbits):
            row = signs[b * nbits + i]
            dot = " + ".join(
                f"v[{d + 1}] * {float(s)!r}" for d, s in enumerate(row))
            bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {2 ** i} ELSE 0 END)")
        return " + ".join(bits)

    bands_union = " UNION ALL ".join(
        f"SELECT id, v, {b} AS band, CAST({band_key(b)} AS BIGINT) AS h "
        "FROM base"
        for b in range(bands))
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v FROM {table}
), buckets_all AS (
  {bands_union}
), buckets AS (
  SELECT id, v, band, h FROM (
    SELECT id, v, band, h,
           row_number() OVER (PARTITION BY band, h ORDER BY id) AS rn
    FROM buckets_all) WHERE rn <= {max_bucket}
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       round(list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v))
            * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM buckets a JOIN buckets b
  ON a.band = b.band AND a.h = b.h AND a.id < b.id
WHERE round(list_dot_product(a.v, b.v)
       / (sqrt(list_dot_product(a.v, a.v))
          * sqrt(list_dot_product(b.v, b.v))), 6) >= {threshold}"""


def chunk_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", chunk_tokens: int = 10) -> DataFrame:
    """Sub-document (chunk-level) exact dedup with reassembly: split
    every document into fixed ``chunk_tokens``-token chunks, keep each
    distinct chunk only at its FIRST corpus occurrence (lowest
    (doc_id, chunk_id)), and stitch the surviving chunks back into a
    cleaned document — the line/paragraph-dedup pass of C4/RefinedWeb
    pipelines, expressed at chunk granularity because the synthetic
    corpus is single-line.

    Emits (doc_id, clean_text, n_chunks_kept, n_chunks_total); documents
    whose every chunk was seen earlier drop out entirely.

    Scale shape: one scan; chunking is a pure projection
    (transform+slice over the token array, no shuffle); global
    keep-first is ONE hash exchange on the chunk text (row_number inside
    each chunk partition — no global sort); reassembly is one hash
    aggregate on doc_id with a sorted in-group collect.  Both shuffles
    partial-aggregate map-side; nothing is quadratic in corpus size.
    """
    k = int(chunk_tokens)
    if k < 1:
        raise ValueError("chunk_tokens must be >= 1")
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    nch = F.floor((F.size(t) + F.lit(k - 1)) / F.lit(k)).cast("int")
    base = df.select(F.col(id_col).alias("id"), t.alias("t"),
                     F.greatest(nch, F.lit(1)).alias("n_chunks"))
    chunks = base.select(
        "id", "n_chunks",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.col("n_chunks") - 1),
            lambda i: F.array_join(
                F.slice(F.col("t"), i * k + 1, k), " "))
         ).alias("chunk_id", "chunk"))
    w = Window.partitionBy("chunk").orderBy("id", "chunk_id")
    kept = (chunks.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("chunk_id", "chunk"))),
        lambda s: s["chunk"])
    return (kept.groupBy(F.col("id").alias(id_col))
            .agg(F.array_join(ordered, " ").alias("clean_text"),
                 F.count("*").cast("long").alias("n_chunks_kept"),
                 F.max("n_chunks").cast("long").alias("n_chunks_total")))


def chunk_dedup_sql(table="documents", text_col="text", id_col="doc_id",
                    chunk_tokens: int = 10) -> str:
    k = int(chunk_tokens)
    return f"""
WITH base AS (
  SELECT {id_col} AS id,
         str_split_regex(trim({text_col}), '\\s+') AS t
  FROM {table}
), sized AS (
  SELECT id, t, greatest((len(t) + {k - 1}) // {k}, 1) AS n_chunks
  FROM base
), chunks AS (
  SELECT id, n_chunks,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_id,
         unnest(list_transform(generate_series(0, n_chunks - 1),
                i -> array_to_string(t[i * {k} + 1 : i * {k} + {k}], ' ')))
           AS chunk
  FROM sized
), kept AS (
  SELECT * FROM (
    SELECT id, n_chunks, chunk_id, chunk,
           row_number() OVER (PARTITION BY chunk
                              ORDER BY id, chunk_id) AS rn
    FROM chunks)
  WHERE rn = 1
)
SELECT id AS {id_col},
       string_agg(chunk, ' ' ORDER BY chunk_id) AS clean_text,
       count(*)::BIGINT AS n_chunks_kept,
       max(n_chunks)::BIGINT AS n_chunks_total
FROM kept GROUP BY id"""
