"""Scale ops vs DuckDB oracles at sf0.001 (dedup / similarity / text).
The full sf0.01 battery runs via scripts/selfcheck.py; these are the
fast in-suite versions."""

import os

import duckdb
import pytest

from conftest import SF_DIR

DOC = os.path.join(SF_DIR, "documents.parquet")
EMB = os.path.join(SF_DIR, "embeddings.parquet")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOC}')")
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{EMB}')")
    return c


def assert_matches(df, con, sql):
    got_cols = sorted(df.columns)
    got = sorted(tuple(r[c] for c in got_cols) for r in
                 (row.asDict() for row in df.collect()))
    rel = con.execute(sql)
    cols = [d[0] for d in rel.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    want = sorted(tuple(r[i] for i in order) for r in rel.fetchall())
    assert sorted(cols) == got_cols
    assert got == want


class TestText:
    def test_token_count(self, spark, con):
        from tuplex_spark.functions import text
        df = text.token_count(spark.read.parquet(DOC))
        assert_matches(df, con, text.token_count_sql())

    def test_quality(self, spark, con):
        from tuplex_spark.functions import text
        df = text.quality_score(spark.read.parquet(DOC))
        assert_matches(df, con, text.quality_score_sql())

    def test_langid(self, spark, con):
        from tuplex_spark.functions import text
        df = text.language_id(spark.read.parquet(DOC))
        assert_matches(df, con, text.language_id_sql())

    def test_fingerprint(self, spark, con):
        from tuplex_spark.functions import text
        df = text.doc_fingerprint(spark.read.parquet(DOC))
        assert_matches(df, con, text.doc_fingerprint_sql())

    def test_langid_ngram(self, spark, con):
        from tuplex_spark.functions import text
        df = text.language_id_ngram(spark.read.parquet(DOC))
        assert_matches(df, con, text.language_id_ngram_sql())
        # plausibility on hand-built unambiguous sentences
        rows = [
            (1, "the cat is on the mat and it is warm"),
            (2, "der Hund ist nicht in das Haus und er ist nass"),
            (3, "el perro es de la casa y los gatos son que"),
            (4, "le chien est dans les maisons et il est pour que"),
            (5, "12345 67890 ,,,, !!!"),
        ]
        df2 = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r.detected_lang
               for r in text.language_id_ngram(df2).collect()}
        assert got[1] == "en" and got[2] == "de" and got[3] == "es" \
            and got[4] == "fr" and got[5] == "unknown", got

    def test_langid_ngram_is_joinless_scan(self, spark):
        from tuplex_spark.functions import text
        plan = text.language_id_ngram(spark.read.parquet(DOC)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Join" not in plan


class TestDedup:
    def test_exact(self, spark, con):
        from tuplex_spark.functions import dedup
        df = dedup.dedup_exact(spark.read.parquet(DOC))
        assert_matches(df, con, dedup.dedup_exact_sql())

    def test_minhash(self, spark, con):
        from tuplex_spark.functions import dedup
        df = dedup.minhash_lsh_pairs(spark.read.parquet(DOC))
        assert_matches(df, con, dedup.minhash_lsh_pairs_sql())

    def test_simhash(self, spark, con):
        from tuplex_spark.functions import dedup
        df = dedup.simhash_pairs(spark.read.parquet(DOC))
        assert_matches(df, con, dedup.simhash_pairs_sql())

    def test_winnow(self, spark, con):
        from tuplex_spark.functions import dedup
        df = dedup.winnow_pairs(spark.read.parquet(DOC),
                                k=3, w=4, min_shared=2)
        assert_matches(df, con,
                       dedup.winnow_pairs_sql(k=3, w=4, min_shared=2))

    def test_winnow_guarantee_and_density(self, spark):
        # the winnowing guarantee: a shared run of >= w+k-1 tokens must
        # yield >= 1 shared fingerprint, regardless of surrounding text
        from tuplex_spark.functions import dedup
        k, w = 3, 4
        passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 toks
        rows = [
            (1, "intro words here " + passage + " closing remarks now"),
            (2, "completely different opening text " + passage),
            (3, "unrelated document about ships and harbors and tides "
                "with no overlap at all in any window"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        fp = {i: {r.h for r in g} for i, g in
              ((i, dedup.winnow_fingerprints(df, k=k, w=w)
                .where(f"id = {i}").collect()) for i in (1, 2, 3))}
        assert fp[1] & fp[2], "shared 8-token passage must share a print"
        assert not (fp[1] & fp[3]) and not (fp[2] & fp[3])
        # density: winnowing selects ~2/(w+1) of k-grams, never more
        # than 1 per window start; doc 3 has 20 tokens -> 18 k-grams,
        # 15 full windows -> fingerprints within [1, 15]
        assert 1 <= len(fp[3]) <= 15

    def test_winnow_decontaminate(self, spark, con):
        from pyspark.sql import functions as F
        from tuplex_spark.functions import dedup
        docs = spark.read.parquet(DOC)
        ref = docs.filter(F.col("doc_id") % 17 == 0)
        df = dedup.winnow_decontaminate(
            docs, ref, k=3, w=4, min_shared=2, mode="flag"
        ).select("doc_id", "n_hits", "contaminated")
        assert_matches(df, con, (
            "SELECT doc_id, n_hits, contaminated FROM ("
            + dedup.winnow_decontaminate_sql(
                ref_source="(SELECT * FROM documents "
                           "WHERE doc_id % 17 = 0)",
                k=3, w=4, min_shared=2, mode="flag") + ")"))
        # drop mode == flag-false set, and ref docs flag themselves
        dropped = dedup.winnow_decontaminate(
            docs, ref, k=3, w=4, min_shared=2, mode="drop")
        flagged = {r.doc_id for r in df.where("contaminated").collect()}
        kept = {r.doc_id for r in dropped.select("doc_id").collect()}
        all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
        assert kept == all_ids - flagged
        ref_ids = {r.doc_id for r in ref.select("doc_id").collect()}
        assert ref_ids <= flagged

    def test_winnow_match_spans_oracle(self, spark, con):
        from pyspark.sql import functions as F
        from tuplex_spark.functions import dedup
        docs = spark.read.parquet(DOC)
        ref = docs.filter(F.col("doc_id") % 17 == 0)
        df = dedup.winnow_match_spans(docs, ref, k=3, w=4)
        assert_matches(df, con, dedup.winnow_match_spans_sql(
            ref_source="(SELECT * FROM documents WHERE doc_id % 17 = 0)",
            k=3, w=4))

    def test_winnow_match_spans_locates_lifted_passage(self, spark):
        # a passage lifted from a reference doc must produce a span
        # that covers the lifted region and nothing near the clean tail
        from tuplex_spark.functions import dedup
        k, w = 3, 4
        passage = "alpha beta gamma delta epsilon zeta eta theta"  # toks 3..10
        corpus = spark.createDataFrame(
            [(1, "intro words here " + passage
              + " fully unrelated closing remarks about tides and ships")],
            "doc_id long, text string")
        ref = spark.createDataFrame([(99, passage)],
                                    "doc_id long, text string")
        spans = dedup.winnow_match_spans(corpus, ref, k=k, w=w).collect()
        assert len(spans) >= 1
        # every span lies inside (or overlaps) the lifted region and the
        # union covers at least one full k-gram of it
        for r in spans:
            assert r.match_start >= 3 - (k - 1)
            assert r.match_end <= 10 + (k - 1)
        assert any(r.match_end - r.match_start + 1 >= k for r in spans)
        # self-match: every selected fingerprint hits, so the merged
        # span lies inside the doc and covers >= one full k-gram (the
        # span starts at the first SELECTED k-gram, not token 0 —
        # winnowing only keeps ~2/(w+1) of positions)
        self_spans = dedup.winnow_match_spans(ref, ref, k=k, w=w).collect()
        assert len(self_spans) >= 1
        for s in self_spans:
            assert 0 <= s.match_start <= s.match_end <= 7  # 8 tokens
        assert any(s.match_end - s.match_start + 1 >= k
                   for s in self_spans)

    def test_winnow_redact_oracle(self, spark, con):
        from pyspark.sql import functions as F
        from tuplex_spark.functions import dedup
        docs = spark.read.parquet(DOC)
        ref = docs.filter(F.col("doc_id") % 17 == 0)
        df = dedup.winnow_redact(docs, ref, k=3, w=4)
        assert_matches(df, con, dedup.winnow_redact_sql(
            ref_source="(SELECT * FROM documents WHERE doc_id % 17 = 0)",
            k=3, w=4))

    def test_winnow_redact_semantics(self, spark):
        from tuplex_spark.functions import dedup
        passage = "alpha beta gamma delta epsilon zeta eta theta"
        corpus = spark.createDataFrame(
            [(1, "intro words here " + passage
              + " fully unrelated closing remarks"),
             (2, "totally clean document about ships and tides")],
            "doc_id long, text string")
        ref = spark.createDataFrame([(99, passage)],
                                    "doc_id long, text string")
        out = {r["id"]: (r["redacted_text"], r["n_spans"])
               for r in dedup.winnow_redact(corpus, ref,
                                            k=3, w=4).collect()}
        # clean doc passes through byte-identical with n_spans=0
        assert out[2] == ("totally clean document about ships and tides",
                          0)
        # contaminated doc: span collapses to ONE mask token, the
        # surrounding clean text survives, and no span token leaks
        text, n = out[1]
        assert n >= 1 and text.count("[REDACTED]") == n
        assert text.startswith("intro words here")
        assert text.endswith("fully unrelated closing remarks")
        assert "gamma" not in text and "epsilon" not in text

    def test_winnow_redact_null_and_empty_docs_survive(self, spark, con):
        # ADVICE r10: NULL-text / zero-token docs must pass through
        # with redacted_text='' and n_spans=0 instead of vanishing
        # (posexplode of an empty array emits no rows) — both engines
        from tuplex_spark.functions import dedup
        corpus = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon"),
             (2, None), (3, ""), (4, "   ")],
            "doc_id long, text string")
        ref = spark.createDataFrame([(99, "alpha beta gamma delta")],
                                    "doc_id long, text string")
        out = {r["id"]: (r["redacted_text"], r["n_spans"])
               for r in dedup.winnow_redact(corpus, ref,
                                            k=3, w=4).collect()}
        assert set(out) == {1, 2, 3, 4}
        for empty_id in (2, 3, 4):
            assert out[empty_id] == ("", 0)
        assert out[1][1] >= 1
        # oracle twin agrees on the survived rows
        con.execute("CREATE OR REPLACE VIEW __wr_corpus AS SELECT * FROM "
                    "(VALUES (1, 'alpha beta gamma delta epsilon'),"
                    " (2, NULL), (3, ''), (4, '   '))"
                    " t(doc_id, text)")
        got = con.execute(dedup.winnow_redact_sql(
            table="__wr_corpus",
            ref_source="(SELECT 99 AS doc_id,"
                       " 'alpha beta gamma delta' AS text)",
            k=3, w=4)).fetchall()
        assert {r[0]: (r[1], r[2]) for r in got} == out

    def test_winnow_fingerprints_pos_consistent_with_plain(self, spark):
        # dropping the position column reproduces winnow_fingerprints
        from tuplex_spark.functions import dedup
        docs = spark.read.parquet(DOC).limit(50)
        plain = {(r.id, r.h) for r in
                 dedup.winnow_fingerprints(docs, k=3, w=4).collect()}
        pos = dedup.winnow_fingerprints_pos(docs, k=3, w=4).collect()
        assert {(r.id, r.h) for r in pos} == plain
        # positions are valid k-gram starts
        assert all(r.kpos >= 0 for r in pos)

    def test_winnow_short_doc_gets_fingerprint(self, spark):
        # docs with >= k tokens but < w k-grams keep their global min
        from tuplex_spark.functions import dedup
        df = spark.createDataFrame([(1, "just three tokens"),
                                    (2, "ab")],
                                   "doc_id long, text string")
        got = dedup.winnow_fingerprints(df, k=3, w=4).collect()
        assert len(got) == 1 and got[0].id == 1

    def test_substring_spans_oracle(self, spark, con):
        from tuplex_spark.functions import dedup
        df = dedup.substring_dup_spans(spark.read.parquet(DOC),
                                       min_len=8)
        assert_matches(df, con,
                       dedup.substring_dup_spans_sql(min_len=8))

    def test_substring_dedup_oracle(self, spark, con):
        from tuplex_spark.functions import dedup
        df = dedup.substring_dedup(spark.read.parquet(DOC), min_len=8)
        assert_matches(df, con, dedup.substring_dedup_sql(min_len=8))

    def test_substring_semantics(self, spark):
        # Lee et al. ExactSubstr semantics on a known corpus: a shared
        # 6-token passage across two docs is found exactly (and only
        # it), self-repetition within ONE doc counts, and a clean doc
        # produces no spans
        from tuplex_spark.functions import dedup
        shared = "one two three four five six"        # tokens 0-5
        rows = [
            (1, shared + " tail a b c"),
            (2, "lead x y " + shared),                # passage at 3-8
            (3, "clean words with no duplication at all here ok"),
            # internal repetition: the 6-gram at 0 equals the one at 6
            (4, shared + " " + shared),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        spans = {(r.id, r.dup_start, r.dup_end)
                 for r in dedup.substring_dup_spans(
                     df, min_len=6).collect()}
        assert (1, 0, 5) in spans
        assert (2, 3, 8) in spans
        assert not any(i == 3 for i, *_ in spans)
        # doc 4: gram starts 0..6 ALL duplicated (each 6-gram of the
        # repeated text occurs twice in-doc) -> one merged span 0-11
        assert (4, 0, 11) in spans
        cut = {r.id: (r.deduped_text, r.n_spans, r.n_removed)
               for r in dedup.substring_dedup(df, min_len=6).collect()}
        assert cut[1] == ("tail a b c", 1, 6)
        assert cut[2] == ("lead x y", 1, 6)
        assert cut[3][1] == 0 and cut[3][2] == 0
        assert cut[4] == ("", 1, 12)

    def test_substring_short_and_null_docs_survive(self, spark):
        from tuplex_spark.functions import dedup
        df = spark.createDataFrame(
            [(1, "tiny"), (2, None), (3, "")],
            "doc_id long, text string")
        got = {r.id: (r.deduped_text, r.n_spans)
               for r in dedup.substring_dedup(df, min_len=6).collect()}
        assert got[1] == ("tiny", 0)
        assert got[2][1] == 0 and got[3][1] == 0

    def test_embedding_adaptive_matches_oracle(self, spark, con):
        # the adaptive-nbits path must stay bitwise-locked to the SQL
        # twin when both derive nbits from the same row count
        import pyarrow.parquet as pq
        from tuplex_spark.functions import dedup
        n = pq.ParquetFile(EMB).metadata.num_rows
        df = dedup.embedding_dup_pairs(spark.read.parquet(EMB),
                                       threshold=0.45, n_rows=n)
        assert_matches(df, con,
                       dedup.embedding_dup_pairs_sql(threshold=0.45,
                                                     n_rows=n))

    def test_adaptive_nbits_keeps_occupancy_bounded(self):
        # fixed nbits made candidates quadratic: at 20k vectors the old
        # nbits=6 meant ~312 rows/bucket — above the max_bucket=200 skew
        # guard, i.e. silent recall loss on UNIFORM data.  The adaptive
        # formula must keep expected occupancy within [target/2, 2*target]
        # (cap excursions at the lo/hi clamps aside) across the SFs we
        # bench plus 100x-scale corpus sizes.
        from tuplex_spark.functions.dedup import adaptive_nbits
        target, max_bucket = 32, 200
        for n in (500, 2_000, 20_000, 200_000, 2_000_000, 10**8, 10**9):
            nbits = adaptive_nbits(n, target_occupancy=target)
            occ = n / float(2 ** nbits)
            assert occ <= max_bucket / 2, (n, nbits, occ)
            if 2 ** 6 * target <= n <= 2 ** 24 * target:  # inside clamps
                assert target / 2 <= occ <= target, (n, nbits, occ)
        # monotone, clamped
        assert adaptive_nbits(0) == 6
        assert adaptive_nbits(10**12) == 24

    def test_exact_dedup_finds_planted_dup(self, ctx):
        from tuplex_spark.functions import dedup
        df = ctx.spark.createDataFrame(
            [(1, "Hello  World"), (2, "hello world"), (3, "unrelated")],
            "doc_id long, text string")
        out = {r["keep_id"]: r["n_copies"]
               for r in dedup.dedup_exact(df).collect()}
        assert out == {1: 2, 3: 1}


class TestSimilarity:
    def test_cosine_topk_self_is_first(self, spark):
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        qv = [float(x) for x in emb.filter("vec_id = 0")
              .select("embedding").head()[0]]
        top = similarity.cosine_topk(emb, qv, k=5).collect()
        assert top[0]["vec_id"] == 0
        assert abs(top[0]["cosine"] - 1.0) < 1e-6
        cosines = [r["cosine"] for r in top]
        assert cosines == sorted(cosines, reverse=True)

    def test_ivf_probes_subset(self, spark):
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        qv = [float(x) for x in emb.filter("vec_id = 0")
              .select("embedding").head()[0]]
        cents = [(int(r[0]), [float(x) for x in r[1]])
                 for r in emb.filter("vec_id < 4")
                 .select("vec_id", "embedding").collect()]
        approx = similarity.ivf_topk(emb, qv, cents, k=5, nprobe=2).collect()
        assert approx[0]["vec_id"] == 0  # query's own bucket always probed

    def test_ivf_materialized_index_prunes_partitions(self, spark,
                                                      tmp_path):
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        qv = [float(x) for x in emb.filter("vec_id = 0")
              .select("embedding").head()[0]]
        cents = [(int(r[0]), [float(x) for x in r[1]])
                 for r in emb.filter("vec_id < 4")
                 .select("vec_id", "embedding").collect()]
        path = str(tmp_path / "ivf_idx")
        similarity.ivf_build(emb, cents, path)
        q = similarity.ivf_query(spark, path, qv, cents, k=5, nprobe=2)
        # same answer as the one-pass probe over the raw table
        want = similarity.ivf_topk(emb, qv, cents, k=5, nprobe=2).collect()
        assert [tuple(r) for r in q.collect()] == [tuple(r) for r in want]
        # the centroid filter must reach the scan as a PARTITION filter
        # (directory pruning), not a post-scan data filter
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        import re as _re
        m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "centroid" in m.group(1), plan

    def test_ivf_lifecycle_trained_centroids_prune(self, spark,
                                                   tmp_path):
        # the full serving lifecycle: kmeans_fit -> ivf_build ->
        # ivf_query, with the nprobe filter reaching the scan as a
        # PARTITION filter over the TRAINED index (VERDICT r9 item 3)
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        qv = [float(x) for x in emb.filter("vec_id = 0")
              .select("embedding").head()[0]]
        cents = similarity.kmeans_fit(emb, c=4, rounds=2)
        path = str(tmp_path / "ivf_trained_idx")
        similarity.ivf_build(emb, cents, path)
        q = similarity.ivf_query(spark, path, qv, cents, k=5, nprobe=2)
        want = similarity.ivf_topk(emb, qv, cents, k=5, nprobe=2).collect()
        assert [tuple(r) for r in q.collect()] == [tuple(r) for r in want]
        plan = q._jdf.queryExecution().executedPlan().toString()
        import re as _re
        m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "centroid" in m.group(1), plan
        # pruning is real: the executed scan read exactly the 2 probed
        # partition directories (inputFiles() reports the pre-pruning
        # index, so read the scan node's numPartitions metric instead)
        leaves = q._jdf.queryExecution().executedPlan().collectLeaves()
        scan_metrics = {}
        for i in range(leaves.size()):
            node = leaves.apply(i)
            if "parquet" in node.nodeName().lower():
                it = node.metrics().iterator()
                while it.hasNext():
                    kv = it.next()
                    scan_metrics[kv._1()] = kv._2().value()
        assert scan_metrics.get("numPartitions") == 2, scan_metrics


class TestProductQuantization:
    def test_pq_matches_oracle(self, spark, con):
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        qv = [float(x) for x in emb.filter("vec_id = 0")
              .select("embedding").head()[0]]
        books = similarity.pq_train(emb, m=4, c=8, rounds=2)
        df = similarity.pq_topk(emb, qv, books, k=10)
        assert_matches(df, con, similarity.pq_topk_sql(
            m=4, c=8, rounds=2, k=10, query_where="vec_id = 0"))

    def test_pq_shapes_and_self_rank(self, spark):
        from pyspark.sql import functions as F
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        qv = [float(x) for x in emb.filter("vec_id = 0")
              .select("embedding").head()[0]]
        books = similarity.pq_train(emb, m=4, c=8, rounds=2)
        assert len(books) == 4 and all(len(b) == 8 for b in books)
        assert all(len(cv) == 16 for b in books for _, cv in b)
        enc = similarity.pq_encode(emb, books)
        rng = enc.select(
            F.min(F.array_min("codes")).alias("lo"),
            F.max(F.array_max("codes")).alias("hi"),
            F.min(F.size("codes")).alias("m")).head()
        assert rng["lo"] >= 0 and rng["hi"] <= 7 and rng["m"] == 4
        # the query's own vector shares all 4 codes with itself: it
        # must rank at (or tied-at) the minimum ADC distance
        top = similarity.pq_topk(emb, qv, books, k=3).collect()
        assert top[0]["vec_id"] == 0

    def test_ivfpq_matches_oracle(self, spark, con):
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        qv = [float(x) for x in emb.filter("vec_id = 0")
              .select("embedding").head()[0]]
        df = similarity.ivfpq_topk(emb, qv, k=10, nlist=4, m=4,
                                   cpq=8, rounds=2, nprobe=2)
        assert_matches(df, con, similarity.ivfpq_topk_sql(
            k=10, nlist=4, m=4, cpq=8, rounds=2, nprobe=2,
            query_where="vec_id = 0"))

    def test_ivfpq_self_rank_and_probe_subset(self, spark):
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        qv = [float(x) for x in emb.filter("vec_id = 0")
              .select("embedding").head()[0]]
        top = similarity.ivfpq_topk(emb, qv, k=5, nlist=4, m=4,
                                    cpq=8, rounds=1, nprobe=2).collect()
        # the query vector's own bucket is always probed and its
        # residual encodes to its own codewords' nearest cells
        assert top[0]["vec_id"] == 0
        adcs = [r["adc"] for r in top]
        assert adcs == sorted(adcs)

    def test_ivfpq_built_lifecycle_matches_topk_and_prunes(
            self, spark, tmp_path):
        # fit -> ivfpq_build (centroid-partitioned codes parquet) ->
        # ivfpq_query must equal the in-plan ivfpq_topk on the same
        # trained params, with the nprobe filter reaching the scan as
        # a PARTITION filter and ZERO shuffle Exchange in the plan
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        qv = [float(x) for x in emb.filter("vec_id = 0")
              .select("embedding").head()[0]]
        coarse, books = similarity.ivfpq_fit(emb, nlist=4, m=4, cpq=8,
                                             rounds=2)
        path = str(tmp_path / "ivfpq_idx")
        similarity.ivfpq_build(emb, coarse, books, path)
        q = similarity.ivfpq_query(spark, path, qv, coarse, books,
                                   k=10, nprobe=2)
        want = similarity.ivfpq_topk(emb, qv, k=10, nlist=4, m=4,
                                     cpq=8, rounds=2, nprobe=2)
        assert [tuple(r) for r in q.collect()] == \
            [tuple(r) for r in want.collect()]
        plan = q._jdf.queryExecution().executedPlan().toString()
        import re as _re
        mt = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert mt and "centroid" in mt.group(1), plan
        # the scan opened exactly the nprobe probed directories
        leaves = q._jdf.queryExecution().executedPlan().collectLeaves()
        scan_metrics = {}
        for i in range(leaves.size()):
            node = leaves.apply(i)
            if "parquet" in node.nodeName().lower():
                it = node.metrics().iterator()
                while it.hasNext():
                    kv = it.next()
                    scan_metrics[kv._1()] = kv._2().value()
        assert scan_metrics.get("numPartitions") == 2, scan_metrics
        # ADC + top-k is scan -> filter -> project -> TakeOrdered:
        # no shuffle Exchange anywhere, no Python in the scoring stage
        assert "Exchange" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan

    def test_adc_arrow_path_bitwise_matches_literal(self, spark,
                                                    tmp_path):
        # max_literals=0 forces the Arrow closure-table scorer; it
        # must agree BITWISE with the literal codegen path (same
        # driver doubles, same left-to-right accumulation)
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        qv = [float(x) for x in emb.filter("vec_id = 0")
              .select("embedding").head()[0]]
        books = similarity.pq_train(emb, m=4, c=8, rounds=1)
        lit = similarity.pq_topk(emb, qv, books, k=10).collect()
        arw = similarity.pq_topk(emb, qv, books, k=10,
                                 max_literals=0).collect()
        assert [tuple(r) for r in lit] == [tuple(r) for r in arw]
        # the Arrow encode (codes computed inside the UDF, HALF_UP
        # rounding emulated by floor(x*1e6+0.5)/1e6) must match the
        # JVM struct-argmin encode on trained codebooks
        enc_lit = similarity.pq_encode(emb, books).collect()
        enc_arw = similarity.pq_encode(emb, books,
                                       max_literals=0).collect()
        key = lambda r: r["vec_id"]
        assert [(r["vec_id"], list(r["codes"]))
                for r in sorted(enc_lit, key=key)] == \
            [(r["vec_id"], list(r["codes"]))
             for r in sorted(enc_arw, key=key)]
        coarse, pbooks = similarity.ivfpq_fit(emb, nlist=4, m=4,
                                              cpq=8, rounds=1)
        path = str(tmp_path / "ivfpq_ab")
        similarity.ivfpq_build(emb, coarse, pbooks, path)
        lit = similarity.ivfpq_query(spark, path, qv, coarse, pbooks,
                                     k=10, nprobe=2).collect()
        arw = similarity.ivfpq_query(spark, path, qv, coarse, pbooks,
                                     k=10, nprobe=2,
                                     max_literals=0).collect()
        assert [tuple(r) for r in lit] == [tuple(r) for r in arw]

    def test_cos_assign_arrow_path_matches_literal(self, spark,
                                                   tmp_path):
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB).limit(300)
        cents = similarity.kmeans_fit(emb, c=6, rounds=1)
        lit = similarity.assign_centroids(emb, cents) \
            .select("vec_id", "centroid").collect()
        arw = similarity.assign_centroids(emb, cents, max_literals=0) \
            .select("vec_id", "centroid").collect()
        key = lambda r: r["vec_id"]
        assert [tuple(r) for r in sorted(lit, key=key)] == \
            [tuple(r) for r in sorted(arw, key=key)]
        # and ivf_build at production nlist survives codegen strictly
        def lcg_vecs(n, d, seed):
            state, out = seed, []
            for _ in range(n):
                row = []
                for _ in range(d):
                    state = (1103515245 * state + 12345) % (1 << 31)
                    row.append(round(state / float(1 << 31) - 0.5, 6))
                out.append(row)
            return out
        big = list(enumerate(lcg_vecs(512, 64, 11)))
        old = spark.conf.get("spark.sql.codegen.fallback", "true")
        spark.conf.set("spark.sql.codegen.fallback", "false")
        try:
            path = str(tmp_path / "ivf_prod")
            similarity.ivf_build(emb, big, path)
            qv = [float(x) for x in emb.filter("vec_id = 0")
                  .select("embedding").head()[0]]
            out = similarity.ivf_query(spark, path, qv, big, k=5,
                                       nprobe=8).collect()
            assert len(out) == 5
        finally:
            spark.conf.set("spark.sql.codegen.fallback", old)

    def test_coarse_residuals_arrow_path_matches_literal(self, spark):
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB).limit(200)
        coarse = similarity.kmeans_fit(emb, c=4, rounds=1, metric="l2")
        lit = similarity._coarse_residuals(emb, coarse, "embedding",
                                           "vec_id").collect()
        arw = similarity._coarse_residuals(emb, coarse, "embedding",
                                           "vec_id",
                                           max_literals=0).collect()
        key = lambda r: r["id"]
        assert [tuple(r) for r in sorted(lit, key=key)] == \
            [tuple(r) for r in sorted(arw, key=key)]

    def test_ivfpq_production_params_codegen_survives(self, spark,
                                                      tmp_path):
        # VERDICT r10 item 2: at FAISS-like params (m=16, c=256,
        # nlist=256, nprobe=32) the encode and query plans must
        # compile — spark.sql.codegen.fallback=false turns a janino
        # 64 KB overflow into a hard error instead of a silent
        # interpreted fallback.  Codebooks/centroids are fabricated
        # deterministically (no training) — this is a PLAN-SIZE test.
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB).limit(300)
        qv = [float(x) for x in emb.filter("vec_id = 0")
              .select("embedding").head()[0]]

        def lcg_vecs(n, d, seed):
            state, out = seed, []
            for _ in range(n):
                row = []
                for _ in range(d):
                    state = (1103515245 * state + 12345) % (1 << 31)
                    row.append(round(state / float(1 << 31) - 0.5, 6))
                out.append(row)
            return out

        nlist, m, cpq, dim = 256, 16, 256, 64
        coarse = list(enumerate(lcg_vecs(nlist, dim, 7)))
        books = [list(enumerate(lcg_vecs(cpq, dim // m, 100 + s)))
                 for s in range(m)]
        old = spark.conf.get("spark.sql.codegen.fallback", "true")
        spark.conf.set("spark.sql.codegen.fallback", "false")
        try:
            path = str(tmp_path / "ivfpq_prod")
            similarity.ivfpq_build(emb, coarse, books, path)
            out = similarity.ivfpq_query(spark, path, qv, coarse,
                                         books, k=10,
                                         nprobe=32).collect()
            assert len(out) == 10
            adcs = [r["adc"] for r in out]
            assert adcs == sorted(adcs)
            # and plain PQ at production m*c
            pout = similarity.pq_topk(emb, qv, books, k=10).collect()
            assert len(pout) == 10
        finally:
            spark.conf.set("spark.sql.codegen.fallback", old)

    def test_ivfpq_nondefault_dim(self, spark):
        # ADVICE r10: ivfpq_topk used to call pq_encode without
        # forwarding dim, so any dim != 64 sliced subvectors at wrong
        # boundaries (dim > 64) or raised IndexError (dim < 64)
        from pyspark.sql import functions as F
        from tuplex_spark.functions import similarity
        emb = (spark.read.parquet(EMB)
               .select("vec_id",
                       F.slice("embedding", 1, 32).alias("embedding")))
        qv = [float(x) for x in emb.filter("vec_id = 0")
              .select("embedding").head()[0]]
        top = similarity.ivfpq_topk(emb, qv, k=5, nlist=4, m=4,
                                    cpq=8, rounds=1, nprobe=2,
                                    dim=32).collect()
        assert top[0]["vec_id"] == 0
        adcs = [r["adc"] for r in top]
        assert adcs == sorted(adcs)
        import pytest as _pytest
        with _pytest.raises(ValueError, match="not divisible"):
            similarity.ivfpq_topk(emb, qv, k=5, nlist=4, m=5,
                                  cpq=8, rounds=1, nprobe=2, dim=32)

    def test_l2_kmeans_twin(self, spark, con):
        # the metric="l2" trajectory replays exactly, like cosine's
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        cents = dict(similarity.kmeans_fit(emb, c=4, rounds=2,
                                           metric="l2"))
        sql = ("WITH " + ", ".join(similarity._kmeans_ctes(
            4, 2, "embeddings", "embedding", "vec_id", 64,
            metric="l2")) + " SELECT cid, cvec FROM cent2")
        rows = con.execute(sql).fetchall()
        assert {cid: list(cv) for cid, cv in rows} == \
            {cid: list(cv) for cid, cv in cents.items()}


class TestSemanticDedup:
    def test_semdedup_matches_oracle(self, spark, con):
        from tuplex_spark.functions import semantic
        emb = spark.read.parquet(EMB)
        n = emb.count()
        k = semantic.adaptive_k(n)
        df = semantic.semdedup(emb, c=k, rounds=2, threshold=0.42)
        assert_matches(df, con, semantic.semdedup_sql(
            c=k, rounds=2, threshold=0.42))

    def test_semantic_pairs_match_oracle(self, spark, con):
        from tuplex_spark.functions import semantic, similarity
        emb = spark.read.parquet(EMB)
        cents = similarity.kmeans_fit(emb, c=4, rounds=2)
        df = semantic.semantic_dup_pairs(emb, cents, threshold=0.42)
        assert_matches(df, con, semantic.semantic_dup_pairs_sql(
            c=4, rounds=2, threshold=0.42))

    def test_semdedup_collapses_planted_dup_group(self, spark):
        # three copies of one vector + two distinct vectors: the copies
        # form one duplicate group, smallest id survives
        from tuplex_spark.functions import semantic
        import math
        base = [math.sin(i * 0.7) for i in range(64)]
        other = [math.cos(i * 0.3) for i in range(64)]
        third = [math.sin(i * 1.9) + 0.5 for i in range(64)]
        rows = [(10, base), (11, base), (12, base),
                (20, other), (30, third)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<double>")
        out = {r["vec_id"] for r in
               semantic.semdedup(df, c=4, rounds=1,
                                 threshold=0.99).collect()}
        assert out == {10, 20, 30}

    def test_adaptive_k_bounds(self):
        from tuplex_spark.functions import semantic
        from tuplex_spark.functions.similarity import ADC_LITERAL_MAX
        assert semantic.adaptive_k(0) == 4
        assert semantic.adaptive_k(500) == 4
        assert semantic.adaptive_k(5000) == 10
        assert semantic.adaptive_k(10**9) == 16
        # the default clamp keeps every graded trajectory on the exact
        # literal assignment path
        assert semantic.adaptive_k(10**9) * 64 <= ADC_LITERAL_MAX


class TestTokenizeAndPack:
    def test_matches_oracle(self, spark, con):
        from tuplex_spark.functions import pipeline
        docs = spark.read.parquet(DOC)
        df = pipeline.tokenize_and_pack(docs, k=24)
        assert_matches(df, con, pipeline.tokenize_and_pack_sql(k=24))

    def test_placement_invariants(self, spark):
        from tuplex_spark.functions import pipeline
        docs = spark.read.parquet(DOC).limit(100)
        rows = pipeline.tokenize_and_pack(docs, k=8, budget=128,
                                          n_buckets=4).collect()
        assert len(rows) == 100
        by_bucket = {}
        for r in rows:
            assert 0 <= r["off"] < 128 and r["block"] >= 0
            assert r["bucket"] == r["doc_id"] % 4
            by_bucket.setdefault(r["bucket"], []).append(r)
        for rs in by_bucket.values():
            rs.sort(key=lambda r: r["doc_id"])
            run = 0
            for r in rs:
                assert r["block"] * 128 + r["off"] == run
                run += r["n_subwords"]


class TestQuantize:
    def test_int8_reconstruction_bound_and_range(self, spark):
        from pyspark.sql import functions as F
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        q = similarity.quantize_int8(emb)
        checks = q.select(
            F.expr("array_max(transform(q_vec, x -> abs(x)))")
             .alias("qmax"),
            F.expr("array_max(zip_with(CAST(embedding AS ARRAY<DOUBLE>),"
                   " q_vec, (x, qq) -> abs(x - qq * q_scale)))")
             .alias("maxerr"),
            "q_scale").collect()
        for r in checks:
            assert r["qmax"] <= 127
            # round-to-nearest: per-element error <= scale/2 (+ eps)
            assert r["maxerr"] <= r["q_scale"] / 2 + 1e-12, r

    def test_int8_zero_vector(self, spark):
        from tuplex_spark.functions import similarity
        df = spark.createDataFrame(
            [(1, [0.0] * 4), (2, [1.0, -2.0, 0.5, 2.0])],
            "vec_id long, embedding array<double>")
        rows = {r["vec_id"]: r for r in
                similarity.quantize_int8(df).collect()}
        assert rows[1]["q_scale"] == 0.0
        assert rows[1]["q_vec"] == [0, 0, 0, 0]
        assert rows[2]["q_vec"] == [64, -127, 32, 127]


class TestBatchAnn:
    def test_batch_topk_matches_per_query_bruteforce(self, spark):
        from pyspark.sql import functions as F
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        queries = (emb.filter(F.col("vec_id") < 3)
                   .select(F.col("vec_id").alias("q_id"),
                           F.col("embedding").alias("q_vec")))
        got = similarity.batch_cosine_topk(emb, queries, k=4).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["q_id"], []).append(r)
        assert set(by_q) == {0, 1, 2}
        for qid, rows in by_q.items():
            rows.sort(key=lambda r: r["rnk"])
            # self-match first at cosine 1.0
            assert rows[0]["vec_id"] == qid
            assert abs(rows[0]["cosine"] - 1.0) < 1e-6
            # agrees with the single-query brute force
            qv = [float(x) for x in
                  emb.filter(F.col("vec_id") == qid)
                  .select("embedding").head()[0]]
            want = similarity.cosine_topk(emb, qv, k=4).collect()
            assert [(r["vec_id"], r["cosine"]) for r in rows] == \
                [(w["vec_id"], w["cosine"]) for w in want]

    def test_batch_ivf_bucket_join_shape(self, spark):
        """Batch IVF must be an equi-join on the centroid id (queries
        travel to buckets) — no cartesian, no nested loop — with the
        per-query top-k pruned map-side."""
        from pyspark.sql import functions as F
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        cents = [(int(r[0]), [float(x) for x in r[1]])
                 for r in emb.filter("vec_id < 4")
                 .select("vec_id", "embedding").collect()]
        queries = (emb.filter(F.col("vec_id") < 3)
                   .select(F.col("vec_id").alias("q_id"),
                           F.col("embedding").alias("q_vec")))
        out = similarity.batch_ivf_topk(emb, queries, cents, k=4,
                                        nprobe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "WindowGroupLimit" in plan
        # correctness: self-match first (query's own bucket is probed)
        rows = [r for r in out.collect() if r["rnk"] == 1]
        assert {r["q_id"] for r in rows} == {0, 1, 2}
        for r in rows:
            assert r["vec_id"] == r["q_id"]
            assert abs(r["cosine"] - 1.0) < 1e-6

    def test_batch_topk_matches_duckdb(self, spark, con):
        from pyspark.sql import functions as F
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        queries = (emb.filter(F.col("vec_id") < 6)
                   .select(F.col("vec_id").alias("q_id"),
                           F.col("embedding").alias("q_vec")))
        got = sorted(tuple(r) for r in
                     similarity.batch_cosine_topk(emb, queries, k=5)
                     .collect())
        want = sorted(tuple(r) for r in con.execute(
            similarity.batch_cosine_topk_sql(k=5, query_pred="vec_id < 6"
                                             )).fetchall())
        assert got == want


class TestSketch:
    def test_kmv_matches_duckdb_bitwise(self, spark, con):
        from tuplex_spark.functions import sketch
        doc = spark.read.parquet(DOC)
        got = tuple(sketch.kmv_distinct(doc, "doc_id", k=64).collect()[0])
        want = con.execute(
            sketch.kmv_distinct_sql("documents", "doc_id", 64)).fetchone()
        assert got == want

    def test_kmv_exact_below_k(self, spark):
        # fewer than k distinct values -> the estimate IS the exact count
        from tuplex_spark.functions import sketch
        df = spark.createDataFrame([(i % 37,) for i in range(500)],
                                   "v long")
        row = sketch.kmv_distinct(df, "v", k=256).collect()[0]
        assert row["estimate"] == 37.0 and row["k_used"] == 37

    def test_kmv_accuracy(self, spark):
        # SE ~ 1/sqrt(k-2): k=1024 -> ~3.1%; assert within 4 SE
        from pyspark.sql import functions as F
        from tuplex_spark.functions import sketch
        n = 20_000
        df = spark.range(n).select((F.col("id") * 7919).alias("v"))
        est = sketch.kmv_distinct(df, "v", k=1024).collect()[0]["estimate"]
        assert abs(est - n) / n < 0.125, est

    def test_quantiles_exact_below_k(self, spark):
        # n < k: the sample is the whole column and the quantiles are
        # the exact interpolated order statistics (numpy's 'linear'
        # method is the same p*(n-1) interpolation)
        import numpy as np
        from tuplex_spark.functions import sketch
        vals = [(i, float((i * 7919) % 101)) for i in range(200)]
        df = spark.createDataFrame(vals, "k long, v double")
        probs = [0.0, 0.1, 0.5, 0.9, 1.0]
        rows = {r["p"]: r for r in
                sketch.kmv_quantiles(df, "v", "k", probs, k=1024)
                .collect()}
        arr = np.array([v for _, v in vals])
        for p in probs:
            want = float(np.quantile(arr, p, method="linear"))
            assert abs(rows[p]["quantile"] - want) < 1e-6, (p, rows[p])
            assert rows[p]["sample_n"] == 200

    def test_quantiles_match_duckdb_bitwise_sampled(self, spark, con):
        # n > k: the sampled path, graded bitwise against the twin
        from tuplex_spark.functions import sketch
        doc = spark.read.parquet(DOC)
        probs = [0.05, 0.5, 0.95]
        got = sorted(tuple(r) for r in
                     sketch.kmv_quantiles(doc, "n_chars", "doc_id",
                                          probs, k=64).collect())
        want = sorted(tuple(r) for r in con.execute(
            sketch.kmv_quantiles_sql("documents", "n_chars", "doc_id",
                                     probs, k=64)).fetchall())
        assert got == want
        assert all(r[2] == 64 for r in got)  # sampled: n == k

    def test_quantiles_null_values_excluded(self, spark):
        from tuplex_spark.functions import sketch
        df = spark.createDataFrame(
            [(1, 1.0), (2, None), (3, 3.0)], "k long, v double")
        rows = sketch.kmv_quantiles(df, "v", "k", [0.5], k=16).collect()
        assert rows[0]["sample_n"] == 2
        assert rows[0]["quantile"] == 2.0

    def test_kmv_by_group_exact_below_k(self, spark):
        from tuplex_spark.functions import sketch
        rows = [(g, v) for g in ("a", "b") for v in range(20 * 2)
                for _ in range(2)]  # duplicates don't inflate
        df = spark.createDataFrame(rows, "g string, v long")
        out = {r["g"]: r for r in
               sketch.kmv_distinct_by(df, "v", ["g"], k=256).collect()}
        assert out["a"]["estimate"] == 40.0
        assert out["b"]["k_used"] == 40

    def test_kmv_by_group_matches_duckdb(self, spark, con):
        import duckdb
        from tuplex_spark.functions import sketch
        doc = spark.read.parquet(DOC)
        got = sorted(tuple(r) for r in
                     sketch.kmv_distinct_by(doc, "doc_id", ["lang"],
                                            k=32).collect())
        want = sorted(tuple(r) for r in con.execute(
            sketch.kmv_distinct_by_sql("documents", "doc_id",
                                       ["lang"], k=32)).fetchall())
        assert got == want

    def test_kmv_by_group_mapside_prune(self, spark):
        from tuplex_spark.functions import sketch
        doc = spark.read.parquet(DOC)
        plan = sketch.kmv_distinct_by(doc, "doc_id", ["lang"], k=32) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan
        assert "Partial" in plan[plan.rindex("WindowGroupLimit"):], plan

    def test_heavy_hitters_exact(self, spark, con):
        from tuplex_spark.functions import sketch
        doc = spark.read.parquet(DOC)
        got = [tuple(r) for r in
               sketch.exact_heavy_hitters(doc, "lang", k=3).collect()]
        want = con.execute(
            sketch.exact_heavy_hitters_sql("documents", "lang", 3)) \
            .fetchall()
        assert got == [tuple(r) for r in want]

    def test_quantiles_empty_column_is_null(self, spark):
        # n = 0 (all nulls): one row per prob with NULL quantile —
        # not an element_at(vs, 0) runtime error
        from tuplex_spark.functions import sketch
        df = spark.createDataFrame(
            [(1, None), (2, None)], "k long, v double")
        rows = sketch.kmv_quantiles(df, "v", "k", [0.0, 0.5], k=16) \
            .collect()
        assert len(rows) == 2
        assert all(r["quantile"] is None and r["sample_n"] == 0
                   for r in rows)

    def test_quantiles_empty_matches_duckdb(self, spark):
        import duckdb
        from tuplex_spark.functions import sketch
        con2 = duckdb.connect()
        con2.execute("CREATE VIEW documents AS SELECT doc_id,"
                     " CAST(NULL AS DOUBLE) AS n_chars"
                     f" FROM read_parquet('{DOC}')")
        want = con2.execute(sketch.kmv_quantiles_sql(
            "documents", "n_chars", "doc_id", [0.5], k=16)).fetchall()
        assert want == [(0.5, None, 0)]


class TestKmeans:
    def test_result_matches_oracle_bitwise(self, spark, con):
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        assert_matches(similarity.kmeans_result(emb, c=8, rounds=3),
                       con, similarity.kmeans_sql(c=8, rounds=3))

    def test_seeds_deterministic_and_bounded(self, spark):
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        a = similarity.kmeans_seeds(emb, c=4)
        b = similarity.kmeans_seeds(emb, c=4)
        assert a == b and len(a) == 4
        assert [cid for cid, _ in a] == [0, 1, 2, 3]

    def test_fit_improves_inertia(self, spark):
        # Lloyd rounds must not make the clustering worse: the mean
        # per-vector best-centroid cosine is non-decreasing
        from pyspark.sql import functions as F
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)

        def mean_best_cos(cents):
            from tuplex_spark.functions.similarity import (
                _pdot_multi, py_norm, vec_norm)
            v = F.col("embedding")
            dots = _pdot_multi(v, [cv for _, cv in cents])
            best = F.array_max(F.array(*[
                F.round(dots[i] / (vec_norm(v) * F.lit(py_norm(cv))), 6)
                for i, (_, cv) in enumerate(cents)]))
            return emb.agg(F.avg(best)).collect()[0][0]

        c0 = similarity.kmeans_seeds(emb, c=4)
        c3 = similarity.kmeans_fit(emb, c=4, rounds=3)
        assert mean_best_cos(c3) >= mean_best_cos(c0)

    def test_empty_cluster_carries_previous(self, spark):
        # 3 identical vectors + c=2: one cluster captures everything,
        # the other keeps its seed vector and reports 0 members
        from tuplex_spark.functions import similarity
        rows = [(i, [1.0, 0.0, 0.0, float(i) * 1e-9]) for i in range(3)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = similarity.kmeans_result(df, c=2, rounds=2, dim=4)
        by_cid = {}
        for r in out.collect():
            by_cid.setdefault(r["cid"], []).append(r)
        counts = {cid: rs[0]["n_members"] for cid, rs in by_cid.items()}
        assert sorted(counts.values()) == [0, 3]


class TestQuantizedTopk:
    def test_matches_oracle(self, spark, con):
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        qv = [float(x) for x in
              emb.filter("vec_id = 0").select("embedding").head()[0]]
        got = [tuple(r) for r in
               similarity.quantized_topk(emb, qv, k=10, rerank=4)
               .collect()]
        want = [tuple(r) for r in con.execute(
            similarity.quantized_topk_sql(k=10, rerank=4)).fetchall()]
        assert got == want
        # the query is drawn from the corpus: exact rerank puts it first
        assert got[0][0] == 0 and got[0][2] == 1.0

    def test_rerank_recovers_exact_order(self, spark):
        # top-1 by exact cosine must agree with brute force even though
        # stage 1 ranked on the quantized approximation
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        qv = [float(x) for x in
              emb.filter("vec_id = 7").select("embedding").head()[0]]
        quant = similarity.quantized_topk(emb, qv, k=3, rerank=8).collect()
        brute = similarity.cosine_topk(emb, qv, k=3).collect()
        assert [r["vec_id"] for r in quant] == [r["vec_id"] for r in brute]
        assert [r["cosine"] for r in quant] == [r["cosine"] for r in brute]


class TestEmbeddingClean:
    def test_matches_oracle(self, spark, con):
        from tuplex_spark.functions import pipeline
        docs = spark.read.parquet(DOC)
        emb = spark.read.parquet(EMB)
        n = emb.count()
        df = pipeline.embedding_clean(docs, emb, n_corpus_rows=n)
        assert_matches(df, con,
                       pipeline.embedding_clean_sql(n_corpus_rows=n))

    def test_subset_of_survivors(self, spark):
        # every output id must be a quality/langid survivor with an
        # embedding row
        from pyspark.sql import functions as F
        from tuplex_spark.functions import pipeline, text
        docs = spark.read.parquet(DOC)
        emb = spark.read.parquet(EMB)
        out = pipeline.embedding_clean(docs, emb, n_corpus_rows=500)
        ids = {r["doc_id"] for r in out.collect()}
        vids = {r["vec_id"] for r in emb.select("vec_id").collect()}
        assert ids <= vids


class TestPipelineCompose:
    def test_clean_corpus_matches_oracle(self, spark, con):
        from tuplex_spark.functions import pipeline
        df = pipeline.clean_corpus(spark.read.parquet(DOC))
        assert_matches(df, con, pipeline.clean_corpus_sql())

    def test_filters_actually_bite(self, spark):
        from tuplex_spark.functions import pipeline
        docs = spark.read.parquet(DOC)
        kept = pipeline.clean_corpus(docs).count()
        total = docs.count()
        assert 0 < kept < total, (kept, total)


class TestDSIR:
    """DSIR importance resampling (Xie et al. NeurIPS'23;
    functions/dsir.py): the two fitters (Spark / DuckDB) must produce
    the bitwise-identical nano-nat ratio table, weights must
    oracle-match exactly (integer-sum arithmetic), and weighting must
    actually prefer target-like documents."""

    def _target_sql(self):
        return "(SELECT * FROM documents WHERE doc_id % 13 = 0)"

    def test_fitters_agree_bitwise(self, spark, con):
        from pyspark.sql import functions as F
        from tuplex_spark.functions import dsir
        docs = spark.read.parquet(DOC)
        tgt = docs.filter(F.col("doc_id") % 13 == 0)
        a = dsir.dsir_log_ratio_table(docs, tgt, n_buckets=512)
        b = dsir.dsir_log_ratio_table_duckdb(
            con, "documents", self._target_sql(), n_buckets=512)
        assert a == b

    def test_weights_oracle(self, spark, con):
        from pyspark.sql import functions as F
        from tuplex_spark.functions import dsir
        docs = spark.read.parquet(DOC)
        tgt = docs.filter(F.col("doc_id") % 13 == 0)
        tab = dsir.dsir_log_ratio_table_duckdb(
            con, "documents", self._target_sql(), n_buckets=512)
        df = dsir.dsir_weights(docs, tgt, n_buckets=512,
                               ratio_table=tab)
        assert_matches(df, con,
                       dsir.dsir_weights_sql(tab, n_buckets=512))

    def test_sample_oracle(self, spark, con):
        from pyspark.sql import functions as F
        from tuplex_spark.functions import dsir
        docs = spark.read.parquet(DOC)
        tgt = docs.filter(F.col("doc_id") % 13 == 0)
        tab = dsir.dsir_log_ratio_table_duckdb(
            con, "documents", self._target_sql(), n_buckets=512)
        df = dsir.dsir_sample(docs, tgt, n_keep=100, n_buckets=512,
                              ratio_table=tab)
        assert_matches(df, con,
                       dsir.dsir_sample_sql(tab, n_keep=100,
                                            n_buckets=512))

    def test_weights_prefer_target_like_docs(self, spark):
        # docs drawn from the target's vocabulary must outweigh docs
        # from a disjoint vocabulary
        from tuplex_spark.functions import dsir
        tgt_rows = [(100 + i, "alpha beta gamma delta epsilon " * 4)
                    for i in range(5)]
        src_rows = ([(i, "zeta eta theta iota kappa " * 4)
                     for i in range(5)]
                    + [(50 + i, "alpha beta gamma delta epsilon " * 4)
                       for i in range(3)])
        docs = spark.createDataFrame(src_rows + tgt_rows,
                                     "doc_id long, text string")
        tgt = spark.createDataFrame(tgt_rows,
                                    "doc_id long, text string")
        w = {r.doc_id: r.logw
             for r in dsir.dsir_weights(docs, tgt,
                                        n_buckets=256).collect()}
        target_like = [w[50 + i] for i in range(3)]
        off_target = [w[i] for i in range(5)]
        assert min(target_like) > max(off_target)

    def test_empty_doc_gets_zero_weight(self, spark):
        from tuplex_spark.functions import dsir
        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, None), (3, "")],
            "doc_id long, text string")
        tgt = docs.filter("doc_id = 1")
        w = {r.doc_id: r.logw
             for r in dsir.dsir_weights(docs, tgt,
                                        n_buckets=64).collect()}
        assert w[2] == 0.0
        assert len(w) == 3


class TestMixture:
    """Deterministic corpus-mixture sampling (functions/mixture.py):
    the cross-multiplied integer cut must oracle-match exactly, honor
    the per-source token budget in expectation, keep exhausted sources
    whole, and stay stable under repartitioning."""

    W = {f"src{i}": (90_000 if i % 3 == 0 else 35_000)
         for i in range(20)}

    def test_plan_oracle(self, spark, con):
        from tuplex_spark.functions import mixture
        df = mixture.mixture_plan(spark.read.parquet(DOC), self.W,
                                  400_000)
        assert_matches(df, con,
                       mixture.mixture_plan_sql(self.W, 400_000))

    def test_sample_oracle(self, spark, con):
        from tuplex_spark.functions import mixture
        df = mixture.mixture_sample(spark.read.parquet(DOC), self.W,
                                    400_000).select("doc_id", "source")
        assert_matches(df, con, "SELECT doc_id, source FROM ("
                       + mixture.mixture_sample_sql(self.W, 400_000)
                       + ") _m")

    def test_exhausted_source_kept_whole_and_zero_dropped(self, spark):
        from tuplex_spark.functions import mixture
        docs = spark.read.parquet(DOC)
        w = {"src0": 10_000_000, "src1": 0}  # others: absent -> 0
        kept = mixture.mixture_sample(docs, w, 10**9)
        srcs = {r.source for r in kept.select("source")
                .distinct().collect()}
        assert srcs == {"src0"}
        n0 = docs.filter("source = 'src0'").count()
        assert kept.count() == n0

    def test_stable_under_repartition(self, spark):
        from tuplex_spark.functions import mixture
        docs = spark.read.parquet(DOC)
        a = {r.doc_id for r in mixture.mixture_sample(
            docs, self.W, 200_000).select("doc_id").collect()}
        b = {r.doc_id for r in mixture.mixture_sample(
            docs.repartition(13), self.W, 200_000)
            .select("doc_id").collect()}
        assert a == b and a

    def test_budget_hit_in_expectation(self, spark):
        from pyspark.sql import functions as F
        from tuplex_spark.functions import text
        from tuplex_spark.functions import mixture
        docs = spark.read.parquet(DOC)
        budget = 300_000
        w = {f"src{i}": 50_000 for i in range(20)}  # sums to 1e6
        kept = mixture.mixture_sample(docs, w, budget)
        tok = kept.select(F.sum(F.size(
            text.tokens("text"))).alias("t")).collect()[0].t or 0
        total = docs.select(F.sum(F.size(
            text.tokens("text"))).alias("t")).collect()[0].t
        want = min(budget, total)
        assert abs(tok - want) / want < 0.25  # Bernoulli variance

    def test_weight_validation(self, spark):
        from tuplex_spark.functions import mixture
        docs = spark.read.parquet(DOC)
        import pytest as _pt
        with _pt.raises(ValueError):
            mixture.mixture_sample(docs, {"s'rc": 10}, 100)
        with _pt.raises(ValueError):
            mixture.mixture_sample(docs, {"src0": 0.5}, 100)


class TestSampling:
    """Deterministic content-addressed sampling (functions/sampling.py):
    membership must be a pure function of the row key — stable under
    repartitioning (where df.sample(seed) is NOT), engine-portable
    (DuckDB twin selects the identical rows), and splits disjoint +
    exhaustive by construction."""

    def test_hash_sample_stable_under_repartition(self, spark):
        from tuplex_spark.functions import sampling
        docs = spark.read.parquet(DOC)
        a = {r.doc_id for r in
             sampling.hash_sample(docs, 0.3, "doc_id").collect()}
        b = {r.doc_id for r in
             sampling.hash_sample(docs.repartition(17), 0.3,
                                  "doc_id").collect()}
        c = {r.doc_id for r in
             sampling.hash_sample(docs.coalesce(1), 0.3,
                                  "doc_id").collect()}
        assert a == b == c and a
        n = docs.count()
        assert abs(len(a) / n - 0.3) < 0.05

    def test_hash_sample_matches_duckdb_rowset(self, spark, con):
        from tuplex_spark.functions import sampling
        docs = spark.read.parquet(DOC)
        got = sorted(r.doc_id for r in
                     sampling.hash_sample(docs, 0.12, "doc_id")
                     .select("doc_id").collect())
        want = sorted(r[0] for r in con.execute(
            "SELECT doc_id FROM ("
            + sampling.hash_sample_sql("documents", 0.12, "doc_id")
            + ")").fetchall())
        assert got == want

    def test_salt_decorrelates(self, spark):
        from tuplex_spark.functions import sampling
        docs = spark.read.parquet(DOC)
        a = {r.doc_id for r in
             sampling.hash_sample(docs, 0.3, "doc_id").collect()}
        b = {r.doc_id for r in
             sampling.hash_sample(docs, 0.3, "doc_id",
                                  salt="x").collect()}
        overlap = len(a & b) / len(a)
        assert 0.1 < overlap < 0.6  # ~0.3 expected for independence

    def test_stratified_fractions(self, spark):
        from tuplex_spark.functions import sampling
        docs = spark.read.parquet(DOC)
        out = sampling.stratified_sample(
            docs, "lang", {"en": 0.1}, "doc_id", default=1.0)
        base = {r.lang: r.n for r in
                docs.groupBy("lang").agg(
                    __import__("pyspark.sql.functions",
                               fromlist=["count"]).count("*").alias("n"))
                .collect()}
        kept = {r.lang: r.n for r in
                out.groupBy("lang").agg(
                    __import__("pyspark.sql.functions",
                               fromlist=["count"]).count("*").alias("n"))
                .collect()}
        assert abs(kept["en"] / base["en"] - 0.1) < 0.06
        for lang, n in base.items():
            if lang != "en":
                assert kept.get(lang) == n  # default=1.0 keeps all

    def test_split_disjoint_exhaustive_deterministic(self, spark):
        from tuplex_spark.functions import sampling
        docs = spark.read.parquet(DOC)
        tr, va, te = sampling.train_val_test_split(docs, "doc_id")
        ids = [frozenset(r.doc_id for r in d.select("doc_id").collect())
               for d in (tr, va, te)]
        n = docs.count()
        assert sum(len(s) for s in ids) == n          # exhaustive
        assert not (ids[0] & ids[1] or ids[0] & ids[2]
                    or ids[1] & ids[2])               # disjoint
        assert abs(len(ids[0]) / n - 0.8) < 0.05
        tr2 = sampling.train_val_test_split(docs.repartition(7),
                                            "doc_id")[0]
        assert frozenset(r.doc_id
                         for r in tr2.select("doc_id").collect()) == ids[0]

    def test_sample_is_scan_adjacent_no_shuffle(self, spark):
        # the decision must be a codegen'd filter over the scan: no
        # exchange, no python, and the parquet scan prunes columns
        from tuplex_spark.functions import sampling
        out = sampling.hash_sample(
            spark.read.parquet(DOC), 0.2, "doc_id").select("doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" not in plan


class TestRedactVocab:
    def test_redact_matches_oracle(self, spark, con):
        from tuplex_spark.functions import text
        df = text.redact_pii(spark.read.parquet(DOC))
        assert_matches(df, con, text.redact_pii_sql())

    def test_redact_scrubs_known_pii(self, spark):
        from tuplex_spark.functions import text
        df = spark.createDataFrame(
            [(1, "bob@x.io called 415-555-0199 from 10.0.0.1, "
                 "ssn 123-45-6789")],
            "doc_id long, text string")
        r = text.redact_pii(df).collect()[0]
        assert "[EMAIL]" in r["text"] and "[PHONE]" in r["text"]
        assert "[IPV4]" in r["text"] and "[SSN]" in r["text"]
        assert "bob@x.io" not in r["text"]
        assert r["n_redactions"] == 4

    def test_vocabulary_matches_oracle(self, spark, con):
        from tuplex_spark.functions import text
        df = text.vocabulary(spark.read.parquet(DOC), min_count=3)
        assert_matches(df, con, text.vocabulary_sql(min_count=3))


class TestRedactCountAndScanMtime:
    def test_redact_count_ignores_preexisting_tags(self, spark):
        """A document already containing literal '[EMAIL]' must not
        inflate n_redactions — counts come from the input side."""
        from tuplex_spark.functions.text import redact_pii, redact_pii_sql
        import duckdb
        rows = [(1, "mail me at a@b.com or [EMAIL] maybe"),
                (2, "[PHONE] [SSN] nothing real here"),
                (3, "ssn 123-45-6789 then ip 10.0.0.1"),
                (4, "plain text")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["n_redactions"]
               for r in redact_pii(df).collect()}
        assert got == {1: 1, 2: 0, 3: 2, 4: 0}, got
        # SQL twin stays value-locked
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        oracle = {r[0]: r[2]
                  for r in con.execute(redact_pii_sql()).fetchall()}
        assert oracle == got

    def test_scan_mtime_sees_nested_inplace_rewrite(self, tmp_path):
        """In-place rewrite of a part file nested in a partition dir
        must change the scan mtime (ancestor dir mtimes don't move)."""
        import os, time
        from tuplex_spark.context import _scan_mtime
        part = tmp_path / "out" / "year=2024"
        part.mkdir(parents=True)
        f = part / "part-0.parquet"
        f.write_bytes(b"v1")
        m1 = _scan_mtime(str(tmp_path / "out"))
        time.sleep(0.02)
        with open(f, "r+b") as fh:  # in-place: parent mtimes unchanged
            fh.write(b"v2")
        m2 = _scan_mtime(str(tmp_path / "out"))
        assert m2 > m1, (m1, m2)

    def test_scan_mtime_budget_degrades_to_miss(self, tmp_path):
        import tuplex_spark.context as cmod
        d = tmp_path / "big"
        d.mkdir()
        for i in range(12):
            (d / f"f{i}").write_bytes(b"x")
        old = cmod._SCAN_MTIME_CAP
        cmod._SCAN_MTIME_CAP = 5
        try:
            assert cmod._scan_mtime(str(d)) == float("inf")
        finally:
            cmod._SCAN_MTIME_CAP = old


class TestDecontaminate:
    def _corpus(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog today ok"),
            (2, "completely unrelated text about spark execution plans"),
            # shares an 8-gram with doc 1
            (3, "x quick brown fox jumps over the lazy dog y z"),
            (4, "short doc"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_drop_removes_ref_and_overlaps(self, spark):
        from tuplex_spark.functions.dedup import decontaminate
        docs = self._corpus(spark)
        ref = docs.filter("doc_id = 1")
        kept = sorted(r["doc_id"]
                      for r in decontaminate(docs, ref, n=8).collect())
        # 1 matches itself, 3 shares "quick brown fox jumps over the
        # lazy dog" 8-gram; 2 and 4 (too short) survive
        assert kept == [2, 4]

    def test_flag_mode_counts(self, spark):
        from tuplex_spark.functions.dedup import decontaminate
        docs = self._corpus(spark)
        ref = docs.filter("doc_id = 1")
        out = {r["doc_id"]: r for r in
               decontaminate(docs, ref, n=8, mode="flag").collect()}
        assert len(out) == 4
        assert out[1]["contaminated"] and out[3]["contaminated"]
        assert not out[2]["contaminated"] and not out[4]["contaminated"]
        assert out[2]["n_overlap"] == 0 and out[1]["n_overlap"] >= 1

    def test_min_overlap_threshold(self, spark):
        from tuplex_spark.functions.dedup import decontaminate
        docs = self._corpus(spark)
        ref = docs.filter("doc_id = 1")
        kept = sorted(r["doc_id"] for r in
                      decontaminate(docs, ref, n=8,
                                    min_overlap=3).collect())
        # doc 3 shares fewer than 3 distinct 8-grams -> survives
        assert 3 in kept and 2 in kept and 4 in kept and 1 not in kept

    def test_plan_broadcasts_ref_no_cartesian(self, spark):
        import os
        from tuplex_spark.functions.dedup import decontaminate
        from conftest import SF_DIR
        docs = spark.read.parquet(os.path.join(SF_DIR,
                                               "documents.parquet"))
        ref = docs.filter("doc_id % 17 = 0")
        plan = decontaminate(docs, ref, n=8) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_bloom_path_equals_exact(self, spark):
        """decontaminate_bloom is a plan-shape variant: the prefilter's
        false positives die in the exact-confirm join, so the output
        must equal decontaminate() exactly — drop AND flag modes."""
        from tuplex_spark.functions.dedup import (decontaminate,
                                                  decontaminate_bloom)
        docs = self._corpus(spark)
        ref = docs.filter("doc_id = 1")
        for kwargs in ({"n": 8}, {"n": 8, "min_overlap": 3},
                       {"n": 8, "mode": "flag"}):
            a = sorted(map(tuple,
                           decontaminate(docs, ref, **kwargs).collect()))
            b = sorted(map(tuple,
                           decontaminate_bloom(docs, ref,
                                               **kwargs).collect()))
            assert a == b, kwargs

    def test_bloom_has_no_false_negatives_tiny_filter(self, spark):
        """Even a deliberately DENSE bitset (1 bit/key, high fpp) can
        only ADD prefilter survivors — never lose a true hit — because
        every reference shingle's own bits are set by construction."""
        from tuplex_spark.functions.dedup import (decontaminate,
                                                  decontaminate_bloom)
        docs = self._corpus(spark)
        ref = docs.filter("doc_id = 1")
        a = sorted(r["doc_id"]
                   for r in decontaminate(docs, ref, n=8).collect())
        b = sorted(r["doc_id"]
                   for r in decontaminate_bloom(
                       docs, ref, n=8, bits_per_key=1,
                       num_hashes=1).collect())
        assert a == b

    def test_bloom_bitset_build_is_chunk_bounded(self, spark):
        """The build-side driver collect must receive dense CHUNK blobs
        — at most ceil(n_words/chunk_words) rows — never O(words) rows
        (at the 1B-shingle design point the old per-word collect was
        ~190M Row objects), and the assembled bitset must equal a
        direct per-position construction, including a partial final
        chunk."""
        import numpy as np
        from pyspark.sql import functions as F
        from tuplex_spark.functions import dedup
        rsh = spark.range(5000).select(
            F.concat(F.lit("sh_"), F.col("id").cast("string")).alias("s"))
        n_words = 4096 * 2 + 10          # forces a partial last chunk
        m_bits = 64 * n_words
        k = 3

        def positions(col):
            return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))
                    for i in range(k)]

        chunks = dedup._bloom_word_chunks(rsh, positions, m_bits,
                                          chunk_words=4096)
        rows = chunks.collect()
        assert len(rows) <= 3, len(rows)
        got = np.zeros(n_words, dtype=np.int64)
        for r in rows:
            lo = int(r["c"]) * 4096
            blob = np.frombuffer(r["blob"], dtype=np.int64)
            assert lo + len(blob) <= n_words
            got[lo:lo + len(blob)] = blob
        ref = np.zeros(n_words, dtype=np.uint64)
        for r in rsh.select(F.explode(F.array(*positions(F.col("s"))))
                            .alias("p")).collect():
            p = int(r["p"])
            ref[p >> 6] |= np.uint64(1) << np.uint64(p & 63)
        assert np.array_equal(got.view(np.uint64), ref)
        # the default-chunk assembly path agrees too
        assert np.array_equal(
            dedup._bloom_bitset(rsh, positions, m_bits).view(np.uint64),
            ref)

    def test_bloom_corpus_side_has_no_prefilter_join(self, spark):
        """The membership test must be a map-side Arrow bit gather, not
        a join: upstream of the exact-confirm join's corpus side there
        is exactly the ArrowEvalPython filter, and the plan's only
        joins are the confirm + final anti join."""
        import os
        from conftest import SF_DIR
        from tuplex_spark.functions.dedup import decontaminate_bloom
        docs = spark.read.parquet(os.path.join(SF_DIR,
                                               "documents.parquet"))
        ref = docs.filter("doc_id % 17 = 0")
        out = decontaminate_bloom(docs, ref, n=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan
        assert "CartesianProduct" not in plan
        import re
        njoins = len(re.findall(r"(BroadcastHashJoin|SortMergeJoin|"
                                r"ShuffledHashJoin)", plan))
        assert njoins <= 2, plan


class TestMinhashSimilarity:
    def test_estimates_track_overlap(self, spark):
        from tuplex_spark.functions.dedup import minhash_similarity
        rows = [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # dup
            (3, "alpha beta gamma delta epsilon zeta eta iota"),   # near
            (4, "one two three four five six seven eight"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r.id_a, r.id_b): r.est_jaccard
               for r in minhash_similarity(df).collect()}
        assert got[(1, 2)] == 1.0          # identical shingle sets
        assert 0.0 < got.get((1, 3), 0) < 1.0 or (1, 3) not in got
        assert (1, 4) not in got           # no shared band expected

    def test_no_join_and_single_signature_pass(self, spark):
        """The signature array must ride the bucket shuffle as payload:
        no join operator anywhere (the naive shape joins the signature
        table back twice), and the corpus is scanned once."""
        import os
        from conftest import SF_DIR
        from tuplex_spark.functions.dedup import minhash_similarity
        docs = spark.read.parquet(os.path.join(SF_DIR,
                                               "documents.parquet"))
        plan = minhash_similarity(docs) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, plan
        assert plan.count("FileScan parquet") <= 2  # Final+Initial AQE


class TestDupComponents:
    def test_distributed_path_matches_local(self, spark):
        """The two dup_components execution paths (driver union-find
        under local_pairs_max, pointer-jumping loop past it) must
        produce the identical min-reachable-id fixpoint on a pair set
        with chains, stars, merges, and self-loops."""
        import random
        from tuplex_spark.functions.dedup import dup_components
        rng = random.Random(0xC0)
        rows = [(rng.randrange(200), rng.randrange(200))
                for _ in range(300)] + [(7, 7), (500, 501), (501, 502)]
        pairs = spark.createDataFrame(rows, "id_a long, id_b long")
        loc = {(r["id"], r["comp"])
               for r in dup_components(pairs).collect()}
        dist = {(r["id"], r["comp"])
                for r in dup_components(pairs,
                                        local_pairs_max=0).collect()}
        assert loc == dist and loc

    def test_distributed_path_chain_star_islands(self, spark):
        """test_chain_star_and_islands on the distributed loop
        explicitly (the default now resolves small pair sets on the
        driver)."""
        from tuplex_spark.functions.dedup import dup_components
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13),
             (20, 21)], "id_a long, id_b long")
        got = {r["id"]: r["comp"]
               for r in dup_components(pairs,
                                       local_pairs_max=0).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                       10: 10, 11: 10, 12: 10, 13: 10,
                       20: 20, 21: 20}

    def test_chain_star_and_islands(self, spark):
        from tuplex_spark.functions.dedup import dup_components
        # chain 1-2-3-4, star 10-(11,12,13), pair 20-21
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13),
             (20, 21)], "id_a long, id_b long")
        got = {r["id"]: r["comp"] for r in dup_components(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                       10: 10, 11: 10, 12: 10, 13: 10,
                       20: 20, 21: 20}

    def test_long_path_converges_via_pointer_jumping(self, spark):
        from tuplex_spark.functions.dedup import dup_components
        n = 64  # path of 64 nodes: naive propagation needs 63 rounds
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "id_a long, id_b long")
        got = {r["id"]: r["comp"]
               for r in dup_components(pairs, max_iter=10).collect()}
        assert all(v == 0 for v in got.values()), got

    def test_survivor_selection_composes(self, spark):
        from tuplex_spark.functions.dedup import dup_components
        from pyspark.sql import functions as F
        docs = spark.createDataFrame(
            [(i, f"d{i}") for i in range(6)], "doc_id long, text string")
        pairs = spark.createDataFrame([(0, 3), (3, 5)],
                                      "id_a long, id_b long")
        comp = dup_components(pairs)
        losers = comp.filter(F.col("id") != F.col("comp")) \
            .select(F.col("id").alias("doc_id"))
        kept = sorted(r["doc_id"]
                      for r in docs.join(losers, "doc_id",
                                         "left_anti").collect())
        assert kept == [0, 1, 2, 4]


class TestCanonicalize:
    def test_keeps_singletons_and_min_id_reps(self, spark):
        from tuplex_spark.functions import dedup
        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(1, 9)],
            "doc_id long, text string")
        # clusters {1,3,5} (chained) and {2,7}; 4,6,8 are singletons
        pairs = spark.createDataFrame(
            [(1, 3), (3, 5), (2, 7)], "id_a long, id_b long")
        kept = sorted(r["doc_id"] for r in
                      dedup.canonicalize(docs, pairs).collect())
        assert kept == [1, 2, 4, 6, 8]

    def test_all_columns_pass_through(self, spark):
        from tuplex_spark.functions import dedup
        docs = spark.createDataFrame(
            [(1, "a", 7), (2, "b", 9)],
            "doc_id long, text string, extra long")
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        rows = dedup.canonicalize(docs, pairs).collect()
        assert [tuple(r) for r in rows] == [(1, "a", 7)]


class TestSessionStabilityConfs:
    def test_variance_guards_are_set(self, spark):
        """The round-8 stability confs are load-bearing (AQE explosion
        coalescing, codegen-class churn, first-touch heap stalls) —
        pin them so a build_session refactor can't silently drop them."""
        c = spark.conf
        assert c.get("spark.sql.adaptive.coalescePartitions"
                     ".minPartitionSize") == "64KB"
        assert c.get("spark.sql.codegen.cache.maxEntries") == "10000"
        opts = c.get("spark.driver.extraJavaOptions")
        assert "-XX:+AlwaysPreTouch" in opts
        assert "-Xms" in opts
        assert "ReservedCodeCacheSize" in opts


class TestPackSequences:
    def test_blocks_and_offsets(self, spark):
        from tuplex_spark.functions.text import pack_sequences
        # single bucket: docs of 3, 4, 5, 2 tokens, budget 6
        docs = spark.createDataFrame(
            [(0, "a b c"), (16, "a b c d"), (32, "a b c d e"),
             (48, "a b")], "doc_id long, text string")
        got = {r["doc_id"]: (r["bucket"], r["block"], r["off"])
               for r in pack_sequences(docs, budget=6,
                                       n_buckets=16).collect()}
        # starts: 0, 3, 7, 12 -> blocks 0,0,1,2; offs 0,3,1,0
        assert got == {0: (0, 0, 0), 16: (0, 0, 3),
                       32: (0, 1, 1), 48: (0, 2, 0)}

    def test_buckets_pack_independently(self, spark):
        from tuplex_spark.functions.text import pack_sequences
        docs = spark.createDataFrame(
            [(0, "a b c"), (1, "x y"), (2, "p q r s"), (17, "m n")],
            "doc_id long, text string")
        got = {r["doc_id"]: (r["bucket"], r["block"], r["off"])
               for r in pack_sequences(docs, budget=4,
                                       n_buckets=16).collect()}
        assert got[0] == (0, 0, 0)
        assert got[1] == (1, 0, 0)       # own bucket, fresh sum
        assert got[17] == (1, 0, 2)      # after doc 1 in bucket 1
        assert got[2] == (2, 0, 0)

    def test_empty_doc_zero_tokens(self, spark):
        from tuplex_spark.functions.text import pack_sequences
        docs = spark.createDataFrame(
            [(0, ""), (16, "a b")], "doc_id long, text string")
        got = {r["doc_id"]: (r["n_tokens"], r["off"])
               for r in pack_sequences(docs, budget=8,
                                       n_buckets=16).collect()}
        assert got[0] == (0, 0) and got[16] == (2, 0)

    def test_plan_single_window_shuffle(self, spark):
        import os
        from conftest import SF_DIR
        from tuplex_spark.functions.text import pack_sequences
        docs = spark.read.parquet(os.path.join(SF_DIR,
                                               "documents.parquet"))
        plan = pack_sequences(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Exchange SinglePartition" not in plan, \
            "packing must never global-sort"


class TestRepetitionScores:
    def test_hand_computed(self, spark):
        from tuplex_spark.functions.text import repetition_scores
        docs = spark.createDataFrame(
            [(1, "a a a a"),            # 4 tokens, 1 distinct
             (2, "w x y z"),            # all distinct
             (3, "go go stop go go")],  # top bigram "go go" = 2/4
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in repetition_scores(docs).collect()}
        assert got[1]["n_tokens"] == 4
        assert abs(got[1]["dup_token_frac"] - 0.75) < 1e-9
        assert abs(got[1]["top_token_frac"] - 1.0) < 1e-9
        assert abs(got[1]["top_bigram_frac"] - 1.0) < 1e-9
        assert got[2]["dup_token_frac"] == 0.0
        assert abs(got[2]["top_bigram_frac"] - (1 / 3)) < 1e-6
        assert abs(got[3]["top_token_frac"] - 0.8) < 1e-9
        assert abs(got[3]["top_bigram_frac"] - 0.5) < 1e-9

    def test_single_token_doc(self, spark):
        from tuplex_spark.functions.text import repetition_scores
        docs = spark.createDataFrame([(1, "solo")],
                                     "doc_id long, text string")
        r = repetition_scores(docs).collect()[0]
        assert r["n_tokens"] == 1
        assert r["top_bigram_frac"] == 0.0


class TestRarityScores:
    def test_hand_computed(self, spark):
        from tuplex_spark.functions.text import rarity_scores
        # corpus counts: a=2, b=2, c=1; total=5
        docs = spark.createDataFrame([(1, "a a b"), (2, "b c")],
                                     "doc_id long, text string")
        got = {r["doc_id"]: r
               for r in rarity_scores(docs, rare_ppm=300000).collect()}
        assert got[1]["n_tokens"] == 3
        assert abs(got[1]["mean_freq"] - 2.0) < 1e-9
        assert got[1]["min_freq"] == 2
        assert got[1]["rare_frac"] == 0.0       # a,b both at 40% > 30%
        assert got[2]["n_tokens"] == 2
        assert abs(got[2]["mean_freq"] - 1.5) < 1e-9
        assert got[2]["min_freq"] == 1
        assert abs(got[2]["rare_frac"] - 0.5) < 1e-9   # c at 20% < 30%

    def test_uniform_corpus_nothing_rare(self, spark):
        from tuplex_spark.functions.text import rarity_scores
        docs = spark.createDataFrame([(i, "x y") for i in range(4)],
                                     "doc_id long, text string")
        rows = rarity_scores(docs, rare_ppm=100).collect()
        assert all(r["rare_frac"] == 0.0 and r["min_freq"] == 4
                   for r in rows)

    def test_plan_no_python_no_cartesian(self, spark):
        import os
        from conftest import SF_DIR
        from tuplex_spark.functions.text import rarity_scores
        docs = spark.read.parquet(os.path.join(SF_DIR,
                                               "documents.parquet"))
        plan = rarity_scores(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
        # the only nested-loop join is the broadcast 1-row total
        assert plan.count("BroadcastNestedLoopJoin") <= 1


class TestChunkDedup:
    def test_keep_first_and_reassemble(self, spark):
        from tuplex_spark.functions.dedup import chunk_dedup
        docs = spark.createDataFrame(
            [(1, "a b c d"), (2, "c d e")], "doc_id long, text string")
        got = {r["doc_id"]: r
               for r in chunk_dedup(docs, chunk_tokens=2).collect()}
        assert got[1]["clean_text"] == "a b c d"
        assert (got[1]["n_chunks_kept"], got[1]["n_chunks_total"]) == (2, 2)
        assert got[2]["clean_text"] == "e"      # "c d" first seen in doc 1
        assert (got[2]["n_chunks_kept"], got[2]["n_chunks_total"]) == (1, 2)

    def test_fully_duplicate_doc_drops(self, spark):
        from tuplex_spark.functions.dedup import chunk_dedup
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b")], "doc_id long, text string")
        got = {r["doc_id"] for r in
               chunk_dedup(docs, chunk_tokens=2).collect()}
        assert got == {1}

    def test_chunk_order_preserved_within_doc(self, spark):
        from tuplex_spark.functions.dedup import chunk_dedup
        # doc 2's middle chunk duplicates doc 1; flanks survive in order
        docs = spark.createDataFrame(
            [(1, "m m"), (2, "a a m m z z")], "doc_id long, text string")
        got = {r["doc_id"]: r["clean_text"]
               for r in chunk_dedup(docs, chunk_tokens=2).collect()}
        assert got[2] == "a a z z"

    def test_plan_no_global_sort(self, spark):
        import os
        from conftest import SF_DIR
        from tuplex_spark.functions.dedup import chunk_dedup
        docs = spark.read.parquet(os.path.join(SF_DIR,
                                               "documents.parquet"))
        plan = chunk_dedup(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange SinglePartition" not in plan
        assert "Python" not in plan

    def test_bad_chunk_size_raises(self, spark):
        import pytest
        from tuplex_spark.functions.dedup import chunk_dedup
        docs = spark.createDataFrame([(1, "a")],
                                     "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_dedup(docs, chunk_tokens=0)


class TestQuotaSample:
    def test_cap_enforced_and_deterministic(self, spark):
        from tuplex_spark.functions.sampling import quota_sample
        rows = [(i, f"dom{i % 3}") for i in range(90)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        kept = quota_sample(df, "source", "doc_id", cap=7)
        got = {r["source"]: [] for r in kept.collect()}
        for r in kept.collect():
            got[r["source"]].append(r["doc_id"])
        assert all(len(v) == 7 for v in got.values()), got
        # repartitioning must not change the selected set
        kept2 = quota_sample(df.repartition(13), "source", "doc_id",
                             cap=7)
        assert sorted(map(tuple, kept.collect())) == \
            sorted(map(tuple, kept2.collect()))
        # groups under the cap keep everything
        small = quota_sample(df.filter("doc_id < 4"), "source",
                             "doc_id", cap=7)
        assert small.count() == 4

    def test_map_side_group_limit_prunes_before_shuffle(self, spark):
        """The quota cap must be STRUCTURAL like the LSH bucket cap: a
        Partial WindowGroupLimit prunes each map task's output before
        the exchange, so one giant domain can never ship its whole
        group through the shuffle."""
        import os
        from conftest import SF_DIR
        from tuplex_spark.functions.sampling import quota_sample
        docs = spark.read.parquet(os.path.join(SF_DIR,
                                               "documents.parquet"))
        plan = quota_sample(docs, "source", "doc_id", cap=40) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan
        i = plan.index("WindowGroupLimit")
        assert "Partial" in plan[i:], plan[:2000]


class TestTemperatureSample:
    def _mk(self, spark):
        rows = [(i, "big") for i in range(8)] + [(100, "small"),
                                                 (101, "small")]
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_matches_reference_md5_decision(self, spark):
        import hashlib
        import math
        from tuplex_spark.functions.sampling import temperature_sample
        df = self._mk(spark)
        kept = sorted(r["doc_id"] for r in
                      temperature_sample(df, "lang", "doc_id",
                                         alpha=0.5).collect())
        cuts = {"big": math.floor(math.pow(2.0 / 8.0, 0.5) * (1 << 32)),
                "small": 1 << 32}
        exp = []
        for i, lang in [(i, "big") for i in range(8)] + \
                       [(100, "small"), (101, "small")]:
            h = int(hashlib.md5(f"{i}temp".encode()).hexdigest()[:8], 16)
            if h < cuts[lang]:
                exp.append(i)
        assert kept == sorted(exp)
        # the rarest stratum always survives whole
        assert {100, 101}.issubset(set(kept))

    def test_alpha_one_keeps_everything(self, spark):
        from tuplex_spark.functions.sampling import temperature_sample
        df = self._mk(spark)
        assert temperature_sample(df, "lang", "doc_id",
                                  alpha=1.0).count() == 10

    def test_bad_alpha_raises(self, spark):
        import pytest
        from tuplex_spark.functions.sampling import temperature_sample
        with pytest.raises(ValueError):
            temperature_sample(self._mk(spark), "lang", "doc_id",
                               alpha=0.0)

    def test_output_schema_is_input_schema(self, spark):
        from tuplex_spark.functions.sampling import temperature_sample
        df = self._mk(spark)
        out = temperature_sample(df, "lang", "doc_id", alpha=0.5)
        assert out.columns == df.columns


class TestKeyterms:
    def test_tfidf_ordering(self, spark):
        from tuplex_spark.functions.text import keyterms
        # corpus counts: x=4 (common), q=1, z=2
        docs = spark.createDataFrame(
            [(1, "x x q z"), (2, "x z"), (3, "x")],
            "doc_id long, text string")
        got = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"])
               for r in keyterms(docs, k=2).collect()}
        # doc 1: x has tf=2 -> first despite being common; then q (df=1)
        assert got[(1, 1)] == ("x", 2, 4)
        assert got[(1, 2)] == ("q", 1, 1)
        # doc 2: tf ties at 1 -> rarer token (z, df=2) outranks x (df=4)
        assert got[(2, 1)] == ("z", 1, 2)
        assert got[(2, 2)] == ("x", 1, 4)

    def test_lexicographic_tiebreak(self, spark):
        from tuplex_spark.functions.text import keyterms
        docs = spark.createDataFrame([(1, "b a")],
                                     "doc_id long, text string")
        got = [r["term"] for r in keyterms(docs, k=2)
               .orderBy("rank").collect()]
        assert got == ["a", "b"]     # tf/df tie -> lexicographic


class TestC4Filters:
    def test_flags(self, spark):
        from tuplex_spark.functions.text import c4_filters
        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over it"),   # all pass
             (2, "a b"),                                  # too short
             (3, "the " + "x" * 200 + " of and to in"),   # long token
             (4, "zz yy xx ww vv uu")],                   # no stopword
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in c4_filters(docs).collect()}
        assert got[1]["keep"]
        assert not got[2]["len_ok"] and not got[2]["keep"]
        assert not got[3]["token_len_ok"] and not got[3]["keep"]
        assert got[4]["len_ok"] and not got[4]["has_stopword"]
        assert not got[4]["keep"]

    def test_no_shuffle_plan(self, spark):
        import os
        from conftest import SF_DIR
        from tuplex_spark.functions.text import c4_filters
        docs = spark.read.parquet(os.path.join(SF_DIR,
                                               "documents.parquet"))
        plan = c4_filters(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestBasketPairs:
    def test_counts_and_tiebreak(self, spark):
        from tuplex_spark.functions.analytics import basket_pairs
        rows = [(1, 10), (1, 20), (1, 30),
                (2, 10), (2, 20),
                (3, 10), (3, 20), (3, 20)]  # dup line collapses
        li = spark.createDataFrame(rows,
                                   "l_orderkey long, l_partkey long")
        got = [(r["part_a"], r["part_b"], r["n_orders"])
               for r in basket_pairs(li, top_k=3).collect()]
        assert got[0] == (10, 20, 3)
        assert set(got[1:]) == {(10, 30, 1), (20, 30, 1)}
        # deterministic tie-break between the two count-1 pairs
        assert got[1] == (10, 30, 1)

    def test_no_cartesian(self, spark):
        import os
        from conftest import SF_DIR
        from tuplex_spark.functions.analytics import basket_pairs
        li = spark.read.parquet(os.path.join(SF_DIR,
                                             "lineitem.parquet"))
        plan = basket_pairs(li)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestTrainedIvf:
    def test_trained_centroids_match_oracle(self, spark, con):
        from pyspark.sql import functions as F
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        cents = similarity.kmeans_fit(emb, c=8, rounds=2)
        queries = (emb.filter(F.col("vec_id") < 6)
                   .select(F.col("vec_id").alias("q_id"),
                           F.col("embedding").alias("q_vec")))
        got = sorted(tuple(r) for r in similarity.batch_ivf_topk(
            emb, queries, cents, k=5, nprobe=2).collect())
        sql = similarity.batch_ivf_topk_sql(
            cent_sql=similarity.kmeans_cent_sql(c=8, rounds=2),
            k=5, nprobe=2, query_pred="vec_id < 6")
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want

    def test_cent_sql_matches_fit(self, spark, con):
        from tuplex_spark.functions import similarity
        emb = spark.read.parquet(EMB)
        cents = dict(similarity.kmeans_fit(emb, c=4, rounds=2))
        rows = con.execute(
            similarity.kmeans_cent_sql(c=4, rounds=2)).fetchall()
        assert {cid: list(cv) for cid, cv in rows} == \
            {cid: list(cv) for cid, cv in cents.items()}


class TestBpe:
    def test_merge_table_matches_oracle(self, spark, con):
        from tuplex_spark.functions import text
        df = text.bpe_merge_table(spark.read.parquet(DOC), k=6)
        assert_matches(df, con, text.bpe_merge_table_sql(k=6))

    def test_subword_counts_match_oracle(self, spark, con):
        from tuplex_spark.functions import text
        df = text.bpe_subword_counts(spark.read.parquet(DOC), k=6)
        assert_matches(df, con, text.bpe_subword_counts_sql(k=6))

    def test_classic_bpe_semantics(self, spark):
        # Sennrich's canonical behavior on a controlled vocabulary:
        # 'aaab' x3 + 'ab' x1.  Round 1: (a,a) 2*3=6, (a,b) 3+1=4 ->
        # merge (a,a); aaab=[aa,a,b], ab=[a,b].  Round 2: (aa,a) 3,
        # (a,b) 3+1=4 -> merge (a,b); aaab=[aa,ab], ab=[ab].
        # Round 3: (aa,ab) 3 -> merge; aaab=[aaab].
        from tuplex_spark.functions import text
        rows = [(1, "aaab aaab aaab ab")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges = text.bpe_train(df, k=3)
        assert merges == [(0, "a", "a", 6), (1, "a", "b", 4),
                          (2, "aa", "ab", 3)], merges
        # encode: 'aaab' -> [aaab] = 1 subword x3; 'ab' -> [ab] = 1
        got = text.bpe_subword_counts(df, k=3).collect()
        assert [(r.doc_id, r.n_subwords) for r in got] == [(1, 4)]

    def test_leftmost_merge_on_chains(self, spark):
        # 'aaaaa' with merge (a,a): leftmost-first -> [aa, aa, a]
        from tuplex_spark.functions import text
        from pyspark.sql import functions as F
        df = spark.createDataFrame([(1, "aaaaa")],
                                   "doc_id long, text string")
        vocab = text._bpe_vocab(df, "text")
        enc = text.bpe_apply(vocab, [(0, "a", "a", 0)])
        syms = enc.select(
            F.expr(text._BPE_SYMBOLS).alias("s")).collect()[0].s
        assert list(syms) == ["aa", "aa", "a"]

    def test_early_stop_when_no_pairs(self, spark):
        # single-char words have no pairs: training stops empty
        from tuplex_spark.functions import text
        df = spark.createDataFrame([(1, "a b c a b")],
                                   "doc_id long, text string")
        assert text.bpe_train(df, k=4) == []

    def test_batched_equals_sequential_on_corpus(self, spark):
        # the batched trainer must reproduce the sequential merge list
        # BITWISE (VERDICT r9 item 4's differential requirement)
        from tuplex_spark.functions import text
        docs = spark.read.parquet(DOC)
        seq = text.bpe_train(docs, k=24)
        for batch in (4, 16):
            assert text.bpe_train_batched(docs, k=24,
                                          batch=batch) == seq, batch

    def test_batched_equals_sequential_adversarial(self, spark):
        # shapes that stress every batch guard: aa-chains (self-pair
        # bound), fresh-symbol collisions ('ab' exists as a word while
        # (a,b) merges), exact count ties
        from tuplex_spark.functions import text
        rows = [(1, "a a a a aaaa aaaa ab ab abab abab x y x y x y"),
                (2, "aaaa aaaa aaaa b a b a b a ab ab"),
                (3, "q r q r q r s t s t u v"),
                (4, "zz zz zzz zzz zzzz tie1 tie1 tie2 tie2")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        seq = text.bpe_train(df, k=14)
        assert text.bpe_train_batched(df, k=14, batch=8) == seq
        assert text.bpe_train_batched(df, k=14, batch=2) == seq

    def test_recheckpoint_does_not_change_merges(self, spark):
        from tuplex_spark.functions import text
        docs = spark.read.parquet(DOC)
        assert (text.bpe_train(docs, k=12, recheckpoint_every=3)
                == text.bpe_train(docs, k=12, recheckpoint_every=0))

    def test_local_trainer_equals_distributed(self, spark):
        from tuplex_spark.functions import text
        docs = spark.read.parquet(DOC)
        assert text.bpe_train_local(docs, k=24) \
            == text.bpe_train(docs, k=24)
        rows = [(1, "a a a a aaaa aaaa ab ab abab abab x y x y x y"),
                (2, "aaaa aaaa aaaa b a b a b a ab ab"),
                (3, "q r q r q r s t s t u v")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        assert text.bpe_train_local(df, k=14) == text.bpe_train(df, k=14)

    def test_batched_trainer_job_count_linear_in_k(self, spark):
        # VERDICT r10 item 8: the batched trainer's k-linearity claim,
        # asserted STRUCTURALLY (Spark job count per k) instead of
        # re-proving the wall-clock curve every bench leg — the
        # trainer is job-launch bound, so jobs ~ k/batch is the claim.
        # Wall-clock assertions flake in this host's documented
        # bandwidth-degradation windows; job counts cannot.
        from pyspark.sql import functions as F
        from tuplex_spark.functions import text
        docs = spark.read.parquet(DOC)
        fused = (docs.select(
            "doc_id",
            F.expr("filter(split(trim(lower(text)), '\\\\s+'),"
                   " x -> x != '')").alias("t"))
            .select("doc_id", F.expr(
                "array_join(zip_with(slice(t, 1, size(t) - 1), "
                "slice(t, 2, size(t) - 1), (a, b) -> concat(a, b)), "
                "' ')").alias("text")))
        sc = spark.sparkContext
        st = sc.statusTracker()

        def jobs_for(k):
            group = f"bpe_jobcount_{k}"
            sc.setJobGroup(group, "bpe job-count probe")
            try:
                merges = text.bpe_train_batched(fused, k=k, batch=16,
                                                vocab_partitions=1)
            finally:
                sc.setJobGroup(None, None)
            assert len(merges) == k
            return len(st.getJobIdsForGroup(group))

        j64, j128 = jobs_for(64), jobs_for(128)
        # linear: doubling k at fixed batch at most doubles the job
        # count (+ slack for batch rounds ended early by the
        # prefix-acceptance guards); the O(k^2) failure mode this
        # guards (per-round lineage replay) shows up as per-round
        # JOBS or time, never fewer rounds
        assert j128 <= 2 * j64 + 4, (j64, j128)
        # and jobs per MERGE stay constant-bounded (a batch round is
        # one pair-table collect; worst case every round degenerates
        # to a single accepted merge — this corpus' interacting pair
        # counts do exactly that, ~1 round/merge — but never MORE
        # than a bounded number of jobs per merge)
        assert j64 <= 64 * 2 + 4, j64

    def test_local_trainer_tokenizer_scale(self, spark):
        # the production contract: thousands of merges in one collect +
        # a local loop — exhausts the synthetic vocab and agrees with
        # the batched trainer on the shared prefix
        import time
        from pyspark.sql import functions as F
        from tuplex_spark.functions import text
        docs = spark.read.parquet(DOC)
        fused = (docs.select(
            "doc_id",
            F.expr("filter(split(trim(lower(text)), '\\\\s+'),"
                   " x -> x != '')").alias("t"))
            .select("doc_id", F.expr(
                "array_join(zip_with(slice(t, 1, size(t) - 1), "
                "slice(t, 2, size(t) - 1), (a, b) -> concat(a, b)), "
                "' ')").alias("text")))
        t0 = time.time()
        big = text.bpe_train_local(fused, k=4096)
        dt = time.time() - t0
        assert len(big) >= 1000  # vocab-capacity bounded, not k-bounded
        # guards against an O(k*vocab) regression (orders of magnitude
        # slower, minutes); generous because this host has documented
        # windowed 2-2.5x memory-bandwidth degradation (BASELINE.md
        # round-10 section) that would flake a tight wall-clock bound
        assert dt < 300, dt
        small = text.bpe_train_batched(fused, k=256, batch=32,
                                       vocab_partitions=1)
        assert big[:256] == small
        # the driver-collect guard (VERDICT r10 item 3): a vocabulary
        # past max_vocab must refuse loudly BEFORE collecting
        import pytest as _pytest
        with _pytest.raises(ValueError, match="max_vocab"):
            text.bpe_train_local(fused, k=4, max_vocab=10)
