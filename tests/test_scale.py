"""Scale machinery: bucketed co-located joins and skew-salted joins.

These are join STRATEGIES, not new semantics — each test asserts result
equivalence with the plain join (whose semantics the graded ``ds_join``
query pins against the DuckDB oracle) plus the plan property that makes
the strategy worth having at 100 TB (no exchange / balanced tasks).
"""

import os

import pytest

from pyspark.sql import functions as F

from conftest import SF_DIR


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, ctx, tmp_path,
                                           no_broadcast):
        li = (ctx.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
              .selectColumns(["l_orderkey", "l_quantity"]))
        o = (ctx.parquet(os.path.join(SF_DIR, "orders.parquet"))
             .selectColumns(["o_orderkey", "o_totalprice"]))
        li.toparquet(str(tmp_path / "li_b"), bucket_by="l_orderkey",
                     num_buckets=8, sort_by="l_orderkey", table="li_b")
        o.toparquet(str(tmp_path / "o_b"), bucket_by="o_orderkey",
                    num_buckets=8, sort_by="o_orderkey", table="o_b")

        lb = ctx.table("li_b").toDF()
        ob = ctx.table("o_b").toDF()
        j = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        plan = _physical_plan(j)
        assert "Exchange" not in plan, plan
        # same rows as the unbucketed join
        plain = (li.toDF().join(o.toDF(),
                                F.col("l_orderkey") == F.col("o_orderkey"))
                 .count())
        assert j.count() == plain

    def test_bucketed_agg_has_no_exchange(self, ctx, tmp_path,
                                          no_broadcast):
        # partial+final aggregation on the bucket key collapses to one
        # stage: bucketing IS the exchange, paid once at write time
        li = (ctx.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
              .selectColumns(["l_orderkey", "l_quantity"]))
        li.toparquet(str(tmp_path / "li_b2"), bucket_by="l_orderkey",
                     num_buckets=8, table="li_b2")
        agg = (ctx.table("li_b2").toDF()
               .groupBy("l_orderkey").agg(F.sum("l_quantity")))
        assert "Exchange" not in _physical_plan(agg)

    def test_plain_toparquet_roundtrip(self, ctx, tmp_path):
        sup = (ctx.parquet(os.path.join(SF_DIR, "supplier.parquet"))
               .selectColumns(["s_suppkey", "s_acctbal"]))
        sup.toparquet(str(tmp_path / "sup"))
        back = ctx.parquet(str(tmp_path / "sup"))
        assert sorted(back.collect()) == sorted(sup.collect())

    def test_plain_toparquet_sort_by_tightens_row_groups(self, ctx,
                                                         tmp_path):
        """sort_by on a NON-bucketed write must actually sort within
        files (it was silently ignored): every parquet part file's
        values on the sort column come back ordered, so row-group
        min/max stats are tight and reader filters prune."""
        import glob
        import pyarrow.parquet as pq
        li = (ctx.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
              .selectColumns(["l_orderkey", "l_quantity"]))
        li.toparquet(str(tmp_path / "li_s"), sort_by="l_orderkey",
                     num_parts=4)
        parts = glob.glob(str(tmp_path / "li_s" / "*.parquet"))
        assert parts
        for p in parts:
            vals = pq.read_table(p, columns=["l_orderkey"]) \
                .column(0).to_pylist()
            assert vals == sorted(vals), p
        back = ctx.parquet(str(tmp_path / "li_s"))
        assert sorted(back.collect()) == sorted(li.collect())

    def test_plain_toparquet_part_size_splits_files(self, ctx, tmp_path):
        """part_size (tocsv parity) caps records per parquet file via
        the sampled row-size estimate — the writer-side lever against
        one-giant-file outputs."""
        import glob
        li = (ctx.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
              .selectColumns(["l_orderkey", "l_quantity"]))
        li.toparquet(str(tmp_path / "li_p"), part_size=4096,
                     num_parts=1)
        parts = glob.glob(str(tmp_path / "li_p" / "*.parquet"))
        assert len(parts) > 1, parts
        back = ctx.parquet(str(tmp_path / "li_p"))
        assert back.toDF().count() == li.toDF().count()


class TestSaltedJoin:
    def _skewed(self, spark):
        # 90% of fact rows share one key — the classic hot-key shape
        fact = spark.range(0, 2000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
             .otherwise(F.col("id") % 50).alias("k"),
            (F.col("id") * 3).alias("v"))
        dim = spark.range(0, 50).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), "id").alias("name"))
        return fact, dim

    def test_inner_matches_plain_join(self, spark):
        from tuplex_spark.operators.join import salted_join
        fact, dim = self._skewed(spark)
        got = salted_join(fact, dim, "k", n_salt=8).collect()
        want = fact.join(dim, "k").collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    def test_left_keeps_unmatched(self, spark):
        from tuplex_spark.operators.join import salted_join
        fact, dim = self._skewed(spark)
        small_dim = dim.filter(F.col("k") < 5)
        got = salted_join(fact, small_dim, "k", n_salt=4, how="left")
        want = fact.join(small_dim, "k", "left")
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, want.collect()))

    def test_salt_spreads_hot_key(self, spark):
        from tuplex_spark.operators.join import salted_join
        fact, dim = self._skewed(spark)
        f = salted_join(fact, dim, "k", n_salt=8)
        # the join key set on the salted side is (k, salt): the hot key's
        # rows land in >1 sub-key (full-row hash spreads distinct rows)
        salts = (fact.withColumn(
            "__salt", F.pmod(F.xxhash64("k", "v"), F.lit(8)))
            .filter(F.col("k") == 7)
            .select("__salt").distinct().count())
        assert salts > 1
        assert f.count() == fact.join(dim, "k").count()

    def test_rejects_unsupported_how(self, spark):
        from tuplex_spark.operators.join import salted_join
        fact, dim = self._skewed(spark)
        with pytest.raises(ValueError):
            salted_join(fact, dim, "k", how="full")


class TestPartitionedWrite:
    def test_partition_by_prunes_reads(self, ctx, spark, tmp_path):
        li = (ctx.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
              .selectColumns(["l_returnflag", "l_orderkey", "l_quantity"]))
        out = str(tmp_path / "li_part")
        li.toparquet(out, partition_by="l_returnflag")
        back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        import re as _re
        m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "l_returnflag" in m.group(1), plan
        want = li.toDF().filter(F.col("l_returnflag") == "R").count()
        assert back.count() == want

    def test_partition_and_bucket_exclusive(self, ctx, tmp_path):
        li = (ctx.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
              .selectColumns(["l_returnflag", "l_orderkey"]))
        with pytest.raises(ValueError):
            li.toparquet(str(tmp_path / "x"), bucket_by="l_orderkey",
                         partition_by="l_returnflag")


class TestLSHScaling:
    """Scaling-exponent canaries for the dedup/LSH family: candidate-
    pair work must grow ~linearly with a DECORRELATED corpus, never
    quadratically.  dedup_embedding regressed exactly this way once (a
    fixed 2^6-value band space made occupancy linear in N and pairs
    quadratic — 14x super-linear at 10x data); these tests lock the
    corpus-adaptive granularity so a parameter change can't silently
    reintroduce it."""

    def _replicated_embeddings(self, spark, k):
        # decorrelated replicas: rotating vector components changes
        # SRP signatures, so replicas don't form cross-replica pairs
        emb = spark.read.parquet(os.path.join(SF_DIR, "..", "sf0.01",
                                              "embeddings.parquet"))
        parts = [emb.select(
            (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
            F.concat(F.slice("embedding", i + 1, 1 << 20),
                     F.slice("embedding", 1, i)).alias("embedding"))
            for i in range(k)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    def _candidate_count(self, df, n):
        from tuplex_spark.functions import dedup
        nbits = dedup.adaptive_nbits(n)
        base = df.select(F.col("vec_id").alias("id"),
                         F.col("embedding").alias("v"))
        keyed = base.select(
            "id", dedup.srp_band_keys(F.col("v"), 64, nbits, 8)
            .alias("ks"))
        buckets = keyed.select("id", F.posexplode("ks").alias("band", "h"))
        return dedup._bucket_pairs(buckets, 200).count()

    def test_embedding_candidates_linearish(self, spark):
        # adaptive nbits pins expected occupancy to (16, 32], which
        # bounds candidate pairs PER ROW by bands*(occ-1)/2 ~ 124 —
        # assert that absolute bound (2x skew slack), and assert
        # ~linear growth between two sizes of EQUAL occupancy
        # (5000@nbits8 and 10000@nbits9 both sit at occ 19.5; the
        # fixed-nbits failure mode grew pairs ~4x here, occ 78->156)
        c10 = self._candidate_count(
            self._replicated_embeddings(spark, 10), 5000)
        c20 = self._candidate_count(
            self._replicated_embeddings(spark, 20), 10000)
        assert c10 > 0
        assert c10 <= 5000 * 124 * 2, c10
        assert c20 <= 10000 * 124 * 2, c20
        assert c20 <= 2 * c10 * 1.75, (c10, c20)

    def test_minhash_jaccard_pairs_linearish(self, spark):
        # decorrelated text replicas (vowel rotation): reported pairs
        # for minhash and inverted-index jaccard must grow ~linearly
        from tuplex_spark.functions import dedup
        doc = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        vows = "aeiou"
        parts = [doc.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
            F.concat(F.lit(f"r{i} "),
                     F.translate("text", vows,
                                 vows[i % 5:] + vows[:i % 5]))
            .alias("text"))
            for i in range(4)]
        doc4 = parts[0]
        for p in parts[1:]:
            doc4 = doc4.unionAll(p)
        m1 = dedup.minhash_lsh_pairs(doc).count()
        m4 = dedup.minhash_lsh_pairs(doc4).count()
        j1 = dedup.ngram_jaccard_pairs(doc, n=2, threshold=0.2).count()
        j4 = dedup.ngram_jaccard_pairs(doc4, n=2, threshold=0.2).count()
        assert m4 <= 4 * max(m1, 1) * 2.5, (m1, m4)
        assert j4 <= 4 * max(j1, 1) * 2.5, (j1, j4)

    def test_winnow_pairs_linearish(self, spark):
        # decorrelated replicas: winnowing pair count must grow
        # ~linearly (the stop-fingerprint cap bounds hot buckets, so no
        # quadratic cross-replica blow-up)
        from tuplex_spark.functions import dedup
        doc = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        vows = "aeiou"
        parts = [doc.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
            F.concat(F.lit(f"r{i} "),
                     F.translate("text", vows,
                                 vows[i % 5:] + vows[:i % 5]))
            .alias("text"))
            for i in range(4)]
        doc4 = parts[0]
        for p in parts[1:]:
            doc4 = doc4.unionAll(p)
        w1 = dedup.winnow_pairs(doc, k=3, w=4, min_shared=2).count()
        w4 = dedup.winnow_pairs(doc4, k=3, w=4, min_shared=2).count()
        assert w1 > 0
        assert w4 <= 4 * w1 * 2.5, (w1, w4)
