"""Temporal joins (as-of / range): semantics vs hand-computed and
DuckDB oracles, plus the PLAN properties that make them scale — no
nested-loop/cartesian anywhere, as-of is a window pass with one shuffle.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

TRADES = [
    (1, 10.0, "A"), (2, 20.0, "A"), (3, 30.0, "A"),
    (2, 200.0, "B"), (9, 900.0, "B"),
]
QUOTES = [
    (1, 1.0, "A"), (3, 3.0, "A"),
    (5, 5.0, "B"),
]


@pytest.fixture()
def tq(spark):
    t = spark.createDataFrame(TRADES, "ts long, price double, sym string")
    q = spark.createDataFrame(QUOTES, "ts long, quote double, sym string")
    return t, q


class TestAsof:
    def test_backward_with_ties(self, tq):
        from tuplex_spark.operators.temporal import asof_join
        t, q = tq
        out = {(r["sym"], r["ts"]): r["quote"]
               for r in asof_join(t, q, on="ts", by="sym").collect()}
        # ties match (ts=1 sees quote@1; ts=3 sees quote@3)
        assert out[("A", 1)] == 1.0
        assert out[("A", 2)] == 1.0
        assert out[("A", 3)] == 3.0
        assert out[("B", 2)] is None     # nothing at-or-before
        assert out[("B", 9)] == 5.0

    def test_forward(self, tq):
        from tuplex_spark.operators.temporal import asof_join
        t, q = tq
        out = {(r["sym"], r["ts"]): r["quote"]
               for r in asof_join(t, q, on="ts", by="sym",
                                  direction="forward").collect()}
        assert out[("A", 1)] == 1.0      # ties match forward too
        assert out[("A", 2)] == 3.0
        assert out[("B", 2)] == 5.0
        assert out[("B", 9)] is None

    def test_tolerance(self, tq):
        from tuplex_spark.operators.temporal import asof_join
        t, q = tq
        out = {(r["sym"], r["ts"]): r["quote"]
               for r in asof_join(t, q, on="ts", by="sym",
                                  tolerance=1).collect()}
        assert out[("A", 1)] == 1.0      # gap 0 <= 1
        assert out[("A", 2)] == 1.0      # gap 1 <= 1
        assert out[("B", 9)] is None     # gap 4 > 1

    def test_matches_duckdb_asof(self, tq):
        from tuplex_spark.operators.temporal import asof_join
        t, q = tq
        got = sorted((r["sym"], r["ts"], r["price"], r["quote"])
                     for r in asof_join(t, q, on="ts", by="sym")
                     .select("sym", "ts", "price", "quote").collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE t(ts BIGINT, price DOUBLE, sym VARCHAR)")
        con.execute("CREATE TABLE q(ts BIGINT, quote DOUBLE, sym VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?,?,?)", TRADES)
        con.executemany("INSERT INTO q VALUES (?,?,?)", QUOTES)
        want = sorted(tuple(r) for r in con.execute(
            "SELECT t.sym, t.ts, t.price, q.quote FROM t "
            "ASOF LEFT JOIN q ON t.sym = q.sym AND t.ts >= q.ts")
            .fetchall())
        assert got == want

    def test_plan_is_window_not_join(self, tq):
        from tuplex_spark.operators.temporal import asof_join
        t, q = tq
        plan = asof_join(t, q, on="ts", by="sym") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, plan
        assert "Window" in plan, plan


class TestRangeJoin:
    def test_inner_matches_inequality_join(self, spark):
        from tuplex_spark.operators.temporal import range_join
        pts = spark.createDataFrame(
            [(i, float(i * 7 % 50), "K") for i in range(40)],
            "pid long, t double, k string")
        iv = spark.createDataFrame(
            [(100, 5.0, 12.0, "K"), (101, 11.0, 30.0, "K"),
             (102, 45.0, 60.0, "K"), (103, 0.0, 50.0, "X")],
            "iid long, lo double, hi double, k string")
        got = sorted((r["pid"], r["iid"]) for r in range_join(
            pts, iv, point="t", start="lo", end="hi", by="k",
            bin_width=10.0).collect())
        want = sorted(
            (p, i) for (p, t, pk) in [(r[0], r[1], r[2])
                                      for r in pts.collect()]
            for (i, lo, hi, ik) in [(r[0], r[1], r[2], r[3])
                                    for r in iv.collect()]
            if pk == ik and lo <= t <= hi)
        assert got == want and len(got) > 0

    def test_left_outer_keeps_unmatched(self, spark):
        from tuplex_spark.operators.temporal import range_join
        pts = spark.createDataFrame(
            [(1, 5.0, "K"), (2, 99.0, "K")], "pid long, t double, k string")
        iv = spark.createDataFrame(
            [(10, 0.0, 10.0, "K")], "iid long, lo double, hi double, k string")
        rows = {r["pid"]: r["iid"] for r in range_join(
            pts, iv, point="t", start="lo", end="hi", by="k",
            bin_width=10.0, how="left").collect()}
        assert rows == {1: 10, 2: None}

    def test_left_outer_null_payload_not_duplicated(self, spark):
        # ADVICE r4 (high): the old inner-join + left_anti shape used
        # null-unsafe equality on every left column, so a MATCHED left
        # row carrying a NULL payload also failed to match itself in
        # the anti-join and was re-emitted null-padded.  The single
        # left-outer join (residual folded into the condition) can't.
        from tuplex_spark.operators.temporal import range_join
        pts = spark.createDataFrame(
            [(1, 5.0, "K", None), (2, 99.0, "K", "x"), (3, 7.0, "K", None)],
            "pid long, t double, k string, payload string")
        iv = spark.createDataFrame(
            [(10, 0.0, 10.0, "K")], "iid long, lo double, hi double, k string")
        rows = sorted((r["pid"], r["iid"]) for r in range_join(
            pts, iv, point="t", start="lo", end="hi", by="k",
            bin_width=10.0, how="left").collect())
        assert rows == [(1, 10), (2, None), (3, 10)]

    def test_plan_has_no_nested_loop(self, spark):
        from tuplex_spark.operators.temporal import range_join
        pts = spark.createDataFrame(
            [(1, 5.0, "K")], "pid long, t double, k string")
        iv = spark.createDataFrame(
            [(10, 0.0, 10.0, "K")], "iid long, lo double, hi double, k string")
        plan = range_join(pts, iv, point="t", start="lo", end="hi",
                          by="k", bin_width=10.0) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan, plan
        assert "Cartesian" not in plan, plan


def test_range_join_rejects_interval_col_in_by(spark):
    """start/end listed in `by` would silently drop the interval bounds
    from the join condition (and previously raised a bare KeyError) —
    must be a clear ValueError instead."""
    import pytest
    from tuplex_spark.operators.temporal import range_join
    l = spark.createDataFrame([(1, 5.0)], "k long, ts double")
    r = spark.createDataFrame([(1, 0.0, 10.0)],
                              "k long, lo double, hi double")
    with pytest.raises(ValueError, match="cannot also be"):
        range_join(l, r, point="ts", start="lo", end="hi",
                   by=["k", "lo"])
