"""Join semantics: column order, prefixes/suffixes, left join nulls
(reference: JoinOperator.cc output layout, test/core/JoinTest.cc)."""


LEFT = [(1, "a"), (2, "b"), (3, "c")]
RIGHT = [(1, 10.0), (1, 11.0), (3, 30.0), (4, 40.0)]


class TestInnerJoin:
    def test_column_order(self, ctx):
        l = ctx.parallelize(LEFT, ["k", "v"])
        r = ctx.parallelize(RIGHT, ["rk", "amt"])
        j = l.join(r, "k", "rk")
        # left non-key, key, right non-key
        assert j.columns == ["v", "k", "amt"]
        assert sorted(j.collect()) == [("a", 1, 10.0), ("a", 1, 11.0),
                                       ("c", 3, 30.0)]

    def test_prefixes(self, ctx):
        l = ctx.parallelize(LEFT, ["k", "v"])
        r = ctx.parallelize(RIGHT, ["rk", "v"])
        j = l.join(r, "k", "rk", prefixes=("l_", "r_"))
        assert j.columns == ["l_v", "l_k", "r_v"]

    def test_suffixes(self, ctx):
        l = ctx.parallelize(LEFT, ["k", "v"])
        r = ctx.parallelize(RIGHT, ["rk", "v"])
        j = l.join(r, "k", "rk", suffixes=("_l", "_r"))
        assert j.columns == ["v_l", "k_l", "v_r"]

    def test_null_keys_never_match(self, ctx):
        l = ctx.parallelize([(1, "a"), (None, "n")], ["k", "v"])
        r = ctx.parallelize([(1, "x"), (None, "y")], ["rk", "w"])
        j = l.join(r, "k", "rk")
        assert j.collect() == [("a", 1, "x")]


class TestLeftJoin:
    def test_unmatched_left_rows_null(self, ctx):
        l = ctx.parallelize(LEFT, ["k", "v"])
        r = ctx.parallelize([(1, 10.0)], ["rk", "amt"])
        j = l.leftJoin(r, "k", "rk")
        assert sorted(j.collect(), key=lambda t: t[1]) == [
            ("a", 1, 10.0), ("b", 2, None), ("c", 3, None)]


class TestJoinAfterUDF:
    def test_compiled_pipeline_feeds_join(self, ctx):
        l = (ctx.parallelize(LEFT, ["k", "v"])
             .withColumn("k2", lambda x: x["k"] * 10))
        r = ctx.parallelize([(10, "ten"), (30, "thirty")], ["rk", "name"])
        j = l.join(r, "k2", "rk")
        assert sorted(j.collect()) == [(1, "a", 10, "ten"),
                                       (3, "c", 30, "thirty")]


class TestRightJoin:
    def test_rightjoin_keeps_unmatched_right(self, ctx):
        left = ctx.parallelize([(1, "a"), (2, "b")], columns=["k", "lv"])
        right = ctx.parallelize([(2, "x"), (3, "y")], columns=["rk", "rv"])
        j = left.rightJoin(right, "k", "rk")
        assert j.columns == ["lv", "k", "rv"]
        rows = sorted(j.collect(), key=lambda r: r[1])
        assert rows == [("b", 2, "x"), (None, 3, "y")]

    def test_rightjoin_prefixes(self, ctx):
        left = ctx.parallelize([(1, "a")], columns=["k", "v"])
        right = ctx.parallelize([(1, "b"), (9, "z")], columns=["k2", "v"])
        j = left.rightJoin(right, "k", "k2", prefixes=("L_", "R_"))
        assert j.columns == ["L_v", "L_k", "R_v"]
        rows = sorted(j.collect(), key=lambda r: (r[1] is None, r[1]))
        assert rows == [("a", 1, "b"), (None, 9, "z")]


class TestRelationalExtensions:
    """orderBy/limit/union/intersect/subtract — parity-plus ops the
    reference lacks (SURVEY §2.5), delegated to Spark with exception
    bookkeeping."""

    def test_orderby_and_limit(self, ctx):
        ds = ctx.parallelize([(3, "c"), (1, "a"), (2, "b")],
                             columns=["n", "s"])
        assert ds.orderBy("n").collect() == [(1, "a"), (2, "b"), (3, "c")]
        assert ds.orderBy("n", ascending=False).limit(2).collect() \
            == [(3, "c"), (2, "b")]

    def test_orderby_splits_exception_rows(self, ctx):
        ds = (ctx.parallelize([4, 0, 2, 1])
              .map(lambda x: 12 // x)
              .ignore(ZeroDivisionError))
        assert ds.orderBy("column0").collect() == [3, 6, 12]

    def test_union_intersect_subtract(self, ctx):
        a = ctx.parallelize([(1, "x"), (2, "y"), (3, "z")],
                            columns=["n", "s"])
        b = ctx.parallelize([(2, "y"), (4, "w")], columns=["n", "s"])
        assert sorted(a.union(b).collect()) \
            == [(1, "x"), (2, "y"), (2, "y"), (3, "z"), (4, "w")]
        assert a.intersect(b).collect() == [(2, "y")]
        assert sorted(a.subtract(b).collect()) == [(1, "x"), (3, "z")]

    def test_union_by_name_reorders_columns(self, ctx):
        a = ctx.parallelize([(1, "x")], columns=["n", "s"])
        b = ctx.parallelize([("y", 2)], columns=["s", "n"])
        assert sorted(a.union(b).collect()) == [(1, "x"), (2, "y")]


class TestMultiKeyJoin:
    """Multi-key equi-joins (parity-plus; the reference is single-key)."""

    def _sides(self, ctx):
        l = ctx.parallelize([(1, "a", 10), (1, "b", 20), (2, "a", 30)],
                            columns=["k1", "k2", "lv"])
        r = ctx.parallelize([(1, "a", "x"), (2, "a", "y"), (3, "c", "z")],
                            columns=["j1", "j2", "rv"])
        return l, r

    def test_inner_multi_key(self, ctx):
        l, r = self._sides(ctx)
        j = l.join(r, ["k1", "k2"], ["j1", "j2"])
        assert j.columns == ["lv", "k1", "k2", "rv"]
        assert sorted(j.collect()) == [(10, 1, "a", "x"), (30, 2, "a", "y")]

    def test_left_multi_key_null_fill(self, ctx):
        l, r = self._sides(ctx)
        j = l.leftJoin(r, ["k1", "k2"], ["j1", "j2"])
        got = sorted(j.collect(), key=lambda t: (t[1], t[2]))
        assert got == [(10, 1, "a", "x"), (20, 1, "b", None),
                       (30, 2, "a", "y")]

    def test_key_arity_mismatch(self, ctx):
        l, r = self._sides(ctx)
        import pytest as _pytest
        with _pytest.raises(ValueError):
            l.join(r, ["k1", "k2"], ["j1"])

    def test_missing_key_column(self, ctx):
        l, r = self._sides(ctx)
        import pytest as _pytest
        with _pytest.raises(KeyError):
            l.join(r, ["k1", "nope"], ["j1", "j2"])
