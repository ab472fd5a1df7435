"""Aggregate triples: recognized native lowering + generic fold fallback
(reference: test_aggregates.py)."""


class TestWholeDataset:
    def test_count_shape(self, ctx):
        data = [1, 2, 3, 4, 5, 6]
        r = ctx.parallelize(data).aggregate(
            lambda a, b: a + b, lambda a, x: a + 1, 0).collect()
        assert r[0] == len(data)

    def test_sum_shape(self, ctx):
        data = [1, 2, 3, 4, 5, 6]
        r = ctx.parallelize(data).aggregate(
            lambda a, b: a + b, lambda a, x: a + x, 0).collect()
        assert r[0] == sum(data)

    def test_min_max_tuple_state(self, ctx):
        data = [5.0, -2.0, 9.5, 1.0]
        r = ctx.parallelize(data).aggregate(
            lambda a, b: (min(a[0], b[0]), max(a[1], b[1])),
            lambda a, x: (min(a[0], x), max(a[1], x)),
            (1e18, -1e18)).collect()
        assert r == [(-2.0, 9.5)]

    def test_initial_value_added(self, ctx):
        r = ctx.parallelize([1, 2, 3]).aggregate(
            lambda a, b: a + b, lambda a, x: a + x, 100).collect()
        assert r[0] == 106

    def test_conditional_sum(self, ctx):
        data = [(1, 5.0), (2, 6.0), (3, 7.0)]
        r = ctx.parallelize(data, ["k", "v"]).aggregate(
            lambda a, b: a + b,
            lambda a, x: a + (x["v"] if x["k"] % 2 == 1 else 0.0),
            0.0).collect()
        assert r == [12.0]

    def test_generic_fold_fallback_dict_state(self, ctx):
        """Dict-state folds can't lower to native aggs -> rdd path."""
        data = ["a", "b", "a", "c", "a"]

        def agg(d, x):
            d = dict(d)
            d[x] = d.get(x, 0) + 1
            return d

        def comb(d1, d2):
            out = dict(d1)
            for k, v in d2.items():
                out[k] = out.get(k, 0) + v
            return out
        r = ctx.parallelize(data).aggregate(comb, agg, {}).collect()
        assert r == [{"a": 3, "b": 1, "c": 1}]


class TestByKey:
    DATA = [(0, 10.0), (1, 20.0), (0, -4.5)]

    def test_sum_by_key(self, ctx):
        res = ctx.parallelize(self.DATA, ["id", "volume"]).aggregateByKey(
            lambda a, b: a + b, lambda a, x: a + x["volume"], 0.0,
            ["id"]).collect()
        res = sorted(res)
        assert res[0][0] == 0 and abs(res[0][1] - 5.5) < 1e-9
        assert res[1][0] == 1 and abs(res[1][1] - 20.0) < 1e-9

    def test_multi_slot(self, ctx):
        res = ctx.parallelize(self.DATA, ["id", "volume"]).aggregateByKey(
            lambda a, b: (a[0] + b[0], a[1] + b[1]),
            lambda a, x: (a[0] + x["volume"], a[1] + 1),
            (0.0, 0), ["id"]).collect()
        assert sorted(res) == [(0, 5.5, 2), (1, 20.0, 1)]

    def test_fold_fallback_by_key(self, ctx):
        """Non-monoid fold (list state) -> applyInPandas path."""
        def agg(acc, x):
            return acc + [x["volume"]]

        def comb(a, b):
            return a + b
        res = ctx.parallelize(self.DATA, ["id", "volume"]).aggregateByKey(
            comb, agg, [], ["id"]).collect()
        got = {k: sorted(v) for k, v in res}
        assert got == {0: [-4.5, 10.0], 1: [20.0]}


class TestUnique:
    def test_unique(self, ctx):
        data = [(1, "a"), (1, "a"), (2, "b"), (1, "c")]
        r = ctx.parallelize(data, ["n", "s"]).unique().collect()
        assert sorted(r) == [(1, "a"), (1, "c"), (2, "b")]

    def test_unique_scalar(self, ctx):
        r = ctx.parallelize([3, 1, 3, 2, 1]).unique().collect()
        assert sorted(r) == [1, 2, 3]
