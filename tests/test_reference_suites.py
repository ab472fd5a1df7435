"""Ports of the reference's test_tuples.py / test_dictionaries.py /
test_nulls.py suites (reference: tuplex/python/tests/), re-expressed as
differential checks: engine output must equal plain CPython on the same
data + UDF, whichever execution path (compiled Columns or Arrow fallback)
the engine picks."""

import math

from conftest import run_diff


class TestTuplesPort:
    """reference test_tuples.py"""

    def test_empty_tuple_map(self, ctx):
        res = ctx.parallelize([1, 2, 4]).map(lambda x: ()).collect()
        assert res == [(), (), ()]

    def test_nested_empty_tuple_passthrough(self, ctx):
        data = [("hello", "", (), ("world", ()))]
        res = ctx.parallelize(data).collect()
        assert res == data

    def test_nested_tuple_map(self, ctx):
        res = ctx.parallelize([(10, 20), (20, 40)]) \
            .map(lambda x: (x, x)).collect()
        assert res == [((10, 20), (10, 20)), ((20, 40), (20, 40))]

    def test_tuple_mixed_with_empty(self, ctx):
        res = ctx.parallelize([1, 2, 4]) \
            .map(lambda x: (x, x + 1, (), x * x)).collect()
        assert res == [(1, 2, (), 1), (2, 3, (), 4), (4, 5, (), 16)]

    def test_tuple_with_strings(self, ctx):
        res = ctx.parallelize([(10, "hello"), (20, "world")]) \
            .map(lambda x: (x, "test")).collect()
        assert res == [((10, "hello"), "test"), ((20, "world"), "test")]

    def test_multi_param_unpacking(self, ctx):
        res = ctx.parallelize([(10, 20), (40, 50)]) \
            .map(lambda a, b: a + b).collect()
        assert res == [30, 90]

    def test_multi_param_unpacking_nested(self, ctx):
        res = ctx.parallelize([(10, (30, 40), 20), (40, (10, 20), 50)]) \
            .map(lambda a, b, c: b).map(lambda a, b: a + b).collect()
        assert res == [70, 30]

    def test_multiline_lambda_extraction(self, ctx):
        res = ctx.parallelize([1, 3, 5]).map(lambda x: (x,
                                                        x + 1)) \
            .collect()
        assert res == [(1, 2), (3, 4), (5, 6)]

    def test_tuple_slices(self, ctx):
        data = [(1, 2, 3, 4, 5, 6), (4, 5, 6, 7, 10, 11),
                (-10, -12, 0, -1, 2, 4)]
        funcs = [lambda x: x[-2:], lambda x: x[:-2], lambda x: x[::-2],
                 lambda x: x[3:], lambda x: x[:3], lambda x: x[::3],
                 lambda x: x[1:], lambda x: x[:1], lambda x: x[::1],
                 lambda x: x[-10:], lambda x: x[:10], lambda x: x[::-1],
                 lambda x: x[4:1:-2], lambda x: x[1:4:2],
                 lambda x: x[-10:10:2]]
        for func in funcs:
            run_diff(ctx, data, func)

    def test_single_element_tuple_expr(self, ctx):
        def f(x):
            return x,
        res = ctx.parallelize([1, 2, 3]).map(f).collect()
        assert res == [(1,), (2,), (3,)]

    def test_swap_via_params(self, ctx):
        def swap(a, b):
            return b, a
        res = ctx.parallelize([("a", 1), ("b", 2)]).map(swap).collect()
        assert res == [(1, "a"), (2, "b")]

    def test_swap_via_unpack_assign(self, ctx):
        def swap(x):
            b, a = x
            y = a, b
            return y
        res = ctx.parallelize([("a", 1), ("b", 2)]).map(swap).collect()
        assert res == [(1, "a"), (2, "b")]

    def test_swap_via_simultaneous_assign(self, ctx):
        def swap(x):
            a = x[0]
            b = x[1]
            b, a = a, b
            return a, b
        res = ctx.parallelize([("a", 1), ("b", 2)]).map(swap).collect()
        assert res == [(1, "a"), (2, "b")]


class TestDictionariesPort:
    """reference test_dictionaries.py (non-str-literal-keyed dicts take
    the fallback path here; results must still match CPython)."""

    STRINGS = [("hello", "world"), ("foo", "bar"), ("blank", ""),
               ("", "another"), ("", "")]

    # NOTE on popitem order: the reference's popitem returns the FIRST
    # inserted item (its C++ dict predates CPython's 3.7 ordering
    # guarantee); this engine follows modern CPython, where popitem is
    # LIFO.  The ported expectations below are computed with CPython.

    def test_popitem_int_keys(self, ctx):
        res = ctx.parallelize(self.STRINGS) \
            .map(lambda a, b: {1: a, 2: b}.popitem()).collect()
        assert res == [{1: a, 2: b}.popitem() for a, b in self.STRINGS]

    def test_pop_bool_keys(self, ctx):
        res = ctx.parallelize(self.STRINGS) \
            .map(lambda a, b: {True: a, False: b}.pop(False)).collect()
        assert res == ["world", "bar", "", "another", ""]

    def test_popitem_computed_float_keys(self, ctx):
        ints = [(1, 2, 3), (4, 5, 6), (7, 8, 9)]
        res = ctx.parallelize(ints) \
            .map(lambda a, b, c: {a * 1.2: a + c, -4.569: b}.popitem()) \
            .collect()
        assert res == [{a * 1.2: a + c, -4.569: b}.popitem()
                       for a, b, c in ints]

    def test_pop_dynamic_key(self, ctx):
        ints = [(1, 2, 3), (4, 5, 6), (7, 8, 9)]
        res = ctx.parallelize(ints) \
            .map(lambda a, b, c: {a: True, b: False, c: True}.pop(b)) \
            .collect()
        assert res == [False, False, False]

    def test_popitem_str_float_keys(self, ctx):
        floats = [(1.2, 3.4), (5.6, 7.8), (9.0, 0.1)]
        res = ctx.parallelize(floats) \
            .map(lambda a, b: {str(a): a + b, str(b): b}.popitem()) \
            .collect()
        expected = [{str(a): a + b, str(b): b}.popitem() for a, b in floats]
        for (s1, d1), (s2, d2) in zip(res, expected):
            assert s1 == s2
            assert math.isclose(d1, d2)

    def test_pop_type_matrix(self, ctx):
        strings = [("hello", "world", "hi"), ("foo", "bar", "baz"),
                   ("blank", "", "not")]
        ints = [(1, 2, 3), (4, 5, 6), (7, 8, 9)]
        floats = [(1.2, 3.4, -100.2), (5.6, 7.8, -1.234), (9.0, 0.1, 2.3)]
        bools = [(True, False, False), (False, True, True),
                 (False, True, False)]
        for l1 in [strings, ints, floats, bools]:
            for l2 in [strings, ints, floats, bools]:
                if l1 == bools:  # only two distinct keys
                    l3 = [x[:2] + y[:2] for x, y in zip(l1, l2)]
                    lam = lambda x, y, a, b: {x: a, y: b}.pop(y)
                    ref = lambda x: {x[0]: x[2], x[1]: x[3]}.pop(x[1])
                else:
                    l3 = [x + y for x, y in zip(l1, l2)]
                    lam = lambda x, y, z, a, b, c: \
                        {x: a, y: b, z: c}.pop(y)
                    ref = lambda x: \
                        {x[0]: x[3], x[1]: x[4], x[2]: x[5]}.pop(x[1])
                res = ctx.parallelize(l3).map(lam).collect()
                assert res == list(map(ref, l3)), (l1[0], l2[0])

    def test_dict_column_operators(self, ctx):
        res = ctx.parallelize(self.STRINGS) \
            .map(lambda x: {"col1": x[0], "col2": x[1]}) \
            .mapColumn("col1", lambda x: len(x)).collect()
        assert res == [(5, "world"), (3, "bar"), (5, ""), (0, "another"),
                       (0, "")]

    def test_dict_column_chain(self, ctx):
        res = (ctx.parallelize(self.STRINGS)
               .map(lambda x: {"col1": x[0], "col2": x[1]})
               .mapColumn("col1", lambda x: len(x))
               .withColumn("col1", lambda x: x["col1"] + len(x["col2"]))
               .collect())
        assert res == [(10, "world"), (6, "bar"), (5, ""), (7, "another"),
                       (0, "")]

    def test_dict_remap_chain(self, ctx):
        ints = [(1, 2, 3), (4, 5, 6), (7, 8, 9)]
        res = (ctx.parallelize(ints)
               .map(lambda x: {"col1": x[0], "col2": x[1], "col3": x[2]})
               .withColumn("col2", lambda x: x["col2"] - x["col1"])
               .map(lambda x: {"col4": x["col1"],
                               "col5": x["col2"] * x["col3"]})
               .collect())
        assert res == [(1, 3), (4, 6), (7, 9)]

    def test_dict_mixed_type_chain(self, ctx):
        ints = [(1, 2, 3), (4, 5, 6), (7, 8, 9)]
        res = (ctx.parallelize(ints)
               .map(lambda x: {"col1": x[0], "col2": x[1], "col3": x[2]})
               .mapColumn("col1", lambda x: 1.2 * x)
               .withColumn("col1", lambda x: x["col1"] + x["col3"])
               .mapColumn("col2", lambda x: str(x))
               .collect())
        assert res == [(4.2, "2", 3), (10.8, "5", 6), (17.4, "8", 9)]


class TestNullsPort:
    """reference test_nulls.py"""

    def test_eq_neq_none_mixed(self, ctx):
        data = [1, None]
        res = ctx.parallelize(data).map(lambda x: x == None).collect()
        assert res == [x == None for x in data]
        res = ctx.parallelize(data).map(lambda x: x != None).collect()
        assert res == [x != None for x in data]

    def test_null_vs_null(self, ctx):
        res = ctx.parallelize([None, None]).map(lambda x: x == None) \
            .collect()
        assert res == [True, True]
        res = ctx.parallelize([None, None]).map(lambda x: x != None) \
            .collect()
        assert res == [False, False]

    def test_null_vs_int(self, ctx):
        res = ctx.parallelize([None, None]).map(lambda x: x == 42) \
            .collect()
        assert res == [False, False]
        res = ctx.parallelize([None, None]).map(lambda x: x != 42) \
            .collect()
        assert res == [True, True]
