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


class TestListsPort:
    """reference test_lists.py"""

    TYPED = {
        "strings": [("hello", "world", "hi"), ("foo", "bar", "baz"),
                    ("blank", "", "not")],
        "ints": [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
        "floats": [(1.2, 3.4, -100.2), (5.6, 7.8, -1.234), (9.0, 0.1, 2.3)],
        "bools": [(True, False, False), (False, True, True),
                  (False, True, False)],
    }

    def test_roundtrip_through_list(self, ctx):
        for name, data in self.TYPED.items():
            res = ctx.parallelize(data) \
                .map(lambda x, y, z: [x, y, z]) \
                .map(lambda x: (x[0], x[1], x[2])).collect()
            assert res == data, name

    def test_list_return(self, ctx):
        for name, data in self.TYPED.items():
            res = ctx.parallelize(data) \
                .map(lambda x, y, z: [x, y, z]).collect()
            assert res == [[x, y, z] for x, y, z in data], name

    def test_multiple_list_return(self, ctx):
        data = self.TYPED["ints"]
        res = ctx.parallelize(data) \
            .map(lambda x, y, z: ([x, y], [z], [z, y])).collect()
        assert res == [([x, y], [z], [z, y]) for x, y, z in data]

    def test_empty_list_return(self, ctx):
        res = ctx.parallelize([1, 2, 3]).map(lambda x: []).collect()
        assert res == [[], [], []]

    def test_parallelize_list_columns(self, ctx):
        data = self.TYPED["ints"]
        ll = [(list(x[:2]), list(x)) for x in data]
        res = ctx.parallelize(ll).map(lambda x, y: [x[0], y[0], x[1]]) \
            .collect()
        assert res == [[x[0][0], x[1][0], x[0][1]] for x in ll]

    def test_range_comprehension(self, ctx):
        ints = [0, 1, 2, 5]
        res = ctx.parallelize(ints) \
            .map(lambda x: [t for t in range(x)]).collect()
        assert res == [[t for t in range(x)] for x in ints]

    def test_string_iteration_comprehension(self, ctx):
        strings = ["this", "is", "a", "test"]
        res = ctx.parallelize(strings) \
            .map(lambda x: [2 * t for t in x]).collect()
        assert res == [[2 * t for t in x] for x in strings]

    def test_list_elementwise_comprehension(self, ctx):
        lists = [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
        res = ctx.parallelize(lists) \
            .map(lambda x: [t * t for t in x]).collect()
        assert res == [[t * t for t in x] for x in lists]


class TestIsPort:
    """reference test_is.py"""

    def test_bool_is_bool(self, ctx):
        data = [False, True, False, False, True]
        res = ctx.parallelize(data).map(lambda x: x is False).collect()
        assert res == [x is False for x in data]

    def test_bool_is_not_bool(self, ctx):
        data = [True, False, True, False, True]
        res = ctx.parallelize(data).map(lambda x: x is not False).collect()
        assert res == [x is not False for x in data]

    def test_bool_is_none(self, ctx):
        data = [True, False, False, True]
        res = ctx.parallelize(data).map(lambda x: x is None).collect()
        assert res == [False] * 4

    def test_none_is_not_none(self, ctx):
        res = ctx.parallelize([None, None, None]) \
            .map(lambda x: x is not None).collect()
        assert res == [False, False, False]

    def test_mixed_none_bool(self, ctx):
        res = ctx.parallelize([None, True, False]) \
            .map(lambda x: x is not None).collect()
        assert res == [False, True, True]


class TestLogicalPort:
    """reference test_logical.py (bool-typed and/or + bitwise)."""

    def test_and_or_constants(self, ctx):
        data = [True, False]
        for fn in [lambda x: x and True, lambda x: x and False,
                   lambda x: x or True, lambda x: x or False,
                   lambda x: x and True or True,
                   lambda x: x and True or False,
                   lambda x: x and False or True,
                   lambda x: x and False or False,
                   lambda x: x or True and True,
                   lambda x: x or True and False,
                   lambda x: x or False and True,
                   lambda x: x or False and False]:
            res = ctx.parallelize(data).map(fn).collect()
            assert res == [bool(fn(x)) for x in data], fn.__code__.co_code

    def test_bitwise_bools(self, ctx):
        data = [(False, False), (False, True), (True, False), (True, True)]
        for fn in [lambda a, b: a & b, lambda a, b: a | b,
                   lambda a, b: a ^ b]:
            res = ctx.parallelize(data).map(fn).collect()
            ref = [fn(a, b) for a, b in data]
            assert [bool(r) for r in res] == [bool(r) for r in ref]


class TestArithmeticPort:
    """reference test_arithmetic.py (spot ports; run_diff handles both
    paths)."""

    def test_add_sub_mixed(self, ctx):
        data = [(1, 2.5), (3, -4.0), (-7, 0.5)]
        run_diff(ctx, data, lambda a, b: a + b)
        run_diff(ctx, data, lambda a, b: a - b)

    def test_div_and_idiv(self, ctx):
        data = [10, 7, -3, 4]
        run_diff(ctx, data, lambda x: x / 4)
        run_diff(ctx, data, lambda x: x // 4)
        run_diff(ctx, data, lambda x: x % 3)

    def test_power(self, ctx):
        run_diff(ctx, [1, 2, 3, 4], lambda x: x ** 2)
        run_diff(ctx, [1.5, 2.5], lambda x: x ** 0.5)

    def test_shifts(self, ctx):
        run_diff(ctx, [1, 2, 8, 1024], lambda x: x << 3)
        run_diff(ctx, [1, 2, 8, 1024], lambda x: x >> 2)

    def test_unary_negation(self, ctx):
        run_diff(ctx, [1, -2, 0], lambda x: -x)
        run_diff(ctx, [True, False], lambda x: not x)

    def test_float_bool_casts(self, ctx):
        run_diff(ctx, [1, 0, -3], lambda x: float(x))
        run_diff(ctx, [1, 0, -3], lambda x: bool(x))


class TestIndexPort:
    """reference test_index.py"""

    def test_positional_index(self, ctx):
        data = [(1, 2), (2, 4), (4, 8)]
        assert ctx.parallelize(data).map(lambda x: x[0]).collect() == \
            [1, 2, 4]
        assert ctx.parallelize(data).map(lambda x: x[1]).collect() == \
            [2, 4, 8]

    def test_negative_index(self, ctx):
        data = [(1, 2), (2, 4), (4, 8)]
        assert ctx.parallelize(data).map(lambda x: x[-1]).collect() == \
            [2, 4, 8]
        assert ctx.parallelize(data).map(lambda x: x[-2]).collect() == \
            [1, 2, 4]

    def test_dynamic_intra_tuple_index(self, ctx):
        # same-typed tuple indexed by its own first element — the
        # reference resolves this at compile time; here the fallback
        # path must still produce CPython results
        data = [(0, 1, 2, 3), (1, 1, 2, 3), (2, 1, 2, 3), (3, 1, 2, 3)]
        res = ctx.parallelize(data).map(lambda x: x[x[0]]).collect()
        assert res == [0, 1, 2, 3]


class TestStringsPort:
    """reference test_strings.py"""

    def test_concat(self, ctx):
        data = [("hello", "world"), ("foo", "bar"), ("blank", ""),
                ("", "another"), ("", "")]
        res = ctx.parallelize(data).map(lambda a, b: a + b).collect()
        assert res == ["helloworld", "foobar", "blank", "another", ""]

    def test_str_int_duplication(self, ctx):
        res = ctx.parallelize([("negative", -2), ("zero", 0),
                               ("hello", 1), ("goodbye", 5)]) \
            .map(lambda a, b: a * b).collect()
        assert res == ["", "", "hello", "goodbye" * 5]
        res = ctx.parallelize([(-2, "negative"), (0, "zero"),
                               (1, "hello"), (6, "foo")]) \
            .map(lambda a, b: a * b).collect()
        assert res == ["", "", "hello", "foo" * 6]

    def test_str_bool_duplication(self, ctx):
        res = ctx.parallelize([(True, "true"), (False, "false")]) \
            .map(lambda a, b: a * b).collect()
        assert res == ["true", ""]
        res = ctx.parallelize([("false", False), ("true", True)]) \
            .map(lambda a, b: a * b).collect()
        assert res == ["", "true"]

    def test_str_slices(self, ctx):
        s = "hello"
        indices = [-10, -2, 3, 1, 10]
        singles = [(s, i) for i in indices]
        run_diff(ctx, singles, lambda a, b: a[b:])
        run_diff(ctx, singles, lambda a, b: a[:b])
        pairs = [(s, x, y) for x in indices for y in indices]
        run_diff(ctx, pairs, lambda a, x, y: a[x:y])

    def test_bool_ordering_strcast(self, ctx):
        # reference notes a bug that occurred only with (False, True)
        test = [(False, True)]
        assert ctx.parallelize(test).map(
            lambda x: (x[0], x[1])).collect() == [(False, True)]
        assert ctx.parallelize(test).map(
            lambda x, y: (str(x), str(y))).collect() == [("False", "True")]
        assert ctx.parallelize(test).map(
            lambda x: (str(x[0]), str(x[1]))).collect() == \
            [("False", "True")]

    def test_strcast_typed_sets(self, ctx):
        for testset in [[-10, 0, 20],
                        ["-10", "hello", "", "   bye   ", "7.123"],
                        [True, False]]:
            res = ctx.parallelize(testset).map(lambda x: str(x)).collect()
            assert res == [str(x) for x in testset], testset


class TestFilterPort:
    """reference test_filter.py"""

    def test_filter_chain(self, ctx):
        ds = ctx.parallelize([1, 2, 3, 4, 5])
        assert ds.map(lambda x: x * x).filter(lambda x: x > 10) \
            .collect() == [16, 25]
        assert ds.filter(lambda x: x == 2 or x == 3 or x == 5) \
            .map(lambda x: x * x * x).collect() == [8, 27, 125]
        assert ds.filter(lambda x: 2 < x <= 4).collect() == [3, 4]

    def test_filter_all(self, ctx):
        assert ctx.parallelize([1, 2, 3, 4, 5]) \
            .filter(lambda x: x > 10).collect() == []


class TestClosurePort:
    """reference test_closure.py"""

    def test_global_capture(self, ctx):
        g = 20

        def f(x):
            return x + g
        assert ctx.parallelize([1, 2, 3]).map(f).collect() == [21, 22, 23]
        assert ctx.parallelize([1, 2, 3]).map(lambda x: x * g).collect() \
            == [20, 40, 60]


class TestResolvePort:
    """reference test_resolve.py"""

    def test_lambda_resolve_scalar(self, ctx):
        ds = ctx.parallelize([0, 1, 2, 3, 4]).map(lambda x: 1. / x)
        assert ds.collect() == [1. / 1, 1. / 2, 1. / 3, 1. / 4]
        assert ds.resolve(ZeroDivisionError, lambda x: 42).collect() == \
            [42, 1. / 1, 1. / 2, 1. / 3, 1. / 4]

    def test_lambda_resolve_tuple(self, ctx):
        ds = ctx.parallelize([(1, 0), (2, 1), (3, 0), (4, 1)]) \
            .map(lambda x: x[0] / x[1])
        assert ds.collect() == [2.0, 4.0]
        assert ds.resolve(ZeroDivisionError, lambda x: 42).collect() == \
            [42, 2.0, 42, 4.0]

    def test_exception_counts_by_class(self, ctx):
        def f(x):
            if x % 2 == 0:
                raise FileNotFoundError
            if x % 3 == 0:
                raise LookupError
            if x % 5 == 0:
                raise IndexError
            return x * x

        ds = ctx.parallelize([1, 2, 3, 4, 5]).map(f)
        assert ds.collect() == [1]
        d = ds.exception_counts
        assert d["FileNotFoundError"] == 2
        assert d["LookupError"] == 1
        assert d["IndexError"] == 1


class TestColumnsPort:
    """reference test_columns.py"""

    def test_withcolumn_new_on_scalar(self, ctx):
        res = ctx.parallelize([10, 20, 3, 4]) \
            .withColumn("newcol", lambda x: 2 * x).collect()
        assert res == [(10, 20), (20, 40), (3, 6), (4, 8)]

    def test_withcolumn_overwrite_named(self, ctx):
        res = ctx.parallelize([(1, "Hello"), (2, "world")],
                              ["count", "word"]) \
            .withColumn("word", lambda x: x["word"][-1] * x["count"]) \
            .collect()
        assert res == [(1, "o"), (2, "dd")]

    def test_withcolumn_overwrite_positional(self, ctx):
        res = ctx.parallelize([(1, "Hello"), (2, "world")],
                              ["count", "word"]) \
            .withColumn("word", lambda x: x[1][-1] * x[0]).collect()
        assert res == [(1, "o"), (2, "dd")]

    def test_mapcolumn_single_column(self, ctx):
        res = ctx.parallelize([1, 2, 3], columns=["A"]) \
            .mapColumn("A", lambda x: x + 1).collect()
        assert res == [2, 3, 4]

    def test_select_columns_subsets(self, ctx):
        ds = ctx.parallelize([(1, 2, 3), (4, 5, 6), (7, 8, 9)],
                             columns=["abc", "def", "ghi"])
        assert ds.selectColumns(["abc", "ghi"]).collect() == \
            [(1, 3), (4, 6), (7, 9)]
        assert ds.selectColumns(["abc"]).collect() == [1, 4, 7]
        assert ds.selectColumns(["def"]).collect() == [2, 5, 8]
        assert ds.selectColumns(["abc", "def", "ghi"]).collect() == \
            [(1, 2, 3), (4, 5, 6), (7, 8, 9)]

    def test_select_columns_indices_and_mixed(self, ctx):
        ds = ctx.parallelize([(1, 2, 3), (4, 5, 6), (7, 8, 9)],
                             columns=["abc", "def", "ghi"])
        assert ds.selectColumns("abc").collect() == [1, 4, 7]
        assert ds.selectColumns(2).collect() == [3, 6, 9]
        assert ds.selectColumns(-2).collect() == [2, 5, 8]
        assert ds.selectColumns(["abc", "abc"]).collect() == \
            [(1, 1), (4, 4), (7, 7)]
        assert ds.selectColumns([1, 0]).collect() == \
            [(2, 1), (5, 4), (8, 7)]
        assert ds.selectColumns([-1, "def", "ghi"]).collect() == \
            [(3, 2, 3), (6, 5, 6), (9, 8, 9)]


SOME_CONSTANT_TO_EXTRACT = 42


class TestSrcExtractPort:
    """reference test_srcextract.py — source-extraction edge cases.
    Where the reference (unpatched interpreter) RAISES on ambiguous
    multi-lambda lines, this engine must instead refuse to compile and
    fall back to the live function object — same results, never an
    error."""

    def test_single_lambda(self, ctx):
        res = ctx.parallelize([1, 2, 3, 4]).map(lambda x: x * x).collect()
        assert res == [1, 4, 9, 16]

    def test_chained_lambdas_one_per_call(self, ctx):
        res = ctx.parallelize([1, 2, 3, 4]).map(lambda x: x * x) \
            .map(lambda x: x - 1).collect()
        assert res == [0, 3, 8, 15]

    def test_lambda_with_global(self, ctx):
        res = ctx.parallelize([1, 2, 3, 4]) \
            .map(lambda x: x + SOME_CONSTANT_TO_EXTRACT).collect()
        assert res == [43, 44, 45, 46]

    def test_chained_globals_with_continuation(self, ctx):
        res = ctx.parallelize([1, 2, 3, 4]) \
            .map(lambda x: x + SOME_CONSTANT_TO_EXTRACT) \
            .map(lambda x: -1 * (SOME_CONSTANT_TO_EXTRACT - x)).collect()
        assert res == [1, 2, 3, 4]

    def test_two_lambdas_same_line(self, ctx):
        # the reference needs a patched interpreter for this; here the
        # fallback runs the live function objects — results still exact
        res = ctx.parallelize([1, 2, 3, 4]).map(lambda x: x + SOME_CONSTANT_TO_EXTRACT).map(lambda x: -1 * (SOME_CONSTANT_TO_EXTRACT - x)).collect()
        assert res == [1, 2, 3, 4]

    def test_multiline_lambda_body(self, ctx):
        # DO NOT REFORMAT (the continuation lines are the test)
        res = ctx.parallelize([1, 2, 3, 4]).map(lambda x: x +
                                                SOME_CONSTANT_TO_EXTRACT +
                                                3) \
            .map(lambda x: x - SOME_CONSTANT_TO_EXTRACT).collect()
        assert res == [4, 5, 6, 7]

    def test_multiline_plus_same_line_mix(self, ctx):
        # DO NOT REFORMAT
        res = ctx.parallelize([1, 2, 3, 4]).map(lambda x: x +
                                                SOME_CONSTANT_TO_EXTRACT +
                                                3).map(lambda x: x - SOME_CONSTANT_TO_EXTRACT).map(lambda x: x - 3).collect()
        assert res == [1, 2, 3, 4]


class TestMathPort:
    """reference test_math.py — differential vs CPython.  Where the
    reference's C-library semantics differ from CPython, CPython wins
    here: math.log(0)/log2(0)/log10(0) raise ValueError in CPython (the
    reference returns -inf via C log), and run_diff counts those rows as
    exceptions on both sides."""

    def test_constants_tuple_to_str(self, ctx):
        import math as m
        res = (ctx.parallelize([0])
               .map(lambda x: (m.pi, m.e, m.tau, m.inf, -m.inf))
               .map(lambda a, b, c, d, e:
                    (str(a), str(b), str(c), str(d), str(e)))
               .collect())
        assert res == [(str(m.pi), str(m.e), str(m.tau), "inf", "-inf")]

    def test_log_floats_ints_bools(self, ctx):
        import math as m
        run_diff(ctx, [m.e, 1.0, m.e ** 2, m.e ** -1, 0.0],
                 lambda x: m.log(x))
        run_diff(ctx, [3, 1, 2, 6, 0], lambda x: m.log(x))
        run_diff(ctx, [True, False], lambda x: m.log(x))

    def test_log2_log10_log1p(self, ctx):
        import math as m
        run_diff(ctx, [2.0, 1.0, 4.0, 1 / 4], lambda x: m.log2(x))
        run_diff(ctx, [10, 1, 100, 1000], lambda x: m.log10(x))
        run_diff(ctx, [m.e - 1, m.e ** 2 - 1, m.e ** -1 - 1],
                 lambda x: m.log1p(x))
        run_diff(ctx, [True, False], lambda x: m.log1p(x))

    def test_exp_expm1(self, ctx):
        import math as m
        run_diff(ctx, [1.0, 0.0, 2.0, -1.0], lambda x: m.exp(x))
        run_diff(ctx, [0, 1, -1, 4, -4], lambda x: m.exp(x))
        run_diff(ctx, [True, False], lambda x: m.exp(x))
        run_diff(ctx, [-1.0, 1.0, 2.0, 0.0], lambda x: m.expm1(x))

    def test_trig(self, ctx):
        import math as m
        run_diff(ctx, [0.0, m.pi / 2, -m.pi / 2], lambda x: m.sin(x))
        run_diff(ctx, [-m.pi / 2, 0.0, m.pi / 2, m.pi], lambda x: m.cos(x))
        run_diff(ctx, [0.0], lambda x: m.sinh(x))
        run_diff(ctx, [0.0], lambda x: m.cosh(x))
        run_diff(ctx, [0.0, float("inf"), float("-inf")],
                 lambda x: m.tanh(x))

    def test_inverse_trig_with_domain_errors(self, ctx):
        import math as m
        run_diff(ctx, [-1.0, 0.0, 1.0, 2.0], lambda x: m.asin(x))
        run_diff(ctx, [-1.0, 0.0, 1.0, -3.0], lambda x: m.acos(x))
        run_diff(ctx, [0.0, 1.0, -1.0], lambda x: m.asinh(x))
        run_diff(ctx, [1.0, 2.0, 0.5], lambda x: m.acosh(x))
        run_diff(ctx, [-1.0, 0.0, 1.0, float("inf"), float("-inf")],
                 lambda x: m.atan(x))
        run_diff(ctx, [0.0, 0.5, -0.5, 1.0], lambda x: m.atanh(x))

    def test_atan2_pow_two_param(self, ctx):
        import math as m
        run_diff(ctx, [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0)],
                 lambda x, y: m.atan2(x, y))
        run_diff(ctx, [(1, -2), (-1, 2), (0, 1), (2, -2)],
                 lambda x, y: m.pow(x, y))
        run_diff(ctx, [(-1.0, 4.0), (1.0, -2.0), (2.0, 0.0), (-3.0, 0.0)],
                 lambda x, y: m.pow(x, y))
        run_diff(ctx, [(True, False), (True, True), (False, True),
                       (False, False)], lambda x, y: m.pow(x, y))
        # CPython: pow(0, negative) raises ValueError
        run_diff(ctx, [(0.0, -1.0), (0, -2)], lambda x, y: m.pow(x, y))

    def test_radians_degrees_sqrt(self, ctx):
        import math as m
        run_diff(ctx, [180.0, 90.0, -45.0, 0.0], lambda x: m.radians(x))
        run_diff(ctx, [m.pi, m.pi / 2, -m.pi / 4, 0.0],
                 lambda x: m.degrees(x))
        run_diff(ctx, [0.0, 1.0, 4.0, -1.0], lambda x: m.sqrt(x))

    def test_isnan_isinf(self, ctx):
        import math as m
        run_diff(ctx, [m.nan, m.inf, m.pi, 0.0, 5.0, -128.0],
                 lambda x: m.isnan(x))
        run_diff(ctx, [m.inf, -m.inf, m.nan, m.pi, 0.0, -128.0],
                 lambda x: m.isinf(x))
        # mixed int/float/bool list -> PYOBJECT path, same answers
        run_diff(ctx, [True, 128, -50.0, 0, m.inf, m.nan, False, 7],
                 lambda x: m.isnan(x))

    def test_isclose(self, ctx):
        import math as m
        run_diff(ctx, [(-0.5, 0.0), (0.5, 0.50001), (0.5, 0.500000005),
                       (0.5, 0.50000000005)], lambda x, y: m.isclose(x, y))
        run_diff(ctx, [(0, 0), (0, -1), (5, 128), (-1, -1)],
                 lambda x, y: m.isclose(x, y))
        run_diff(ctx, [(1, True), (1, False), (0, False), (0, True)],
                 lambda x, y: m.isclose(x, y))
        run_diff(ctx, [(m.inf, m.inf), (m.inf, -m.inf), (-m.inf, -m.inf),
                       (m.inf, 5.0), (m.pi, m.pi), (m.pi, 3.14159265)],
                 lambda x, y: m.isclose(x, y))


class TestParallelizePort:
    """reference test_parallelize.py — round-trip typing through
    parallelize/collect (fast-serialization cases + AnyType cases)."""

    def test_scalar_roundtrips(self, ctx):
        for ref in ([-20, -90, 0, 42, 3, 1, 2, 3, 4, 5],
                    [-3.141, -90.0, -8.2, 42.0, 3.0, 1.0, 2.0, 3.0],
                    ["", "Hello", "world", "how", "are", "you?"]):
            assert ctx.parallelize(ref).collect() == ref

    def test_tuple_roundtrips(self, ctx):
        for ref in ([(-20, 3, 1), (10, 3, 1), (2, 3, 4), (4, 5, 6)],
                    [(-20.0, 3., 1.), (10.2, 3.3, 1.1), (.4, .5, .6)],
                    [("", "Hello"), ("world", "how"), ("are", "you?")]):
            assert ctx.parallelize(ref).collect() == ref

    def test_option_type_scalars(self, ctx):
        ref = [1, None, 2, 3, None]
        assert ctx.parallelize(ref).collect() == ref

    def test_option_type_from_udf(self, ctx):
        res = ctx.parallelize(list(range(1, 30, 2))) \
            .map(lambda x: x if x > 10 else None).collect()
        assert res == [x if x > 10 else None for x in range(1, 30, 2)]

    def test_wide_tuple_with_options(self, ctx):
        ref = [(1.0, "2", 3, "4", 5, 6, True, 8, 9, None),
               (None, "2", 3, None, 5, 6, True, 8, 9, None),
               (1.0, "2", 3, "4", None, 6, None, 8, 9, None)]
        assert ctx.parallelize(ref).collect() == ref

    def test_none_only(self, ctx):
        assert ctx.parallelize([None, None]).collect() == [None, None]

    def test_auto_unpack_variants(self, ctx):
        data = [{"a": 1, "b": 2, "c": 3}, {"a": 4, "b": 5, "c": 6},
                {"a": 7, "b": 8, "c": 9}]
        out = ctx.parallelize(data) \
            .map(lambda x: (x["a"], x["b"], x["c"])).collect()
        assert out == [(1, 2, 3), (4, 5, 6), (7, 8, 9)]
        out2 = ctx.parallelize(data, auto_unpack=False).collect()
        assert out2 == data

    def test_auto_unpack_missing_keys(self, ctx):
        data = [{"a": 1, "b": 2, "c": 3}, {"a": 4, "b": 5, "c": 6},
                {"a": 1, "b": 2}, {"c": 11}]
        out = ctx.parallelize(data).map(lambda x: x["a"]).collect()
        assert out == [1, 4, 1, None]

    def test_auto_unpack_disjoint_keys(self, ctx):
        data = [{"a": 1, "b": 2, "c": 3}, {"d": 4, "e": 5, "f": 6}]
        out = ctx.parallelize(data).map(
            lambda x: (x["a"], x["b"], x["c"], x["d"], x["e"], x["f"])
        ).collect()
        assert out == [(1, 2, 3, None, None, None),
                       (None, None, None, 4, 5, 6)]

    def test_nested_list_tuple_values(self, ctx):
        ref = [([(1, 2), (3, 4)], [(-1, -2), (-3, -4)])]
        assert ctx.parallelize(ref).collect() == ref

    def test_deeply_nested(self, ctx):
        ref = [("a", [("b", [1, 2]), ("c", [1, 2, 3, 4])]),
               ("....", [("d", [100, 200, -10000000]),
                         ("e", [1000, 2000, 3000, 4000, 5000])])]
        assert ctx.parallelize(ref).collect() == ref

    def test_optional_list_value(self, ctx):
        ref = [None, ["a", "b"], None]
        assert ctx.parallelize(ref).collect() == ref


class TestMultiPort:
    """reference test_multi.py — a parallelized dataset is reusable as
    the base of several independent pipelines."""

    def test_dataset_reuse(self, ctx):
        ds = ctx.parallelize([1, 2, 3, 4, 5])
        assert ds.map(lambda x: x * x).collect() == [1, 4, 9, 16, 25]
        assert ds.map(lambda x: x * x * x).collect() == [1, 8, 27, 64, 125]
        assert ds.collect() == [1, 2, 3, 4, 5]


class TestFallbackPort:
    """reference test_fallback.py — cloudpickled-code path for objects
    and libraries the compiled path can't represent."""

    def test_arbitrary_objects(self, ctx):
        import numpy as np
        res = ctx.parallelize([(1, np.zeros(2)), (4, np.zeros(5))]) \
            .map(lambda a, b: (a + 1, b)).collect()
        assert len(res) == 2
        assert [r[0] for r in res] == [2, 5]
        assert [len(r[1]) for r in res] == [2, 5]

    def test_numpy_mixed_pipeline(self, ctx):
        import numpy as np
        res = ctx.parallelize([1, 2, 3, 4]) \
            .map(lambda x: [x, x * x, x * x * x]) \
            .map(lambda x: (float(np.array(x).sum()),
                            float(np.array(x).mean()))).collect()
        ref = [(float(np.array(v).sum()), float(np.array(v).mean()))
               for v in ([x, x * x, x * x * x] for x in [1, 2, 3, 4])]
        for got, want in zip(res, ref):
            assert abs(got[0] - want[0]) < 1e-9
            assert abs(got[1] - want[1]) < 1e-9

    def test_all_samples_normal_case_violation(self, ctx):
        def f(x):
            t = 0
            if x == 1:
                t = 1.0
            else:
                t = "a"
            if x == 2:
                t = 2.0
            else:
                t = "b"
            if x == 3:
                t = 3.0
            else:
                t = 4.0
            return t
        res = ctx.parallelize([1, 2, 3]).map(f).collect()
        assert res == [f(1), f(2), f(3)]


class TestReflectionPort:
    """reference test_reflection.py — source extraction must recover the
    RIGHT lambda/function AST from files, declarations, nested scopes and
    multi-lambda contexts (here: function_ast + closure_env instead of
    raw source strings)."""

    def _ast_src(self, fn):
        import ast
        from tuplex_spark.udf.reflection import function_ast
        return ast.unparse(function_ast(fn))

    def test_simple_lambda(self):
        assert self._ast_src(lambda x: x * x) == "lambda x: x * x"

    def test_declared_lambda(self):
        g = lambda x: x ** 2
        assert self._ast_src(g) == "lambda x: x ** 2"

    def test_declared_nested_lambda(self):
        def inner():
            g = lambda x: x ** 2
            return self._ast_src(g)
        assert inner() == "lambda x: x ** 2"

    def test_multi_param_lambda(self):
        assert self._ast_src(lambda a, b, c, d: a + b) \
            == "lambda a, b, c, d: a + b"

    def test_function_def(self):
        def add_one(x):
            return x + 1
        import ast
        from tuplex_spark.udf.reflection import function_ast
        node = function_ast(add_one)
        assert node.name == "add_one"
        assert "return x + 1" in ast.unparse(node)

    def test_closure_capture(self):
        scale = 7

        def f(x):
            return x * scale
        from tuplex_spark.udf.reflection import closure_env
        env = closure_env(f)
        assert env.get("scale") == 7

    def test_module_global_capture(self):
        import math as _m

        def f(x):
            return _m.floor(x)
        from tuplex_spark.udf.reflection import closure_env
        env = closure_env(f)
        assert env.get("_m") is _m

    def test_engine_runs_extracted_lambda(self, ctx):
        res = ctx.parallelize([2, 3]).map(lambda x: x ** 2).collect()
        assert res == [4, 9]
