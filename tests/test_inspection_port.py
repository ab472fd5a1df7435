"""Port of the reference's introspection suites: test_inspect.py
(.types / .columns properties), test_metrics.py (metrics surface after
an action), test_config.py (option normalization + nesting).  Cases are
the reference's own, adapted where its type system differs (noted
inline)."""

import typing

import tuplex_spark as tx


class TestTypes:
    def test_scalar_and_optional(self, ctx):
        # reference test_inspect.py testTypes t0
        t0 = ctx.parallelize([(1, 2, None), (2, 3, 4.5)]).types
        assert t0 == [int, int, typing.Optional[float]]

    def test_all_null_column(self, ctx):
        t1 = ctx.parallelize([None, None, None]).types
        assert t1 == [type(None)]

    def test_list_column(self, ctx):
        t2 = ctx.parallelize([[1, 2, 3], [3, 4, 5]]).types
        assert t2 == [typing.List[int]]

    def test_mixed_scalar_row(self, ctx):
        t3 = ctx.parallelize([(1, "hello", False, 4.6)]).types
        assert t3 == [int, str, bool, float]

    def test_nested_tuple_column(self, ctx):
        t4 = ctx.parallelize([((1, 2), "x")]).types
        assert t4 == [(int, int), str]

    def test_pyobject_row_types(self, ctx):
        # reference t3: the empty-tuple column forces the PYOBJECT path
        # here (no Spark struct for an empty tuple); types still come
        # back per position, from the sample
        t = ctx.parallelize([((), 1, 'hello', False, 4.6,
                              ({'key': 30}, 20))]).types
        assert t == [(), int, str, bool, float,
                     (typing.Dict[str, int], int)]

    def test_types_after_map(self, ctx):
        ds = ctx.parallelize([1, 2, 3]).map(
            lambda x: (x * 0.5, str(x)))
        assert ds.types == [float, typing.Optional[str]] or \
            ds.types == [float, str]

    def test_columns_property(self, ctx):
        ds = ctx.parallelize([(1, 2)], columns=["a", "b"])
        assert ds.columns == ["a", "b"]


class TestMetricsSurface:
    def test_times_populated_after_action(self, ctx):
        # reference test_metrics.py testTimes (LLVM timers map to the
        # compile/run timers this engine actually has)
        before_actions = ctx.metrics.numActions
        ctx.parallelize([1, 2, 3, 4, 5]).map(lambda x: x + 4).collect()
        m = ctx.metrics
        assert m.totalCompilationTime > 0.0
        assert m.logicalOptimizationTime > 0.0
        assert m.totalRunTime > 0.0
        assert m.numActions == before_actions + 1
        assert m.compiledUDFs >= 1
        d = m.as_dict()
        assert "totalCompilationTime" in d
        # reference spelling (capital acronym) and as_json
        assert m.LLVMOptimizationTime == m.llvmOptimizationTime
        assert m.LLVMCompilationTime == 0.0
        import json
        assert json.loads(m.as_json())["numActions"] == m.numActions


class TestConfigOptions:
    def test_bare_keys_get_prefix(self, spark):
        # reference test_config.py testNestedDictOptions
        c = tx.Context(conf={'executorMemory': '1MB', 'executorCount': 3},
                       spark=spark)
        opt = c.options()
        assert 'tuplex.executorMemory' in opt
        assert 'tuplex.executorCount' in opt
        assert opt['tuplex.executorMemory'] == '1MB'
        assert opt['tuplex.executorCount'] == 3

    def test_kwargs_normalized_too(self, spark):
        c = tx.Context(spark=spark, executorMemory='2MB')
        assert c.options()['tuplex.executorMemory'] == '2MB'
        assert c.getOption('tuplex.executorMemory') == '2MB'

    def test_nested_view(self, spark):
        c = tx.Context(conf={'tuplex.csv.maxDetectionMemory': 1024},
                       spark=spark)
        nested = c.options(nested=True)
        assert nested['tuplex']['csv']['maxDetectionMemory'] == 1024

    def test_options_to_yaml(self, spark, tmp_path):
        c = tx.Context(spark=spark)
        p = tmp_path / "conf.yaml"
        c.optionsToYAML(str(p))
        text = p.read_text()
        assert "tuplex:" in text


class TestSqlSurface:
    def test_sql_over_pipeline_view(self, ctx):
        ds = ctx.parallelize([(1, "a"), (2, "b"), (3, "a")],
                             columns=["n", "tag"]) \
                .filter(lambda x: x["n"] > 1)
        ds.createOrReplaceTempView("t_sql_surface")
        out = ctx.sql("SELECT tag, sum(n) AS s FROM t_sql_surface "
                      "GROUP BY tag ORDER BY tag")
        assert out.collect() == [("a", 3), ("b", 2)]
        # the SQL result is a DataSet: engine ops chain on it
        assert out.selectColumns(["s"]).collect() == [3, 2]

    def test_sql_excludes_exception_rows(self, ctx):
        ds = ctx.parallelize([1, 2, 0, 4]).map(lambda x: 10 // x)
        ds.createOrReplaceTempView("t_sql_exc")
        got = ctx.sql("SELECT count(*) FROM t_sql_exc").collect()
        assert got == [3]  # the x=0 row never leaks into SQL


class TestModuleExports:
    def test_reference_init_exports(self):
        import tuplex_spark as tx
        assert isinstance(tx.__version__, str)
        assert tx.in_jupyter_notebook() is False  # pytest, not a kernel
        assert tx.in_google_colab() is False
        import pytest as _pytest
        with _pytest.raises(NotImplementedError):
            tx.setup_aws()


class TestTimestampTypes:
    def test_timestamp_and_date_types(self, spark, ctx):
        import datetime
        import __spark_entry__ as em
        from conftest import SF_DIR
        import tuplex_spark as tx
        ev = em._t(spark, SF_DIR, "events")
        ds = tx.DataSet(ctx, ev.limit(5), list(ev.columns)) \
            .selectColumns(["event_id", "ts"])
        assert ds.types[1] in (datetime.datetime,
                               __import__("typing").Optional[
                                   datetime.datetime])
