"""Funnel / retention analytics (tuplex_spark/functions/analytics.py).

Hand-computed event logs; the sf-scale oracle parity is covered by the
events_funnel / events_retention entries in __spark_entry__.py.
"""

import datetime as dt

import pytest

from conftest import SF_DIR  # noqa: F401  (fixture path bootstrap)


def _ts(day, hour=0):
    return dt.datetime(2024, 1, 1 + day, hour, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")


class TestFunnel:
    def test_ordered_chase(self, spark):
        from tuplex_spark.functions.analytics import funnel
        rows = [
            # u1: full ordered funnel
            (1, _ts(0, 1), "signup"), (1, _ts(0, 2), "click"),
            (1, _ts(0, 3), "purchase"),
            # u2: click BEFORE signup -> stops at step 0
            (2, _ts(0, 2), "click"), (2, _ts(0, 3), "signup"),
            # u3: signup only
            (3, _ts(1), "signup"),
            # u4: never signs up -> not even step 0
            (4, _ts(0), "click"), (4, _ts(1), "purchase"),
        ]
        got = {r["step_idx"]: (r["step_name"], r["users"])
               for r in funnel(_events(spark, rows),
                               ["signup", "click", "purchase"]).collect()}
        assert got == {0: ("signup", 3), 1: ("click", 1),
                       2: ("purchase", 1)}

    def test_greedy_min_not_any_order(self, spark):
        from tuplex_spark.functions.analytics import funnel
        # u1 clicks at t2 and t4, purchases at t3: the greedy chase
        # binds the EARLIEST post-signup click (t2), so purchase at t3
        # qualifies.
        rows = [(1, _ts(0, 1), "signup"), (1, _ts(0, 2), "click"),
                (1, _ts(0, 3), "purchase"), (1, _ts(0, 4), "click")]
        got = {r["step_idx"]: r["users"]
               for r in funnel(_events(spark, rows),
                               ["signup", "click", "purchase"]).collect()}
        assert got[2] == 1

    def test_strictly_after_semantics(self, spark):
        from tuplex_spark.functions.analytics import funnel
        # click at the exact signup timestamp does NOT advance (strict >)
        rows = [(1, _ts(0, 1), "signup"), (1, _ts(0, 1), "click")]
        got = {r["step_idx"]: r["users"]
               for r in funnel(_events(spark, rows),
                               ["signup", "click"]).collect()}
        assert got == {0: 1, 1: 0}

    def test_empty_steps_raise(self, spark):
        from tuplex_spark.functions.analytics import funnel
        with pytest.raises(ValueError):
            funnel(_events(spark, []), [])


class TestRetention:
    def test_cohort_cells(self, spark):
        from tuplex_spark.functions.analytics import retention
        rows = [
            (1, _ts(0), "view"), (1, _ts(1), "view"), (1, _ts(3), "view"),
            (1, _ts(1, 5), "click"),   # same day as offset-1: no dup cell
            (2, _ts(1), "view"),
        ]
        got = {(str(r["cohort_day"]), r["day_offset"]): r["n_users"]
               for r in retention(_events(spark, rows)).collect()}
        assert got == {("2024-01-01", 0): 1, ("2024-01-01", 1): 1,
                       ("2024-01-01", 3): 1, ("2024-01-02", 0): 1}

    def test_max_offset_clips(self, spark):
        from tuplex_spark.functions.analytics import retention
        rows = [(1, _ts(0), "view"), (1, _ts(20), "view")]
        got = retention(_events(spark, rows), max_offset=7).collect()
        assert {(r["day_offset"]) for r in got} == {0}

    def test_plan_no_global_sort(self, spark):
        import __spark_entry__ as em
        from tuplex_spark.functions.analytics import funnel, retention
        ev = em._t(spark, SF_DIR, "events")
        # retention: hash exchanges only — never a global sort
        plan = retention(ev)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange SinglePartition" not in plan
        assert "CartesianProduct" not in plan
        assert "Python" not in plan
        # funnel: the only single-partition exchange is the final 1-row
        # per-step count; no cartesian, no Python
        fplan = funnel(ev, ["signup", "click", "purchase"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in fplan
        assert "Python" not in fplan
