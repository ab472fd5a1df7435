"""Event-log analytics: ordered funnels and cohort retention.

Beyond-reference surface (the reference's operator enum,
core/include/logical/LogicalOperatorType.h:15-30, has no event/funnel
operators) — these are the product-analytics queries a 100 TB event log
actually gets asked, expressed so every step is a partial-aggregated
shuffle on the user key:

- ``funnel``: per-user sequential min-timestamp chase.  Each step is a
  groupBy(user) aggregate; step k+1 re-joins the step-k timestamp on the
  SAME user key, so after the first hash exchange every later join and
  aggregate reuses the partitioning (no extra wide shuffle at scale,
  and AQE broadcast-converts the shrinking per-step frames).
- ``retention``: classic cohort-day x day-offset active-user matrix.
  One groupBy(user) for the cohort, one co-partitioned join back, one
  final (cohort, offset) aggregate over distinct (user, day) pairs.

Both are exact integer/timestamp arithmetic end to end — no floats —
so the DuckDB oracle twins hash-match bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Ordered funnel: for each prefix of ``steps``, the number of users
    who performed those event types in strictly increasing timestamp
    order (the min-timestamp greedy chase — the standard funnel
    semantics: earliest qualifying occurrence of each step).

    Returns one row per step: (step_idx, step_name, users), where
    ``users`` counts users whose chase reached that step.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    u, t = F.col(user_col), F.col(ts_col)
    # step 0: earliest occurrence per user
    cur = (events.filter(F.col(type_col) == steps[0])
           .groupBy(u.alias("user"))
           .agg(F.min(t).alias("t0")))
    counts = [cur.agg(F.count("*").alias("users"),
                      F.lit(0).alias("step_idx"),
                      F.lit(steps[0]).alias("step_name"))]
    prev = cur
    for i, step in enumerate(steps[1:], start=1):
        nxt = (events.filter(F.col(type_col) == step)
               .select(u.alias("user"), t.alias("t"))
               .join(prev, "user")
               .filter(F.col("t") > F.col(f"t{i-1}"))
               .groupBy("user")
               .agg(F.min("t").alias(f"t{i}")))
        counts.append(nxt.agg(F.count("*").alias("users"),
                              F.lit(i).alias("step_idx"),
                              F.lit(step).alias("step_name")))
        prev = nxt
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.select("step_idx", "step_name",
                      F.col("users").cast("long").alias("users"))


def funnel_sql(steps: list[str], table: str = "events",
               user_col: str = "user_id", ts_col: str = "ts",
               type_col: str = "event_type") -> str:
    """DuckDB twin of funnel() — identical greedy min-timestamp chase."""
    ctes = [f"s0 AS (SELECT {user_col} AS u, min({ts_col}) AS t0 "
            f"FROM {table} WHERE {type_col} = '{steps[0]}' GROUP BY 1)"]
    for i, step in enumerate(steps[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT e.{user_col} AS u, min(e.{ts_col}) AS t{i} "
            f"FROM {table} e JOIN s{i-1} p ON e.{user_col} = p.u "
            f"WHERE e.{type_col} = '{step}' AND e.{ts_col} > p.t{i-1} "
            f"GROUP BY 1)")
    selects = [
        f"SELECT {i} AS step_idx, '{s}' AS step_name, "
        f"count(*)::BIGINT AS users FROM s{i}"
        for i, s in enumerate(steps)]
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


def retention(events: DataFrame, user_col: str = "user_id",
              ts_col: str = "ts", max_offset: int = 30) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the calendar day
    of their first event; for each (cohort_day, day_offset) cell, the
    number of cohort users active exactly ``day_offset`` days later
    (0 <= offset <= max_offset).
    """
    u = F.col(user_col)
    day = F.to_date(F.col(ts_col))
    cohorts = (events.groupBy(u.alias("user"))
               .agg(F.min(day).alias("cohort_day")))
    active = events.select(u.alias("user"), day.alias("day")).distinct()
    return (active.join(cohorts, "user")
            .withColumn("day_offset",
                        F.datediff(F.col("day"), F.col("cohort_day")))
            .filter(F.col("day_offset") <= max_offset)
            .groupBy("cohort_day",
                     F.col("day_offset").cast("long").alias("day_offset"))
            .agg(F.count("*").cast("long").alias("n_users")))


def retention_sql(table: str = "events", user_col: str = "user_id",
                  ts_col: str = "ts", max_offset: int = 30) -> str:
    """DuckDB twin of retention()."""
    return f"""
WITH cohorts AS (
  SELECT {user_col} AS u, min(CAST({ts_col} AS DATE)) AS cohort_day
  FROM {table} GROUP BY 1
), active AS (
  SELECT DISTINCT {user_col} AS u, CAST({ts_col} AS DATE) AS day
  FROM {table}
)
SELECT c.cohort_day, datediff('day', c.cohort_day, a.day) AS day_offset,
       count(*)::BIGINT AS n_users
FROM active a JOIN cohorts c ON a.u = c.u
WHERE datediff('day', c.cohort_day, a.day) <= {max_offset}
GROUP BY 1, 2"""


def basket_pairs(lineitem: DataFrame, top_k: int = 20,
                 order_col: str = "l_orderkey",
                 item_col: str = "l_partkey") -> DataFrame:
    """Market-basket affinity: the ``top_k`` part pairs most often
    ordered together, ranked by co-occurrence count with a
    deterministic (count DESC, part_a, part_b) tie-break.

    Scale shape: distinct (order, item) first (kills duplicate lines of
    the same part — the self-join would otherwise square them), then a
    CO-PARTITIONED self-join on the order key (one hash exchange feeds
    both sides; baskets are small so the per-order pair blow-up is
    bounded by max-basket^2, not corpus size), a partial-aggregated
    pair count, and a TakeOrdered top-k — no global sort.
    """
    oi = (lineitem.select(F.col(order_col).alias("ord"),
                          F.col(item_col).alias("item"))
          .distinct())
    a = oi.alias("a")
    b = oi.alias("b")
    pairs = (a.join(b, (F.col("a.ord") == F.col("b.ord"))
                    & (F.col("a.item") < F.col("b.item")))
             .select(F.col("a.item").alias("part_a"),
                     F.col("b.item").alias("part_b")))
    return (pairs.groupBy("part_a", "part_b")
            .agg(F.count("*").cast("long").alias("n_orders"))
            .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
            .limit(int(top_k)))


def basket_pairs_sql(table: str = "lineitem", top_k: int = 20,
                     order_col: str = "l_orderkey",
                     item_col: str = "l_partkey") -> str:
    """DuckDB twin of basket_pairs()."""
    return f"""
WITH oi AS (
  SELECT DISTINCT {order_col} AS ord, {item_col} AS item FROM {table}
)
SELECT a.item AS part_a, b.item AS part_b,
       count(*)::BIGINT AS n_orders
FROM oi a JOIN oi b ON a.ord = b.ord AND a.item < b.item
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT {int(top_k)}"""
