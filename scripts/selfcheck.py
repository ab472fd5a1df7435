"""Mimic the driver's t2 correctness gate locally.

Runs every __spark_entry__.queries() entry at the given sf dir and its
oracle_sql() twin through DuckDB on the same parquet files, then compares
row count, sorted column names, and (column-name-sorted, row-sorted)
values exactly.  Usage:

    python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def norm_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm_val(x) for x in v)
    import datetime
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v


def sorted_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple(
        (x is None, str(type(x)), x if not isinstance(x, tuple) else str(x))
        for x in r))


def compare(name, spark_df, con, sql):
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()
    issues = []
    if sorted(s_cols) != sorted(d_cols):
        issues.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        issues.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
    if not issues:
        a = sorted_rows(s_cols, s_rows)
        b = sorted_rows(d_cols, d_rows)
        ndiff = sum(1 for x, y in zip(a, b) if x != y)
        if ndiff:
            issues.append(f"values: {ndiff}/{len(a)} rows differ")
            for x, y in list(zip(a, b))[:2000]:
                if x != y:
                    issues.append(f"  spark={x}")
                    issues.append(f"  duck ={y}")
                    break
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    # corpus-adaptive oracles (adaptive_k / adaptive_nbits) bake row
    # counts at oracle_sql() build time from this env var — pin it to
    # the sf dir under test so selfcheck stays honest at any SF
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)

    import __spark_entry__ as entrymod
    from tuplex_spark import build_session
    spark = build_session("selfcheck", {})
    con = duck_con(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                cnt = df.count()
                print(f"[{name}] NO-ORACLE rows={cnt} "
                      f"({time.time() - t0:.1f}s)")
                continue
            issues = compare(name, df, con, oracles[name])
        except Exception as e:
            import traceback
            traceback.print_exc()
            issues = [f"EXCEPTION {type(e).__name__}: {e}"]
        dt = time.time() - t0
        if issues:
            n_fail += 1
            print(f"[{name}] FAIL ({dt:.1f}s)")
            for i in issues:
                print("   ", i)
        else:
            n_pass += 1
            print(f"[{name}] PASS ({dt:.1f}s)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
