"""Differential runs over the REFERENCE'S OWN fixture files
(/root/reference/tuplex/test/resources/, read-only): real dirty CSVs,
the golden unique()-wordlist pair, the TPC-H minisample, and the 311
micro subset.  These exercise CSV sampling inference, normal-case
typing, quoting and the exception model against data the reference's
test suite itself certifies (DataFrameOperations.cc:350-353,477-485;
AggregateTest.cc test_311 analog; TPCH.cc:57)."""

import math
import os

import pytest

RES = "/root/reference/tuplex/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixtures not present")


class TestSmallFixtures:
    def test_int_str_mix_collects_all_rows(self, ctx):
        # reference: DataFrameOperations.cc:477-485 expects all 7 rows
        # back (6 ints + one quoted "str" routed through the general
        # case, not dropped)
        ds = ctx.csv(os.path.join(RES, "int_str_mix.csv"), header=False)
        rows = ds.collect()
        assert len(rows) + sum(ds.exception_counts.values()) == 7

    def test_quotednulls_reads(self, ctx):
        # reference: DataFrameOperations.cc:350-353 (.show() smoke);
        # semantics: "" and empty cells are null under default
        # null_values=[""]
        ds = ctx.csv(os.path.join(RES, "quotednulls.csv"))
        rows = ds.collect()
        assert ds.columns == ["A", "B"]
        assert len(rows) == 3
        a_vals = [r[0] if isinstance(r, tuple) else r for r in rows]
        assert 12 in a_vals and 13 in a_vals

    def test_unique_wordlist_golden(self, ctx):
        # reference: unique_test.txt -> unique() must equal the checked-in
        # unique_test_res.txt golden file (order-insensitive)
        ds = ctx.text(os.path.join(RES, "unique_test.txt")).unique()
        got = sorted(ds.collect())
        with open(os.path.join(RES, "unique_test_res.txt")) as fp:
            want = sorted(ln for ln in fp.read().split("\n") if ln)
        assert got == want

    def test_optional_str_nulls(self, ctx):
        ds = ctx.csv(os.path.join(RES, "optional_str_test.csv"),
                     header=False)
        rows = ds.collect()
        flat = [v for r in rows for v in (r if isinstance(r, tuple)
                                          else (r,))]
        assert None in flat and "abc" in flat


class TestTpchMinisample:
    COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate", "l_commitdate",
            "l_receiptdate", "l_shipinstruct", "l_shipmode", "l_comment"]

    def test_q6_pipeline_shape(self, ctx):
        """The EXACT reference Q6 pipeline (TPCH.cc:85-97): pipe-CSV,
        mapColumn int(replace), three filters, positional-access fold.
        The minisample's rows are 1996-dated, so Q6's 1994 window sums
        to the initial 0.0 — asserting that exercises the empty-fold
        path; the count fold asserts the parse saw every line."""
        path = os.path.join(RES, "tpch", "lineitem.minisample.tbl")
        n = (ctx.csv(path, columns=self.COLS, header=False, delimiter="|")
             .aggregate(lambda a, b: a + b, lambda a, x: a + 1, 0)
             .collect())
        with open(path) as fp:
            want_lines = len([ln for ln in fp.read().split("\n") if ln])
        assert n == [want_lines]

        ds = (ctx.csv(path, columns=self.COLS, header=False, delimiter="|")
              .mapColumn("l_shipdate", lambda x: int(x.replace("-", "")))
              .filter(lambda x: 19940101 <= x["l_shipdate"]
                      < 19940101 + 10000)
              .filter(lambda x: 0.06 - 0.01 <= x["l_discount"]
                      <= 0.06 + 0.01)
              .filter(lambda x: x["l_quantity"] < 24)
              .aggregate(lambda a, b: a + b,
                         lambda a, x: a + x[5] * x[6], 0.0))
        assert ds.collect() == [0.0]

    def test_q6_window_with_matches(self, ctx):
        """Same pipeline, window widened to the sample's 1996 dates so
        the fold actually accumulates; oracle = CPython over the parsed
        file."""
        path = os.path.join(RES, "tpch", "lineitem.minisample.tbl")
        ds = (ctx.csv(path, columns=self.COLS, header=False, delimiter="|")
              .mapColumn("l_shipdate", lambda x: int(x.replace("-", "")))
              .filter(lambda x: 19960101 <= x["l_shipdate"]
                      < 19960101 + 10000)
              .aggregate(lambda a, b: a + b,
                         lambda a, x: a + x[5] * x[6], 0.0))
        got = ds.collect()

        want = 0.0
        with open(path) as fp:
            for ln in fp.read().split("\n"):
                if not ln:
                    continue
                cells = ln.split("|")
                ship = int(cells[10].replace("-", ""))
                if 19960101 <= ship < 19960101 + 10000:
                    want += float(cells[5]) * float(cells[6])
        assert len(got) == 1 and abs(got[0] - want) < 1e-9


def _zillow_udfs():
    from test_zillow_port import (extractBa, extractBd, extractOffer,
                                  extractPrice, extractSqft, extractType)
    return extractBd, extractBa, extractSqft, extractOffer, \
        extractType, extractPrice


class TestZillowDirtySample:
    """The reference's flagship dirty CSV (19 lines incl. rows that
    raise in extractBd/extractPrice) through the ported Z2 chain; the
    CPython oracle replays the same chain over the engine-typed rows, so
    every drop/keep decision must match row for row."""

    def test_dirty_pipeline_differential(self, ctx):
        extractBd, extractBa, extractSqft, extractOffer, extractType, \
            extractPrice = _zillow_udfs()
        path = os.path.join(RES, "zillow_dirty_sample.csv")
        base = ctx.csv(path)
        cols = base.columns
        typed_rows = base.collect()

        ds = (base
              .withColumn("bedrooms", extractBd)
              .filter(lambda x: x["bedrooms"] < 10)
              .withColumn("type", extractType)
              .filter(lambda x: x["type"] == "condo")
              .withColumn("zipcode", lambda x: "%05d" % int(x["postal_code"]))
              .mapColumn("city", lambda x: x[0].upper() + x[1:].lower())
              .withColumn("bathrooms", extractBa)
              .withColumn("sqft", extractSqft)
              .withColumn("offer", extractOffer)
              .withColumn("price", extractPrice)
              .filter(lambda x: 100000 < x["price"] < 2e7
                      and x["offer"] == "sale")
              .selectColumns(["url", "zipcode", "address", "city", "state",
                              "bedrooms", "bathrooms", "sqft", "offer",
                              "type", "price"]))
        got = sorted(ds.collect())

        out = []
        for tup in typed_rows:
            x = dict(zip(cols, tup if isinstance(tup, tuple) else (tup,)))
            try:
                x["bedrooms"] = extractBd(x)
                if not x["bedrooms"] < 10:
                    continue
                x["type"] = extractType(x)
                if not x["type"] == "condo":
                    continue
                x["zipcode"] = "%05d" % int(x["postal_code"])
                c0 = x["city"]
                x["city"] = c0[0].upper() + c0[1:].lower()
                x["bathrooms"] = extractBa(x)
                x["sqft"] = extractSqft(x)
                x["offer"] = extractOffer(x)
                x["price"] = extractPrice(x)
                if not (100000 < x["price"] < 2e7
                        and x["offer"] == "sale"):
                    continue
                out.append(tuple(x[c] for c in
                                 ["url", "zipcode", "address", "city",
                                  "state", "bedrooms", "bathrooms", "sqft",
                                  "offer", "type", "price"]))
            except Exception:
                continue
        assert got == sorted(out)
        assert got, "dirty sample must yield at least one clean sale"


class Test311Micro:
    """The reference's 311 pipeline (python test_aggregates.py test_311)
    over the real 2000-row 311_subset.micro.csv: Optional[str] hints +
    null_values, mapColumn zip fix, unique()."""

    def test_fix_zip_unique(self, ctx):
        import typing

        def fix_zip_codes(zips):
            if not zips:
                return None
            s = zips[:5]
            if s == "00000":
                return None
            return s

        path = os.path.join(RES, "311_subset.micro.csv")
        nulls = ["Unspecified", "NO CLUE", "NA", "N/A", "0", ""]
        # the real export's zip column is "Incident Zip" (col 8); hint it
        # Optional[str] like the reference test hints its zip column
        base = ctx.csv(path, null_values=nulls,
                       type_hints={8: typing.Optional[str]})
        cols = base.columns
        zi = cols.index("Incident Zip")
        typed = base.collect()

        ds = base.mapColumn("Incident Zip", fix_zip_codes).unique()
        got = sorted(ds.collect(), key=repr)

        seen = set()
        for tup in typed:
            vals = list(tup if isinstance(tup, tuple) else (tup,))
            vals[zi] = fix_zip_codes(vals[zi])
            seen.add(tuple(vals))
        assert got == sorted(seen, key=repr)
