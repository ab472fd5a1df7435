"""Port of the reference's flights benchmark UDF shapes
(reference: benchmarks/flights/runtuplex.py:140-200): branchy
None-returning cleanups, rfind/strip/slice string surgery, format with
zero-padding, and Option-typed arithmetic — checked against CPython."""


def cleanCode(t):
    if t["CancellationCode"] == "A":
        return "carrier"
    elif t["CancellationCode"] == "B":
        return "weather"
    elif t["CancellationCode"] == "C":
        return "national air system"
    elif t["CancellationCode"] == "D":
        return "security"
    else:
        return None


def divertedUDF(row):
    diverted = row["Diverted"]
    ccode = row["CancellationCode"]
    if diverted:
        return "diverted"
    else:
        if ccode:
            return ccode
        else:
            return "None"


def extractDefunctYear(t):
    x = t["Description"]
    desc = x[x.rfind("-") + 1:x.rfind(")")].strip()
    return int(desc) if len(desc) > 0 else None


ROWS = [
    ("A", 0, "Boston, MA", 1530, "Acme Air (1990-2005)"),
    ("B", 1, "New York, NY", 5, "Blue Sky (1985-)"),
    ("C", 0, "Chicago, IL", 945, "Charter Co (2001-2010)"),
    ("D", 0, "Dallas, TX", 2359, "Delta-ish (1970-1999)"),
    ("", 0, "Seattle, WA", 0, "Empty Desc (-)"),
]
COLUMNS = ["CancellationCode", "Diverted", "DestCityName", "CrsArrTime",
           "Description"]


class TestFlightsPipeline:
    def test_clean_code(self, ctx):
        got = ctx.parallelize(ROWS, columns=COLUMNS) \
            .withColumn("CancellationCode", cleanCode) \
            .selectColumns(["CancellationCode"]).collect()
        want = [cleanCode(dict(zip(COLUMNS, r))) for r in ROWS]
        assert got == want

    def test_diverted(self, ctx):
        got = ctx.parallelize(ROWS, columns=COLUMNS) \
            .withColumn("reason", divertedUDF) \
            .selectColumns(["reason"]).collect()
        want = [divertedUDF(dict(zip(COLUMNS, r))) for r in ROWS]
        assert got == want

    def test_dest_state(self, ctx):
        fn = lambda x: x["DestCityName"][x["DestCityName"].rfind(",") + 1:] \
            .strip()
        got = ctx.parallelize(ROWS, columns=COLUMNS) \
            .withColumn("DestState", fn) \
            .selectColumns(["DestState"]).collect()
        want = [fn(dict(zip(COLUMNS, r))) for r in ROWS]
        assert got == want

    def test_crs_time_format(self, ctx):
        fn = lambda x: "{:02}:{:02}".format(int(x / 100), x % 100) \
            if x else None
        got = ctx.parallelize(ROWS, columns=COLUMNS) \
            .mapColumn("CrsArrTime", fn) \
            .selectColumns(["CrsArrTime"]).collect()
        want = [fn(r[3]) for r in ROWS]
        assert got == want

    def test_defunct_year(self, ctx):
        got = ctx.parallelize(ROWS, columns=COLUMNS) \
            .withColumn("AirlineYearDefunct", extractDefunctYear) \
            .selectColumns(["AirlineYearDefunct"]).collect()
        want = [extractDefunctYear(dict(zip(COLUMNS, r))) for r in ROWS]
        assert got == want

    def test_airline_name(self, ctx):
        fn = lambda x: x["Description"][:x["Description"].rfind("(")].strip()
        got = ctx.parallelize(ROWS, columns=COLUMNS) \
            .withColumn("AirlineName", fn) \
            .selectColumns(["AirlineName"]).collect()
        want = [fn(dict(zip(COLUMNS, r))) for r in ROWS]
        assert got == want

    def test_full_chain(self, ctx):
        ds = (ctx.parallelize(ROWS, columns=COLUMNS)
              .withColumn("CancellationCode", cleanCode)
              .mapColumn("Diverted", lambda x: True if x > 0 else False)
              .withColumn("CancellationReason", divertedUDF)
              .withColumn("DestState",
                          lambda x: x["DestCityName"]
                          [x["DestCityName"].rfind(",") + 1:].strip())
              .withColumn("AirlineYearDefunct", extractDefunctYear))
        got = ds.collect()

        want = []
        for r in ROWS:
            x = dict(zip(COLUMNS, r))
            x["CancellationCode"] = cleanCode(x)
            x["Diverted"] = True if x["Diverted"] > 0 else False
            x["CancellationReason"] = divertedUDF(x)
            x["DestState"] = x["DestCityName"][
                x["DestCityName"].rfind(",") + 1:].strip()
            x["AirlineYearDefunct"] = extractDefunctYear(x)
            want.append(tuple(x.values()))
        assert got == want
