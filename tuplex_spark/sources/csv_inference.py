"""CSV sampling inference: delimiter / header / per-column types.

Reference analog: core/src/logical/FileInputOperator.cc:47-98 (sample up
to csv.maxDetectionMemory bytes), utils/include/CSVStatistic.h:55-76
(delimiter & header estimation), FileInputOperator.cc:229-299 (normal-case
vs general-case typing with null_values / type_hints).

We sample locally on the driver (same as the reference), build an explicit
Spark schema, and let the distributed ``spark.read.csv`` scan use it — so
the cluster-side read is schema-driven (no Spark inferSchema second pass
over 100 TB).  Cells that violate the inferred schema surface through
PERMISSIVE mode's ``_corrupt_record`` as BadParseInput exception rows.
"""

from __future__ import annotations

import csv as _csv
import glob as _glob
import io

from pyspark.sql import types as T

MAX_DETECTION_BYTES = 256 * 1024  # reference: csv.maxDetectionMemory
CANDIDATE_DELIMS = [",", ";", "|", "\t"]


def sample_bytes(pattern: str, nbytes: int = MAX_DETECTION_BYTES) -> str:
    paths = sorted(_glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(pattern)
    with open(paths[0], "rb") as f:
        data = f.read(nbytes)
    text = data.decode("utf-8", errors="replace")
    # drop a trailing partial line
    if len(data) == nbytes and "\n" in text:
        text = text[: text.rfind("\n")]
    return text


def detect_delimiter(text: str) -> str:
    lines = [l for l in text.splitlines() if l][:100]
    best, best_score = ",", -1.0
    for d in CANDIDATE_DELIMS:
        counts = [l.count(d) for l in lines]
        if not counts or max(counts) == 0:
            continue
        mean = sum(counts) / len(counts)
        var = sum((c - mean) ** 2 for c in counts) / len(counts)
        score = mean / (1.0 + var)
        if score > best_score:
            best, best_score = d, score
    return best


def _cell_type(v: str, null_values) -> str:
    if v in null_values:
        return "null"
    try:
        int(v)
        return "int"
    except ValueError:
        pass
    try:
        float(v)
        return "float"
    except ValueError:
        pass
    if v.lower() in ("true", "false"):
        return "bool"
    return "str"


_T_ORDER = {"null": 0, "bool": 1, "int": 2, "float": 3, "str": 4}


def _widen(a: str | None, b: str) -> str:
    if a is None or a == "null":
        return b
    if b == "null":
        return a
    if {a, b} <= {"bool", "int", "float"}:
        return a if _T_ORDER[a] >= _T_ORDER[b] else b
    return a if a == b else "str"


def detect(pattern: str, delimiter: str | None, header: bool | None,
           null_values, quotechar: str = '"',
           normalcase_threshold: float = 0.9):
    """Returns (delimiter, has_header, columns, tag-per-column,
    multiline).

    Per-column typing is *normal-case majority* typing (reference:
    FileInputOperator.cc:229-299, tuplex.normalcaseThreshold): the most
    specific type covering >= threshold of non-null sampled cells wins;
    cells outside it surface as BadParseInput exception rows at scan time.
    Falls back to the widened type when no candidate reaches threshold.

    ``multiline`` is True when a sampled line carries an ODD number of
    quote chars — an unterminated quote means RFC-4180 records span
    physical lines, and the reader must parse whole records (Spark's
    multiLine mode; costs intra-file split parallelism, so it is only
    turned on when detected)."""
    text = sample_bytes(pattern)
    delim = delimiter or detect_delimiter(text)
    multiline = any(line.count(quotechar) % 2 == 1
                    for line in text.splitlines())
    rows = list(_csv.reader(io.StringIO(text), delimiter=delim,
                            quotechar=quotechar))
    rows = [r for r in rows if r]
    if not rows:
        return delim, bool(header), [], [], multiline
    width = max(len(r) for r in rows)
    rows = [r for r in rows if len(r) == width]

    def row_tags(r):
        return [_cell_type(c, null_values) for c in r]

    body_from = 0
    has_header = header
    if has_header is None:
        # header iff first row is all-string and differs from the body's
        # majority tags (reference: CSVStatistic header estimation)
        first = row_tags(rows[0])
        body = rows[1:] or rows
        body_majority = _majority_tags(body, null_values,
                                       normalcase_threshold)
        has_header = (all(t == "str" for t in first)
                      and first != body_majority and len(rows) > 1)
    if has_header:
        body_from = 1
    columns = rows[0] if has_header else \
        [f"column{i}" for i in range(width)]
    tags = _majority_tags(rows[body_from:] or rows, null_values,
                          normalcase_threshold)
    return delim, bool(has_header), columns, tags, multiline


# which tags a cell of a given tag can be parsed as (specific -> general)
_COMPAT = {"bool": {"bool"}, "int": {"int", "float"},
           "float": {"float"}, "str": {"str"}}


def _majority_tags(rows, null_values, threshold: float = 0.9):
    if not rows:
        return []
    width = len(rows[0])
    out = []
    for i in range(width):
        counts: dict[str, int] = {}
        widened = None
        n = 0
        for r in rows:
            t = _cell_type(r[i], null_values)
            widened = _widen(widened, t)
            if t != "null":
                counts[t] = counts.get(t, 0) + 1
                n += 1
        if not n:
            out.append("str")
            continue
        chosen = None
        for cand in ("bool", "int", "float"):
            covered = sum(c for t, c in counts.items()
                          if cand in _COMPAT.get(t, {"str"}))
            if covered / n >= threshold:
                chosen = cand
                break
        out.append(chosen or widened or "str")
    return out


_TAG_TO_SPARK = {"bool": T.BooleanType(), "int": T.LongType(),
                 "float": T.DoubleType(), "str": T.StringType(),
                 "null": T.StringType()}


def build_schema(columns, tags, type_hints=None) -> T.StructType:
    hints = dict(type_hints or {})
    fields = []
    for i, (name, tag) in enumerate(zip(columns, tags)):
        dt = _TAG_TO_SPARK.get(tag, T.StringType())
        hint = hints.get(name, hints.get(i))
        if hint is not None:
            dt = _hint_to_spark(hint)
        fields.append(T.StructField(name, dt, True))
    return fields and T.StructType(fields) or T.StructType([])


def _hint_to_spark(hint) -> T.DataType:
    if isinstance(hint, T.DataType):
        return hint
    # typing.Optional[X] / Union[X, None] (reference type_hints style,
    # e.g. test_aggregates.py test_311): nullability is universal in
    # Spark, so unwrap to X
    import typing
    if typing.get_origin(hint) is typing.Union:
        args = [a for a in typing.get_args(hint) if a is not type(None)]
        if len(args) == 1:
            return _hint_to_spark(args[0])
    m = {int: T.LongType(), float: T.DoubleType(), str: T.StringType(),
         bool: T.BooleanType(),
         "int": T.LongType(), "i64": T.LongType(),
         "float": T.DoubleType(), "f64": T.DoubleType(),
         "str": T.StringType(), "bool": T.BooleanType(),
         "Option[int]": T.LongType(), "Option[float]": T.DoubleType(),
         "Option[str]": T.StringType(), "Option[bool]": T.BooleanType()}
    return m.get(hint, T.StringType())
