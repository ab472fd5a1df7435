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


SAMPLE_FILES = 3  # files sampled per glob: first + middle + last


def _read_sample(path: str, nbytes: int) -> str:
    with open(path, "rb") as f:
        data = f.read(nbytes)
    text = data.decode("utf-8", errors="replace")
    # drop a trailing partial line
    if len(data) == nbytes and "\n" in text:
        text = text[: text.rfind("\n")]
    return text


def sample_bytes(pattern: str, nbytes: int = MAX_DETECTION_BYTES) -> str:
    paths = sorted(_glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(pattern)
    return _read_sample(paths[0], nbytes)


def sample_files(pattern: str, nbytes: int = MAX_DETECTION_BYTES,
                 k: int = SAMPLE_FILES) -> list[str]:
    """Per-file sample texts for up to k files of the glob (first,
    middle, last — deterministic).  A single-file sample mis-types a
    multi-file glob with schema drift: later files' drifted cells all
    land in _corrupt_record quarantine at scan time (the reference
    shares this single-file weakness, FileInputOperator.cc:47-98; at
    100 TB the k-file union is the safer default)."""
    paths = sorted(_glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(pattern)
    if len(paths) <= k:
        chosen = paths
    else:
        chosen = [paths[0], paths[len(paths) // 2], paths[-1]]
    budget = max(nbytes // max(len(chosen), 1), 4096)
    return [_read_sample(p, budget) for p in chosen]


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
    texts = sample_files(pattern)
    # delimiter: per-file detection, majority vote (first file breaks
    # ties); multiline: any file with an unterminated quote line
    if delimiter:
        delim = delimiter
    else:
        votes = [detect_delimiter(t) for t in texts]
        delim = max(dict.fromkeys(votes),
                    key=lambda d: votes.count(d))
    multiline = any(line.count(quotechar) % 2 == 1
                    for t in texts for line in t.splitlines())
    per_file = []
    for t in texts:
        rows = list(_csv.reader(io.StringIO(t), delimiter=delim,
                                quotechar=quotechar))
        per_file.append([r for r in rows if r])
    rows0 = per_file[0]
    if not rows0:
        return delim, bool(header), [], [], multiline
    # Schema width comes from the LEAD file (its modal row width), never
    # a global max across sampled files: if a later file gained a column,
    # a global-max width would discard every lead-file row and inference
    # would come back empty.  Other files' rows only join the type vote
    # when they match the lead width; drifted files' rows land in
    # _corrupt_record quarantine at scan time, same as the single-file
    # behavior (reference: FileInputOperator.cc:47-98 samples one file).
    widths: dict[int, int] = {}
    for r in rows0:
        widths[len(r)] = widths.get(len(r), 0) + 1
    width = max(widths, key=lambda w: (widths[w], w))
    per_file = [[r for r in rs if len(r) == width] for rs in per_file]
    rows0 = per_file[0]
    if not rows0:
        return delim, bool(header), [], [], multiline

    def row_tags(r):
        return [_cell_type(c, null_values) for c in r]

    has_header = header
    if has_header is None:
        # header iff the lead file's first row is all-string and
        # differs from the body's majority tags (reference:
        # CSVStatistic header estimation)
        first = row_tags(rows0[0])
        body = rows0[1:] or rows0
        body_majority = _majority_tags(body, null_values,
                                       normalcase_threshold)
        has_header = (all(t == "str" for t in first)
                      and first != body_majority and len(rows0) > 1)
    columns = rows0[0] if has_header else \
        [f"column{i}" for i in range(width)]
    # type votes pool BODY rows of every sampled file (header=True
    # makes the scan skip each file's first line, so drop it from
    # every sample, not just the first)
    body_from = 1 if has_header else 0
    pooled = [r for rs in per_file for r in (rs[body_from:] or rs)]
    tags = _majority_tags(pooled or rows0, null_values,
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
