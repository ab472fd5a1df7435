"""Exception-code model.

Mirrors the *semantics* of the reference's exception routing (class
hierarchy -> integer codes, reference: utils/include/ExceptionCodes.h:24-120):
rows whose UDF raises are tagged with a code, excluded from normal output,
and can be re-processed by ``resolve``/``ignore`` or counted via
``exception_counts``.  The mechanism here is Spark-native: a hidden
``__exc_code`` int column plus a JSON payload of the failing operator's
input row (see dataset.py), so rows never leave their DataFrame and
in-order merge is free.
"""

from __future__ import annotations

# Integer codes. 0 = OK. Values are stable across a session (they end up in
# DataFrames), chosen to parallel the reference's enum without copying it.
OK = 0

_CODES: dict[str, int] = {
    "Exception": 100,
    "ArithmeticError": 110,
    "ZeroDivisionError": 111,
    "OverflowError": 112,
    "FloatingPointError": 113,
    "LookupError": 120,
    "IndexError": 121,
    "KeyError": 122,
    "ValueError": 130,
    "UnicodeError": 131,
    "UnicodeDecodeError": 132,
    "UnicodeEncodeError": 133,
    "TypeError": 140,
    "AttributeError": 150,
    "AssertionError": 160,
    "StopIteration": 170,
    "StopAsyncIteration": 171,
    "RuntimeError": 180,
    "NotImplementedError": 181,
    "RecursionError": 182,
    "NameError": 190,
    "UnboundLocalError": 191,
    # OSError family (reference ExceptionCodes.h covers the full builtin
    # taxonomy: FILENOTFOUNDERROR, PERMISSIONERROR, ...)
    "OSError": 200,
    "FileNotFoundError": 201,
    "FileExistsError": 202,
    "PermissionError": 203,
    "IsADirectoryError": 204,
    "NotADirectoryError": 205,
    "InterruptedError": 206,
    "ProcessLookupError": 207,
    "ChildProcessError": 208,
    "BlockingIOError": 209,
    "ConnectionError": 210,
    "ConnectionAbortedError": 211,
    "ConnectionRefusedError": 212,
    "ConnectionResetError": 213,
    "BrokenPipeError": 214,
    "TimeoutError": 215,
    "EOFError": 220,
    "BufferError": 221,
    "MemoryError": 222,
    "ReferenceError": 223,
    "SystemError": 224,
    "ImportError": 225,
    "ModuleNotFoundError": 226,
    # input malformation (CSV bad cell etc.), reference BADPARSE_STRING_INPUT
    "BadParseInput": 300,
    # row rejected by parallelize() schema unification, reference PYTHON_PARALLELIZE
    "BadParallelizeInput": 310,
    # runtime UDF output doesn't fit the sample-inferred normal-case type
    # (reference: normal-case violation routed to the general-case path)
    "NormalCaseViolation": 320,
}

import builtins as _builtins

# live class objects for every coded name that is a Python builtin — the
# class hierarchy for resolve(ExcClass) matching comes from Python itself
_CODES_CLASSES = [
    getattr(_builtins, n) for n in _CODES
    if isinstance(getattr(_builtins, n, None), type)
]

# engine-internal codes with no Python class: caught only by Exception
# (NormalCaseViolation) or only explicitly (the input-malformation codes)
_EXC_ONLY = {"NormalCaseViolation"}


def code_for(exc: type | str) -> int:
    name = exc if isinstance(exc, str) else exc.__name__
    if name not in _CODES:
        # unknown user exception class: bucket onto Exception
        return _CODES["Exception"]
    return _CODES[name]


def codes_caught_by(exc: type | str) -> set[int]:
    """All codes that ``resolve(exc, ...)`` / ``ignore(exc)`` should catch:
    the class itself plus every coded subclass (real Python hierarchy)."""
    cls = exc
    if isinstance(exc, str):
        cls = getattr(_builtins, exc, None)
        if not isinstance(cls, type):
            return {_CODES[exc]} if exc in _CODES else {_CODES["Exception"]}
    names = {c.__name__ for c in _CODES_CLASSES if issubclass(c, cls)}
    if cls is Exception:
        names |= _EXC_ONLY
    if not names:
        names = {"Exception"}
    return {_CODES[n] for n in names if n in _CODES}


def code_for_instance(e: BaseException) -> int:
    """Code for a live exception object (nearest known ancestor class)."""
    for cls in type(e).__mro__:
        if cls.__name__ in _CODES:
            return _CODES[cls.__name__]
    return _CODES["Exception"]


def name_for_code(code: int) -> str:
    for name, c in _CODES.items():
        if c == code:
            return name
    return "Exception"
