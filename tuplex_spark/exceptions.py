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
    "TypeError": 140,
    "AttributeError": 150,
    "AssertionError": 160,
    "StopIteration": 170,
    "RuntimeError": 180,
    "NameError": 190,
    # input malformation (CSV bad cell etc.), reference BADPARSE_STRING_INPUT
    "BadParseInput": 300,
    # row rejected by parallelize() schema unification, reference PYTHON_PARALLELIZE
    "BadParallelizeInput": 310,
    # runtime UDF output doesn't fit the sample-inferred normal-case type
    # (reference: normal-case violation routed to the general-case path)
    "NormalCaseViolation": 320,
}

# Python class hierarchy for resolve(ExcClass) matching: a resolver for a
# base class catches codes of all subclasses.
_SUBCLASSES: dict[str, set[str]] = {
    "Exception": set(_CODES) - {"BadParseInput", "BadParallelizeInput"},
    "ArithmeticError": {"ArithmeticError", "ZeroDivisionError", "OverflowError",
                        "FloatingPointError"},
    "LookupError": {"LookupError", "IndexError", "KeyError"},
}


def code_for(exc: type | str) -> int:
    name = exc if isinstance(exc, str) else exc.__name__
    if name not in _CODES:
        # unknown user exception class: bucket onto Exception
        return _CODES["Exception"]
    return _CODES[name]


def codes_caught_by(exc: type | str) -> set[int]:
    """All codes that ``resolve(exc, ...)`` / ``ignore(exc)`` should catch."""
    name = exc if isinstance(exc, str) else exc.__name__
    names = _SUBCLASSES.get(name, {name} if name in _CODES else set())
    if not names and not isinstance(exc, str):
        # walk the real class hierarchy for user classes
        names = {c.__name__ for c in _CODES_CLASSES if issubclass(c, exc)} \
            if isinstance(exc, type) else set()
    if not names:
        names = {name} if name in _CODES else {"Exception"}
    return {_CODES[n] for n in names if n in _CODES}


_CODES_CLASSES = [
    Exception, ArithmeticError, ZeroDivisionError, OverflowError,
    FloatingPointError, LookupError, IndexError, KeyError, ValueError,
    TypeError, AttributeError, AssertionError, StopIteration, RuntimeError,
    NameError,
]


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
