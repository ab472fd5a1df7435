"""UDF shapes that must execute with UNREWRITTEN assert statements.

pytest's assertion rewriting rewrites ``assert`` in test modules and
appends its own explanation to the AssertionError message — which would
make the CPython reference side of run_diff disagree with both real
CPython and the compiled path.  This module's name doesn't match
test_*.py, so pytest leaves it alone.
"""


def assert_with_message(x):
    try:
        assert x % 2 == 0, f"odd value {x}"
        return "even"
    except AssertionError as e:
        return str(e)


def assert_without_message(x):
    try:
        assert x != 3
        return str(x)
    except AssertionError as e:
        return "failed<" + str(e) + ">"


def assert_bare_args_len(x):
    try:
        assert x > 0
        return x
    except AssertionError as e:
        return len(e.args)


def assert_msg_args_value(x):
    try:
        assert x % 2 == 0, x * 100
        return x
    except AssertionError as e:
        return e.args[0]
