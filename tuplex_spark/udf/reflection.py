"""Extract the AST of a user UDF (lambda or def).

Same job as the reference's python/tuplex/utils/reflection.py (source via
inspect + backup), but we only need the ``ast`` tree: the compiler
(compiler.py) translates it to Column expressions, and the fallback path
calls the live function object directly (no source needed).
"""

from __future__ import annotations

import ast
import inspect
import textwrap


class SourceExtractionError(Exception):
    pass


def function_ast(fn) -> ast.Lambda | ast.FunctionDef:
    """Return the Lambda or FunctionDef node for ``fn``."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError) as e:
        raise SourceExtractionError(str(e)) from e
    src = textwrap.dedent(src)
    tree = _parse_lenient(src)
    if tree is None:
        raise SourceExtractionError("could not parse UDF source")
    name = getattr(fn, "__name__", "<lambda>")
    if name != "<lambda>":
        for node in ast.walk(tree):
            if isinstance(node, ast.FunctionDef) and node.name == name:
                return node
        raise SourceExtractionError(f"no def {name} in extracted source")
    lambdas = [n for n in ast.walk(tree) if isinstance(n, ast.Lambda)]
    if len(lambdas) == 1:
        # even a single candidate must match the live code object:
        # inspect.getblock TRUNCATES a multiline lambda whose first line
        # parses standalone (`lambda x: x["col"]` + `[...]` continuation),
        # which silently compiled a different function
        try:
            code = compile(ast.Expression(body=lambdas[0]), "<udf>", "eval")
            if _code_fingerprint(code.co_consts[0]) == \
                    _code_fingerprint(fn.__code__):
                return lambdas[0]
        except SyntaxError:
            pass
        ext = _extend_lambda_source(fn)
        if ext is not None:
            return ext
        raise SourceExtractionError("extracted lambda does not match "
                                    "the live function")
    if not lambdas:
        raise SourceExtractionError("no lambda in extracted source")
    # several lambdas on one line: pick by matching argument names
    want = list(inspect.signature(fn).parameters)
    matches = [l for l in lambdas if [a.arg for a in l.args.args] == want]
    if len(matches) == 1:
        return matches[0]
    # ambiguous; compare compiled code as a tiebreak.  The fingerprint
    # must include constants and names, not just co_code: lambdas like
    # `x and True` vs `x and False` share identical bytecode and differ
    # only in co_consts — matching on co_code alone silently compiled
    # the WRONG lambda.  Still ambiguous -> refuse; the fallback path
    # calls the live function object and is always correct.
    want_fp = _code_fingerprint(fn.__code__)
    fp_matches = []
    for cand in matches or lambdas:
        try:
            code = compile(ast.Expression(body=cand), "<udf>", "eval")
            if _code_fingerprint(code.co_consts[0]) == want_fp:
                fp_matches.append(cand)
        except Exception:
            continue
    if len(fp_matches) == 1 or (fp_matches and all(
            ast.dump(c) == ast.dump(fp_matches[0]) for c in fp_matches)):
        return fp_matches[0]
    raise SourceExtractionError("ambiguous lambda source")


def _extend_lambda_source(fn):
    """Recover a multiline lambda that inspect.getblock truncated.

    getblock stops at the first standalone-parseable LOGICAL line, so a
    lambda whose continuation lines are themselves well-formed
    expression tails — implicit string concatenation is the canonical
    case (``lambda x: f"..."`` + an indented ``f"..."`` line) — comes
    back with its body cut short.  The fingerprint guard in
    function_ast catches that; this backstop re-reads the defining
    file and extends the block one line at a time until some candidate
    lambda recompiles to the live code's fingerprint.  Returns None
    when no extension matches (caller raises)."""
    code0 = getattr(fn, "__code__", None)
    try:
        lines, _ = inspect.findsource(fn)
    except (OSError, TypeError):
        return None
    want_fp = _code_fingerprint(code0)
    base = code0.co_firstlineno - 1
    for end in range(base + 2, min(base + 25, len(lines)) + 1):
        src = textwrap.dedent("".join(lines[base:end]))
        tree = _parse_lenient(src)
        if tree is None:
            continue
        for cand in (n for n in ast.walk(tree)
                     if isinstance(n, ast.Lambda)):
            try:
                c = compile(ast.Expression(body=cand), "<udf>", "eval")
            except SyntaxError:
                continue
            if _code_fingerprint(c.co_consts[0]) == want_fp:
                return cand
    return None


def _code_fingerprint(code):
    """Semantic bytecode fingerprint.  Raw co_code comparison is both too
    weak (`x and True` vs `x and False` share bytecode, differing only in
    constants) and too strict (a closure-captured name compiles to
    LOAD_DEREF in the live function but LOAD_GLOBAL when the extracted
    source is recompiled standalone).  Normalize: all variable loads
    compare by name, constants by (type, value), cell/scope setup noise
    is dropped."""
    import dis
    _noise = {"COPY_FREE_VARS", "MAKE_CELL", "RESUME", "NOP", "CACHE",
              "PRECALL", "PUSH_NULL"}
    _loads = {"LOAD_GLOBAL", "LOAD_DEREF", "LOAD_NAME", "LOAD_CLASSDEREF",
              "LOAD_FAST", "LOAD_FAST_CHECK"}
    ops = []
    for ins in dis.get_instructions(code):
        name, arg = ins.opname, ins.argval
        if name in _noise:
            continue
        if name in _loads:
            ops.append(("LOAD_VAR", arg))
            continue
        if name in ("LOAD_METHOD", "LOAD_ATTR"):
            # AST-based recompilation may emit LOAD_ATTR where the
            # original compiler fused LOAD_METHOD — same semantics
            ops.append(("LOAD_ATTR", arg))
            continue
        if hasattr(arg, "co_code"):
            arg = _code_fingerprint(arg)
        elif name == "LOAD_CONST":
            arg = (type(arg).__name__, arg if not isinstance(arg, bytes)
                   else arg)
        ops.append((name, arg))
    return tuple(ops)


def _parse_lenient(src: str):
    """Parse source that may be an expression fragment like
    ``df.map(lambda x: x + 1)`` or a multiline call continuation."""
    for candidate in (src, src.rstrip().rstrip(",").rstrip()):
        try:
            return ast.parse(candidate)
        except SyntaxError:
            pass
    # wrap in parens (handles dangling '.map(lambda...' fragments poorly,
    # so also try slicing from the first 'lambda')
    i = src.find("lambda")
    if i >= 0:
        frag = src[i:].rstrip()
        while frag:
            try:
                return ast.parse(f"({frag})")
            except SyntaxError:
                frag = frag[:-1]
    return None


def closure_env(fn) -> dict:
    """Name -> live object for names the UDF body may reference
    (reference analog: dataset.py:77 get_globals / ClosureEnvironment)."""
    env = {}
    env.update(getattr(fn, "__globals__", {}))
    code = getattr(fn, "__code__", None)
    closure = getattr(fn, "__closure__", None)
    if code is not None and closure:
        for name, cell in zip(code.co_freevars, closure):
            try:
                env[name] = cell.cell_contents
            except ValueError:
                pass
    return env
