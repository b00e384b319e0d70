"""Safe calc-expression mini-language.

The reference evaluates request-supplied numpy expression strings with
``eval`` in four places (derived-layer calc, filter leaves, encode/decode
expressions — reference window.py:159-163, query.py:71-73,
data_environment.py:160-179). That is an arbitrary-code-execution surface
on untrusted input. We replace it with an ``ast``-parsed, whitelist-checked
compiler that produces a numpy closure ``f(A, area) -> ndarray``.

Grammar (whitelist):
  names:      A, area
  constants:  int/float/str literals, nan
  operators:  + - * / // % ** unary- ; comparisons > < >= <= == != ; & |
  calls:      floor ceil where sqrt log log10 abs minimum maximum
              astype(x, 'dtype')  datetime64(x)  days_since_epoch(x)
  attribute form ``np.where`` / ``A.astype('u2')`` is accepted and
  normalized to the call forms above.
"""

from __future__ import annotations

import ast
from collections.abc import Callable

import numpy as np

# A..H: positional layer inputs (A = single-source calc; B.. for
# multi-layer map algebra, e.g. "(A - B) / (A + B)")
_ALLOWED_NAMES = {"A", "B", "C", "D", "E", "F", "G", "H", "area"}
_ALLOWED_CONSTS = {"nan": np.nan, "pi": np.pi, "True": True, "False": False}


def _days_since_epoch(x):
    """'YYYY-MM-DD' (scalar or array) -> int days since 1970-01-01."""
    return np.asarray(np.asarray(x, dtype="datetime64[D]") - np.datetime64("1970-01-01", "D")).astype(np.int64)


_ALLOWED_FUNCS: dict[str, Callable] = {
    "floor": np.floor,
    "ceil": np.ceil,
    "where": np.where,
    "sqrt": np.sqrt,
    "log": np.log,
    "log10": np.log10,
    "abs": np.abs,
    "minimum": np.minimum,
    "maximum": np.maximum,
    "datetime64": lambda x: np.asarray(x).astype("datetime64[D]"),
    "days_since_epoch": _days_since_epoch,
}

_SAFE_DTYPES = {
    "uint8", "uint16", "uint32", "int8", "int16", "int32", "int64",
    "float32", "float64", "u1", "u2", "u4", "i1", "i2", "i4", "i8",
    "f4", "f8", "str", "datetime64[D]",
}

_BINOPS = {
    ast.Add: np.add,
    ast.Sub: np.subtract,
    ast.Mult: np.multiply,
    ast.Div: np.true_divide,
    ast.FloorDiv: np.floor_divide,
    ast.Mod: np.mod,
    ast.Pow: np.power,
    ast.BitAnd: np.bitwise_and,
    ast.BitOr: np.bitwise_or,
}

_CMPOPS = {
    ast.Gt: np.greater,
    ast.Lt: np.less,
    ast.GtE: np.greater_equal,
    ast.LtE: np.less_equal,
    ast.Eq: np.equal,
    ast.NotEq: np.not_equal,
}


class UnsafeExpressionError(ValueError):
    pass


def _compile_node(node: ast.AST) -> Callable[[dict], object]:
    if isinstance(node, ast.Expression):
        return _compile_node(node.body)
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float, str, bool)):
            v = node.value
            return lambda env: v
        raise UnsafeExpressionError(f"literal {node.value!r} not allowed")
    if isinstance(node, ast.Name):
        if node.id in _ALLOWED_NAMES:
            name = node.id
            return lambda env: env[name]
        if node.id in _ALLOWED_CONSTS:
            v = _ALLOWED_CONSTS[node.id]
            return lambda env: v
        raise UnsafeExpressionError(f"name {node.id!r} not allowed")
    if isinstance(node, ast.Attribute):
        # np.<const> like np.nan
        if isinstance(node.value, ast.Name) and node.value.id in ("np", "numpy"):
            if node.attr in _ALLOWED_CONSTS:
                v = _ALLOWED_CONSTS[node.attr]
                return lambda env: v
        raise UnsafeExpressionError(f"attribute {ast.dump(node)} not allowed")
    if isinstance(node, ast.UnaryOp):
        sub = _compile_node(node.operand)
        if isinstance(node.op, ast.USub):
            return lambda env: np.negative(sub(env))
        if isinstance(node.op, ast.UAdd):
            return sub
        if isinstance(node.op, ast.Invert):
            return lambda env: np.invert(sub(env))
        raise UnsafeExpressionError("unary op not allowed")
    if isinstance(node, ast.BinOp):
        op = _BINOPS.get(type(node.op))
        if op is None:
            raise UnsafeExpressionError(f"operator {type(node.op).__name__} not allowed")
        lf, rf = _compile_node(node.left), _compile_node(node.right)
        return lambda env: op(lf(env), rf(env))
    if isinstance(node, ast.Compare):
        if len(node.ops) != 1:
            raise UnsafeExpressionError("chained comparisons not allowed")
        op = _CMPOPS.get(type(node.ops[0]))
        if op is None:
            raise UnsafeExpressionError("comparison not allowed")
        lf, rf = _compile_node(node.left), _compile_node(node.comparators[0])
        return lambda env: op(lf(env), rf(env))
    if isinstance(node, ast.BoolOp):
        subs = [_compile_node(v) for v in node.values]
        red = np.logical_and if isinstance(node.op, ast.And) else np.logical_or
        def run(env, subs=subs, red=red):
            acc = subs[0](env)
            for s in subs[1:]:
                acc = red(acc, s(env))
            return acc
        return run
    if isinstance(node, ast.Call):
        return _compile_call(node)
    raise UnsafeExpressionError(f"syntax {type(node).__name__} not allowed")


def _compile_call(node: ast.Call) -> Callable[[dict], object]:
    if node.keywords:
        raise UnsafeExpressionError("keyword arguments not allowed")
    func = node.func
    # method form: X.astype('dtype')
    if isinstance(func, ast.Attribute) and func.attr == "astype":
        recv = _compile_node(func.value)
        if len(node.args) != 1 or not isinstance(node.args[0], ast.Constant):
            raise UnsafeExpressionError("astype requires a literal dtype")
        dt = node.args[0].value
        if dt not in _SAFE_DTYPES:
            raise UnsafeExpressionError(f"dtype {dt!r} not allowed")
        return lambda env: np.asarray(recv(env)).astype(dt)
    # np.f(...) or bare f(...)
    name = None
    if isinstance(func, ast.Attribute) and isinstance(func.value, ast.Name) and func.value.id in ("np", "numpy"):
        name = func.attr
    elif isinstance(func, ast.Name):
        name = func.id
    if name == "astype":
        sub = _compile_node(node.args[0])
        dt = node.args[1].value if isinstance(node.args[1], ast.Constant) else None
        if dt not in _SAFE_DTYPES:
            raise UnsafeExpressionError(f"dtype {dt!r} not allowed")
        return lambda env: np.asarray(sub(env)).astype(dt)
    fn = _ALLOWED_FUNCS.get(name or "")
    if fn is None:
        raise UnsafeExpressionError(f"function {name!r} not allowed")
    args = [_compile_node(a) for a in node.args]
    return lambda env: fn(*(a(env) for a in args))


def compile_expression(expr: str, n_inputs: int = 1) -> Callable:
    """Compile a calc string to ``f(A, area=None, **extra) -> ndarray``.

    Examples from the reference's layer catalog semantics:
    ``"A % 10000"``, ``"floor(A / 10000)"``, ``"A * area"``,
    ``"where(A > 0, area, 0)"``,
    ``"(A + 16435).astype('datetime64[D]').astype('str')"``.

    ``n_inputs`` bounds the positional layer names the calc may use
    (1 -> only A; 3 -> A, B, C): an unbound name is a PLAN-TIME
    ``UnsafeExpressionError``, not a KeyError deep inside an executor.

    Memoized: the zonal kernel compiles derived-layer calcs once per
    executor, not once per (aoi, cell) group.
    """
    key = (expr, int(n_inputs))
    cached = _COMPILE_CACHE.get(key)
    if cached is not None:
        return cached
    tree = ast.parse(expr, mode="eval")
    bound = {chr(ord("A") + i) for i in range(int(n_inputs))} | {"area"}
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Name)
            and node.id in _ALLOWED_NAMES
            and node.id not in bound
        ):
            raise UnsafeExpressionError(
                f"name {node.id!r} is not bound: this calc has {n_inputs} "
                f"layer input(s) ({', '.join(sorted(bound - {'area'}))})"
            )
    fn = _compile_node(tree)

    def run(A, area=None, **extra):
        # extra: positional layer inputs B.. for multi-layer map algebra.
        # errstate: where(B > 0, A / B, nan) evaluates A / B eagerly;
        # the inf/nan lanes are discarded by the where, so the numpy
        # divide warnings are noise (numpy semantics still apply)
        with np.errstate(divide="ignore", invalid="ignore"):
            return fn({"A": A, "area": area, **extra})

    run.__name__ = f"calc<{expr}>"
    _COMPILE_CACHE[key] = run
    return run


def evaluate_multi_calc(calc: str, arrs: "list", area) -> "np.ndarray":
    """Evaluate a multi-layer calc with sources bound positionally to
    A, B, C... — the ONE place the binding rule lives (the zonal kernel
    and the numpy oracle both call this, so they cannot drift)."""
    extra = {chr(ord("B") + i): a for i, a in enumerate(arrs[1:])}
    return compile_expression(calc, n_inputs=len(arrs))(arrs[0], area, **extra)


_COMPILE_CACHE: dict[str, Callable] = {}


def round_half_up(a, decimals: int):
    """HALF-UP (away-from-zero) rounding, matching Spark ``F.round`` and
    DuckDB ``ROUND`` — numpy's ``np.round`` and python's ``round`` are
    banker's half-even and flip values landing exactly on a .5 boundary.
    Works on scalars and arrays; the ONE definition every cross-engine
    rounding in this repo shares."""
    s10 = 10.0 ** decimals
    return np.copysign(np.floor(np.abs(a) * s10 + 0.5), a) / s10
