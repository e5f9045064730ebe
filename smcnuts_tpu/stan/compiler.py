"""Compile a parsed Stan program into a jittable `Model`.

TPU-native replacement for the reference's BridgeStan boundary (reference
smcnuts/model/bridgestan.py:13-120): instead of compiling the `.stan` file to
a C++ shared library and crossing a per-particle FFI, the model block is
*interpreted once with JAX tracers* — loops unrolled over the concrete data
sizes, data baked in as constants — producing a pure `logp(theta, phi)` that
XLA compiles and `jax.grad` differentiates. The reference's pathological
tempering mechanism (rewriting `phi` in the data JSON on disk and reloading
the model per bisection iterate, bridgestan.py:122-147) disappears: `phi` is
just a traced scalar argument.

Semantics:

- Parameters are flattened into one unconstrained theta vector in declaration
  order. Constraints map exactly as Stan's transforms with the log-Jacobian
  added to the target (BridgeStan `adjust_transform=True`, bridgestan.py:28):
  lower → exp shift, upper → negated exp shift, lower+upper → scaled logistic.
- The tempering split required by the framework's `logp = logprior + phi *
  loglik` identity is recovered from the program itself: `loglik(theta) =
  target(theta, phi=1) - target(theta, phi=0)` and `logprior(theta) =
  target(theta, phi=0) + jacobian(theta)`. This is exact whenever `phi`
  enters the target linearly — the convention both reference models follow
  (`arma.stan:30`, `PRMwCD.stan:32`), stated as such in their comments. A
  model with no `phi` in its data block gets `loglik = 0` and the full
  posterior as `logprior` (i.e. it runs untempered).
- `constrain` maps theta to [parameters; transformed parameters; generated
  quantities], mirroring bridgestan.py:93-120 including the fixed-seed RNG
  the reference threads through `param_constrain` (`new_rng(seed=0)`,
  bridgestan.py:106): every `*_rng` call in generated quantities draws from
  a fixed jax.random key folded with a per-call-site counter, so constrained
  estimates are deterministic run to run, exactly like the reference.

Loop compilation: short `for` loops are unrolled in Python (bounds are
data-derived ints; data indexing folds to constants — ideal for XLA), but a
loop of `scan_threshold` (default 64) or more iterations is LOWERED TO
`lax.scan`, preferring the STREAMING form: container writes at the loop
index become stacked scan outputs, lagged reads `C[t-k]` become a small
carried window, affine data reads `A[t+c]` become pre-sliced scan xs, and
`target +=` accumulates through the carry — pure dataflow with no dynamic
indexing, bit-identical to the unrolled interpretation. Bodies outside that
idiom use a carried-array scan (dynamic slices/updates), and anything the
scan paths cannot express (container declarations in the body,
parameter-dependent `if`, loop-variable-dependent inner bounds) falls back
to full unrolling, which is always semantically correct. A T-step
recurrence then traces as one scan instead of T unrolled steps — compile
time O(1) in T, which is what makes frontend-compiled models usable on the
remote TPU compiler (an unrolled arma T=200 recurrence is a compile-time
bomb there).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import Model
from .math import (
    DISTRIBUTIONS,
    ELEMENTWISE_DENSITIES,
    FUNCTIONS,
    LCCDFS,
    LCDFS,
    LOG_SQRT_2PI,
    RNG_FUNCTIONS,
    RowVector,
    is_row,
    truncated_lp,
    truncation_lognorm,
)
from .parser import (
    Assign,
    Bin,
    Break,
    Call,
    Continue,
    Decl,
    ExprStmt,
    For,
    FuncDef,
    If,
    Index,
    Num,
    Program,
    RangeIdx,
    Reject,
    Return,
    Sampling,
    StanSyntaxError,
    TargetPlus,
    Ternary,
    Unary,
    Var,
    While,
    parse,
)


class StanCompileError(Exception):
    pass


# ------------------------------------------------------------- environments


class _LocalArray:
    """Mutable local container (vector / array / matrix declared in a block).

    Elements live as individual scalars/rows in a nested Python list so that
    unrolled elementwise assignment and reads are pure constant-index Python
    operations; reading the whole container stacks it into a jnp array.
    """

    def __init__(self, dims, fill=None):
        def build(ds):
            if not ds:
                return fill
            return [build(ds[1:]) for _ in range(ds[0])]

        self.dims = tuple(dims)
        self.data = build(list(dims))

    def get(self, idxs):
        node = self.data
        for i in idxs:
            node = node[i - 1]  # Stan is 1-based
        if isinstance(node, list):
            return _stack_nested(node)
        if node is None:
            raise StanCompileError("read of uninitialized local element")
        return node

    def set(self, idxs, value):
        node = self.data
        for i in idxs[:-1]:
            node = node[i - 1]
        node[idxs[-1] - 1] = value

    def as_array(self):
        return _stack_nested(self.data)

    def as_array_filled(self, fill=float("nan")):
        """Like as_array, but uninitialized elements become `fill` (NaN —
        Stan's own value for undefined reals) instead of raising. Used when
        a container becomes a lax.scan carry, where a read-before-write then
        surfaces as NaN exactly as it would in Stan.

        Mostly-uninitialized containers (the common pre-recurrence shape:
        a handful of seed elements set before a long scanned loop) lower to
        one fill plus a few scatters rather than a T-element stack — keeping
        the traced program O(1) in the container length."""
        sets = []
        complete = True

        def walk(node, idx):
            nonlocal complete
            if isinstance(node, list):
                for k, child in enumerate(node):
                    walk(child, idx + (k,))
            elif node is None:
                complete = False
            else:
                sets.append((idx, node))

        walk(self.data, ())
        if complete:
            return _stack_nested(self.data)
        if len(sets) <= 32:
            arr = jnp.full(self.dims, fill, dtype=float)
            for idx, val in sets:
                arr = arr.at[idx].set(val)
            return arr

        def conv(node):
            if isinstance(node, list):
                return jnp.stack([conv(x) for x in node])
            if node is None:
                return jnp.asarray(fill, dtype=float)
            return jnp.asarray(node, dtype=float)

        return conv(self.data)


def _stack_nested(node):
    if isinstance(node, list):
        parts = [_stack_nested(x) for x in node]
        if any(p is None for p in parts):
            raise StanCompileError(
                "whole-container read of a partially-initialized local"
            )
        return jnp.stack([jnp.asarray(p, dtype=float) for p in parts])
    return node


def _as_value(v):
    """Collapse a _LocalArray to a jnp array and strip row orientation;
    pass scalars/arrays through. The orientation-BLIND accessor: correct
    wherever Stan semantics do not depend on row/column (distribution
    arguments, reductions, elementwise math)."""
    if isinstance(v, _LocalArray):
        return v.as_array()
    if isinstance(v, RowVector):
        return v.data
    return v


def _as_value_oriented(v):
    """Like _as_value but keeps the RowVector tag (and materializes a
    row-declared _LocalArray as a RowVector) — for orientation-aware
    builtins (transpose, append_row/col, head/tail/...)."""
    if isinstance(v, _LocalArray):
        arr = v.as_array()
        return RowVector(arr) if getattr(v, "row", False) else arr
    return v


def _orient(v):
    """(is_row, payload) of a value, materializing containers."""
    if isinstance(v, RowVector):
        return True, v.data
    if isinstance(v, _LocalArray):
        return bool(getattr(v, "row", False)), v.as_array()
    return False, v


# Builtins whose Stan signature/result depends on row/column orientation:
# these receive orientation-tagged arguments (everything else gets the
# orientation-blind _as_value form).
_ORIENT_FNS = frozenset((
    "transpose", "append_row", "append_col", "head", "tail", "segment",
    "reverse", "sort_asc", "sort_desc", "cumulative_sum", "to_row_vector",
    "to_vector",
))

# Declared types whose trailing axis is a ROW axis: a 1-D read that keeps
# (only) the last axis of such a value is a Stan row_vector.
_ROW_LAST_AXIS_TYPES = frozenset((
    "matrix", "row_vector", "corr_matrix", "cov_matrix",
    "cholesky_factor_corr", "cholesky_factor_cov",
))

_EMPTY: dict = {}


def _require_int(v, what):
    if isinstance(v, (bool, np.bool_)):
        return int(v)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, float) and v == int(v):
        return int(v)
    raise StanCompileError(
        f"{what} must be a compile-time integer (data-derived); got {v!r}. "
        "Loop bounds, sizes, and indices may not depend on parameters."
    )


def _is_static_int(v):
    return isinstance(v, (bool, np.bool_, int, np.integer)) or (
        isinstance(v, float) and v == int(v)
    )


class _FnReturn(Exception):
    """Control-flow carrier for `return` inside a user-defined function."""

    def __init__(self, value):
        self.value = value


class _LoopBreak(Exception):
    """Control-flow carrier for `break` (unrolled loops only: the
    condition guarding it must be data-derived, same rule as `if`)."""


class _LoopContinue(Exception):
    """Control-flow carrier for `continue` (unrolled loops only)."""


class _ScanLoweringError(Exception):
    """A loop body the scan path cannot express; fall back to unrolling."""


def _match_loopvar_offset(expr, varname):
    """Structurally match an index expression as loopvar + constant offset:
    `t` -> 0, `t - 2` -> -2, `t + 1`/`1 + t` -> +1. Returns the offset or
    None if the expression is not of that form."""
    if isinstance(expr, Var):
        return 0 if expr.name == varname else None
    if isinstance(expr, Bin) and expr.op in ("+", "-"):
        left, right = expr.left, expr.right
        if (
            isinstance(left, Var) and left.name == varname
            and isinstance(right, Num) and float(right.value).is_integer()
        ):
            k = int(right.value)
            return k if expr.op == "+" else -k
        if (
            expr.op == "+"
            and isinstance(right, Var) and right.name == varname
            and isinstance(left, Num) and float(left.value).is_integer()
        ):
            return int(left.value)
    return None


def _mentions_var(node, varname):
    """Does an AST node reference `varname` anywhere?"""
    if isinstance(node, Var):
        return node.name == varname
    if isinstance(node, (list, tuple)):
        return any(_mentions_var(x, varname) for x in node)
    if dataclasses.is_dataclass(node) and not isinstance(node, type):
        return any(
            _mentions_var(getattr(node, f.name), varname)
            for f in dataclasses.fields(node)
        )
    return False


class _StreamView:
    """In-body stand-in for a container lowered to the streaming-scan form:
    reads at loopvar-k come from the carried window, the write at loopvar
    becomes this step's scan output."""

    def __init__(self, name, window):
        self.name = name
        self.window = window  # dict lag (>=1) -> value entering this step
        self.current = None  # value written at index == loopvar this step

    def read(self, lag):
        if lag == 0:
            if self.current is None:
                raise _ScanLoweringError(
                    f"{self.name}[t] read before its write this iteration"
                )
            return self.current
        if lag not in self.window:
            raise _ScanLoweringError(
                f"{self.name}[t-{lag}] exceeds the analyzed window"
            )
        return self.window[lag]


def _walk_writes(stmts, assigned, declared):
    """Collect names assigned (carried state) and names declared (body
    locals) in a loop body; raise _ScanLoweringError on constructs the scan
    lowering cannot carry."""
    for st in stmts:
        if isinstance(st, list):
            _walk_writes(st, assigned, declared)
        elif isinstance(st, Decl):
            declared.add(st.name)
            if st.dims:
                raise _ScanLoweringError(
                    "container declared inside scanned loop body"
                )
        elif isinstance(st, Assign):
            lv = st.lvalue
            if isinstance(lv, Var):
                assigned.add(lv.name)
            elif isinstance(lv, Index) and isinstance(lv.base, Var):
                assigned.add(lv.base.name)
            else:
                raise _ScanLoweringError("unsupported assignment target")
        elif isinstance(st, For):
            declared.add(st.var)  # loop variable is body-local
            _walk_writes(st.body, assigned, declared)
        elif isinstance(st, If):
            _walk_writes(st.then, assigned, declared)
            _walk_writes(st.other, assigned, declared)
        elif isinstance(st, (While, Return, Break, Continue)):
            # `while` trip counts, `return` unwinding, and loop control
            # need concrete Python control flow — not expressible as a
            # scan body (the unrolled fallback handles them).
            raise _ScanLoweringError(
                "while/return/break/continue inside a scanned loop body"
            )
        # TargetPlus / Sampling accumulate into the target carry implicitly.


# ------------------------------------------------------------- interpreter


# Elementwise builtins that may stay "per element" over a rank-1 container
# in scalarize mode (see _Interp.scalarize) instead of stacking it.
_ELEMENTWISE_FNS = frozenset(
    ("sqrt", "exp", "log", "log1p", "log1m", "log10", "log2", "expm1",
     "square", "fabs", "abs", "inv", "inv_sqrt", "sin", "cos", "tan",
     "sinh", "cosh", "tanh", "cbrt", "logit", "inv_logit", "erf", "erfc",
     "log1p_exp", "log1m_exp", "log_inv_logit", "log1m_inv_logit")
)


class _Interp:
    def __init__(self, env, scan_threshold=None, rng_key=None,
                 scalarize=False):
        self.env = env  # name -> value
        self.target = jnp.asarray(0.0, dtype=float)
        # Loops with at least this many iterations are lowered to lax.scan
        # (None = always unroll; used for data/transformed-data evaluation,
        # which must stay concrete, and for Pallas tile bodies, where scalar
        # data reads must inline as literals).
        self.scan_threshold = scan_threshold
        # Pallas-tile-body mode: vectorized distribution calls and
        # elementwise builtins over rank-1 containers UNROLL per element
        # instead of stacking the container. A stacked T-element local under
        # the adapter's lane vmap becomes an (8, 128, T) tensor built from T
        # broadcasts + concatenates — measured 1400 such ops for the T=200
        # arma, the dominant Mosaic compile cost and exactly what the hand
        # kernels avoid by accumulating inside the loop. Scalarized, the
        # same statements fold into the unrolled chain as straight-line
        # scalar terms (identical values: addition reassociation only).
        self.scalarize = scalarize
        # Fixed RNG for *_rng calls (generated quantities); None elsewhere.
        self.rng_key = rng_key
        self._rng_count = 0

    # -- expressions --
    def ev(self, node):
        if isinstance(node, Num):
            return node.value
        if isinstance(node, Var):
            if node.name not in self.env:
                raise StanCompileError(f"undefined variable {node.name!r}")
            v = self.env[node.name]
            # Declared row_vectors are stored as plain 1-D values; the tag
            # attaches lazily at read time from the declared-type table
            # (row-flagged _LocalArrays carry their own flag).
            if (
                not isinstance(v, (RowVector, _LocalArray))
                and getattr(v, "ndim", None) == 1
                and self.env.get("__types__", _EMPTY).get(node.name)
                == "row_vector"
            ):
                return RowVector(v)
            return v
        if isinstance(node, Unary):
            v = self.ev(node.operand)
            if node.op == "-":
                row, val = _orient(v)
                return RowVector(-val) if row else -val
            if node.op == "+":
                return _as_value_oriented(v)
            if node.op == "!":
                return jnp.logical_not(_as_value(v)) if not isinstance(
                    v, (int, float, bool)
                ) else (not v)
            raise StanCompileError(f"unary {node.op!r} unsupported")
        if isinstance(node, Bin):
            return self._binop(node)
        if isinstance(node, Ternary):
            cond = self.ev(node.cond)
            if isinstance(cond, (bool, int, float, np.bool_, np.integer)):
                return self.ev(node.then) if cond else self.ev(node.other)
            return jnp.where(
                _as_value(cond),
                _as_value(self.ev(node.then)),
                _as_value(self.ev(node.other)),
            )
        if isinstance(node, Index):
            base = self.ev(node.base)
            idxs = []
            for i in node.indices:
                if isinstance(i, RangeIdx):
                    lo = 1 if i.lo is None else _require_int(
                        self.ev(i.lo), "range index"
                    )
                    hi = None if i.hi is None else _require_int(
                        self.ev(i.hi), "range index"
                    )
                    idxs.append(("range", lo, hi))
                else:
                    idxs.append(self.ev(i))
            out = self._index_read(base, idxs)
            return self._wrap_row_after_index(node.base, base, idxs, out)
        if isinstance(node, Call):
            return self._call(node)
        raise StanCompileError(f"cannot evaluate node {node!r}")

    def _wrap_row_after_index(self, base_node, base, idxs, out):
        """Stan typing for indexed reads: a 1-D result that keeps (only)
        the LAST axis of a matrix-family or row_vector-family base is a
        row_vector — m[i] / m[i, lo:hi] are rows, rv[lo:hi] stays a row,
        arr_of_rv[i] is a row; m[:, j] (column) and vector/array reads are
        column vectors. Applies only to declared variables (the type table);
        RowVector bases re-wrap inside _index_read."""
        if isinstance(out, RowVector) or getattr(out, "ndim", 0) != 1:
            return out
        if isinstance(base, RowVector) or not isinstance(base_node, Var):
            return out
        t = self.env.get("__types__", _EMPTY).get(base_node.name)
        if t not in _ROW_LAST_AXIS_TYPES:
            return out
        rank = (
            len(base.dims)
            if isinstance(base, _LocalArray)
            else np.ndim(base)
        )

        def keeps_axis(i):
            return (
                (isinstance(i, tuple) and i and i[0] == "range")
                or isinstance(i, (list, np.ndarray, jax.Array))
            )

        kept = [j for j in range(len(idxs)) if keeps_axis(idxs[j])]
        kept += list(range(len(idxs), rank))
        if len(kept) == 1 and kept[0] == rank - 1:
            return RowVector(out)
        return out

    def _index_read(self, base, idxs):
        def is_range(i):
            return isinstance(i, tuple) and i and i[0] == "range"

        if isinstance(base, RowVector):
            out = self._index_read(base.data, idxs)
            return (
                RowVector(out) if getattr(out, "ndim", 0) == 1 else out
            )
        if isinstance(base, _LocalArray):
            if not any(is_range(i) for i in idxs):
                return base.get([_require_int(i, "index") for i in idxs])
            if len(idxs) == 1 and len(base.dims) == 1:
                # Keep the slice a container (element list), so scalarize
                # mode and elementwise consumption stay stack-free.
                _, lo, hi = idxs[0]
                hi = base.dims[0] if hi is None else hi
                if not 1 <= lo <= hi <= base.dims[0]:
                    raise StanCompileError(
                        f"range [{lo}:{hi}] out of bounds for dimension "
                        f"{base.dims[0]}"
                    )
                out = _LocalArray([hi - lo + 1])
                out.data = list(base.data[lo - 1 : hi])
                out.row = getattr(base, "row", False)
                return out
            raise StanCompileError(
                "range indexing on multi-dimensional local containers is "
                "not supported"
            )
        if any(is_range(i) for i in idxs):
            sel = []
            shape = np.shape(base)
            for axis, i in enumerate(idxs):
                size = shape[axis] if axis < len(shape) else None
                if is_range(i):
                    _, lo, hi = i
                    hi = size if hi is None else hi
                    # Stan bounds-checks; a silent Python negative-index
                    # wrap (lo=0 -> slice(-1,..) = empty) or clamp would
                    # corrupt the density.
                    if size is not None and not 1 <= lo <= hi <= size:
                        raise StanCompileError(
                            f"range [{lo}:{hi}] out of bounds for "
                            f"dimension of size {size}"
                        )
                    sel.append(slice(lo - 1, hi))
                else:
                    sel.append(_require_int(i, "index") - 1)
            return base[tuple(sel)]
        # numpy / jnp container: concrete 1-based indices; a data int ARRAY
        # index gathers (Stan multi-indexing, e.g. y[idx] or a[county]) —
        # indices are data so bounds are checked eagerly. A gather KEEPS its
        # axis, so `ax` tracks where the next index applies.
        out = base
        ax = 0
        for i in idxs:
            if isinstance(i, RowVector):
                # a concrete [..] literal used as an index position
                i = i.data
            if isinstance(i, (list, np.ndarray)):
                iv = np.asarray(i)
            elif isinstance(i, jax.Array) and not isinstance(
                i, jax.core.Tracer
            ):
                # concrete jnp-computed indices (e.g. sort_indices_asc on
                # transformed data) gather like data arrays
                iv = np.asarray(i)
            else:
                iv = i
            if isinstance(iv, np.ndarray) and iv.ndim == 1 and iv.size and (
                np.issubdtype(iv.dtype, np.integer)
                or np.all(iv == iv.astype(np.int64))
            ):
                iv = iv.astype(np.int64)
                size = np.shape(out)[ax]
                if not (1 <= iv.min() and iv.max() <= size):
                    raise StanCompileError(
                        f"multi-index out of bounds: values span "
                        f"[{iv.min()}, {iv.max()}] for dimension of size "
                        f"{size}"
                    )
                if self.scalarize and ax == 0 and len(idxs) == 1 and (
                    getattr(out, "ndim", 0) == 1
                ):
                    # Pallas tile bodies: the gather UNROLLS into
                    # constant-index selections — jnp.take's index array
                    # would become a captured i32 constant, which
                    # pallas_call rejects, and the gather primitive
                    # batches into a form Mosaic cannot lower.
                    la = _LocalArray([int(iv.size)])
                    la.data = [out[int(i) - 1] for i in iv]
                    return la
                out = jnp.take(jnp.asarray(out), jnp.asarray(iv - 1),
                               axis=ax)
                ax += 1
            else:
                out = jnp.take(
                    jnp.asarray(out), _require_int(i, "index") - 1, axis=ax
                ) if ax else out[_require_int(i, "index") - 1]
        return out

    _SCALARIZABLE_BINOPS = {
        "+": lambda a, b: a + b,
        "-": lambda a, b: a - b,
        ".*": lambda a, b: a * b,
        "./": lambda a, b: a / b,
    }

    def _binop_scalarized(self, op, lv, rv):
        """Tile-body elementwise binop over containers kept PER ELEMENT
        (None when not applicable): a _LocalArray operand must not stack —
        the stacked (8, 128, T) tensor is the Mosaic compile killer the
        scalarize mode exists to avoid, and `jnp.stack`'s concatenate
        batches poorly under the lane vmap."""
        if not (
            isinstance(lv, _LocalArray) or isinstance(rv, _LocalArray)
        ):
            return None
        f = self._SCALARIZABLE_BINOPS.get(op)
        if f is None and op in ("*", "/"):
            # linear-algebra `*` / `/` are elementwise only against a
            # scalar operand
            if self._seq_len1(lv) == 0 or self._seq_len1(rv) == 0:
                f = (
                    (lambda a, b: a * b) if op == "*"
                    else (lambda a, b: a / b)
                )
            else:
                return None
        if f is None:
            return None
        ln, rn = self._seq_len1(lv), self._seq_len1(rv)
        if ln is None or rn is None:
            return None
        n = max(ln, rn)
        if n == 0 or (ln and rn and ln != rn):
            return None
        out = _LocalArray([n])
        out.data = [
            f(
                _as_value(self._elem(lv, i)) if ln else _as_value(lv),
                _as_value(self._elem(rv, i)) if rn else _as_value(rv),
            )
            for i in range(n)
        ]
        return out

    def _binop(self, node: Bin):
        op = node.op
        lv = self.ev(node.left)
        rv = self.ev(node.right)
        if self.scalarize:
            out = self._binop_scalarized(op, lv, rv)
            if out is not None:
                return out
        both_int = isinstance(lv, (int, np.integer)) and isinstance(
            rv, (int, np.integer)
        )
        lrow, l = _orient(lv)
        rrow, r = _orient(rv)
        lnd = getattr(l, "ndim", 0)
        rnd = getattr(r, "ndim", 0)

        def ew(val):
            """Elementwise result orientation: row op {row, scalar} stays a
            row_vector; a row mixed with a column vector or matrix is a Stan
            type error (caught loudly rather than silently broadcast)."""
            if not (lrow or rrow):
                return val
            if (lrow and (rrow or rnd == 0)) or (rrow and lnd == 0):
                return RowVector(val)
            raise StanCompileError(
                f"operator {op!r}: row_vector mixed with a "
                "vector/matrix operand (Stan type mismatch); transpose "
                "one side"
            )

        if op == "+":
            return ew(l + r)
        if op == "-":
            return ew(l - r)
        if op == "*":
            # Stan `*` is LINEAR-ALGEBRA multiplication. With row
            # orientation tracked: row_vector * vector is the inner
            # product, vector * row_vector the outer product,
            # row_vector * matrix a row_vector; bare vector * vector
            # remains REJECTED (ambiguous without a declared orientation —
            # the common X[n] * beta mistake), as is row * row.
            if lrow or rrow:
                if lrow and not rrow and rnd == 1:
                    return jnp.asarray(l, dtype=float) @ jnp.asarray(
                        r, dtype=float
                    )  # (1 x N)(N x 1) -> scalar
                if not lrow and lnd == 1 and rrow:
                    return jnp.outer(
                        jnp.asarray(l, dtype=float),
                        jnp.asarray(r, dtype=float),
                    )
                if lrow and rnd == 2:
                    return RowVector(jnp.asarray(l, dtype=float) @ r)
                if lrow and rnd == 0:
                    return RowVector(l * r)
                if lnd == 0 and rrow:
                    return RowVector(l * r)
                raise StanCompileError(
                    "illegal `*` operand orientations (row_vector * "
                    "row_vector, or matrix * row_vector)"
                )
            if lnd >= 1 and rnd >= 1 and (lnd == 2 or rnd == 2):
                return l @ r
            if lnd == 1 and rnd == 1:
                raise StanCompileError(
                    "vector * vector is ambiguous (neither side is a "
                    "declared row_vector): use dot_product(a, b) for the "
                    "inner product, a' * b for an explicit row*column, or "
                    "a .* b for elementwise"
                )
            return l * r
        if op == ".*":
            return ew(l * r)
        if op == "./":
            if both_int:
                return int(l / r)
            return ew(l / r)
        if op == "/":
            if both_int:
                return int(l / r)  # Stan int division truncates toward zero
            if lrow and rnd == 0:
                return RowVector(l / r)
            return l / r
        if op == "%":
            return l % r
        if op == "^":
            return _as_value(l) ** r if not both_int else l**r
        if op == "==":
            return l == r
        if op == "!=":
            return l != r
        if op == "<":
            return l < r
        if op == "<=":
            return l <= r
        if op == ">":
            return l > r
        if op == ">=":
            return l >= r
        if op == "&&":
            return jnp.logical_and(l, r) if not both_int else (
                bool(l) and bool(r)
            )
        if op == "||":
            return jnp.logical_or(l, r) if not both_int else (
                bool(l) or bool(r)
            )
        raise StanCompileError(f"operator {op!r} unsupported")

    # ---- scalarize-mode helpers (Pallas tile bodies; see __init__) ----

    @staticmethod
    def _seq_len1(v):
        """Length of a rank-1 value, 0 for scalars, None if not
        scalarizable (rank >= 2 or partially-initialized reads raise)."""
        if isinstance(v, tuple):
            return None
        if isinstance(v, RowVector):
            v = v.data
        if isinstance(v, _LocalArray):
            return v.dims[0] if len(v.dims) == 1 else None
        nd = getattr(v, "ndim", None)
        if nd is None:
            return 0
        if nd == 0:
            return 0
        if nd == 1:
            return int(np.shape(v)[0])
        return None

    @staticmethod
    def _elem(v, i):
        if isinstance(v, RowVector):
            v = v.data
        if isinstance(v, _LocalArray):
            return v.get([i + 1])
        if isinstance(v, np.ndarray):
            return float(v[i])  # folds into ops as an immediate
        if getattr(v, "ndim", 0) == 1:
            return v[i]
        return v

    def _dist_scalarized(self, dist, raw):
        """Vectorized lpdf/lpmf over rank-1 args -> Python-summed scalar
        terms (None when the args are not uniformly scalarizable).

        `normal` with scalar scale gets a sufficient-statistic form
        (accumulate squared residuals; pay log sigma and the constant
        once), since it is THE recurrence-consumer idiom (arma/GARCH) and
        the naive per-element lpdf would re-emit log/div per step."""
        if dist not in ELEMENTWISE_DENSITIES:
            return None
        lens = [self._seq_len1(v) for v in raw]
        if any(l is None for l in lens):
            return None
        vec = [l for l in lens if l > 0]
        if not vec:
            return None
        n = vec[0]
        if any(l != n for l in vec):
            return None
        if (
            dist == "normal"
            and len(raw) == 3
            and lens[0] == n
            and lens[2] == 0
        ):
            sigma = _as_value(raw[2])
            ss = None
            for i in range(n):
                d = _as_value(self._elem(raw[0], i)) - _as_value(
                    self._elem(raw[1], i)
                )
                ss = d * d if ss is None else ss + d * d
            return (
                -0.5 * ss / (sigma * sigma)
                - n * (jnp.log(sigma) + LOG_SQRT_2PI)
            )
        density = ELEMENTWISE_DENSITIES[dist]
        total = None
        for i in range(n):
            term = density(*[_as_value(self._elem(v, i)) for v in raw])
            total = term if total is None else total + term
        return total

    def _truncated_scalarized(self, dist, raw, lo, hi):
        """Per-element truncated sampling terms for scalarize (tile) mode:
        each element gets its own scalar truncated_lp call, summed in
        Python — no container broadcast/stack inside the kernel body.
        Returns None when args are not uniformly scalarizable (the
        broadcast truncated_lp path then handles it)."""
        vals = list(raw) + [v for v in (lo, hi) if v is not None]
        lens = [self._seq_len1(v) for v in vals]
        if any(l is None for l in lens):
            return None
        vec = [l for l in lens if l > 0]
        if not vec:
            return None
        n = vec[0]
        if any(l != n for l in vec):
            return None

        def elem(v, ln, i):
            return _as_value(self._elem(v, i)) if ln else _as_value(v)

        # Shared normalizer: when bounds and parameters are all scalar the
        # log(F(hi) - F(lo)) term is identical across elements — hoist it
        # (one evaluation per statement; with concrete values it folds to
        # a literal before the Pallas trace, see truncation_lognorm).
        shared_lnorm = None
        if all(l == 0 for l in lens[1:]):
            shared_lnorm = truncation_lognorm(
                dist, [_as_value(v) for v in raw[1:]],
                None if lo is None else _as_value(lo),
                None if hi is None else _as_value(hi),
            )

        nraw = len(raw)
        total = None
        for i in range(n):
            args_i = [elem(v, lens[j], i) for j, v in enumerate(raw)]
            k = nraw
            lo_i = hi_i = None
            if lo is not None:
                lo_i = elem(lo, lens[k], i)
                k += 1
            if hi is not None:
                hi_i = elem(hi, lens[k], i)
            term = truncated_lp(dist, args_i, lo_i, hi_i,
                                lnorm=shared_lnorm)
            total = term if total is None else total + term
        return total

    def _elementwise_scalarized(self, name, v):
        n = self._seq_len1(v)
        if not n:
            return None
        out = _LocalArray([n])
        for i in range(n):
            out.set([i + 1], FUNCTIONS[name](_as_value(self._elem(v, i))))
        return out

    _ODE_SOLVERS = frozenset({
        "ode_rk45", "ode_rk45_tol", "ode_bdf", "ode_bdf_tol",
        "ode_adams", "ode_adams_tol", "ode_ckrk", "ode_ckrk_tol",
        "integrate_ode_rk45", "integrate_ode_bdf", "integrate_ode_adams",
        "integrate_ode", "ode_rk4",
    })

    def _ode_solve(self, node: Call):
        """Stan's ODE interfaces -> jax.experimental.ode.odeint (dopri5
        with adjoint gradients; all variants share it — solver choice is a
        tolerance/stiffness hint, and dopri5's continuous adjoint handles
        the non-stiff models these interfaces see in practice).

        New interface: ode_X(f, y0, t0, ts, ...args), f(t, y, ...args);
        _tol adds (rel_tol, abs_tol, max_num_steps) before ...args.
        Old interface: integrate_ode_X(f, y0, t0, ts, theta, x_r, x_i
        [, rel_tol, abs_tol, max_steps]), f(t, y, theta, x_r, x_i).
        Returns the (len(ts), D) solution array (row i = state at ts[i]).
        """
        from jax.experimental.ode import odeint

        name = node.name
        fns = self.env.get("__functions__") or {}
        if (
            not node.args
            or not isinstance(node.args[0], Var)
            or node.args[0].name not in fns
        ):
            raise StanCompileError(
                f"{name} requires a user-defined ODE right-hand-side "
                "function name as its first argument"
            )
        fd = fns[node.args[0].name]
        rest = [self.ev(a) for a in node.args[1:]]
        if len(rest) < 3:
            raise StanCompileError(
                f"{name}(f, y0, t0, ts, ...) takes at least 4 arguments"
            )
        y0 = jnp.asarray(_as_value(rest[0]), dtype=float)
        t0 = _as_value(rest[1])
        ts = jnp.asarray(_as_value(rest[2]), dtype=float)
        rtol = atol = 1e-6  # Stan's rk45 defaults
        mxstep = 1_000_000
        if name.endswith("_tol"):
            if len(rest) < 6:
                raise StanCompileError(
                    f"{name} needs rel_tol, abs_tol, max_num_steps after ts"
                )
            rtol = float(_as_value(rest[3]))
            atol = float(_as_value(rest[4]))
            mxstep = int(_as_value(rest[5]))
            extra = rest[6:]
        elif name.startswith("integrate_ode") and len(rest) >= 8:
            extra = rest[3:6]
            rtol = float(_as_value(rest[6]))
            atol = float(_as_value(rest[7]))
            if len(rest) >= 9:
                mxstep = int(_as_value(rest[8]))
        elif name == "ode_rk4":
            if len(rest) < 4:
                raise StanCompileError(
                    "ode_rk4(f, y0, t0, ts, steps_per_interval, ...) "
                    "takes at least 5 arguments"
                )
            mxstep = _require_int(
                _as_value(rest[3]), "ode_rk4 steps_per_interval"
            )
            extra = rest[4:]
        else:
            extra = rest[3:]
        extra_vals = [_as_value(v) for v in extra]

        def rhs(y, t):
            # Stan RHS signature is f(t, y, ...). The RHS must be pure
            # (Stan forbids _lp functions here); restoring `target` both
            # enforces that and keeps odeint's inner trace from leaking a
            # tracer into the caller's target accumulator.
            saved_target = self.target
            try:
                out = self._call_user_fn(fd, [t, y] + list(extra_vals))
            finally:
                self.target = saved_target
            return jnp.asarray(_as_value(out), dtype=float).reshape(
                jnp.shape(y)
            )

        times = jnp.concatenate(
            [jnp.reshape(jnp.asarray(t0, dtype=float), (1,)), ts]
        )
        if name == "ode_rk4":
            # TPU-first EXTENSION (not in Stan): fixed-step classical RK4,
            # `mxstep` steps per output interval. Lowers to a plain
            # lax.scan — no data-dependent while loops, so it compiles in
            # seconds inside the vmapped NUTS tree and runs in lockstep
            # across particles, where the adaptive solvers' nested while
            # loops cost minutes of XLA compile and worst-case-particle
            # stepping. Accuracy is O(h^4); pick steps_per_interval for
            # the dynamics' stiffness.
            def interval(y, t_pair):
                ta, tb = t_pair
                h = (tb - ta) / mxstep

                def rk4_step(carry, i):
                    yy, tt = carry
                    k1 = rhs(yy, tt)
                    k2 = rhs(yy + 0.5 * h * k1, tt + 0.5 * h)
                    k3 = rhs(yy + 0.5 * h * k2, tt + 0.5 * h)
                    k4 = rhs(yy + h * k3, tt + h)
                    return (
                        yy + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4),
                        tt + h,
                    ), None

                (y_new, _), _ = jax.lax.scan(
                    rk4_step, (y, ta), None, length=mxstep
                )
                return y_new, y_new

            _, sol = jax.lax.scan(
                interval, y0, (times[:-1], times[1:])
            )
            return sol
        sol = odeint(rhs, y0, times, rtol=rtol, atol=atol, mxstep=mxstep)
        return sol[1:]

    # 30-point Gauss-Legendre nodes/weights on [-1, 1] (numpy.leggauss,
    # computed once at import) for integrate_1d: a FIXED quadrature —
    # no adaptive control flow, so it jits/vmaps and sits fine inside
    # NUTS trees; accuracy is spectral for the smooth integrands the
    # interface sees in practice (Stan's rel_tol arg is accepted and
    # ignored, like the ODE tolerance hints).
    _GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(30)

    def _integrate_1d(self, node: Call):
        """Stan integrate_1d(f, a, b, theta, x_r, x_i[, rel_tol]):
        integrand f(x, xc, theta, x_r, x_i) -> real. Finite bounds may be
        parameters — gradients flow through the quadrature (incl. the
        Leibniz boundary terms, which the fixed-node map picks up exactly
        because the nodes are affine in a and b). Infinite bounds use the
        same variable changes as Stan math's integrate_1d
        (stan/math/prim/functor/integrate_1d.hpp):
          (a, +inf):    x = a + t/(1-t),    dx = dt/(1-t)^2,  t in (0, 1)
          (-inf, b):    x = b - t/(1-t),    dx = dt/(1-t)^2,  t in (0, 1)
          (-inf, +inf): x = t/(1-t^2),      dx = (1+t^2)/(1-t^2)^2 dt,
                        t in (-1, 1)
        mapped onto the fixed Gauss-Legendre rule (nodes are interior, so
        the singular endpoints are never evaluated). Infinity must be
        visible at compile time (literals / negative_infinity() / data
        values — which is how it appears in Stan programs); `xc` is
        undefined for infinite bounds per the Stan manual and is passed
        as 0."""
        fns = self.env.get("__functions__") or {}
        if (
            not node.args
            or not isinstance(node.args[0], Var)
            or node.args[0].name not in fns
        ):
            raise StanCompileError(
                "integrate_1d requires a user-defined integrand function "
                "name as its first argument"
            )
        if len(node.args) < 6:
            raise StanCompileError(
                "integrate_1d(f, a, b, theta, x_r, x_i[, rel_tol]) takes "
                "at least 6 arguments"
            )
        fd = fns[node.args[0].name]
        a = _as_value(self.ev(node.args[1]))
        b = _as_value(self.ev(node.args[2]))
        theta = _as_value(self.ev(node.args[3]))
        x_r = _as_value(self.ev(node.args[4]))
        x_i = self.ev(node.args[5])
        def _static_inf(v):
            if isinstance(v, jax.core.Tracer):
                return 0  # traced: assumed finite
            try:
                arr = float(v)
            except (TypeError, ValueError):
                return 0
            if np.isposinf(arr):
                return 1
            if np.isneginf(arr):
                return -1
            return 0

        a_inf, b_inf = _static_inf(a), _static_inf(b)
        if a_inf > 0 or b_inf < 0:
            raise StanCompileError(
                "integrate_1d: bounds must satisfy a < b "
                "(got a = +inf or b = -inf)"
            )
        total = None
        for xi, wi in zip(self._GL_NODES, self._GL_WEIGHTS):
            if a_inf == 0 and b_inf == 0:
                # finite: affine map of [-1, 1] onto [a, b]
                half = (jnp.asarray(b, dtype=float) - a) * 0.5
                x = (jnp.asarray(b, dtype=float) + a) * 0.5 + half * float(xi)
                # xc (the distance-to-nearest-endpoint helper for removable
                # singularities) is passed as in Stan
                xc = jnp.minimum(x - a, jnp.asarray(b, dtype=float) - x)
                jac = half * float(wi)
            elif a_inf == 0:  # (a, +inf): x = a + t/(1-t), t in (0, 1)
                t = 0.5 + 0.5 * float(xi)
                x = jnp.asarray(a, dtype=float) + t / (1.0 - t)
                xc = jnp.zeros_like(x)
                jac = 0.5 * float(wi) / (1.0 - t) ** 2
            elif b_inf == 0:  # (-inf, b): x = b - t/(1-t), t in (0, 1)
                t = 0.5 + 0.5 * float(xi)
                x = jnp.asarray(b, dtype=float) - t / (1.0 - t)
                xc = jnp.zeros_like(x)
                jac = 0.5 * float(wi) / (1.0 - t) ** 2
            else:  # (-inf, +inf): x = t/(1-t^2), t in (-1, 1)
                t = float(xi)
                x = jnp.asarray(t / (1.0 - t * t), dtype=float)
                xc = jnp.zeros_like(x)
                jac = float(wi) * (1.0 + t * t) / (1.0 - t * t) ** 2
            val = self._call_user_fn(fd, [x, xc, theta, x_r, x_i])
            term = jac * _as_value(val)
            total = term if total is None else total + term
        return total

    _ALGEBRA_SOLVERS = frozenset({
        "algebra_solver", "algebra_solver_newton", "solve_newton",
        "solve_powell",
    })

    def _algebra_solve(self, node: Call):
        """Stan's nonlinear-system interfaces -> damped Newton with a
        FIXED iteration count (jit/vmap-friendly; no data-dependent
        control flow inside NUTS trees). All variants share it — the
        Powell/Newton choice is a robustness hint. Signatures:
          algebra_solver(f, y_guess, theta, x_r, x_i[, rtol, ftol, max])
            with f(y, theta, x_r, x_i)
          solve_newton/solve_powell(f, y_guess, ...args) with f(y, ...args)
        Gradients flow by differentiating the unrolled iteration, which at
        convergence equals the implicit-function-theorem derivative."""
        fns = self.env.get("__functions__") or {}
        if (
            not node.args
            or not isinstance(node.args[0], Var)
            or node.args[0].name not in fns
        ):
            raise StanCompileError(
                f"{node.name} requires a user-defined system function "
                "name as its first argument"
            )
        fd = fns[node.args[0].name]
        y0 = jnp.atleast_1d(
            jnp.asarray(_as_value(self.ev(node.args[1])), dtype=float)
        )
        if node.name == "algebra_solver" or node.name == (
            "algebra_solver_newton"
        ):
            if len(node.args) < 5:
                raise StanCompileError(
                    f"{node.name}(f, y_guess, theta, x_r, x_i) takes at "
                    "least 5 arguments"
                )
            extra = [
                _as_value(self.ev(a)) for a in node.args[2:5]
            ]
        else:
            extra = [_as_value(self.ev(a)) for a in node.args[2:]]

        def system(y):
            out = self._call_user_fn(fd, [y] + list(extra))
            return jnp.atleast_1d(jnp.asarray(_as_value(out), dtype=float))

        y = y0
        for _ in range(16):
            fy = system(y)
            jac = jax.jacfwd(system)(y)
            step = jnp.linalg.solve(
                jac + 1e-10 * jnp.eye(y.shape[0]), fy
            )
            y = y - step
        return y

    def _call(self, node: Call):
        name = node.name
        if name in self._ODE_SOLVERS:
            return self._ode_solve(node)
        if name == "integrate_1d":
            return self._integrate_1d(node)
        if name in self._ALGEBRA_SOLVERS:
            return self._algebra_solve(node)
        if name == "map_rect":
            # Stan's multi-process map: f(phi, theta_j, x_r_j, x_i_j) per
            # job, outputs concatenated. Parallelism here comes from the
            # particle vmap, so jobs run serially in the trace — XLA fuses
            # them, and the value matches any scheduling by construction.
            fns = self.env.get("__functions__") or {}
            if (
                not node.args
                or not isinstance(node.args[0], Var)
                or node.args[0].name not in fns
            ):
                raise StanCompileError(
                    "map_rect requires a user-defined job function name as "
                    "its first argument"
                )
            if len(node.args) != 5:
                raise StanCompileError(
                    "map_rect(f, phi, theta, x_r, x_i) takes 5 arguments"
                )
            fd = fns[node.args[0].name]
            phi_v = _as_value(self.ev(node.args[1]))
            theta = _as_value(self.ev(node.args[2]))
            x_r = np.asarray(_as_value(self.ev(node.args[3])), dtype=float)
            x_i = np.asarray(_as_value(self.ev(node.args[4])))
            n_jobs = int(np.shape(theta)[0])
            outs = []
            for j in range(n_jobs):
                out = self._call_user_fn(
                    fd, [phi_v, theta[j], x_r[j], x_i[j]]
                )
                outs.append(
                    jnp.atleast_1d(
                        jnp.asarray(_as_value(out), dtype=float)
                    )
                )
            return jnp.concatenate(outs)
        if name in ("reduce_sum", "reduce_sum_static"):
            # Stan's within-chain parallel map-reduce. Parallelism here
            # comes from vmap over particles, so the partial-sum function
            # is simply applied to the WHOLE slice (start=1, end=N) — the
            # exact value reduce_sum contracts to produce regardless of
            # grainsize (which is only a scheduling hint and is ignored).
            fns = self.env.get("__functions__") or {}
            if (
                not node.args
                or not isinstance(node.args[0], Var)
                or node.args[0].name not in fns
            ):
                raise StanCompileError(
                    "reduce_sum requires a user-defined partial-sum "
                    "function name as its first argument"
                )
            if len(node.args) < 3:
                raise StanCompileError(
                    "reduce_sum(f, y, grainsize, ...) takes at least 3 "
                    "arguments"
                )
            fd = fns[node.args[0].name]
            y = _as_value(self.ev(node.args[1]))
            extra = [_as_value(self.ev(a)) for a in node.args[3:]]
            n = int(np.shape(y)[0]) if np.shape(y) else 1
            return self._call_user_fn(fd, [y, 1, n] + extra)
        raw = [self.ev(a) for a in node.args]
        if name == "__stack__":  # {a, b, c} array literals
            vals = [_as_value(v) for v in raw]
            if not vals:
                return np.zeros((0,))
            if all(isinstance(v, (int, np.integer)) for v in vals):
                # keep static ints static: {1, 3} stays a data index array
                return np.asarray(vals, dtype=np.int64)
            return jnp.stack(
                [jnp.asarray(v, dtype=float) for v in vals]
            )
        if name == "__tuple__":
            # (a, b, ...) tuple expression: a Python tuple of values
            # (orientation tags preserved per member)
            return tuple(_as_value_oriented(v) for v in raw)
        if name == "__tuple_get__":
            base = raw[0]
            k = _require_int(_as_value(raw[1]), "tuple index")
            if not isinstance(base, tuple):
                raise StanCompileError(
                    f".{k} access on a non-tuple value"
                )
            if not 1 <= k <= len(base):
                raise StanCompileError(
                    f"tuple index .{k} out of range for a "
                    f"{len(base)}-element tuple"
                )
            return base[k - 1]
        if name == "__rowvec__":
            # [a, b, c] matrix-expression literal: scalars -> row_vector;
            # row_vector elements -> matrix (rows). [..]' is then the
            # column-vector idiom via the transpose builtin.
            if raw and all(is_row(v) for v in raw):
                return jnp.vstack(
                    [jnp.atleast_2d(_as_value(v)) for v in raw]
                )
            vals = [_as_value(v) for v in raw]
            if not vals:
                return RowVector(np.zeros((0,)))
            if all(isinstance(v, (int, np.integer)) for v in vals):
                # keep static ints CONCRETE (np payload) so [1, 2]' stays
                # a usable data vector; the row tag still makes [..]' the
                # column-vector idiom, and index positions unwrap the tag
                return RowVector(np.asarray(vals, dtype=np.int64))
            return RowVector(jnp.stack(
                [jnp.asarray(v, dtype=float) for v in vals]
            ))
        # _as_value STACKS _LocalArray containers — evaluated lazily so the
        # scalarized paths (which read containers element-by-element) never
        # trace a dead whole-container stack into the jaxpr (pallas lowers
        # the traced ops whether or not they reach the outputs).
        args = lambda: [_as_value(v) for v in raw]
        fns = self.env.get("__functions__")
        if fns is not None and name in fns:
            # keep orientation tags across the call boundary (declared
            # row_vector params also re-tag via the fenv type table)
            return self._call_user_fn(
                fns[name], [_as_value_oriented(v) for v in raw]
            )
        if name.endswith("_rng"):
            dist = name[: -len("_rng")]
            if self.rng_key is None:
                raise StanCompileError(
                    f"{name} called outside generated quantities (RNG is "
                    "only available there, as in Stan)"
                )
            if dist not in RNG_FUNCTIONS:
                raise StanCompileError(f"unsupported RNG function {name!r}")
            # Deterministic per-call-site stream off the fixed key — the
            # reference's fixed-seed constrain RNG (bridgestan.py:106).
            key = jax.random.fold_in(self.rng_key, self._rng_count)
            self._rng_count += 1
            return RNG_FUNCTIONS[dist](key, *args())
        for suffix in ("_lpdf", "_lpmf", "_lupdf", "_lupmf"):
            if name.endswith(suffix):
                dist = name[: -len(suffix)]
                if dist not in DISTRIBUTIONS:
                    raise StanCompileError(
                        f"unsupported distribution {dist!r}"
                    )
                if self.scalarize:
                    out = self._dist_scalarized(dist, raw)
                    if out is not None:
                        return out
                return DISTRIBUTIONS[dist](*args())
        for suffix, table in (("_lcdf", LCDFS), ("_lccdf", LCCDFS)):
            if name.endswith(suffix):
                dist = name[: -len(suffix)]
                if dist not in table:
                    raise StanCompileError(
                        f"no CDF implemented for distribution {dist!r} "
                        f"(supported: {', '.join(sorted(table))})"
                    )
                return table[dist](*args())
        if name.endswith("_cdf"):
            dist = name[: -len("_cdf")]
            if dist not in LCDFS:
                raise StanCompileError(
                    f"no CDF implemented for distribution {dist!r} "
                    f"(supported: {', '.join(sorted(LCDFS))})"
                )
            # Stan's vectorized _cdf is the PRODUCT over elements = exp of
            # the summed log-CDF.
            return jnp.exp(LCDFS[dist](*args()))
        if name in FUNCTIONS:
            if (
                self.scalarize
                and name in _ELEMENTWISE_FNS
                and len(raw) == 1
            ):
                out = self._elementwise_scalarized(name, raw[0])
                if out is not None:
                    return out
            if name in _ORIENT_FNS:
                # orientation-aware builtins see the RowVector tags
                return FUNCTIONS[name](
                    *[_as_value_oriented(v) for v in raw]
                )
            return FUNCTIONS[name](*args())
        if name in ("num_elements", "size", "rows", "cols", "dims"):
            arr = raw[0]
            if isinstance(arr, RowVector):
                # Stan: rows(row_vector) = 1, cols = length
                if name == "rows":
                    return 1
                shape = np.shape(arr.data)
                if name == "cols":
                    return int(shape[0])
                arr = arr.data
            shape = (
                arr.dims
                if isinstance(arr, _LocalArray)
                else np.shape(arr)
            )
            if name == "rows":
                return int(shape[0])
            if name == "cols":
                return int(shape[1])
            if name == "dims":
                return list(shape)
            return int(np.prod(shape)) if shape else 1
        raise StanCompileError(f"unsupported function {name!r}")

    def _call_user_fn(self, fd: FuncDef, args):
        """Inline a user-defined `functions`-block function: bind the
        arguments in a fresh env (Stan functions see only their parameters),
        trace the body, and unwind at `return`. `target +=` inside the body
        accumulates into the caller's target (Stan's _lp-function semantics;
        harmless for pure functions, which never touch target). Deeply
        recursive calls are rejected — recursion depth would have to be
        data-static anyway for the trace to terminate."""
        if len(args) != len(fd.params):
            raise StanCompileError(
                f"{fd.name}() takes {len(fd.params)} arguments, got "
                f"{len(args)}"
            )
        depth = self.env.get("__fdepth__", 0)
        if depth > 32:
            raise StanCompileError(
                f"function call depth exceeded in {fd.name!r} (unbounded "
                "recursion?)"
            )
        fenv = {
            "__functions__": self.env.get("__functions__"),
            "__fdepth__": depth + 1,
            # parameter orientation: declared row_vector params re-tag
            # their (possibly untagged) argument values at read time
            "__types__": {p[1]: p[0] for p in fd.params},
        }
        fenv.update(zip((p[1] for p in fd.params), args))
        sub = _Interp(fenv, scan_threshold=self.scan_threshold,
                      scalarize=self.scalarize)
        if self.rng_key is not None:
            sub.rng_key = jax.random.fold_in(self.rng_key, self._rng_count)
            self._rng_count += 1
        ret = None
        try:
            sub.run(fd.body)
        except _FnReturn as r:
            ret = r.value
        self.target = self.target + sub.target
        if ret is None and fd.ret_type != "void":
            raise StanCompileError(
                f"non-void function {fd.name!r} finished without `return` "
                "(returns inside traced control flow are not reachable; "
                "hoist them with the ternary operator)"
            )
        return ret

    # -- statements --
    def run(self, stmts):
        for s in stmts:
            self.run_stmt(s)

    def run_stmt(self, s):
        if isinstance(s, list):
            self.run(s)
        elif isinstance(s, Decl):
            self._declare(s)
        elif isinstance(s, Assign):
            self._assign(s)
        elif isinstance(s, TargetPlus):
            inc = _as_value(self.ev(s.expr))
            inc = jnp.asarray(inc, dtype=float)
            self.target = self.target + (
                jnp.sum(inc) if inc.ndim else inc
            )
        elif isinstance(s, Sampling):
            dist = s.dist
            if dist not in DISTRIBUTIONS:
                raise StanCompileError(
                    f"line {s.line}: unsupported distribution {dist!r}"
                )
            raw = [self.ev(s.lhs)] + [self.ev(a) for a in s.args]
            if s.t_lower is not None or s.t_upper is not None:
                lo = (
                    _as_value(self.ev(s.t_lower))
                    if s.t_lower is not None else None
                )
                hi = (
                    _as_value(self.ev(s.t_upper))
                    if s.t_upper is not None else None
                )
                try:
                    inc = None
                    if self.scalarize:
                        # tile bodies: per-element scalar truncation terms
                        # (the broadcast-and-stack form below lowers poorly
                        # in Pallas kernels)
                        inc = self._truncated_scalarized(dist, raw, lo, hi)
                    if inc is None:
                        inc = truncated_lp(
                            dist, [_as_value(v) for v in raw], lo, hi
                        )
                except ValueError as e:
                    raise StanCompileError(f"line {s.line}: {e}") from None
                self.target = self.target + inc
                return
            inc = None
            if self.scalarize:
                inc = self._dist_scalarized(dist, raw)
            if inc is None:
                inc = DISTRIBUTIONS[dist](*[_as_value(v) for v in raw])
            self.target = self.target + inc
        elif isinstance(s, For):
            lo = _require_int(self.ev(s.lo), f"line {s.line}: loop bound")
            hi = _require_int(self.ev(s.hi), f"line {s.line}: loop bound")
            if (
                self.scan_threshold is not None
                and hi - lo + 1 >= self.scan_threshold
            ):
                try:
                    self._run_for_scanned(s, lo, hi)
                    return
                except Exception:
                    # Lowering is best-effort; the unrolled path below is
                    # always correct (and re-raises genuine program errors
                    # with their real message).
                    pass
            shadowed = self.env.get(s.var)
            for i in range(lo, hi + 1):
                self.env[s.var] = i
                try:
                    self.run(s.body)
                except _LoopContinue:
                    continue
                except _LoopBreak:
                    break
            if shadowed is not None:
                self.env[s.var] = shadowed
            else:
                self.env.pop(s.var, None)
        elif isinstance(s, While):
            # Bounded unroll with concrete conditions: each trip re-evaluates
            # the condition against the (possibly updated) env. A condition
            # that becomes traced (depends on parameters) cannot steer a
            # Python loop — same rule as `if`.
            trips = 0
            while True:
                cond = self.ev(s.cond)
                if not isinstance(
                    cond, (bool, int, float, np.bool_, np.integer)
                ):
                    raise StanCompileError(
                        f"line {s.line}: `while` conditions must be "
                        "data-derived (parameter-dependent loop trip counts "
                        "are not jittable)"
                    )
                if not cond:
                    break
                try:
                    self.run(s.body)
                except _LoopContinue:
                    pass
                except _LoopBreak:
                    break
                trips += 1
                if trips > 100_000:
                    raise StanCompileError(
                        f"line {s.line}: `while` exceeded 100000 iterations "
                        "(non-terminating data-derived condition?)"
                    )
        elif isinstance(s, Return):
            raise _FnReturn(
                None
                if s.expr is None
                else _as_value_oriented(self.ev(s.expr))
            )
        elif isinstance(s, ExprStmt):
            self.ev(s.expr)  # side effect only (user fn `target +=`)
        elif isinstance(s, Break):
            raise _LoopBreak()
        elif isinstance(s, Continue):
            raise _LoopContinue()
        elif isinstance(s, Reject):
            raise StanCompileError(
                f"line {s.line}: reject() reached during tracing — with "
                "data-derived control flow only, it would reject EVERY "
                "draw (guard it with a data-derived `if`, or remove it)"
            )
        elif isinstance(s, If):
            cond = self.ev(s.cond)
            if isinstance(cond, (bool, int, float, np.bool_, np.integer)):
                self.run(s.then if cond else s.other)
            else:
                raise StanCompileError(
                    f"line {s.line}: `if` conditions must be data-derived "
                    "(parameter-dependent branching is not jittable; use "
                    "the ternary operator for elementwise selects)"
                )
        else:
            raise StanCompileError(f"unsupported statement {s!r}")

    def _declare(self, s: Decl):
        dims = [
            _require_int(self.ev(d), f"line {s.line}: dimension")
            for d in s.dims
        ]
        # Record the declared base type so indexed reads / Var reads can
        # attach Stan row/column orientation (see _wrap_row_after_index).
        types = self.env.get("__types__")
        if types is None:
            types = {}
            self.env["__types__"] = types
        types[s.name] = s.type
        if s.type == "tuple":
            self.env[s.name] = (
                self.ev(s.init) if s.init is not None else None
            )
            return []
        if s.init is not None:
            val = self.ev(s.init)
            if s.type == "row_vector" and getattr(val, "ndim", 0) == 1:
                val = _as_value_oriented(val)
                if not isinstance(val, RowVector):
                    val = RowVector(val)
            self.env[s.name] = val
        elif dims:
            la = _LocalArray(dims)
            if s.type == "row_vector" and len(dims) == 1:
                la.row = True
            self.env[s.name] = la
        else:
            self.env[s.name] = None  # scalar declared, not yet assigned
        return dims

    def _assign(self, s: Assign):
        val = self.ev(s.expr)
        if s.op != "=":
            cur = self.ev(s.lvalue)
            l, r = _as_value(cur), _as_value(val)
            val = {
                "+=": lambda: l + r,
                "-=": lambda: l - r,
                "*=": lambda: l * r,
                "/=": lambda: l / r,
            }[s.op]()
        if isinstance(s.lvalue, Var):
            self.env[s.lvalue.name] = val
            return
        if not isinstance(s.lvalue, Index):
            raise StanCompileError(
                "unsupported assignment target (tuple-member assignment "
                "t.1 = ... is not supported; rebuild the whole tuple)"
            )
        # indexed assignment: resolve base container
        base_node, idx_nodes = s.lvalue.base, s.lvalue.indices
        if not isinstance(base_node, Var):
            raise StanCompileError("chained-index assignment unsupported")
        idxs = [self.ev(i) for i in idx_nodes]
        self._indexed_assign(base_node.name, idxs, val)

    def _indexed_assign(self, name, idxs, val):
        container = self.env.get(name)
        if isinstance(container, RowVector):
            ix = tuple(
                _require_int(i, "assignment index") - 1 for i in idxs
            )
            self.env[name] = RowVector(
                jnp.asarray(container.data, dtype=float)
                .at[ix]
                .set(_as_value(val))
            )
            return
        if isinstance(container, _LocalArray):
            container.set(
                [_require_int(i, "assignment index") for i in idxs],
                _as_value(val),
            )
            return
        if hasattr(container, "at"):
            # jnp array (e.g. a scan-lowered loop result): functional update.
            ix = tuple(
                _require_int(i, "assignment index") - 1 for i in idxs
            )
            self.env[name] = container.at[ix].set(_as_value(val))
            return
        raise StanCompileError(
            f"indexed assignment into non-local {name!r}"
        )

    # ------------------------------------------------- scan loop lowering

    def _analyze_stream(self, s: For, container_names, array_names):
        """Classify the loop body for the STREAMING scan form: every write
        to a streamable container must be `C[t] = ...` (t the loop var),
        every read `C[t-k]` (k >= 0), and loop-var-dependent data reads must
        be affine `A[t+c]`. Returns (creads: name -> set of lags,
        dreads: name -> set of offsets); raises _ScanLoweringError when the
        body does not fit the idiom."""
        creads: dict = {}
        dreads: dict = {}
        var = s.var

        _EXPR_TYPES = (Num, Var, Unary, Bin, Ternary, Index, Call)

        def walk_expr(node):
            if isinstance(node, Index) and isinstance(node.base, Var):
                bname = node.base.name
                if bname in container_names:
                    if len(node.indices) != 1:
                        raise _ScanLoweringError("multi-index stream read")
                    off = _match_loopvar_offset(node.indices[0], var)
                    if off is None or off > 0:
                        raise _ScanLoweringError(
                            f"{bname} read at non-window index"
                        )
                    creads.setdefault(bname, set()).add(-off)
                    return
                if bname in array_names:
                    if len(node.indices) == 1:
                        off = _match_loopvar_offset(node.indices[0], var)
                        if off is not None:
                            dreads.setdefault(bname, set()).add(off)
                            return
                    if _mentions_var(node.indices, var):
                        raise _ScanLoweringError("non-affine data index")
                for i in node.indices:
                    walk_expr(i)
                return
            if isinstance(node, Var) and node.name in container_names:
                raise _ScanLoweringError(
                    f"whole-container read of {node.name} inside the loop"
                )
            if isinstance(node, (list, tuple)):
                for x in node:
                    walk_expr(x)
            elif dataclasses.is_dataclass(node) and not isinstance(node, type):
                for f in dataclasses.fields(node):
                    v = getattr(node, f.name)
                    if isinstance(v, _EXPR_TYPES + (list, tuple)):
                        walk_expr(v)

        def walk_stmt(st):
            if isinstance(st, list):
                for x in st:
                    walk_stmt(x)
            elif isinstance(st, Assign):
                lv = st.lvalue
                if isinstance(lv, Index) and isinstance(lv.base, Var) and (
                    lv.base.name in container_names
                ):
                    if len(lv.indices) != 1 or _match_loopvar_offset(
                        lv.indices[0], var
                    ) != 0:
                        raise _ScanLoweringError(
                            f"{lv.base.name} written at an index other "
                            "than the loop variable"
                        )
                elif isinstance(lv, Var) and lv.name in container_names:
                    raise _ScanLoweringError("whole-container assignment")
                else:
                    walk_expr(lv)
                walk_expr(st.expr)
            elif isinstance(st, (TargetPlus,)):
                walk_expr(st.expr)
            elif isinstance(st, Sampling):
                walk_expr(st.lhs)
                for a in st.args:
                    walk_expr(a)
                for b in (st.t_lower, st.t_upper):
                    if b is not None:
                        walk_expr(b)
            elif isinstance(st, For):
                if st.var == var:
                    raise _ScanLoweringError("inner loop shadows loop var")
                walk_expr(st.lo)
                walk_expr(st.hi)
                walk_stmt(st.body)
            elif isinstance(st, If):
                walk_expr(st.cond)
                walk_stmt(st.then)
                walk_stmt(st.other)
            elif isinstance(st, Decl):
                if st.init is not None:
                    walk_expr(st.init)

        walk_stmt(s.body)
        return creads, dreads

    def _run_for_scan_streamed(self, s: For, lo, hi, carried, declared):
        """Streaming scan form: container writes at the loop index become
        stacked scan outputs (ys), reads at bounded lags become a small
        carried window, and affine data reads become pre-sliced scan xs —
        NO dynamic indexing anywhere, so the traced loop is exactly the
        dataflow a TPU wants: vmap keeps it gather/scatter-free and Mosaic
        lowers it inside Pallas kernels, while the XLA path gets a leaner
        scan than the dynamic-slice form."""
        env = self.env
        stream_names = [
            n for n in carried if isinstance(env.get(n), _LocalArray)
        ]
        scalar_names = [n for n in carried if n not in stream_names]
        for n in stream_names:
            if len(env[n].dims) != 1:
                raise _ScanLoweringError("only rank-1 containers stream")
        array_names = {
            n for n, v in env.items()
            if n not in carried
            and not isinstance(v, _LocalArray)
            and hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1
        }
        creads, dreads = self._analyze_stream(
            s, set(stream_names), array_names
        )

        nan_scalar = jnp.asarray(float("nan"), dtype=float)

        def elem(v):
            """One container element as a (possibly traced) scalar value."""
            if v is None:
                return nan_scalar
            return v if isinstance(v, jax.core.Tracer) else jnp.asarray(
                v, dtype=float
            )

        # Carried window: C[lo-k] for EVERY lag 1..max(read lags) — the
        # window shifts by one each step, so intermediate lags must ride the
        # carry even when never read (reading only {1,3} still needs slot 2
        # to hand last step's slot-1 value down to slot 3 two steps later).
        windows = {}
        for n in stream_names:
            max_lag = max(
                (k for k in creads.get(n, set()) if k >= 1), default=0
            )
            vals = {}
            for k in range(1, max_lag + 1):
                if lo - k < 1:
                    raise _ScanLoweringError(
                        f"{n}[t-{k}] out of bounds at the first iteration"
                    )
                vals[k] = elem(env[n].data[lo - k - 1])
            windows[n] = vals

        # xs: static slices of the data arrays, one per (name, offset).
        length = hi - lo + 1
        xs_keys = []
        xs_arrays = []
        for name, offs in sorted(dreads.items()):
            arr = env[name]
            n_len = int(np.shape(arr)[0])
            for off in sorted(offs):
                a0, a1 = lo + off - 1, hi + off
                if a0 < 0 or a1 > n_len:
                    raise _ScanLoweringError(
                        f"{name}[t{off:+d}] out of bounds"
                    )
                xs_keys.append((name, off))
                xs_arrays.append(jnp.asarray(arr[a0:a1], dtype=float))

        def scalar_init(v):
            return nan_scalar if v is None else jnp.asarray(v)

        scalar_init_vals = tuple(scalar_init(env[n]) for n in scalar_names)
        window_init = tuple(
            tuple(windows[n][k] for k in sorted(windows[n]))
            for n in stream_names
        )
        i0 = jnp.asarray(lo, jnp.int32)
        outer_env = self.env
        rng_key = self.rng_key
        rng_base = self._rng_count

        def body(carry, xs_step):
            scalars, wins, tgt, i = carry
            benv = dict(outer_env)
            benv.update(zip(scalar_names, scalars))
            benv[s.var] = i
            streams = {}
            for n, wv in zip(stream_names, wins):
                streams[n] = _StreamView(
                    n, dict(zip(sorted(windows[n]), wv))
                )
            xs_vals = dict(zip(xs_keys, xs_step))
            body_key = None
            if rng_key is not None:
                body_key = jax.random.fold_in(
                    jax.random.fold_in(rng_key, 1_000_003 + rng_base), i
                )
            interp = _ScanInterp(
                benv, rng_key=body_key,
                streams=streams, xs_vals=xs_vals, loopvar=s.var,
            )
            interp.run(s.body)
            new_scalars = tuple(
                jnp.asarray(_as_value(interp.env[n])) for n in scalar_names
            )
            ys = []
            new_wins = []
            for n in stream_names:
                sv = streams[n]
                if sv.current is None:
                    raise _ScanLoweringError(
                        f"{n} not written every iteration"
                    )
                ys.append(sv.current)
                lags = sorted(windows[n])
                nw = []
                for k in lags:
                    nw.append(sv.current if k == 1 else sv.window[k - 1])
                new_wins.append(tuple(nw))
            return (
                (new_scalars, tuple(new_wins), tgt + interp.target, i + 1),
                tuple(ys),
            )

        (final_scalars, _, tgt, _), ys_out = jax.lax.scan(
            body,
            (scalar_init_vals, window_init, jnp.asarray(0.0, dtype=float), i0),
            tuple(xs_arrays),
            length=length,
        )

        # Reconstruct each streamed container: untouched prefix/suffix
        # elements around the stacked loop outputs (concatenation only — a
        # static-index update would batch into a scatter under vmap).
        for n, ys in zip(stream_names, ys_out):
            data = env[n].data
            t_len = env[n].dims[0]
            parts = []
            if lo - 1 > 0:
                parts.append(jnp.stack([elem(v) for v in data[: lo - 1]]))
            parts.append(ys)
            if hi < t_len:
                parts.append(jnp.stack([elem(v) for v in data[hi:]]))
            self.env[n] = jnp.concatenate(parts, axis=0) if len(
                parts
            ) > 1 else parts[0]
        for n, v in zip(scalar_names, final_scalars):
            self.env[n] = v
        self.target = self.target + tgt
        if rng_key is not None:
            self._rng_count = rng_base + 1

    def _run_for_scanned(self, s: For, lo, hi):
        """Lower a long data-bounded `for` loop to lax.scan. The STREAMING
        form is preferred (container writes at the loop index -> stacked ys,
        lagged reads -> carried window, affine data reads -> pre-sliced xs;
        no dynamic indexing, so it vmaps gather-free and lowers in Pallas
        kernels). Bodies outside that idiom fall back to the CARRIED-ARRAY
        form: assigned names become the carry (containers materialized as
        arrays, NaN-filled where uninitialized, matching Stan's
        undefined-real value) and loop-variable indexing becomes dynamic
        slices/updates. Commits env/target mutations only after the scan
        traces successfully, so a failed attempt can fall back to unrolling
        with no side effects."""
        assigned, declared = set(), set()
        _walk_writes(s.body, assigned, declared)
        carried = sorted(assigned - declared)
        for n in carried:
            if n not in self.env:
                raise _ScanLoweringError(f"assignment to undefined {n!r}")

        # Prefer the streaming form (pure dataflow, no dynamic indexing).
        try:
            self._run_for_scan_streamed(s, lo, hi, carried, declared)
            return
        except _ScanLoweringError:
            pass

        nan_scalar = jnp.asarray(float("nan"), dtype=float)

        def materialize(v):
            if v is None:
                return nan_scalar
            if isinstance(v, _LocalArray):
                return v.as_array_filled()
            return jnp.asarray(v)

        init_vals = tuple(materialize(self.env[n]) for n in carried)
        outer_env = self.env
        rng_key = self.rng_key
        rng_base = self._rng_count
        # The loop index rides the carry rather than an arange xs (one less
        # materialized constant; also keeps the index unbatched under vmap).
        i0 = jnp.asarray(lo, jnp.int32)

        def body(carry, _):
            vals, tgt, i = carry
            env = dict(outer_env)
            env.update(zip(carried, vals))
            env[s.var] = i
            body_key = None
            if rng_key is not None:
                # Distinct stream per iteration AND per loop call site.
                body_key = jax.random.fold_in(
                    jax.random.fold_in(rng_key, 1_000_003 + rng_base), i
                )
            interp = _ScanInterp(env, rng_key=body_key)
            interp.run(s.body)
            new_vals = tuple(
                jnp.asarray(_as_value(interp.env[n])) for n in carried
            )
            return (new_vals, tgt + interp.target, i + 1), None

        (final_vals, tgt, _), _ = jax.lax.scan(
            body,
            (init_vals, jnp.asarray(0.0, dtype=float), i0),
            None,
            length=hi - lo + 1,
        )
        for n, v in zip(carried, final_vals):
            self.env[n] = v
        self.target = self.target + tgt
        if rng_key is not None:
            self._rng_count = rng_base + 1


class _ScanInterp(_Interp):
    """Interpreter for a lax.scan-lowered loop body: the loop variable is a
    traced int32, so indices may be tracers — reads become jnp.take along
    leading axes and writes become .at[...].set on the carried arrays.
    Nested loops inside the body are always unrolled (scan_threshold=None);
    traced inner bounds or traced `if` conditions raise, which aborts the
    enclosing lowering attempt and falls back to full unrolling."""

    def __init__(self, env, rng_key=None, streams=None,
                 xs_vals=None, loopvar=None):
        super().__init__(env, scan_threshold=None, rng_key=rng_key)
        # Streaming-scan context (see _run_for_scan_streamed): container
        # reads/writes and affine data reads are resolved STRUCTURALLY
        # against the loop variable, never via dynamic indexing.
        self.streams = streams
        self.xs_vals = xs_vals
        self.loopvar = loopvar

    def ev(self, node):
        if self.streams is not None and isinstance(node, Index) and (
            isinstance(node.base, Var)
        ):
            nm = node.base.name
            if nm in self.streams:
                off = _match_loopvar_offset(node.indices[0], self.loopvar)
                if off is None or len(node.indices) != 1:
                    raise _ScanLoweringError("non-window stream read")
                return self.streams[nm].read(-off)
            if len(node.indices) == 1:
                off = _match_loopvar_offset(node.indices[0], self.loopvar)
                if off is not None and (nm, off) in self.xs_vals:
                    return self.xs_vals[(nm, off)]
        return super().ev(node)

    def _assign(self, s):
        lv = s.lvalue
        if self.streams is not None and isinstance(lv, Index) and (
            isinstance(lv.base, Var) and lv.base.name in self.streams
        ):
            val = self.ev(s.expr)
            if s.op != "=":
                cur = self.ev(lv)
                l, r = _as_value(cur), _as_value(val)
                val = {
                    "+=": lambda: l + r,
                    "-=": lambda: l - r,
                    "*=": lambda: l * r,
                    "/=": lambda: l / r,
                }[s.op]()
            if len(lv.indices) != 1 or _match_loopvar_offset(
                lv.indices[0], self.loopvar
            ) != 0:
                raise _ScanLoweringError("stream write not at loop var")
            self.streams[lv.base.name].current = _as_value(val)
            return
        super()._assign(s)

    def _index_read(self, base, idxs):
        if any(isinstance(i, tuple) for i in idxs):
            # Range reads under a scan-lowered body: abort the lowering
            # attempt (falls back to unrolling, where ranges are static).
            raise _ScanLoweringError("range index inside scanned loop body")
        if all(_is_static_int(i) for i in idxs):
            return super()._index_read(base, idxs)
        arr = (
            base.as_array_filled()
            if isinstance(base, _LocalArray)
            else jnp.asarray(_as_value(base))
        )
        out = arr
        for i in idxs:
            if _is_static_int(i):
                out = out[int(i) - 1]
            else:
                # dynamic_index_in_dim, not jnp.take: take lowers to a
                # gather, which Mosaic cannot lower inside Pallas kernels;
                # a scalar dynamic index is just a dynamic_slice.
                out = jax.lax.dynamic_index_in_dim(
                    out, jnp.asarray(i) - 1, axis=0, keepdims=False
                )
        return out

    def _indexed_assign(self, name, idxs, val):
        if all(_is_static_int(i) for i in idxs):
            container = self.env.get(name)
            if not isinstance(container, _LocalArray):
                ix = tuple(int(i) - 1 for i in idxs)
                self.env[name] = jnp.asarray(container).at[ix].set(
                    _as_value(val)
                )
                return
            return super()._indexed_assign(name, idxs, val)
        container = self.env.get(name)
        if isinstance(container, _LocalArray):
            # Carried containers were materialized to arrays when the scan
            # env was built; a traced write into a non-carried container is
            # a lowering-analysis failure — abort to the unrolled path.
            raise _ScanLoweringError(
                f"traced write into non-carried container {name!r}"
            )
        # dynamic_update_slice, not .at[traced].set: the latter lowers to a
        # scatter, which Mosaic cannot lower inside Pallas kernels.
        arr = jnp.asarray(container)
        k = len(idxs)
        v = jnp.asarray(_as_value(val), arr.dtype)
        v = v.reshape((1,) * k + v.shape)
        starts = tuple(
            jnp.asarray(i, jnp.int32) - 1 for i in idxs
        ) + (0,) * (arr.ndim - k)
        self.env[name] = jax.lax.dynamic_update_slice(arr, v, starts)


# ------------------------------------------------------------ param packing


_VEC_CONSTRAINED = ("simplex", "ordered", "positive_ordered", "unit_vector",
                    "cholesky_factor_corr", "corr_matrix", "cov_matrix",
                    "cholesky_factor_cov")


def _cpc_cholesky(u, k):
    """Canonical-partial-correlation Cholesky factor (Stan ch. 10.12):
    z_ij = tanh(u_ij), rows built left-to-right with unit norm. Returns
    (L, logJ) with logJ = sum_{i>j} [log(1 - z_ij^2) + 0.5 log(1 -
    sum_{k<j} L_ik^2)] — the Jacobian onto L's strictly-lower entries.
    Shared by the cholesky_factor_corr and corr_matrix transforms."""
    z = jnp.tanh(u)
    zero = jnp.asarray(0.0, u.dtype)
    jac = zero
    rows = []
    idx = 0
    for i in range(k):
        row = []
        ssq = zero
        for j in range(i):
            zij = z[idx]
            idx += 1
            rem = 1.0 - ssq
            jac = jac + jnp.log1p(-zij * zij) + 0.5 * jnp.log(rem)
            x = zij * jnp.sqrt(rem)
            ssq = ssq + x * x
            row.append(x)
        row.append(jnp.sqrt(1.0 - ssq))
        row.extend(zero for _ in range(k - i - 1))
        rows.append(jnp.stack(row))
    return jnp.stack(rows), jac


class _ParamSpec:
    """Unconstrained packing + constraining transform for one parameter.

    Scalar lower/upper bounds map elementwise (exp / negated exp / scaled
    logistic). The constrained VECTOR types carry their transform in the
    type itself (Stan reference manual ch. 10, mirroring the full BridgeStan
    transform set the reference gets for free,
    /root/reference/smcnuts/model/bridgestan.py:93-120):

    - ordered:          c_1 = u_1, c_k = c_{k-1} + exp(u_k);  logJ = Σ_{k≥2} u_k
    - positive_ordered: c_1 = exp(u_1), then as ordered;      logJ = Σ u_k
    - simplex (K):      stick-breaking over K-1 unconstrained coordinates,
                        z_k = logit⁻¹(u_k − log(K−k)), c_k = stick_k · z_k;
                        logJ = Σ [log z_k + log(1−z_k) + log stick_k]
    - unit_vector (K):  c = u/‖u‖ with Stan's −½‖u‖² density adjustment
                        standing in for the Jacobian term.

    Matrix-constrained types (Stan manual ch. 10.9-10.12; completes the
    BridgeStan transform set):

    - cholesky_factor_corr (K): K(K-1)/2 canonical partial correlations
      z = tanh(u), rows built left-to-right with unit norm;
      logJ = Σ_{i>j} [log(1−z_ij²) + ½ log(1−Σ_{k<j} L_ik²)]
    - corr_matrix (K): the cholesky_factor_corr map composed with
      Σ = L Lᵀ. The L→Σ stage (strictly-lower entries, row-major) is
      triangular with diagonal ∂Σ_ij/∂L_ij = L_jj, adding
      logJ += Σ_{j<K} (K−j)·log L_jj (validated numerically in tests).
    - cov_matrix (K): K(K+1)/2 coordinates, row-major lower triangle with
      the diagonal exp-transformed, Σ = L Lᵀ;
      logJ = K·log 2 + Σ_k (K−k+2)·u_kk  (Stan manual 10.10)
    - cholesky_factor_cov (K): row-major lower triangle, diagonal
      exp-transformed, no product; logJ = Σ_k u_kk.
    """

    def __init__(self, decl: Decl, sizes, lower, upper, offset=None,
                 multiplier=None):
        self.name = decl.name
        if (offset is not None or multiplier is not None) and (
            lower is not None or upper is not None
        ):
            raise StanCompileError(
                f"{decl.name}: offset/multiplier cannot combine with "
                "lower/upper bounds (as in Stan)"
            )
        if multiplier is not None and multiplier <= 0:
            raise StanCompileError(
                f"{decl.name}: multiplier must be positive"
            )
        self.offset = offset
        self.multiplier = multiplier
        self.decl_type = decl.type  # for the orientation type table
        self.vtype = decl.type if decl.type in _VEC_CONSTRAINED else None
        if self.vtype is not None and len(sizes) != 1:
            raise StanCompileError(
                f"{decl.type}[{'x'.join(map(str, sizes))}] {decl.name}: "
                "constrained vector types take exactly one dimension"
            )
        if self.vtype is not None and sizes[0] < 2:
            raise StanCompileError(
                f"{decl.type} {decl.name} needs dimension >= 2"
            )
        self.sizes = tuple(sizes)  # () for scalar
        self.count = int(np.prod(sizes)) if sizes else 1
        if self.vtype == "simplex":
            # K constrained coordinates live on a (K-1)-dim manifold.
            self.count = self.sizes[0] - 1
        elif self.vtype in ("cholesky_factor_corr", "corr_matrix"):
            # K x K output from the K(K-1)/2 canonical partial correlations.
            k = self.sizes[0]
            self.count = k * (k - 1) // 2
            self.sizes = (k, k)
        elif self.vtype in ("cov_matrix", "cholesky_factor_cov"):
            # K x K output from the K(K+1)/2 lower-triangle coordinates.
            k = self.sizes[0]
            self.count = k * (k + 1) // 2
            self.sizes = (k, k)
        self.lower = lower
        self.upper = upper

    def constrain(self, u):
        """u: (count,) slice of theta → (constrained values, log-Jacobian)."""
        if self.vtype == "ordered":
            c = jnp.cumsum(
                jnp.concatenate([u[:1], jnp.exp(u[1:])])
            )
            return c, jnp.sum(u[1:])
        if self.vtype == "positive_ordered":
            return jnp.cumsum(jnp.exp(u)), jnp.sum(u)
        if self.vtype == "simplex":
            k = self.sizes[0]
            adj = u - jnp.log(jnp.arange(k - 1, 0, -1, dtype=u.dtype))
            log_z = jax.nn.log_sigmoid(adj)
            log1m_z = jax.nn.log_sigmoid(-adj)
            cum = jnp.cumsum(log1m_z)
            log_stick = jnp.concatenate(
                [jnp.zeros((1,), u.dtype), cum[:-1]]
            )
            c = jnp.concatenate(
                [jnp.exp(log_stick + log_z), jnp.exp(cum[-1:])]
            )
            jac = jnp.sum(log_z + log1m_z + log_stick)
            return c, jac
        if self.vtype == "unit_vector":
            norm2 = jnp.sum(u * u)
            c = u / jnp.sqrt(norm2)
            return c, -0.5 * norm2
        if self.vtype in ("cholesky_factor_corr", "corr_matrix"):
            ell, jac = _cpc_cholesky(u, self.sizes[0])
            if self.vtype == "cholesky_factor_corr":
                return ell, jac
            # corr_matrix: Sigma = L L^T. The L -> Sigma stage over the
            # strictly-lower entries (row-major) is triangular with diagonal
            # dSigma_ij/dL_ij = L_jj, so each column j's diagonal enters
            # K-1-j times (0-based). L_00 = 1 contributes nothing.
            k = self.sizes[0]
            diag = jnp.diagonal(ell)
            mult = jnp.arange(k - 1, -1, -1, dtype=u.dtype)
            jac = jac + jnp.sum(mult * jnp.log(diag))
            return ell @ ell.T, jac
        if self.vtype in ("cov_matrix", "cholesky_factor_cov"):
            # Row-major lower triangle; diagonal coordinates exp-transformed
            # so the factor has a positive diagonal.
            k = self.sizes[0]
            zero = jnp.asarray(0.0, u.dtype)
            rows = []
            log_diag = []
            idx = 0
            for i in range(k):
                off = [u[idx + j] for j in range(i)]
                log_diag.append(u[idx + i])
                idx += i + 1
                row = off + [jnp.exp(u[idx - 1])]
                row.extend(zero for _ in range(k - i - 1))
                rows.append(jnp.stack(row))
            ell = jnp.stack(rows)
            log_diag = jnp.stack(log_diag)
            if self.vtype == "cholesky_factor_cov":
                return ell, jnp.sum(log_diag)
            # cov_matrix (Stan manual 10.10): Sigma = L L^T;
            # logJ = K log 2 + sum_k (K - k + 2) u_kk   (1-based k).
            mult = jnp.arange(k + 1, 1, -1, dtype=u.dtype)
            jac = k * jnp.log(jnp.asarray(2.0, u.dtype)) + jnp.sum(
                mult * log_diag
            )
            return ell @ ell.T, jac
        c, jac_e = self._bounded(u)
        jac = (
            jnp.asarray(0.0, dtype=u.dtype)
            if jac_e is None
            else jnp.sum(jac_e)
        )
        if not self.sizes:
            return c[0], jac
        return c.reshape(self.sizes), jac

    def _bounded(self, u):
        """Elementwise scalar-bound transform shared by `constrain` (array
        slice) and `constrain_seq` (single scalar): (constrained, per-element
        log-Jacobian or None when unbounded). One copy only — the XLA path
        and the forward-mode Pallas tile path must never drift."""
        if self.offset is not None or self.multiplier is not None:
            off = 0.0 if self.offset is None else self.offset
            mult = 1.0 if self.multiplier is None else self.multiplier
            jac = jnp.full_like(jnp.asarray(u), float(np.log(mult)))
            return off + mult * u, jac
        if self.lower is not None and self.upper is not None:
            # logistic via tanh and log-sigmoid via the stable softplus
            # expansion: jax.nn.sigmoid/log_sigmoid trace to composites
            # whose batched vjp emits ops Mosaic cannot legalize
            # (tpu.transpose) inside Pallas tile bodies; tanh/exp/log1p
            # are native. Same values to f32 ulps.
            u_f = jnp.asarray(u, dtype=float)
            span = self.upper - self.lower
            c = self.lower + span * 0.5 * (jnp.tanh(0.5 * u_f) + 1.0)

            def softplus(x):
                return jnp.log1p(jnp.exp(-jnp.abs(x))) + jnp.maximum(
                    x, 0.0
                )

            jac = jnp.log(span) - softplus(u_f) - softplus(-u_f)
            return c, jac
        if self.lower is not None:
            return self.lower + jnp.exp(u), u
        if self.upper is not None:
            return self.upper - jnp.exp(u), u
        return u, None

    def constrain_seq(self, us):
        """Like `constrain`, but from a SEQUENCE of scalar coordinates —
        the forward-mode tile adapter's contract
        (ops/nuts_pallas.tile_model_from_logp_fwd): scalar parameters apply
        their transform directly on the scalar, introducing NO jnp.stack,
        so per-coordinate symbolic-zero tangents survive into the model
        body.

        Rank-1 parameters with ELEMENTWISE transforms (plain vector/array
        with scalar bounds or offset/multiplier — everything except the
        _VEC_CONSTRAINED types, whose maps genuinely mix coordinates) get
        the same treatment per element, returned as a _LocalArray of
        scalars: a jnp.stack here would instantiate every pass's symbolic-
        zero tangents into dense (8, 128) tiles and the whole model body
        would then carry D-wide tangents per pass (VERDICT r4 #6 — the
        D=64 IRT model traced 167k ops stacked vs ~8k with scalar
        elements, because each item parameter's tangent cone is a handful
        of observation terms, not the whole recurrence)."""
        if self.vtype is not None or len(self.sizes) > 1:
            return self.constrain(jnp.stack([jnp.asarray(u) for u in us]))
        if self.sizes:
            arr = _LocalArray([self.sizes[0]])
            jac = jnp.asarray(0.0, dtype=float)
            for i, u in enumerate(us):
                c, j = self._bounded(u)
                arr.set([i + 1], c)
                if j is not None:
                    jac = jac + j
            return arr, jac
        c, jac = self._bounded(us[0])
        if jac is None:
            jac = jnp.asarray(0.0, dtype=float)
        return c, jac

    def names(self):
        if not self.sizes:
            return [self.name]
        idx_lists = np.indices(self.sizes).reshape(len(self.sizes), -1).T + 1
        return [
            self.name + "." + ".".join(str(i) for i in row)
            for row in idx_lists
        ]


# ---------------------------------------------------------------- compile


def load_stan_data(path: str) -> dict:
    """Load a Stan data JSON. Tolerates the reference's truncated-rewrite
    corruption (SURVEY.md §2 #15: PRMwCD.json ends mid-`"phi": ` after an
    interrupted in-place rewrite by bridgestan.py:134-141) by completing the
    dangling `phi` field in memory."""
    with open(path) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        repaired = text.rstrip()
        if repaired.endswith('"phi":'):
            repaired += " 1.0}"
        elif repaired.endswith('"phi": '):
            repaired += "1.0}"
        else:
            raise
        return json.loads(repaired)


def _build_data_env(prog: Program, data: dict) -> tuple[dict, bool]:
    env = {"__types__": {}}
    # User-defined functions ride the env under a reserved key (Stan
    # identifiers cannot start with '_'), so every interpreter copy —
    # including scan-lowered loop bodies and the constrain/GQ paths — can
    # resolve them without threading an extra argument everywhere.
    fdefs = prog.blocks.get("functions", [])
    if fdefs:
        env["__functions__"] = {f.name: f for f in fdefs}
    has_phi = False
    for decl in prog.blocks.get("data", []):
        if not isinstance(decl, Decl):
            raise StanCompileError("only declarations allowed in data block")
        if decl.type == "tuple":
            raise StanCompileError(
                "tuple-typed data is not supported (pass the members as "
                "separate data entries)"
            )
        if decl.name == "phi":
            has_phi = True
            continue  # bound per-evaluation as the tempering argument
        if decl.name not in data:
            raise StanCompileError(f"data variable {decl.name!r} missing")
        env["__types__"][decl.name] = decl.type
        raw = data[decl.name]
        if decl.type == "int" and not decl.dims:
            env[decl.name] = int(raw)
        elif decl.type == "int":
            env[decl.name] = np.asarray(raw, dtype=np.int64)
        elif not decl.dims:
            env[decl.name] = float(raw)
        else:
            arr = np.asarray(raw, dtype=np.float64)
            env[decl.name] = arr.reshape(
                [int(_Interp(env).ev(d)) for d in decl.dims]
            )
    # transformed data: evaluated once with concrete numpy values
    td = prog.blocks.get("transformed data", [])
    if td:
        interp = _Interp(env)
        interp.run(td)
        env.update(interp.env)
    return env, has_phi


def _body_has_carried_dep(body, loopvar) -> bool:
    """Does a loop body carry state across iterations? True when some
    container assigned in the body is read at a LAGGED index (err[t-1]), or
    some scalar assigned in the body is read before its first write of the
    iteration (e = y[t] - a*e; acc += ...). A fresh per-iteration temp
    (temp = ...; temp += ... — PRMwCD's inner-product idiom) is NOT carried.
    Unanalyzable constructs answer True (forward mode is the safe
    direction)."""
    assigned, declared = set(), set()
    try:
        _walk_writes(body, assigned, declared)
    except _ScanLoweringError:
        return True
    assigned = assigned | declared
    written: set = set()
    found = False

    def reads(node):
        nonlocal found
        if found or node is None or isinstance(node, Num):
            return
        if isinstance(node, Var):
            if node.name in assigned and node.name not in written:
                found = True
            return
        if isinstance(node, Index):
            if isinstance(node.base, Var) and node.base.name in assigned:
                if len(node.indices) == 1:
                    off = _match_loopvar_offset(node.indices[0], loopvar)
                    if off is not None:
                        if off < 0:
                            found = True
                        else:
                            for i in node.indices:
                                reads(i)
                        return
                found = True  # complex index into a written container
                return
            if not isinstance(node.base, Var):
                reads(node.base)
            for i in node.indices:
                reads(i)
            return
        if isinstance(node, Unary):
            reads(node.operand)
        elif isinstance(node, Bin):
            reads(node.left)
            reads(node.right)
        elif isinstance(node, Ternary):
            reads(node.cond)
            reads(node.then)
            reads(node.other)
        elif isinstance(node, Call):
            for a in node.args:
                reads(a)

    def walk(stmts):
        nonlocal found
        for st in stmts if isinstance(stmts, (list, tuple)) else [stmts]:
            if found:
                return
            if isinstance(st, list):
                walk(st)
            elif isinstance(st, Decl):
                reads(st.init)
                written.add(st.name)
            elif isinstance(st, Assign):
                reads(st.expr)
                if st.op != "=":
                    reads(st.lvalue)
                lv = st.lvalue
                if isinstance(lv, Var):
                    written.add(lv.name)
                elif isinstance(lv, Index):
                    for i in lv.indices:
                        reads(i)
                    if isinstance(lv.base, Var):
                        written.add(lv.base.name)
            elif isinstance(st, TargetPlus):
                reads(st.expr)
            elif isinstance(st, Sampling):
                reads(st.lhs)
                for a in st.args:
                    reads(a)
                reads(st.t_lower)
                reads(st.t_upper)
            elif isinstance(st, For):
                reads(st.lo)
                reads(st.hi)
                walk(st.body)
            elif isinstance(st, If):
                reads(st.cond)
                # Branch writes may not execute; do not add them to
                # `written` (conservative toward "carried").
                walk(st.then)
                walk(st.other)
            elif isinstance(st, (While, Return, ExprStmt, Break, Continue)):
                found = True  # unanalyzable control flow / side effects

    walk(body)
    return found


def _has_long_recurrence(blocks, env, threshold=48) -> bool:
    """Is there a static `for` loop of more than `threshold` iterations
    whose body carries state across iterations (a RECURRENCE)? This — not
    loop length alone — is what forces the forward-mode tile adapter: a
    long non-carried loop (PRMwCD's 100-observation sum) reverse-
    differentiates fine (its residual live set is a short reduction), and
    reverse costs one pass where forward costs D. Searches the given
    blocks AND every user-function body; `while` counts as a recurrence
    (unknowable trip count; forward is the safe direction)."""
    interp = _Interp(dict(env))

    def trip(s: For) -> int:
        try:
            lo = _require_int(interp.ev(s.lo), "loop bound")
            hi = _require_int(interp.ev(s.hi), "loop bound")
            return max(0, hi - lo + 1)
        except Exception:
            return 0

    def walk(stmts, mult=1) -> bool:
        # `mult` = product of enclosing static trip counts: a recurrence
        # spelled as nested short loops (10 x 10 carried steps) is still
        # a 100-step chain for the reverse adapter.
        for st in stmts if isinstance(stmts, (list, tuple)) else [stmts]:
            if isinstance(st, list):
                if walk(st, mult):
                    return True
            elif isinstance(st, For):
                eff = mult * max(1, trip(st))
                if eff > threshold and _body_has_carried_dep(
                    st.body, st.var
                ):
                    return True
                if walk(st.body, eff):
                    return True
            elif isinstance(st, While):
                return True
            elif isinstance(st, If):
                if walk(st.then, mult) or walk(st.other, mult):
                    return True
        return False

    fn_bodies = [
        f.body for f in env.get("__functions__", {}).values()
        if isinstance(f, FuncDef)
    ]
    return any(walk(b) for b in tuple(blocks) + tuple(fn_bodies))


def compile_stan_program(source: str, data: dict, name: str = "stan",
                         scan_threshold: int | None = 64,
                         tile: bool = False,
                         tile_autodiff: str = "auto") -> Model:
    """Compile Stan source + data dict into a framework `Model`.

    `scan_threshold`: loops of at least this many iterations lower to
    lax.scan (module docstring); None unrolls everything.

    `tile=True` additionally builds an in-kernel tile model so the compiled
    program runs on the whole-tree Pallas NUTS backend — the tempered target
    is evaluated ONCE per leaf (target(theta, phi) + jacobian, exact under
    the linear-phi convention) instead of the logprior/loglik split.
    Best-effort: Mosaic must be able to lower everything the model body
    traces to.

    `tile_autodiff` selects the in-kernel gradient strategy:
    - "reverse": jax.vjp (ops/nuts_pallas.tile_model_from_logp). One pass,
      but the unrolled body's residuals live in VMEM — walls at ~40
      recurrence steps on v5e (the T=200 arma spilled 594 MB).
    - "forward": D sequential jax.jvp passes
      (ops/nuts_pallas.tile_model_from_logp_fwd) — O(1) live state in the
      recurrence length, the machine-generated analog of the hand kernels'
      fused tangent recurrences; cost scales with the parameter count D.
    - "auto" (default): forward when the model/TP blocks (or any user
      function body) contain a long static loop that CARRIES state across
      iterations — a recurrence, the regime where reverse mode's reversed
      serial chain blows up in Mosaic — and reverse otherwise. Loop length
      alone is not the discriminator: a long NON-carried loop (PRMwCD's
      100-observation sum, where `temp` is freshly assigned each step)
      reverse-differentiates fine and one pass beats D.
    """
    prog = parse(source)
    if "parameters" not in prog.blocks:
        raise StanCompileError("program has no parameters block")

    data_env, has_phi = _build_data_env(prog, data)

    # Parameter specs (constraint bound exprs may reference data).
    spec_interp = _Interp(dict(data_env))
    specs = []
    for decl in prog.blocks["parameters"]:
        if not isinstance(decl, Decl):
            raise StanCompileError(
                "only declarations allowed in parameters block"
            )
        if decl.type == "tuple":
            raise StanCompileError(
                "tuple-typed parameters are not supported (declare the "
                "members as separate parameters)"
            )
        sizes = [
            _require_int(spec_interp.ev(d), "parameter dimension")
            for d in decl.dims
        ]
        lower = upper = offset = multiplier = None
        if decl.constraint is not None:
            if decl.constraint.lower is not None:
                lower = float(spec_interp.ev(decl.constraint.lower))
            if decl.constraint.upper is not None:
                upper = float(spec_interp.ev(decl.constraint.upper))
            if decl.constraint.offset is not None:
                offset = float(spec_interp.ev(decl.constraint.offset))
            if decl.constraint.multiplier is not None:
                multiplier = float(spec_interp.ev(decl.constraint.multiplier))
        specs.append(
            _ParamSpec(decl, sizes, lower, upper, offset=offset,
                       multiplier=multiplier)
        )
    dim = sum(s.count for s in specs)

    tp_block = prog.blocks.get("transformed parameters", [])
    model_block = prog.blocks.get("model", [])
    gq_block = prog.blocks.get("generated quantities", [])

    def _unpack(theta):
        """theta → (param env, total log-Jacobian). Accepts the (dim,)
        vector, or a SEQUENCE of scalar coordinates (the forward-mode tile
        adapter's no-stack contract; see _ParamSpec.constrain_seq)."""
        seq = isinstance(theta, (list, tuple))
        env = {}
        jac = jnp.asarray(0.0, dtype=float)
        off = 0
        for s in specs:
            u = theta[off : off + s.count]
            c, j = s.constrain_seq(u) if seq else s.constrain(u)
            env[s.name] = c
            jac = jac + j
            off += s.count
        return env, jac

    param_types = {s.name: s.decl_type for s in specs}

    def _eval_target(theta, phi, threshold=scan_threshold,
                     scalarize=False):
        env = dict(data_env)
        # Fresh orientation table per evaluation (the shallow env copy would
        # otherwise share data_env's dict and leak model-block decls).
        env["__types__"] = {
            **data_env.get("__types__", _EMPTY), **param_types
        }
        penv, jac = _unpack(theta)
        env.update(penv)
        if has_phi:
            env["phi"] = phi
        interp = _Interp(env, scan_threshold=threshold, scalarize=scalarize)
        interp.run(tp_block)
        interp.run(model_block)
        return interp.target, jac

    def logprior(theta):
        t0, jac = _eval_target(theta, 0.0)
        return t0 + jac

    if has_phi:

        def loglik(theta):
            t1, _ = _eval_target(theta, 1.0)
            t0, _ = _eval_target(theta, 0.0)
            return t1 - t0

    else:

        def loglik(theta):
            del theta
            return jnp.asarray(0.0, dtype=float)

    def _block_values(env, block, rng_key=None):
        """Run a block and return the flattened values of its declarations
        in order (the reference's param_constrain output layout for TP/GQ,
        bridgestan.py:106-120)."""
        interp = _Interp(env, scan_threshold=scan_threshold, rng_key=rng_key)
        interp.run(block)
        parts = []
        for stmt in block:
            if isinstance(stmt, Decl):
                v = interp.env[stmt.name]
                if v is None:
                    v = float("nan")  # declared, never assigned: Stan's NaN
                elif isinstance(v, _LocalArray):
                    v = v.as_array_filled()
                elif isinstance(v, RowVector):
                    v = v.data
                v = jnp.asarray(v, dtype=float)
                parts.append(v.reshape(-1) if v.ndim else v[None])
        return parts, interp.env

    def constrain(theta, include_gq=True):
        penv, _ = _unpack(theta)
        parts = []
        for s in specs:
            v = jnp.asarray(penv[s.name], dtype=float)
            parts.append(v.reshape(-1) if v.ndim else v[None])
        env = dict(data_env)
        env["__types__"] = {
            **data_env.get("__types__", _EMPTY), **param_types
        }
        env.update(penv)
        if has_phi:
            env["phi"] = jnp.asarray(1.0, dtype=float)
        if tp_block:
            tp_parts, env = _block_values(env, tp_block)
            parts.extend(tp_parts)
        if gq_block and include_gq:
            # Fixed-seed RNG: the reference constrains with new_rng(seed=0)
            # (bridgestan.py:106), making GQ-bearing estimates deterministic.
            gq_parts, _ = _block_values(
                env, gq_block, rng_key=jax.random.key(0)
            )
            parts.extend(gq_parts)
        return jnp.concatenate(parts)

    # Eager validation: trace the target once so unsupported distributions,
    # undefined variables, and parameter-dependent control flow surface at
    # compile time, not first use (the reference's equivalent failure is a
    # C++ compile error from stanc; ours should be as early).
    try:
        jax.eval_shape(
            lambda t: _eval_target(t, 0.5)[0],
            jax.ShapeDtypeStruct((dim,), jnp.float32),
        )
    except (StanCompileError, StanSyntaxError):
        raise
    except Exception as e:  # tracing errors from bad programs
        raise StanCompileError(f"model block failed to trace: {e}") from e

    param_names = []
    for s in specs:
        param_names.extend(s.names())
    probe_in = jax.ShapeDtypeStruct((dim,), jnp.float32)
    tp_probe = jax.eval_shape(
        lambda t: constrain(t, include_gq=False), probe_in
    )
    full_probe = jax.eval_shape(constrain, probe_in)
    n_tp = int(tp_probe.shape[0]) - len(param_names)
    n_gq = int(full_probe.shape[0]) - int(tp_probe.shape[0])
    constrained_dim = int(full_probe.shape[0])
    param_names.extend(f"tp.{i + 1}" for i in range(n_tp))
    param_names.extend(f"gq.{i + 1}" for i in range(n_gq))

    tile_model = None
    if tile:
        from ..ops.nuts_pallas import (
            tile_model_from_logp,
            tile_model_from_logp_fwd,
        )

        def logp_direct(theta, phi):
            # One target evaluation per leaf: logprior + phi*loglik ==
            # target(theta, phi) + jacobian under the linear-phi convention
            # (module docstring) — the split form would evaluate the target
            # twice per gradient inside the kernel. Loops are FULLY UNROLLED
            # here regardless of scan_threshold: inside a Pallas kernel,
            # scalar data reads inline as literals (the hand tile models'
            # bake-constants trick), whereas any scan would either capture
            # its data/init arrays as constants (pallas_call rejects those)
            # or need extensive scan inputs/outputs, which Mosaic's
            # in-kernel scan lowering does not implement (num_extensive).
            # The VMEM envelope this implies (and the rejected
            # alternatives) are documented in tile_model_from_logp.
            t, jac = _eval_target(theta, phi, threshold=None,
                                  scalarize=True)
            return t + jac

        def logp_direct_seq(coords, phi):
            # Forward-mode contract: coordinates arrive as a sequence of
            # scalars so scalar parameters never pass through a jnp.stack
            # (which would instantiate the symbolic-zero tangents — see
            # tile_model_from_logp_fwd).
            t, jac = _eval_target(list(coords), phi, threshold=None,
                                  scalarize=True)
            return t + jac

        if tile_autodiff == "auto":
            # Forward = D sequential jvp passes: right for long recurrences
            # (reverse's reversed chain holds O(T) VJP residuals and walls
            # VMEM at ~40 steps). The round-4 D <= 24 cap is gone (VERDICT
            # r4 #6): the simplifier's cross-pass CSE now folds the D
            # re-traced primal chains to ONE (incl. through call-like
            # wrappers), and each coordinate's tangent chain is pruned to
            # its dependency cone by the sequence-of-scalars contract
            # (constrain_seq keeps rank-1 elementwise-transform parameters
            # as scalar elements, so symbolic-zero tangents survive). A
            # wide-D model where each parameter touches few observations
            # (IRT-style) therefore costs ~primal + a few full chains, not
            # D chains: the D=64/T=120 IRT-AR model traces 167k ops
            # stacked/un-CSE'd vs ~2k with both fixes. A cap of 128 guards
            # trace time (D re-trace passes) for pathological widths —
            # beyond it, reverse or the XLA backend.
            tile_autodiff = (
                "forward"
                if dim <= 128
                and _has_long_recurrence((tp_block, model_block), data_env)
                else "reverse"
            )
        if tile_autodiff == "forward":
            tile_model = tile_model_from_logp_fwd(logp_direct_seq, dim)
        elif tile_autodiff == "reverse":
            tile_model = tile_model_from_logp(logp_direct, dim)
        else:
            raise StanCompileError(
                f"unknown tile_autodiff {tile_autodiff!r}; expected "
                "'auto', 'forward', or 'reverse'"
            )

    return Model(
        name=name,
        dim=dim,
        constrained_dim=constrained_dim,
        param_names=tuple(param_names),
        logprior=logprior,
        loglik=loglik,
        constrain=constrain,
        tile_model=tile_model,
    )


def compile_stan_file(stan_path: str, data: Any = None,
                      name: str | None = None,
                      scan_threshold: int | None = 64,
                      tile: bool = False,
                      tile_autodiff: str = "auto") -> Model:
    """Compile a `.stan` file (the reference's user-facing model asset,
    reference smcnuts/model/bridgestan.py:13-25) into a framework `Model`.

    `data` may be a dict or a path to a Stan data JSON; `phi` in the data
    block is recognized as the tempering parameter and bound at run time.
    """
    with open(stan_path) as f:
        source = f.read()
    if data is None:
        data = {}
    elif isinstance(data, (str, os.PathLike)):
        data = load_stan_data(os.fspath(data))
    if name is None:
        name = os.path.splitext(os.path.basename(stan_path))[0]
    return compile_stan_program(
        source, data, name=name, scan_threshold=scan_threshold, tile=tile,
        tile_autodiff=tile_autodiff,
    )
