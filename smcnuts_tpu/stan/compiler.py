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
- `constrain` maps theta to [parameters; transformed parameters], mirroring
  bridgestan.py:93-120; `generated quantities` are not evaluated (they may
  consume RNG; the reference's estimates only ever use parameters and
  transformed parameters for the shipped models).

Loops are unrolled in Python (bounds are data-derived Python ints), so data
indexing folds to constants at trace time — idiomatic for XLA, which wants
static shapes and straight-line code. Models with very long recurrences
compile slower than a hand-written `lax.scan`/`associative_scan` equivalent
(see models/arma.py for the hand-tuned version of the same density); the
frontend trades peak compile speed for zero-toolchain generality.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import Model
from .math import DISTRIBUTIONS, FUNCTIONS
from .parser import (
    Assign,
    Bin,
    Call,
    Decl,
    For,
    If,
    Index,
    Num,
    Program,
    Sampling,
    StanSyntaxError,
    TargetPlus,
    Ternary,
    Unary,
    Var,
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
    """Collapse a _LocalArray to a jnp array; pass scalars/arrays through."""
    return v.as_array() if isinstance(v, _LocalArray) else v


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


# ------------------------------------------------------------- interpreter


class _Interp:
    def __init__(self, env):
        self.env = env  # name -> value
        self.target = jnp.asarray(0.0, dtype=float)

    # -- expressions --
    def ev(self, node):
        if isinstance(node, Num):
            return node.value
        if isinstance(node, Var):
            if node.name not in self.env:
                raise StanCompileError(f"undefined variable {node.name!r}")
            return self.env[node.name]
        if isinstance(node, Unary):
            v = self.ev(node.operand)
            if node.op == "-":
                return -_as_value(v)
            if node.op == "+":
                return _as_value(v)
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
            idxs = [self.ev(i) for i in node.indices]
            if isinstance(base, _LocalArray):
                return base.get([_require_int(i, "index") for i in idxs])
            # numpy / jnp container: concrete 1-based indices
            out = base
            for i in idxs:
                out = out[_require_int(i, "index") - 1]
            return out
        if isinstance(node, Call):
            return self._call(node)
        raise StanCompileError(f"cannot evaluate node {node!r}")

    def _binop(self, node: Bin):
        op = node.op
        lv = self.ev(node.left)
        rv = self.ev(node.right)
        both_int = isinstance(lv, (int, np.integer)) and isinstance(
            rv, (int, np.integer)
        )
        l, r = _as_value(lv), _as_value(rv)
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op in ("*", ".*"):
            return l * r
        if op in ("/", "./"):
            if both_int:
                return int(l / r)  # Stan int division truncates toward zero
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

    def _call(self, node: Call):
        name = node.name
        args = [_as_value(self.ev(a)) for a in node.args]
        for suffix in ("_lpdf", "_lpmf", "_lupdf", "_lupmf"):
            if name.endswith(suffix):
                dist = name[: -len(suffix)]
                if dist not in DISTRIBUTIONS:
                    raise StanCompileError(
                        f"unsupported distribution {dist!r}"
                    )
                return DISTRIBUTIONS[dist](*args)
        if name in FUNCTIONS:
            return FUNCTIONS[name](*args)
        if name in ("num_elements", "size", "rows", "cols", "dims"):
            arr = args[0]
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
            lhs = _as_value(self.ev(s.lhs))
            args = [_as_value(self.ev(a)) for a in s.args]
            self.target = self.target + DISTRIBUTIONS[dist](lhs, *args)
        elif isinstance(s, For):
            lo = _require_int(self.ev(s.lo), f"line {s.line}: loop bound")
            hi = _require_int(self.ev(s.hi), f"line {s.line}: loop bound")
            shadowed = self.env.get(s.var)
            for i in range(lo, hi + 1):
                self.env[s.var] = i
                self.run(s.body)
            if shadowed is not None:
                self.env[s.var] = shadowed
            else:
                self.env.pop(s.var, None)
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
        if s.init is not None:
            val = self.ev(s.init)
            self.env[s.name] = val
        elif dims:
            self.env[s.name] = _LocalArray(dims)
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
        # indexed assignment: resolve base container
        base_node, idx_nodes = s.lvalue.base, s.lvalue.indices
        if not isinstance(base_node, Var):
            raise StanCompileError("chained-index assignment unsupported")
        container = self.env.get(base_node.name)
        idxs = [
            _require_int(self.ev(i), "assignment index") for i in idx_nodes
        ]
        if not isinstance(container, _LocalArray):
            raise StanCompileError(
                f"indexed assignment into non-local {base_node.name!r}"
            )
        container.set(idxs, val)


# ------------------------------------------------------------ param packing


class _ParamSpec:
    """Unconstrained packing + constraining transform for one parameter."""

    def __init__(self, decl: Decl, sizes, lower, upper):
        self.name = decl.name
        self.sizes = tuple(sizes)  # () for scalar
        self.count = int(np.prod(sizes)) if sizes else 1
        self.lower = lower
        self.upper = upper

    def constrain(self, u):
        """u: (count,) slice of theta → (constrained values, log-Jacobian)."""
        if self.lower is not None and self.upper is not None:
            span = self.upper - self.lower
            c = self.lower + span * jax.nn.sigmoid(u)
            jac = jnp.sum(
                jnp.log(span) + jax.nn.log_sigmoid(u) + jax.nn.log_sigmoid(-u)
            )
        elif self.lower is not None:
            c = self.lower + jnp.exp(u)
            jac = jnp.sum(u)
        elif self.upper is not None:
            c = self.upper - jnp.exp(u)
            jac = jnp.sum(u)
        else:
            c, jac = u, jnp.asarray(0.0, dtype=u.dtype)
        if not self.sizes:
            return c[0], jac
        return c.reshape(self.sizes), jac

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
    env = {}
    has_phi = False
    for decl in prog.blocks.get("data", []):
        if not isinstance(decl, Decl):
            raise StanCompileError("only declarations allowed in data block")
        if decl.name == "phi":
            has_phi = True
            continue  # bound per-evaluation as the tempering argument
        if decl.name not in data:
            raise StanCompileError(f"data variable {decl.name!r} missing")
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


def compile_stan_program(source: str, data: dict, name: str = "stan") -> Model:
    """Compile Stan source + data dict into a framework `Model`."""
    prog = parse(source)
    if "parameters" not in prog.blocks:
        raise StanCompileError("program has no parameters block")
    if "generated quantities" in prog.blocks:
        # Documented omission: gq may consume RNG; not part of logp.
        pass

    data_env, has_phi = _build_data_env(prog, data)

    # Parameter specs (constraint bound exprs may reference data).
    spec_interp = _Interp(dict(data_env))
    specs = []
    for decl in prog.blocks["parameters"]:
        if not isinstance(decl, Decl):
            raise StanCompileError(
                "only declarations allowed in parameters block"
            )
        sizes = [
            _require_int(spec_interp.ev(d), "parameter dimension")
            for d in decl.dims
        ]
        lower = upper = None
        if decl.constraint is not None:
            if decl.constraint.lower is not None:
                lower = float(spec_interp.ev(decl.constraint.lower))
            if decl.constraint.upper is not None:
                upper = float(spec_interp.ev(decl.constraint.upper))
        specs.append(_ParamSpec(decl, sizes, lower, upper))
    dim = sum(s.count for s in specs)

    tp_block = prog.blocks.get("transformed parameters", [])
    model_block = prog.blocks.get("model", [])

    def _unpack(theta):
        """theta (dim,) → (param env, total log-Jacobian)."""
        env = {}
        jac = jnp.asarray(0.0, dtype=float)
        off = 0
        for s in specs:
            c, j = s.constrain(theta[off : off + s.count])
            env[s.name] = c
            jac = jac + j
            off += s.count
        return env, jac

    def _eval_target(theta, phi):
        env = dict(data_env)
        penv, jac = _unpack(theta)
        env.update(penv)
        if has_phi:
            env["phi"] = phi
        interp = _Interp(env)
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

    def constrain(theta):
        penv, _ = _unpack(theta)
        parts = []
        for s in specs:
            v = jnp.asarray(penv[s.name], dtype=float)
            parts.append(v.reshape(-1) if v.ndim else v[None])
        if tp_block:
            env = dict(data_env)
            env.update(penv)
            if has_phi:
                env["phi"] = jnp.asarray(1.0, dtype=float)
            interp = _Interp(env)
            interp.run(tp_block)
            for stmt in tp_block:
                if isinstance(stmt, Decl):
                    v = jnp.asarray(
                        _as_value(interp.env[stmt.name]), dtype=float
                    )
                    parts.append(v.reshape(-1) if v.ndim else v[None])
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
    tp_probe = jax.eval_shape(constrain, jax.ShapeDtypeStruct((dim,),
                                                              jnp.float32))
    constrained_dim = int(tp_probe.shape[0])
    # names for transformed parameters beyond the base params
    for i in range(constrained_dim - len(param_names)):
        param_names.append(f"tp.{i + 1}")

    return Model(
        name=name,
        dim=dim,
        constrained_dim=constrained_dim,
        param_names=tuple(param_names),
        logprior=logprior,
        loglik=loglik,
        constrain=constrain,
    )


def compile_stan_file(stan_path: str, data: Any = None,
                      name: str | None = None) -> Model:
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
    return compile_stan_program(source, data, name=name)
