"""Stan-language frontend: compile `.stan` + data JSON straight into JAX.

The reference's user-facing model asset is a Stan program compiled by the
external BridgeStan C++ toolchain (reference smcnuts/model/bridgestan.py:18,
README.md:19-23). This package keeps that asset format working with zero
native toolchain: `compile_stan_file("model.stan", data="model.json")`
returns a framework `Model` whose log-density, gradient (via jax.grad), and
constraining transform are traced/compiled by XLA. See compiler.py for the
supported subset and semantics.
"""

from .compiler import (
    StanCompileError,
    compile_stan_file,
    compile_stan_program,
    load_stan_data,
)
from .parser import StanSyntaxError, parse

__all__ = [
    "compile_stan_file",
    "compile_stan_program",
    "load_stan_data",
    "parse",
    "StanCompileError",
    "StanSyntaxError",
]
