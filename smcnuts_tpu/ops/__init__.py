"""Pure SMC/NUTS compute kernels (the hot path)."""

from .lkernels import forward_lkernel_logpdf, gaussian_lkernel_logpdf
from .moments import estimate, estimate_unconstrained, weighted_moments
from .nuts import (
    MAX_TREE_DEPTH,
    hmc_accept_reject,
    nuts_batch,
    nuts_single,
)
from .resampling import (
    multinomial_ancestors,
    resample_if_required,
    systematic_ancestors,
)
from .tempering import ess_at_phi, next_temperature
from .weights import ess, normalise_weights

__all__ = [
    "MAX_TREE_DEPTH",
    "ess",
    "ess_at_phi",
    "estimate",
    "estimate_unconstrained",
    "forward_lkernel_logpdf",
    "gaussian_lkernel_logpdf",
    "hmc_accept_reject",
    "multinomial_ancestors",
    "next_temperature",
    "normalise_weights",
    "nuts_batch",
    "nuts_single",
    "resample_if_required",
    "systematic_ancestors",
    "weighted_moments",
]
