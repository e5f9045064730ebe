"""smcnuts_tpu — a TPU-native SMC sampler with NUTS proposals.

A from-scratch JAX/XLA re-design of the capabilities of
UoL-SignalProcessingGroup/SMC-NUTS: Sequential Monte Carlo with No-U-Turn
Sampler proposals, three L-kernel strategies (asymptotic accept-reject,
forwards-proposal, Gaussian approximation to the optimal L-kernel),
ESS-adaptive tempering, and particle-axis sharding over TPU meshes.
"""

__version__ = "0.1.0"

from .config import SMCConfig
from .proposals import DiagNormalProposal, FullNormalProposal
from .sampler import SMCSampler, run_smc

__all__ = [
    "DiagNormalProposal",
    "FullNormalProposal",
    "SMCConfig",
    "SMCSampler",
    "run_smc",
    "__version__",
]
