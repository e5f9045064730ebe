"""JAX-native target models (the reference's BridgeStan boundary, re-designed).

Each model is a set of pure jittable functions logprior/loglik/constrain over
unconstrained parameters; logp(theta, phi) = logprior + phi*loglik. See
base.Model.
"""

from .arma import make_arma
from .base import Model, make_logp_vg
from .eightschools import make_eightschools
from .gaussian import make_gaussian, tempered_moments
from .logistic import make_logistic
from .prmwcd import make_prmwcd

_REGISTRY = {
    "arma": make_arma,
    "prmwcd": make_prmwcd,
    "PRMwCD": make_prmwcd,
    "eightschools": make_eightschools,
    "logistic": make_logistic,
}


def get_model(name: str, **kwargs) -> Model:
    """Look up a model by name (reference model_name strings accepted)."""
    if name not in _REGISTRY:
        raise KeyError(f"Unknown model '{name}'. Available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


__all__ = [
    "Model",
    "make_logp_vg",
    "make_arma",
    "make_prmwcd",
    "make_eightschools",
    "make_gaussian",
    "make_logistic",
    "tempered_moments",
    "get_model",
]
