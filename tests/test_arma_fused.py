"""Fused arma value+gradient kernel: closed-form forward-mode and Pallas
(interpret mode) vs the autodiff oracle, plus the custom_vmap wiring into the
NUTS hot loop."""

import jax
import jax.numpy as jnp
import numpy as np

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import make_arma
from smcnuts_tpu.models.arma import _ASSET
from smcnuts_tpu.ops.arma_fused import (
    arma_ll_vg_pallas,
    arma_ll_vg_scan,
    make_arma_loglik_vg,
)


def _y():
    return jnp.asarray(np.load(_ASSET)["y"], jnp.float32)


def _theta(n=29, scale=0.3, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(0, scale, (n, 4)), jnp.float32
    )


def test_scan_matches_autodiff():
    model = make_arma()
    y, theta = _y(), _theta()
    ll_ref, g_ref = jax.vmap(jax.value_and_grad(model.loglik))(theta)
    ll, g = arma_ll_vg_scan(theta, y)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=2e-3, atol=1e-2
    )


def test_pallas_interpret_matches_scan():
    y, theta = _y(), _theta(n=100)
    ll_s, g_s = arma_ll_vg_scan(theta, y)
    ll_p, g_p = arma_ll_vg_pallas(theta, y, interpret=True)
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_s), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_s), rtol=1e-3, atol=1e-3
    )


def test_pallas_padding():
    """N not a multiple of the block size exercises the padding path."""
    y = _y()
    for n in (1, 7, 1025):
        theta = _theta(n=n, seed=n)
        ll_s, g_s = arma_ll_vg_scan(theta, y)
        ll_p, g_p = arma_ll_vg_pallas(theta, y, interpret=True)
        assert ll_p.shape == (n,) and g_p.shape == (n, 4)
        np.testing.assert_allclose(
            np.asarray(ll_p), np.asarray(ll_s), rtol=1e-4
        )


def test_custom_vmap_single_and_batch():
    y, theta = _y(), _theta(n=11)
    f = make_arma_loglik_vg(y, backend="scan")
    ll_b, g_b = jax.vmap(f)(theta)
    ll_s, g_s = arma_ll_vg_scan(theta, y)
    np.testing.assert_allclose(np.asarray(ll_b), np.asarray(ll_s), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_s), rtol=1e-6)
    l1, g1 = f(theta[3])
    np.testing.assert_allclose(float(l1), float(ll_s[3]), rtol=1e-6)


def test_fused_model_end_to_end_matches_plain():
    cfg = SMCConfig(
        n_particles=64, n_iterations=4, step_size=0.01, save_history=False,
        max_tree_depth=6,
    )
    r_plain = run_smc(make_arma(), cfg, jax.random.key(0))
    r_fused = run_smc(make_arma(fused="scan"), cfg, jax.random.key(0))
    np.testing.assert_allclose(
        np.asarray(r_fused.mean_estimate),
        np.asarray(r_plain.mean_estimate),
        rtol=1e-3, atol=1e-4,
    )
