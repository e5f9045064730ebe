"""Whole-tree Pallas NUTS kernel (TPU-interpret mode on CPU): correctness of
the in-kernel model evaluation, masked tree mechanics, and statistical
agreement with the XLA kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcnuts_tpu.models import make_arma
from smcnuts_tpu.models.arma import _ASSET
from smcnuts_tpu.ops.nuts import nuts_batch
from smcnuts_tpu.ops.nuts_pallas import arma_tile_model, nuts_batch_pallas

POST_MODE = np.array([0.007, 0.957, -0.034, np.log(0.166)])


@pytest.fixture(scope="module")
def setup():
    y = np.load(_ASSET)["y"]
    return arma_tile_model(y), make_arma()


def _particles(n, seed=0, scale=0.02):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, scale, (n, 4)) + POST_MODE, jnp.float32)
    r = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    return x, r


def test_inkernel_model_matches_jax(setup):
    """The cached endpoint log-densities from the kernel must equal the JAX
    model's values at the same points."""
    tm, model = setup
    x, r = _particles(48)
    x1, r1, st = nuts_batch_pallas(
        tm, x, r, seed=0, step_size=0.01, phi=1.0, max_depth=3,
        interpret=True,
    )
    lp0_ref = np.asarray(model.logp_batch(x, 1.0))
    np.testing.assert_allclose(
        np.asarray(st["logp0"]), lp0_ref, rtol=1e-4, atol=1e-3
    )
    lp_ref = np.asarray(model.logp_batch(x1, 1.0))
    np.testing.assert_allclose(
        np.asarray(st["logp_prop"]), lp_ref, rtol=1e-4, atol=1e-3
    )


def test_tempered_inkernel_model(setup):
    tm, model = setup
    x, r = _particles(32, seed=1)
    phi = 0.4
    x1, _, st = nuts_batch_pallas(
        tm, x, r, seed=2, step_size=0.01, phi=phi, max_depth=2,
        interpret=True,
    )
    lp_ref = np.asarray(model.logp_batch(x1, phi))
    np.testing.assert_allclose(
        np.asarray(st["logp_prop"]), lp_ref, rtol=1e-4, atol=1e-3
    )


def test_moves_and_depth(setup):
    tm, _ = setup
    x, r = _particles(64, seed=3)
    x1, _, st = nuts_batch_pallas(
        tm, x, r, seed=4, step_size=0.01, phi=1.0, max_depth=4,
        interpret=True,
    )
    assert np.mean(np.all(np.asarray(x1) != np.asarray(x), axis=1)) > 0.9
    d = np.asarray(st["depth"])
    assert d.max() <= 5 and d.min() >= 1
    assert np.all(np.isfinite(np.asarray(x1)))


def test_padding_lanes_inert(setup):
    """Non-multiple-of-block N: results for real particles must not depend on
    padding, and stats stay finite."""
    tm, _ = setup
    x, r = _particles(10, seed=5)
    x1, r1, st = nuts_batch_pallas(
        tm, x, r, seed=6, step_size=0.01, phi=1.0, max_depth=2,
        interpret=True,
    )
    assert x1.shape == (10, 4)
    assert np.all(np.isfinite(np.asarray(x1)))
    assert np.all(np.isfinite(np.asarray(st["accept_stat"])))


@pytest.mark.parametrize("model_name", ["arma", "prmwcd"])
def test_inkernel_gradients_via_depth0_leapfrog(model_name):
    """With max_depth=0 and the interpret-mode PRNG stub (all-uniforms tiny,
    direction +1, leaf always selected), the tree IS one leapfrog — so the
    output position/momentum check the in-kernel gradients against autodiff
    directly, for both tile models."""
    from smcnuts_tpu.models import get_model

    m = get_model(model_name)
    n, D = 16, m.dim
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 0.3, (n, D)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)
    phi, eps = 0.7, 0.01
    x1, r1, _ = nuts_batch_pallas(
        m.tile_model, x, r, seed=0, step_size=eps, phi=phi, max_depth=0,
        interpret=True,
    )
    vg = jax.vmap(jax.value_and_grad(lambda t: m.logp(t, phi)))
    _, g0 = vg(x)
    r_half = r + 0.5 * eps * g0
    x_exp = x + eps * r_half
    _, g1 = vg(x_exp)
    r_exp = r_half + 0.5 * eps * g1
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x_exp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r_exp), atol=1e-5)


def test_autodiff_tile_models_depth0_leapfrog():
    """elementwise_tile_model (in-kernel jax.vjp gradients): depth-0 trees
    for the eight-schools and Gaussian models must match the hand leapfrog
    with autodiff gradients — validating the generic adapter end to end.
    (Statistical behavior verified on TPU v5e: eightschools posterior
    mu 4.40 / tau 3.69; tempered Gaussian moments match closed form.)"""
    from smcnuts_tpu.models import make_eightschools, make_gaussian

    models = [
        make_eightschools(),
        make_gaussian(
            np.arange(1.0, 6.0), np.ones(5), prior_var=4.0 * np.ones(5)
        ),
    ]
    for m in models:
        n, D = 16, m.dim
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 0.3, (n, D)), jnp.float32)
        r = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)
        phi, eps = 0.7, 0.05
        x1, r1, st = nuts_batch_pallas(
            m.tile_model, x, r, seed=0, step_size=eps, phi=phi, max_depth=0,
            interpret=True,
        )
        vg = jax.vmap(jax.value_and_grad(lambda t: m.logp(t, phi)))
        lp0, g0 = vg(x)
        r_half = r + 0.5 * eps * g0
        x_exp = x + eps * r_half
        _, g1 = vg(x_exp)
        r_exp = r_half + 0.5 * eps * g1
        np.testing.assert_allclose(
            np.asarray(x1), np.asarray(x_exp), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(r1), np.asarray(r_exp), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(st["logp0"]), np.asarray(lp0), rtol=1e-5, atol=1e-5
        )


def test_depth0_leapfrog_with_mass_matrix():
    """Non-identity diagonal inverse mass: the depth-0 tree is one leapfrog
    with drift x += eps * M^{-1} r_half, checked against hand math (same
    semantics as ops/nuts.py:_leapfrog)."""
    from smcnuts_tpu.models import get_model

    m = get_model("arma")
    n, D = 16, m.dim
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 0.3, (n, D)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)
    inv_mass = jnp.asarray([0.5, 2.0, 1.5, 0.25], jnp.float32)
    phi, eps = 1.0, 0.01
    x1, r1, _ = nuts_batch_pallas(
        m.tile_model, x, r, seed=0, step_size=eps, phi=phi,
        inv_mass=inv_mass, max_depth=0, interpret=True,
    )
    vg = jax.vmap(jax.value_and_grad(lambda t: m.logp(t, phi)))
    _, g0 = vg(x)
    r_half = r + 0.5 * eps * g0
    x_exp = x + eps * inv_mass[None, :] * r_half
    _, g1 = vg(x_exp)
    r_exp = r_half + 0.5 * eps * g1
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x_exp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r_exp), atol=1e-5)


def test_vmap_batches_into_multirun_kernel(setup):
    """jax.vmap over (x, r, seed) must hit the custom_vmap rule: one
    flat-packed launch whose per-run VALUES match per-run single calls.

    What interpret mode can validate here: the deterministic tree mechanics
    (packing/unpacking, per-lane parameters, model evaluation) — interpret
    mode's prng_random_bits is a stub that ignores prng_seed, so this says
    NOTHING about seed semantics. Seed sensitivity (every run's seed must
    influence its randomness even when runs share a block) is covered by
    test_batched_seed_sensitivity_on_tpu below on the real chip."""
    tm, model = setup
    B, n = 3, 16
    rng = np.random.default_rng(21)
    xs = jnp.asarray(
        rng.normal(0, 0.02, (B, n, 4)) + POST_MODE, jnp.float32
    )
    rs = jnp.asarray(rng.normal(size=(B, n, 4)), jnp.float32)
    seeds = jnp.asarray([5, 6, 7], jnp.int32)

    f = lambda x, r, s: nuts_batch_pallas(
        tm, x, r, s, 0.01, 1.0, max_depth=2, interpret=True
    )
    xb, rb, stb = jax.vmap(f)(xs, rs, seeds)
    assert xb.shape == (B, n, 4)
    for b in range(B):
        x1, r1, st = f(xs[b], rs[b], seeds[b])
        np.testing.assert_allclose(np.asarray(xb[b]), np.asarray(x1))
        np.testing.assert_allclose(
            np.asarray(stb["logp_prop"][b]), np.asarray(st["logp_prop"])
        )
    # Per-run log-densities must match the model at the returned points.
    lp_ref = np.asarray(jax.vmap(lambda x: model.logp_batch(x, 1.0))(xb))
    np.testing.assert_allclose(
        np.asarray(stb["logp_prop"]), lp_ref, rtol=1e-4, atol=1e-3
    )


def test_vmapped_run_smc_pallas_interpret():
    """vmap(run_smc) on the Gaussian model with the pallas backend in
    interpret mode: per-run moments must be finite and near the target (the
    end-to-end path the batched Monte-Carlo driver uses on TPU)."""
    from smcnuts_tpu import SMCConfig, run_smc
    from smcnuts_tpu.models import make_gaussian
    from smcnuts_tpu.ops import nuts_pallas

    model = make_gaussian(np.array([1.0, -1.0]), np.array([1.0, 0.5]))
    cfg = SMCConfig(
        n_particles=64, n_iterations=4, step_size=0.5, max_tree_depth=3,
        lkernel="forwardsLKernel", save_history=False,
        nuts_backend="pallas",
    )
    # Force interpret mode for the CPU test harness.
    orig = nuts_pallas._nuts_pallas_batched
    import functools

    def patched(tile_model, *a, **kw):
        kw_args = list(a)
        kw_args[-1] = True  # interpret flag is the last positional arg
        return orig(tile_model, *kw_args, **kw)

    nuts_pallas._VMAPPABLE_CACHE.clear()
    nuts_pallas._nuts_pallas_batched = patched
    try:
        res = jax.jit(
            jax.vmap(lambda k: run_smc(model, cfg, k).mean_estimate[-1])
        )(jnp.stack([jax.random.key(i) for i in range(3)]))
    finally:
        nuts_pallas._nuts_pallas_batched = orig
        nuts_pallas._VMAPPABLE_CACHE.clear()
    assert res.shape == (3, 2)
    assert np.all(np.isfinite(np.asarray(res)))


def test_shard_map_multi_device(setup):
    """The whole-tree kernel composes with shard_map over the particle mesh:
    each device runs the kernel on its shard (interpret mode here; the real
    TPU path uses the same program). Validates the mesh-parallel pallas
    backend wiring in sampler._make_step."""
    from jax.sharding import PartitionSpec as P

    from smcnuts_tpu.parallel import particle_mesh, particle_sharding

    tm, model = setup
    mesh = particle_mesh()
    n = jax.device_count() * 16
    x, r = _particles(n, seed=11)
    x = jax.device_put(x, particle_sharding(mesh))
    r = jax.device_put(r, particle_sharding(mesh))

    def body(xx, rr, sd):
        sd = sd + jax.lax.axis_index("particles") * jnp.int32(7919)
        return nuts_batch_pallas(
            tm, xx, rr, sd, 0.01, 1.0, max_depth=2, interpret=True
        )

    stats_spec = {
        k: P("particles")
        for k in ("logp0", "logp_prop", "accept_stat", "depth",
                  "leapfrogs", "delta_h", "ke0", "moved")
    }
    f = jax.jit(
        jax.shard_map(
            body, mesh=mesh.abstract_mesh, check_vma=False,
            in_specs=(P("particles", None), P("particles", None), P()),
            out_specs=(P("particles", None), P("particles", None), stats_spec),
        )
    )
    x1, r1, st = f(x, r, jnp.int32(3))
    assert x1.shape == (n, 4)
    assert len(x1.addressable_shards) == jax.device_count()
    assert np.all(np.isfinite(np.asarray(x1)))
    lp_ref = np.asarray(model.logp_batch(x1, 1.0))
    np.testing.assert_allclose(
        np.asarray(st["logp_prop"]), lp_ref, rtol=1e-4, atol=1e-3
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="RNG statistics need the real chip (interpret-mode PRNG is a "
    "stub); verified on TPU v5e",
)
def test_tempered_gaussian_moments_on_tpu():
    """End-to-end tempered run through the autodiff tile model on device:
    final moments must match the closed-form target within MC error."""
    from smcnuts_tpu import SMCConfig, run_smc
    from smcnuts_tpu.models import make_gaussian

    mean = np.array([1.0, -2.0, 3.0])
    var = np.array([0.5, 2.0, 1.0])
    model = make_gaussian(mean, var, prior_var=np.full(3, 9.0))
    cfg = SMCConfig(
        n_particles=2048, n_iterations=20, step_size=0.5, max_tree_depth=5,
        lkernel="forwardsLKernel", tempering=True, save_history=False,
        nuts_backend="pallas",
    )
    r = jax.jit(lambda k: run_smc(model, cfg, k))(jax.random.key(1))
    got_mean = np.asarray(r.mean_estimate[-1])
    got_var = np.asarray(r.variance_estimate[-1])
    ess = float(r.ess[-1])
    assert ess > 1000
    se = np.sqrt(var / ess)
    np.testing.assert_allclose(got_mean, mean, atol=4 * se.max())
    np.testing.assert_allclose(got_var, var, rtol=0.25)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="RNG statistics need the real chip (interpret-mode PRNG is a "
    "stub); verified on TPU v5e",
)
def test_eightschools_posterior_on_tpu():
    """Eight-schools through the in-kernel autodiff tile model: posterior
    mu ~ 4.4, tau ~ 3.6 (standard values for this data)."""
    from smcnuts_tpu import SMCConfig, run_smc
    from smcnuts_tpu.models import make_eightschools

    model = make_eightschools()
    cfg = SMCConfig(
        n_particles=1024, n_iterations=30, step_size=0.2, max_tree_depth=6,
        lkernel="forwardsLKernel", tempering=True, save_history=False,
        nuts_backend="pallas",
    )
    r = jax.jit(lambda k: run_smc(model, cfg, k))(jax.random.key(0))
    mu, tau = float(r.mean_estimate[-1][0]), float(r.mean_estimate[-1][1])
    assert 3.0 < mu < 6.0
    assert 2.0 < tau < 6.0


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="interpret-mode PRNG ignores prng_seed (stub), so seed semantics "
    "are only observable on device",
)
def test_batched_seed_sensitivity_on_tpu(setup):
    """Flat-packed batched runs: changing ONE run's seed must change that
    run's randomness, including for runs that never start a 1024-lane block
    (the regression fixed per ADVICE r1: blocks used to be seeded from the
    first covered run only, silently ignoring the other runs' seeds)."""
    tm, _ = setup
    B, n = 3, 512  # three 512-particle runs -> runs 1 and 2 share blocks
    rng = np.random.default_rng(17)
    xs = jnp.asarray(
        np.broadcast_to(
            rng.normal(0, 0.02, (1, n, 4)) + POST_MODE, (B, n, 4)
        ),
        jnp.float32,
    )
    rs = jnp.asarray(
        np.broadcast_to(rng.normal(size=(1, n, 4)), (B, n, 4)), jnp.float32
    )

    f = jax.jit(
        jax.vmap(
            lambda x, r, s: nuts_batch_pallas(
                tm, x, r, s, 0.01, 1.0, max_depth=4
            )[0]
        )
    )
    base = np.asarray(f(xs, rs, jnp.asarray([5, 6, 7], jnp.int32)))
    # Change ONLY run 1's seed (a run whose particles start mid-block).
    bump = np.asarray(f(xs, rs, jnp.asarray([5, 999, 7], jnp.int32)))
    assert not np.allclose(base[1], bump[1]), (
        "run 1's seed was ignored by the flat-packed kernel"
    )
    # Identical particle states with DISTINCT seeds must not produce
    # identical randomness across runs.
    assert not np.allclose(base[0], base[1])
    assert not np.allclose(base[1], base[2])


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="the TPU-interpret mode's prng_random_bits is a stub (returns "
    "zeros), so RNG-dependent statistics are only meaningful on device; "
    "verified on TPU v5e: stds agree within noise across seeds "
    "(xla [0.0106,0.0182,0.0380,0.0364] vs pallas [0.0107,0.0185,0.0395,"
    "0.0359], mean depth 3.698 vs 3.699)",
)
def test_statistical_agreement_with_xla(setup):
    """Both kernels, started from the same posterior-typical cloud, must
    produce clouds with matching first/second moments (they implement the
    same transition kernel with different RNG streams)."""
    tm, model = setup
    n = 1024
    x, r = _particles(n, seed=7, scale=0.01)

    x_pal, _, _ = nuts_batch_pallas(
        tm, x, r, seed=8, step_size=0.01, phi=1.0, max_depth=6,
    )
    logp_vg = lambda t: jax.value_and_grad(lambda u: model.logp(u, 1.0))(t)
    keys = jax.random.split(jax.random.key(9), n)
    x_xla, _, _ = nuts_batch(logp_vg, x, r, keys, 0.01, max_depth=6)

    mp, mx = np.asarray(x_pal).mean(0), np.asarray(x_xla).mean(0)
    sp, sx = np.asarray(x_pal).std(0), np.asarray(x_xla).std(0)
    np.testing.assert_allclose(mp, mx, atol=4 * sx.max() / np.sqrt(n))
    np.testing.assert_allclose(sp, sx, rtol=0.35)


def test_cse_jaxpr_folds_duplicates_and_identities():
    """The forward-mode adapter's jaxpr CSE (ops/nuts_pallas._cse_call):
    duplicate chains fold, x-0/x*1 identities drop, values are unchanged."""
    from smcnuts_tpu.ops.nuts_pallas import _cse_call

    def f(x, y):
        a = jnp.exp(x) * y + jnp.sin(x)
        b = jnp.exp(x) * y + jnp.sin(x)  # duplicate of a
        c = (x - 0.0) * 1.0 + 0.0        # identities
        return a + b, c

    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 128)),
                    jnp.float32)
    y = jnp.asarray(0.7, jnp.float32)
    ref = jax.jit(f)(x, y)
    got = jax.jit(lambda x, y: _cse_call(f, x, y))(x, y)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))

    n_plain = len(jax.make_jaxpr(f)(x, y).jaxpr.eqns)
    n_cse = len(
        jax.make_jaxpr(lambda x, y: _cse_call(f, x, y))(x, y).jaxpr.eqns
    )
    assert n_cse < n_plain, (n_cse, n_plain)
    # a == b must have collapsed: only ONE exp survives.
    prims = [
        str(e.primitive)
        for e in jax.make_jaxpr(lambda x, y: _cse_call(f, x, y))(
            x, y
        ).jaxpr.eqns
    ]
    assert prims.count("exp") == 1, prims


def test_generated_fwd_tile_matches_hand_tile():
    """The machine-generated arma tile model (forward-mode jvp through the
    algebraic simplifier, ops/nuts_pallas.arma_tile_model_fwd) must match
    the hand-fused kernel's values and gradients to f32 reassociation
    tolerance — the generated-path regression anchor."""
    from smcnuts_tpu.ops.nuts_pallas import (
        arma_tile_model,
        arma_tile_model_fwd,
    )

    y = np.load(_ASSET)["y"]
    tm_h, tm_g = arma_tile_model(y), arma_tile_model_fwd(y)
    assert tm_g.autodiff == "forward"
    rng = np.random.default_rng(5)
    xt = [
        jnp.asarray(rng.normal(size=(8, 128)) * 0.3, jnp.float32)
        for _ in range(4)
    ]
    phi = jnp.full((8, 128), 0.7, jnp.float32)
    lp_h, g_h = tm_h.tile_fn((), xt, phi)
    lp_g, g_g = tm_g.tile_fn((), xt, phi)
    np.testing.assert_allclose(
        np.asarray(lp_g), np.asarray(lp_h), rtol=2e-5
    )
    for d in range(4):
        np.testing.assert_allclose(
            np.asarray(g_g[d]), np.asarray(g_h[d]), rtol=1e-3, atol=5e-3
        )
