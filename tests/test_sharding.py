"""Particle-axis sharding tests on the simulated 8-device CPU mesh.

Asserts (a) a sharded run executes with the particle axis genuinely
distributed, (b) sharded == unsharded numerically for the same PRNG key (the
program is deterministic; sharding must not change semantics), and (c) the
collective-backed ops (masked logsumexp, ESS, resampling gather) agree with
their single-device results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import make_gaussian
from smcnuts_tpu.ops import normalise_weights
from smcnuts_tpu.parallel import (
    PARTICLE_AXIS,
    particle_mesh,
    particle_sharding,
    weight_sharding,
)

MEAN = np.array([1.0, -2.0])
VAR = np.array([0.5, 2.0])


@pytest.fixture(scope="module")
def mesh():
    return particle_mesh()


def test_mesh_covers_devices(mesh):
    assert mesh.shape[PARTICLE_AXIS] == jax.device_count()


def test_weight_ops_sharded_equal_unsharded(mesh):
    rng = np.random.default_rng(0)
    logw = jnp.asarray(rng.normal(size=256) * 5, jnp.float32)
    wn_ref, ll_ref = jax.jit(normalise_weights)(logw)
    logw_sharded = jax.device_put(logw, weight_sharding(mesh))
    wn_s, ll_s = jax.jit(normalise_weights)(logw_sharded)
    np.testing.assert_allclose(np.asarray(wn_s), np.asarray(wn_ref), rtol=1e-6)
    np.testing.assert_allclose(float(ll_s), float(ll_ref), rtol=1e-6)


def test_sharded_run_matches_unsharded(mesh):
    model = make_gaussian(MEAN, VAR)
    cfg = SMCConfig(n_particles=128, n_iterations=5, step_size=0.5)
    key = jax.random.key(0)
    res_plain = run_smc(model, cfg, key)
    res_shard = jax.jit(
        lambda k: run_smc(model, cfg, k, mesh=mesh)
    )(key)
    np.testing.assert_allclose(
        np.asarray(res_shard.mean_estimate),
        np.asarray(res_plain.mean_estimate),
        rtol=5e-3, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(res_shard.ess), np.asarray(res_plain.ess), rtol=5e-3
    )


def test_sharded_pallas_backend_run(mesh):
    """End-to-end run_smc with the PALLAS NUTS backend through the sampler's
    shard_map wiring (sampler.py pallas+mesh path) on the 8-device CPU mesh,
    kernel under the TPU-semantics interpreter. This is the production
    multi-chip hot path; previously it was only kernel-level tested.

    Interpret-mode PRNG is a stub (zeros), so assertions are structural:
    the program compiles, executes, moves the particles, keeps everything
    finite, and leaves the final state genuinely distributed."""
    from smcnuts_tpu.models import make_arma

    model = make_arma()
    cfg = SMCConfig(
        n_particles=64, n_iterations=2, step_size=0.01,
        nuts_backend="pallas", max_tree_depth=3, save_history=False,
    )
    res = jax.jit(lambda k: run_smc(model, cfg, k, mesh=mesh))(
        jax.random.key(7)
    )
    x = np.asarray(res.x_final)
    assert np.all(np.isfinite(x))
    assert np.all(np.isfinite(np.asarray(res.mean_estimate)))
    assert len(res.x_final.addressable_shards) == jax.device_count()
    # The NUTS move must have displaced the cloud from its prior draw.
    assert float(np.asarray(res.acceptance_rate)[0]) > 0.0


def test_sharded_final_state_is_distributed(mesh):
    model = make_gaussian(MEAN, VAR)
    cfg = SMCConfig(n_particles=128, n_iterations=3, step_size=0.5)
    res = jax.jit(lambda k: run_smc(model, cfg, k, mesh=mesh))(jax.random.key(1))
    assert len(res.x_final.addressable_shards) == jax.device_count()


def test_gather_across_shards(mesh):
    """Resampling-style global gather under sharding equals local gather."""
    n = 64
    x = jnp.arange(n * 2, dtype=jnp.float32).reshape(n, 2)
    idx = jnp.asarray(np.random.default_rng(2).integers(0, n, n))
    expected = np.asarray(jnp.take(x, idx, axis=0))
    xs = jax.device_put(x, particle_sharding(mesh))
    idxs = jax.device_put(idx, weight_sharding(mesh))
    got = jax.jit(lambda a, i: jnp.take(a, i, axis=0))(xs, idxs)
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_gaussian_lkernel_sharded(mesh):
    """The Gaussian optimal-L approximation's population mean/cov reduce
    across shards (psums under GSPMD); sharded == unsharded numerically."""
    from smcnuts_tpu.ops import gaussian_lkernel_logpdf

    rng = np.random.default_rng(5)
    x_new = jnp.asarray(rng.normal(size=(128, 3)), jnp.float32)
    r_new = jnp.asarray(
        0.4 * np.asarray(x_new) + rng.normal(size=(128, 3)), jnp.float32
    )
    ref = jax.jit(gaussian_lkernel_logpdf)(r_new, x_new)
    xs = jax.device_put(x_new, particle_sharding(mesh))
    rs = jax.device_put(r_new, particle_sharding(mesh))
    got = jax.jit(gaussian_lkernel_logpdf)(rs, xs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_sharded_gaussian_lkernel_run(mesh):
    model = make_gaussian(MEAN, VAR)
    cfg = SMCConfig(
        n_particles=128, n_iterations=4, step_size=0.5,
        lkernel="GaussianApproxLKernel", save_history=False,
    )
    res = jax.jit(lambda k: run_smc(model, cfg, k, mesh=mesh))(jax.random.key(4))
    assert np.all(np.isfinite(np.asarray(res.mean_estimate)))


def test_tempered_sharded_run(mesh):
    model = make_gaussian(MEAN, VAR, prior_var=np.ones(2))
    cfg = SMCConfig(
        n_particles=128, n_iterations=4, step_size=0.5,
        lkernel="asymptoticLKernel", tempering=True,
    )
    res = jax.jit(lambda k: run_smc(model, cfg, k, mesh=mesh))(jax.random.key(3))
    assert np.all(np.isfinite(np.asarray(res.mean_estimate)))
    assert float(res.phi[-1]) == 1.0


def test_map_runs_matches_vmap():
    """Run-axis scale-out (parallel/runs.py): shard_map over the 'runs' mesh
    must produce exactly the per-run results of a plain jax.vmap (independent
    runs, no collectives, same per-run PRNG streams)."""
    from smcnuts_tpu.parallel import map_runs, run_mesh

    model = make_gaussian(MEAN, VAR)
    cfg = SMCConfig(
        n_particles=32, n_iterations=3, step_size=0.5,
        lkernel="forwardsLKernel", save_history=False,
    )

    def one(key):
        r = run_smc(model, cfg, key)
        return r.mean_estimate, r.ess

    n_dev = jax.device_count()
    keys = jnp.stack([jax.random.key(7 * (i + 1)) for i in range(2 * n_dev)])
    ref_mean, ref_ess = jax.jit(jax.vmap(one))(keys)
    got_mean, got_ess = map_runs(one, keys, run_mesh())
    assert len(got_mean.addressable_shards) == n_dev
    np.testing.assert_allclose(
        np.asarray(got_mean), np.asarray(ref_mean), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_ess), np.asarray(ref_ess), rtol=1e-6, atol=1e-6
    )


def test_runs_particles_2d_mesh_matches_unsharded():
    """2-D (runs, particles) mesh (parallel/runs.py map_runs_2d): the run
    batch shards over mesh rows while each run's particle axis shards over
    the columns — per-run results must match plain vmapped runs (same keys,
    GSPMD must not change semantics), with outputs genuinely run-sharded."""
    from smcnuts_tpu.parallel import RUN_AXIS, map_runs_2d, runs_particles_mesh

    mesh2d = runs_particles_mesh(2)
    assert mesh2d.shape[RUN_AXIS] == 2
    assert mesh2d.shape[PARTICLE_AXIS] == jax.device_count() // 2

    model = make_gaussian(MEAN, VAR)
    cfg = SMCConfig(
        n_particles=64, n_iterations=4, step_size=0.5,
        lkernel="forwardsLKernel", tempering=True, save_history=False,
    )

    def one_sharded(key):
        r = run_smc(model, cfg, key, mesh=mesh2d)
        return r.mean_estimate, r.phi

    def one_plain(key):
        r = run_smc(model, cfg, key)
        return r.mean_estimate, r.phi

    keys = jnp.stack([jax.random.key(11 * (i + 1)) for i in range(4)])
    ref_mean, ref_phi = jax.jit(jax.vmap(one_plain))(keys)
    got_mean, got_phi = map_runs_2d(one_sharded, keys, mesh2d)
    # Particle collectives reorder reductions; allow f32 noise only.
    np.testing.assert_allclose(
        np.asarray(got_mean), np.asarray(ref_mean), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_phi), np.asarray(ref_phi), rtol=1e-3, atol=1e-3
    )

    with pytest.raises(ValueError):
        map_runs_2d(one_sharded, keys[:3], mesh2d)


def test_runs_particles_2d_mesh_pallas_backend():
    """The 2-D mesh also carries the Pallas whole-tree backend: the vmap's
    spmd_axis_name binds the run batch to the 'runs' mesh axis, so the
    kernel's shard_map shards runs over mesh rows (no replicated compute).
    Interpret-mode kernel off-TPU; values finite and run-sharded."""
    from smcnuts_tpu.models import get_model
    from smcnuts_tpu.parallel import map_runs_2d, runs_particles_mesh

    mesh2d = runs_particles_mesh(2)
    model = get_model("arma")
    cfg = SMCConfig(
        n_particles=64, n_iterations=2, step_size=0.01,
        nuts_backend="pallas", max_tree_depth=3, save_history=False,
    )
    keys = jnp.stack([jax.random.key(3 * (i + 1)) for i in range(4)])
    out = map_runs_2d(
        lambda k: run_smc(model, cfg, k, mesh=mesh2d).mean_estimate,
        keys, mesh2d,
    )
    assert out.shape == (4, 3, 4)
    assert np.all(np.isfinite(np.asarray(out)))
    assert len(out.addressable_shards) == jax.device_count()


def test_sharded_adaptation_matches_unsharded(mesh):
    """Adaptation under the particle mesh (BASELINE.json stretch config,
    VERDICT r4 #5b): the dual-averaging update consumes the population-mean
    accept statistic and the mass matrix consumes the weighted particle
    variance — both reductions over the SHARDED particle axis, psum'd by
    GSPMD. The adapted step-size trajectory and moments must match the
    unsharded run."""
    model = make_gaussian(MEAN, VAR, prior_var=np.ones(2))
    cfg = SMCConfig(
        n_particles=256, n_iterations=6, step_size=0.05,
        adapt_step_size=True, adapt_mass_matrix=True, target_accept=0.8,
        tempering=True, max_tree_depth=4, save_history=False,
    )
    key = jax.random.key(13)
    res_p = jax.jit(lambda k: run_smc(model, cfg, k))(key)
    res_s = jax.jit(lambda k: run_smc(model, cfg, k, mesh=mesh))(key)
    # psum reordering perturbs the accept-stat mean at f32 epsilon and dual
    # averaging amplifies it by sqrt(t)/gamma (~60 here) before exp() — so
    # "identical up to collective-reduction noise" is ~1e-3 relative, not 1e-5.
    np.testing.assert_allclose(
        np.asarray(res_s.step_size), np.asarray(res_p.step_size), rtol=5e-3
    )
    # Once the step size differs at all, NUTS's discrete tree decisions
    # bifurcate individual trajectories — moments agree only to MC noise.
    np.testing.assert_allclose(
        np.asarray(res_s.mean_estimate), np.asarray(res_p.mean_estimate),
        rtol=0, atol=0.1,
    )
    # It genuinely adapted (not a frozen no-op) and stayed sharded.
    assert float(np.asarray(res_s.step_size)[-1]) != cfg.step_size
    assert len(res_s.x_final.addressable_shards) == jax.device_count()


def test_chunked_runner_large_n_sharded_resume(mesh, tmp_path):
    """Large-N stretch evidence (VERDICT r4 #5c): a ChunkedRunner run at
    N = 1,048,576 particles sharded over the 8-device CPU mesh, interrupted
    mid-run and resumed from the checkpoint — bit-identical to the
    uninterrupted sharded run."""
    import os

    from smcnuts_tpu.runner import ChunkedRunner

    model = make_gaussian(MEAN, VAR, prior_var=np.ones(2))
    cfg = SMCConfig(
        n_particles=1 << 20, n_iterations=4, step_size=0.5,
        lkernel="forwardsLKernel", max_tree_depth=2, save_history=False,
    )
    ckpt = os.path.join(tmp_path, "large_n.npz")

    class _Stop(Exception):
        pass

    def interrupt(k_done, total):
        if k_done == 2:
            raise _Stop()

    runner = ChunkedRunner(model, cfg, checkpoint_path=ckpt, chunk_size=2,
                           mesh=mesh)
    with pytest.raises(_Stop):
        runner.run(jax.random.key(17), progress=interrupt)
    assert os.path.exists(ckpt)
    resumed = ChunkedRunner(
        model, cfg, checkpoint_path=ckpt, chunk_size=2, mesh=mesh
    ).run(jax.random.key(17))
    clean = ChunkedRunner(model, cfg, chunk_size=2, mesh=mesh).run(
        jax.random.key(17)
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.mean_estimate), np.asarray(clean.mean_estimate)
    )
    assert resumed.x_final.shape == (1 << 20, 2)
    assert len(resumed.x_final.addressable_shards) == jax.device_count()
