"""ChunkedRunner: chunked == monolithic for the same key; checkpoint/resume
reproduces the uninterrupted run exactly."""

import os

import jax
import numpy as np

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import make_gaussian
from smcnuts_tpu.runner import ChunkedRunner

MEAN = np.array([1.0, -2.0])
VAR = np.array([0.5, 2.0])


def _cfg(**kw):
    base = dict(n_particles=64, n_iterations=9, step_size=0.5)
    base.update(kw)
    return SMCConfig(**base)


def test_chunked_equals_monolithic():
    model = make_gaussian(MEAN, VAR)
    cfg = _cfg()
    key = jax.random.key(0)
    mono = run_smc(model, cfg, key)
    chunked = ChunkedRunner(model, cfg, chunk_size=4).run(key)
    np.testing.assert_allclose(
        np.asarray(chunked.mean_estimate), np.asarray(mono.mean_estimate),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(chunked.x_final), np.asarray(mono.x_final), rtol=1e-6
    )


def test_checkpoint_resume(tmp_path):
    model = make_gaussian(MEAN, VAR)
    cfg = _cfg()
    key = jax.random.key(1)
    ckpt = os.path.join(tmp_path, "smc.npz")

    full = ChunkedRunner(model, cfg, chunk_size=3).run(key)

    # Simulate a crash after the first chunk: run a 3-iteration config with
    # checkpointing, then resume with the full config from the same file.
    partial_cfg = _cfg(n_iterations=3)
    ChunkedRunner(model, partial_cfg, checkpoint_path=ckpt, chunk_size=3).run(key)
    assert os.path.exists(ckpt)

    resumed = ChunkedRunner(model, cfg, checkpoint_path=ckpt, chunk_size=3).run(key)
    np.testing.assert_allclose(
        np.asarray(resumed.mean_estimate), np.asarray(full.mean_estimate),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(resumed.x_final), np.asarray(full.x_final), rtol=1e-5,
        atol=1e-6,
    )


def test_checkpoint_version_mismatch_fails_loudly(tmp_path):
    """A checkpoint from a different serialization version must refuse to
    load instead of silently mis-unflattening the carry."""
    import numpy as _np
    import pytest

    model = make_gaussian(MEAN, VAR)
    cfg = _cfg(n_iterations=3)
    ckpt = os.path.join(tmp_path, "smc.npz")
    ChunkedRunner(model, cfg, checkpoint_path=ckpt, chunk_size=3).run(
        jax.random.key(0)
    )
    data = dict(_np.load(ckpt, allow_pickle=False))
    data["version"] = _np.int64(999)
    _np.savez(ckpt, **data)
    with pytest.raises(ValueError, match="version"):
        ChunkedRunner(model, _cfg(), checkpoint_path=ckpt, chunk_size=3).run(
            jax.random.key(0)
        )


def test_checkpoint_resume_asymptotic(tmp_path):
    """Resume across a chunk boundary with the asymptotic strategy: the
    loglik_hist diagnostic (consumed by the tempered-recycling post-pass)
    must be carried through the checkpoint unharmed."""
    model = make_gaussian(MEAN, VAR, prior_var=np.ones(2))
    cfg = _cfg(lkernel="asymptoticLKernel", tempering=True)
    key = jax.random.key(4)
    ckpt = os.path.join(tmp_path, "smc_asym.npz")

    full = ChunkedRunner(model, cfg, chunk_size=3).run(key)
    ChunkedRunner(
        model, _cfg(n_iterations=3, lkernel="asymptoticLKernel",
                    tempering=True),
        checkpoint_path=ckpt, chunk_size=3,
    ).run(key)
    resumed = ChunkedRunner(
        model, cfg, checkpoint_path=ckpt, chunk_size=3
    ).run(key)
    np.testing.assert_allclose(
        np.asarray(resumed.phi), np.asarray(full.phi), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(resumed.mean_estimate), np.asarray(full.mean_estimate),
        rtol=1e-4, atol=1e-4,
    )


def test_checkpoint_resume_under_mesh(tmp_path):
    """Distributed failure recovery: a particle-sharded run (8-device CPU
    mesh) that crashes between chunks resumes from the checkpoint to the
    same result as an uninterrupted sharded run. This is the multi-host
    elastic-restart story (SURVEY.md §5 'new design territory'): state lives
    in one host-readable npz; on restart the mesh re-shards it."""
    import jax as _jax

    from smcnuts_tpu.parallel import particle_mesh, shard_key

    mesh = particle_mesh()
    model = make_gaussian(MEAN, VAR)
    cfg = _cfg(n_particles=64)
    key = shard_key(_jax.random.key(5), mesh)
    ckpt = os.path.join(tmp_path, "smc_mesh.npz")

    full = ChunkedRunner(model, cfg, chunk_size=3, mesh=mesh).run(key)
    ChunkedRunner(
        model, _cfg(n_particles=64, n_iterations=3),
        checkpoint_path=ckpt, chunk_size=3, mesh=mesh,
    ).run(key)
    resumed = ChunkedRunner(
        model, cfg, checkpoint_path=ckpt, chunk_size=3, mesh=mesh
    ).run(key)
    np.testing.assert_allclose(
        np.asarray(resumed.mean_estimate), np.asarray(full.mean_estimate),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(resumed.x_final), np.asarray(full.x_final), rtol=1e-4,
        atol=1e-5,
    )


def test_chunked_asymptotic_with_history(tmp_path):
    model = make_gaussian(MEAN, VAR, prior_var=np.ones(2))
    cfg = _cfg(lkernel="asymptoticLKernel", tempering=True)
    key = jax.random.key(2)
    mono = run_smc(model, cfg, key)
    chunked = ChunkedRunner(model, cfg, chunk_size=4).run(key)
    np.testing.assert_allclose(
        np.asarray(chunked.phi), np.asarray(mono.phi), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(chunked.mean_estimate), np.asarray(mono.mean_estimate),
        rtol=1e-4, atol=1e-4,
    )
