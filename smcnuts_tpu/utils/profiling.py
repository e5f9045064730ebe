"""Profiling and observability helpers.

The reference's only timing is a wall-clock around the whole run (reference
smc_sampler.py:106,:155). Here: jax.profiler trace capture for TensorBoard,
and a per-phase breakdown that times the SMC sub-kernels (propose / reweight /
normalise+resample / temper) as separately jitted programs on representative
state — the phase split the reference cannot observe at all.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _time_fn(fn, *args, repeats=3):
    jax.block_until_ready(fn(*args))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def phase_timings(model, cfg, key=None, repeats=3):
    """Return {phase: seconds} for one SMC iteration's sub-kernels."""
    from ..ops.lkernels import gaussian_lkernel_logpdf
    from ..ops.nuts import nuts_batch
    from ..ops.resampling import resample_if_required
    from ..ops.tempering import next_temperature
    from ..ops.weights import ess as compute_ess
    from ..ops.weights import normalise_weights

    key = key if key is not None else jax.random.key(0)
    n, d = cfg.n_particles, model.dim
    kx, kr, kn, kres = jax.random.split(key, 4)
    x = jax.random.normal(kx, (n, d))
    r = jax.random.normal(kr, (n, d))
    logw = model.logp_batch(x, 1.0)
    nuts_keys = jax.random.split(kn, n)
    step_size = jnp.asarray(cfg.step_size)

    logp_vg = lambda t: jax.value_and_grad(lambda u: model.logp(u, 1.0))(t)

    timings = {}
    timings["propose_nuts"] = _time_fn(
        jax.jit(
            lambda xx, rr, kk: nuts_batch(
                logp_vg, xx, rr, kk, step_size, max_depth=cfg.max_tree_depth
            )
        ),
        x, r, nuts_keys, repeats=repeats,
    )

    def norm_resample(lw, xx, kk):
        wn, ll = normalise_weights(lw)
        e = compute_ess(wn)
        return resample_if_required(
            kk, xx, lw, wn, ll, e, cfg.ess_threshold_frac, cfg.resampling
        )

    timings["normalise_resample"] = _time_fn(
        jax.jit(norm_resample), logw, x, kres, repeats=repeats
    )

    timings["reweight_target_evals"] = _time_fn(
        jax.jit(lambda xx: model.logp_batch(xx, 1.0)), x, repeats=repeats
    )

    timings["gaussian_lkernel"] = _time_fn(
        jax.jit(gaussian_lkernel_logpdf), r, x, repeats=repeats
    )

    timings["temper_bisect"] = _time_fn(
        jax.jit(lambda ll: next_temperature(ll, 0.0, n)),
        model.loglik_batch(x), repeats=repeats,
    )
    return timings
