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

from .timing import fresh_key, materialize


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf.

    Works on directly-attached TPU hosts. On relay-attached chips (the
    `axon` transport) the profiler service is unreachable and this HANGS —
    use the marginal-timing tools (experiments/bench_kernel.py /
    bench_epilogue.py, built on utils/timing) there instead."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _time_fn(fn, *args, repeats=3):
    """Best-of-repeats wall time to HOST MATERIALIZATION of fn(*args).
    block_until_ready does not synchronize on relay transports (see
    utils/timing.py); note repeated identical args can still be served from
    the relay memo-cache — prefer _time_scanned for kernel timing."""
    materialize(fn(*args))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        materialize(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _time_scanned(body, carry0, iters, repeats=3):
    """Per-iteration time of `body`, amortized over an `iters`-step lax.scan
    inside ONE dispatch — robust against per-dispatch transport latency
    (which on relay-attached chips can exceed the kernel time itself). The
    scan consumes a fresh fold_in key per step so no work can be elided;
    the top-level key comes from os.urandom per repetition so no dispatch
    can be transport-memoized (not even across processes), and each timed
    dispatch is synchronized by host materialization of the carry."""

    def run(key):
        def step(c, k):
            return body(c, jax.random.fold_in(key, k)), ()

        c, _ = jax.lax.scan(step, carry0, jnp.arange(iters))
        return c

    f = jax.jit(run)
    materialize(f(fresh_key()))
    best = float("inf")
    for _ in range(repeats):
        key = fresh_key()
        t0 = time.perf_counter()
        materialize(f(key))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def phase_timings(model, cfg, key=None, repeats=3, iters=200):
    """Return {phase: seconds-per-iteration} for the SMC sub-kernels, each
    measured as an `iters`-step scan in one dispatch.

    Resolution is bounded by the dispatch-floor jitter divided by `iters`
    (on a relay-attached chip, ~25 ms / iters): phases cheaper than that
    report 0.0. Raise `iters` for finer resolution at the cost of compile
    time."""
    from ..ops.lkernels import gaussian_lkernel_logpdf
    from ..ops.nuts import nuts_batch
    from ..ops.resampling import resample_if_required
    from ..ops.tempering import next_temperature
    from ..ops.weights import ess as compute_ess
    from ..ops.weights import normalise_weights

    key = key if key is not None else jax.random.key(0)
    n, d = cfg.n_particles, model.dim
    kx, kr, kn = jax.random.split(key, 3)
    x = jax.random.normal(kx, (n, d))
    r = jax.random.normal(kr, (n, d))
    logw = model.logp_batch(x, 1.0)
    step_size = jnp.asarray(cfg.step_size)

    logp_vg = lambda t: jax.value_and_grad(lambda u: model.logp(u, 1.0))(t)

    # Dispatch floor: a near-empty scan of the same length. Its per-iteration
    # share (transport round-trip / iters) is subtracted from every phase.
    floor = _time_scanned(
        lambda c, k: c * 0.9999, jnp.ones(()), iters, repeats=repeats
    )

    timings = {"dispatch_floor": floor}

    if model.tile_model is not None and jax.default_backend() == "tpu":
        from ..ops.nuts_pallas import nuts_batch_pallas

        def nuts_pallas_body(c, k):
            xx, rr = c
            seed = jax.random.randint(k, (), 0, 2**31 - 1, dtype=jnp.int32)
            x1, r1, _ = nuts_batch_pallas(
                model.tile_model, xx, rr, seed, step_size,
                max_depth=cfg.max_tree_depth,
            )
            return (x1, rr)

        timings["propose_nuts_pallas"] = _time_scanned(
            nuts_pallas_body, (x, r), iters, repeats=repeats
        )

    def nuts_xla_body(c, k):
        xx, rr = c
        x1, r1, _ = nuts_batch(
            logp_vg, xx, rr, jax.random.split(k, n), step_size,
            max_depth=cfg.max_tree_depth,
        )
        return (x1, rr)

    timings["propose_nuts_xla"] = _time_scanned(
        nuts_xla_body, (x, r), iters, repeats=repeats
    )

    def norm_resample_body(c, k):
        lw, xx = c
        wn, ll = normalise_weights(lw)
        e = compute_ess(wn)
        xo, lwo, _ = resample_if_required(
            k, xx, lw, wn, ll, e, cfg.ess_threshold_frac, cfg.resampling
        )
        return (lwo * 0.999, xo)

    timings["normalise_resample"] = _time_scanned(
        norm_resample_body, (logw, x), iters, repeats=repeats
    )

    def reweight_body(c, k):
        xx = c
        lp = model.logp_batch(xx, 1.0)
        return xx + 1e-12 * lp[:, None]

    timings["reweight_target_evals"] = _time_scanned(
        reweight_body, x, iters, repeats=repeats
    )

    def lkernel_body(c, k):
        rr, xx = c
        lk = gaussian_lkernel_logpdf(rr, xx)
        return (rr + 1e-12 * lk[:, None], xx)

    timings["gaussian_lkernel"] = _time_scanned(
        lkernel_body, (r, x), iters, repeats=repeats
    )

    def temper_body(c, k):
        ll = c
        phi = next_temperature(ll, 0.0, n)
        return ll * (1.0 + 1e-12 * phi)

    timings["temper_bisect"] = _time_scanned(
        temper_body, model.loglik_batch(x), iters, repeats=repeats
    )
    return {
        k: (max(v - floor, 0.0) if k != "dispatch_floor" else v)
        for k, v in timings.items()
    }
