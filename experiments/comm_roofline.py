"""Communication roofline for the multi-chip scaling claim (VERDICT r3 #7).

Compiles the FULL sharded SMC iteration (run_smc with a particle mesh) on
the 8-device CPU simulator at two particle counts, extracts every
collective op (all-reduce / all-gather / all-to-all / collective-permute /
reduce-scatter) from the post-SPMD-partitioning HLO with its shape, and
reports per-iteration collective bytes. Scaling in N between the two sizes
separates O(N) collectives (resampling ancestor exchange) from O(1) ones
(weight/ESS/moment psums), giving the projection to the production shape:

    comm_time(N, devices) ~ bytes_O(N)/N_ref * N / ici_bw + latency terms
    leaf_time(N) ~ (N/1024 blocks) * leaves/iter * leaf_us / devices

The verdict is the ratio at pod-slice bandwidth (v5e ICI ~45 GB/s/link
usable per direction; the sum below rides at least one link).

Usage (CPU):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python experiments/comm_roofline.py
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

_DTYPE_BYTES = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1,
                "bf16": 2, "s64": 8, "u64": 8, "f16": 2, "s8": 1, "u8": 1}

_COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
                "collective-permute", "reduce-scatter")


def _shape_bytes(shape_str):
    """'f32[8192,4]' -> bytes; tuple shapes '(f32[..], ...)' sum."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text):
    """Sum output bytes of every collective op instance in an HLO module,
    keyed by op kind. (Fusion computations cannot contain collectives, so
    scanning instruction lines suffices; while-loop bodies appear once —
    per-iteration cost is per executed trip, which for the K-scan means
    per SMC iteration.)"""
    out = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(
            r"%?\S+\s*=\s*((?:\([^)]*\))|(?:\S+))\s+"
            r"(all-reduce|all-gather|all-to-all|collective-permute|"
            r"reduce-scatter)",
            line,
        )
        if not m:
            continue
        shape, kind = m.group(1), m.group(2)
        out.setdefault(kind, {"count": 0, "bytes": 0})
        out[kind]["count"] += 1
        out[kind]["bytes"] += _shape_bytes(shape)
    return out


def analyze(n_particles, devices=8):
    from smcnuts_tpu import SMCConfig, run_smc
    from smcnuts_tpu.models import get_model
    from smcnuts_tpu.parallel import particle_mesh

    model = get_model("arma")
    cfg = SMCConfig(
        n_particles=n_particles, n_iterations=1, step_size=0.01,
        save_history=False,
    )
    mesh = particle_mesh()
    fn = jax.jit(lambda k: run_smc(model, cfg, k, mesh=mesh).ess)
    compiled = fn.lower(jax.random.key(0)).compile()
    text = compiled.as_text()
    cb = collective_bytes(text)
    return cb


def resample_rate(n=512, k=60):
    """Empirical fraction of iterations that trigger resampling (arma
    forwards-L-kernel equilibrium) — the O(N) collectives all live in the
    resample branch (lax.cond under a mesh, see ops/resampling.py), so the
    amortized comm is rate-weighted."""
    from smcnuts_tpu import SMCConfig, run_smc
    from smcnuts_tpu.models import get_model

    cfg = SMCConfig(n_particles=n, n_iterations=k, step_size=0.01,
                    save_history=False)
    res = jax.jit(lambda key: run_smc(get_model("arma"), cfg, key))(
        jax.random.key(3)
    )
    return float(np.asarray(res.resampled[1:]).mean())


def main():
    assert jax.device_count() >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu"
    )
    sizes = (8192, 65536)
    rows = {}
    for n in sizes:
        cb = analyze(n)
        rows[n] = cb
        print(json.dumps({"N": n, "collectives": cb}), flush=True)

    total = {n: sum(v["bytes"] for v in rows[n].values()) for n in sizes}
    # O(N) vs O(1) split from the two sizes: b(N) = a*N + c
    a = (total[sizes[1]] - total[sizes[0]]) / (sizes[1] - sizes[0])
    c = total[sizes[0]] - a * sizes[0]

    rate = resample_rate()
    print(json.dumps({"resample_rate": rate}), flush=True)

    # Projection at the production shape. The O(N) collectives (resampling
    # ancestor exchange: cdf/x/logw all-gathers + the cumsum permutes) sit
    # inside the resample lax.cond, so they are paid only on triggering
    # iterations; the O(1) psums (weight normalize, ESS, moments,
    # tempering objective) are per-iteration.
    n_prod = 1_048_576
    devices = 8
    ici_bw = 45e9  # v5e per-link usable ~45 GB/s per direction
    bytes_every = a * n_prod + c
    bytes_amort = a * n_prod * rate + c
    comm_s = bytes_amort / ici_bw
    comm_s_worst = bytes_every / ici_bw
    # leaf compute: blocks * executed leaves * leaf time / devices
    leaves_per_iter = 55  # measured block-max average, arma equilibrium
    leaf_us = 1.005
    compute_s = (n_prod / 1024) * leaves_per_iter * leaf_us * 1e-6 / devices
    out = {
        "sizes": list(sizes),
        "per_size_collectives": rows,
        "bytes_per_iter_linear_coeff": a,
        "bytes_per_iter_const": c,
        "resample_rate": rate,
        "projection": {
            "N": n_prod,
            "devices": devices,
            "collective_bytes_per_iter_amortized": bytes_amort,
            "collective_bytes_per_iter_every_iter": bytes_every,
            "ici_bw_assumed_B_per_s": ici_bw,
            "comm_s_per_iter": comm_s,
            "comm_s_per_iter_worst_case": comm_s_worst,
            "leaf_compute_s_per_iter": compute_s,
            "comm_fraction": comm_s / (comm_s + compute_s),
            "comm_fraction_worst_case": comm_s_worst / (
                comm_s_worst + compute_s
            ),
        },
    }
    print(json.dumps(out, indent=1))
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "output",
        "comm_roofline.json",
    )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
