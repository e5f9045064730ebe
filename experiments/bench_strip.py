"""Microbench: is the arma tile kernel latency-bound on its serial
recurrence chain? Compares the production arma tile model against k-way
strip-mined variants (the linear recurrences err/emu/eb/eth unrolled so k
independent chains advance in parallel, halving/thirding the dependent-FMA
critical path at slightly higher instruction count).

Usage: python experiments/bench_strip.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from smcnuts_tpu.models import get_model
from smcnuts_tpu.ops.nuts_pallas import (
    LOG_SQRT_2PI,
    _LOG_PI,
    TileModel,
)


def arma_tile_strip2(y) -> TileModel:
    """2-way strip-mined ARMA(1,1) tile model: identical math to
    arma_tile_model (associative regrouping only), with the four serial
    chains unrolled over pairs of steps so consecutive iterations are
    independent:
        err_t = a_t - th*a_{t-1} + th^2*err_{t-2},  a_t = y_t - mu - beta*y_{t-1}
        emu_t = (th - 1) + th^2*emu_{t-2}
        eb_t  = (th*y_{t-2} - y_{t-1}) + th^2*eb_{t-2}
        eth_t = (th*err_{t-2} - err_{t-1}) + th^2*eth_{t-2}
    """
    yf = [float(v) for v in np.asarray(y, np.float32)]
    T = len(yf)

    def tile_fn(extra_refs, xt, phi):
        mu, beta, th, ls = xt[0], xt[1], xt[2], xt[3]
        t2 = th * th
        emu_c = th - 1.0  # the unrolled emu driving term

        # t = 0
        err0 = yf[0] - mu - beta * mu
        emu0 = -1.0 - beta
        eb0 = -mu
        eth0 = mu * 0.0
        s2 = err0 * err0
        smu = err0 * emu0
        sb = err0 * eb0
        sth = mu * 0.0

        # t = 1 (seed the second chain)
        a1 = yf[1] - mu - beta * yf[0]
        err1 = a1 - th * err0
        emu1 = -1.0 - th * emu0
        eb1 = -yf[0] - th * eb0
        eth1 = -err0 - th * eth0
        s2b = err1 * err1
        smub = err1 * emu1
        sbb = err1 * eb1
        sthb = err1 * eth1

        errs = [err0, err1]
        emus = [emu0, emu1]
        ebs = [eb0, eb1]
        eths = [eth0, eth1]
        a_prev = a1
        accs = [[s2, smu, sb, sth], [s2b, smub, sbb, sthb]]

        for t in range(2, T):
            lane = t % 2
            a_t = yf[t] - mu - beta * yf[t - 1]
            b_t = a_t - th * a_prev
            a_prev = a_t
            err_t = b_t + t2 * errs[lane]
            emu_t = emu_c + t2 * emus[lane]
            eb_t = (th * yf[t - 2] - yf[t - 1]) + t2 * ebs[lane]
            # note yf consts fold: th*yf[t-2] is one scalar-const mul
            eth_t = (th * errs[lane] - errs[1 - lane]) + t2 * eths[lane]
            errs[lane], emus[lane] = err_t, emu_t
            ebs[lane], eths[lane] = eb_t, eth_t
            acc = accs[lane]
            acc[0] = acc[0] + err_t * err_t
            acc[1] = acc[1] + err_t * emu_t
            acc[2] = acc[2] + err_t * eb_t
            acc[3] = acc[3] + err_t * eth_t

        s2 = accs[0][0] + accs[1][0]
        smu = accs[0][1] + accs[1][1]
        sb = accs[0][2] + accs[1][2]
        sth = accs[0][3] + accs[1][3]

        inv_s2 = jnp.exp(-2.0 * ls)
        ll = -T * (LOG_SQRT_2PI + ls) - 0.5 * s2 * inv_s2
        gl_mu = -smu * inv_s2
        gl_beta = -sb * inv_s2
        gl_th = -sth * inv_s2
        gl_ls = -T + s2 * inv_s2

        sigma = jnp.exp(ls)
        z = sigma / 2.5
        lprior = (
            -0.5 * (mu / 10.0) ** 2 - jnp.log(10.0) - LOG_SQRT_2PI
            - 0.5 * (beta / 2.0) ** 2 - jnp.log(2.0) - LOG_SQRT_2PI
            - 0.5 * (th / 2.0) ** 2 - jnp.log(2.0) - LOG_SQRT_2PI
            - _LOG_PI - jnp.log(2.5) - jnp.log1p(z * z)
            + ls
        )
        gp_mu = -mu / 100.0
        gp_beta = -beta / 4.0
        gp_th = -th / 4.0
        gp_ls = 1.0 - 2.0 * z * z / (1.0 + z * z)

        logp = lprior + phi * ll
        grads = [
            gp_mu + phi * gl_mu,
            gp_beta + phi * gl_beta,
            gp_th + phi * gl_th,
            gp_ls + phi * gl_ls,
        ]
        return logp, grads

    return TileModel(dim=4, extra=(), tile_fn=tile_fn)


class _Wrap:
    def __init__(self, tm, dim):
        self.tile_model = tm
        self.dim = dim


def main():
    from experiments.bench_kernel import measure

    model = get_model("arma")
    base = measure("arma", 512, 50, model=model)
    print(json.dumps({"variant": "hand", **{k: base[k] for k in (
        "marginal_us_per_1024lane_leaf", "marginal_us_per_iter")}}),
        flush=True)

    from smcnuts_tpu.models.arma import _ASSET

    y = np.load(_ASSET)["y"]
    tm2 = arma_tile_strip2(y)
    w = _Wrap(tm2, 4)
    r2 = measure("arma_strip2", 512, 50, model=w)
    print(json.dumps({"variant": "strip2", **{k: r2[k] for k in (
        "marginal_us_per_1024lane_leaf", "marginal_us_per_iter")}}),
        flush=True)


if __name__ == "__main__":
    main()
