"""Chunked execution with checkpoint/resume.

`run_smc` traces the whole K-iteration run into one XLA program — fastest, but
a crash loses everything (the reference has the same failure mode, SURVEY.md
§5 "Checkpoint / resume: Absent"). ChunkedRunner trades a little dispatch
overhead for durability: it scans `chunk_size` iterations per device program,
snapshots the (tiny) SMC state pytree and accumulated diagnostics to an atomic
.npz between chunks, and resumes from the latest snapshot after a restart.
The final result is bit-identical to the monolithic run for the same key
(same step function, same PRNG stream, chunking only cuts the scan).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import numpy as np

from .config import SMCConfig
from .models.base import Model
from .proposals import DiagNormalProposal
from .sampler import SMCResult, _make_step, finalize, init_state
from .utils.checkpoint import load_checkpoint, save_checkpoint


def _to_host(leaf):
    """np.asarray that tolerates leaves sharded across processes (history
    series under a multi-process particle mesh): collective gather, so every
    process of a jax.distributed gang must reach this point together."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
    return np.asarray(leaf)


class ChunkedRunner:
    def __init__(self, model: Model, cfg: SMCConfig, checkpoint_path=None,
                 chunk_size=10, sample_proposal=None, momentum_proposal=None,
                 mesh=None):
        self.model = model
        self.cfg = cfg
        self.checkpoint_path = checkpoint_path
        self.chunk_size = max(1, int(chunk_size))
        self.sample_proposal = sample_proposal
        self.momentum_proposal = momentum_proposal or DiagNormalProposal(model.dim)
        self.mesh = mesh
        step = _make_step(model, cfg, self.momentum_proposal, mesh=mesh)

        @partial(jax.jit, static_argnames=("length",))
        def chunk(carry, k_start, length):
            # Absolute iteration indices: the streaming tempered-recycling
            # estimator keys itself by fold_in(k_post, k), so a resumed chunk
            # must see the same k as the monolithic scan.
            return jax.lax.scan(
                step, carry, k_start + jax.numpy.arange(length)
            )

        self._chunk = chunk
        self._init = jax.jit(
            lambda key: init_state(
                model, cfg, key, sample_proposal=sample_proposal, mesh=mesh
            )
        )

    def run(self, key, progress=None) -> SMCResult:
        """Run to completion, resuming from the checkpoint if one exists.
        `progress`, if given, is called as progress(k_done, K) after every
        chunk (SMCSampler uses it to restore the reference's tqdm bar,
        reference smc_sampler.py:109)."""
        cfg = self.cfg
        carry, k_post = self._init(key)
        x0, logw0 = carry.x, carry.logw
        k_done = 0
        diags: dict[str, list] = {}

        if self.checkpoint_path and os.path.exists(self.checkpoint_path):
            template = (carry, k_post, x0, logw0)
            (carry, k_post, x0, logw0), k_done, saved = load_checkpoint(
                self.checkpoint_path, template
            )
            diags = {
                name: [saved[name]] for name in saved
            }
        if progress is not None and k_done:
            progress(k_done, cfg.n_iterations)

        while k_done < cfg.n_iterations:
            length = min(self.chunk_size, cfg.n_iterations - k_done)
            carry, outs = self._chunk(carry, k_done, length)
            outs = jax.tree.map(_to_host, outs)
            for name, arr in outs.items():
                diags.setdefault(name, []).append(arr)
            k_done += length
            if self.checkpoint_path:
                save_checkpoint(
                    self.checkpoint_path,
                    (carry, k_post, x0, logw0),
                    k_done,
                    {n: np.concatenate(v, axis=0) for n, v in diags.items()},
                )
            if progress is not None:
                progress(k_done, cfg.n_iterations)

        outs_full = {
            name: np.concatenate(chunks, axis=0) for name, chunks in diags.items()
        }
        result = finalize(
            self.model, cfg, carry, outs_full, x0, logw0, k_post
        )
        return jax.tree.map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
            result,
        )
