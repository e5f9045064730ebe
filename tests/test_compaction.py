"""Lane-compaction (staged) Pallas NUTS kernel tests (VERDICT r4 #1).

The compacted dispatch splits tree construction at doubling boundaries and
packs unfinished lanes densely between stages (ops/nuts_pallas.py,
`compaction=`). Under the TPU-semantics interpreter the PRNG primitives are
stubbed deterministically, so the staged and single-kernel paths draw
identical randomness and must agree BITWISE — which pins down the whole
data path: continuation-bundle export/import, the argsort packing, the
per-lane parameter routing through the bundle, the composed inverse
un-permute, and the run-exactly-once epilogue. (On hardware the stage
streams genuinely differ and cross-checks are statistical, like every
other RNG-realization comparison on this kernel.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smcnuts_tpu.models import get_model
from smcnuts_tpu.ops.nuts_pallas import (
    _cont_layout,
    _epi_layout,
    nuts_batch_pallas,
    nuts_batch_pallas_fused,
)


@pytest.fixture(scope="module")
def arma():
    return get_model("arma")


def _cloud(n=1500, d=4, spread=True):
    rs = np.random.RandomState(0)
    if spread:
        # a warm core plus dispersed lanes: tree depths spread 1..max so
        # every stage sees a mix of finished and surviving lanes
        x = np.concatenate(
            [0.1 * rs.randn(2 * n // 3, d), 2.0 * rs.randn(n - 2 * n // 3, d)]
        )
    else:
        x = 0.1 * rs.randn(n, d)
    return jnp.asarray(x.astype(np.float32))


def _assert_same(a, b):
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert set(a[2]) == set(b[2])
    for k in a[2]:
        np.testing.assert_array_equal(
            np.asarray(a[2][k]), np.asarray(b[2][k]), err_msg=k
        )


@pytest.mark.parametrize("acc_rej", [False, True])
@pytest.mark.parametrize("splits", [(2, 4)])
def test_compacted_fused_bitwise_equal(arma, acc_rej, splits):
    tm = arma.tile_model
    # > 1 kernel block, or the dispatch prunes compaction as a no-op
    x = _cloud()
    assert x.shape[0] > 1024
    # step 1e-3: under the stubbed interpreter PRNG the direction draw is
    # constant, trajectories never U-turn early, and trees genuinely cross
    # the split boundaries (depths 1..max_depth+1 observed).
    a = nuts_batch_pallas_fused(
        tm, x, 7, 1e-3, 1.0, max_depth=6, acc_rej=acc_rej, interpret=True
    )
    b = nuts_batch_pallas_fused(
        tm, x, 7, 1e-3, 1.0, max_depth=6, acc_rej=acc_rej, interpret=True,
        compaction=splits,
    )
    depths = np.asarray(a[2]["depth"]).astype(int)
    assert depths.max() > max(splits) + 1, "continuation stages not exercised"
    assert depths.min() <= min(splits), "no finished lanes at the boundary"
    _assert_same(a, b)


def test_compacted_plain_bitwise_equal(arma):
    tm = arma.tile_model
    x = _cloud()
    assert x.shape[0] > 1024
    r = jnp.asarray(
        np.random.RandomState(1).randn(*x.shape).astype(np.float32)
    )
    a = nuts_batch_pallas(tm, x, r, 7, 1e-3, 1.0, max_depth=6,
                          interpret=True)
    b = nuts_batch_pallas(tm, x, r, 7, 1e-3, 1.0, max_depth=6,
                          interpret=True, compaction=(3,))
    _assert_same(a, b)


def test_compacted_batched_runs_bitwise_equal(arma):
    """vmapped Monte-Carlo runs flat-pack the block grid; compaction
    permutes lanes ACROSS runs mid-iteration and must still return every
    run's particles to their own slots."""
    tm = arma.tile_model
    x = jnp.stack([_cloud(n=400), _cloud(n=400) + 0.5, _cloud(n=400) - 0.5])
    seeds = jnp.asarray([3, 5, 9], jnp.int32)
    eps = jnp.asarray([1e-3, 1e-3, 1e-3], jnp.float32)
    phi = jnp.ones((3,), jnp.float32)
    im = jnp.ones((3, 4), jnp.float32)

    def run(compaction):
        return jax.vmap(
            lambda xx, sd, ee, pp, mm: nuts_batch_pallas_fused(
                tm, xx, sd, ee, pp, inv_mass=mm, max_depth=6,
                interpret=True, compaction=compaction,
            )
        )(x, seeds, eps, phi, im)

    _assert_same(run(()), run((2, 4)))


def test_splits_pruned_to_max_depth(arma):
    """Splits at or beyond max_depth are dropped; all-dropped reduces to
    the single-kernel path (identical object-level dispatch result)."""
    tm = arma.tile_model
    x = _cloud(n=1200)
    a = nuts_batch_pallas_fused(tm, x, 7, 0.05, 1.0, max_depth=3,
                                interpret=True)
    b = nuts_batch_pallas_fused(tm, x, 7, 0.05, 1.0, max_depth=3,
                                interpret=True, compaction=(3, 7))
    _assert_same(a, b)


def test_layouts_cover_all_state():
    cidx, c = _cont_layout(4)
    assert c == 11 * 4 + 13
    assert len(cidx) == 11 + 13
    eidx, c2 = _epi_layout(4)
    assert c2 == 2 * 4 + 8
