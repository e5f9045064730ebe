"""utils/timing: the only sanctioned measurement primitives on relay
transports (fresh os.urandom keys + host-materialization sync)."""

import numpy as np
import jax
import jax.numpy as jnp

from smcnuts_tpu.utils.timing import (
    RELAY_RTT_S,
    fresh_key,
    fresh_keys,
    fresh_seed,
    materialize,
    time_materialized,
)


def test_fresh_seeds_are_distinct_and_31bit():
    seeds = {fresh_seed() for _ in range(64)}
    assert len(seeds) == 64  # 2^-62-ish collision odds
    assert all(0 <= s < 2**31 for s in seeds)


def test_fresh_keys_shape_and_distinctness():
    k = fresh_keys(5)
    assert k.shape == (5,)
    data = np.asarray(jax.random.key_data(k))
    assert len({tuple(row) for row in data}) == 5


def test_materialize_numpy_ifies_pytrees():
    tree = {"a": jnp.ones((3, 2)), "b": (jnp.arange(4), "label"), "c": None}
    out = materialize(tree)
    assert isinstance(out["a"], np.ndarray)
    assert isinstance(out["b"][0], np.ndarray)
    assert out["b"][1] == "label" and out["c"] is None
    np.testing.assert_array_equal(out["a"], np.ones((3, 2)))


def test_materialize_handles_key_arrays():
    out = materialize({"k": fresh_key(), "x": jnp.zeros(2)})
    assert isinstance(out["x"], np.ndarray)


def test_time_materialized_returns_output_and_uses_fresh_args():
    seen = []

    def make_args():
        k = fresh_key()
        seen.append(np.asarray(jax.random.key_data(k)).tobytes())
        return (k,)

    f = jax.jit(lambda k: jax.random.normal(k, (8,)))
    best, out = time_materialized(f, make_args, repeats=3)
    assert best > 0 and isinstance(out[0] if isinstance(out, tuple) else out,
                                   np.ndarray) or out.shape == (8,)
    # warmup + 3 repeats, every key distinct
    assert len(seen) == 4 and len(set(seen)) == 4
    assert RELAY_RTT_S > 0
