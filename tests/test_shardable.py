"""filter/shardable.py placement helpers: bit-exact vs the operations
they replace (dynamic_update_slice / scatter / dynamic_slice), for both
static and traced offsets.  These forms carry the zero-full-P-gather
property of the sharded step, so their exactness is load-bearing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openekfmonoslam_tpu.filter import shardable


@pytest.fixture
def P(rng):
    return jnp.asarray(rng.normal(size=(40, 40)).astype(np.float64))


@pytest.mark.parametrize("start", [0, 3, 17, 34])
@pytest.mark.parametrize("traced", [False, True])
def test_place_rows_equals_dus(P, rng, start, traced):
    rows = jnp.asarray(rng.normal(size=(6, 40)))
    ref = jax.lax.dynamic_update_slice(P, rows, (start, 0))
    got = shardable.place_rows(P, rows,
                               jnp.int32(start) if traced else start)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("start", [0, 5, 34])
@pytest.mark.parametrize("traced", [False, True])
def test_place_cols_equals_dus(P, rng, start, traced):
    cols = jnp.asarray(rng.normal(size=(40, 6)))
    ref = jax.lax.dynamic_update_slice(P, cols, (0, start))
    got = shardable.place_cols(P, cols,
                               jnp.int32(start) if traced else start)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("r0,c0", [(0, 0), (7, 19), (34, 34)])
@pytest.mark.parametrize("traced", [False, True])
def test_place_block_equals_dus(P, rng, r0, c0, traced):
    blk = jnp.asarray(rng.normal(size=(6, 6)))
    ref = jax.lax.dynamic_update_slice(P, blk, (r0, c0))
    cast = (lambda v: jnp.int32(v)) if traced else (lambda v: v)
    got = shardable.place_block(P, blk, cast(r0), cast(c0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("start", [0, 13, 34])
def test_select_rows_equals_dynamic_slice(P, start):
    ref = jax.lax.dynamic_slice(P, (start, 0), (6, 40))
    got = shardable.select_rows(P, jnp.int32(start), 6)
    # one-hot contraction: a sum of true zeros plus one entry is IEEE-exact
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_placements_compose_like_at_set(P, rng):
    """The predict-strip pattern: rows then cols then corner block, as in
    filter/predict.py, equals the .at[...] formulation."""
    F = jnp.asarray(rng.normal(size=(13, 13)))
    top = F @ P[:13, :]
    ref = P.at[:13, :].set(top)
    ref = ref.at[:, :13].set(ref[:, :13] @ F.T)
    ref = ref.at[:13, :13].add(jnp.eye(13) * 0.5)

    got = shardable.place_rows(P, top, 0)
    got = shardable.place_cols(got, got[:, :13] @ F.T, 0)
    got = shardable.place_block(got, got[:13, :13] + jnp.eye(13) * 0.5,
                                0, 0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
