"""Shard-friendly, bit-exact row/column placement on the covariance P.

P is block-row sharded over the device mesh (parallel/sharding.py).  The
filter's row/column surgery -- writing the predict strip, the quaternion
renormalization rows, a converted slot's block, a new feature's
rows/columns -- naively lowers to scatter / dynamic-(update-)slice along
the sharded dimension, which GSPMD implements by all-gathering the full
(N, N) matrix on every device (measured: up to 7 full-P gathers per frame
at round 2).  The helpers here express the same updates as

  * an iota row/column predicate, plus
  * a gather from a small replicated operand (the new rows/cols), plus
  * an elementwise select,

which partitions with ZERO full-P communication: each device evaluates the
predicate and the gather on its local rows only.  Every helper is
bit-exact to the `.at[...].set` / dynamic_update_slice it replaces (pure
data placement, no arithmetic reassociation), so the float64
sharded==unsharded and golden-trajectory tests are unaffected.

No reference counterpart (the reference is single-threaded C++;
SURVEY.md section 2.7) -- this is the communication layer of the P-sharded
scaling axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def _is_static(v) -> bool:
    return isinstance(v, int)


def place_rows(P: jnp.ndarray, rows: jnp.ndarray, start) -> jnp.ndarray:
    """P with rows[start : start+k, :] <- ``rows`` (k, N); ``start`` may be
    traced.  Equal to lax.dynamic_update_slice(P, rows, (start, 0)) FOR
    IN-RANGE starts (0 <= start <= N - k, which every call site
    guarantees: slot offsets are CAM_DIM + 6*slot with slot < F).  A
    traced start beyond N - k would write a truncated, index-shifted
    block where DUS clamps the start to keep the whole block -- don't
    rely on this helper for clamping semantics (same for place_cols /
    place_block below).

    Static starts use zero-pad + select (XLA fuses the pad; the gather
    form materialized a full (N, N) intermediate, ~30 us each on v5e);
    traced starts (the rare conversion path) keep the gather.
    """
    k = rows.shape[0]
    N = P.shape[0]
    i = jnp.arange(N)
    if _is_static(start):
        ext = jnp.pad(rows, ((start, N - start - k), (0, 0)))
        in_r = (i >= start) & (i < start + k)
        return jnp.where(in_r[:, None], ext, P)
    start = jnp.asarray(start, i.dtype)
    in_r = (i >= start) & (i < start + k)
    ridx = jnp.clip(i - start, 0, k - 1)
    return jnp.where(in_r[:, None], rows[ridx, :], P)


def place_cols(P: jnp.ndarray, cols: jnp.ndarray, start) -> jnp.ndarray:
    """P with cols[:, start : start+k] <- ``cols`` (N, k)."""
    k = cols.shape[1]
    N = P.shape[1]
    j = jnp.arange(N)
    if _is_static(start):
        ext = jnp.pad(cols, ((0, 0), (start, N - start - k)))
        in_c = (j >= start) & (j < start + k)
        return jnp.where(in_c[None, :], ext, P)
    start = jnp.asarray(start, j.dtype)
    in_c = (j >= start) & (j < start + k)
    cidx = jnp.clip(j - start, 0, k - 1)
    return jnp.where(in_c[None, :], cols[:, cidx], P)


def place_block(P: jnp.ndarray, blk: jnp.ndarray, r0, c0) -> jnp.ndarray:
    """P with the (k, k) block at (r0, c0) <- ``blk``."""
    k = blk.shape[0]
    i = jnp.arange(P.shape[0])
    j = jnp.arange(P.shape[1])
    if _is_static(r0) and _is_static(c0):
        ext = jnp.pad(blk, ((r0, P.shape[0] - r0 - k),
                            (c0, P.shape[1] - c0 - k)))
        in_r = (i >= r0) & (i < r0 + k)
        in_c = (j >= c0) & (j < c0 + k)
        return jnp.where(in_r[:, None] & in_c[None, :], ext, P)
    r0 = jnp.asarray(r0, i.dtype)
    c0 = jnp.asarray(c0, j.dtype)
    in_r = (i >= r0) & (i < r0 + k)
    in_c = (j >= c0) & (j < c0 + k)
    ridx = jnp.clip(i - r0, 0, k - 1)
    cidx = jnp.clip(j - c0, 0, k - 1)
    return jnp.where(in_r[:, None] & in_c[None, :], blk[ridx][:, cidx], P)


def select_rows(P: jnp.ndarray, start, k: int) -> jnp.ndarray:
    """Rows [start : start+k] of P as a (k, N) replicated strip; ``start``
    may be traced.

    Computed as a one-hot contraction over the sharded row axis: each
    device contributes its local rows, XLA reduces with a (k, N) psum --
    never a full-P gather.  Exact: each output element is one P entry
    plus true zeros (IEEE-exact), identical to dynamic_slice.
    """
    O = (jnp.arange(P.shape[0])[None, :]
         == (jnp.asarray(start) + jnp.arange(k))[:, None]).astype(P.dtype)
    return O @ P
