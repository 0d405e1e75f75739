"""Zone-balanced new-feature selection.

Reference: DetectNewImageFeatures.cpp.  New candidates are detected away
from existing prediction ellipses, grouped into a 2^d x 2^d grid of zones,
and picked one at a time from the least-populated zone (population =
predictions + already-picked features in that zone), stamping a small
exclusion ellipse around each pick so features do not bunch up
(searchFeaturesByZone, :172-319).

TPU-first: the selection loop is a `lax.scan` with O(K) masked reductions
per step; candidate suppression (the mask stamp, :285-290) becomes marking
candidates within the exclusion radius unavailable.  Two deterministic
departures from the reference, which affect only *which* corners seed new
landmarks (parity is measured by trajectory ATE, SURVEY.md section 7.3):
ties between equally-populated zones break toward the lower zone id, and
within a zone the strongest corner is taken instead of `rand()`
(:236).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class NewFeatures(NamedTuple):
    uv: jnp.ndarray       # (C, 2) picked pixels (x, y), float
    valid: jnp.ndarray    # (C,) bool
    kp_index: jnp.ndarray  # (C,) int32 index into the keypoint arrays


@partial(jax.jit, static_argnames=("zones_in_a_row", "image_w", "image_h",
                                   "max_new"))
def select_zone_balanced(kp_xy: jnp.ndarray, kp_score: jnp.ndarray,
                         kp_avail: jnp.ndarray, pred_uv: jnp.ndarray,
                         pred_visible: jnp.ndarray, needed: jnp.ndarray,
                         exclusion_radius: jnp.ndarray,
                         zones_in_a_row: int, image_w: int, image_h: int,
                         max_new: int) -> NewFeatures:
    """Pick up to ``needed`` (<= max_new) keypoints, zone-balanced.

    ``kp_avail`` should already exclude keypoints inside prediction
    ellipses (the detection mask, buildImageMask :105-127).
    """
    n_zones = zones_in_a_row * zones_in_a_row
    zone_w = image_w // zones_in_a_row
    zone_h = image_h // zones_in_a_row

    def zone_of(xy):
        zx = jnp.clip(xy[..., 0].astype(jnp.int32) // zone_w, 0,
                      zones_in_a_row - 1)
        zy = jnp.clip(xy[..., 1].astype(jnp.int32) // zone_h, 0,
                      zones_in_a_row - 1)
        return zy * zones_in_a_row + zx

    kp_zone = zone_of(kp_xy)                              # (K,)
    pred_zone = zone_of(pred_uv)
    zone_pop = jnp.zeros((n_zones,), jnp.int32).at[pred_zone].add(
        pred_visible.astype(jnp.int32))

    K = kp_xy.shape[0]
    BIG = jnp.int32(1 << 20)

    def cond(carry):
        avail, pop, picked_idx, n_picked = carry
        return (n_picked < jnp.minimum(needed, max_new)) & jnp.any(avail)

    def body(carry):
        avail, pop, picked_idx, n_picked = carry
        # zones that still have candidates
        zone_has = jnp.zeros((n_zones,), bool).at[kp_zone].max(avail)
        zone_key = jnp.where(zone_has, pop, BIG)
        zone_sel = jnp.argmin(zone_key)                  # ties -> lowest id

        cand_ok = avail & (kp_zone == zone_sel)
        cand_key = jnp.where(cand_ok, kp_score, -jnp.inf)
        kp_sel = jnp.argmax(cand_key)

        do = jnp.any(cand_ok)

        # suppress everything inside the exclusion radius of the pick
        # (the mask stamp at :285-290)
        dist2 = jnp.sum((kp_xy - kp_xy[kp_sel]) ** 2, axis=-1)
        suppress = dist2 <= exclusion_radius ** 2
        avail = avail & jnp.where(do, ~suppress, True)

        pop = pop.at[zone_sel].add(do.astype(jnp.int32))
        picked_idx = picked_idx.at[n_picked].set(
            jnp.where(do, kp_sel.astype(jnp.int32), -1))
        n_picked = n_picked + do.astype(jnp.int32)
        return (avail, pop, picked_idx, n_picked)

    init = (kp_avail, zone_pop, jnp.full((max_new,), -1, jnp.int32),
            jnp.int32(0))
    # while_loop with early exit: typical steady-state frames need few or
    # no new features, so this costs ~nothing then (a scan would always pay
    # max_new iterations)
    (_, _, picked_idx, n_picked) = jax.lax.while_loop(cond, body, init)

    valid = picked_idx >= 0
    idx = jnp.maximum(picked_idx, 0)
    uv = jnp.where(valid[:, None], kp_xy[idx].astype(jnp.float32), 0.0)
    return NewFeatures(uv=uv, valid=valid, kp_index=idx)
