"""Float gradient descriptors (SURF-analog) + L2 matching distance.

The reference's SURF/SIFT descriptor profiles produce float descriptors
matched with L2 distance (Matching.cpp:47-72 takes the float path when the
descriptor mat is CV_32F; DescriptorExtractorFactory.cpp:60-107).  The TPU
build implements the SURF-64 layout natively: a (2R)x(2R) patch of image
gradients around each keypoint, split into a 4x4 cell grid, each cell
summarized by (sum dx, sum |dx|, sum dy, sum |dy|), Gaussian-weighted and
L2-normalized -- 64 floats.

Extraction is fully vectorized: dense gradient maps once per frame, then a
(K, patch^2) gather per component.  Upright variant (no dominant-orientation
rotation): descriptors only ever compete against other descriptors from
this extractor on roughly-upright video frames, and the guided matcher's
ellipse gate removes most ambiguity before descriptors are consulted.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from openekfmonoslam_tpu.vision.harris import gradients

DESC_DIM = 64
_CELLS = 4  # 4x4 grid


def _patch_offsets(radius: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Patch sample offsets (dy, dx) and Gaussian weights, cell-ordered.

    Returns arrays of shape (cells^2 * cell_px,) ordered so a reshape to
    (cells^2, cell_px) groups samples by cell.
    """
    side = 2 * radius
    cell = side // _CELLS
    dys, dxs, ws = [], [], []
    sigma = 3.3 * radius / 10.0  # SURF's 3.3s weighting at s = R/10
    for cy in range(_CELLS):
        for cx in range(_CELLS):
            for iy in range(cell):
                for ix in range(cell):
                    dy = cy * cell + iy - radius
                    dx = cx * cell + ix - radius
                    dys.append(dy)
                    dxs.append(dx)
                    ws.append(np.exp(-0.5 * (dy * dy + dx * dx)
                                     / (sigma * sigma)))
    return (np.asarray(dys, np.int32), np.asarray(dxs, np.int32),
            np.asarray(ws, np.float32))


def surf64(smoothed: jnp.ndarray, yx: jnp.ndarray, radius: int = 10
           ) -> jnp.ndarray:
    """(K, 64) float32 SURF-layout descriptors at integer keypoints."""
    h, w = smoothed.shape
    gx, gy = gradients(smoothed)
    dys, dxs, ws = _patch_offsets(radius)
    y = jnp.clip(yx[:, 0:1] + dys[None, :], 0, h - 1)   # (K, P)
    x = jnp.clip(yx[:, 1:2] + dxs[None, :], 0, w - 1)
    pgx = gx[y, x] * ws[None, :]                        # (K, P)
    pgy = gy[y, x] * ws[None, :]
    k = yx.shape[0]
    cell_px = pgx.shape[1] // (_CELLS * _CELLS)
    pgx = pgx.reshape(k, _CELLS * _CELLS, cell_px)
    pgy = pgy.reshape(k, _CELLS * _CELLS, cell_px)
    feats = jnp.stack([
        jnp.sum(pgx, axis=-1), jnp.sum(jnp.abs(pgx), axis=-1),
        jnp.sum(pgy, axis=-1), jnp.sum(jnp.abs(pgy), axis=-1),
    ], axis=-1)                                          # (K, 16, 4)
    d = feats.reshape(k, DESC_DIM)
    norm = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-12)
    return (d / norm).astype(jnp.float32)


def l2_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(F, D) x (K, D) -> (F, K) squared L2 distance (one MXU matmul)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    cross = a @ b.T
    na = jnp.sum(a * a, axis=-1)
    nb = jnp.sum(b * b, axis=-1)
    return jnp.maximum(na[:, None] + nb[None, :] - 2.0 * cross, 0.0)
