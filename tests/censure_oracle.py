"""Independent NumPy CenSurE (STAR) detector oracle (VERDICT r3 #6).

A from-scratch float64 implementation of the CenSurE box-variant detector
(Agrawal, Konolige, Blas: "CenSurE: Center Surround Extremas for Realtime
Feature Detection and Matching", ECCV 2008 -- the box-filter variant;
OpenCV's StarDetector is its octagon sibling, FeatureDetectorFactory.cpp:
135-158 parameters).  Written against the published algorithm, NOT
against vision/star.py: direct cumsum integral image, per-scale bi-level
center-surround responses, scale maximum, structure-tensor edge
suppression, spatial non-max suppression, threshold.  The TPU detector
(vision/star.py: MXU prefix-sum integral, fused box means, f32) is pinned
against this oracle on real frames by tests/test_star_groundtruth.py.
"""

from __future__ import annotations

import numpy as np

SCALE_LADDER = (1, 2, 3, 4, 6, 8, 11, 16, 22, 32, 45, 64, 90, 128)


def _integral(img: np.ndarray, pad: int) -> np.ndarray:
    """Zero-leading-row/col integral of the edge-padded, mean-centered
    image, float64 (the centering mirrors the accuracy note in the spec:
    responses are differences of means, so a constant shift cancels)."""
    p = np.pad(img.astype(np.float64), pad, mode="edge")
    p = p - p.mean()
    ii = np.zeros((p.shape[0] + 1, p.shape[1] + 1))
    ii[1:, 1:] = p.cumsum(0).cumsum(1)
    return ii


def _box_mean(ii: np.ndarray, pad: int, h: int, w: int, n: int
              ) -> np.ndarray:
    top, bot = pad - n, pad + n + 1
    s = (ii[bot:bot + h, bot:bot + w] - ii[top:top + h, bot:bot + w]
         - ii[bot:bot + h, top:top + w] + ii[top:top + h, top:top + w])
    return s / float((2 * n + 1) ** 2)


def censure_scores(img: np.ndarray, max_size: int = 16,
                   response_threshold: float = 30.0,
                   line_threshold: float = 10.0) -> np.ndarray:
    """Per-pixel CenSurE score map (0 where suppressed), float64."""
    sizes = [s for s in SCALE_LADDER if s <= max_size] or [1]
    h, w = img.shape
    pad = 2 * max(sizes) + 1
    ii = _integral(img, pad)
    best = np.zeros((h, w))
    for n in sizes:
        resp = np.abs(_box_mean(ii, pad, h, w, n)
                      - _box_mean(ii, pad, h, w, 2 * n))
        best = np.maximum(best, resp)

    # edge/line suppression: structure tensor of the merged response map
    # over a 5x5 window, keep tr^2 / det < threshold (the paper's "line
    # suppression by the scale-adaptive Harris measure of the response")
    bp = np.pad(best, 1, mode="edge")
    rx = 0.5 * (bp[1:-1, 2:] - bp[1:-1, :-2])
    ry = 0.5 * (bp[2:, 1:-1] - bp[:-2, 1:-1])
    iixx = _int2(rx * rx)
    iiyy = _int2(ry * ry)
    iixy = _int2(rx * ry)
    sxx = _boxsum5(iixx)
    syy = _boxsum5(iiyy)
    sxy = _boxsum5(iixy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    not_line = (det > 0) & (tr * tr < line_threshold * det)

    best = np.where(not_line, best, 0.0)
    return np.where(best >= response_threshold, best, 0.0)


def _int2(a: np.ndarray) -> np.ndarray:
    p = np.pad(a, 2, mode="edge")
    ii = np.zeros((p.shape[0] + 1, p.shape[1] + 1))
    ii[1:, 1:] = p.cumsum(0).cumsum(1)
    return ii


def _boxsum5(ii: np.ndarray) -> np.ndarray:
    h, w = ii.shape[0] - 5, ii.shape[1] - 5
    return (ii[5:, 5:] - ii[:-5, 5:] - ii[5:, :-5] + ii[:-5, :-5])[:h, :w]


def censure_keypoints(img: np.ndarray, max_size: int = 16,
                      response_threshold: float = 30.0,
                      line_threshold: float = 10.0,
                      nms_radius: int = 2, border: int = 17,
                      k: int = 60) -> np.ndarray:
    """Top-k (y, x) keypoints: score map -> (2r+1)^2 spatial NMS ->
    border mask -> strongest-first."""
    s = censure_scores(img, max_size, response_threshold, line_threshold)
    h, w = s.shape
    r = nms_radius
    sp = np.pad(s, r, mode="constant")
    local_max = np.ones_like(s, bool)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            nb = sp[r + dy:r + dy + h, r + dx:r + dx + w]
            local_max &= (s > nb) | ((s == nb) & (dy < 0 or (dy == 0 and
                                                            dx < 0)))
    keep = local_max & (s > 0)
    keep[:border] = keep[-border:] = False
    keep[:, :border] = keep[:, -border:] = False
    ys, xs = np.nonzero(keep)
    order = np.argsort(-s[ys, xs], kind="stable")[:k]
    return np.stack([ys[order], xs[order]], axis=1)
