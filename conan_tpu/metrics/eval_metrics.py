"""Objective eval metrics.

numpy ports of `/root/reference/utils/metrics/{dtw,pitch_distance,
diagonal_metrics,laplace_var}.py` (offline analysis tools — no need for
device execution) plus an SSIM metric built on the training-loss SSIM.
"""

from __future__ import annotations

import numpy as np


def accelerated_dtw(x: np.ndarray, y: np.ndarray, dist: str = "euclidean", warp: int = 1):
    """DTW via a vectorized cost matrix (reference dtw.py:59-100).
    Returns (min_distance, cost, accumulated_cost, path)."""
    from scipy.spatial.distance import cdist

    x = np.atleast_2d(x.T).T if x.ndim == 1 else x
    y = np.atleast_2d(y.T).T if y.ndim == 1 else y
    if x.ndim == 1:
        x = x[:, None]
    if y.ndim == 1:
        y = y[:, None]
    r, c = len(x), len(y)
    D0 = np.zeros((r + 1, c + 1))
    D0[0, 1:] = np.inf
    D0[1:, 0] = np.inf
    D1 = D0[1:, 1:]
    D0[1:, 1:] = cdist(x, y, dist)
    C = D1.copy()
    for i in range(r):
        for j in range(c):
            min_list = [D0[i, j]]
            for k in range(1, warp + 1):
                min_list += [D0[min(i + k, r), j], D0[i, min(j + k, c)]]
            D1[i, j] += min(min_list)
    path = _traceback(D0)
    return D1[-1, -1], C, D1, path


def _traceback(D: np.ndarray):
    i, j = np.array(D.shape) - 2
    p, q = [i], [j]
    while (i > 0) or (j > 0):
        tb = np.argmin((D[i, j], D[i, j + 1], D[i + 1, j]))
        if tb == 0:
            i -= 1
            j -= 1
        elif tb == 1:
            i -= 1
        else:
            j -= 1
        p.insert(0, i)
        q.insert(0, j)
    return np.array(p), np.array(q)


def pitch_dtw_distance(f0_a: np.ndarray, f0_b: np.ndarray) -> float:
    """DTW distance between two (denormalized, Hz) F0 curves over voiced
    frames — the reference's pitch-distance eval."""
    a = f0_a[f0_a > 0]
    b = f0_b[f0_b > 0]
    if len(a) == 0 or len(b) == 0:
        return float("nan")
    d, *_ = accelerated_dtw(a[:, None], b[:, None], "euclidean")
    return float(d / max(len(a), len(b)))


# --------------------------------------------------------------------------
# Attention diagonality (diagonal_metrics.py)
# --------------------------------------------------------------------------

def focus_rate(attn: np.ndarray) -> np.ndarray:
    """attn [B, Lt, Ls] → [B]."""
    return attn.max(-1).sum(-1) / attn.sum(-1).sum(-1)


def phone_coverage_rate(attn: np.ndarray) -> np.ndarray:
    return attn.max(1).sum(-1) / attn.shape[-1]


def diagonal_focus_rate(attn: np.ndarray, attn_ks: np.ndarray,
                        target_len: np.ndarray, band_mask_factor: float = 5,
                        band_width: float = 50):
    width = np.minimum(target_len / band_mask_factor, band_width).astype(float)
    B, Lt, Ls = attn.shape
    x = np.arange(Lt)[None, :, None].astype(float)
    y = np.arange(Ls)[None, None, :].astype(float)
    cond = y - attn_ks[:, None, None] * x
    k_w = attn_ks[:, None, None] * width[:, None, None]
    mask = ((cond + k_w >= 0) & (cond - k_w <= 0)).astype(float)
    diag = (attn * mask).sum((-1, -2))
    return diag / attn.sum((-1, -2)), mask


def laplace_var(x: np.ndarray) -> float:
    import scipy.ndimage

    return float(scipy.ndimage.laplace(x).var())


def mel_ssim_metric(pred: np.ndarray, target: np.ndarray) -> float:
    """Mean SSIM between two [T, M] mels (uses the training-loss SSIM)."""
    import jax.numpy as jnp

    from conan_tpu.train.losses import ssim

    p = jnp.asarray(pred)[None, None] + 6.0
    t = jnp.asarray(target)[None, None] + 6.0
    return float(ssim(p, t)[0])
