"""Weninger CETR features (content-to-tag ratio, smoothed).

Re-derivation of ``/root/reference/dragnet/features/_weninger.pyx``:

* ``ctr = len(block.text in utf-8 bytes) / max(tagcount, 1)``
  (``_blocks_to_ctrs``, lines 12-23; the reference measures *byte* length
  because blocks are byte strings there)
* derivative ``dx[k] = |mean(x[k+1 .. k+alpha]) - x[k]|`` with alpha=3 and
  a special-cased last element (lines 46-63)
* both smoothed with a Gaussian filter, sigma=1.0 (lines 66-68)

scipy is not in this container, so :func:`gaussian_filter1d` re-implements
``scipy.ndimage.gaussian_filter`` (order 0, mode='reflect', truncate=4.0)
exactly; verified against the reference golden matrix in
``test/test_weninger.py:6-21``.
"""

from __future__ import annotations

import numpy as np

_ALPHA = 3


_KERNEL_CACHE = {}


def _gaussian_kernel1d(sigma, radius):
    key = (sigma, radius)
    w = _KERNEL_CACHE.get(key)
    if w is None:
        x = np.arange(-radius, radius + 1, dtype=np.float64)
        phi = np.exp(-0.5 / (sigma * sigma) * x ** 2)
        w = phi / phi.sum()
        _KERNEL_CACHE[key] = w
    return w


def gaussian_filter1d(x, sigma=1.0, truncate=4.0):
    """scipy.ndimage.gaussian_filter1d equivalent (order=0, mode='reflect')."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    radius = int(truncate * sigma + 0.5)
    if radius == 0 or n == 0:
        return x.copy()
    w = _gaussian_kernel1d(sigma, radius)
    if n >= radius:
        # symmetric pad via direct slicing (np.pad dominates on the tiny
        # per-document arrays this runs over)
        padded = np.concatenate((x[radius - 1::-1], x, x[:n - radius - 1:-1]))
    else:
        padded = np.pad(x, radius, mode='symmetric')
    return np.convolve(padded, w, mode='valid')


def sx_sdx(x, sigma=1.0):
    """Smoothed values and smoothed absolute differences (paper eqn 4)."""
    x = np.asarray(x, dtype=np.float64)
    nx = len(x)
    dx = np.zeros(nx, dtype=np.float64)
    if nx >= 2:
        # dx[k] = |mean(x[k+1 : min(k+1+alpha, nx)]) - x[k]| for k < nx-1
        csum = np.concatenate(([0.0], np.cumsum(x)))
        k = np.arange(nx - 1)
        start = k + 1
        end = np.minimum(k + 1 + _ALPHA, nx)
        dx[:-1] = np.abs((csum[end] - csum[start]) / (end - start) - x[:-1])
        dx[nx - 1] = abs(0.5 * (x[nx - 1] + x[nx - 2]) - x[nx - 1])
    ret = np.empty((nx, 2), dtype=np.float64)
    ret[:, 0] = gaussian_filter1d(x, sigma=sigma)
    ret[:, 1] = gaussian_filter1d(dx, sigma=sigma)
    return ret


def blocks_to_ctrs(blocks):
    n = len(blocks)
    lengths = np.fromiter(
        (b.n_bytes for b in blocks), dtype=np.float64, count=n)
    tagcounts = np.fromiter(
        (b.features['tagcount'] for b in blocks), dtype=np.float64, count=n)
    return lengths / np.maximum(tagcounts, 1.0)


def weninger_features(blocks, sigma=1.0):
    return sx_sdx(blocks_to_ctrs(blocks), sigma=sigma)
