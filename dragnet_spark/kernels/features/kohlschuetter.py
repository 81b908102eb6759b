"""Kohlschuetter neighbor-density features.

Re-derivation of ``/root/reference/dragnet/features/_kohlschuetter.pyx``:
6 columns per block = (link_density, text_density) of previous, current,
next block; zero-padded at sequence ends; requires >=3 blocks.
Implemented as NumPy shifts over the whole sequence (no Python loop).
"""

from __future__ import annotations

import numpy as np


def kohlschuetter_features(blocks):
    n = len(blocks)
    if n < 3:
        raise ValueError(
            'at least 3 blocks are needed to make Kohlschuetter features')
    ld = np.fromiter((b.link_density for b in blocks), dtype=np.float64, count=n)
    td = np.fromiter((b.text_density for b in blocks), dtype=np.float64, count=n)
    return densities_to_kohlschuetter(ld, td)


def densities_to_kohlschuetter(ld, td):
    """Shift-based construction over precomputed density arrays."""
    n = len(ld)
    feats = np.zeros((n, 6), dtype=np.float64)
    feats[1:, 0] = ld[:-1]
    feats[1:, 1] = td[:-1]
    feats[:, 2] = ld
    feats[:, 3] = td
    feats[:-1, 4] = ld[1:]
    feats[:-1, 5] = td[1:]
    return feats
