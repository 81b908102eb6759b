"""Longest-common-subsequence labeling kernel.

Re-derivation of ``/root/reference/dragnet/lcs.pyx`` using a vectorized
NumPy row recurrence instead of the Cython double loop:

``C[i, j] = max(C[i-1, j], C[i, j-1], C[i-1, j-1] + (X[i-1]==Y[j-1]))``

Rows are non-decreasing in ``j``, so the in-row dependency resolves with a
single ``np.maximum.accumulate`` -- O(m) vectorized row updates.  The
backtrack in :func:`check_inclusion` replicates the reference's exact
tie-breaking (``lcs.pyx:88-103``: prefer moving ``j`` when
``C[i][j-1] >= C[i-1][j]``) so the chosen LCS -- and therefore the derived
block labels -- are bit-identical.

Like the reference (``lcs.pyx:30-33``), the DP matrix is ``uint16``; the
reference *asserts* below 65k tokens, we truncate instead so one huge
document cannot kill an executor (SURVEY.md §4).  The cap is 8192 tokens
(not 65k): the backtrack materializes the full ``(m+1, n+1)`` matrix, and
65k^2 x 2 B is ~8.4 GiB for a single document -- an executor OOM on any
real web corpus -- while 8192^2 is a bounded ~134 MB per in-flight doc.
Callers receive inclusion flags only for the covered prefix and must
treat tokens past the cap as *unknown* (``operators/labeling.py`` emits
null fracs/labels for uncovered blocks plus a ``truncated`` flag),
never as unmatched.
"""

from __future__ import annotations

import numpy as np

MAX_TOKENS = 8192


def longest_common_subsequence(x, y):
    """Full (m+1, n+1) uint16 LCS matrix over token lists."""
    m = len(x)
    n = len(y)
    c = np.zeros((m + 1, n + 1), dtype=np.uint16)
    if m == 0 or n == 0:
        return c
    # token -> int codes so row comparisons are vectorized
    vocab = {}
    for tok in x:
        if tok not in vocab:
            vocab[tok] = len(vocab)
    xc = np.fromiter((vocab[t] for t in x), dtype=np.int64, count=m)
    yc = np.fromiter((vocab.get(t, -1) for t in y), dtype=np.int64, count=n)
    y_codes = set(yc.tolist())
    y_codes.discard(-1)
    for i in range(1, m + 1):
        prev = c[i - 1]
        xi = xc[i - 1]
        if xi not in y_codes:
            # x_i never matches: the row equals the previous row (the
            # standard LCS identity) -- one memcpy instead of five
            # vector ops.  Boilerplate-heavy documents skip most rows.
            c[i] = prev
            continue
        match = yc == xi
        cand = np.where(match, prev[:-1] + 1, prev[1:])
        row = np.maximum(prev[1:], cand)
        np.maximum.accumulate(row, out=row)
        c[i, 1:] = row
    return c


def check_inclusion(x, y):
    """For each token of ``x``: is it part of the reference-chosen LCS
    with ``y``?  (lcs.pyx:78-103; vector pinned by test/test_lcs.py:4-8)"""
    if len(y) == 0:
        return [False] * len(x)
    if len(x) == 0:
        return []
    x = x[:MAX_TOKENS]
    y = y[:MAX_TOKENS]
    c = longest_common_subsequence(x, y)
    i = len(x)
    j = len(y)
    ret = []
    while i > 0 or j > 0:
        if i > 0 and j > 0 and x[i - 1] == y[j - 1]:
            ret.append(True)
            i -= 1
            j -= 1
        elif j > 0 and (i == 0 or c[i][j - 1] >= c[i - 1][j]):
            j -= 1
        elif i > 0 and (j == 0 or c[i][j - 1] < c[i - 1][j]):
            ret.append(False)
            i -= 1
    ret.reverse()
    return ret
