"""Readability-style subtree score feature (1 column).

Re-derivation of ``/root/reference/dragnet/features/_readability.cc`` via
its marshalling layer ``_readability.pyx``:

* per-node scores seeded from once-only class weights (assignment, not
  accumulation -- the blockifier guarantees each tag_id appears once)
* blocks with UTF-8 byte length > 25 whose start tag is div/p add
  ``1 + min(len // 100, 3)`` to their *parent* (last ancestor) and mark it
  valid (``_readability.cc:52-63``)
* each node's score scaled by ``1 - weighted_link_density`` of its subtree
  (``:66-73``), with the text-length denominator floored at 1.0
* feature = max(valid-ancestor score) / max(1.0, max valid score), clamped
  at >= 0; all zeros when no valid node exists (``:75-123``)
"""

from __future__ import annotations

import numpy as np


def readability_features(blocks):
    n = len(blocks)
    feats = np.zeros((n, 1), dtype=np.float64)
    if n == 0:
        return feats

    scores = {}
    ld_num = {}
    ld_den = {}
    valid = set()

    text_lens = [b.n_bytes for b in blocks]

    for k, b in enumerate(blocks):
        for tag_id, w in b.features['readability_class_weights']:
            scores[tag_id] = float(w)
        ancestors = b.features['ancestors']
        if ancestors:
            tl = text_lens[k]
            contrib = b.link_density * tl
            for anc in ancestors:
                ld_num[anc] = ld_num.get(anc, 0.0) + contrib
                ld_den[anc] = ld_den.get(anc, 0.0) + tl
            if tl > 25 and b.features.get('block_start_tag') in ('div', 'p'):
                parent = ancestors[-1]
                scores[parent] = scores.get(parent, 0.0) + (1 + min(tl // 100, 3))
                valid.add(parent)

    for tag_id in scores:
        num = ld_num.get(tag_id, 0.0)
        den = max(ld_den.get(tag_id, 0.0), 1.0)
        scores[tag_id] *= (1.0 - num / den)

    if not valid:
        return feats
    max_score = max(1.0, max(scores[t] for t in valid))

    for k, b in enumerate(blocks):
        best = None
        for anc in b.features['ancestors']:
            if anc in valid:
                s = scores[anc]
                if best is None or s > best:
                    best = s
        if best is not None:
            feats[k, 0] = max(best / max_score, 0.0)
    return feats
