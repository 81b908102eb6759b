"""CSS token presence features (36 binary columns: 10 id tokens incl.
the duplicated 'ss' + 26 class tokens).

Re-derivation of ``/root/reference/dragnet/features/css.py:18-58``:
``re.search`` of each token in the block's accumulated css id/class
strings.  The reference lists 'ss' twice under 'id'; the duplication is
reproduced so column counts and order match.
"""

from __future__ import annotations

import re

import numpy as np

ATTRIBUTE_TOKENS = (
    ('id',
     ('nav', 'ss', 'top', 'content', 'link', 'title', 'comment', 'tools',
      'rating', 'ss')),
    ('class',
     ('menu', 'widget', 'nav', 'share', 'facebook', 'cat', 'top', 'content',
      'item', 'twitter', 'button', 'title', 'header', 'ss', 'post',
      'comment', 'meta', 'alt', 'time', 'depth', 'thread', 'author', 'tools',
      'reply', 'url', 'avatar')),
)

_COMPILED = [
    (attrib, [re.compile(tok) for tok in tokens])
    for attrib, tokens in ATTRIBUTE_TOKENS
]

N_CSS_FEATURES = sum(len(tokens) for _, tokens in ATTRIBUTE_TOKENS)


def css_features(blocks):
    n = len(blocks)
    feats = np.zeros((n, N_CSS_FEATURES), dtype=np.float64)
    col = 0
    for attrib, patterns in _COMPILED:
        for pat in patterns:
            for i, b in enumerate(blocks):
                if pat.search(b.css.get(attrib, '')):
                    feats[i, col] = 1.0
            col += 1
    return feats
