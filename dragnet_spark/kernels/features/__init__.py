"""Per-document block-sequence feature kernels (Spark-free, NumPy-batched).

Re-derivations of the reference transformers in
``/root/reference/dragnet/features/`` -- see each module.  ``compute``
hstacks per-feature matrices like sklearn ``FeatureUnion``
(``dragnet/util.py:117-148``); the shipped default order is
kohlschuetter(6) + weninger(2) + readability(1) = 9 columns
(``dragnet/extractor.py:41``).
"""

from __future__ import annotations

import numpy as np

from .css import css_features
from .kohlschuetter import kohlschuetter_features
from .readability import readability_features
from .weninger import weninger_features

DEFAULT_FEATURES = ('kohlschuetter', 'weninger', 'readability')

_REGISTRY = {
    'kohlschuetter': kohlschuetter_features,
    'weninger': weninger_features,
    'readability': readability_features,
    'css': css_features,
}

FEATURE_WIDTHS = {
    'kohlschuetter': 6,
    'weninger': 2,
    'readability': 1,
    'css': 36,
}


def get_feature(name):
    """dragnet/features/__init__.py:8-21 equivalent."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError('invalid feature name: "%s"' % name) from None


def compute(blocks, features=DEFAULT_FEATURES):
    """FeatureUnion.transform equivalent: hstack of per-feature matrices.

    Raises ValueError for <3 blocks (via kohlschuetter), which callers map
    to an all-boilerplate prediction (extractor.py:211-212).
    """
    mats = [get_feature(name)(blocks) for name in features]
    return np.hstack(mats)


def n_features(features=DEFAULT_FEATURES):
    return sum(FEATURE_WIDTHS[name] for name in features)


#: per-column names of each feature family, in vector order
FEATURE_COLUMN_NAMES = {
    'kohlschuetter': ('prev_link_density', 'prev_text_density',
                      'link_density', 'text_density',
                      'next_link_density', 'next_text_density'),
    'weninger': ('ctr_smoothed', 'ctr_delta_smoothed'),
    'readability': ('readability_score',),
    'css': tuple('css_%d' % i for i in range(36)),
    'clustered_weninger': ('weninger_cluster_flag',),
}


def feature_names(features=DEFAULT_FEATURES):
    """Flat column names matching the concatenated feature vector."""
    out = []
    for fam in features:
        cols = FEATURE_COLUMN_NAMES.get(
            fam, tuple('%s_%d' % (fam, i)
                       for i in range(FEATURE_WIDTHS[fam])))
        out.extend('%s.%s' % (fam, c) for c in cols)
    return out
