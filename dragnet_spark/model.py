"""Block classifier model container.

A 9-coefficient logistic regression over the default feature union
(kohlschuetter 6 + weninger 2 + readability 1) -- the reference's shipped
models have exactly this shape (``test/test_extractor.py:31``), and the
reference applies ``predict_proba > prob_threshold`` on the class-1 column
(``dragnet/extractor.py:215-221``).

Weights are *re-derived* by ``dragnet_spark.operators.training`` (Spark ML
LogisticRegression on the synthetic gold corpus), never ported.  The
``reference_oracle_model`` below carries the plain-text coefficients the
reference publishes in its own test file; it exists only as a portable
parity oracle for tests (SURVEY.md §5.4) and is reordered from the test's
weninger+kohlschuetter+readability feature order into ours.

The model is a tiny NumPy object captured by closure into the Arrow UDF
(an implicit broadcast -- a 9-float model needs no ``sc.broadcast``).
"""

from __future__ import annotations

import json
import os

import numpy as np

from .kernels.features import DEFAULT_FEATURES, n_features

_MODELS_DIR = os.path.join(os.path.dirname(__file__), 'models')


class LogisticModel:
    """sigmoid(X @ coef + intercept) > prob_threshold."""

    def __init__(self, coef, intercept, prob_threshold=0.5,
                 features=DEFAULT_FEATURES):
        self.coef = np.asarray(coef, dtype=np.float64).ravel()
        self.intercept = float(intercept)
        self.prob_threshold = prob_threshold
        self.features = tuple(features)
        expected = n_features(self.features)
        if self.coef.shape[0] != expected:
            raise ValueError('expected %d coefficients for features %s, got %d'
                             % (expected, self.features, self.coef.shape[0]))

    def predict_proba(self, X):
        z = X @ self.coef + self.intercept
        return 1.0 / (1.0 + np.exp(-z))

    def predict(self, X):
        """Binary content predictions; extractor.py:215-221 semantics."""
        return (self.predict_proba(X) > self.prob_threshold).astype(np.int32)

    # -- persistence (model store, SURVEY.md §2.1 S6) -----------------------
    def to_json(self):
        return json.dumps({
            'coef': self.coef.tolist(),
            'intercept': self.intercept,
            'prob_threshold': self.prob_threshold,
            'features': list(self.features),
        })

    @classmethod
    def from_json(cls, s):
        d = json.loads(s)
        return cls(d['coef'], d['intercept'], d['prob_threshold'],
                   tuple(d['features']))

    def save(self, path):
        with open(path, 'w') as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path):
        with open(path) as f:
            return cls.from_json(f.read())


def reference_oracle_model():
    """The plain-text LR published in the reference's component-equality
    test (``test/test_extractor.py:28-46``), reordered from its
    weninger(2)+kohlschuetter(6)+readability(1) union into our default
    kohlschuetter(6)+weninger(2)+readability(1) order."""
    w = [0.00501458328421719, -0.0006331822163374379]
    k = [-0.6699789320373452, 0.026069227973339763, -1.5552477377277252,
         0.02980432745983307, -0.965575689884716, 0.019509367890934326]
    r = [-0.35692924115362307]
    return LogisticModel(k + w + r, -1.2071425754440765, prob_threshold=0.5)


def default_model(to_extract=('content',)):
    """The shipped model for a to_extract selector ('content',
    'comments', or both): trained in-repo on the synthetic gold corpus
    by ``scripts/train_default_model.py`` if present, else the reference
    oracle coefficients.  Mirrors the reference's lazily-loaded pickled
    model registry (``dragnet/__init__.py:6-27``) without the pickle."""
    if isinstance(to_extract, str):
        to_extract = (to_extract,)
    sel = frozenset(to_extract)
    if sel == {'comments'}:
        fname = 'comments_lr.json'
    elif sel == {'content', 'comments'}:
        fname = 'content_comments_lr.json'
    else:
        fname = 'content_lr.json'
    # importlib.resources first: under spark-submit --py-files the
    # package lives INSIDE a zip, where os.path.exists on the joined
    # path is False -- the silent fallback to the reference-oracle
    # coefficients collapsed extraction quality on real clusters
    # (caught by asserting CONTENT, not just row counts, in the
    # submit smoke).  The filesystem path stays as the fallback for
    # source checkouts on odd importers.
    try:
        from importlib import resources
        ref = resources.files('dragnet_spark') / 'models' / fname
        if ref.is_file():
            return LogisticModel.from_json(ref.read_text())
    except Exception:
        pass
    path = os.path.join(_MODELS_DIR, fname)
    if os.path.exists(path):
        return LogisticModel.load(path)
    return reference_oracle_model()
