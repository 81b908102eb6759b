"""Evaluation metric kernels.

Re-derivations of ``/root/reference/dragnet/util.py:20-114`` (token-level
P/R/F1 under bag-of-words or multiset assumptions, Damerau-Levenshtein) and
``/root/reference/dragnet/model_training.py:19-48`` (weighted block-level
accuracy/precision/recall/F1).  The Spark-side distributed versions live in
``dragnet_spark.operators.metrics``; these kernels are the per-document /
in-memory oracles used by tests.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def evaluation_metrics(predicted, actual, bow=True):
    """Token-level (precision, recall, f1); util.py:66-114."""
    if bow:
        p = set(predicted)
        a = set(actual)
        true_positive = sum(1 for token in p if token in a)
    else:
        act = defaultdict(int)
        for token in actual:
            act[token] += 1
        true_positive = 0
        for token in predicted:
            if act[token] > 0:
                true_positive += 1
                act[token] -= 1
        p = predicted
        a = actual
    precision = true_positive / len(p) if len(p) else 0.0
    recall = true_positive / len(a) if len(a) else 0.0
    denom = precision + recall
    f1 = 2.0 * precision * recall / denom if denom else 0.0
    return (precision, recall, f1)


def dameraulevenshtein(seq1, seq2):
    """O(N*M) time / O(M) space Damerau-Levenshtein; util.py:20-63."""
    oneago = None
    thisrow = list(range(1, len(seq2) + 1)) + [0]
    for x in range(len(seq1)):
        twoago, oneago, thisrow = oneago, thisrow, [0] * len(seq2) + [x + 1]
        for y in range(len(seq2)):
            delcost = oneago[y] + 1
            addcost = thisrow[y - 1] + 1
            subcost = oneago[y - 1] + (seq1[x] != seq2[y])
            thisrow[y] = min(delcost, addcost, subcost)
            if (x > 0 and y > 0 and seq1[x] == seq2[y - 1]
                    and seq1[x - 1] == seq2[y] and seq1[x] != seq2[y]):
                thisrow[y] = min(thisrow[y], twoago[y - 2] + 1)
    return thisrow[len(seq2) - 1]


def block_level_metrics(y_true, y_pred, weights=None):
    """Weighted accuracy/precision/recall/F1 (binary, pos=1);
    model_training.py:19-48 without the sklearn dependency."""
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    w = np.ones_like(y_true) if weights is None else np.asarray(weights, np.float64)
    tp = float(np.sum(w * ((y_true == 1) & (y_pred == 1))))
    fp = float(np.sum(w * ((y_true == 0) & (y_pred == 1))))
    fn = float(np.sum(w * ((y_true == 1) & (y_pred == 0))))
    tn = float(np.sum(w * ((y_true == 0) & (y_pred == 0))))
    total = tp + fp + fn + tn
    accuracy = (tp + tn) / total if total else 0.0
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    denom = precision + recall
    f1 = 2 * precision * recall / denom if denom else 0.0
    return {'accuracy': accuracy, 'precision': precision,
            'recall': recall, 'f1': f1}
