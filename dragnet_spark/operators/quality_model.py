"""Model-based document quality scoring + importance resampling.

The soft counterpart of the hard Gopher gates (the DCLM / fastText-
classifier pattern): train a small classifier on cheap weak labels,
score every document with a CONTINUOUS quality probability, then
sample the corpus proportionally to score instead of cutting at a
threshold -- hard gates discard borderline documents wholesale, while
temperature-controlled importance sampling keeps a calibratable amount
of the middle of the distribution (and is how production pipelines
trade corpus size against quality).

Spark shape: features are the numeric columns of
:func:`~dragnet_spark.operators.text_analysis.text_profile` (one
codegen projection, no shuffle), the model is a seeded
``pyspark.ml`` LogisticRegression (weak labels default to the Gopher
quality gate -- distilling the hard rule into a smooth score), and
scoring is ``model.transform`` -- JVM-side, one narrow stage.
Resampling is the same engine-invariant md5-bucket rule as
``deterministic_sample``, with the keep-threshold scaled per document
by ``score^(1/T)``: reproducible across engines, runs, cluster sizes
and partitionings, unlike ``sample()``.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .text_analysis import gopher_quality_flags, text_profile

# numeric text_profile columns used as model features
QUALITY_FEATURES = ('n_tokens', 'n_distinct_tokens', 'n_chars_text',
                    'punct_ratio', 'en_stopword_hits', 'mean_token_len',
                    'cjk_ratio')


def _featurized(docs, text_col):
    from pyspark.ml.functions import array_to_vector
    prof = text_profile(docs.select('doc_id',
                                    F.col(text_col).alias('text')))
    return prof.select(
        'doc_id',
        array_to_vector(F.array(*[F.col(c).cast('double')
                                  for c in QUALITY_FEATURES]))
        .alias('fv'))


def train_quality_classifier(docs, text_col='text', labels=None,
                             reg_param=1e-3, max_iter=100, seed=42):
    """Fit the quality scorer; returns a fitted Spark ML model.

    ``labels``: optional ``(doc_id, label)`` DataFrame of {0,1} weak
    labels.  Default: the Gopher WORD-COUNT sub-rule (n_words in
    [50, 100k]) rather than the full gate conjunction -- a corpus that
    uniformly misses one sub-rule (e.g. a stopword-poor synthetic or
    non-English slice) makes the conjunction single-class and
    untrainable, which is exactly the situation where a smooth
    re-rankable score is wanted.  Pass real labels (human ratings, an
    LLM judge, reference-corpus membership) for the production setup.
    """
    from pyspark.ml.classification import LogisticRegression

    if labels is None:
        flags = gopher_quality_flags(
            docs.select('doc_id', F.col(text_col).alias('text')))
        labels = flags.select(
            'doc_id',
            ((F.col('n_words') >= 50) & (F.col('n_words') <= 100_000))
            .cast('double').alias('label'))
    df = (_featurized(docs, text_col)
          .join(labels.select('doc_id',
                              F.col('label').cast('double')
                              .alias('label')), 'doc_id'))
    lr = LogisticRegression(featuresCol='fv', labelCol='label',
                            maxIter=max_iter, regParam=reg_param,
                            standardization=True, family='binomial')
    # seed is not an LR param (deterministic LBFGS); kept in the
    # signature for API symmetry with the tree backends
    del seed
    return lr.fit(df)


def score_quality(docs, model, text_col='text'):
    """Input rows + a ``quality_score`` column (P(label=1))."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_featurized(docs, text_col))
    probs = scored.select(
        'doc_id',
        vector_to_array('probability')[1].alias('quality_score'))
    return docs.join(probs, 'doc_id')


def quality_weighted_sample(scored, target_frac, temperature=1.0,
                            score_col='quality_score',
                            key_col='doc_id'):
    """Deterministic importance sample: keep each doc with probability
    ``min(1, target_frac * w / mean(w))`` where ``w = score^(1/T)``.

    * ``temperature -> 0``: hard top-quality cut;
    * ``temperature = 1``: proportional to score;
    * ``temperature -> inf``: uniform ``target_frac`` sample.

    Membership is md5(key)-bucket based -- the same docs are kept on
    every engine/run/partitioning.  ``mean(w)`` is one scalar aggregate
    (broadcastable); everything else is a narrow filter.  Expected kept
    fraction == ``target_frac`` up to the ``min(1, .)`` clip on the
    high-score tail.
    """
    w = F.pow(F.greatest(F.col(score_col), F.lit(1e-12)),
              F.lit(1.0 / temperature))
    with_w = scored.withColumn('_w', w)
    mean_w = with_w.agg(F.avg('_w')).collect()[0][0] or 1.0
    keep_p = F.least(F.lit(1.0), F.lit(target_frac) * F.col('_w')
                     / F.lit(float(mean_w)))
    # md5 prefix as a uniform [0, 1) draw per key (8 hex chars)
    draw = (F.conv(F.substring(
        F.md5(F.col(key_col).cast('string').cast('binary')), 1, 8),
        16, 10).cast('double') / F.lit(float(16 ** 8)))
    return (with_w.where(draw < keep_p).drop('_w'))
