"""Distributed model training (SURVEY.md §2.4 M1-M2, §3.2).

Replaces the reference's in-memory sklearn fit (``extractor.py:69-95``)
with ``pyspark.ml.classification.LogisticRegression`` over the labeled
blocks DataFrame: the per-doc feature matrices the reference concatenates
on one machine stay distributed; LBFGS aggregates gradients across
executors.  Weights (token counts capped at 200) ride ``weightCol``.

The document-granular 80/20 split (``model_training.py:99-100``) is
reproduced deterministically via a hash of doc_id -- stable across
cluster sizes and reruns, unlike randomSplit on exploded blocks (which
would leak blocks of one doc across the split).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..model import LogisticModel

TRAIN_FRACTION = 0.8


def with_split(gold_blocks_df, train_fraction=TRAIN_FRACTION):
    """Add is_train: deterministic doc-granular split (seed-42 analogue)."""
    bucket = F.pmod(F.xxhash64(F.col('doc_id'), F.lit(42)), F.lit(100))
    return gold_blocks_df.withColumn(
        'is_train', (bucket < int(train_fraction * 100)).cast('int'))


def _label_col(to_extract):
    if 'content' in to_extract and 'comments' in to_extract:
        # extractor.py:137-139: logical OR of the two labels
        return F.greatest('label_content', 'label_comments')
    if 'content' in to_extract:
        return F.col('label_content')
    return F.col('label_comments')


def train_model(gold_blocks_df, to_extract=('content',), reg_param=1e-4,
                max_iter=100, prob_threshold=0.5):
    """Labeled blocks -> LogisticModel (re-derived weights, never ported).

    Blocks from docs with <3 blocks carry null features and are excluded,
    matching ``extractor.py:120-125``.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    df = (gold_blocks_df
          .where(F.col('features').isNotNull())
          .select(array_to_vector('features').alias('fv'),
                  _label_col(to_extract).alias('label'),
                  F.col('weight').cast('double').alias('weight'))
          # blocks past the LCS truncation cap carry null (unknown)
          # labels: exclude, never train on a silent 0
          .where(F.col('label').isNotNull()))
    lr = LogisticRegression(
        featuresCol='fv', labelCol='label', weightCol='weight',
        maxIter=max_iter, regParam=reg_param, elasticNetParam=0.0,
        standardization=True, family='binomial')
    fitted = lr.fit(df)
    return LogisticModel(fitted.coefficients.toArray(), fitted.intercept,
                         prob_threshold=prob_threshold)


def tune_model(gold_blocks_df, to_extract=('content',), prob_threshold=0.5,
               reg_grid=(1e-5, 1e-4, 1e-3, 1e-2), num_folds=3, seed=42):
    """E4 grid search (``model_training.py:127-205``): the reference's
    ``GridSearchCV(cv=5, scoring='f1')`` becomes ``CrossValidator`` +
    ``ParamGridBuilder`` over regParam, F1 via
    ``MulticlassClassificationEvaluator`` -- folds and candidate fits are
    distributed Spark jobs instead of joblib processes.

    Returns (best LogisticModel, {regParam: mean_f1}).
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    df = (gold_blocks_df
          .where(F.col('features').isNotNull())
          .select(array_to_vector('features').alias('fv'),
                  _label_col(to_extract).cast('double').alias('label'),
                  F.col('weight').cast('double').alias('weight'))
          .where(F.col('label').isNotNull()))
    lr = LogisticRegression(
        featuresCol='fv', labelCol='label', weightCol='weight',
        maxIter=100, elasticNetParam=0.0, standardization=True,
        family='binomial')
    grid = ParamGridBuilder().addGrid(
        lr.regParam, list(reg_grid)).build()
    evaluator = MulticlassClassificationEvaluator(
        labelCol='label', metricName='f1', beta=1.0, weightCol='weight')
    cv = CrossValidator(estimator=lr, estimatorParamMaps=grid,
                        evaluator=evaluator, numFolds=num_folds, seed=seed,
                        parallelism=4)
    fitted = cv.fit(df)
    best = fitted.bestModel
    scores = {g[lr.regParam]: m
              for g, m in zip(grid, fitted.avgMetrics)}
    return (LogisticModel(best.coefficients.toArray(), best.intercept,
                          prob_threshold=prob_threshold), scores)
