"""Train and ship the default content model (E5 train-and-report).

Equivalent of the reference's ``train_model`` driver
(``model_training.py:77-124``): synthesize the gold corpus, label blocks
via LCS, fit the Spark ML LogisticRegression on the train split, report
block-level and token-level metrics on both splits, persist coefficients
to ``dragnet_spark/models/content_lr.json``.

Usage: python scripts/train_default_model.py [sf_dir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from dragnet_spark.model import LogisticModel  # noqa: E402
from dragnet_spark.operators import extract  # noqa: E402
from dragnet_spark.operators.labeling import gold_blocks  # noqa: E402
from dragnet_spark.operators.metrics import block_level_metrics, token_f1  # noqa: E402
from dragnet_spark.operators.training import train_model, with_split  # noqa: E402
from dragnet_spark.plans.session import get_spark  # noqa: E402
from dragnet_spark.sources.synthesis import synthesize_corpus  # noqa: E402


def main(sf_dir='/root/testdata/sf0.01'):
    spark = get_spark('dragnet-train')
    spans_df, gold_df = synthesize_corpus(spark, sf_dir)
    labeled = with_split(gold_blocks(spans_df, gold_df)).cache()

    model = train_model(labeled.where('is_train = 1'))
    print('coefficients:', model.coef.tolist())
    print('intercept:', model.intercept)

    # block-level eval on both splits (E1)
    from pyspark.ml.functions import array_to_vector  # noqa: F401
    import numpy as np

    def preds_df(split):
        df = labeled.where(F.col('is_train') == split).where(
            F.col('features').isNotNull())
        coef = model.coef.tolist()
        expr = F.lit(model.intercept)
        for i, c in enumerate(coef):
            expr = expr + F.col('features')[i] * F.lit(c)
        prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-expr))
        return df.withColumn('pred', (prob > model.prob_threshold).cast('int'))

    report = {}
    for name, split in (('train', 1), ('test', 0)):
        m = block_level_metrics(
            preds_df(split), label_col='label_content').collect()[0]
        report['block_%s' % name] = {k: round(m[k], 4) for k in
                                     ('accuracy', 'precision', 'recall', 'f1')}

    # token-level eval on the test split (E2) via full extraction
    test_ids = labeled.where('is_train = 0').select('doc_id').distinct()
    extracted = extract(spans_df.join(test_ids, 'doc_id'), model=model)
    tf = token_f1(extracted, gold_df).collect()[0]
    report['token_test'] = {k: round(tf[k], 4)
                            for k in ('precision', 'recall', 'f1')}
    report['token_test']['n_docs'] = tf['n_docs']

    print(json.dumps(report, indent=2))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'dragnet_spark', 'models')
    os.makedirs(out, exist_ok=True)
    model.save(os.path.join(out, 'content_lr.json'))
    with open(os.path.join(out, 'content_lr_metrics.json'), 'w') as f:
        json.dump(report, f, indent=2)
    print('saved to', os.path.join(out, 'content_lr.json'))
    spark.stop()


if __name__ == '__main__':
    main(*sys.argv[1:])
