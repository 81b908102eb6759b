"""Feature-ablation report (reference paper Table 2 style): train the
seeded LR on subsets of the 9-column default union and report block/token
metrics per subset.  Writes dragnet_spark/models/ablation.json.

Subsets slice the jointly-computed feature vector (kohlschuetter 0-5,
weninger 6-7, readability 8); css features are excluded from the default
union (as in the reference's shipped models) and so from this report.

Usage: python scripts/feature_ablation.py [sf_dir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SUBSETS = {
    'kohlschuetter': [0, 1, 2, 3, 4, 5],
    'weninger': [6, 7],
    'readability': [8],
    'kohlschuetter+weninger': [0, 1, 2, 3, 4, 5, 6, 7],
    'kohlschuetter+readability': [0, 1, 2, 3, 4, 5, 8],
    'all': [0, 1, 2, 3, 4, 5, 6, 7, 8],
}


def main(sf_dir='/root/testdata/sf0.01'):
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    from dragnet_spark.model import LogisticModel
    from dragnet_spark.operators.extract import extract
    from dragnet_spark.operators.labeling import gold_blocks
    from dragnet_spark.operators.metrics import token_f1
    from dragnet_spark.operators.training import with_split
    from dragnet_spark.plans.session import get_spark
    from dragnet_spark.sources.synthesis import synthesize_corpus

    spark = get_spark('dragnet-ablation')
    spans_df, gold_df = synthesize_corpus(spark, sf_dir)
    labeled = with_split(gold_blocks(spans_df, gold_df)).cache()
    test_ids = labeled.where('is_train = 0').select('doc_id').distinct()
    test_spans = spans_df.join(test_ids, 'doc_id').cache()

    report = {}
    for name, idx in SUBSETS.items():
        sub = F.array(*[F.col('features')[i] for i in idx])
        df = (labeled.where('is_train = 1')
              .where(F.col('features').isNotNull())
              .where(F.col('label_content').isNotNull())
              .select(array_to_vector(sub).alias('fv'),
                      F.col('label_content').alias('label'),
                      F.col('weight').cast('double').alias('weight')))
        lr = LogisticRegression(featuresCol='fv', labelCol='label',
                                weightCol='weight', maxIter=100,
                                regParam=1e-4, elasticNetParam=0.0,
                                standardization=True, family='binomial')
        fitted = lr.fit(df)
        # expand subset coefficients into the full 9-slot model (zeros
        # elsewhere) so the fused extraction stage runs unchanged
        coef = [0.0] * 9
        for j, i in enumerate(idx):
            coef[i] = float(fitted.coefficients[j])
        model = LogisticModel(coef, fitted.intercept)
        tf = token_f1(extract(test_spans, model=model), gold_df).collect()[0]
        report[name] = {k: round(tf[k], 4)
                        for k in ('precision', 'recall', 'f1')}
        print('%-28s %s' % (name, json.dumps(report[name])))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'dragnet_spark', 'models',
        'ablation.json')
    with open(out, 'w') as f:
        json.dump(report, f, indent=2)
    spark.stop()


if __name__ == '__main__':
    main(*sys.argv[1:])
