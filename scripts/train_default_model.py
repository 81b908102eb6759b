"""Train and ship the default models (E5 train-and-report).

Equivalent of the reference's ``train_model`` driver
(``model_training.py:77-124``) for all three shipped variants (content,
comments, content+comments -- like the reference's three pickled
models): synthesize the gold corpus, label blocks via LCS, fit the Spark
ML LogisticRegression per variant on the train split, report block- and
token-level metrics, persist coefficients to ``dragnet_spark/models/``.

Usage: python scripts/train_default_model.py [sf_dir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from dragnet_spark.operators.extract import extract  # noqa: E402
from dragnet_spark.operators.labeling import gold_blocks  # noqa: E402
from dragnet_spark.operators.metrics import block_level_metrics, token_f1  # noqa: E402
from dragnet_spark.operators.training import (  # noqa: E402
    _label_col, train_model, with_split)
from dragnet_spark.plans.session import get_spark  # noqa: E402
from dragnet_spark.sources.synthesis import synthesize_corpus  # noqa: E402

VARIANTS = {
    'content': ('content',),
    'comments': ('comments',),
    'content_comments': ('content', 'comments'),
}


def gold_for(gold_df, to_extract):
    """Gold text column matching the extraction target."""
    if set(to_extract) == {'content', 'comments'}:
        col = F.concat_ws('\n', 'content_text', 'comments_text')
    elif 'comments' in to_extract:
        col = F.col('comments_text')
    else:
        col = F.col('content_text')
    return gold_df.select('doc_id', col.alias('content_text'))


def main(sf_dir='/root/testdata/sf0.01'):
    spark = get_spark('dragnet-train')
    spans_df, gold_df = synthesize_corpus(spark, sf_dir)
    labeled = with_split(gold_blocks(spans_df, gold_df)).cache()
    test_ids = labeled.where('is_train = 0').select('doc_id').distinct().cache()
    test_spans = spans_df.join(test_ids, 'doc_id').cache()

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'dragnet_spark', 'models')
    os.makedirs(out, exist_ok=True)

    full_report = {}
    for name, to_extract in VARIANTS.items():
        model = train_model(labeled.where('is_train = 1'),
                            to_extract=to_extract)

        def preds_df(split):
            df = labeled.where(F.col('is_train') == split).where(
                F.col('features').isNotNull())
            expr = F.lit(model.intercept)
            for i, c in enumerate(model.coef.tolist()):
                expr = expr + F.col('features')[i] * F.lit(c)
            prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-expr))
            return df.select(
                _label_col(to_extract).alias('label'), 'weight',
                (prob > model.prob_threshold).cast('int').alias('pred'))

        report = {}
        for split_name, split in (('train', 1), ('test', 0)):
            m = block_level_metrics(preds_df(split)).collect()[0]
            report['block_%s' % split_name] = {
                k: round(m[k], 4)
                for k in ('accuracy', 'precision', 'recall', 'f1')}

        # comments-only extraction strips anchor-sourced tokens (CTA/spam
        # chrome inside comment blocks; see extract_comments)
        extracted = extract(test_spans, model=model,
                            strip_link_tokens=to_extract == ('comments',))
        tf = token_f1(extracted, gold_for(gold_df, to_extract)).collect()[0]
        report['token_test'] = {k: round(tf[k], 4)
                                for k in ('precision', 'recall', 'f1')}
        report['token_test']['n_docs'] = tf['n_docs']
        report['coef'] = [round(c, 6) for c in model.coef.tolist()]
        report['intercept'] = round(model.intercept, 6)
        full_report[name] = report

        model.save(os.path.join(out, '%s_lr.json' % name))
        print(name, json.dumps(report['token_test']))

    with open(os.path.join(out, 'metrics.json'), 'w') as f:
        json.dump(full_report, f, indent=2)
    print(json.dumps(full_report, indent=2))
    spark.stop()


if __name__ == '__main__':
    main(*sys.argv[1:])
