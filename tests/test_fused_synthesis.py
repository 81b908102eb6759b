"""Equality pins for the r06 single-stage synthesis fusions.

Each fused wrapper (guide §4.1: synthesis + kernel in ONE python stage)
must produce exactly the rows of the two-stage form it replaced
(``synthesize_corpus`` -> operator).  The r06 A/B collects verified this
once in-session; these tests pin it against future kernel or fusion
edits.  ``synthesize_and_extract`` itself is pinned by
``test_extract.test_fused_synthesize_and_extract_equivalent``.
"""

import pytest


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.spark
def test_fused_blockify_equals_two_stage(spark, sf_dir):
    from dragnet_spark.operators.blocks_df import (blockify_df,
                                                   synthesize_and_blockify)
    from dragnet_spark.sources.synthesis import synthesize_corpus

    spans_df, _ = synthesize_corpus(spark, sf_dir, include_edge_docs=False)
    two = blockify_df(spans_df)
    one = synthesize_and_blockify(spark, sf_dir)
    assert sorted(one.columns) == sorted(two.columns)
    cols = sorted(one.columns)
    # same python kernel on byte-identical inputs -> bit-identical rows
    assert _sorted_rows(one.select(*cols)) == _sorted_rows(two.select(*cols))


@pytest.mark.spark
def test_fused_labeling_equals_two_stage(spark, sf_dir):
    from dragnet_spark.operators.labeling import (gold_blocks,
                                                  synthesize_and_label)
    from dragnet_spark.sources.synthesis import synthesize_corpus

    spans_df, gold_df = synthesize_corpus(spark, sf_dir,
                                          include_edge_docs=False)
    two = gold_blocks(spans_df, gold_df)
    one = synthesize_and_label(spark, sf_dir)
    assert sorted(one.columns) == sorted(two.columns)
    cols = sorted(one.columns)
    assert _sorted_rows(one.select(*cols)) == _sorted_rows(two.select(*cols))


@pytest.mark.spark
def test_fused_token_f1_counts_match_jvm_twin(spark, sf_dir):
    # the python-set counts + JVM ratio path must reproduce the all-JVM
    # tokenize/array_distinct/array_intersect per-doc metrics exactly
    import pyspark.sql.functions as F

    from dragnet_spark.operators.extract import extract
    from dragnet_spark.operators.metrics import (token_f1_from_counts,
                                                 token_f1_per_doc)
    from dragnet_spark.sources.synthesis import (
        synthesize_corpus, synthesize_extract_gold_counts)

    spans_df, gold_df = synthesize_corpus(spark, sf_dir,
                                          include_edge_docs=False)
    two = token_f1_per_doc(
        extract(spans_df).select('doc_id', 'content_text')
        .join(gold_df.select(
            'doc_id', F.col('content_text').alias('content_text_gold')),
            'doc_id'))
    one = token_f1_from_counts(
        synthesize_extract_gold_counts(spark, sf_dir))
    assert sorted(one.columns) == sorted(two.columns)
    cols = sorted(one.columns)
    assert _sorted_rows(one.select(*cols)) == _sorted_rows(two.select(*cols))


@pytest.mark.spark
def test_fused_pdf_extract_equals_two_stage(spark, sf_dir):
    from dragnet_spark.operators.pdf_extract import (
        pdf_corpus, pdf_extract_content, synthesize_and_extract_pdf)

    two = pdf_extract_content(pdf_corpus(spark, sf_dir))
    one = synthesize_and_extract_pdf(spark, sf_dir)
    assert sorted(one.columns) == sorted(two.columns)
    cols = sorted(one.columns)
    assert _sorted_rows(one.select(*cols)) == _sorted_rows(two.select(*cols))
