"""Training path tests: LCS labeling, Spark ML fit, metric gates.

Mirrors the reference e2e statistical test (test/test_models.py:21-37:
token-level F1 >= 0.8) but with a seeded deterministic pipeline -- no
retries needed (SURVEY.md §5 'what's hard' #4).
"""

import pytest

import pyspark.sql.functions as F

from dragnet_spark.kernels.metrics import evaluation_metrics
from dragnet_spark.operators.extract import extract
from dragnet_spark.operators.labeling import label_document, gold_blocks
from dragnet_spark.operators.metrics import token_f1, block_level_metrics
from dragnet_spark.operators.training import train_model, with_split
from dragnet_spark.sources.synthesis import make_document, synthesize_corpus


def _spanify(spans):
    return [{'kind': k, 'text': t, 'media_ref': m, 'offset': o}
            for k, t, m, o in spans]


class TestLabeling:
    def test_label_document_recovers_generator_structure(self):
        text = ('Alpha bravo charlie delta echo foxtrot. Golf hotel india '
                'juliet kilo lima. Mike november oscar papa quebec romeo. '
                'Sierra tango uniform victor whiskey xray. Yankee zulu one '
                'two three four.')
        spans, gold_c, gold_m = make_document('h001/doc-00000007-0', text)
        rows = label_document('d', _spanify(spans), gold_c, gold_m)
        assert rows, 'no blocks labeled'
        content_rows = [r for r in rows if r['label_content']]
        # every gold line is fully matched by some content block
        gold_lines = gold_c.split('\n')
        matched_texts = [r['text'] for r in content_rows]
        for line in gold_lines:
            assert line in matched_texts
        # nav/footer blocks are labeled boilerplate
        for r in rows:
            if 'Home News' in r['text'] or 'Terms of use' in r['text']:
                assert r['label_content'] == 0
                assert r['label_comments'] == 0
        # comments hit the comments label, not content
        comment_rows = [r for r in rows if r['label_comments']]
        assert comment_rows
        for r in comment_rows:
            assert r['label_content'] == 0

    def test_weight_capped_at_200(self):
        words = ' '.join('tok%d' % i for i in range(500))
        html = '<div>%s</div><p>a b c</p><p>d e f</p>' % words
        rows = label_document(
            'd', [{'kind': 'text', 'text': html, 'media_ref': '', 'offset': 0}],
            words, '')
        assert rows[0]['weight'] == 200
        assert rows[0]['content_frac'] == 1.0

    def test_too_few_blocks_null_features(self):
        rows = label_document(
            'd', [{'kind': 'text', 'text': '<div>only block</div>',
                   'media_ref': '', 'offset': 0}], 'only block', '')
        assert len(rows) == 1
        assert rows[0]['features'] is None

    def test_huge_doc_labels_fully_without_oom(self):
        # VERDICT r01 #3 / r02 #9: a >8k-token doc must flow through
        # labeling with bounded memory.  Since r03 the Hirschberg path
        # covers this 13k x 13k pair FULLY (it fits CELL_BUDGET) in
        # linear space -- no truncation, every block labeled.
        import resource
        from dragnet_spark.kernels.lcs import MAX_TOKENS
        big = ' '.join('tok%d' % i for i in range(MAX_TOKENS + 5000))
        tail = 'omega psi chi phi upsilon tau'
        html = ('<p>alpha beta gamma</p><div>%s</div><p>%s</p>' % (big, tail))
        gold = 'alpha beta gamma ' + big + ' ' + tail
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        rows = label_document(
            'd', [{'kind': 'text', 'text': html, 'media_ref': '', 'offset': 0}],
            gold, '')
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        assert (rss1 - rss0) < 1 << 20, 'labeling grew RSS by >1 GiB'
        assert not any(r['truncated'] for r in rows)
        by_text = {r['text']: r for r in rows}
        first = by_text['alpha beta gamma']
        assert first['content_frac'] == 1.0 and first['label_content'] == 1
        last = by_text[tail]  # past the OLD 8k cap: now fully labeled
        assert last['content_frac'] == 1.0
        assert last['label_content'] == 1
        mid = next(r for r in rows if r['text'].startswith('tok0 '))
        assert mid['content_frac'] == 1.0

    def test_strip_link_tokens_removes_cta_anchor(self):
        # comments mode: anchor-sourced tokens (CTA spam inside a kept
        # comment block) are removed from the assembled text; content
        # mode keeps them (reference parity)
        from dragnet_spark.kernels.blocks import blockify
        from dragnet_spark.operators.extract import _strip_link_tokens
        blocks = blockify(
            b'<div><p>great insightful comment '
            b'<a href="http://spam.example/win">click here to win</a>'
            b'</p></div><p>pad one</p><p>pad two</p>')
        assert blocks[0].text == ('great insightful comment '
                                  'click here to win')
        assert _strip_link_tokens(blocks[0]) == 'great insightful comment'
        # a pure-anchor block strips to empty (dropped by assembly)
        link_only = blockify(
            b'<div><a href="/x">only a link</a></div>'
            b'<p>pad one</p><p>pad two</p>')
        assert _strip_link_tokens(link_only[0]) == ''
        # a block with no anchors is untouched
        assert _strip_link_tokens(blocks[1]) == 'pad one'

    def test_small_doc_not_truncated(self):
        rows = label_document(
            'd', [{'kind': 'text',
                   'text': '<p>aaa bbb</p><p>ccc ddd</p><p>eee</p>',
                   'media_ref': '', 'offset': 0}], 'aaa bbb', '')
        assert all(r['truncated'] is False for r in rows)

    def test_fracs_match_kernel_metrics(self):
        # content_frac is an LCS inclusion fraction; for disjoint gold it's 0
        rows = label_document(
            'd', [{'kind': 'text',
                   'text': '<p>aaa bbb ccc</p><p>xxx yyy zzz</p><p>q w e</p>',
                   'media_ref': '', 'offset': 0}],
            'aaa bbb ccc', '')
        assert rows[0]['content_frac'] == 1.0
        assert rows[1]['content_frac'] == 0.0
        assert rows[0]['label_content'] == 1
        assert rows[1]['label_content'] == 0


@pytest.mark.spark
class TestTrainingSpark:
    def test_train_and_f1_gate(self, spark, sf_dir):
        spans_df, gold_df = synthesize_corpus(spark, sf_dir)
        labeled = with_split(gold_blocks(spans_df, gold_df)).cache()
        model = train_model(labeled.where('is_train = 1'))
        assert model.coef.shape == (9,)

        test_ids = labeled.where('is_train = 0').select('doc_id').distinct()
        extracted = extract(spans_df.join(test_ids, 'doc_id'), model=model)
        row = token_f1(extracted, gold_df).collect()[0]
        assert row['n_docs'] > 10
        # the reference e2e gate (test/test_models.py:34)
        assert row['f1'] >= 0.8, row

    def test_tune_model_grid_search(self, spark, sf_dir):
        from dragnet_spark.operators.training import tune_model
        spans_df, gold_df = synthesize_corpus(spark, sf_dir,
                                              include_edge_docs=False)
        labeled = gold_blocks(spans_df.limit(60), gold_df)
        model, scores = tune_model(labeled, reg_grid=(1e-4, 1e-1),
                                   num_folds=2)
        assert model.coef.shape == (9,)
        assert set(scores) == {1e-4, 1e-1}
        assert all(0.0 <= v <= 1.0 for v in scores.values())

    def test_block_metrics_agg_matches_kernel(self, spark):
        rows = [(1, 1, 10.0), (1, 0, 5.0), (0, 1, 2.0), (0, 0, 20.0),
                (1, 1, 1.0)]
        df = spark.createDataFrame(rows, 'label int, pred int, weight double')
        m = block_level_metrics(df).collect()[0]
        from dragnet_spark.kernels.metrics import block_level_metrics as k
        expected = k([r[0] for r in rows], [r[1] for r in rows],
                     [r[2] for r in rows])
        for key in ('accuracy', 'precision', 'recall', 'f1'):
            assert abs(m[key] - expected[key]) < 1e-12

    def test_token_f1_matches_kernel(self, spark):
        pred = 'skiing sparkling soft snow in soft sun'
        gold = 'soft snow in soft sun soft turns turns'
        df_p = spark.createDataFrame([('d1', pred)], 'doc_id string, content_text string')
        df_g = spark.createDataFrame([('d1', gold)], 'doc_id string, content_text string')
        row = token_f1(df_p, df_g).collect()[0]
        p, r, f1 = evaluation_metrics(pred.split(), gold.split())
        assert abs(row['precision'] - p) < 1e-12
        assert abs(row['recall'] - r) < 1e-12
        assert abs(row['f1'] - f1) < 1e-12


@pytest.mark.spark
class TestExtractorFacade:
    """sklearn-style Extractor class (reference extractor.py:12-95)."""

    @pytest.fixture(scope='class')
    def corpus(self, spark):
        spans_df, gold_df = synthesize_corpus(
            spark, '/root/testdata/sf0.001', include_edge_docs=False)
        return spans_df.cache(), gold_df.cache()

    def test_lr_fit_extract_roundtrip(self, spark, corpus):
        from dragnet_spark.extractor import Extractor
        spans_df, gold_df = corpus
        ex = Extractor(to_extract=('content',)).fit(spans_df, gold_df)
        assert ex.model is not None and ex.model.coef.shape == (9,)
        out = ex.extract(spans_df)
        assert out.columns == ['doc_id', 'spans', 'content_text', 'status']
        row = token_f1(out, gold_df).collect()[0]
        assert row['f1'] >= 0.8
        blocks = ex.extract(spans_df, as_blocks=True)
        assert 'pred' in blocks.columns and 'block_idx' in blocks.columns

    def test_lr_unfitted_uses_shipped_model(self, spark, corpus):
        from dragnet_spark.extractor import Extractor
        spans_df, gold_df = corpus
        out = Extractor().extract(spans_df.limit(20))
        assert out.count() == 20

    def test_gbt_fit_extract(self, spark, corpus):
        from dragnet_spark.extractor import Extractor
        spans_df, gold_df = corpus
        small = spans_df.limit(60)
        ex = Extractor(classifier='gbt', gbt_max_iter=5,
                       gbt_max_depth=3).fit(small, gold_df)
        assert ex.spark_model is not None
        out = ex.extract(small)
        assert out.columns == ['doc_id', 'content_text']
        assert out.count() == small.count()
        row = token_f1(out, gold_df.join(
            small.select('doc_id').distinct(), 'doc_id')).collect()[0]
        assert row['f1'] >= 0.7, row
        blocks = ex.predict(small)
        assert set(r.pred for r in blocks.select('pred').distinct()
                   .collect()) <= {0, 1}

    def test_rf_fit_extract(self, spark, corpus):
        """RandomForest backend -- the Spark ML analogue of the
        reference's default ExtraTreesClassifier()
        (/root/reference/dragnet/extractor.py:48)."""
        from dragnet_spark.extractor import Extractor
        spans_df, gold_df = corpus
        ex = Extractor(classifier='rf').fit(spans_df, gold_df)
        assert ex.spark_model is not None
        assert ex.spark_model.getNumTrees == 50
        out = ex.extract(spans_df)
        assert out.columns == ['doc_id', 'content_text']
        assert out.count() == spans_df.select('doc_id').distinct().count()
        row = token_f1(out, gold_df).collect()[0]
        assert row['f1'] >= 0.8, row
        blocks = ex.predict(spans_df)
        assert set(r.pred for r in blocks.select('pred').distinct()
                   .collect()) <= {0, 1}
        # impurity importances: well-formed simplex over the 9 features
        imps = ex.feature_importances()
        assert len(imps) == 9
        assert abs(sum(v for _, v in imps) - 1.0) < 1e-9

    def test_rf_unfitted_raises(self, spark, corpus):
        from dragnet_spark.extractor import Extractor
        spans_df, _ = corpus
        with pytest.raises(ValueError):
            Extractor(classifier='rf').extract(spans_df)

    def test_gbt_unfitted_raises(self, spark, corpus):
        from dragnet_spark.extractor import Extractor
        spans_df, _ = corpus
        with pytest.raises(ValueError):
            Extractor(classifier='gbt').extract(spans_df)

    def test_feature_importances_both_backends(self, spark, corpus):
        from dragnet_spark.extractor import Extractor
        from dragnet_spark.operators.labeling import gold_blocks
        spans_df, gold_df = corpus
        labeled = gold_blocks(spans_df.limit(60), gold_df)

        # lr (shipped model) with std scaling
        imps = Extractor().feature_importances(labeled)
        names = [n for n, _ in imps]
        vals = [v for _, v in imps]
        assert len(imps) == 9
        assert names[3] == 'kohlschuetter.text_density'
        assert names[8] == 'readability.readability_score'
        assert abs(sum(vals) - 1.0) < 1e-9
        assert all(v >= 0 for v in vals)
        # densities must matter on this corpus
        assert sum(vals[:6]) > 0.2

        # gbt: impurity importances from the fitted ensemble
        ex = Extractor(classifier='gbt', gbt_max_iter=5,
                       gbt_max_depth=3).fit_blocks(labeled)
        gimps = ex.feature_importances()
        assert len(gimps) == 9
        assert abs(sum(v for _, v in gimps) - 1.0) < 1e-9
