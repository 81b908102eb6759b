"""S2/S3/S5 gold-format round-trips, F3/F6 optional features, M6 API,
E3 eval, streaming extraction."""

import pytest

import pyspark.sql.functions as F


@pytest.mark.spark
class TestGoldIO:
    def test_corrected_roundtrip(self, spark):
        from dragnet_spark.sources.gold_io import (
            format_corrected, parse_corrected)
        gold = spark.createDataFrame(
            [('d1', 'main content here', 'a comment'),
             ('d2', 'content only', '')],
            'doc_id string, content_text string, comments_text string')
        rt = parse_corrected(format_corrected(gold), 'corrected_text')
        rows = {r.doc_id: r for r in rt.collect()}
        assert rows['d1'].content_text == 'main content here'
        assert rows['d1'].comments_text == 'a comment'
        assert rows['d2'].content_text == 'content only'
        assert rows['d2'].comments_text == ''

    def test_parse_corrected_no_delimiter(self, spark):
        from dragnet_spark.sources.gold_io import parse_corrected
        df = spark.createDataFrame([('d', 'just content, no comments')],
                                   'doc_id string, corrected_text string')
        r = parse_corrected(df).collect()[0]
        assert r.content_text == 'just content, no comments'
        assert r.comments_text == ''

    def test_cleaneval_mode(self, spark):
        from dragnet_spark.sources.gold_io import (
            cleaneval_text, parse_corrected_cleaneval)
        html = '<html><body><p>main <b>bold</b> text</p>tail words</body></html>'
        # fragments keep their own whitespace; the join adds one more --
        # matching ' '.join(text_from_subtree(tree)) in the reference
        assert cleaneval_text(html) == 'main  bold  text tail words'
        df = spark.createDataFrame([('d1', html)],
                                   'doc_id string, corrected_text string')
        r = parse_corrected_cleaneval(df).collect()[0]
        assert 'main' in r.content_text and 'tail words' in r.content_text
        assert r.comments_text == ''

    def test_block_tsv_roundtrip(self, spark, sf_dir):
        from dragnet_spark.operators.labeling import gold_blocks
        from dragnet_spark.sources.gold_io import (
            format_block_tsv, parse_block_tsv)
        from dragnet_spark.sources.synthesis import synthesize_corpus
        spans_df, gold_df = synthesize_corpus(spark, sf_dir,
                                              include_edge_docs=False)
        gb = gold_blocks(spans_df.limit(20), gold_df).cache()
        rt = parse_block_tsv(format_block_tsv(gb))
        orig = gb.select('doc_id', 'block_idx', 'content_frac',
                         'label_content', 'weight')
        back = rt.select('doc_id', 'block_idx', 'content_frac',
                         'label_content', 'weight')
        diff = orig.exceptAll(back)
        assert diff.count() == 0


@pytest.mark.spark
class TestExtraFeatures:
    @pytest.fixture(scope='class')
    def blocks(self, spark, sf_dir):
        from dragnet_spark.operators.blocks_df import blockify_df
        from dragnet_spark.sources.synthesis import synthesize_corpus
        spans_df, _ = synthesize_corpus(spark, sf_dir,
                                        include_edge_docs=False)
        return blockify_df(spans_df.limit(100)).where(
            F.size('features') > 0).cache()

    def test_standardizer(self, spark, blocks):
        from dragnet_spark.operators.extra_features import (
            fit_standardizer, standardize)
        mean, std = fit_standardizer(blocks)
        assert mean.shape == (9,)
        out = standardize(blocks, mean, std)
        stats = out.agg(
            F.avg(F.col('features_std')[2]).alias('m'),
            F.stddev_pop(F.col('features_std')[2]).alias('s')).first()
        assert abs(stats['m']) < 1e-9
        assert abs(stats['s'] - 1.0) < 1e-6

    def test_clustered_weninger(self, spark, blocks):
        from dragnet_spark.operators.extra_features import ClusteredWeninger
        cw = ClusteredWeninger().fit(blocks)
        assert cw.centers.shape == (3, 2)
        assert (cw.centers[0] == 0.0).all()
        out = cw.transform(blocks)
        vals = {r.clustered_weninger for r in
                out.select('clustered_weninger').distinct().collect()}
        assert vals <= {0, 1}
        assert len(vals) == 2  # both clusters populated


@pytest.mark.spark
class TestConvenienceAPI:
    def test_extract_variants(self, spark, sf_dir):
        import dragnet_spark as dn
        from dragnet_spark.sources.synthesis import synthesize_corpus
        spans_df, gold_df = synthesize_corpus(spark, sf_dir,
                                              include_edge_docs=False)
        sample = spans_df.limit(10).cache()
        content = dn.extract_content(sample).collect()
        comments = dn.extract_comments(sample).collect()
        both = dn.extract_content_and_comments(sample).collect()
        assert len(content) == len(comments) == len(both) == 10
        c = {r.doc_id: r.content_text for r in content}
        m = {r.doc_id: r.content_text for r in comments}
        b = {r.doc_id: r.content_text for r in both}
        # combined output is a superset (in tokens) of content for most docs
        assert sum(len(b[d]) >= len(c[d]) for d in c) >= 8
        assert any(m[d] != c[d] for d in c)


@pytest.mark.spark
class TestEvalExtras:
    def test_evaluate_extracted_tokens(self, spark):
        from dragnet_spark.operators.metrics import evaluate_extracted_tokens
        pred = spark.createDataFrame([('d1', 'a b c d')],
                                     'doc_id string, content_text string')
        gold = spark.createDataFrame([('d1', 'a b x d')],
                                     'doc_id string, content_text string')
        r = evaluate_extracted_tokens(pred, gold).collect()[0]
        assert abs(r.jaccard - 3 / 5) < 1e-12
        assert r.edit_distance == 1


@pytest.mark.spark
class TestStatefulStreamingDedup:
    def test_first_seen_dedup_across_batches(self, spark, tmp_path):
        from dragnet_spark.streaming import run_dedup_stream
        src = str(tmp_path / 'src')
        out = str(tmp_path / 'out')
        ckpt = str(tmp_path / 'ckpt')
        batch1 = [('h001/doc-1', 'alpha text'), ('h001/doc-2', 'beta text'),
                  ('h002/doc-3', 'alpha text')]
        spark.createDataFrame(batch1, 'doc_id string, content_text string'
                              ).write.mode('append').parquet(src)
        run_dedup_stream(spark, src, out, ckpt)
        r1 = {r.doc_id: r for r in spark.read.parquet(out).collect()}
        assert r1['h001/doc-1'].is_first_seen
        assert r1['h001/doc-2'].is_first_seen
        # same content, different host: independent state shard
        assert r1['h002/doc-3'].is_first_seen

        # second micro-batch: duplicates detected against persisted state
        batch2 = [('h001/doc-4', 'alpha text'), ('h001/doc-5', 'gamma new')]
        spark.createDataFrame(batch2, 'doc_id string, content_text string'
                              ).write.mode('append').parquet(src)
        run_dedup_stream(spark, src, out, ckpt)
        r2 = {r.doc_id: r for r in spark.read.parquet(out).collect()}
        assert not r2['h001/doc-4'].is_first_seen  # dup of doc-1
        assert r2['h001/doc-5'].is_first_seen


@pytest.mark.spark
class TestStreaming:
    def test_file_stream_extraction(self, spark, sf_dir, tmp_path):
        from dragnet_spark.sources.synthesis import synthesize_corpus
        from dragnet_spark.streaming import run_file_stream
        spans_df, _ = synthesize_corpus(spark, sf_dir,
                                        include_edge_docs=False)
        src = str(tmp_path / 'src')
        out = str(tmp_path / 'out')
        ckpt = str(tmp_path / 'ckpt')
        sample = spans_df.limit(50)
        sample.write.parquet(src)
        run_file_stream(spark, src, out, ckpt)
        got = spark.read.parquet(out)
        assert got.count() == 50
        assert set(got.columns) == {'doc_id', 'spans', 'content_text',
                                    'status'}
        # restart with no new files: exactly-once, no duplicates
        run_file_stream(spark, src, out, ckpt)
        assert spark.read.parquet(out).count() == 50
