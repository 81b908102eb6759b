"""Phase-3 hard corpus (cross-host template families, multilingual
chrome) + template mining."""

import pytest

import pyspark.sql.functions as F


@pytest.mark.spark
class TestHardCorpus:
    @pytest.fixture(scope='class')
    def hard(self, spark):
        from dragnet_spark.sources.synthesis import synthesize_hard_corpus
        spans_df, gold_df = synthesize_hard_corpus(
            spark, '/root/testdata/sf0.001')
        return spans_df.cache(), gold_df.cache()

    def test_gold_is_chrome_invariant(self, spark, hard):
        # the hard corpus re-skins documents but must not change gold
        from dragnet_spark.sources.synthesis import synthesize_corpus
        _, gold_easy = synthesize_corpus(spark, '/root/testdata/sf0.001',
                                         include_edge_docs=False)
        _, gold_hard = hard
        a = {r.doc_id: (r.content_text, r.comments_text)
             for r in gold_easy.collect()}
        b = {r.doc_id: (r.content_text, r.comments_text)
             for r in gold_hard.collect()}
        assert a == b

    def test_all_four_templates_render(self, spark, hard):
        spans_df, _ = hard
        raw = spans_df.select(F.array_join(
            F.transform('spans', lambda s: s['text']), ' ').alias('t'))
        markers = {'default': 'Most popular posts',
                   'alt': 'unlimited digital access',
                   'de': 'Datenschutzerklärung',
                   'zh': '热门文章排行'}
        for fam, needle in markers.items():
            n = raw.where(F.col('t').contains(needle)).count()
            assert n > 20, (fam, n)

    def test_extraction_robust_to_multilingual_chrome(self, spark, hard):
        # the shipped model must hold its F1 when half the chrome is
        # non-English: density/tag features are language-agnostic
        from dragnet_spark.operators.extract import extract
        from dragnet_spark.operators.metrics import token_f1
        spans_df, gold_df = hard
        row = token_f1(extract(spans_df), gold_df).collect()[0]
        assert row['f1'] >= 0.8, row

    def test_template_families_cross_hosts(self, spark, hard):
        from dragnet_spark.operators.templates import template_families
        spans_df, _ = hard
        fams_df = template_families(spans_df)
        # the r03 implementation collected the edge list AND every
        # (doc_id, host) row to the driver; the plan of the DataFrame
        # version must contain no locally-materialized doc-level scan
        plan = fams_df._jdf.queryExecution().optimizedPlan().toString()
        assert 'LocalTableScan' not in plan, plan
        assert 'ExistingRDD' not in plan, plan
        fams = fams_df.collect()
        # four chrome families, each spanning many hosts
        assert len(fams) == 4, fams
        assert sum(f.n_docs for f in fams) == 500
        assert all(f.n_hosts >= 5 for f in fams), fams
        assert all(f.converged for f in fams)


@pytest.mark.spark
class TestConnectedComponents:
    """propagate_min_labels: the DataFrame-only CC behind template
    mining and duplicate-cluster rollups (VERDICT r03 #1)."""

    def test_two_components_exact_labels(self, spark):
        from dragnet_spark.operators.components import propagate_min_labels
        nodes = spark.createDataFrame(
            [(x,) for x in 'abcdefg'], 'doc_id string')
        # component 1: a-b-c-d (a path); component 2: e-f; g isolated
        edges = spark.createDataFrame(
            [('b', 'a'), ('c', 'b'), ('d', 'c'), ('f', 'e')],
            'src string, dst string')
        labels, converged = propagate_min_labels(nodes, edges)
        assert converged
        got = {r.doc_id: r.label for r in labels.collect()}
        assert got == {'a': 'a', 'b': 'a', 'c': 'a', 'd': 'a',
                       'e': 'e', 'f': 'e', 'g': 'g'}

    def test_long_chain_converges_logarithmically(self, spark):
        # a chain-capped mega-bucket emits one long sorted-adjacent
        # chain: 100k nodes, diameter 100k -- pointer jumping must close
        # it in O(log d) rounds, entirely in DataFrames (driver flat)
        from dragnet_spark.operators.components import propagate_min_labels
        import pyspark.sql.functions as F
        n = 100_000
        nodes = spark.range(n).select(
            F.format_string('d%07d', 'id').alias('doc_id'))
        edges = spark.range(1, n).select(
            F.format_string('d%07d', 'id').alias('src'),
            F.format_string('d%07d', F.col('id') - 1).alias('dst'))
        labels, converged = propagate_min_labels(nodes, edges,
                                                 max_rounds=24)
        assert converged
        n_components = labels.select('label').distinct().count()
        assert n_components == 1
        assert labels.count() == n

    def test_max_rounds_flags_non_convergence(self, spark):
        from dragnet_spark.operators.components import propagate_min_labels
        import pyspark.sql.functions as F
        n = 64
        nodes = spark.range(n).select(
            F.format_string('d%03d', 'id').alias('doc_id'))
        edges = spark.range(1, n).select(
            F.format_string('d%03d', 'id').alias('src'),
            F.format_string('d%03d', F.col('id') - 1).alias('dst'))
        _, converged = propagate_min_labels(nodes, edges, max_rounds=2)
        assert not converged
