"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing."""

import numpy as np
import pytest

import pyspark.sql.functions as F


@pytest.fixture(scope='module')
def docs(spark):
    rows = [
        (1, 'the quick brown fox jumps over the lazy dog again and again'),
        (2, 'the quick brown fox jumps over the lazy dog again and again'),
        (3, 'the quick brown fox jumps over the lazy cat again and again'),
        (4, 'completely different text about spark pipelines at scale'),
        (5, 'der hund läuft nicht mit der katze und das ist gut zu wissen'),
        (6, '报道一出中文内容非常多的文本在这里继续延伸下去没有空格'),
    ]
    return spark.createDataFrame(rows, 'doc_id long, text string')


@pytest.mark.spark
class TestDedup:
    def test_exact_duplicates(self, spark, docs):
        from dragnet_spark.operators.dedup import exact_duplicates
        out = exact_duplicates(docs).collect()
        groups = {r.content_sig: r for r in out}
        dup = [r for r in out if r.dup_count == 2]
        assert len(dup) == 1
        assert dup[0].canonical_doc_id == 1
        assert len(groups) == 5

    def test_jaccard_pairs(self, spark, docs):
        from dragnet_spark.operators.dedup import jaccard_pairs
        out = {(r.doc_a, r.doc_b): r.jaccard
               for r in jaccard_pairs(docs, threshold=0.5).collect()}
        assert out[(1, 2)] == 1.0
        assert (1, 4) not in out
        # doc3 differs by one token: jaccard = 9/11 (distinct sets)
        assert abs(out[(1, 3)] - 9 / 11) < 1e-6  # output rounded to 6dp

    def test_minhash_finds_exact_dup(self, spark, docs):
        from dragnet_spark.operators.dedup import minhash_near_duplicates
        out = {(r.doc_a, r.doc_b): r.jaccard
               for r in minhash_near_duplicates(docs, threshold=0.9).collect()}
        assert out.get((1, 2)) == 1.0

    def test_simhash_exact_dup_distance_zero(self, spark, docs):
        from dragnet_spark.operators.dedup import simhash_near_duplicates
        out = {(r.doc_a, r.doc_b): r.hamming
               for r in simhash_near_duplicates(docs).collect()}
        assert out.get((1, 2)) == 0


@pytest.mark.spark
class TestSimilarity:
    @pytest.fixture(scope='class')
    def emb(self, spark):
        rs = np.random.RandomState(7)
        base = rs.standard_normal((20, 16)).astype(np.float32)
        base[1] = base[0] + 0.01 * rs.standard_normal(16).astype(np.float32)
        rows = [(i, base[i].tolist()) for i in range(20)]
        return spark.createDataFrame(rows, 'vec_id long, embedding array<float>')

    def test_bruteforce_topk_finds_planted_neighbor(self, spark, emb):
        from dragnet_spark.operators.similarity import cosine_topk
        q = emb.where('vec_id = 0')
        out = cosine_topk(emb, q, k=3).collect()
        assert [r.rank for r in out] == [1, 2, 3]
        assert out[0].neighbor_id == 1  # the planted near-duplicate

    def test_lsh_topk_subset_of_bruteforce_space(self, spark, emb):
        from dragnet_spark.operators.similarity import lsh_topk
        q = emb.where('vec_id = 0')
        out = lsh_topk(emb, q, k=3, bands=8, bits=4).collect()
        assert out, 'no candidates -- banding too aggressive'
        assert out[0].neighbor_id == 1

    def test_embedding_near_duplicates(self, spark, emb):
        from dragnet_spark.operators.similarity import embedding_near_duplicates
        out = embedding_near_duplicates(emb, threshold=0.99, bands=8,
                                        bits=4).collect()
        assert {(r.vec_a, r.vec_b) for r in out} == {(0, 1)}


@pytest.mark.spark
class TestTextAnalysis:
    def test_language_id(self, spark, docs):
        from dragnet_spark.operators.text_analysis import language_id
        out = {r.doc_id: r.pred_lang for r in language_id(docs).collect()}
        assert out[1] == 'en'
        assert out[5] == 'de'
        assert out[6] == 'zh'

    def test_token_counts(self, spark, docs):
        from dragnet_spark.operators.text_analysis import token_counts
        r = {x.doc_id: x for x in token_counts(docs).collect()}
        assert r[1].n_tokens == 12
        assert r[1].n_distinct_tokens == 10

    def test_fingerprints_dup_keys_match(self, spark, docs):
        from dragnet_spark.operators.text_analysis import fingerprints
        r = {x.doc_id: x for x in fingerprints(docs).collect()}
        assert r[1].content_sig == r[2].content_sig
        assert r[1].tokenset_sig == r[2].tokenset_sig
        assert r[1].content_sig != r[3].content_sig


@pytest.mark.spark
class TestMultimodal:
    def test_media_plumbing(self, spark, docs):
        from dragnet_spark.operators.multimodal import (
            decode_media, extract_media_features, media_table)
        media = media_table(docs)
        feats = extract_media_features(media, n_features=8).collect()
        assert len(feats) == docs.count()
        for r in feats:
            assert len(r.features) == 8
            assert abs(sum(r.features) - 1.0) < 1e-9
        with pytest.raises(NotImplementedError):
            decode_media('image', b'\xff\xd8')
