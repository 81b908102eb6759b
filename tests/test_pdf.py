"""PDF/layout kernel + operator tests (north rule: "PDF/layout parse").

The writer (make_pdf) doubles as the spec of the supported PDF 1.4
subset; the round-trip invariant is that parse -> layout -> de-chrome
reproduces the whitespace-normalized source text exactly.
"""

import random
import re
import zlib

import pytest

from dragnet_spark.kernels.pdf import (PAGE_H, extract_text_runs,
                                       layout_blocks, make_pdf,
                                       strip_margin_furniture,
                                       strip_repeated_furniture)

_WS = re.compile(r'[ \t\n\r\f\v]+')


def _roundtrip(paras, **kw):
    pdf = make_pdf('The Title', paras, **kw)
    blocks = strip_margin_furniture(
        strip_repeated_furniture(layout_blocks(extract_text_runs(pdf))))
    body = ' '.join(b['text'] for b in blocks if b['kind'] == 'body')
    heads = [b['text'] for b in blocks if b['kind'] == 'heading']
    return body, heads


class TestKernel:
    def test_single_page_roundtrip(self):
        paras = ['First paragraph with some words.',
                 'Second paragraph follows after a gap.']
        body, heads = _roundtrip(paras, header='Site Header',
                                 footer='footer text')
        assert body.split() == ' '.join(paras).split()
        assert heads == ['The Title']

    def test_multi_page_roundtrip_varied_text(self):
        rng = random.Random(9)
        paras = [' '.join('w%d' % rng.randrange(5000) for _ in range(120))
                 for _ in range(12)]
        body, heads = _roundtrip(paras, header='Running Header',
                                 footer='Running Footer')
        assert body.split() == ' '.join(paras).split()
        assert heads == ['The Title']

    def test_unicode_and_escapes(self):
        paras = ['Unicode 中文 ß — ok', 'Parens (and) back\\slashes \t fine']
        body, _ = _roundtrip(paras)
        assert body.split() == ' '.join(paras).split()

    def test_empty_document(self):
        body, heads = _roundtrip([])
        assert body == ''
        assert heads == ['The Title']

    def test_furniture_stripped_multi_page(self):
        paras = [' '.join('tok%d' % i for i in range(i * 100, i * 100 + 100))
                 for i in range(10)]
        pdf = make_pdf('T', paras, header='Quarterly Report',
                       footer='Confidential')
        blocks = layout_blocks(extract_text_runs(pdf))
        n_pages = len({b['page'] for b in blocks})
        assert n_pages >= 2
        texts_all = ' '.join(b['text'] for b in blocks)
        assert 'Quarterly Report' in texts_all and 'Page 1' in texts_all
        clean = strip_margin_furniture(strip_repeated_furniture(blocks))
        texts = ' '.join(b['text'] for b in clean)
        assert 'Quarterly Report' not in texts
        assert 'Confidential' not in texts
        assert 'Page' not in texts  # page numbers normalized + stripped

    def test_furniture_stripped_single_page_by_zone(self):
        pdf = make_pdf('T', ['one short body paragraph'],
                       header='HDR', footer='FTR')
        blocks = layout_blocks(extract_text_runs(pdf))
        clean = strip_margin_furniture(strip_repeated_furniture(blocks))
        texts = ' '.join(b['text'] for b in clean)
        assert 'HDR' not in texts and 'FTR' not in texts
        assert 'one short body paragraph' in texts

    def test_stream_containing_markers_is_skipped_by_length(self):
        # compressed bytes may contain 'endobj'/'N M obj'; the object
        # scanner must skip streams by /Length, not by marker search
        pdf = make_pdf('T', ['body words here'])
        # craft a raw (uncompressed) stream containing the markers
        payload = b'BT /F1 11 Tf 1 0 0 1 72 700 Tm (kept text) Tj ET'
        fake = (
            b'%PDF-1.4\n'
            b'1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n'
            b'2 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 >>\n'
            b'endobj\n'
            b'4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\n'
            b'endobj\n'
            + (b'5 0 obj\n<< /Length %d >>\nstream\n' % len(payload))
            + payload + b'\nendstream\nendobj\n'
            b'6 0 obj\n<< /Length 14 >>\nstream\n'
            b'endobj 7 0 obj\nendstream\nendobj\n')
        runs = extract_text_runs(fake)
        assert [r['text'] for r in runs] == ['kept text']
        assert extract_text_runs(pdf)  # and the writer output still parses

    def test_malformed_inputs_never_raise(self):
        for data in (b'', b'not a pdf', b'%PDF-1.4\ngarbage',
                     b'%PDF-1.4\n1 0 obj\n<< /Length 999999 >>\n'
                     b'stream\nxx\nendstream\nendobj\n'):
            assert extract_text_runs(data) == []

    def test_heading_vs_body_kinds(self):
        pdf = make_pdf('Big Heading', ['plain body text paragraph'])
        blocks = layout_blocks(extract_text_runs(pdf))
        kinds = {b['text'][:4]: b['kind'] for b in blocks}
        assert kinds.get('Big ') == 'heading'
        assert kinds.get('plai') == 'body'

    def test_reading_order(self):
        paras = ['alpha ' * 30, 'beta ' * 30, 'gamma ' * 30]
        body, _ = _roundtrip(paras)
        assert body.index('alpha') < body.index('beta') < body.index('gamma')

    def test_literal_string_escapes(self):
        from dragnet_spark.kernels.pdf import _decode_literal
        assert _decode_literal(rb'a\(b\)c\\d') == 'a(b)c\\d'
        assert _decode_literal(rb'\101\102\103') == 'ABC'
        assert _decode_literal(rb'line\nnext') == 'line\nnext'

    def test_hex_string_bom(self):
        from dragnet_spark.kernels.pdf import _decode_hex
        assert _decode_hex('FEFF4e2d'.encode()) == '中'
        assert _decode_hex(b'48 49') == 'HI'


@pytest.mark.spark
class TestPdfOperators:
    def test_pdf_corpus_and_content(self, spark):
        from dragnet_spark.operators.pdf_extract import (pdf_corpus,
                                                         pdf_extract_content)
        sf = '/root/testdata/sf0.001'
        out = {r.doc_id: r for r in
               pdf_extract_content(pdf_corpus(spark, sf)).collect()}
        docs = {str(r.doc_id): (r.text or '') for r in
                spark.read.parquet(f'{sf}/documents.parquet').collect()}
        assert set(out) == set(docs)
        for did, text in docs.items():
            norm = ' '.join(_WS.split(text.strip())) if text.strip() else ''
            assert out[did].content_text == norm, did
            assert out[did].title == 'Document %s' % did

    def test_pdf_extract_plan_is_shuffle_free(self, spark):
        from dragnet_spark.operators.pdf_extract import (pdf_corpus,
                                                         pdf_extract_content)
        df = pdf_extract_content(pdf_corpus(spark, '/root/testdata/sf0.001'))
        plan = df._jdf.queryExecution().executedPlan().toString()
        # no aggregation shuffle -- assembly is fused into the kernel;
        # the single allowed Exchange is pdf_corpus's round-robin spread
        assert 'hashpartitioning' not in plan.lower(), plan
        assert plan.count('Exchange') <= 1, plan

    def test_cross_format_neardup_recall(self, spark):
        # interleaved-corpus story: the same article as HTML spans and
        # as a PDF payload must pair up under shingle MinHash after
        # each format's own extraction path
        import importlib
        entrymod = importlib.import_module('__spark_entry__')
        r = entrymod.queries()['cross_format_neardup'](
            spark, '/root/testdata/sf0.001').first()
        assert r.n_source_docs == 500
        assert r.cross_format_pairs_found >= 0.95 * r.n_source_docs

    def test_minhash_band_tuning_moves_s_curve(self, spark):
        # bands=16 (2 rows) must find low-similarity pairs that the
        # default 8x4 banding misses with high probability
        from dragnet_spark.operators.dedup import minhash_near_duplicates
        rows = []
        for i in range(30):
            # disjoint per-pair vocabulary; partner keeps a 24/40-word
            # prefix -> shingle jaccard ~= 0.4
            words = ['w%d_%d' % (i, j) for j in range(40)]
            rows.append((2 * i, ' '.join(words)))
            rows.append((2 * i + 1, ' '.join(
                words[:24] + ['x%d_%d' % (i, j) for j in range(16)])))
        df = spark.createDataFrame(rows, 'doc_id long, text string')

        def planted_hits(bands):
            out = minhash_near_duplicates(df, threshold=0.2, bands=bands)
            found = {(r.doc_a, r.doc_b) for r in out.collect()}
            return sum((2 * i, 2 * i + 1) in found for i in range(30))
        # 16 bands x 2 rows: P(cand | j=0.4) ~= 0.95 -> expect most
        assert planted_hits(16) >= 24
        # default 8 bands x 4 rows: P ~= 0.2 -> expect few
        assert planted_hits(8) <= 15

    def test_pdf_layout_blocks_shape(self, spark):
        import pyspark.sql.functions as F
        from dragnet_spark.operators.pdf_extract import (pdf_corpus,
                                                         pdf_layout_blocks)
        sf = '/root/testdata/sf0.001'
        blocks = pdf_layout_blocks(pdf_corpus(spark, sf))
        agg = blocks.agg(
            F.countDistinct('doc_id').alias('docs'),
            F.sum((F.col('kind') == 'heading').cast('long')).alias('heads'),
            F.min('y_top').alias('min_y')).first()
        assert agg['docs'] == 500
        assert agg['heads'] == 500   # one title heading per doc
        assert agg['min_y'] >= 0
