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

    def test_latin1_text_starting_with_bom_bytes_roundtrips(self):
        # review r05: latin-1 text that HAPPENS to start with þÿ (the
        # UTF-16BE BOM bytes) was emitted as a literal and then
        # BOM-sniffed into UTF-16BE garbage by the reader; the writer
        # must route it through the BOM'd hex form
        paras = ['þÿ starts with BOM bytes', 'normal tail']
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


class TestAdversarialFixtures:
    """Hand-written payloads the writer never emits (VERDICT r03 #7 +
    ADVICE r03): indirect multi-digit /Length, /Contents arrays,
    non-letter MediaBox, Tz/Ts operators, raw (non-Flate) streams,
    xref free entries, and PDF 1.5 object streams.  Everything must
    parse or skip contained -- never raise."""

    @staticmethod
    def _doc(body_objs, extra=b''):
        return (b'%PDF-1.4\n'
                b'1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n'
                + body_objs + extra)

    def test_indirect_multidigit_length_falls_back_to_endstream(self):
        # ADVICE r03 (medium): '/Length 15 0 R' used to backtrack-match
        # '1' and slice a 1-byte stream; it must fall back to the
        # endstream scan and recover the full text
        payload = b'BT /F1 11 Tf 1 0 0 1 72 700 Tm (full text kept) Tj ET'
        doc = self._doc(
            b'2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n'
            b'3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n'
            b'endobj\n'
            b'4 0 obj\n<< /Length 15 0 R >>\nstream\n'
            + payload + b'\nendstream\nendobj\n'
            b'15 0 obj\n' + str(len(payload)).encode() + b'\nendobj\n')
        runs = extract_text_runs(doc)
        assert [r['text'] for r in runs] == ['full text kept']

    def test_contents_array_concatenates_streams(self):
        # ISO 32000 7.8.2: /Contents [a 0 R b 0 R] is one logical stream
        p1 = b'BT /F1 11 Tf 1 0 0 1 72 700 Tm (part one) Tj'
        p2 = b'1 0 0 1 72 680 Tm (part two) Tj ET'
        doc = self._doc(
            b'2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n'
            b'3 0 obj\n<< /Type /Page /Parent 2 0 R '
            b'/Contents [4 0 R 5 0 R] >>\nendobj\n'
            + (b'4 0 obj\n<< /Length %d >>\nstream\n' % len(p1))
            + p1 + b'\nendstream\nendobj\n'
            + (b'5 0 obj\n<< /Length %d >>\nstream\n' % len(p2))
            + p2 + b'\nendstream\nendobj\n')
        runs = extract_text_runs(doc)
        assert [r['text'] for r in runs] == ['part one', 'part two']

    def test_a4_mediabox_moves_margin_zones(self):
        # ADVICE r03: an A4 page (842 pt) header at y=800 sat "above"
        # the letter-size top zone and was stripped as out-of-page; the
        # zones must follow the page's own /MediaBox
        payload = (b'BT /F1 9 Tf 1 0 0 1 72 800 Tm (running header) Tj\n'
                   b'/F1 11 Tf 1 0 0 1 72 420 Tm (a4 body content) Tj ET')
        doc = self._doc(
            b'2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n'
            b'3 0 obj\n<< /Type /Page /Parent 2 0 R '
            b'/MediaBox [0 0 595 842] /Contents 4 0 R >>\nendobj\n'
            + (b'4 0 obj\n<< /Length %d >>\nstream\n' % len(payload))
            + payload + b'\nendstream\nendobj\n')
        runs = extract_text_runs(doc)
        assert {r['page_h'] for r in runs} == {842.0}
        blocks = layout_blocks(runs)
        clean = strip_margin_furniture(blocks)
        texts = [b['text'] for b in clean]
        assert 'a4 body content' in texts       # mid-page body kept
        assert 'running header' not in texts    # y=800 is A4 margin zone

    def test_unknown_operators_tz_ts_skipped(self):
        payload = (b'BT /F1 11 Tf 120 Tz 3 Ts 1 0 0 1 72 700 Tm '
                   b'(scaled text) Tj 0 Ts ET')
        doc = self._doc(
            b'2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n'
            b'3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n'
            b'endobj\n'
            + (b'4 0 obj\n<< /Length %d >>\nstream\n' % len(payload))
            + payload + b'\nendstream\nendobj\n')
        runs = extract_text_runs(doc)
        assert [r['text'] for r in runs] == ['scaled text']

    def test_xref_free_entries_ignored(self):
        # the scanner walks objects linearly; a free-list xref table and
        # a dangling free entry must not disturb it
        payload = b'BT /F1 11 Tf 1 0 0 1 72 700 Tm (alive) Tj ET'
        doc = self._doc(
            b'2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n'
            b'3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n'
            b'endobj\n'
            + (b'4 0 obj\n<< /Length %d >>\nstream\n' % len(payload))
            + payload + b'\nendstream\nendobj\n',
            extra=(b'xref\n0 5\n'
                   b'0000000005 65535 f \n'
                   b'0000000010 00000 n \n'
                   b'0000000005 00001 f \n'
                   b'0000000200 00000 n \n'
                   b'0000000300 00000 n \n'
                   b'trailer\n<< /Size 5 /Root 1 0 R >>\n'
                   b'startxref\n9\n%%EOF\n'))
        runs = extract_text_runs(doc)
        assert [r['text'] for r in runs] == ['alive']

    def test_pdf15_object_streams_parsed(self):
        # PDF 1.5: catalog/pages/page dicts compressed inside an
        # /ObjStm; only the content stream is a top-level object
        import zlib as _z
        payload = b'BT /F1 11 Tf 1 0 0 1 72 700 Tm (from objstm) Tj ET'
        embedded = (b'<< /Type /Catalog /Pages 2 0 R >>',
                    b'<< /Type /Pages /Kids [3 0 R] /Count 1 >>',
                    b'<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>')
        nums = (1, 2, 3)
        offs, body = [], b''
        for b_ in embedded:
            offs.append(len(body))
            body += b_ + b'\n'
        header = ' '.join('%d %d' % (n, o)
                          for n, o in zip(nums, offs)).encode() + b'\n'
        stm = _z.compress(header + body)
        doc = (b'%PDF-1.5\n'
               + (b'5 0 obj\n<< /Type /ObjStm /N 3 /First %d /Length %d '
                  b'/Filter /FlateDecode >>\nstream\n'
                  % (len(header), len(stm)))
               + stm + b'\nendstream\nendobj\n'
               + (b'4 0 obj\n<< /Length %d >>\nstream\n' % len(payload))
               + payload + b'\nendstream\nendobj\n')
        runs = extract_text_runs(doc)
        assert [r['text'] for r in runs] == ['from objstm']

    def test_truncated_objstm_contained(self):
        doc = (b'%PDF-1.5\n'
               b'5 0 obj\n<< /Type /ObjStm /N 9 /First 400 /Length 4 '
               b'>>\nstream\nabcd\nendstream\nendobj\n')
        assert extract_text_runs(doc) == []


class TestThirdPartyShapedFixtures:
    """Cross-generation shapes this repo's writer never emits but
    third-party producers do (VERDICT r04 #8).  Support matrix:

    * PDF 1.5 cross-reference STREAMS (/Type /XRef, /W-packed binary
      rows, trailer dict inside the object, no ``trailer`` keyword) --
      parsed-past: the scanner walks objects linearly and never
      consults any xref form, so the binary stream is skipped by its
      /Length like any other opaque stream.
    * UTF-16BE literal show strings ``(\\xfe\\xff...)`` (ISO 32000
      7.9.2.2; TeX-family writers) -- decoded: a BOM after unescaping
      switches _decode_literal to UTF-16BE.
    * One text/graphics object split ACROSS /Contents array streams
      (BT..Tf | Tm Tj | ET; spec-legal between tokens, common in
      page-merging producers) -- parsed: streams concatenate before
      tokenization, state carries across boundaries.
    * A literal string token split MID-TOKEN across streams
      (spec-ILLEGAL, seen from broken mergers) -- contained: the
      joined bytes re-tokenize, the damaged string may garble but
      sibling runs survive and nothing raises.
    """

    PAGE_SKEL = (
        b'2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n'
        b'3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents %b >>\nendobj\n')

    def _multi_stream_doc(self, parts, version=b'1.4'):
        refs = b'[' + b' '.join(b'%d 0 R' % (10 + i)
                                for i in range(len(parts))) + b']'
        doc = (b'%PDF-' + version + b'\n'
               b'1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n'
               + self.PAGE_SKEL % refs)
        for i, p in enumerate(parts):
            doc += ((b'%d 0 obj\n<< /Length %d >>\nstream\n'
                     % (10 + i, len(p))) + p + b'\nendstream\nendobj\n')
        return doc

    def test_xref_stream_document_parses(self):
        # PDF 1.5 cross-reference stream: binary /W [1 2 1] rows,
        # Flate'd, trailer dict inside the XRef object, startxref at it
        import zlib as _z
        payload = b'BT /F1 11 Tf 1 0 0 1 72 700 Tm (xref stream doc) Tj ET'
        rows = b''.join(
            bytes([t]) + off.to_bytes(2, 'big') + bytes([g])
            for t, off, g in [(0, 0, 255), (1, 9, 0), (1, 60, 0),
                              (1, 120, 0), (1, 180, 0), (1, 240, 0)])
        xstm = _z.compress(rows)
        doc = self._multi_stream_doc([payload], version=b'1.5')
        xref_at = len(doc)
        doc += ((b'6 0 obj\n<< /Type /XRef /Size 6 /W [1 2 1] '
                 b'/Root 1 0 R /Filter /FlateDecode /Length %d '
                 b'>>\nstream\n' % len(xstm))
                + xstm + b'\nendstream\nendobj\n'
                + b'startxref\n%d\n%%%%EOF\n' % xref_at)
        runs = extract_text_runs(doc)
        assert [r['text'] for r in runs] == ['xref stream doc']

    def test_utf16be_literal_show_string(self):
        # BOM'd UTF-16BE bytes inside (...) -- the hex-string twin of
        # this case already round-trips; TeX-family writers use the
        # literal form
        text = 'Grüße — 16BE'
        body = b'\xfe\xff' + text.encode('utf-16-be')
        assert b'(' not in body and b')' not in body and b'\\' not in body
        payload = (b'BT /F1 11 Tf 1 0 0 1 72 700 Tm (' + body
                   + b') Tj ET')
        runs = extract_text_runs(self._multi_stream_doc([payload]))
        assert [r['text'] for r in runs] == [text]

    def test_text_object_split_across_content_streams(self):
        # one BT..ET spanning three /Contents streams; boundaries fall
        # between tokens (spec-legal) -- position/font state must carry
        runs = extract_text_runs(self._multi_stream_doc([
            b'BT /F1 11 Tf',
            b'1 0 0 1 72 700 Tm (spans) Tj 1 0 0 1 72 680 Tm (streams) Tj',
            b'ET']))
        assert [r['text'] for r in runs] == ['spans', 'streams']
        assert runs[0]['y'] == 700.0 and runs[1]['y'] == 680.0

    def test_mid_token_split_contained(self):
        # spec-ILLEGAL: a literal string cut across the stream boundary;
        # the damaged token may garble but siblings survive, no raise
        runs = extract_text_runs(self._multi_stream_doc([
            b'BT /F1 11 Tf 1 0 0 1 72 700 Tm (intact one) Tj '
            b'1 0 0 1 72 680 Tm (cut in ha',
            b'lf) Tj 1 0 0 1 72 660 Tm (intact two) Tj ET']))
        texts = [r['text'] for r in runs]
        assert 'intact one' in texts and 'intact two' in texts


def _lzw_encode(data):
    """Greedy TIFF-style LZW encoder (test fixture only): clear code,
    longest-match emission, EarlyChange=1 bit widening, EOD."""
    out_codes = [(256, 9)]
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    bitlen = 9
    i = 0
    while i < len(data):
        j = i + 1
        while j <= len(data) and data[i:j] in table:
            j += 1
        emit = data[i:j - 1] if data[i:j] not in table else data[i:j]
        out_codes.append((table[emit], bitlen))
        if j <= len(data):
            table[data[i:j]] = next_code
            next_code += 1
            # the decoder's table lags one entry behind; EarlyChange=1
            # is its compensation, so the encoder widens at 2^w (the
            # natural can't-assign point), one code later than the
            # decoder's 2^w - 1
            if next_code >= (1 << bitlen) and bitlen < 12:
                bitlen += 1
            if next_code >= 4094:   # table nearly full: restart
                out_codes.append((256, bitlen))
                table = {bytes([k]): k for k in range(256)}
                next_code, bitlen = 258, 9
        i += len(emit)
    out_codes.append((257, bitlen))
    buf = nbits = 0
    out = bytearray()
    for code, bl in out_codes:
        buf = (buf << bl) | code
        nbits += bl
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


class TestStreamFilters:
    PAYLOAD = (b'BT /F1 11 Tf 1 0 0 1 72 700 Tm (filter says hello '
               b'hello hello) Tj ET')

    def _doc(self, filt, enc):
        return (
            b'%PDF-1.4\n'
            b'1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n'
            b'2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n'
            b'3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n'
            b'endobj\n'
            + (b'4 0 obj\n<< /Length %d /Filter %s >>\nstream\n'
               % (len(enc), filt))
            + enc + b'\nendstream\nendobj\n')

    def test_lzw_kernel_roundtrip(self):
        from dragnet_spark.kernels.pdf import _lzw_decode
        for payload in (b'', b'a', b'aaaaaaaaaaaaaaaa', self.PAYLOAD,
                        bytes(range(256)) * 40,
                        b'tobeornottobeortobeornot' * 100):
            assert _lzw_decode(_lzw_encode(payload)) == payload

    def test_lzw_filtered_content_stream(self):
        from dragnet_spark.kernels.pdf import extract_text_runs
        doc = self._doc(b'/LZWDecode', _lzw_encode(self.PAYLOAD))
        runs = extract_text_runs(doc)
        assert [r['text'] for r in runs] == ['filter says hello '
                                             'hello hello']

    def test_ascii_hex_and_chained_filters(self):
        from dragnet_spark.kernels.pdf import extract_text_runs
        import zlib as _z
        hex_enc = self.PAYLOAD.hex().upper().encode() + b'>'
        doc = self._doc(b'/ASCIIHexDecode', hex_enc)
        assert [r['text'] for r in extract_text_runs(doc)] \
            == ['filter says hello hello hello']
        # chain: Flate THEN hex-armored (decoders run in array order:
        # ASCIIHex first, then Flate)
        chained = _z.compress(self.PAYLOAD).hex().encode() + b'>'
        doc2 = self._doc(b'[/ASCIIHexDecode /FlateDecode]', chained)
        assert [r['text'] for r in extract_text_runs(doc2)] \
            == ['filter says hello hello hello']

    def test_unknown_filter_contained(self):
        from dragnet_spark.kernels.pdf import extract_text_runs
        doc = self._doc(b'/JBIG2Decode', b'\x00\x01\x02')
        assert extract_text_runs(doc) == []

    def test_corrupt_lzw_contained(self):
        from dragnet_spark.kernels.pdf import extract_text_runs
        doc = self._doc(b'/LZWDecode', b'\xff\xff\xff\xff')
        assert extract_text_runs(doc) == []


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    class TestLzwProperty:
        @given(st.binary(max_size=5000))
        @settings(max_examples=200, deadline=None)
        def test_roundtrip(self, data):
            from dragnet_spark.kernels.pdf import _lzw_decode
            assert _lzw_decode(_lzw_encode(data)) == data

        @given(st.binary(min_size=1, max_size=200))
        @settings(max_examples=100, deadline=None)
        def test_decoder_contained_on_garbage(self, data):
            # arbitrary bytes fed straight to the decoder must either
            # decode to something or raise ValueError -- never hang or
            # raise anything else
            from dragnet_spark.kernels.pdf import _lzw_decode
            try:
                _lzw_decode(data)
            except ValueError:
                pass
except ImportError:  # pragma: no cover
    pass
