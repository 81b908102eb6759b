"""PDF / layout extraction operators (north rule: "PDF/layout parse").

The pipeline shape mirrors the HTML path: opaque ``binary`` payloads in
a column, one narrow ``mapInArrow`` stage running the pure-Python kernel
(:mod:`dragnet_spark.kernels.pdf`), layout blocks out -- then the same
downstream operators (dedup, labeling, metrics) apply unchanged.

* :func:`pdf_corpus` -- derives a deterministic PDF payload per document
  from the documents table (title + paragraphed body + per-host running
  header/footer + page numbers), entirely inside the Arrow batch.  At
  100 TB the payloads would arrive in the lake; this synthesizes the
  same shape from the test tables (TESTDATA.md rule: no external data).
* :func:`pdf_layout_blocks` -- payloads -> ordered layout blocks
  ``(doc_id, page, block_idx, kind, size, y_top, text)``.
* :func:`pdf_extract_content` -- the de-chromed document: furniture
  stripped by recurrence (multi-page) + margin zones (always), heading
  and body reassembled in reading order.  Because the writer/parser
  round-trip is lossless over whitespace-normalized text, this query is
  HASH-CHECKED against a pure-SQL DuckDB oracle
  (``regexp_replace`` normalization of the source text) -- the whole
  write -> Flate -> parse -> layout -> de-chrome pipeline must
  reproduce the source text byte-for-byte.

Scale notes: one Python stage, no shuffle; payload bytes never cross
more than one Arrow boundary.  Partition-level parallelism comes from
the upstream repartition of the cheap (doc_id, text) rows, as in
sources/synthesis.py.
"""

from __future__ import annotations

import re

import pyarrow as pa

import pyspark.sql.functions as F

from ..kernels.pdf import (extract_text_runs, layout_blocks, make_pdf,
                           strip_margin_furniture, strip_repeated_furniture)

_WS_RE = re.compile(r'[ \t\n\r\f\v]+')

PDF_BLOCKS_DDL = ('doc_id string, page int, block_idx int, kind string, '
                  'size double, y_top double, text string')
PDF_BLOCKS_PA_SCHEMA = pa.schema([
    ('doc_id', pa.string()),
    ('page', pa.int32()),
    ('block_idx', pa.int32()),
    ('kind', pa.string()),
    ('size', pa.float64()),
    ('y_top', pa.float64()),
    ('text', pa.string()),
])

PARA_WORDS = 60


def render_pdf(doc_id, text):
    """One deterministic PDF payload: title 'Document <id>', body split
    into ~PARA_WORDS-word paragraphs, host-flavored header/footer."""
    words = [w for w in _WS_RE.split(text or '') if w]
    paras = [' '.join(words[i:i + PARA_WORDS])
             for i in range(0, len(words), PARA_WORDS)]
    return make_pdf('Document %s' % doc_id, paras,
                    header='corpus feed %s' % (sum(map(ord, str(doc_id)))
                                               % 7),
                    footer='retrieved for research use')


def pdf_corpus(spark, sf_dir, num_partitions=None):
    """documents.parquet -> (doc_id, payload binary) PDFs."""
    if num_partitions is None:
        num_partitions = 4 * spark.sparkContext.defaultParallelism
    docs = (spark.read.parquet(f'{sf_dir}/documents.parquet')
            .select(F.col('doc_id').cast('string').alias('doc_id'), 'text'))
    if num_partitions:
        docs = docs.repartition(num_partitions)

    schema = pa.schema([('doc_id', pa.string()), ('payload', pa.binary())])

    def gen(batches):
        for rb in batches:
            ids = rb.column('doc_id').to_pylist()
            texts = rb.column('text').to_pylist()
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.string()),
                 pa.array([render_pdf(d, t) for d, t in zip(ids, texts)],
                          pa.binary())], schema=schema)

    return docs.mapInArrow(gen, 'doc_id string, payload binary')


def _doc_blocks(doc_id, payload, dechrome):
    blocks = layout_blocks(extract_text_runs(payload or b''))
    if dechrome:
        blocks = strip_margin_furniture(strip_repeated_furniture(blocks))
    return [{'doc_id': doc_id, 'page': b['page'],
             'block_idx': b['block_idx'], 'kind': b['kind'],
             'size': b['size'], 'y_top': b['y_top'], 'text': b['text']}
            for b in blocks]


def pdf_layout_blocks(df, dechrome=False, payload_col='payload'):
    """(doc_id, payload) -> exploded ordered layout blocks."""
    src = df.select('doc_id', F.col(payload_col).alias('_p'))

    def gen(batches):
        for rb in batches:
            ids = rb.column('doc_id').to_pylist()
            payloads = rb.column('_p').to_pylist()
            rows = []
            for d, p in zip(ids, payloads):
                rows.extend(_doc_blocks(d, p, dechrome))
            yield pa.RecordBatch.from_pylist(rows,
                                             schema=PDF_BLOCKS_PA_SCHEMA)

    return src.mapInArrow(gen, PDF_BLOCKS_DDL)


_CONTENT_SCHEMA = pa.schema([
    ('doc_id', pa.string()),
    ('title', pa.string()),
    ('n_pages', pa.int32()),
    ('content_text', pa.string()),
])
_CONTENT_DDL = ('doc_id string, title string, n_pages int, '
                'content_text string')


def _content_row(doc_id, payload):
    """One de-chromed content row from a PDF payload (shared by the
    two-stage and fused paths so their outputs are identical by
    construction)."""
    blocks = _doc_blocks(doc_id, payload, dechrome=True)
    title = next((b['text'] for b in blocks
                  if b['kind'] == 'heading'), None)
    body = ' '.join(b['text'] for b in blocks if b['kind'] == 'body')
    n_pages = max((b['page'] for b in blocks), default=-1) + 1
    return {'doc_id': doc_id, 'title': title,
            'n_pages': n_pages, 'content_text': body}


def pdf_extract_content(df, payload_col='payload'):
    """(doc_id, payload) -> (doc_id, title, n_pages, content_text).

    Reading-order body text after furniture stripping; the first heading
    is the title.  FUSED: a document's blocks all come out of one kernel
    call, so assembly happens in the same Arrow stage -- the whole
    pipeline is one narrow Python stage, ZERO shuffles (the same plan
    shape as the HTML synthesize_and_extract fast path; asserted in
    tests/test_pdf.py).
    """
    src = df.select('doc_id', F.col(payload_col).alias('_p'))

    def gen(batches):
        for rb in batches:
            ids = rb.column('doc_id').to_pylist()
            payloads = rb.column('_p').to_pylist()
            yield pa.RecordBatch.from_pylist(
                [_content_row(d, p) for d, p in zip(ids, payloads)],
                schema=_CONTENT_SCHEMA)

    return src.mapInArrow(gen, _CONTENT_DDL)


def synthesize_and_extract_pdf(spark, sf_dir, num_partitions=None):
    """Render + parse + de-chrome in ONE python stage (r06): same rows
    as ``pdf_extract_content(pdf_corpus(...))`` -- the Flate-compressed
    payload bytes never cross the Arrow boundary at all (guide §4.1),
    they are parsed right where they are written."""
    if num_partitions is None:
        num_partitions = 4 * spark.sparkContext.defaultParallelism
    docs = (spark.read.parquet(f'{sf_dir}/documents.parquet')
            .select(F.col('doc_id').cast('string').alias('doc_id'), 'text'))
    if num_partitions:
        docs = docs.repartition(num_partitions)

    def gen(batches):
        for rb in batches:
            ids = rb.column('doc_id').to_pylist()
            texts = rb.column('text').to_pylist()
            yield pa.RecordBatch.from_pylist(
                [_content_row(d, render_pdf(d, t))
                 for d, t in zip(ids, texts)],
                schema=_CONTENT_SCHEMA)

    return docs.mapInArrow(gen, _CONTENT_DDL)
