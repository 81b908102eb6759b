"""Benchmark decontamination: flag corpus documents that share long
token n-grams with an evaluation/test corpus.

The standard pre-training hygiene stage (GPT-3 appendix C / PaLM /
Llama style): any training document containing a long n-gram that also
appears in a benchmark is contaminated -- it would leak eval answers
into the model.  The canonical rule is a 13-token gram ("dirty" on any
collision), which this module implements exactly; ``n`` is a parameter
because published pipelines vary (8..13).

Scale shape: the benchmark side is SMALL (test sets are thousands of
documents), so its distinct gram-signature set broadcasts; the corpus
side never shuffles -- each doc's grams are built in one Arrow python
stage (tokenize once per doc; r06: off the JVM regex engine, see
``text_analysis._counts_stage``) and broadcast-joined.  Per-doc aggregation shuffles only (doc_id, 2 longs).
At 10^12 docs this is a map-side join + one thin doc_id-keyed agg.
Signatures are md5 of the gram text so the DuckDB oracle
(``decontamination`` in ``__spark_entry__``) reproduces them exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F

DECON_NGRAM = 13


def _gram_rows(df, text_col, id_col, n, out_id):
    """(out_id, gram_sig) rows: md5-signed token n-grams.

    r06 (2nd pass): tokenize + n-gram + md5 run in ONE Arrow python
    stage (the same shape and rationale as ``passage_sig_rows`` -- the
    JVM regex engine on the measurement hardware is ~30x slower than
    CPython's and hard-ceilinged per JVM across threads, see
    text_analysis._counts_stage).  ``gram_sig`` is the BINARY 16-byte
    md5 -- hashlib over the same joined UTF-8 bytes is byte-identical
    to the old ``md5(cast(... as binary))`` hex form modulo the hex
    encoding, and the sig never reaches any output: both join sides
    use this helper, so the join semantics are unchanged while the
    broadcast ships half the bytes (VERDICT r05 #4's size concern).
    Only (id, 16-byte sig) rows cross the boundary."""
    import pyarrow as pa

    from .text_analysis import TOKEN_PATTERN

    src = df.select(F.col(id_col).alias(out_id),
                    F.col(text_col).alias('_text'))
    id_ddl = src.schema[out_id].dataType.simpleString()

    def gen(batches):
        import hashlib
        import re
        tok_split = re.compile(TOKEN_PATTERN).split
        md5 = hashlib.md5
        for rb in batches:
            ids = rb.column(0).to_pylist()
            texts = rb.column(1).to_pylist()
            out_ids, out_sigs = [], []
            for did, t in zip(ids, texts):
                if t is None:
                    continue
                toks = [x for x in tok_split(t) if x]
                if len(toks) < n:
                    continue
                for i in range(len(toks) - n + 1):
                    out_ids.append(did)
                    out_sigs.append(md5(
                        ' '.join(toks[i:i + n]).encode('utf-8')).digest())
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, type=rb.column(0).type),
                 pa.array(out_sigs, type=pa.binary())],
                names=[out_id, 'gram_sig'])

    return src.mapInArrow(gen, '%s %s, gram_sig binary' % (out_id, id_ddl))


def benchmark_ngrams(bench_df, text_col='text', id_col='doc_id',
                     n=DECON_NGRAM):
    """Distinct n-gram signature set of a benchmark corpus (the small,
    broadcastable side)."""
    return (_gram_rows(bench_df, text_col, id_col, n, '_bid')
            .select('gram_sig').distinct())


def decontaminate(docs, bench_df, text_col='text', id_col='doc_id',
                  n=DECON_NGRAM):
    """Per-document contamination report vs a benchmark corpus.

    One row per input doc: ``(doc_id, n_overlap_grams (distinct
    benchmark grams hit), n_overlap_occurrences (total gram positions
    hit), contaminated)``.  Clean docs report zeros -- the report is a
    per-doc decision table (filter ``contaminated = 0`` for the clean
    corpus), never a silently shrunken row set.
    """
    bench = benchmark_ngrams(bench_df, text_col=text_col, id_col=id_col,
                             n=n)
    doc_grams = _gram_rows(docs, text_col, id_col, n, '_id')
    hits = (doc_grams.join(F.broadcast(bench), 'gram_sig')
            .groupBy('_id')
            .agg(F.countDistinct('gram_sig').alias('n_overlap_grams'),
                 F.count('*').alias('n_overlap_occurrences')))
    return (docs.select(F.col(id_col).alias('_id'))
            .join(hits, '_id', 'left')
            .select(F.col('_id').alias(id_col),
                    F.coalesce('n_overlap_grams', F.lit(0))
                    .alias('n_overlap_grams'),
                    F.coalesce('n_overlap_occurrences', F.lit(0))
                    .alias('n_overlap_occurrences'),
                    (F.coalesce('n_overlap_grams', F.lit(0)) > 0)
                    .cast('long').alias('contaminated')))
