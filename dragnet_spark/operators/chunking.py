"""Document chunking: split each document into fixed-size token
windows with overlap -- the sequence-packing prep stage of an LLM
training pipeline (and the passage unit for retrieval indexes).

Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``;
``stride < chunk_tokens`` gives overlapping windows, ``stride ==
chunk_tokens`` a partition.  Every token belongs to at least one chunk
(the final window may be short -- dropping it would silently lose the
document tail, so it is kept and its real length reported).

Plan shape: one codegen projection per doc behind the collapse barrier
(tokenize ONCE -- lambda bodies are opaque to Catalyst CSE), a
``transform`` over the window starts, one ``posexplode``.  Narrow end
to end: no shuffle, no Python.  The chunk TEXT never leaves the
projection unless asked -- by default each chunk is carried as its md5
signature + token count (the join key a retrieval index or dedup pass
needs), so at 10^12 docs the exploded rows are thin.
"""

from __future__ import annotations

import pyspark.sql.functions as F

CHUNK_TOKENS = 128
CHUNK_STRIDE = 96


def chunk_documents(df, text_col='text', id_col='doc_id',
                    chunk_tokens=CHUNK_TOKENS, stride=CHUNK_STRIDE,
                    keep_text=False):
    """One row per (doc, chunk): ``(doc_id, chunk_idx, n_chunk_tokens,
    chunk_sig[, chunk_text])``.  Token-less docs emit no rows."""
    if not 0 < stride <= chunk_tokens:
        raise ValueError('need 0 < stride <= chunk_tokens')
    from .text_analysis import tokens_barrier
    tk = tokens_barrier(df, text_col=text_col, id_col=id_col)
    # n_chunks = ceil(n / stride) via integer arithmetic -- identical
    # in the DuckDB oracle; every start < n
    chunks = F.when(
        F.size('_toks') > 0,
        F.expr("transform(sequence(0, "
               "int((size(_toks) + {s} - 1) div {s}) - 1), "
               "i -> slice(_toks, i * {s} + 1, {c}))"
               .format(s=stride, c=chunk_tokens))
    ).otherwise(F.array().cast('array<array<string>>'))
    out = (tk.select('_id', F.posexplode(chunks).alias('chunk_idx', '_t'))
           .select(F.col('_id').alias(id_col),
                   F.col('chunk_idx').cast('long').alias('chunk_idx'),
                   F.size('_t').cast('long').alias('n_chunk_tokens'),
                   F.md5(F.array_join('_t', ' ').cast('binary'))
                   .alias('chunk_sig'),
                   F.array_join('_t', ' ').alias('chunk_text')))
    return out if keep_text else out.drop('chunk_text')
