"""Stateful streaming dedup: first-seen wins, per-host state.

The custom-stateful-operator pattern the batch engine can't express:
an unbounded stream of extracted documents, deduplicated against
*everything seen so far* with ``applyInPandasWithState`` -- state is the
set of content fingerprints per host group, carried by the engine's
checkpointed state store (RocksDB on a real cluster).

Keying by host keeps state shards aligned with the corpus's natural
skew unit; the value per key is a bounded fingerprint set (md5 truncated
to 8 bytes; cap + FIFO eviction so one hot host cannot grow state
unboundedly -- at 10^12 docs the cap is the difference between a state
store and an OOM).
"""

from __future__ import annotations

import hashlib

import pandas as pd

import pyspark.sql.functions as F
import pyspark.sql.types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField('doc_id', T.StringType()),
    T.StructField('host', T.StringType()),
    T.StructField('content_sig', T.StringType()),
    T.StructField('is_first_seen', T.BooleanType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField('sigs', T.ArrayType(T.StringType())),
])

MAX_SIGS_PER_HOST = 100_000


def _dedup_fn(key, pdf_iter, state):
    host = key[0]
    seen = list(state.get[0]) if state.exists else []
    seen_set = set(seen)
    rows = []
    for pdf in pdf_iter:
        for doc_id, text in zip(pdf['doc_id'], pdf['content_text']):
            sig = hashlib.md5((text or '').encode()).hexdigest()[:16]
            first = sig not in seen_set
            if first:
                seen_set.add(sig)
                seen.append(sig)
            rows.append((doc_id, host, sig, first))
    if len(seen) > MAX_SIGS_PER_HOST:
        dropped = seen[:-MAX_SIGS_PER_HOST]
        seen = seen[-MAX_SIGS_PER_HOST:]
        seen_set.difference_update(dropped)
    state.update((seen,))
    yield pd.DataFrame(rows, columns=['doc_id', 'host', 'content_sig',
                                      'is_first_seen'])


def dedup_stream(extracted_stream, doc_id_col='doc_id',
                 content_col='content_text'):
    """streaming DataFrame[(doc_id, content_text, ...)] -> streaming
    (doc_id, host, content_sig, is_first_seen)."""
    from ..plans.partitioning import host_of

    keyed = extracted_stream.select(
        F.col(doc_id_col).alias('doc_id'),
        host_of(F.col(doc_id_col)).alias('host'),
        F.col(content_col).alias('content_text'))
    return keyed.groupBy('host').applyInPandasWithState(
        _dedup_fn, OUTPUT_SCHEMA, STATE_SCHEMA,
        outputMode='append', timeoutConf='NoTimeout')


def run_dedup_stream(spark, source_dir, out_dir, checkpoint_dir):
    """File-source -> stateful dedup -> parquet, one availableNow pass."""
    import pyspark.sql.types as T2

    schema = T2.StructType([
        T2.StructField('doc_id', T2.StringType()),
        T2.StructField('content_text', T2.StringType()),
    ])
    src = spark.readStream.schema(schema).parquet(source_dir)
    out = dedup_stream(src)
    q = (out.writeStream.format('parquet')
         .option('path', out_dir)
         .option('checkpointLocation', checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
