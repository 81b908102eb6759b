"""Stream-static dimension join + watermarked window aggregation.

The last streaming pattern a 10^12-event metrics feed needs (VERDICT
r03 #9): events stream in by event time, each is enriched against a
slowly-changing dimension table (here: the customer dim, joined on
``user_id = c_custkey``), then aggregated per (event-time window,
dimension attribute) under a watermark.

Plan shape: the static side is explicitly ``broadcast()`` -- a
stream-static join must never shuffle the stream per micro-batch, and
Structured Streaming re-reads the static side each trigger, so the
broadcast also caps that cost at one small-table scan per batch.  State
is one row per open (window, segment) pair, bounded by the watermark
horizon exactly like ``window_stream``.

Consumed via ``availableNow`` + complete mode into a memory sink: the
deterministic batch-equivalent view, hash-checked against a DuckDB
``time_bucket`` + join oracle (``__spark_entry__.streaming_dim_join``).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .window_stream import EVENTS_SCHEMA


def run_stream_static_join(spark, src_path, dim_df,
                           join_key='c_custkey', stream_key='user_id',
                           attr='c_mktsegment', window_len='1 hour',
                           watermark='30 minutes',
                           query_name='dim_join_counts'):
    """availableNow + complete mode -> in-memory table of
    ``(window w, <attr>, n_events, total_value)``; inner join drops
    events with no dimension row (the oracle does the same)."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA).parquet(src_path)
              .withWatermark('ts', watermark))
    dim = dim_df.select(F.col(join_key).alias('_dk'),
                        F.col(attr).alias('_attr'))
    joined = stream.join(F.broadcast(dim),
                         stream[stream_key] == F.col('_dk'))
    agg = (joined
           .groupBy(F.window('ts', window_len).alias('w'), '_attr')
           .agg(F.count('*').alias('n_events'),
                F.sum(F.col('value').cast('decimal(18,2)'))
                .cast('double').alias('total_value')))
    q = (agg.writeStream.outputMode('complete')
         .format('memory').queryName(query_name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name).withColumnRenamed('_attr', attr)
