"""Watermarked event-time window aggregation (Structured Streaming).

The windowed-aggregation-with-late-data pattern the north-star pipeline
needs for its metrics feeds: events stream in by event time, counts are
kept per (event_type, hour window), a watermark bounds how late an
event may arrive before its window is finalized and state dropped.

Two consumption modes:

* :func:`run_windowed_counts` -- ``availableNow`` over a parquet
  directory with ``complete``-mode output into an in-memory table: the
  deterministic batch-equivalent view (hash-checked against a DuckDB
  ``time_bucket`` oracle via ``__spark_entry__.streaming_window_counts``).
* :func:`run_windowed_counts_append` -- ``append`` mode to parquet with
  ``maxFilesPerTrigger=1``: windows are emitted only once the watermark
  passes their end, and events arriving later than the watermark bound
  are DROPPED from already-finalized windows -- the late-data semantics
  the test pins (an on-time micro-batch, then a too-late one).

State scale: one row of state per open (event_type, window) pair --
bounded by the watermark horizon, not the stream length; at 10^12
events the watermark is what keeps the state store finite.
"""

from __future__ import annotations

import pyspark.sql.functions as F

EVENTS_SCHEMA = ('event_id long, ts timestamp, user_id long, '
                 'event_type string, value double, props string')


def _windowed(stream, window_len, watermark):
    # exact-decimal sum (not double accumulation) so the result is
    # arrival-order-invariant and oracle-hashable
    return (stream
            .withWatermark('ts', watermark)
            .groupBy(F.window('ts', window_len).alias('w'), 'event_type')
            .agg(F.count('*').alias('n_events'),
                 F.sum(F.col('value').cast('decimal(18,2)'))
                 .cast('double').alias('total_value')))


def run_windowed_counts(spark, src_path, window_len='1 hour',
                        watermark='30 minutes', query_name='win_counts'):
    """availableNow + complete mode -> in-memory table; returns the
    result DataFrame (every window, including still-open ones)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src_path)
    q = (_windowed(stream, window_len, watermark)
         .writeStream.outputMode('complete')
         .format('memory').queryName(query_name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_windowed_counts_append(spark, src_path, out_path, chk_path,
                               window_len='1 hour',
                               watermark='30 minutes'):
    """append mode, one file per micro-batch: only watermark-finalized
    windows reach the sink, and too-late events are dropped."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option('maxFilesPerTrigger', 1).parquet(src_path))
    q = (_windowed(stream, window_len, watermark)
         .writeStream.outputMode('append')
         .option('checkpointLocation', chk_path)
         .trigger(availableNow=True)
         .start(out_path))
    q.awaitTermination()
    return spark.read.schema(
        'w struct<start:timestamp,end:timestamp>, '
        'event_type string, n_events long, total_value double'
    ).parquet(out_path)
