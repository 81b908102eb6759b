"""Streaming sessionization via ``session_window`` (event-time gaps).

The streaming twin of the batch ``events_sessionize`` query: events
group into per-user sessions that close after ``gap`` of inactivity.
``F.session_window`` keeps one merging window per open (user, session)
-- state is bounded by the watermark horizon times the number of
concurrently active users, not the stream length; the gap semantics
are exactly Spark's: an event at EXACTLY ``prev_ts + gap`` still
MERGES into the session (the window extends through its end), so only
a strictly-greater gap starts a new session -- mirrored with ``>`` in
the gaps-and-islands DuckDB oracle
(``__spark_entry__.streaming_sessions``) and pinned by test.

Consumed via ``availableNow`` + complete mode into a memory sink for
the deterministic batch-equivalent view, like ``window_stream``.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .window_stream import EVENTS_SCHEMA


def run_session_windows(spark, src_path, gap='30 minutes',
                        watermark='30 minutes',
                        query_name='session_counts'):
    """availableNow + complete mode -> in-memory table of
    ``(w struct<start,end>, user_id, n_events, total_value)``:
    ``w.start`` = first event, ``w.end`` = last event + gap."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA).parquet(src_path)
              .withWatermark('ts', watermark))
    agg = (stream
           .groupBy(F.session_window('ts', gap).alias('w'), 'user_id')
           .agg(F.count('*').alias('n_events'),
                F.sum(F.col('value').cast('decimal(18,2)'))
                .cast('double').alias('total_value')))
    q = (agg.writeStream.outputMode('complete')
         .format('memory').queryName(query_name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)
