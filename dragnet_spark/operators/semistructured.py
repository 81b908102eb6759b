"""Semi-structured (JSON string) columns, JVM-side.

Event streams carry loosely-typed JSON payloads (``events.props``); at
10^12 rows the parse must stay inside whole-stage codegen --
``from_json`` with an explicit schema, never a Python ``json.loads``
stage.  Missing fields surface as nulls (counted, not dropped) so
schema drift in the payload is observable instead of silent.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def json_props_stats(df, props_col='props', group_col='event_type',
                     field='k'):
    """Parse a JSON payload column and aggregate a numeric field per
    group: ``(group, n_events, n_missing, sum_k, min_k, max_k)``.

    ``n_missing`` counts rows whose payload parses but lacks the field
    (or fails to parse -- ``from_json`` yields null either way); the
    sums/extrema skip nulls, matching SQL aggregate semantics in the
    DuckDB oracle (``events_props``).
    """
    k = F.from_json(F.col(props_col), '%s bigint' % field)[field]
    return (df
            .groupBy(F.col(group_col).alias('group_key'))
            .agg(F.count('*').alias('n_events'),
                 F.sum(k.isNull().cast('long')).alias('n_missing'),
                 F.sum(k).alias('sum_k'),
                 F.min(k).alias('min_k'),
                 F.max(k).alias('max_k')))


def variant_props_stats(df, props_col='props', group_col='event_type',
                        field='k'):
    """The same aggregation through Spark 4's VARIANT type:
    ``try_parse_json`` once into an open-ended binary-encoded value,
    then ``try_variant_get`` typed path extraction.  Against
    ``from_json`` this is the schema-on-read form -- fields can be
    added to the payload without re-declaring a struct schema, and each
    additional field read costs a path lookup, not a re-parse.  Corrupt
    payloads parse to null (try_), missing fields extract to null --
    counted, never dropped.  Must agree row-for-row with
    :func:`json_props_stats` (asserted in tests and by sharing the
    DuckDB oracle)."""
    v = F.try_parse_json(F.col(props_col))
    k = F.try_variant_get(v, '$.%s' % field, 'bigint')
    return (df
            .groupBy(F.col(group_col).alias('group_key'))
            .agg(F.count('*').alias('n_events'),
                 F.sum(k.isNull().cast('long')).alias('n_missing'),
                 F.sum(k).alias('sum_k'),
                 F.min(k).alias('min_k'),
                 F.max(k).alias('max_k')))
