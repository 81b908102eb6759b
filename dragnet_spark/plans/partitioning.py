"""Partitioning / skew strategies for the 10^12-document target.

BASELINE.json north_rule: 'explicit salting of skewed hosts,
doc_id-range repartitioning'.  Web corpora skew two ways (SURVEY.md §4):

* by host -- a handful of host prefixes own a large share of rows (the
  synthetic corpus plants 30% on one host).  A plain
  ``repartition(host)`` would put 30% of the corpus in one task;
  :func:`salt_by_host` shards each host across S salts.
* by document size -- one 10 MB page in an Arrow batch stalls the whole
  task.  :func:`bucket_by_size` routes outlier documents (bytes > p99)
  into dedicated partitions so stragglers are isolated; AQE cannot do
  this (the cost lives inside an opaque UDF, invisible to the planner).

For inference neither is *required* -- the fused pipeline is a narrow
map over whatever the scan gives us -- but they matter wherever the data
must be reorganized: writes clustered by host, the training label join,
resume-by-range.
"""

from __future__ import annotations

import pyspark.sql.functions as F

DEFAULT_SALTS = 16


def host_of(doc_id_col):
    """doc_id convention 'host/doc-...' -> host prefix ('' if none)."""
    return F.when(F.instr(doc_id_col, '/') > 0,
                  F.substring_index(doc_id_col, '/', 1)).otherwise(F.lit(''))


def salt_by_host(df, num_partitions, salts=DEFAULT_SALTS,
                 doc_id_col='doc_id'):
    """Repartition by (host, salt): co-locates each host across at most
    ``salts`` partitions while breaking the hot-host bottleneck."""
    salted = df.withColumn(
        '_salt', F.pmod(F.xxhash64(doc_id_col), F.lit(salts)))
    out = salted.repartition(num_partitions,
                             host_of(F.col(doc_id_col)), F.col('_salt'))
    return out.drop('_salt')


def repartition_by_doc_range(df, num_partitions, doc_id_col='doc_id'):
    """Range-repartition on doc_id: gives each output partition a
    contiguous doc_id range -- the unit of checkpoint/resume lineage
    (sources.checkpoint) and of ordered Iceberg writes."""
    return df.repartitionByRange(num_partitions, F.col(doc_id_col))


def doc_size_bytes(spans_col):
    """Total payload bytes of a span document (JVM-side, null-safe --
    a null span text must not null out the sum and silently drop the
    doc from both size buckets)."""
    return F.coalesce(
        F.aggregate(
            spans_col,
            F.lit(0).cast('long'),
            lambda acc, s: acc + F.coalesce(
                F.octet_length(s['text']).cast('long'), F.lit(0))),
        F.lit(0))


def bucket_by_size(df, num_partitions, spans_col='spans',
                   outlier_bytes=1 << 20, outlier_partitions=None):
    """Split the corpus into normal vs outlier partitions by doc size.

    Outliers (default > 1 MiB of span text) get their own partitions so
    a giant page never rides in a batch with a thousand normal pages;
    both halves stay narrow after the split.
    """
    if outlier_partitions is None:
        outlier_partitions = max(1, num_partitions // 16)
    size = doc_size_bytes(F.col(spans_col))
    tagged = df.withColumn('_oversize', size > outlier_bytes)
    normal = (tagged.where(~F.col('_oversize'))
              .repartition(num_partitions).drop('_oversize'))
    outliers = (tagged.where(F.col('_oversize'))
                .repartition(outlier_partitions).drop('_oversize'))
    return normal, outliers
