"""Bucketed tables: the co-located-join layout for recurring big joins.

At 10^12 documents the joins that recur every run -- extraction output
x gold labels, documents x embeddings, candidates x corpus -- each pay
a full shuffle of both sides if the tables are plain files.  Bucketing
(``DataFrameWriter.bucketBy``: hash-cluster rows into a fixed number of
files per partition, recorded in the catalog) pays that shuffle ONCE at
write time; every later equi-join or aggregation on the bucket key
reuses the clustering and plans with ZERO Exchange on either side
(asserted in tests/test_pipeline_ops.py::TestBucketedJoin).

This is the Hive-bucketing form (catalog-backed ``saveAsTable``; plain
``parquet(path)`` cannot record bucket metadata).  On the Iceberg
target the same layout is the table spec's ``bucket(N, doc_id)``
partition transform (sources/tables.py docstring) -- declared once in
metadata, no catalog-session coupling.

Both join sides must agree on bucket count (or be multiples, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``); Spark needs
``spark.sql.sources.bucketing.enabled`` (default true) and the join key
must equal the bucket key exactly.
"""

from __future__ import annotations

DEFAULT_BUCKETS = 64


def write_bucketed(df, table_name, bucket_col='doc_id',
                   num_buckets=DEFAULT_BUCKETS, sort=True,
                   mode='overwrite'):
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets additionally enables sort-merge joins with
    no per-task sort -- the read is already in key order.
    """
    w = (df.write.mode(mode).format('parquet')
         .bucketBy(num_buckets, bucket_col))
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)


def read_bucketed(spark, table_name):
    return spark.table(table_name)


def bucketed_equi_join(spark, left_table, right_table, on='doc_id',
                       how='inner'):
    """Join two same-bucket-count tables on the bucket key: the plan
    contains no Exchange -- each task reads bucket i of both sides."""
    return (read_bucketed(spark, left_table)
            .join(read_bucketed(spark, right_table), on, how))
