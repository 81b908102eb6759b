"""Table I/O layer: Iceberg when a catalog is configured, parquet fallback.

The production target (BASELINE.json north_rule) is Iceberg at
10^12-document scale:

* reads: ``spark.read.table('catalog.db.documents')`` -- partition
  pruning + column pruning + snapshot isolation come from the Iceberg
  source; time travel (``VERSION AS OF``) gives reproducible training
  snapshots.
* writes: ``df.writeTo(table).append()`` -- atomic snapshot commits are
  what makes the checkpoint-manifest resume (sources.checkpoint)
  transactional; the recommended table spec partitions by
  ``bucket(1024, doc_id)`` with host as a hidden-partition transform so
  salting (plans.partitioning.salt_by_host) aligns with file clustering.

This sandbox ships no Iceberg runtime jar and has no network, so
:func:`catalog_available` returns False here and every helper falls back
to plain parquet paths with identical call shapes -- swap in the catalog
via ``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime``
+ the three confs below and nothing else changes.

Required cluster confs (documented, not settable here)::

    spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lake.type = hive | rest | hadoop
    spark.sql.defaultCatalog = lake
"""

from __future__ import annotations

import pyspark.sql.functions as F

ICEBERG_CATALOG_IMPL = 'org.apache.iceberg.spark.SparkCatalog'


def catalog_available(spark, catalog='lake'):
    """True iff an Iceberg catalog is configured on this session."""
    try:
        impl = spark.conf.get('spark.sql.catalog.%s' % catalog)
    except Exception:
        return False
    return bool(impl)


def read_table(spark, name, path=None, catalog='lake'):
    """Read an Iceberg table by name, or the parquet path fallback."""
    if catalog_available(spark, catalog):
        return spark.read.table('%s.%s' % (catalog, name))
    if path is None:
        raise ValueError('no Iceberg catalog and no fallback path for %r'
                         % name)
    return spark.read.parquet(path)


def append_table(df, name, path=None, catalog='lake',
                 cluster_by_doc_range=None):
    """Append to an Iceberg table (atomic snapshot) or parquet fallback.

    ``cluster_by_doc_range``: optional partition count; range-partitions
    on doc_id before the write so files are doc_id-clustered -- the
    layout both the resume anti-join and downstream range scans want.
    """
    if cluster_by_doc_range:
        df = df.repartitionByRange(cluster_by_doc_range, F.col('doc_id'))
    spark = df.sparkSession
    if catalog_available(spark, catalog):
        df.writeTo('%s.%s' % (catalog, name)).append()
        return
    if path is None:
        raise ValueError('no Iceberg catalog and no fallback path for %r'
                         % name)
    df.write.mode('append').parquet(path)


# -- the checkpoint/resume seam (VERDICT r02 #10) -----------------------------
#
# sources.checkpoint needs exactly three table operations; with an
# Iceberg runtime each maps to one catalog call, and the parquet
# fallback reproduces the same CONTRACT (append-only, per-run pruning,
# committed-only reads via the manifest):
#
#   1. append_run_partitioned  -- append extraction output for one run.
#      Iceberg: plain snapshot append (the spec's hidden partition
#      transform on run_id clusters files); parquet: hive-style
#      ``<path>/run_id=<id>/`` directories.
#   2. read_run                -- read back ONE run's rows, pruned to
#      that run's files (Iceberg partition pruning / the run directory).
#   3. append_table (manifest) -- the COMMIT POINT.  Iceberg: the
#      manifest append is an atomic snapshot commit, closing the
#      output/manifest gap the parquet fallback documents in
#      checkpoint.read_extracted; parquet: append + committed-only
#      readers.
#
# Swapping in the runtime jar touches nothing outside this module.


def append_run_partitioned(df, name, path=None, catalog='lake'):
    """Append run-tagged rows (must carry a ``run_id`` column), laid out
    so per-run reads prune to the run's files."""
    spark = df.sparkSession
    if catalog_available(spark, catalog):
        df.writeTo('%s.%s' % (catalog, name)).append()
        return
    if path is None:
        raise ValueError('no Iceberg catalog and no fallback path for %r'
                         % name)
    df.write.mode('append').partitionBy('run_id').parquet(path)


def read_all_runs(spark, name, path=None, catalog='lake'):
    """Every run's rows, tolerant of a MIXED on-disk layout.

    The parquet fallback wrote flat ``part-*.parquet`` files with
    ``run_id`` as a data column before r03 introduced hive-partitioned
    ``run_id=<id>/`` directories.  A checkpoint base holding both (an
    old checkpoint resumed under the new code) fails Spark's partition
    discovery outright -- conflicting directory structures plus a
    duplicate ``run_id`` column (ADVICE r03).  Here the two layouts are
    listed apart and read separately, then unioned by name with
    ``run_id`` normalized to string (partition-value type inference
    could otherwise type an all-digit run id as long).  Iceberg needs
    none of this: the partition transform is table metadata, not
    directory layout.
    """
    if catalog_available(spark, catalog):
        return spark.read.table('%s.%s' % (catalog, name))
    if path is None:
        raise ValueError('no Iceberg catalog and no fallback path for %r'
                         % name)
    import os
    entries = os.listdir(path) if os.path.isdir(path) else []
    flat = sorted(e for e in entries
                  if e.endswith('.parquet') and not e.startswith('_'))
    runs = sorted(e for e in entries if e.startswith('run_id='))
    if not (flat and runs):
        return spark.read.parquet(path)
    legacy = spark.read.parquet(*(os.path.join(path, f) for f in flat))
    cur = (spark.read.option('basePath', path)
           .parquet(*(os.path.join(path, d) for d in runs)))
    cur = cur.withColumn('run_id', F.col('run_id').cast('string'))
    return legacy.unionByName(cur, allowMissingColumns=True)


def read_run(spark, name, run_id, path=None, catalog='lake'):
    """One run's rows, reading only that run's files."""
    if catalog_available(spark, catalog):
        return (spark.read.table('%s.%s' % (catalog, name))
                .where(F.col('run_id') == run_id))
    if path is None:
        raise ValueError('no Iceberg catalog and no fallback path for %r'
                         % name)
    import os
    return (spark.read.option('basePath', path)
            .parquet(os.path.join(path, 'run_id=%s' % run_id)))
