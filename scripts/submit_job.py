"""Extraction job entry for spark-submit (north rule launch mode).

Cluster usage::

    zip -r dragnet_spark.zip dragnet_spark
    spark-submit --py-files dragnet_spark.zip \\
        --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
        scripts/submit_job.py <input_table_or_path> <output_base> [partitions]

Reads the span-document table, runs the resumable fused extraction
(checkpoint manifests under <output_base>), prints the manifest summary.
In-sandbox smoke: paths are parquet; the synthetic corpus stands in.
"""

import sys

from pyspark.sql import SparkSession


def main(inp, out_base, partitions='32'):
    spark = (SparkSession.builder.appName('dragnet-extract').getOrCreate())
    # dragnet_spark arrives via --py-files; import AFTER session start
    from dragnet_spark.sources.checkpoint import extract_resumable, read_manifest

    spans = spark.read.parquet(inp)
    run_id = extract_resumable(spark, spans, out_base,
                               num_partitions=int(partitions))
    m = read_manifest(spark, out_base).where('run_id = %r' % run_id)
    rows = m.collect()
    n_docs = sum(r.n_docs for r in rows)
    n_failed = sum(r.n_failed for r in rows)
    print('RUN %s partitions=%d docs=%d failed=%d'
          % (run_id, len(rows), n_docs, n_failed))
    spark.stop()


if __name__ == '__main__':
    main(*sys.argv[1:])
