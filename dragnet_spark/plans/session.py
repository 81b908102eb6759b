"""SparkSession factory with the scale-tuned defaults (SURVEY.md §4).

Design notes for the 1000-executor / 100 TB target:

* AQE on: runtime shuffle coalescing + skew-join splitting cover the
  host-skew the corpus carries (BASELINE.json north_rule).
* ``spark.sql.execution.arrow.maxRecordsPerBatch`` is tuned *down*: rows
  are whole HTML documents (fat), so the default 10k-row batches would
  blow executor memory inside mapInArrow.  1024 rows x ~50 KB ~= 50 MB
  worst-case per Arrow batch (measured optimum on the synthetic corpus).
* shuffle partitions default to 4x cores locally; on a real cluster this
  is overridden via spark-submit conf (the pipeline itself is a single
  narrow map for inference, so shuffle partitioning only matters for the
  training label join and writes).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 1024


def get_spark(app_name='dragnet-spark', master=None, cores=None,
              extra_conf=None):
    if master is None:
        cores = cores or int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
        master = 'local[%d]' % cores
    builder = (
        SparkSession.builder
        .appName(app_name)
        .master(master)
        .config('spark.sql.adaptive.enabled', 'true')
        .config('spark.sql.adaptive.coalescePartitions.enabled', 'true')
        .config('spark.sql.adaptive.skewJoin.enabled', 'true')
        .config('spark.sql.shuffle.partitions',
                str(4 * (cores or 32)))
        .config('spark.sql.execution.arrow.pyspark.enabled', 'true')
        .config('spark.sql.execution.arrow.maxRecordsPerBatch',
                str(ARROW_BATCH_ROWS))
        .config('spark.sql.files.maxPartitionBytes', str(128 * 1024 * 1024))
        .config('spark.sql.session.timeZone', 'UTC')
        .config('spark.driver.memory',
                os.environ.get('SPARK_DRIVER_MEMORY', '8g'))
        .config('spark.ui.enabled', 'false')
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark():
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
