"""Throughput benchmark + scaling-efficiency evidence.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

The north rule's two-cluster-size criterion cannot use a real cluster in
this sandbox; per BASELINE.md it is evidenced by running the identical
extraction job at two parallelism levels (local[8] vs local[32]) on the
same input and reporting docs/sec at both plus the efficiency
``throughput_32 / (4 * throughput_8)``.  Enable with
``SPARK_GRAFT_SCALING=1`` (always on when invoked as
``python bench.py --scaling``); the scaling numbers ride in the JSON
under "scaling" and are appended to BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _bench_session(cores, shuffle_partitions=None):
    from dragnet_spark.plans.session import get_spark
    return get_spark(
        app_name='dragnet-bench-%d' % cores, cores=cores,
        extra_conf={
            'spark.sql.shuffle.partitions': str(shuffle_partitions
                                                or 2 * cores),
        })


def _corpus(spark, sf_dir, amplification):
    from dragnet_spark.sources.synthesis import synthesize_corpus
    spans_df, gold_df = synthesize_corpus(
        spark, sf_dir, amplification=amplification, include_edge_docs=False)
    return spans_df, gold_df


def _count_docs(sf_dir, amplification):
    import pyarrow.parquet as pq
    n = pq.ParquetFile(f'{sf_dir}/documents.parquet').metadata.num_rows
    return n * amplification


def run_extraction(spark, sf_dir, amplification, repeats=3):
    """The flagship job: synthesize + fused extract, count output rows.

    One untimed pass (python-worker fork + import storm dominates a
    seconds-long run; a 100 TB job amortizes it to noise), then best-of-N
    timed passes (JIT/worker-reuse ramp makes single runs noisy).
    """
    from dragnet_spark.operators.extract import extract
    spans_df, _ = _corpus(spark, sf_dir, amplification)
    result = extract(spans_df)
    result.where("status = 'ok'").count()  # warm
    best = None
    n = 0
    for _ in range(repeats):
        t0 = time.time()
        n = result.where("status = 'ok'").count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best, n


def run_queries(spark, sf_dir):
    """Per-query wall times for the headline operator set."""
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    headline = [
        'extract_content', 'blockify_blocks', 'gold_block_labeling',
        'token_f1_extraction', 'minhash_near_duplicates',
        'simhash_near_duplicates', 'ann_topk_bruteforce', 'ann_topk_lsh',
        'token_count', 'text_quality', 'language_id', 'dedup_exact',
        'jaccard_pairs', 'pricing_summary', 'events_sessionize',
    ]
    times = {}
    for name in headline:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format('noop').mode('overwrite').save()
        times[name] = round(time.time() - t0, 3)
    return times


def scaling_run(sf_dir, amplification):
    """local[8] vs local[32] on the same input -> scaling efficiency."""
    amplification = max(amplification, 40)  # >=200k docs so 32 cores saturate
    out = {}
    for cores in (8, 32):
        spark = _bench_session(cores)
        elapsed, n_docs = run_extraction(spark, sf_dir, amplification)
        out['local[%d]' % cores] = {
            'sec': round(elapsed, 3),
            'docs': n_docs,
            'docs_per_sec': round(n_docs / elapsed, 2),
        }
        spark.stop()
    t8 = out['local[8]']['docs_per_sec']
    t32 = out['local[32]']['docs_per_sec']
    out['scaling_efficiency_8_to_32'] = round(t32 / (4.0 * t8), 4)
    return out


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    cpus = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
    amplification = int(os.environ.get('SPARK_GRAFT_AMP', '4'))
    do_scaling = ('--scaling' in sys.argv
                  or os.environ.get('SPARK_GRAFT_SCALING') == '1')

    sf = sf_dir.rstrip('/').split('sf')[-1]

    spark = _bench_session(cpus)
    extract_sec, n_docs = run_extraction(spark, sf_dir, amplification)
    query_times = run_queries(spark, sf_dir)
    spark.stop()

    result = {
        'metric': 'extraction_wall_sec',
        'value': round(extract_sec, 3),
        'unit': 'sec',
        'queries': query_times,
        'sf': float(sf),
        'n_docs': n_docs,
        'docs_per_sec': round(n_docs / extract_sec, 2),
        'cpus': cpus,
        'amplification': amplification,
    }
    if do_scaling:
        result['scaling'] = scaling_run(sf_dir, amplification)

    print(json.dumps(result))


if __name__ == '__main__':
    main()
