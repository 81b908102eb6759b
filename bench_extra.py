"""Per-query measurement harness for the optimization rounds (guide §1).

Separate from the FROZEN ``bench.py``: times individual ``q_*`` queries
with the noop sink (same warm + best-of-2 protocol as ``bench.run_queries``)
and can dump ``.explain('formatted')`` plans for the evidence files under
``plans/r06/``.

Usage::

    python bench_extra.py --sf /root/testdata/sf0.1 \
        --queries gopher_repetition,token_f1_extraction [--repeats 2] \
        [--explain plans/r06 --suffix before]

Prints one JSON line: {"sf_dir": ..., "queries": {name: sec}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sf', default='/root/testdata/sf0.1')
    ap.add_argument('--queries', required=True,
                    help='comma-separated q_* names (without the q_ prefix)')
    ap.add_argument('--repeats', type=int, default=2)
    ap.add_argument('--cpus', type=int,
                    default=int(os.environ.get('SPARK_GRAFT_CPUS', '32')))
    ap.add_argument('--explain', default=None,
                    help='directory to write <name>_<suffix>.txt plans into')
    ap.add_argument('--suffix', default='before')
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from bench import _bench_session

    spark = _bench_session(args.cpus)
    times = {}
    for name in args.queries.split(','):
        spark.sparkContext.setJobDescription('bench_extra: %s' % name)
        df = getattr(entrymod, 'q_' + name)(spark, args.sf)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), 'formatted')
            with open(os.path.join(
                    args.explain, '%s_%s.txt' % (name, args.suffix)),
                    'w') as f:
                f.write(plan)
        df.write.format('noop').mode('overwrite').save()  # warm
        best = None
        for _ in range(args.repeats):
            t0 = time.time()
            df.write.format('noop').mode('overwrite').save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        print('%-32s %8.3fs' % (name, best), file=sys.stderr)
    spark.stop()
    print(json.dumps({'sf_dir': args.sf, 'cpus': args.cpus,
                      'queries': times}))


if __name__ == '__main__':
    main()
