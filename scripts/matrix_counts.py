#!/usr/bin/env python
"""Authoritative driver-matrix counts from a CORRECTNESS_r{N}.json.

The r02 and r03 verdicts both caught hand-written counts drifting from
the recorded artifact (VERDICT r03 #4/#6).  This is the single source:

    python scripts/matrix_counts.py [CORRECTNESS_rNN.json ...]

prints one line per artifact, newest file last, e.g.::

    CORRECTNESS_r03.json: 25 hash-OK / 22 rows-only / 0 mismatch / 0 ERR over 47 queries

Docs (ROADMAP.md, COVERAGE.md) must quote this output verbatim, never
hand-count.
"""

import glob
import json
import os
import sys


def counts(path):
    with open(path) as f:
        data = json.load(f)
    ok = rows_only = mismatch = err = 0
    for name, row in data.items():
        if row.get('err') == 'no_oracle':
            rows_only += 1
        elif row.get('err'):
            err += 1
        elif row.get('hash_match') and row.get('rows_match') \
                and row.get('schema_match'):
            ok += 1
        else:
            mismatch += 1
    return ('%s: %d hash-OK / %d rows-only / %d mismatch / %d ERR '
            'over %d queries'
            % (os.path.basename(path), ok, rows_only, mismatch, err,
               len(data)))


def main(argv):
    paths = argv[1:] or sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), '..',
                               'CORRECTNESS_r*.json')))
    for p in paths:
        print(counts(p))


if __name__ == '__main__':
    main(sys.argv)
