"""PII scrubbing: redact emails / IPv4 addresses / phone numbers from a
text column, JVM-side.

The standard pre-training redaction stage: patterns are applied
SEQUENTIALLY (each on the previous pattern's output) so a span consumed
by an earlier rule can't double-count under a later one (an email's
digit runs must not also count as a phone number), and each rule's
match count is taken from the text it actually saw.  Everything is
``regexp_replace`` / ``regexp_count`` column expressions -- whole-stage
codegen, no Python, no shuffle -- and the patterns are RE2-compatible
(no backreferences or lookaround) so the DuckDB oracle runs the
identical regexes.

This is deliberately the conservative high-precision tier (structured
identifiers).  Names/addresses need an NER model -- that tier belongs
behind the same column contract but is model-dependent, like
``multimodal.decode_media``.
"""

from __future__ import annotations

import pyspark.sql.functions as F

# (name, RE2-safe pattern, replacement) -- applied in order
PII_RULES = (
    ('email', r'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
     '<EMAIL>'),
    ('ipv4', r'\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>'),
    # international-ish: +CC then 6-13 subscriber digits with optional
    # single separators (7-16 digits total).  Every repeat unit LEADS
    # with a digit, so separator-only interiors can't match, and the
    # mandatory {5,12} tail keeps '+3 4'-style fragments (temperatures,
    # scores, diff hunks) out of the redaction.
    ('phone', r'\+\d{1,3}[ -]?(?:\d[ -]?){5,12}\d\b', '<PHONE>'),
)


def scrub_pii(df, text_col='text', rules=PII_RULES):
    """Add ``scrubbed_text`` plus per-rule ``n_<name>`` counts and a
    total ``n_pii`` column; input columns pass through."""
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in rules:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias('n_' + name))
        cur = F.regexp_replace(cur, pat, repl)
    out = df.select('*', cur.alias('scrubbed_text'), *counts)
    total = None
    for name, _, _ in rules:
        c = F.col('n_' + name)
        total = c if total is None else total + c
    return out.withColumn('n_pii', total)
