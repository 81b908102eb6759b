"""Template (boilerplate-family) mining over an extracted corpus.

The inverse of content extraction, and at 100 TB just as load-bearing:
a training pipeline wants to KNOW its templates -- which chrome families
exist, how many hosts share each, which hosts changed template -- both
to audit what the extractor is stripping and to catch template-borne
contamination (the same spam rail syndicated across thousands of
hosts).

Recipe (all DataFrame ops, one Python stage inherited from extraction):

1. boilerplate = the document's raw token stream MINUS the extracted
   content+comments tokens (``array_except`` -- set semantics; template
   chrome is exactly the high-document-frequency residue).
2. near-dup over the boilerplate strings with shingle MinHash
   (``bands=16`` -- template variants share most but not all chrome;
   "hard" documents carry per-doc related-article fragments).
3. connected components over the candidate pairs -> family labels,
   via :func:`~dragnet_spark.operators.components.propagate_min_labels`
   -- DataFrame-only min-label propagation with pointer jumping, so no
   doc- or edge-level data ever reaches the driver (the r03 union-find
   collected both; VERDICT r03 #1).  Pair volume is linear (mega-bucket
   chain caps) and chain diameters are bounded by the bucket cap, so
   the O(log d) rounds are few and bounded.

Output: one row per family with its size and HOST SPREAD -- the
cross-host signal is the point (a family living on one host is that
host's skin; a family living on hundreds is an ecosystem template).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .components import propagate_min_labels
from .dedup import minhash_near_duplicates
from .extract import extract


def boilerplate_docs(spans_df, model=None):
    """(doc_id, host, boilerplate) -- raw tokens minus extracted
    content+comments tokens (order-preserving on the raw stream)."""
    raw_toks = F.split(F.array_join(
        F.transform('spans', lambda s: s['text']), ' '), r'[\W_]+')
    raw = spans_df.select('doc_id', raw_toks.alias('_raw'))
    # to_extract=('content','comments') assembles BOTH kept classes into
    # one content_text column -- exactly the non-boilerplate token set.
    # extract()'s own spans column is the KEPT output, so the raw stream
    # comes from the input side via a doc_id join.
    ext = (extract(spans_df, model=model,
                   to_extract=('content', 'comments'))
           .select('doc_id', 'content_text'))
    ext_toks = F.split(F.coalesce('content_text', F.lit('')), r'[\W_]+')
    boiler = F.array_join(
        F.filter(F.array_except(F.col('_raw'), ext_toks),
                 lambda t: t != F.lit('')), ' ')
    return (raw.join(ext, 'doc_id')
            .select('doc_id',
                    F.split('doc_id', '/')[0].alias('host'),
                    boiler.alias('boilerplate')))


def template_families(spans_df, model=None, threshold=0.5, max_rounds=24):
    """One row per mined template family:
    ``(family_id, n_docs, n_hosts, example_doc_id, converged)``.

    ``family_id`` is the component's minimum doc_id (same label the r03
    driver-side union-find produced -- lexicographic min).  ``converged``
    is per-run: False on every row iff label propagation hit
    ``max_rounds`` with labels still moving (a component of diameter
    > ~2^max_rounds; raise the bound rather than trusting the split)."""
    boiler = boilerplate_docs(spans_df, model=model) \
        .where(F.length('boilerplate') > 0).cache()
    # thin (doc_id, host) projection materialized so the fat cached
    # boilerplate can be dropped as soon as the pairs are mined
    base = boiler.select('doc_id', 'host').localCheckpoint(eager=True)
    pairs = minhash_near_duplicates(
        boiler.select('doc_id', F.col('boilerplate').alias('text')),
        threshold=threshold, bands=16)
    labels, converged = propagate_min_labels(
        base.select('doc_id'), pairs,
        id_col='doc_id', src_col='doc_a', dst_col='doc_b',
        max_rounds=max_rounds)
    boiler.unpersist()
    out = (base
           .join(labels, 'doc_id')
           .groupBy('label')
           .agg(F.count('*').alias('n_docs'),
                F.countDistinct('host').alias('n_hosts'),
                F.min('doc_id').alias('example_doc_id'))
           .select(F.col('label').alias('family_id'), 'n_docs',
                   'n_hosts', 'example_doc_id',
                   F.lit(converged).alias('converged')))
    return out
