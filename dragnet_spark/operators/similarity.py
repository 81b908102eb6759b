"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` -- brute-force exact top-k: JVM-side dot products
  via ``zip_with``/``aggregate`` over a broadcast of the query set.  The
  correctness baseline; O(n_queries * n_corpus).
* :func:`lsh_topk` / :func:`embedding_near_duplicates` -- the scale path:
  multi-band random-hyperplane LSH (OR-amplification: candidate if ANY
  band's bit signature matches).  Hyperplanes are seeded-deterministic,
  computed once on the driver and shipped in the closure; signatures are
  one vectorized Arrow stage; the candidate join shuffles only
  (band, bucket) pairs -- at 100 TB this replaces the quadratic cross
  product, and band/bit counts trade recall vs candidate volume.

Top-k outputs are rank lists (no float columns) so the DuckDB oracle
compares stably -- cosine values differ in final ulps across engines but
ranks don't (ties broken by neighbor id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
import pyspark.sql.types as T

# Defaults tuned on the synthetic embeddings (64-dim, near-random, so
# true neighbors sit at cosine ~0.45 -- a hard regime for hyperplane
# LSH): 16 bands x 4 bits gives recall@10 ~0.92 at ~4x candidate
# pruning (bench.py ann_recall).  Real embedding corpora with close
# neighbors (cosine 0.8+) tolerate far more aggressive 8x8+ banding.
LSH_BANDS = 16
LSH_BITS_PER_BAND = 4


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast('double') * y.cast('double')),
        F.lit(0.0), lambda acc, v: acc + v)


def with_norm(df, vec_col='embedding'):
    return df.withColumn(
        '_norm', F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_topk(df, queries_df, k=5, vec_col='embedding', id_col='vec_id'):
    """Exact top-k cosine neighbors for each query vector.

    ``queries_df`` (small) is broadcast -- a BroadcastNestedLoopJoin over
    the corpus scan, no shuffle of the big side; the only wide op is the
    per-query top-k window.
    """
    from pyspark.sql import Window

    corpus = with_norm(df, vec_col).select(
        F.col(id_col).alias('neighbor_id'),
        F.col(vec_col).alias('_cv'), F.col('_norm').alias('_cn'))
    queries = with_norm(queries_df, vec_col).select(
        F.col(id_col).alias('query_id'),
        F.col(vec_col).alias('_qv'), F.col('_norm').alias('_qn'))
    joined = corpus.crossJoin(F.broadcast(queries)).where(
        F.col('neighbor_id') != F.col('query_id'))
    cosine = (_dot(F.col('_qv'), F.col('_cv'))
              / F.greatest(F.col('_qn') * F.col('_cn'), F.lit(1e-300)))
    scored = joined.select('query_id', 'neighbor_id',
                           cosine.alias('_cosine'))
    w = Window.partitionBy('query_id').orderBy(
        F.desc('_cosine'), F.asc('neighbor_id'))
    return (scored.withColumn('rank', F.row_number().over(w))
            .where(F.col('rank') <= k)
            .select('query_id', F.col('rank').cast('long').alias('rank'),
                    'neighbor_id'))


def _hyperplanes(dim, n_planes, seed=42):
    rs = np.random.RandomState(seed)
    return rs.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_band_signatures(df, vec_col='embedding', id_col='vec_id',
                        bands=LSH_BANDS, bits=LSH_BITS_PER_BAND, seed=42,
                        dim=None):
    """(vec_id, band, bucket) rows: one bucket id per band per vector.

    Bucket ids namespace the band index in the high bits, so a plain
    equi-join on ``bucket`` is a per-band match.
    """
    if dim is None:
        dim = df.select(F.size(vec_col)).first()[0]
    planes = _hyperplanes(dim, bands * bits, seed)

    out_schema = T.StructType([
        T.StructField('vec_id', T.LongType()),
        T.StructField('band', T.IntegerType()),
        T.StructField('bucket', T.LongType()),
    ])
    src = df.select(F.col(id_col).alias('vec_id'), F.col(vec_col).alias('_v'))

    def batches(pdfs):
        weights = np.uint64(1) << np.arange(bits, dtype=np.uint64)
        for pdf in pdfs:
            if not len(pdf):
                continue
            mat = np.vstack(pdf['_v'].to_numpy()).astype(np.float64)
            proj = (mat @ planes.T) > 0            # (n, bands*bits)
            n = proj.shape[0]
            ids = np.repeat(pdf['vec_id'].to_numpy(), bands)
            band_idx = np.tile(np.arange(bands, dtype=np.int64), n)
            sigs = (proj.reshape(n, bands, bits).astype(np.uint64)
                    * weights).sum(axis=2)          # (n, bands)
            buckets = (sigs.astype(np.int64)
                       + (band_idx.reshape(n, bands) << 32))
            yield pd.DataFrame({'vec_id': ids,
                                'band': band_idx.astype(np.int32),
                                'bucket': buckets.reshape(-1)})

    return src.mapInPandas(batches, out_schema)


def lsh_topk(df, queries_df, k=5, vec_col='embedding', id_col='vec_id',
             bands=LSH_BANDS, bits=LSH_BITS_PER_BAND, seed=42):
    """Approximate top-k: exact cosine re-rank restricted to candidates
    that share at least one band bucket with the query."""
    from pyspark.sql import Window

    dim = df.select(F.size(vec_col)).first()[0]
    corpus_sig = lsh_band_signatures(df, vec_col, id_col, bands, bits, seed,
                                     dim)
    query_sig = lsh_band_signatures(queries_df, vec_col, id_col, bands, bits,
                                    seed, dim)

    cand = (corpus_sig.select(F.col('vec_id').alias('neighbor_id'), 'bucket')
            .join(F.broadcast(query_sig.select(
                F.col('vec_id').alias('query_id'), 'bucket')), 'bucket')
            .where(F.col('neighbor_id') != F.col('query_id'))
            .select('query_id', 'neighbor_id').distinct())

    corpus = with_norm(df, vec_col).select(
        F.col(id_col).alias('neighbor_id'), F.col(vec_col).alias('_cv'),
        F.col('_norm').alias('_cn'))
    queries = with_norm(queries_df, vec_col).select(
        F.col(id_col).alias('query_id'), F.col(vec_col).alias('_qv'),
        F.col('_norm').alias('_qn'))
    joined = cand.join(corpus, 'neighbor_id').join(F.broadcast(queries),
                                                   'query_id')
    cosine = (_dot(F.col('_qv'), F.col('_cv'))
              / F.greatest(F.col('_qn') * F.col('_cn'), F.lit(1e-300)))
    scored = joined.select('query_id', 'neighbor_id', cosine.alias('_cosine'))
    w = Window.partitionBy('query_id').orderBy(
        F.desc('_cosine'), F.asc('neighbor_id'))
    return (scored.withColumn('rank', F.row_number().over(w))
            .where(F.col('rank') <= k)
            .select('query_id', F.col('rank').cast('long').alias('rank'),
                    'neighbor_id'))


def embedding_near_duplicates(df, threshold=0.9, vec_col='embedding',
                              id_col='vec_id', bands=LSH_BANDS,
                              bits=LSH_BITS_PER_BAND, seed=42):
    """Embedding-cosine near-dup pairs: band-bucket candidates + exact
    cosine verify."""
    dim = df.select(F.size(vec_col)).first()[0]
    sigs = lsh_band_signatures(df, vec_col, id_col, bands, bits, seed, dim)
    a = sigs.select(F.col('vec_id').alias('vec_a'), 'bucket')
    b = sigs.select(F.col('vec_id').alias('vec_b'), 'bucket')
    cand = (a.join(b, 'bucket').where(F.col('vec_a') < F.col('vec_b'))
            .select('vec_a', 'vec_b').distinct())
    vecs = with_norm(df, vec_col).select(
        F.col(id_col).alias('vid'), F.col(vec_col).alias('_v'),
        F.col('_norm').alias('_n'))
    joined = (cand
              .join(vecs.select(F.col('vid').alias('vec_a'),
                                F.col('_v').alias('_va'),
                                F.col('_n').alias('_na')), 'vec_a')
              .join(vecs.select(F.col('vid').alias('vec_b'),
                                F.col('_v').alias('_vb'),
                                F.col('_n').alias('_nb')), 'vec_b'))
    cosine = (_dot(F.col('_va'), F.col('_vb'))
              / F.greatest(F.col('_na') * F.col('_nb'), F.lit(1e-300)))
    return (joined.select('vec_a', 'vec_b', F.round(cosine, 6).alias('cosine'))
            .where(F.col('cosine') >= threshold))
