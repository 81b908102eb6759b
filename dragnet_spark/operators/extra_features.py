"""Optional feature transforms outside the shipped default union
(SURVEY.md §2.3 F3/F6).

* :func:`fit_standardizer` / ``standardize`` -- F6 StandardizedFeature
  (``/root/reference/dragnet/features/standardized.py``): fit a global
  (mean, std) over all training blocks' feature vectors (one distributed
  agg), apply as a broadcast z-score -- no per-doc state.
* :class:`ClusteredWeninger` -- F3
  (``/root/reference/dragnet/features/weninger.py:49-107``): KMeans(k=3)
  on the 2-column CETR features of the training blocks; the cluster
  center nearest the origin is snapped to (0,0) and transform emits
  {0,1} for "not the origin cluster".  Re-derived with pyspark.ml KMeans
  (distributed fit replaces the in-memory sklearn call); prediction is a
  broadcast nearest-center computation, JVM-free of the fitted model
  object.
"""

from __future__ import annotations

import numpy as np

import pyspark.sql.functions as F


def fit_standardizer(blocks_df, features_col='features'):
    """Global per-column (mean, std) over feature arrays -> numpy pair."""
    width = blocks_df.select(F.size(features_col)).first()[0]
    aggs = []
    for i in range(width):
        c = F.col(features_col)[i]
        aggs += [F.avg(c).alias('m%d' % i),
                 F.stddev_pop(c).alias('s%d' % i)]
    row = blocks_df.agg(*aggs).first()
    mean = np.array([row['m%d' % i] for i in range(width)])
    std = np.array([row['s%d' % i] or 0.0 for i in range(width)])
    std[std == 0.0] = 1.0
    return mean, std


def standardize(blocks_df, mean, std, features_col='features'):
    """z-score the feature arrays with broadcast constants (JVM-side)."""
    width = len(mean)
    expr = F.array(*[
        ((F.col(features_col)[i] - float(mean[i])) / float(std[i]))
        for i in range(width)])
    return blocks_df.withColumn(features_col + '_std', expr)


class ClusteredWeninger:
    """F3: stateful KMeans over the weninger (sx, sdx) feature columns.

    The default feature union places weninger at columns 6-7
    (kohlschuetter 0-5, readability 8).
    """

    WENINGER_SLICE = (6, 8)

    def __init__(self, n_clusters=3, max_iter=50, tol=1e-3, seed=42):
        self.n_clusters = n_clusters
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.centers = None

    def _xy(self, blocks_df, features_col):
        lo, hi = self.WENINGER_SLICE
        return blocks_df.select(
            F.col(features_col)[lo].alias('x'),
            F.col(features_col)[hi - 1].alias('y'))

    def fit(self, blocks_df, features_col='features'):
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.feature import VectorAssembler

        xy = self._xy(blocks_df.where(F.col(features_col).isNotNull()),
                      features_col)
        vec = VectorAssembler(inputCols=['x', 'y'], outputCol='fv'
                              ).transform(xy)
        km = KMeans(k=self.n_clusters, maxIter=self.max_iter, tol=self.tol,
                    seed=self.seed, featuresCol='fv')
        model = km.fit(vec)
        centers = np.array([np.asarray(c) for c in model.clusterCenters()])
        # reference quirk reproduced: sort center matrix column-wise, then
        # snap the first row to the origin (weninger.py:92-94)
        centers.sort(axis=0)
        centers[0, :] = 0.0
        self.centers = centers
        return self

    def transform(self, blocks_df, features_col='features'):
        """{0,1} column: 1 iff nearest center is not the origin cluster."""
        assert self.centers is not None, 'fit first'
        lo, hi = self.WENINGER_SLICE
        x = F.col(features_col)[lo]
        y = F.col(features_col)[hi - 1]
        dists = [
            (x - float(cx)) * (x - float(cx))
            + (y - float(cy)) * (y - float(cy))
            for cx, cy in self.centers]
        best = dists[0]
        best_idx = F.lit(0)
        for i in range(1, len(dists)):
            is_closer = dists[i] < best
            best_idx = F.when(is_closer, F.lit(i)).otherwise(best_idx)
            best = F.when(is_closer, dists[i]).otherwise(best)
        return blocks_df.withColumn(
            'clustered_weninger', (best_idx > 0).cast('int'))
