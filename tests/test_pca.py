"""PCA / coreset operators (operators/pca.py): covariance vs numpy on the
same quantized data, projection variance ordering, and the k-center picks
vs a single-process reference."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.operators.pca import (
    covariance_matrix,
    kcenter_coreset,
    pca_project,
    principal_components,
)
from distributed_graph_database_system_spark.sources.catalog import load_table

_SCALE = 1_000_000


def _quantized(emb):
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    m = np.array(
        [[np.floor(float(x) * _SCALE) / _SCALE for x in r["embedding"]] for r in rows]
    )
    return m, [r["vec_id"] for r in rows]


def test_covariance_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cov = covariance_matrix(emb, dim=64)
    m, _ = _quantized(emb)
    ref = np.cov(m, rowvar=False, ddof=1)
    assert np.allclose(cov, ref, atol=1e-9)
    assert np.allclose(cov, cov.T)


def test_projection_variance_ordering_and_centering(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    proj = pca_project(emb, dim=64, k=2, decimals=8)
    rows = proj.collect()
    pc1 = np.array([r["pc1"] for r in rows])
    pc2 = np.array([r["pc2"] for r in rows])
    # projections are mean-centered, pc1 carries the most variance
    assert abs(pc1.mean()) < 1e-4 and abs(pc2.mean()) < 1e-4
    assert pc1.var() >= pc2.var()
    # and pc1 variance equals the top eigenvalue of the covariance
    cov = covariance_matrix(emb, dim=64)
    vals, _ = principal_components(cov, 2)
    assert abs(pc1.var(ddof=1) - vals[0]) / vals[0] < 1e-3


def test_kcenter_matches_reference(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    picks = kcenter_coreset(emb, k=5)
    m, ids = _quantized(emb)
    # pure-python greedy farthest-point with the same tie-breaks
    chosen = [min(ids)]
    idx = {v: i for i, v in enumerate(ids)}
    min_d = np.linalg.norm(m - m[idx[chosen[0]]], axis=1)
    ref = [(1, chosen[0], 0.0)]
    for rank in range(2, 6):
        far_i = int(
            min(range(len(ids)), key=lambda i: (-min_d[i], ids[i]))
        )
        ref.append((rank, ids[far_i], round(float(min_d[far_i]), 6)))
        min_d = np.minimum(min_d, np.linalg.norm(m - m[far_i], axis=1))
    assert [(r, v) for r, v, _ in picks] == [(r, v) for r, v, _ in ref]
    for (_, _, d_spark), (_, _, d_ref) in zip(picks, ref):
        assert abs(d_spark - d_ref) < 1e-5


def test_kcenter_covers_space_better_than_prefix(spark, sf_dir):
    """Coverage property: the k-center picks' max min-distance (covering
    radius) must beat taking the first k vec_ids."""
    emb = load_table(spark, sf_dir, "embeddings")
    picks = [v for _, v, _ in kcenter_coreset(emb, k=6)]
    m, ids = _quantized(emb)
    idx = {v: i for i, v in enumerate(ids)}

    def radius(centers):
        d = np.stack(
            [np.linalg.norm(m - m[idx[c]], axis=1) for c in centers]
        ).min(axis=0)
        return d.max()

    assert radius(picks) <= radius(ids[:6])
