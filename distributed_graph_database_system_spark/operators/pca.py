"""Distributed PCA over an embedding column.

The scale split every distributed PCA uses (e.g. Spark MLlib's
RowMatrix.computePrincipalComponents): the O(rows) work — the d×d Gram /
covariance accumulation — runs as ONE partial-aggregated shuffle over the
corpus, and the O(d³) eigendecomposition runs on the driver, where d is the
embedding width (64 here, ≤ a few thousand in practice) — a
corpus-size-independent matrix. No iteration, no per-row Python.

Determinism discipline (matches embed_covariance / embed_centroids):
components are quantized to integer micro-units BEFORE any aggregation, so
Σq and Σq·q are exact int64 sums whatever the partitioning; the covariance
double expression is evaluated identically everywhere; numpy's eigh on the
same matrix bytes is deterministic; and eigenvector sign is pinned by
convention (largest-|component| entry made positive).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000  # micro-unit quantization, exact in int64


def covariance_matrix(
    emb: DataFrame, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """Sample covariance (d×d numpy) of the quantized embeddings, computed
    with exact integer sums: explode to (vec, dim, q), self-join on vec_id
    for the upper-triangle pair products, one groupBy(dim_i, dim_j). The
    collect is d(d+1)/2 + d + 1 rows — bounded by the embedding width."""
    q = emb.select(
        F.col(id_col).alias("vid"), F.posexplode(vec_col).alias("pos", "v")
    ).select(
        "vid",
        F.col("pos").alias("dim"),
        F.floor(F.col("v").cast("double") * _SCALE).cast("bigint").alias("q"),
    )
    n = q.select(F.count_distinct("vid")).first()[0]
    sums = {r["dim"]: r["s"] for r in q.groupBy("dim").agg(F.sum("q").alias("s")).collect()}
    a, b = q.alias("a"), q.alias("b")
    prods = (
        a.join(
            b,
            (F.col("a.vid") == F.col("b.vid")) & (F.col("a.dim") <= F.col("b.dim")),
        )
        .groupBy(F.col("a.dim").alias("i"), F.col("b.dim").alias("j"))
        .agg(F.sum(F.col("a.q") * F.col("b.q")).alias("spq"))
        .collect()
    )
    cov = np.zeros((dim, dim))
    for r in prods:
        i, j = int(r["i"]), int(r["j"])
        c = (float(r["spq"]) - float(sums[i]) * float(sums[j]) / n) / (n - 1)
        cov[i, j] = cov[j, i] = c / (_SCALE * _SCALE)
    return cov


def principal_components(cov: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k eigenpairs of the symmetric covariance, eigenvalue-descending,
    with the sign convention that each vector's largest-|entry| component is
    positive (first such index wins on exact ties) — the convention that
    makes the projection reproducible across runs."""
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    top_vals = vals[order]
    top_vecs = vecs[:, order].T  # (k, d)
    for row in top_vecs:
        pivot = int(np.argmax(np.abs(row)))
        if row[pivot] < 0:
            row *= -1
    return top_vals, top_vecs


def pca_project(
    emb: DataFrame,
    dim: int,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """(id, pc1..pck): project mean-centered embeddings onto the top-k
    principal components. The component/mean tables ride into the row
    expression as literals (k·d + d doubles — broadcast-sized); the dot
    product is one fixed left-to-right ``aggregate(zip_with(...))`` chain
    per row, entirely JVM-side."""
    cov = covariance_matrix(emb, dim, id_col, vec_col)
    n = emb.count()
    sums = (
        emb.select(F.posexplode(vec_col).alias("pos", "v"))
        .select("pos", F.floor(F.col("v").cast("double") * _SCALE).cast("bigint").alias("q"))
        .groupBy("pos")
        .agg(F.sum("q").alias("s"))
        .collect()
    )
    mean = np.zeros(dim)
    for r in sums:
        mean[int(r["pos"])] = float(r["s"]) / n / _SCALE
    _, comps = principal_components(cov, k)

    out = emb.select(F.col(id_col), F.col(vec_col).alias("_v"))
    for ci in range(k):
        w = F.array(*[F.lit(float(x)) for x in comps[ci]])
        m = F.array(*[F.lit(float(x)) for x in mean])
        centered = F.zip_with(
            F.col("_v"),
            m,
            lambda v, mu: F.floor(v.cast("double") * _SCALE) / _SCALE - mu,
        )
        dot = F.aggregate(
            F.zip_with(centered, w, lambda c, wi: c * wi),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(f"pc{ci + 1}", F.round(dot, decimals))
    return out.drop("_v")


def kcenter_coreset(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    start_id: int | None = None,
) -> list[tuple[int, int, float]]:
    """Greedy k-center coreset (farthest-point traversal): iteratively pick
    the point farthest from the chosen set — the classic 2-approximation
    for k-center, used as a DIVERSITY sampler over embedding corpora
    (cover the space, don't oversample dense clusters).

    Spark shape: the distributed state is one column ``min_d`` (distance to
    the nearest chosen center), updated per iteration with a broadcast
    literal of the latest center (``least(min_d, d_new)``) — one narrow
    projection + one 1-row argmax per pick, never a pairwise matrix.
    Lineage cut per iteration. Driver holds only the k picks.

    Determinism: distances are fixed-order fma-free expression sums over
    quantized (micro-unit floor) components, ties broken by smallest id;
    the start defaults to the smallest id. Returns
    ``[(rank, vec_id, dist_when_chosen)]`` with dist rounded to 6dp (the
    first pick's dist is 0.0 by convention)."""
    q = F.transform(
        F.col(vec_col), lambda v: F.floor(v.cast("double") * _SCALE) / _SCALE
    )
    cur = emb.select(F.col(id_col).alias("vid"), q.alias("v"))
    if start_id is None:
        start_id = cur.agg(F.min("vid")).first()[0]
    start_vec = cur.where(F.col("vid") == start_id).first()["v"]

    def dist_to(center: list[float]):
        c = F.array(*[F.lit(float(x)) for x in center])
        return F.sqrt(
            F.aggregate(
                F.zip_with(F.col("v"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    picks: list[tuple[int, int, float]] = [(1, int(start_id), 0.0)]
    cur = cur.withColumn("min_d", dist_to(start_vec)).localCheckpoint()
    for rank in range(2, k + 1):
        far = (
            cur.orderBy(F.desc("min_d"), "vid").select("vid", "min_d").head(1)
        )
        if not far:
            break
        vid, d = int(far[0]["vid"]), float(far[0]["min_d"])
        picks.append((rank, vid, round(d, 6)))
        vec = cur.where(F.col("vid") == vid).first()["v"]
        cur = (
            cur.withColumn("min_d", F.least("min_d", dist_to(vec)))
            .localCheckpoint()
        )
    return picks


def geometric_median(
    emb: DataFrame,
    n_iter: int = 3,
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[float]:
    """Geometric median (the L1-robust centroid) by Weiszfeld iteration:
    c ← Σ(xᵢ/dᵢ) / Σ(1/dᵢ) with dᵢ = ‖xᵢ − c‖ — outlier-resistant where
    the mean is not (a handful of corrupted embeddings can drag the mean
    arbitrarily; the median moves O(1/n)). Start = the quantized
    component-wise mean.

    Distributed shape per iteration: one narrow projection computes each
    row's distance to the broadcast-literal center, and the two reductions
    (Σx/d per dimension, Σ1/d) run as ONE aggregation over per-row terms
    quantized to 9dp and summed as exact decimals — the float-determinism
    discipline, so the trajectory is partition-invariant. Bounded
    iterations (Weiszfeld converges linearly; 3 steps reach ~1e-3 here).
    Degenerate dᵢ=0 rows (center equals a point) are excluded from that
    iteration's sums — the standard Weiszfeld guard."""
    q = F.transform(
        F.col(vec_col), lambda v: F.floor(v.cast("double") * _SCALE) / _SCALE
    )
    cur = emb.select(q.alias("v")).localCheckpoint()
    n = cur.count()
    sums = (
        cur.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.sum(F.round(F.col("x"), 9).cast("decimal(28,9)")).alias("s")
        )
        .collect()
    )
    center = [0.0] * dim
    for r in sums:
        center[int(r["pos"])] = float(r["s"]) / n
    for _ in range(n_iter):
        c = F.array(*[F.lit(float(x)) for x in center])
        dist = F.sqrt(
            F.aggregate(
                F.zip_with(F.col("v"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        with_d = cur.select("v", dist.alias("d")).where(F.col("d") > 0)
        terms = with_d.select(
            F.round(1.0 / F.col("d"), 9).cast("decimal(28,9)").alias("w"),
            F.transform(
                "v", lambda x: F.round(x / F.col("d"), 9)
            ).alias("xw"),
        )
        agg = terms.select(
            "w", F.posexplode("xw").alias("pos", "xw_i")
        ).groupBy("pos").agg(
            F.sum(F.col("xw_i").cast("decimal(28,9)")).alias("sxw"),
            F.sum("w").alias("sw"),
        ).collect()
        new_center = list(center)
        for r in agg:
            new_center[int(r["pos"])] = float(r["sxw"]) / float(r["sw"])
        center = new_center
    return [round(x, 6) for x in center]
