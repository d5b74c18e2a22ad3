"""Trained-quantizer IVF (VERDICT r2 item 7): deterministic k-means
cells must be bit-reproducible under any partitioning, and probing
trained centroids must recover far more true neighbors than arbitrary
labels with min-id representatives."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gush_spark.operators import similarity


@pytest.fixture(scope="module")
def clustered_vecs(spark):
    """200 vectors in 10 well-separated 16-d clusters (fixed seed)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 16)) * 4.0
    rows = []
    for i in range(200):
        c = i % 10
        v = centers[c] + rng.normal(size=16) * 0.3
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()


def _topsets(df):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(got: dict, truth: dict) -> float:
    return sum(
        len(got.get(q, set()) & v) / len(v) for q, v in truth.items()
    ) / len(truth)


def test_kmeans_cells_bit_reproducible_across_partitionings(clustered_vecs):
    """The quantized-long centroid update makes training order-free:
    different input partitionings must produce IDENTICAL centroids."""
    a_assign, a_cents = similarity.kmeans_cells(
        clustered_vecs.repartition(7), n_cells=10, iters=2
    )
    b_assign, b_cents = similarity.kmeans_cells(
        clustered_vecs.repartition(3), n_cells=10, iters=2
    )
    ca = {r["cell"]: r["rep_vec"] for r in a_cents.collect()}
    cb = {r["cell"]: r["rep_vec"] for r in b_cents.collect()}
    assert ca == cb  # bit-for-bit, not approx
    aa = {r["vec_id"]: r["cell"] for r in a_assign.collect()}
    ab = {r["vec_id"]: r["cell"] for r in b_assign.collect()}
    assert aa == ab


def test_trained_ivf_beats_minid_representatives(spark, clustered_vecs):
    """Recall@5 vs brute-force ground truth: trained centroids track the
    data's density; geometry-blind labels + min-id reps do not. (At
    sf0.001/sf0.01 table scale the measured gap is 0.925/0.875 trained
    vs 0.075/0.15 min-id.)"""
    q = clustered_vecs.filter(F.col("vec_id") < 8)
    truth = _topsets(similarity.brute_force_topk(clustered_vecs, q, k=5))
    # arbitrary (geometry-uncorrelated) labels for the min-id baseline
    labeled = clustered_vecs.withColumn(
        "label", F.pmod(F.xxhash64("vec_id"), F.lit(10))
    )
    minid = _topsets(similarity.ivf_topk(labeled, q, k=5, n_probe=2))
    trained = _topsets(
        similarity.kmeans_ivf_topk(
            clustered_vecs, q, k=5, n_probe=2, n_cells=10, iters=2
        )
    )
    r_minid, r_trained = _recall(minid, truth), _recall(trained, truth)
    assert r_trained >= 0.8
    assert r_trained >= r_minid + 0.3
