"""SemDeDup-family semantics (Abbas et al. 2023): embedding-space
duplicate clustering, the cosine decontamination gate, and the shared
min-label connected-components engine that both the text and vector
sides now ride."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gush_spark.operators import similarity
from gush_spark.operators.dedup import min_label_components


@pytest.fixture(scope="module")
def dup_vecs(spark):
    """60 vectors in 12 tight 8-d groups of 5 near-copies each (fixed
    seed, centers well separated) — every group is a semantic-dup
    cluster at any cosine threshold ≥ ~0.9; cross-group cosines are
    far below it."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(12, 8)) * 6.0
    rows = []
    for i in range(60):
        g = i % 12
        v = centers[g] + rng.normal(size=8) * 0.05
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()


def test_min_label_components_chain_and_singletons(spark):
    """A 4-vertex chain collapses to its min id; edge-untouched
    vertices come back as their own singleton clusters (they are
    appended by anti-join, never riding the propagation rounds)."""
    verts = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    edges = spark.createDataFrame(
        [(3, 4), (4, 5), (5, 6), (1, 2)], ["id_a", "id_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in min_label_components(verts, "doc_id", edges).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 3, 5: 3, 6: 3, 7: 7}


def test_min_label_components_long_chain_converges(spark):
    """A 20-vertex path needs multiple propagation rounds (label
    travels one hop per round doubling isn't used) — the convergence
    loop must carry it all the way to min-id 0."""
    verts = spark.createDataFrame([(i,) for i in range(20)], ["doc_id"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], ["id_a", "id_b"]
    )
    got = min_label_components(verts, "doc_id", edges).collect()
    assert {r["cluster_id"] for r in got} == {0}
    assert len(got) == 20


def test_quantized_assignment_matches_exact_on_separated_data(dup_vecs):
    """assign_quantized=True (codegen integer dot) and the exact-cosine
    fold place every vector in the same cell when cells are
    well-separated, and both are bit-reproducible across input
    partitionings."""
    a_assign, a_cents = similarity.kmeans_cells(
        dup_vecs.repartition(7), n_cells=12, iters=2, assign_quantized=True
    )
    b_assign, b_cents = similarity.kmeans_cells(
        dup_vecs.repartition(3), n_cells=12, iters=2, assign_quantized=True
    )
    exact_assign, _ = similarity.kmeans_cells(dup_vecs, n_cells=12, iters=2)
    qa = {r["vec_id"]: r["cell"] for r in a_assign.collect()}
    qb = {r["vec_id"]: r["cell"] for r in b_assign.collect()}
    ex = {r["vec_id"]: r["cell"] for r in exact_assign.collect()}
    assert qa == qb
    assert qa == ex
    ca = {r["cell"]: r["rep_vec"] for r in a_cents.collect()}
    cb = {r["cell"]: r["rep_vec"] for r in b_cents.collect()}
    assert ca == cb


def test_semantic_dup_clusters_recover_planted_groups(dup_vecs):
    """At threshold 0.95 the 12 planted near-copy groups come back as
    exactly 12 clusters with the right memberships (cluster id = min
    member id = the group index, since vec_id % 12 == group)."""
    clusters, assignments, centroids = similarity.semantic_dup_clusters(
        dup_vecs, threshold=0.95, n_cells=12, iters=2
    )
    got = {}
    for r in clusters.collect():
        got.setdefault(r["sem_cluster_id"], set()).add(r["vec_id"])
    assert got == {g: {g + 12 * j for j in range(5)} for g in range(12)}
    assert assignments.count() == 60
    assert centroids.count() == 12


def test_semantic_canonical_keeps_most_peripheral_member(dup_vecs):
    """The keep policy returns one row per cluster, and it is the
    member FARTHEST from its cell centroid (lowest centroid cosine) —
    verified against a numpy recomputation of the same quantized
    centroids."""
    out = similarity.semantic_canonical_vecs(
        dup_vecs, threshold=0.95, n_cells=12, iters=2
    ).collect()
    assert len(out) == 12
    assert all(r["n_members"] == 5 for r in out)
    _, cents = similarity.kmeans_cells(dup_vecs, n_cells=12, iters=2)
    cmap = {r["cell"]: np.array(r["rep_vec"]) for r in cents.collect()}
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in dup_vecs.collect()}
    for r in out:
        grp = [m for m in vecs if m % 12 == r["sem_cluster_id"]]
        # centroid shared by the whole group (groups == cells here)
        cell = max(cmap, key=lambda c: _cos(cmap[c], vecs[grp[0]]))
        worst = min(
            grp, key=lambda m: (round(_cos(vecs[m], cmap[cell]), 6), m)
        )
        assert r["vec_id"] == worst


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_contamination_flags_planted_copy(spark, dup_vecs):
    """A benchmark set containing an exact copy of vector 0 flags it at
    cosine 1.0; unrelated vectors stay below the 0.99 threshold; an
    EMPTY benchmark yields null max_cos and contaminated=false for
    everyone (report, don't guess)."""
    bench = dup_vecs.filter(F.col("vec_id") == 0).select("embedding")
    rep = {
        r["vec_id"]: (r["max_cos"], r["contaminated"])
        for r in similarity.cosine_contamination_report(
            dup_vecs, bench, threshold=0.99
        ).collect()
    }
    assert rep[0] == (1.0, True)
    flagged = {v for v, (_, c) in rep.items() if c}
    assert 0 in flagged and flagged <= {0, 12, 24, 36, 48}  # group 0 copies
    assert all(c is False for v, (_, c) in rep.items() if v % 12 == 5)

    empty = spark.createDataFrame([], "embedding array<double>")
    rep0 = similarity.cosine_contamination_report(
        dup_vecs, empty, threshold=0.5
    ).collect()
    assert all(r["max_cos"] is None and r["contaminated"] is False for r in rep0)
