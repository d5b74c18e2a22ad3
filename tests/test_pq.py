"""Product-quantization semantics: code reproducibility, compression
shape, and ADC retrieval quality against brute-force L2 on a clustered
fixture."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gush_spark.operators import pq


@pytest.fixture(scope="module")
def pq_vecs(spark):
    """96 vectors in 8 tight 16-d groups (centers far apart, noise
    small): group structure dominates every subspace, so PQ codes and
    ADC ranking must recover the groups."""
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(8, 16)) * 8.0
    rows = [
        (i, [float(x) for x in centers[i % 8] + rng.normal(size=16) * 0.05])
        for i in range(96)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()


def test_codes_partitioning_invariant_and_compact(pq_vecs):
    cb = pq.pq_train(pq_vecs.repartition(7), m=4, k=8, iters=2, dim=16)
    cb2 = pq.pq_train(pq_vecs.repartition(3), m=4, k=8, iters=2, dim=16)
    assert {tuple(r) for r in cb.collect()} == {tuple(r) for r in cb2.collect()}
    codes = pq.pq_encode(pq_vecs, cb, dim=16)
    got = codes.collect()
    # exactly M rows per vector; codes drawn from the seed-id space
    assert len(got) == 96 * 4
    per_vec = {}
    for r in got:
        per_vec.setdefault(r["vec_id"], set()).add(r["m"])
    assert all(ms == {0, 1, 2, 3} for ms in per_vec.values())
    assert {r["code"] for r in got} <= set(range(8))


def test_same_group_shares_codes(pq_vecs):
    """Near-copies of one center quantize to the SAME code word in
    every subspace — the compression actually collapses duplicates."""
    cb = pq.pq_train(pq_vecs, m=4, k=8, iters=2, dim=16)
    codes = pq.pq_encode(pq_vecs, cb, dim=16).collect()
    word = {}
    for r in codes:
        word.setdefault(r["vec_id"], {})[r["m"]] = r["code"]
    for g in range(8):
        members = [v for v in word if v % 8 == g]
        first = word[members[0]]
        assert all(word[v] == first for v in members)


def test_adc_topk_matches_bruteforce_groups(pq_vecs):
    """ADC top-5 for each of 8 queries (one per group) returns only
    same-group members — agreeing with exact L2 brute force."""
    cb = pq.pq_train(pq_vecs, m=4, k=8, iters=2, dim=16)
    codes = pq.pq_encode(pq_vecs, cb, dim=16)
    queries = pq_vecs.filter(F.col("vec_id") < 8)
    out = pq.pq_adc_topk(codes, cb, queries, k=5, dim=16).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(8))
    for qid, rows in by_q.items():
        assert len(rows) == 5
        assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4, 5]
        # every hit is a same-group member (group = id % 8)
        assert all(r["neighbor_id"] % 8 == qid % 8 for r in rows)
        # distances ascend with rank; same-code members tie at the
        # same ADC distance
        ds = [r["adc_dist"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert ds == sorted(ds)


def test_adc_distance_is_exact_integer_lut_sum(pq_vecs):
    """Pin the ADC arithmetic: recompute one (query, neighbor) distance
    in numpy from the quantized codebook and codes."""
    cb_df = pq.pq_train(pq_vecs, m=4, k=8, iters=1, dim=16)
    codes_df = pq.pq_encode(pq_vecs, cb_df, dim=16)
    queries = pq_vecs.filter(F.col("vec_id") == 0)
    out = pq.pq_adc_topk(codes_df, cb_df, queries, k=96, dim=16).collect()
    cb = {(r["m"], r["code"], r["pos"]): r["cq"] for r in cb_df.collect()}
    codes = {}
    for r in codes_df.collect():
        codes.setdefault(r["vec_id"], {})[r["m"]] = r["code"]
    qvec = pq_vecs.filter(F.col("vec_id") == 0).first()["embedding"]
    qq = [int(np.floor(x * (1 << 20))) for x in qvec]
    target = out[len(out) // 2]
    nid = target["neighbor_id"]
    want = 0
    for m in range(4):
        code = codes[nid][m]
        for pos in range(4):
            want += (qq[m * 4 + pos] - cb[(m, code, pos)]) ** 2
    assert target["adc_dist"] == want


def test_ivfpq_recovers_groups_and_is_partitioning_invariant(pq_vecs):
    """IVF-PQ with cells ~ groups: each query's top-5 are same-group
    members (the probe finds the right cell, residual ADC ranks within
    it), and the whole index/query pipeline is invariant to input
    partitioning."""
    queries = pq_vecs.filter(F.col("vec_id") < 8)
    out = pq.ivfpq_topk(
        pq_vecs.repartition(7), queries, n_cells=8, cell_iters=1,
        m=4, k_pq=8, pq_iters=1, n_probe=2, k=5, dim=16,
    ).collect()
    out2 = pq.ivfpq_topk(
        pq_vecs.repartition(3), queries, n_cells=8, cell_iters=1,
        m=4, k_pq=8, pq_iters=1, n_probe=2, k=5, dim=16,
    ).collect()
    assert {tuple(r) for r in out} == {tuple(r) for r in out2}
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(8))
    for qid, rows in by_q.items():
        assert len(rows) == 5
        assert all(r["neighbor_id"] % 8 == qid % 8 for r in rows)
        ds = [r["adc_dist"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert ds == sorted(ds)


def test_residual_pq_reconstruction_beats_raw_pq(spark, pq_vecs):
    """The point of residual encoding: a starved code budget (k_pq=4
    codes per subspace vs 8 well-separated groups) cannot cover the
    CENTER-scale spread of raw coordinates, but covers the NOISE-scale
    residual spread easily — reconstruction MSE must drop by orders of
    magnitude (measured ~15,000x on this fixture)."""
    from gush_spark.operators.similarity import KMEANS_QUANT, kmeans_cells

    vecs = {
        r["vec_id"]: np.array(r["embedding"]) for r in pq_vecs.collect()
    }

    def reconstruct(df16, base):
        cb = pq.pq_train(df16, m=4, k=4, iters=1, dim=16)
        codes = pq.pq_encode(df16, cb, dim=16)
        c = {
            (r["m"], r["code"], r["pos"]): r["cq"] / KMEANS_QUANT
            for r in cb.collect()
        }
        word = {}
        for r in codes.collect():
            word.setdefault(r["vec_id"], {})[r["m"]] = r["code"]
        errs = []
        for i, v in vecs.items():
            rec = base(i) + np.array(
                [c[(m, word[i][m], p)] for m in range(4) for p in range(4)]
            )
            errs.append(float(np.mean((v - rec) ** 2)))
        return float(np.mean(errs))

    raw_mse = reconstruct(pq_vecs, lambda i: 0.0)

    assigns, cents = kmeans_cells(
        pq_vecs, n_cells=8, iters=1, assign_quantized=True
    )
    amap = {r["vec_id"]: r["cell"] for r in assigns.collect()}
    cmap = {r["cell"]: np.array(r["rep_vec"]) for r in cents.collect()}
    res_rows = [
        (i, [float(x) for x in vecs[i] - cmap[amap[i]]]) for i in vecs
    ]
    rdf = spark.createDataFrame(res_rows, ["vec_id", "embedding"])
    res_mse = reconstruct(rdf, lambda i: cmap[amap[i]])

    assert res_mse * 100 < raw_mse


def test_ivfpq_materialized_index_query_equals_composed(pq_vecs, tmp_path):
    """Build/query split (bench ``ann_index`` section): probing an index
    that round-tripped through parquet — the production shape, the index
    is a write-once materialized table — returns exactly the composed
    ``ivfpq_topk`` answer."""
    spark = pq_vecs.sparkSession
    queries = pq_vecs.filter(F.col("vec_id") < 4)
    composed = pq.ivfpq_topk(
        pq_vecs, queries, n_cells=4, cell_iters=1, m=4, k_pq=8,
        pq_iters=1, n_probe=2, k=3, dim=16,
    ).collect()

    parts = pq.ivfpq_build(
        pq_vecs, n_cells=4, cell_iters=1, m=4, k_pq=8, pq_iters=1, dim=16,
    )
    names = ["asg", "cents", "cb", "codes"]
    for name, df in zip(names, parts):
        df.write.mode("overwrite").parquet(str(tmp_path / name))
    loaded = [spark.read.parquet(str(tmp_path / n)) for n in names]
    split = pq.ivfpq_query(*loaded, queries, m=4, n_probe=2, k=3, dim=16).collect()

    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, split), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, composed), key=lambda t: (t[0], t[3])
    )
