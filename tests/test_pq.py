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
