"""Pigeonhole blocking completeness: for any max_hamming d, the
(d+1)-segment blocked join must return EXACTLY the pairs a brute-force
all-pairs hamming scan finds — blocking is a perf strategy, never a
recall trade."""

from __future__ import annotations

import pytest

from gush_spark.operators import dedup


@pytest.fixture(scope="module")
def near_docs(spark):
    # small corpus with graded similarity: shared phrases produce small
    # hamming distances, unrelated docs large ones
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, base + f" variant {i}") for i in range(8)]
    rows += [
        (100, "completely different corpus entry about spark structured streaming"),
        (101, "completely different corpus entry about spark structured streams"),
        (102, "unrelated text concerning cooking recipes and kitchen equipment"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _brute_force(spark, docs, max_hamming):
    sims = {r["doc_id"]: r["simhash"] for r in dedup.simhash32(docs, "doc_id", "text").collect()}
    ids = sorted(sims)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(sims[a] ^ sims[b]).count("1") <= max_hamming:
                out.add((a, b))
    return out


@pytest.mark.parametrize("max_hamming", [1, 3, 5, 6])
def test_blocked_pairs_equal_brute_force(spark, near_docs, max_hamming):
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_hamming_pairs(
            near_docs, "doc_id", "text", max_hamming=max_hamming
        ).collect()
    }
    assert got == _brute_force(spark, near_docs, max_hamming)


def test_segment_split_covers_all_bits():
    for n_blocks in range(1, 12):
        segs = dedup._simhash_blocks(n_blocks)
        assert len(segs) == n_blocks
        covered = []
        for shift, width in segs:
            assert width >= 1
            covered.extend(range(shift, shift + width))
        assert covered == list(range(32))  # disjoint, complete, in order
