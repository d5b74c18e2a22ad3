"""Sketch aggregates: accuracy bounds, mergeability, plan shape.

The exact-value parity with DuckDB is covered by the driver oracle
(approx_distinct_users_hll / approx_quantiles_price_hist); these tests
pin the properties the oracle can't express:
- the HLL estimate lands within the published error bound of the truth;
- sketches MERGE: max-union of per-day registers == registers of the
  union (what makes the aggregate safe to partial/final combine and to
  roll up day → month without touching rows again);
- the plans stay partial+final hash aggregations (the scale contract).
"""

import math

import pytest
from pyspark.sql import functions as F

from gush_spark.operators import sketches

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_hll_within_error_bound(spark, events):
    est = sketches.approx_distinct_hll(
        events, F.col("user_id"), ["event_type"], out="approx_users"
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    rows = est.join(exact, "event_type").collect()
    assert rows, "no groups"
    # m=256 → standard error 1.04/sqrt(256) = 6.5%; allow 4 sigma.
    for r in rows:
        rel = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel < 4 * 1.04 / math.sqrt(256), (r.event_type, rel)


def test_hll_registers_merge_is_union(spark, events):
    """max-merging per-day registers == registers of the whole input."""
    with_day = events.withColumn(
        "day", F.date_trunc("day", F.col("ts").cast("timestamp"))
    )
    per_day = sketches.hll_registers(
        with_day, F.col("user_id"), ["event_type", "day"]
    )
    merged = (
        per_day.groupBy("event_type", "hll_bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    direct = sketches.hll_registers(events, F.col("user_id"), ["event_type"])
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_more_registers_tightens(spark, events):
    """m_bits=12 (m=4096) must beat m=256 on the global count."""
    exact = events.select(F.countDistinct("user_id")).first()[0]
    one = events.withColumn("g", F.lit(1))
    for m_bits, tol in [(8, 4 * 1.04 / 16), (12, 4 * 1.04 / 64)]:
        est = sketches.approx_distinct_hll(
            one, F.col("user_id"), ["g"], m_bits=m_bits
        ).first()["approx_distinct"]
        assert abs(est - exact) / exact < tol, (m_bits, est, exact)


def test_hist_quantiles_within_one_bin(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    width = 100.0
    approx = {
        r.q: r.approx_value
        for r in sketches.approx_quantiles_hist(
            li, F.col("l_extendedprice"), width=width, quantiles=[0.25, 0.5, 0.95]
        ).collect()
    }
    exact = li.select(
        F.percentile(F.col("l_extendedprice"), F.lit(0.25)).alias("q25"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.5)).alias("q50"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.95)).alias("q95"),
    ).first()
    for q, ex in [(0.25, exact.q25), (0.5, exact.q50), (0.95, exact.q95)]:
        assert abs(approx[q] - ex) <= width, (q, approx[q], ex)


def test_sketch_plans_are_partial_final(spark, events):
    """The scale contract: hash aggregation with a partial (map-side)
    pass before the exchange, and no raw-row exchange anywhere —
    the shuffle moves register/bin rows only."""
    est = sketches.approx_distinct_hll(events, F.col("user_id"), ["event_type"])
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 4  # partial+final × two levels
    assert "SortAggregate" not in plan
    # Only hashPartitioning exchanges on (group, bucket)/(group) —
    # nothing repartitions the raw events.
    for line in plan.splitlines():
        if "Exchange" in line and "hashpartitioning" in line:
            assert "event_type" in line

    hist = sketches.approx_quantiles_hist(
        events, F.col("value"), width=10.0, quantiles=[0.5]
    )
    hplan = hist._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in hplan
    # The only single-partition stage is over bins (post-aggregation).
    pre_agg = hplan.split("HashAggregate")[-1]
    assert "Exchange SinglePartition" not in pre_agg


def test_cms_overestimates_only_and_tight(spark, events):
    from gush_spark.operators.sketches import cms_build, cms_estimate

    sketch = cms_build(events, F.col("user_id"))
    est = cms_estimate(
        sketch, events.select("user_id").distinct(), "user_id"
    )
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    rows = est.join(exact, "user_id").collect()
    assert rows
    n_total = sum(r.n for r in rows)
    for r in rows:
        assert r.est_n >= r.n, r  # CMS never underestimates
        # markov bound: overshoot ≤ 2n/w with prob 1-2^-d; at 10k rows
        # and w=4096 collisions are rare — allow a loose absolute slack.
        assert r.est_n - r.n <= max(4, 2 * n_total // 4096), r


def test_cms_sketch_is_bounded_and_mergeable(spark, events):
    from gush_spark.operators.sketches import CMS_D, CMS_W_BITS, cms_build

    half1 = events.where(F.col("event_id") % 2 == 0)
    half2 = events.where(F.col("event_id") % 2 == 1)
    merged = (
        cms_build(half1, F.col("user_id"))
        .unionAll(cms_build(half2, F.col("user_id")))
        .groupBy("r", "b")
        .agg(F.sum("c").alias("c"))  # counters ADD under merge
    )
    direct = cms_build(events, F.col("user_id"))
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    assert direct.count() <= CMS_D * (1 << CMS_W_BITS)


def test_hll_observable_matches_pure_python_spec(spark):
    """(bucket, rho) from the Spark expressions == an independent
    hashlib re-derivation — pins the SPEC, not just Spark↔DuckDB
    agreement (those two could in principle share a bug; hashlib
    can't)."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def py_bucket_rho(key: str, m_bits: int = 8, cap: int = 50):
        h = hashlib.md5(key.encode("utf-8")).hexdigest()
        nhex = m_bits // 4
        bucket = int(h[:nhex], 16)
        bits = bin(int(h[nhex:], 16))[2:].zfill((32 - nhex) * 4)
        first_one = bits.find("1")
        rho = cap if first_one < 0 else min(first_one + 1, cap)
        return bucket, rho

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
                min_size=0,
                max_size=40,
            ),
            min_size=1,
            max_size=8,
            unique=True,
        )
    )
    def check(keys):
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        b, r = sketches.hll_bucket_rho(F.col("k"))
        rows = {row["k"]: (row["hll_bucket"], row["hll_rho"])
                for row in df.select("k", b, r).collect()}
        for k in keys:
            assert rows[k] == py_bucket_rho(k), (k, rows[k], py_bucket_rho(k))

    check()


def test_cms_bucket_matches_pure_python_spec(spark):
    import hashlib

    keys = ["", "a", "host0001.example", "42", "übergrößen 東京 ✓", "x" * 100]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    cols = [
        sketches._cms_bucket(F.col("k"), i).alias(f"b{i}")
        for i in range(sketches.CMS_D)
    ]
    got = {r["k"]: [r[f"b{i}"] for i in range(sketches.CMS_D)]
           for r in df.select("k", *cols).collect()}
    for k in keys:
        exp = [
            int(hashlib.md5(f"{i}:{k}".encode("utf-8")).hexdigest()[:3], 16)
            for i in range(sketches.CMS_D)
        ]
        assert got[k] == exp, (k, got[k], exp)


def test_sketches_ignore_null_keys_and_values(spark, events):
    """COUNT DISTINCT / percentile semantics: nulls carry no signal."""
    nulled = events.withColumn(
        "maybe_user",
        F.when(F.col("event_id") % 3 == 0, F.col("user_id")),
    ).withColumn(
        "maybe_value",
        F.when(F.col("event_id") % 3 == 0, F.col("value")),
    )
    clean = nulled.where(F.col("maybe_user").isNotNull())

    with_nulls = sketches.hll_registers(nulled, F.col("maybe_user"), [])
    without = sketches.hll_registers(clean, F.col("maybe_user"), [])
    assert with_nulls.exceptAll(without).count() == 0
    assert without.exceptAll(with_nulls).count() == 0

    cms_n = sketches.cms_build(nulled, F.col("maybe_user"))
    cms_c = sketches.cms_build(clean, F.col("maybe_user"))
    assert cms_n.exceptAll(cms_c).count() == 0
    assert cms_c.exceptAll(cms_n).count() == 0

    qn = sketches.approx_quantiles_hist(
        nulled, F.col("maybe_value"), width=10.0, quantiles=[0.5]
    )
    qc = sketches.approx_quantiles_hist(
        clean, F.col("maybe_value"), width=10.0, quantiles=[0.5]
    )
    assert qn.collect() == qc.collect()


def test_hll_m16_no_overflow_and_duplicate_registers_merge(spark, events):
    """Regressions from review: (a) m_bits=16 used to overflow BIGINT in
    the empty-bucket register term (65536 * 2^50 > 2^63); the cap now
    shrinks with m. (b) finalize_registers must max-merge duplicate
    (group, bucket) rows — a sink can hold a resumed run's re-emits —
    instead of double-counting them."""
    one = events.withColumn("g", F.lit(1))
    exact = events.select(F.countDistinct("user_id")).first()[0]
    est = sketches.approx_distinct_hll(
        one, F.col("user_id"), ["g"], m_bits=16
    ).first()
    assert est["register_sum"] > 0
    assert abs(est["approx_distinct"] - exact) / exact < 4 * 1.04 / 256

    regs = sketches.hll_registers(one, F.col("user_id"), ["g"])
    doubled = regs.unionAll(regs)  # replayed emission
    a = sketches.finalize_registers(regs, ["g"]).first()
    b = sketches.finalize_registers(doubled, ["g"]).first()
    assert a == b
