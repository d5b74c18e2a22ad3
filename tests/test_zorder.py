"""Z-order layout: multi-dimensional file pruning, measured.

The claim (sources/layout.py:write_zordered): after z-order
clustering, a range predicate on EITHER clustered dimension touches a
small fraction of files, whereas a 1-D sort only prunes its own
column. "Touches" = files that contain at least one matching row —
exactly the set a parquet min/max-pruning reader cannot skip, so it
lower-bounds any engine's pruning and upper-bounds z-order's.
"""

import pytest
from pyspark.sql import functions as F

from gush_spark.sources.layout import minmax_scaled, write_zordered, zorder_value

SF_DIR = "/root/testdata/sf0.01"
N_FILES = 16


def _touched(df, pred) -> int:
    return (
        df.withColumn("__f", F.input_file_name())
        .where(pred)
        .select("__f")
        .distinct()
        .count()
    )


@pytest.fixture(scope="module")
def dims_df(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    day = F.datediff(F.to_date(F.col("ts").cast("timestamp")), F.lit("1970-01-01"))
    b = ev.select(
        F.min(F.pmod(F.col("user_id"), F.lit(100000)).cast("long")).alias("ulo"),
        F.max(F.pmod(F.col("user_id"), F.lit(100000)).cast("long")).alias("uhi"),
        F.min(day).alias("dlo"),
        F.max(day).alias("dhi"),
    ).first()
    return ev.select(
        "event_id",
        minmax_scaled(F.pmod(F.col("user_id"), F.lit(100000)), b.ulo, b.uhi).alias("u"),
        minmax_scaled(day, b.dlo, b.dhi).alias("d"),
    )


def test_zorder_prunes_both_dims(spark, dims_df, tmp_path):
    zpath = str(tmp_path / "z")
    write_zordered(
        dims_df, zpath, [F.col("u"), F.col("d")], bits=8, n_files=N_FILES
    )
    z = spark.read.parquet(zpath)
    total = _touched(z, F.lit(True))
    assert total >= 8  # enough files for the ratios to mean anything

    u_quarter = _touched(z, F.col("u") < 64)
    d_quarter = _touched(z, F.col("d") < 64)
    # each quarter-range predicate fixes two of the four top interleaved
    # bits → ~total/4 files, allow curve-boundary slack up to half.
    assert u_quarter <= total // 2, (u_quarter, total)
    assert d_quarter <= total // 2, (d_quarter, total)


def test_one_dim_sort_cannot_prune_the_other(spark, dims_df, tmp_path):
    upath = str(tmp_path / "u_sorted")
    (
        dims_df.repartitionByRange(N_FILES, "u")
        .sortWithinPartitions("u")
        .write.mode("overwrite")
        .parquet(upath)
    )
    one_d = spark.read.parquet(upath)
    total = _touched(one_d, F.lit(True))
    # its own column prunes fine...
    assert _touched(one_d, F.col("u") < 64) <= total // 2
    # ...but the other dimension is spread across (nearly) every file.
    assert _touched(one_d, F.col("d") < 64) >= int(0.9 * total)


def test_zorder_value_bit_disjointness(spark):
    """Morton values of distinct dim pairs are distinct and bounded."""
    pairs = spark.createDataFrame(
        [(u, d) for u in (0, 1, 127, 255) for d in (0, 1, 127, 255)], "u long, d long"
    )
    rows = pairs.select(
        "u", "d", zorder_value([F.col("u"), F.col("d")], bits=8).alias("z")
    ).collect()
    zs = {r.z for r in rows}
    assert len(zs) == len(rows)
    assert all(0 <= r.z < (1 << 16) for r in rows)
    # spot-check the interleave: u=255,d=0 → even bits set only.
    by = {(r.u, r.d): r.z for r in rows}
    assert by[(255, 0)] == sum(1 << (2 * i) for i in range(8))
    assert by[(0, 255)] == sum(1 << (2 * i + 1) for i in range(8))
