"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given SF dir, compares row count, column names/dtypes and
an order-insensitive value hash. Exit 1 on any mismatch.

Usage: python tools/verify_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical text form, row-order-insensitive
    lines = sorted(
        df.astype(object).apply(
            lambda r: "|".join("NULL" if pd.isna(v) else repr(v) for v in r), axis=1
        )
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from gush_spark.session import build_session

    spark = build_session("verify_oracle")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sp = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(sp)} (no oracle — rows-only check)")
            continue
        try:
            du = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(sp) != len(du):
            problems.append(f"rows {len(sp)} != {len(du)}")
        if sorted(sp.columns) != sorted(du.columns):
            problems.append(f"cols {sorted(sp.columns)} != {sorted(du.columns)}")
        if not problems:
            hs, hd = value_hash(sp), value_hash(du)
            if hs != hd:
                problems.append(f"value-hash {hs} != {hd}")
                merged = sp.reindex(sorted(sp.columns), axis=1)
                print(merged.head(3))
                print(du.reindex(sorted(du.columns), axis=1).head(3))
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"PASS {name} ({len(sp)} rows)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
