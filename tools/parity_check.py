#!/usr/bin/env python
"""Spot-check named catalog entries against the DuckDB oracle.

The driver's hash compare, reproduced locally for a subset of entries:
sorted column names, per-row repr with floats rounded to 6dp, sorted
row multiset. Usage:

    python tools/parity_check.py entry1 entry2 ...        # sf0.01
    SPARK_GRAFT_TEST_SF_DIR=... python tools/parity_check.py entry1
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return round(v, 6)
    return v


def main() -> None:
    import duckdb

    from nytimes_batch_processor_spark.catalog import all_specs
    from nytimes_batch_processor_spark.session import get_spark

    names = sys.argv[1:]
    if not names:
        print("usage: parity_check.py entry [entry...]", file=sys.stderr)
        sys.exit(2)

    spark = get_spark("parity-check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    specs = all_specs()
    failed = []
    for name in names:
        spec = specs.get(name)
        if spec is None:
            print(f"{name}: UNKNOWN entry")
            failed.append(name)
            continue
        sdf = spec.fn(spark, SF)
        srows = sdf.collect()
        if spec.oracle is None:
            print(f"{name}: rows-only, {len(srows)} rows, cols {sdf.columns}")
            continue
        cols = sorted(sdf.columns)
        s_set = sorted(
            (tuple(_norm(r[c]) for c in cols) for r in srows), key=repr
        )
        cur = con.execute(spec.oracle)
        o_cols = [d[0] for d in cur.description]
        o_idx = [o_cols.index(c) for c in sorted(o_cols)]
        o_set = sorted(
            (tuple(_norm(row[i]) for i in o_idx) for row in cur.fetchall()),
            key=repr,
        )
        ok_cols = sorted(o_cols) == cols
        ok = ok_cols and s_set == o_set
        print(
            f"{name}: {'OK' if ok else 'MISMATCH'} "
            f"(spark {len(s_set)} rows, oracle {len(o_set)} rows"
            f"{'' if ok_cols else f'; cols spark={cols} oracle={sorted(o_cols)}'})"
        )
        if not ok:
            failed.append(name)
            for a, b in list(zip(s_set, o_set))[:200]:
                if a != b:
                    print(f"  spark:  {a}\n  oracle: {b}")
                    break
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
