"""Dev-time mirror of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, compares row count, column names, and order-insensitive values
(sorted rows, column-name-sorted). Floats compared with exact equality first,
then 1e-9 relative tolerance reported separately so we can see near-misses.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from felixzh_flink_spark.queries import ORACLES, QUERIES  # noqa: E402
from felixzh_flink_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        return v
    if hasattr(v, "timestamp"):  # datetime
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def compare(spark_rows, duck_rows, cols):
    if len(spark_rows) != len(duck_rows):
        return f"ROWCOUNT spark={len(spark_rows)} duck={len(duck_rows)}"
    skey = sorted(tuple(str(norm_cell(c)) for c in r) for r in spark_rows)
    dkey = sorted(tuple(str(norm_cell(c)) for c in r) for r in duck_rows)
    if skey == dkey:
        return None
    # find first diff, check float tolerance
    n_diff = 0
    example = None
    for a, b in zip(skey, dkey):
        if a != b:
            n_diff += 1
            if example is None:
                example = (a, b)
    # tolerance pass
    close = True
    for a, b in zip(skey, dkey):
        for x, y in zip(a, b):
            if x == y:
                continue
            try:
                fx, fy = float(x), float(y)
                if not math.isclose(fx, fy, rel_tol=1e-9, abs_tol=1e-12):
                    close = False
            except ValueError:
                close = False
    tag = "VALUES-CLOSE(1e-9)" if close else "VALUES-DIFF"
    return f"{tag} n_diff_rows={n_diff} example:\n  spark={example[0]}\n  duck ={example[1]}"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {exc}")
            continue
        if name not in ORACLES:
            print(f"ok*   {name}: rows-only, {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            duck = con.sql(ORACLES[name])
            dcols = duck.columns
            drows = duck.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            failures.append(name)
            print(f"FAIL  {name}: SCHEMA spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        # reorder both to sorted column order
        sidx = [scols.index(c) for c in sorted(scols, key=str.lower)]
        didx = [dcols.index(c) for c in sorted(dcols, key=str.lower)]
        srows2 = [tuple(r[i] for i in sidx) for r in srows]
        drows2 = [tuple(r[i] for i in didx) for r in drows]
        diff = compare(srows2, drows2, sorted(scols))
        if diff:
            failures.append(name)
            print(f"FAIL  {name}: {diff}")
        else:
            print(f"ok    {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
