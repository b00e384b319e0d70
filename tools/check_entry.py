"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf_dir, then compares row count, column names, and
(column-name-sorted, row-sorted) values — flagging any numeric mismatch
with the max abs diff so float-parity issues are visible.

Usage: python tools/check_entry.py [sf_dir] [query_prefix ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from gfw_raster_analysis_lambda_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda k: cols[k])
    out = []
    for r in rows:
        out.append("|".join(norm_cell(r[k]) for k in order))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])
    spark = get_spark("check_entry", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if prefixes and not name.startswith(prefixes):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        issues = []
        if sorted(scols) != sorted(ocols):
            issues.append(f"columns {sorted(scols)} vs {sorted(ocols)}")
        if len(srows) != len(orows):
            issues.append(f"rowcount {len(srows)} vs {len(orows)}")
        if not issues:
            sk, ok_ = frame_key(scols, srows), frame_key(ocols, orows)
            ndiff = sum(1 for a, b in zip(sk, ok_) if a != b)
            if ndiff:
                issues.append(f"{ndiff}/{len(sk)} rows differ")
                for a, b in zip(sk, ok_):
                    if a != b:
                        issues.append(f"  spark: {a}\n  duck : {b}")
                        break
        if issues:
            failures += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s): " + "; ".join(issues[:3]))
        else:
            print(f"OK   {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
