"""Local simulation of the driver's correctness gate.

Runs entry(spark), then every queries()[name] at sf0.01 side-by-side with
oracle_sql()[name] in DuckDB, comparing row count + column names + an
order-insensitive value multiset. Usage:

    python tools/check_gate.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from newssearchengine_spark.gate.registry import TABLES  # noqa: E402
from newssearchengine_spark.session import get_spark  # noqa: E402


def canon(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    spark = get_spark("gate-check")

    t0 = time.time()
    n = E.entry(spark).count()
    print(f"entry(): {n} rows  [{time.time() - t0:.1f}s]")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, sqls = E.queries(), E.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            fails.append(name)
            continue
        if name not in sqls:
            print(f"ok*   {name}: rows-only, {len(srows)} rows "
                  f"[{time.time() - t0:.1f}s] (no oracle)")
            continue
        try:
            res = con.execute(sqls[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            fails.append(name)
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sm, dm = rows_to_multiset(scols, srows), rows_to_multiset(dcols, drows)
        ok_vals = sm == dm
        status = "PASS" if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(f"{status}  {name}: spark={len(srows)} duck={len(drows)} "
              f"cols={'ok' if ok_cols else f'{scols} vs {dcols}'} "
              f"vals={'ok' if ok_vals else 'MISMATCH'} [{time.time() - t0:.1f}s]")
        if status == "FAIL":
            fails.append(name)
            if not ok_vals:
                only_s = list((sm - dm).items())[:3]
                only_d = list((dm - sm).items())[:3]
                print(f"      spark-only: {only_s}")
                print(f"      duck-only : {only_d}")
    spark.stop()
    print("RESULT:", "ALL PASS" if not fails else f"FAILURES: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
