"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at sf0.01 and
its ``oracle_sql()`` twin on DuckDB over the same parquet, then
compares row count, column names, and values (rows sorted, columns
sorted by name). Floats must match BITWISE — the whole design contract
of the f64 oracle mirroring.

Usage: python scripts/check_entry.py [sf_dir] [only_name_substr]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2] if len(sys.argv) > 2 else None

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Entries whose oracle contract is rows+schema ONLY (the engine-side
# float32 ordering is not SQL-expressible; see the oracle docstring).
# The driver's value hash is expected to mismatch for these — the local
# replica skips the value compare so a red here means a REAL bug.
ROWS_ONLY = {"phrase_sloppy_topk"}


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return [cols[i] for i in order], sorted(out, key=lambda t: tuple(map(repr, t)))


def values_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b and math.copysign(1, a) == math.copysign(1, b)
    return a == b


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("check_entry")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    failures = []
    for name, fn in qs.items():
        if ONLY and ONLY not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(srows)} rows, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        ok = True
        msgs = []
        if sorted(scols) != sorted(ocols):
            ok = False
            msgs.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rows spark={len(srows)} oracle={len(orows)}")
        if ok and name in ROWS_ONLY:
            print(f"pass {name}: {len(srows)} rows (rows+schema contract; "
                  f"value hash exempt) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        if ok:
            _, sn = norm_rows(scols, srows)
            _, on = norm_rows(ocols, orows)
            bad = 0
            for i, (ra, rb) in enumerate(zip(sn, on)):
                if not all(values_equal(a, b) for a, b in zip(ra, rb)):
                    if bad == 0:
                        msgs.append(f"first value diff at sorted-row {i}: "
                                    f"spark={ra} oracle={rb}")
                    bad += 1
            if bad:
                ok = False
                msgs.append(f"{bad}/{len(sn)} rows differ")
        if ok:
            print(f"pass {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL {name}: " + "; ".join(msgs))
            n_fail += 1
            failures.append(name)
    print(f"\n{n_pass} pass, {n_fail} fail" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
