"""Quick driver-contract smoke: entry() on sf0.001 + a handful of
queries() entries compared against their oracle_sql() twins at sf0.001
(the full gate replica is scripts/check_entry.py at sf0.01).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = ["term_postings", "bool_not_match", "collection_stats",
         "dedup_exact", "emb_cosine_topk", "events_tumbling"]


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    sf = "/root/testdata/sf0.001"
    # ANN oracle SQL embeds vector literals read from the oracle dir —
    # point it at the smoke corpus (the driver's gate uses sf0.01)
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf
    import __spark_entry__ as m
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("drive_entry")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = m.entry(spark).collect()
    assert len(rows) > 0, "entry() returned no rows"
    print(f"entry(): {len(rows)} rows, top doc={rows[0]['doc_id']} "
          f"score={rows[0]['score']:.6f}")

    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf, t + '.parquet')}')"
        )
    qs, oracles = m.queries(), m.oracle_sql()
    for name in SMOKE:
        got = sorted(map(tuple, qs[name](spark, sf).collect()))
        want_rows = con.execute(oracles[name]).fetchall()
        # column order may differ; compare sorted-by-name values
        sdf = qs[name](spark, sf)
        order = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
        a = sorted(tuple(r[i] for i in order) for r in got)
        b = sorted(tuple(r[i] for i in oorder) for r in want_rows)
        assert a == b, f"{name}: mismatch ({len(a)} vs {len(b)} rows)"
        print(f"smoke {name}: {len(a)} rows match oracle")
    print("DONE")
    spark.stop()


if __name__ == "__main__":
    main()
