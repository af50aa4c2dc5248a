"""Driver simulation: run the __spark_entry__ contract on a VANILLA
SparkSession (none of session.py's confs) and compare every query
against the DuckDB oracle at sf0.01 — exactly what the external
correctness driver does.

Usage:
    python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--only name1,name2]

Exit code 1 if any query fails.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        col = pdf[c]
        if str(col.dtype).startswith("datetime"):
            pdf[c] = col.astype("datetime64[us]").astype(str)
        elif col.dtype == object:
            pdf[c] = col.astype(str)
        elif str(col.dtype).startswith("float"):
            pdf[c] = col.round(6)
    pdf = pdf.sort_values(
        by=list(pdf.columns), kind="mergesort", na_position="last"
    ).reset_index(drop=True)
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # Deliberately bone-stock: the driver owns its session and sets none
    # of tajo_spark.session.build_spark's confs.
    spark = (
        SparkSession.builder.appName("driver_sim")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs, os_ = E.queries(), E.oracle_sql()
    names = list(qs)
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    fails = []
    for name in names:
        t0 = time.time()
        row: dict = {}
        try:
            spdf = qs[name](spark, args.sf).toPandas()
            if name in os_:
                opdf = con.execute(os_[name]).fetchdf()
                row["rows_match"] = len(spdf) == len(opdf)
                row["schema_match"] = sorted(spdf.columns) == sorted(opdf.columns)
                row["hash_match"] = (
                    row["rows_match"]
                    and row["schema_match"]
                    and canon(spdf.copy()) == canon(opdf.copy())
                )
                ok = row["hash_match"]
            else:
                row["rows_only"] = len(spdf)
                ok = True
            row["err"] = None
        except Exception as exc:  # noqa: BLE001
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
            ok = False
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        status = "ok" if ok else "FAIL"
        print(f"{status:4s} {name} ({row['sec']}s)"
              + ("" if ok else f"  {row.get('err') or 'hash/schema/rows mismatch'}"),
              flush=True)
        if not ok:
            fails.append(name)

    print(f"\n{len(names) - len(fails)}/{len(names)} green; FAILS: {fails or 'none'}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
