"""Driver simulation: run __spark_entry__ the way the external driver does.

Plain SparkSession (no session.py tuning), every queries() entry at
sf0.01 compared against oracle_sql() in DuckDB with a strict
order-insensitive value hash. Expect FAILED: 0.
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__  # noqa: E402

SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(tuple(str(c) for c in row) for row in pdf.itertuples(index=False))
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    res = __spark_entry__.entry(spark)
    rows = res.collect()
    assert len(rows) > 0, "entry() returned no result"
    print(f"entry(): {len(rows)} rows, schema={[f.name for f in res.schema.fields]}")
    # idempotency probe
    res2 = __spark_entry__.entry(spark)
    assert [f.name for f in res2.schema.fields] == [f.name for f in res.schema.fields]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = __spark_entry__.queries()
    oracles = __spark_entry__.oracle_sql()
    only = os.environ.get("SIM_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        queries = {n: q for n, q in queries.items() if n in keep}
    failed = []
    n_hash = 0
    n_rowsonly = 0
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
        except Exception as e:
            failed.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            n_rowsonly += 1
            print(f"ok   {name}: rows-only ({len(sdf)} rows) "
                  f"[{time.perf_counter()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failed.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error: {e}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
        if problems:
            failed.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            n_hash += 1
            print(f"ok   {name} [{time.perf_counter()-t0:.1f}s]")

    print(f"\nTOTAL: {len(queries)}  hash-verified: {n_hash}  "
          f"rows-only: {n_rowsonly}  FAILED: {len(failed)}")
    for name, why in failed:
        print(f"  FAILED {name}: {why}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
