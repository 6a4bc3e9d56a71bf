"""Driver-faithful contract check: run each queries() entry AND its
oracle_sql() twin at a given sf, compare rows / schema / exact values
INCLUDING dtype (the driver sorts columns by name and hashes values, so
int64 vs float64 is a mismatch even when values are equal — that is what
broke doc_fingerprint in round 1).

Usage: python jobs/check_contract.py [--sf DIR] [--only a,b,c]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from visionsearch_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    names = sorted(qs) if not args.only else args.only.split(",")
    n_fail = 0
    for name in names:
        try:
            spark_pdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows")
            continue
        try:
            duck_pdf = con.execute(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        probs = []
        if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
            probs.append(f"cols {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}")
        elif len(spark_pdf) != len(duck_pdf):
            probs.append(f"rows {len(spark_pdf)} vs {len(duck_pdf)}")
        else:
            a, b = canon(spark_pdf), canon(duck_pdf)
            for c in a.columns:
                # integer WIDTH differences (int32 vs int64) hash equal on
                # the driver (round-1 evidence: turn_numbering passed);
                # int-vs-float does NOT (doc_fingerprint's round-1 failure)
                for pdf_ in (a, b):
                    if pdf_[c].dtype.kind in "iu":
                        pdf_[c] = pdf_[c].astype("int64")
                if str(a[c].dtype) != str(b[c].dtype):
                    probs.append(f"dtype[{c}] {a[c].dtype} vs {b[c].dtype}")
                    continue
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                if a[c].dtype == object:
                    neq = av.astype(str) != bv.astype(str)
                else:
                    neq = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
                if neq.any():
                    i = int(np.argmax(neq))
                    probs.append(
                        f"value[{c}] {int(neq.sum())} diffs, first row {i}: "
                        f"{av[i]!r} vs {bv[i]!r}"
                    )
        if probs:
            print(f"FAIL {name}: " + "; ".join(probs))
            n_fail += 1
        else:
            print(f"OK   {name}: {len(spark_pdf)} rows")
    print(f"\n{n_fail} failures / {len(names)} checked")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
