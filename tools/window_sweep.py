"""Pre-drive the round driver's correctness gate: run the
alphabetically-first-50 registry queries against their DuckDB oracles
at sf0.01 under a DEFAULT SparkSession (the driver does not use the
engine's session factory), exactly the comparison CORRECTNESS_r{N}
records — so a would-be red row is caught before the round ends.

Usage: python tools/window_sweep.py [--sf-dir /root/testdata/sf0.01]
       [--names q_a,q_b]      # default: the 50-name window
Prints one line per query and a final FAILED list; exit 1 if any.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default=None)
    args = ap.parse_args()

    entry = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", entry)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )
    qs, osql = mod.queries(), mod.oracle_sql()
    names = (
        args.names.split(",") if args.names else sorted(qs)[:50]
    )
    bad = []
    for name in names:
        try:
            sdf = qs[name](spark, args.sf_dir).toPandas()
            if name not in osql:
                print(f"{name}: rows={len(sdf)} (rows-only)")
                continue
            odf = con.execute(osql[name]).df()
            cols = sorted(sdf.columns)
            ok = cols == sorted(odf.columns)
            a = sdf[cols].astype(str).sort_values(cols).reset_index(drop=True)
            b = (
                odf[sorted(odf.columns)]
                .astype(str)
                .sort_values(sorted(odf.columns))
                .reset_index(drop=True)
            )
            ok = ok and len(a) == len(b) and a.equals(b)
            print(f"{name}: rows={len(a)} match={ok}")
            if not ok:
                bad.append(name)
        except Exception as e:  # a crash IS a red row
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}")
            bad.append(name)
    print("FAILED:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
