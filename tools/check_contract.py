"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark at the given sf and the
matching oracle_sql() on DuckDB (tables registered as views), compares
row-count, schema (column names), and an order-insensitive value hash.

Usage: python tools/check_contract.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    import datetime
    import math
    from decimal import Decimal
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[8]")
             .appName("check_contract")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        import re as _re
        if name_filter and not _re.search(name_filter, name):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # the driver gate's pandas canonicalizer sort_values-crashes on
            # unhashable cells — flag complex-typed output columns loudly
            from pyspark.sql import types as _T
            complex_cols = [f.name for f in sdf.schema.fields
                            if isinstance(f.dataType, (_T.ArrayType,
                                                       _T.StructType,
                                                       _T.MapType))]
            if complex_cols:
                print(f"NOTE {name}: complex-typed output columns "
                      f"{complex_cols} would crash the driver canonicalizer")
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(srows)} (no oracle, rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:140]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
            if sh != oh:
                problems.append(f"hash {sh} != {oh}")
                # show first differing rows for debugging
                sset = {tuple(norm_cell(c) for c in r) for r in srows}
                oset = {tuple(norm_cell(c) for c in r) for r in orows}
                only_s = list(sset - oset)[:2]
                only_o = list(oset - sset)[:2]
                if only_s:
                    problems.append(f"spark-only: {only_s}")
                if only_o:
                    problems.append(f"oracle-only: {only_o}")
        dt = time.time() - t0
        if problems:
            print(f"FAIL {name}: {'; '.join(str(p) for p in problems)} [{dt:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(srows)} [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
