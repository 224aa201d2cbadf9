"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry at a given sf_dir AND its oracle_sql()
in DuckDB on the same parquet; compare row count, schema width, and an
order-insensitive value hash (columns sorted by name, floats rounded).

Usage: python tools/oracle_check.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from gaoya_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows: list[dict]) -> str:
    lines = []
    for row in rows:
        cols = sorted(row.keys())
        lines.append("|".join(_norm_cell(row[c]) for c in cols))
    lines.sort()
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    if not os.environ.get("SPARK_GRAFT_ONLY"):
        print("== entry() smoke (sf0.001) ==")
        edf = entrymod.entry(spark)
        erows = edf.collect()
        print(f"entry: {len(erows)} rows, schema: {edf.schema.simpleString()}")
        assert len(erows) >= 0

    qs = entrymod.queries()
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        keep = {q.strip() for q in only.split(",")}
        unknown = keep - qs.keys()
        if unknown:
            # a misspelled/stale name would otherwise filter to an empty
            # dict and exit 0 — a vacuous green that looks like a pass
            print(f"ERROR: SPARK_GRAFT_ONLY names not in queries(): {sorted(unknown)}")
            spark.stop()
            return 2
        qs = {k: v for k, v in qs.items() if k in keep}
    oq = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
        if name not in oq:
            print(f"{name:32s} rows={len(srows):6d}  (rows-only, no oracle)")
            continue
        orows = con.execute(oq[name]).df().to_dict("records")
        sh, oh = value_hash(srows), value_hash(orows)
        ok = (len(srows) == len(orows)) and sh == oh
        status = "OK " if ok else "FAIL"
        print(f"{name:32s} rows={len(srows):6d}/{len(orows):6d}  hash={'=' if sh==oh else 'DIFF'}  {status}")
        if not ok:
            failures += 1
            for i, (a, b) in enumerate(zip(sorted(map(str, srows)), sorted(map(str, orows)))):
                if a != b:
                    print(f"  first diff @{i}:\n   spark: {a}\n   duck : {b}")
                    break
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*(sys.argv[1:] or [])))
