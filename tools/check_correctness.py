"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares:
  1. row count
  2. column-name set
  3. order-insensitive value multiset (columns sorted by name,
     rows sorted, values canonicalized)

Usage:
    python tools/check_correctness.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    """Canonicalize a value for cross-engine comparison. NULL maps to
    a tuple sentinel so mixed null/non-null columns still sort (every
    canon value is a tuple; "_" sorts below the type tags used)."""
    if v is None:
        return ("_null",)
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("a", tuple(canon(x) for x in v))
    if isinstance(v, bytes):
        return ("b", v.hex())
    return ("s", str(v))


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--json",
        metavar="PATH",
        help="also write a driver-format correctness artifact "
        "(rows/schema/hash match per query) to PATH",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from etl_reporting_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    selected = args.queries or list(qs)
    failures: list[str] = []
    report: dict[str, dict] = {}
    for name in selected:
        if name not in qs:
            print(f"?? {name}: no such query")
            continue
        t0 = time.time()
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        report[name] = rec
        try:
            sdf = qs[name](spark, args.sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
            rec["spark_rows"] = len(srows)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            rec["err"] = f"spark error: {type(e).__name__}: {str(e)[:300]}"
            print(f"FAIL {name}: {rec['err']}")
            continue
        if name not in oracles:
            rec.update(rows_match=True, schema_match=True, hash_match=True)
            rec["err"] = "rows-only (no oracle)"
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s, no oracle)")
            continue
        try:
            rel = con.execute(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
            rec["oracle_rows"] = len(drows)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            rec["err"] = f"duckdb error: {type(e).__name__}: {str(e)[:300]}"
            print(f"FAIL {name}: {rec['err']}")
            continue

        problems = []
        rec["rows_match"] = len(srows) == len(drows)
        rec["schema_match"] = sorted(scols) == sorted(dcols)
        if not rec["rows_match"]:
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if not rec["schema_match"]:
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sm = rows_to_multiset(scols, srows)
            dm = rows_to_multiset(dcols, drows)
            rec["hash_match"] = sm == dm
            if sm != dm:
                n_diff = sum(1 for a, b in zip(sm, dm) if a != b)
                problems.append(f"values differ ({n_diff}/{len(sm)} sorted rows)")
                for a, b in zip(sm, dm):
                    if a != b:
                        problems.append(f"  spark : {a}")
                        problems.append(f"  duckdb: {b}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:4]:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(selected) - len(failures)}/{len(selected)} queries match")
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=2)
        print(f"wrote {args.json}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
