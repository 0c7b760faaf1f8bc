"""Physical-plan audit: one line per headline query summarizing the
plan shapes that matter at scale (exchanges, join strategies,
cartesian products, scans, pushed filters), plus ReadSchema/
PushedFilters detail with --detail. See SCALE.md for the analysis.

Usage: python tools/planaudit.py [sf_dir] [--detail] [--all]

Default audits the curated driver registry; ``--all`` audits the full
plans.suite registry including test-only baseline twins.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if a not in ("--detail", "--all")]
    detail = "--detail" in sys.argv
    use_all = "--all" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    from solana_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("planaudit")
    spark.sparkContext.setLogLevel("ERROR")

    if use_all:
        from __spark_entry__ import _configure
        from solana_data_etl_pipeline_spark.plans.suite import all_queries

        _configure(spark)
        qs = all_queries()
    else:
        from __spark_entry__ import queries

        qs = queries()

    for name, fn in qs.items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - audit convenience
            print(f"{name:26s} ERROR: {e}")
            continue
        counts = {
            "exch": plan.count("Exchange"),
            "bhj": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "cart": plan.count("CartesianProduct"),
            "scans": plan.count("FileScan"),
        }
        pushed = re.findall(r"PushedFilters: (\[[^\]]*\])", plan)
        counts["pushed"] = sum(1 for p in pushed if p != "[]")
        flags = " !CARTESIAN" if counts["cart"] else ""
        print(
            f"{name:26s} " + " ".join(f"{k}={v}" for k, v in counts.items()) + flags
        )
        if detail:
            for m in re.finditer(r"ReadSchema: (\S+)", plan):
                print(f"    read   {m.group(1)[:110]}")
            for p in pushed:
                print(f"    pushed {p[:110]}")


if __name__ == "__main__":
    main()
