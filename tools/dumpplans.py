"""Dump `.explain("formatted")` for driver-registry queries into
plans/<tag>/<query>_<suffix>.txt -- the optimization-round evidence
files (the judge checks plan claims against these).

Usage: python tools/dumpplans.py TAG SUFFIX [sf_dir] [QUERY ...]

e.g.  python tools/dumpplans.py r13 before /root/testdata/sf0.1
      python tools/dumpplans.py r13 after  /root/testdata/sf0.1 knn_lsh
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    names = rest[1:] if rest and os.path.isdir(rest[0]) else rest

    from solana_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("dumpplans")
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import queries

    qs = queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # pragma: no cover - audit convenience
            txt = f"ERROR: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")


if __name__ == "__main__":
    main()
