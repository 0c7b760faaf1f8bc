"""Time individual driver-registry queries standalone (warm medians)
-- the optimization-round measurement loop: one untimed warm pass per
query, then N timed noop-sink samples, per-query medians printed as
one JSON line. Mirrors bench.py's standalone_warm protocol so numbers
are comparable to the committed artifacts.

Usage: python tools/qtime.py [sf_dir] QUERY [QUERY ...]
       SPARK_GRAFT_BENCH_RUNS=N python tools/qtime.py ... (default 3)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    load1 = os.getloadavg()[0]
    from solana_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import _configure
    from solana_data_etl_pipeline_spark.plans.suite import all_queries

    _configure(spark)
    qs = all_queries()

    def _drop_sample_blocks() -> None:
        # mirror bench.py's r14 window hygiene: blocking unpersist of
        # sample-local checkpoint blocks, outside the timed region
        try:
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(True)
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"qtime warm: {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        _drop_sample_blocks()
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"qtime sample {i}: {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            _drop_sample_blocks()
        timings[name] = round(statistics.median(samples), 3)
    print(json.dumps({"queries": timings, "runs": runs, "load1_at_start": round(load1, 2), "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
