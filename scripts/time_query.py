"""Time one or more declared queries standalone with the noop sink.

Usage: python scripts/time_query.py [-n RUNS] [--final-plan] query [query ...]

Prints per-run wall seconds (first run includes plan/codegen compile),
and with --final-plan dumps the post-execution adaptive plan (shows
runtime ReusedExchange / join rewrites that the static explain hides).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--final-plan", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    spark = get_spark("time-query")
    queries = entry_mod.queries()
    # warmup parity with bench.py
    queries["summary_events"](spark, SF_DIR).collect()
    spark.range(2048).mapInPandas(lambda it: it, "id long").count()
    for name in args.names:
        spark.sparkContext.setJobDescription(name)
        times = []
        df = None
        for i in range(args.n):
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        print(f"{name}: " + " ".join(f"{t:.3f}" for t in times))
        if args.final_plan and df is not None:
            print(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
