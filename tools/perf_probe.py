"""Per-query performance probe (optimization-round tooling, guide §1).

For each named query: builds the DataFrame, times a noop-sink write
(``df.write.format("noop")`` — computes every column of every row,
guide §1.4) N times on a warm session, and optionally dumps the
formatted physical plan to a file. The bench contract (bench.py,
``.count()`` min-of-two) is untouched — this tool exists to ISOLATE a
query's compute cost and plan shape while iterating on it.

Usage:
  python tools/perf_probe.py [--sf DIR] [--n N] [--plans OUTDIR]
                             [--suffix before|after] query [query ...]

Prints one line per query: min/all samples. Jobs are labelled so the
(otherwise disabled) UI or event logs attribute work per query.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir for formatted plans")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from pyspark_xgboost_spark.registry import all_queries
    from pyspark_xgboost_spark.session import get_spark

    spark = get_spark("perf_probe", cpus=args.cpus)
    qs = all_queries()
    for name in args.queries:
        if name not in qs:
            print(f"{name}: UNKNOWN", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"probe:{name}")
        try:
            # one untimed warmup builds lazy staged state + compiles codegen
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            if args.plans:
                os.makedirs(args.plans, exist_ok=True)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(
                    os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
                ) as fh:
                    fh.write(plan)
            samples = []
            for _ in range(args.n):
                t0 = time.perf_counter()
                df = qs[name](spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            print(
                f"{name}: min {min(samples):.3f}s  "
                + "/".join(f"{s:.3f}" for s in samples),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {type(exc).__name__}: {exc}", flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
