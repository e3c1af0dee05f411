"""Streaming-query cost breakdown probe (r15 optimization tooling,
guide §1: measure first).

The bench's wall-clock for a streaming query hides WHERE the time goes:
micro-batch count, per-batch durationMs (addBatch / getBatch /
walCommit / commitOffsets / triggerExecution), and the state-store
commit times. This probe monkey-patches the streaming module's
``_run_to_memory`` to capture every finished query's ``recentProgress``
and prints the per-batch duration breakdown alongside the end-to-end
query time — so a change to state sizing, checkpoint placement, or
trigger shape can be attributed to the component it actually moved.

Usage:
  python tools/stream_probe.py [--sf DIR] [--n N] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from pyspark_xgboost_spark.registry import all_queries
    from pyspark_xgboost_spark.session import get_spark
    from pyspark.sql.streaming import StreamingQueryListener

    captured: list = []

    class Probe(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            captured.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark = get_spark("stream_probe", cpus=args.cpus)
    spark.streams.addListener(Probe())
    qs = all_queries()
    for name in args.queries:
        if name not in qs:
            print(f"{name}: UNKNOWN", flush=True)
            continue
        for i in range(args.n):
            captured.clear()
            spark.sparkContext.setJobDescription(f"sprobe:{name}")
            t0 = time.perf_counter()
            try:
                df = qs[name](spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: FAILED {type(exc).__name__}: {exc}")
                break
            dt = time.perf_counter() - t0
            # give the listener bus a beat to drain
            time.sleep(0.3)
            print(f"\n=== {name} run {i}: total {dt:.3f}s ===", flush=True)
            for p in captured:
                dur = p.get("durationMs", {})
                so = p.get("stateOperators", [])
                commit = sum(
                    op.get("customMetrics", {}).get("commitTimeMs", 0)
                    if isinstance(op, dict)
                    else 0
                    for op in so
                )
                nrows = sum(
                    op.get("numRowsTotal", 0) if isinstance(op, dict) else 0
                    for op in so
                )
                print(
                    f"  batch {p.get('batchId')}: "
                    f"trigger={dur.get('triggerExecution', '?')}ms "
                    f"addBatch={dur.get('addBatch', '?')}ms "
                    f"getBatch={dur.get('getBatch', '?')}ms "
                    f"latestOffset={dur.get('latestOffset', '?')}ms "
                    f"walCommit={dur.get('walCommit', '?')}ms "
                    f"commitOffsets={dur.get('commitOffsets', '?')}ms "
                    f"queryPlanning={dur.get('queryPlanning', '?')}ms "
                    f"stateCommit={commit}ms stateRows={nrows} "
                    f"inRows={p.get('numInputRows')}",
                    flush=True,
                )
            spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
