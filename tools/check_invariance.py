"""Partition-invariance sweep: every registered query must produce the
IDENTICAL result multiset under different shuffle-partition settings.

Float partial-aggregation order changes with partition count, so any
query whose result drifts here has a nondeterminism bug that WILL
surface on a real cluster (where partition counts differ run to run).
The repo's integer-quantization discipline exists precisely to make
this sweep pass.

Usage: python tools/check_invariance.py [sf_dir] [query ...]
Skips the stateful streaming queries whose scratch staging makes a
second in-process run order-dependent (they are covered by their own
stream==batch tests) and compares everything else at shuffle
partitions 32 (default-ish) vs 5.
"""

from __future__ import annotations

import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

# memory-sink streaming queries register a new sink table per call, so
# they're trivially re-runnable; file-sink/foreach queries reuse
# fingerprint-keyed scratch state on purpose (idempotent), also fine.
# Nothing needs skipping by design — keep a list anyway for emergencies.
SKIP: set[str] = set()


def canon(df) -> Counter:
    cols = sorted(df.columns)
    out = Counter()
    for row in df.collect():
        out[tuple(repr(row[c]) for c in cols)] += 1
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from pyspark_xgboost_spark.registry import all_queries
    from pyspark_xgboost_spark.session import get_spark

    spark = get_spark("invariance")
    qs = all_queries()
    names = [n for n in qs if (not only or n in only) and n not in SKIP]
    failures = []
    for name in names:
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = canon(qs[name](spark, sf_dir))
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            b = canon(qs[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        if a == b:
            print(f"PASS {name} ({sum(a.values())} rows)")
        else:
            only_a = list((a - b).keys())[:3]
            only_b = list((b - a).keys())[:3]
            print(f"FAIL {name}: 32p-only={only_a} 5p-only={only_b}")
            failures.append(name)
    print(f"\n{len(names) - len(failures)} invariant, {len(failures)} variant/err")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
