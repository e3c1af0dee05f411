"""Grading-window audit: show which queries occupy the driver's 50
correctness slots and their attestation history.

The driver grades only the FIRST 50 registered queries each round
(registry.py controls the order via _GRADE_FIRST / _CEDE_WINDOW). This
prints the window with each query's most recent CORRECTNESS_r*.json
status, so a round can verify that (a) every never-graded query is
in-window, and (b) displaced queries all have a green row somewhere.

Usage: python tools/check_window.py
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    from pyspark_xgboost_spark.registry import all_oracles, all_queries

    qs = list(all_queries())
    oracles = all_oracles()
    history: dict[str, tuple[str, str]] = {}  # name -> (round, status)
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = path.rsplit("CORRECTNESS_", 1)[-1].removesuffix(".json")
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if row.get("err") == "no_oracle":
                # the driver's rows-only record — its own status
                # regardless of spark_rows; 'ran' vs 'not run' is
                # carried by whether the row count was captured
                status = (
                    "rows-only-ran"
                    if row.get("spark_rows") is not None
                    else "rows-only-norun"
                )
            elif row.get("err"):
                status = "ERR"
            elif row.get("hash_match") is True:
                status = "green"
            elif row.get("hash_match") is False:
                status = "WRONG"
            elif row.get("rows_match") is True:
                status = "rows-only-green"
            else:
                status = "?"
            history[name] = (rnd, status)

    window, rest = qs[:50], qs[50:]
    print(f"== grading window (first 50 of {len(qs)}) ==")
    for i, name in enumerate(window, 1):
        rnd, status = history.get(name, ("-", "never-graded"))
        orc = "oracle" if name in oracles else "rows-only"
        print(f"{i:3d}. {name:45s} {orc:9s} last: {rnd} {status}")

    ungraded_out = [n for n in rest if n not in history]
    red_out = [
        n for n in rest if history.get(n, ("", ""))[1] in ("ERR", "WRONG")
    ]
    print(f"\ndisplaced without ANY driver row ({len(ungraded_out)}): {ungraded_out}")
    print(f"displaced with a RED last row ({len(red_out)}): {red_out}")


if __name__ == "__main__":
    main()
