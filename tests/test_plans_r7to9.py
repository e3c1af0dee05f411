"""Merged pooled sweep for the round-7/8/9/9b contract checks.

The four modules each used to run their own ``run_pooled`` sweep; four
sequential 12-thread pools over the shared session left ~28s of
ramp-up and idle-tail on the table (r13 verdict, suite-time item).
One pool over the concatenated check lists lets Spark's scheduler
interleave all 48 jobs. The checks themselves stay in their home
modules — this module only fans them out."""

from __future__ import annotations


def test_r7_to_r9b_contracts_pooled(spark):
    from tests import (
        test_plans_r7,
        test_plans_r8,
        test_plans_r9,
        test_plans_r9b,
    )
    from tests.conftest import run_pooled

    run_pooled(
        spark,
        test_plans_r7._POOLED_CHECKS
        + test_plans_r8._POOLED_CHECKS
        + test_plans_r9._POOLED_CHECKS
        + test_plans_r9b._POOLED_CHECKS,
    )
