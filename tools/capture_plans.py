"""Capture `.explain("formatted")` for named queries into files.

Round-12 optimization deliverable: plans/r12/<query>_{before,after}.txt
(the judge checks plan claims against these files).

Usage:
  python tools/capture_plans.py before t12_bm25_persisted_index st14_...
  python tools/capture_plans.py after  t12_bm25_persisted_index

Building a query can execute bounded setup work (index saves, scalar
collects) — same caveat as tools/plan_report.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from workhop2_etl_spark import suite  # noqa: E402
from workhop2_etl_spark.session import get_spark  # noqa: E402

suite.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), "first arg must be before|after"
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("capture_plans")
    for name in names:
        df = suite.QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
