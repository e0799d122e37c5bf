"""Min-of-N in-session timing for named registry queries.

Round-12 optimization instrumentation: single-query wall clock is
noisy on this box (invisible co-tenant steal measured up to 1.5x),
so each query runs N times in one warm session and the MIN is the
comparable number (the bench's own best-of-3 rationale).

Usage: python tools/ab_query.py [-n 3] q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from workhop2_etl_spark import suite  # noqa: E402
from workhop2_etl_spark.session import get_spark, load_table  # noqa: E402

suite.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    spark = get_spark("ab_query")
    load_table(spark, SF_DIR, "region").count()
    load_table(spark, SF_DIR, "documents").count()
    for name in args:
        fn = suite.QUERIES[name]
        times = []
        for _ in range(n):
            t0 = time.time()
            rows = fn(spark, SF_DIR).collect()
            times.append(round(time.time() - t0, 3))
            assert rows is not None
        print(f"AB {name} min={min(times)} all={times}", flush=True)


if __name__ == "__main__":
    main()
