"""Plan-quality report over the whole query registry.

For every registered query, builds the DataFrame and summarizes the
physical plan. Plan capture itself is analysis-only, but BUILDING a
query can execute work: the s-family round-trip queries (s1/s2/s3/s6)
write their CSV/JSON/ORC sink as part of construction, and several
builders run bounded setup actions (localCheckpoints, scalar counts)
— so a registry-wide report does executor work and disk I/O.
The summary covers: shuffle count,
join strategies, window/codegen presence, Python evaluation nodes,
and whether any filter reached a parquet scan. Prints one JSON line
per query plus a final summary line, so plan regressions are
diffable round-over-round the same way BENCH_r{N}.json is.

The hard invariants (no BatchEvalPython, no CartesianProduct) are
ENFORCED by tests/test_plan_quality.py::test_registry_wide_no_row_
python_no_cartesian; this tool is the human-readable/diffable view.

Usage: python tools/plan_report.py [query_name ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

#: Marker → counting regex. Plain substring counting would inflate
#: prefixes ("Window" also matches every WindowGroupLimit node), so
#: markers that prefix other node names use a lookahead.
MARKERS = {
    "BroadcastHashJoin": r"BroadcastHashJoin",
    "SortMergeJoin": r"SortMergeJoin",
    "BroadcastNestedLoopJoin": r"BroadcastNestedLoopJoin",
    "CartesianProduct": r"CartesianProduct",
    "WindowGroupLimit": r"WindowGroupLimit",
    "Window": r"Window(?!GroupLimit)",
    "TakeOrderedAndProject": r"TakeOrderedAndProject",
    "ArrowEvalPython": r"ArrowEvalPython",
    "BatchEvalPython": r"BatchEvalPython",
    "MapInPandas": r"MapInPandas",
    "FlatMapGroupsInPandas": r"FlatMapGroupsInPandas",
    "Expand": r"Expand",
    "Generate": r"Generate",
}


def summarize(plan: str) -> dict:
    # per-SCAN pushdown accounting: a plan can mix filtered and
    # filter-less scans (dim spines, date sequences), so a single
    # "any empty PushedFilters anywhere" boolean would hide a lost
    # pushdown on the filtered scan. pushed_scans/bare_scans counts
    # make a regression a visible diff.
    pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
    bare = len(re.findall(r"PushedFilters: \[\]", plan))
    out = {
        "shuffles": len(re.findall(r"Exchange hashpartitioning", plan)),
        "range_shuffles": len(re.findall(r"Exchange rangepartitioning", plan)),
        # NOTE: no codegen-span metric — under AQE the pre-execution
        # plan string (AdaptiveSparkPlan isFinalPlan=false) carries no
        # "*(n)" codegen marks, so the count would read 0 everywhere.
        # The row_python/cartesian flags below are the load-bearing
        # slow-path detectors.
        "pushed_scans": pushed,
        "bare_scans": bare,
    }
    for m, pat in MARKERS.items():
        n = len(re.findall(pat, plan))
        if n:
            out[m] = n
    return out


def main() -> None:
    from workhop2_etl_spark import suite
    from workhop2_etl_spark.session import get_spark

    suite.load_all()
    spark = get_spark("plan_report")
    names = sys.argv[1:] or list(suite.QUERIES)
    totals = {"queries": 0, "shuffles": 0, "row_python": 0, "cartesian": 0}
    for name in names:
        fn = suite.QUERIES[name]
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        s = summarize(plan)
        totals["queries"] += 1
        totals["shuffles"] += s["shuffles"]
        totals["row_python"] += s.get("BatchEvalPython", 0)
        totals["cartesian"] += s.get("CartesianProduct", 0)
        print(json.dumps({"query": name, **s}))
    print(json.dumps({"summary": totals}))


if __name__ == "__main__":
    main()
