"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query time = full action latency (plan + execute + collect) after
a warm-up action that absorbs one-time session/JVM costs. The metric
value is the sum over headline queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from workhop2_etl_spark import suite
from workhop2_etl_spark.session import get_spark, load_table

suite.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline queries — one per operator family (kept in sync as the
#: suite grows; bench-critical, not the full correctness matrix).
HEADLINE = [
    # aggregation / sort / dedup probes
    "q1_pricing_summary",
    "a1_topk_group_count",
    "a2_count_distinct",
    "a4_dup_counts",
    "a7_key_dup_rows",
    "a8_top_entities",
    "o2_sort_limit",
    # scalar kernel + filters
    "f1_normalize_text",
    "p1_conj_filter",
    # joins (equi, fan-out argmax, fuzzy two-pass)
    "j1_impute_left_join",
    "j2_fanout_argmax_join",
    "j3_fuzzy_two_pass",
    "j4_argmax_dedupe",
    "u1_union_by_name",
    # multi-way star joins + subquery shapes
    "q3_shipping_priority",
    "q5_local_volume",
    "q18_large_orders",
    "q4_order_priority",
    "q9_product_profit",
    "q19_disjunctive_revenue",
    # LLM-pipeline extensions
    "d2_minhash_lsh_pairs",
    "d4_simhash_groups",
    # ANN: the bucketed scale paths (v2 LSH / v5 IVF) are the
    # production defaults; v1 brute force is the exact baseline.
    "v1_topk_cosine_bruteforce",
    "v2_topk_cosine_lsh",
    "v5_topk_cosine_ivf",
    "t2_quality_profile",
    "m1_image_meta",
    # event-time windows
    "st1_tumbling_counts",
    "st3_session_windows",
    "st6_interval_join",
]


def main() -> None:
    spark = get_spark("bench")
    # Warm-up: one trivial action so JVM startup / first-stage costs
    # don't land on the first measured query.
    load_table(spark, SF_DIR, "region").count()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = suite.QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.time()
        rows = fn(spark, SF_DIR).collect()
        times[name] = round(time.time() - t0, 3)
        assert rows is not None
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
