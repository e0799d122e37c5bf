"""workhop2_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference ETL project (Miguel491ci/Workhop2-ETL —
see SURVEY.md), generalized into composable DataFrame operators and
extended with large-scale LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Design tenets (SURVEY.md §4, §7):
  * DataFrame/SQL only — declare logical plans, let Catalyst + AQE
    pick physical strategies. No RDDs, no driver-side row loops.
  * Expression-first — every scalar transform in the reference
    (including its one real UDF, ``normalize_text``) compiles to
    built-in column expressions; zero row-at-a-time Python UDFs.
  * Scale posture — broadcast bounded dims, window-argmax instead of
    global sorts, partial aggregation by construction, skew handled
    by AQE; nothing collects to the driver inside a pipeline.
"""

from workhop2_etl_spark.session import get_spark, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]
__version__ = "0.1.0"
