"""Audit oracle-vs-Spark result dtypes for hash-artifact risk.

The driver's value hash is type-sensitive: DuckDB ``sum()`` over
integers returns HUGEINT, which pandas fetches as float64 — so the
hash of ``0.0`` differs from Spark's bigint ``0`` even when values
match (the only CORRECTNESS_r01 failures were exactly this). This
tool runs every oracle on DuckDB and the matching query on Spark at
$SPARK_GRAFT_SF_DIR (default sf0.001 for speed) and flags any column
where DuckDB fetches float/object while Spark produces an integer
type (or vice versa), plus decimal-vs-double mismatches.

Usage: python tools/audit_types.py [query_name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

INT_SPARK = {"tinyint", "smallint", "int", "bigint"}
INT_ARROW = {"int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"}
FLOAT_ARROW = {"float", "double", "halffloat"}


def risk(spark_type: str, o_type: str) -> str | None:
    base = spark_type.split("(")[0]
    if base in INT_SPARK and o_type in FLOAT_ARROW:
        return "spark-int vs oracle-float (HUGEINT artifact?)"
    if base in ("double", "float") and o_type in INT_ARROW:
        return "spark-float vs oracle-int"
    if base.startswith("decimal") and not o_type.startswith("decimal"):
        return f"spark-decimal vs oracle-{o_type} (prefer double/bigint)"
    if o_type.startswith("decimal") and not base.startswith("decimal"):
        return f"oracle-decimal vs spark-{base} (prefer double/bigint)"
    return None


def main() -> int:
    import __spark_entry__ as e
    from workhop2_etl_spark.session import get_spark

    spark = get_spark("audit_types")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    only = set(sys.argv[1:])
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"{name}: (no oracle)")
            continue
        try:
            sdf = fn(spark, SF_DIR)
            stypes = dict(sdf.dtypes)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {ex}")
            bad += 1
            continue
        try:
            # Arrow, not fetchdf: DuckDB's Arrow export maps HUGEINT->double
            # (the driver-visible artifact) while nullable BIGINT stays int64
            # (which pandas would falsely promote to float64).
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            otypes = {f.name: str(f.type) for f in tbl.schema}
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {ex}")
            bad += 1
            continue
        if sorted(stypes) != sorted(otypes):
            print(f"{name}: COLUMN MISMATCH spark={sorted(stypes)} oracle={sorted(otypes)}")
            bad += 1
            continue
        flags = []
        for c, st in stypes.items():
            r = risk(st, otypes[c])
            if r:
                flags.append(f"{c}: {st} vs {otypes[c]} — {r}")
        if flags:
            bad += 1
            print(f"{name}: " + "; ".join(flags))
    print(f"\n{'FAIL' if bad else 'OK'}: {bad} queries flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
