"""CLI runner: ``python -m workhop2_etl_spark <command>``.

    list                     — print every registered query name
    run <query> [--sf-dir D] [--explain] [--limit N]
                             — execute one suite query and print rows
    pipeline [--mode spec|strict] --grammy CSV --spotify CSV [--out DIR]
                             — run the grammy×spotify pipeline on CSVs

The suite registry is the single source of truth; anything a test or
the driver can run, a user can run from the shell.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="workhop2_etl_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    runp = sub.add_parser("run", help="run one suite query")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    runp.add_argument("--explain", action="store_true", help="print the formatted physical plan instead of rows")
    runp.add_argument("--limit", type=int, default=20)

    pipep = sub.add_parser("pipeline", help="run the grammy×spotify pipeline")
    pipep.add_argument("--mode", choices=["spec", "strict"], default="spec")
    pipep.add_argument("--grammy", required=True, help="grammy CSV path")
    pipep.add_argument("--spotify", required=True, help="spotify CSV path")
    pipep.add_argument("--out", help="parquet output dir (default: print 20 rows)")

    args = ap.parse_args(argv)

    from workhop2_etl_spark import suite
    from workhop2_etl_spark.session import get_spark

    suite.load_all()

    if args.cmd == "list":
        for name in sorted(suite.QUERIES):
            print(name)
        return 0

    spark = get_spark(f"cli-{args.cmd}")
    if args.cmd == "run":
        fn = suite.QUERIES.get(args.query)
        if fn is None:
            print(f"unknown query: {args.query} (see `list`)", file=sys.stderr)
            return 2
        df = fn(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    # pipeline
    from workhop2_etl_spark.plans import grammy_spotify as P
    from workhop2_etl_spark.plans.schemas import GRAMMY_SCHEMA, SPOTIFY_SCHEMA
    from workhop2_etl_spark.sources.readers import read_csv

    g = read_csv(spark, args.grammy, GRAMMY_SCHEMA)
    s = read_csv(spark, args.spotify, SPOTIFY_SCHEMA)
    out = P.run_pipeline(g, s, mode=args.mode)
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        out.show(20, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
