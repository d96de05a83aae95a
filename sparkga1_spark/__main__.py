"""CLI for the engine: list / run / explain / oracle-check named queries.

    python -m sparkga1_spark list
    python -m sparkga1_spark run flagship_region_stats [--sf-dir DIR] [--show N]
    python -m sparkga1_spark explain j_range_exome_overlap
    python -m sparkga1_spark sql "SELECT count(*) FROM lineitem" [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sparkga1_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            p.add_argument("--show", type=int, default=20)
    p = sub.add_parser("sql", help="run SQL over the registered table views")
    p.add_argument("statement")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--show", type=int, default=20)
    args = ap.parse_args(argv)

    from sparkga1_spark.plans.registry import all_oracles, all_queries

    queries = all_queries()
    if args.cmd == "list":
        oracles = all_oracles()
        for name in sorted(queries):
            print(f"{name:35s} {'oracle' if name in oracles else 'rows-only'}")
        return 0

    from sparkga1_spark.session import get_spark

    spark = get_spark("cli")
    if args.cmd == "sql":
        from sparkga1_spark.sources.catalog import register_views

        register_views(spark, args.sf_dir)
        spark.sql(args.statement).show(args.show, truncate=False)
        return 0

    if args.query not in queries:
        print(f"unknown query: {args.query} (see `list`)", file=sys.stderr)
        return 2
    df = queries[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    t0 = time.time()
    rows = df.limit(args.show).collect()
    n = df.count()
    for r in rows:
        print(tuple(r))
    print(f"-- {n} rows total in {time.time() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
