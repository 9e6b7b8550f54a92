"""Command-line front door: ``python -m revtron_utils_spark <cmd>``.

Thin shell over the Engine for ad-hoc inspection of a table directory —
the library is the product; this exists so the declarative surface is
reachable without writing a script.

Commands:
    tables   --dir D
    columns  --dir D --table T
    count    --dir D --table T
    size     --dir D --table T [--date-field F] [--date-window N]
    get      --dir D --table T [--columns a,b] [--where JSON]
             [--sort-by a,b] [--desc] [--limit N] [--offset N]
    sql      --dir D "SELECT ..."

Output: one JSON line per row (or one JSON object for scalar commands).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="revtron_utils_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, table=True):
        sp.add_argument("--dir", required=True, help="directory of <name>.parquet tables")
        if table:
            sp.add_argument("--table", required=True)

    common(sub.add_parser("tables"), table=False)
    common(sub.add_parser("columns"))
    common(sub.add_parser("count"))
    sz = sub.add_parser("size")
    common(sz)
    sz.add_argument("--date-field")
    sz.add_argument("--date-window", type=int)
    g = sub.add_parser("get")
    common(g)
    g.add_argument("--columns")
    g.add_argument("--where", help="where-DSL as JSON (dict or list of dicts)")
    g.add_argument("--sort-by")
    g.add_argument("--desc", action="store_true")
    g.add_argument("--limit", type=int)
    g.add_argument("--offset", type=int)
    q = sub.add_parser("sql")
    common(q, table=False)
    q.add_argument("query")

    args = p.parse_args(argv)

    from .engine import Engine
    from .session import get_spark

    spark = get_spark(app_name="revtron-cli")
    eng = Engine(spark)
    eng.attach_dir(args.dir)

    def emit_rows(df):
        for r in df.collect():
            print(json.dumps(r.asDict(recursive=True), default=str))

    if args.cmd == "tables":
        print(json.dumps(eng.get_tables()))
    elif args.cmd == "columns":
        print(json.dumps(eng.get_table_columns(args.table)))
    elif args.cmd == "count":
        print(json.dumps({"table": args.table, "count": eng.get_table_count(args.table)}))
    elif args.cmd == "size":
        print(
            json.dumps(
                eng.table_size(args.table, date_field=args.date_field, date_window=args.date_window),
                default=str,
            )
        )
    elif args.cmd == "get":
        emit_rows(
            eng.get(
                args.table,
                columns=args.columns.split(",") if args.columns else None,
                where=json.loads(args.where) if args.where else None,
                sort_by=args.sort_by.split(",") if args.sort_by else None,
                ascending=not args.desc,
                limit=args.limit,
                offset=args.offset,
            )
        )
    elif args.cmd == "sql":
        emit_rows(eng.execute_raw(args.query))
    return 0


if __name__ == "__main__":
    sys.exit(main())
