"""Command-line interface — parity with the reference's `pypaimon` CLI
(ref: paimon-python/pypaimon/cli/cli.py + cli_table/cli_db/cli_catalog/
cli_tag/cli_branch/cli_sql subcommand sets).

Usage:
    python -m paimon_spark --warehouse WH <command> ...

Commands mirror the reference's: `catalog list-dbs`, `db create|drop|
list-tables`, `table create|drop|get|snapshot|read|import|
list-partitions|rename|full-text-search|alter ...`, `tag create|delete|
list`, `branch create|delete|list`, `sql "<statement>"`.

Each invocation builds a local SparkSession (Spark-first: reads/DML run
through the same engine paths as the library; there is no second
"CLI-only" reader). Use --cpus to size it; metadata-only commands
(get/snapshot/tag/branch/list-*) don't start Spark at all.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from paimon_spark.session import get_spark
    return get_spark("paimon-cli", cpus=args.cpus)


def _catalog(args, spark=None):
    from paimon_spark.catalog import Catalog
    return Catalog(args.warehouse, spark)


def _table(args, name, spark=None):
    t = _catalog(args, spark).get_table(name)
    return t.with_spark(spark) if spark is not None else t


def _emit(rows, as_json):
    if as_json:
        for r in rows:
            print(json.dumps(r, default=str))
    else:
        for r in rows:
            print("\t".join(str(v) for v in (
                r.values() if isinstance(r, dict) else r)))


def _print_df(df, limit, as_json):
    rows = df.limit(limit).collect() if limit else df.collect()
    _emit([r.asDict() for r in rows], as_json)


def _parse_where(t, where: str):
    """Simple `col OP literal [AND ...]` strings → structured predicates
    (which prune manifests/partitions at plan time); anything fancier
    falls back to an opaque P.expr (correct, no plan-time pruning)."""
    import re as _re

    from paimon_spark.predicates import P
    from paimon_spark.scanner import cast_partition_value
    ops = {"=": P.eq, "!=": P.ne, "<>": P.ne, "<": P.lt, "<=": P.le,
           ">": P.gt, ">=": P.ge}
    parts = []
    for conj in _re.split(r"\s+AND\s+", where, flags=_re.IGNORECASE):
        m = _re.match(r"^\s*(\w+)\s*(=|!=|<>|<=|>=|<|>)\s*"
                      r"('([^']*)'|\S+)\s*$", conj)
        if not m or m.group(1) not in t.schema.field_names:
            return P.expr(where)
        col, op, raw, quoted = m.groups()
        val = quoted if quoted is not None else cast_partition_value(
            raw, t.schema.data_type(col))
        parts.append(ops[op](col, val))
    return parts[0] if len(parts) == 1 else P.and_(*parts)


# ---------------- command implementations ----------------

def cmd_catalog(args):
    if args.sub == "list-dbs":
        _emit([{"database": d} for d in _catalog(args).list_databases()],
              args.json)


def cmd_db(args):
    cat = _catalog(args)
    if args.sub == "create":
        cat.create_database(args.name)
    elif args.sub == "drop":
        cat.drop_database(args.name, cascade=args.cascade)
    elif args.sub == "list-tables":
        _emit([{"table": t} for t in cat.list_tables(args.name)],
              args.json)


def cmd_table(args):
    if args.sub == "get":
        t = _table(args, args.name)
        print(json.dumps({
            "name": args.name,
            "fields": [{"name": f.name,
                        "type": f.dataType.simpleString()}
                       for f in t.schema.struct.fields],
            "partition_keys": t.schema.partition_keys,
            "primary_keys": t.schema.primary_keys,
            "options": t.schema.options,
        }, indent=2))
    elif args.sub == "snapshot":
        t = _table(args, args.name)
        snap = t.paths.latest_snapshot()
        if snap is None:
            print("null")
        else:
            print(snap.to_json())
    elif args.sub == "create":
        from pyspark.sql.types import _parse_datatype_string
        _spark(args)                      # DDL parsing needs a session
        struct = _parse_datatype_string(args.schema)
        opts = dict(kv.split("=", 1) for kv in (args.option or []))
        _catalog(args).create_table(
            args.name, struct,
            partition_keys=args.partition_keys.split(",")
            if args.partition_keys else None,
            primary_keys=args.primary_keys.split(",")
            if args.primary_keys else None,
            options=opts or None)
    elif args.sub == "drop":
        _catalog(args).drop_table(args.name)
    elif args.sub == "rename":
        _catalog(args).rename_table(args.name, args.new_name)
    elif args.sub == "list-partitions":
        t = _table(args, args.name, _spark(args))
        _print_df(t.partitions_df(), None, args.json)
    elif args.sub == "explain":
        t = _table(args, args.name)
        pred = _parse_where(t, args.where) if args.where else None
        print(t.new_scan().plan(pred).explain())
    elif args.sub == "read":
        spark = _spark(args)
        t = _table(args, args.name, spark)
        df = t.read()
        if args.where:
            df = df.filter(args.where)
        if args.columns:
            df = df.select(*args.columns.split(","))
        _print_df(df, args.limit, args.json)
    elif args.sub == "import":
        spark = _spark(args)
        t = _table(args, args.name, spark)
        fmt = args.format or ("json" if args.file.endswith(".json")
                              else "csv")
        reader = spark.read.format(fmt)
        if fmt == "csv":
            reader = reader.option("header", "true")
        from pyspark.sql import functions as F
        df = reader.load(args.file)
        cast = df.select(*[F.col(f.name).cast(f.dataType)
                           for f in t.schema.struct.fields
                           if f.name in df.columns])
        t.append(cast)
        print(f"imported {cast.count()} rows")
    elif args.sub == "full-text-search":
        spark = _spark(args)
        t = _table(args, args.name, spark)
        _print_df(t.full_text_search(args.query, k=args.k,
                                     text_col=args.text_col),
                  None, args.json)
    elif args.sub == "alter":
        t = _table(args, args.name)
        if args.alter_sub == "set-option":
            t.alter(lambda sc: sc.set_option(args.key, args.value))
        elif args.alter_sub == "remove-option":
            t.alter(lambda sc: sc.remove_option(args.key))
        elif args.alter_sub == "add-column":
            from pyspark.sql.types import _parse_datatype_string
            _spark(args)                  # type parsing needs a session
            t.alter(lambda sc: sc.add_column(
                args.column, _parse_datatype_string(args.type)))
        elif args.alter_sub == "drop-column":
            t.alter(lambda sc: sc.drop_column(args.column))
        elif args.alter_sub == "rename-column":
            t.alter(lambda sc: sc.rename_column(args.column,
                                                args.new_name))
        elif args.alter_sub == "alter-column":
            from pyspark.sql.types import _parse_datatype_string
            _spark(args)                  # type parsing needs a session
            t.alter(lambda sc: sc.update_column_type(
                args.column, _parse_datatype_string(args.type)))


def cmd_tag(args):
    t = _table(args, args.table)
    if args.sub == "create":
        t.create_tag(args.name, args.snapshot,
                     time_retained_ms=args.retain_ms)
    elif args.sub == "delete":
        t.delete_tag(args.name)
    elif args.sub == "list":
        _emit([{"tag": n, "snapshot_id": s}
               for n, s in sorted(t.paths.list_tags().items())],
              args.json)


def cmd_branch(args):
    t = _table(args, args.table)
    if args.sub == "create":
        t.create_branch(args.name, args.snapshot, args.tag)
    elif args.sub == "delete":
        t.delete_branch(args.name)
    elif args.sub == "list":
        _emit([{"branch": b} for b in sorted(t.paths.list_branches())],
              args.json)


def cmd_sql(args):
    spark = _spark(args)
    df = _catalog(args, spark).sql(args.statement)
    if df is not None:
        _print_df(df, args.limit, args.json)


# ---------------- parser ----------------

def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="paimon_spark",
        description="paimon_spark CLI (pypaimon-compatible command set)")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--cpus", type=int, default=4)
    p.add_argument("--json", action="store_true",
                   help="emit JSON lines instead of TSV")
    sub = p.add_subparsers(dest="command", required=True)

    cat = sub.add_parser("catalog").add_subparsers(dest="sub",
                                                   required=True)
    cat.add_parser("list-dbs")

    db = sub.add_parser("db").add_subparsers(dest="sub", required=True)
    d = db.add_parser("create"); d.add_argument("name")
    d = db.add_parser("drop"); d.add_argument("name")
    d.add_argument("--cascade", action="store_true")
    d = db.add_parser("list-tables")
    d.add_argument("name", nargs="?", default=None)

    tb = sub.add_parser("table").add_subparsers(dest="sub", required=True)
    d = tb.add_parser("get"); d.add_argument("name")
    d = tb.add_parser("snapshot"); d.add_argument("name")
    d = tb.add_parser("create"); d.add_argument("name")
    d.add_argument("--schema", required=True,
                   help="'k BIGINT, v STRING' DDL column list")
    d.add_argument("--partition-keys")
    d.add_argument("--primary-keys")
    d.add_argument("--option", action="append", metavar="K=V")
    d = tb.add_parser("drop"); d.add_argument("name")
    d = tb.add_parser("rename"); d.add_argument("name")
    d.add_argument("new_name")
    d = tb.add_parser("list-partitions"); d.add_argument("name")
    d = tb.add_parser("explain"); d.add_argument("name")
    d.add_argument("--where")
    d = tb.add_parser("read"); d.add_argument("name")
    d.add_argument("--where"); d.add_argument("--columns")
    d.add_argument("--limit", type=int, default=100)
    d = tb.add_parser("import"); d.add_argument("name")
    d.add_argument("file"); d.add_argument("--format")
    d = tb.add_parser("full-text-search"); d.add_argument("name")
    d.add_argument("--query", required=True)
    d.add_argument("-k", type=int, default=10)
    d.add_argument("--text-col", default="text")
    alt = tb.add_parser("alter")
    alt.add_argument("name")
    asub = alt.add_subparsers(dest="alter_sub", required=True)
    d = asub.add_parser("set-option"); d.add_argument("key")
    d.add_argument("value")
    d = asub.add_parser("remove-option"); d.add_argument("key")
    d = asub.add_parser("add-column"); d.add_argument("column")
    d.add_argument("type")
    d = asub.add_parser("drop-column"); d.add_argument("column")
    d = asub.add_parser("rename-column"); d.add_argument("column")
    d.add_argument("new_name")
    d = asub.add_parser("alter-column"); d.add_argument("column")
    d.add_argument("type")

    tg = sub.add_parser("tag").add_subparsers(dest="sub", required=True)
    d = tg.add_parser("create"); d.add_argument("table")
    d.add_argument("name"); d.add_argument("--snapshot", type=int)
    d.add_argument("--retain-ms", type=int)
    d = tg.add_parser("delete"); d.add_argument("table")
    d.add_argument("name")
    d = tg.add_parser("list"); d.add_argument("table")

    br = sub.add_parser("branch").add_subparsers(dest="sub",
                                                 required=True)
    d = br.add_parser("create"); d.add_argument("table")
    d.add_argument("name"); d.add_argument("--snapshot", type=int)
    d.add_argument("--tag")
    d = br.add_parser("delete"); d.add_argument("table")
    d.add_argument("name")
    d = br.add_parser("list"); d.add_argument("table")

    d = sub.add_parser("sql"); d.add_argument("statement")
    d.add_argument("--limit", type=int, default=100)
    return p


_DISPATCH = {"catalog": cmd_catalog, "db": cmd_db, "table": cmd_table,
             "tag": cmd_tag, "branch": cmd_branch, "sql": cmd_sql}


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    _DISPATCH[args.command](args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
