"""SQL entry point: route the reference's SQL surface to engine calls.

A reference user drives the lakehouse almost entirely through Spark SQL
(ref: paimon-spark/.../SparkCatalog.java:307 loadTable + the command set
 UpdatePaimonTableCommand.scala:37, DeletePaimonTableCommand,
 MergeIntoPaimonTable.scala:47, PaimonDynamicPartitionOverwriteCommand,
 procedure/* via CALL sys.*). Without a JVM catalog plugin those
statements never reach a Python engine, so `Catalog.sql()` provides the
same surface: DML statements are parsed here (a small, conservative
grammar covering the reference's documented shapes) and dispatched to the
Table API; everything else (SELECT/WITH/EXPLAIN/VALUES…) passes through
`spark.sql` over the registered views.

Supported statements:
  INSERT INTO t [(cols)] SELECT …|VALUES …
  INSERT OVERWRITE t [PARTITION (k=v,…)] SELECT …|VALUES …
  UPDATE t SET c = expr[, …] [WHERE cond]
  DELETE FROM t [WHERE cond]
  MERGE INTO t [AS a] USING src [AS b] ON a.k = b.k [AND …]
    [WHEN MATCHED THEN UPDATE SET *|c = expr[, …]]
    [WHEN MATCHED THEN DELETE]
    [WHEN NOT MATCHED THEN INSERT *]
  TRUNCATE TABLE t
  CALL sys.proc(name => value, …)
  SHOW TABLES / SHOW PARTITIONS t
  SELECT … (passthrough; `t$snapshots`-style system views as t__snapshots)
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, functions as F

from paimon_spark.predicates import P

if TYPE_CHECKING:
    from paimon_spark.catalog import Catalog

_IDENT = r"[A-Za-z_][A-Za-z0-9_.$]*"


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on top-level separators (outside parens/quotes)."""
    out, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


class SQLRouter:
    def __init__(self, catalog: "Catalog"):
        self.catalog = catalog
        self.spark = catalog.spark

    # ---------------- public ----------------

    def sql(self, statement: str) -> DataFrame | None:
        s = statement.strip().rstrip(";").strip()
        head = s.split(None, 1)[0].upper() if s else ""
        if head == "INSERT":
            return self._insert(s)
        if head == "UPDATE":
            return self._update(s)
        if head == "DELETE":
            return self._delete(s)
        if head == "MERGE":
            return self._merge(s)
        if head == "TRUNCATE":
            return self._truncate(s)
        if head == "COPY":
            return self._copy(s)
        if head == "ALTER":
            return self._alter(s)
        m = re.match(
            r"CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?"
            rf"({_IDENT})\s*(?:FRESHNESS\s*=\s*(\d+)\s*)?AS\s+(.*)$",
            s, re.IGNORECASE | re.DOTALL)
        if m:
            if_nx, name, fresh, q = m.groups()
            if self.catalog.table_exists(name.strip("`")):
                if if_nx:
                    return None
                raise FileExistsError(f"table {name} exists")
            self.catalog.create_materialized_view(
                name.strip("`"), q.strip(),
                freshness_s=int(fresh) if fresh else None)
            return None
        m = re.match(rf"REFRESH\s+MATERIALIZED\s+VIEW\s+({_IDENT})$",
                     s, re.IGNORECASE)
        if m:
            self.catalog.refresh_materialized_view(m.group(1).strip("`"))
            return None
        m = re.match(rf"DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?"
                     rf"({_IDENT})$", s, re.IGNORECASE)
        if m:
            name = m.group(2).strip("`")
            if not self.catalog.table_exists(name):
                if m.group(1):
                    return None
                raise FileNotFoundError(f"no materialized view {name}")
            self.catalog.drop_table(name)
            return None
        if re.match(r"SHOW\s+MATERIALIZED\s+VIEWS$", s, re.IGNORECASE):
            rows = []
            for n in self.catalog.list_tables():
                try:
                    o = self.catalog.get_table(n).schema.options
                except Exception:
                    continue
                q = o.get("materialized-view.definition") \
                    or o.get("imv.spec")
                if q:
                    rows.append((n, "incremental" if "imv.spec" in o
                                 else "full", q))
            return self.spark.createDataFrame(
                rows or [("", "", "")],
                "name string, refresh_mode string, definition string") \
                .filter(F.col("name") != "")
        if head == "CREATE" and re.match(r"CREATE\s+TABLE", s,
                                         re.IGNORECASE):
            return self._create_table(s)
        if head == "DROP" and re.match(r"DROP\s+TABLE", s, re.IGNORECASE):
            return self._drop_table(s)
        m = re.match(r"CREATE\s+DATABASE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)$",
                     s, re.IGNORECASE)
        if m:
            self.catalog.create_database(m.group(2))
            return None
        m = re.match(r"DROP\s+DATABASE\s+(\w+)(\s+CASCADE)?$", s,
                     re.IGNORECASE)
        if m:
            self.catalog.drop_database(m.group(1),
                                       cascade=bool(m.group(2)))
            return None
        if re.match(r"SHOW\s+DATABASES$", s, re.IGNORECASE):
            rows = [(d,) for d in self.catalog.list_databases()]
            return self.spark.createDataFrame(rows or [("",)],
                                              "namespace string") \
                .filter(F.col("namespace") != "")
        m = re.match(rf"MSCK\s+REPAIR\s+TABLE\s+({_IDENT})"
                     r"(?:\s+(?:ADD|DROP|SYNC)\s+PARTITIONS)?$",
                     s, re.IGNORECASE)
        if m:
            # ref: CatalogManagedPartitionMsckRepairTest — syncs partition
            # metadata into the metastore; on a filesystem catalog
            # partitions derive from manifests, so repair = hint/dir
            # consistency (RepairProcedure analog)
            from paimon_spark.procedures import call as _pcall
            _pcall(self.spark, "repair",
                   table=self._table(m.group(1)).path)
            return None
        m = re.match(rf"SHOW\s+COLUMNS\s+(?:FROM|IN)\s+({_IDENT})$",
                     s, re.IGNORECASE)
        if m:
            t = self._table(m.group(1))
            return self.spark.createDataFrame(
                [(f,) for f in t.schema.field_names],
                "col_name string")
        m = re.match(rf"REFRESH\s+TABLE\s+({_IDENT})$", s, re.IGNORECASE)
        if m:
            # plans are rebuilt from the latest snapshot on every
            # register; re-register eagerly so a cached temp view over an
            # old snapshot is replaced now
            self.catalog.register_views(
                system_tables=True, only={m.group(1).strip("`")})
            return None
        if head == "CALL":
            return self._call(s)
        if head == "SHOW":
            return self._show(s)
        if head == "DESCRIBE" or head == "DESC":
            return self._describe(s)
        # SELECT / WITH / EXPLAIN / VALUES …: plain Spark SQL over views.
        # Register only the tables the statement references (word-token
        # heuristic incl. `t$sys` and t__sys spellings) — a catalog with
        # many tables must not pay plan construction for all of them on
        # every query. No match → register everything (safe fallback).
        refs = {w.split("__", 1)[0].split("$", 1)[0]
                for w in re.findall(r"[A-Za-z_][A-Za-z0-9_$]*", s)}
        known = set(self.catalog.list_tables())
        only = refs & known
        self.catalog.register_views(system_tables=True,
                                    only=only or None)
        self.catalog.register_sql_views()
        # the reference's system-table syntax `t$snapshots` (backticked in
        # Spark) maps to our registered t__snapshots views
        s = re.sub(r"`(\w+)\$(\w+)`", r"\1__\2", s)
        s = self._rewrite_time_travel(s)
        s = self._rewrite_incremental_tvfs(s)
        s = self._rewrite_search_tvfs(s)
        return self.spark.sql(s)

    def _rewrite_search_tvfs(self, s: str) -> str:
        """Search table-valued functions over the reference's search
        tables (ref: FullTextSearchTable / VectorSearchTable /
        HybridSearchTable in table/):
          paimon_full_text_search('t', 'query words'[, k])
          paimon_vector_search('t', '0.1,0.2,…'[, k])
          paimon_hybrid_search('t', 'query words', '0.1,0.2,…'[, k])
        Rewritten to temp views over the Table API operators."""
        def _vec(arg: str) -> list[float]:
            return [float(x) for x in re.findall(
                r"-?\d+(?:\.\d+)?(?:[eE]-?\d+)?", arg)]

        def repl(m: "re.Match[str]") -> str:
            fn, args_s = m.group(1).lower(), m.group(2)
            args = _split_top(args_s)
            name = args[0].strip().strip("'\"")
            t = self._table(name)
            if fn == "paimon_full_text_search":
                q = args[1].strip().strip("'\"")
                k = int(args[2]) if len(args) > 2 else 10
                df = t.full_text_search(q, k)
                view = f"{name}__fts_{abs(hash((q, k))) % 10**8}"
            elif fn == "paimon_vector_search":
                # optional search options (ref: VectorSearchOptionsTest —
                # index selection knobs on the search table):
                #   paimon_vector_search('t','v,…'[, k[, method[, nprobe]]])
                vec = _vec(args[1])
                k = int(args[2]) if len(args) > 2 else 10
                method = (args[3].strip().strip("'\"").lower()
                          if len(args) > 3 else "brute")
                nprobe = int(args[4]) if len(args) > 4 else None
                df = t.vector_search(vec, k, method=method, nprobe=nprobe)
                view = (f"{name}__vs_"
                        f"{abs(hash((tuple(vec), k, method, nprobe))) % 10**8}")
            else:
                q = args[1].strip().strip("'\"")
                vec = _vec(args[2])
                k = int(args[3]) if len(args) > 3 else 10
                df = t.hybrid_search(q, vec, k)
                view = f"{name}__hs_{abs(hash((q, tuple(vec), k))) % 10**8}"
            view = re.sub(r"[^A-Za-z0-9_]", "_", view)
            df.createOrReplaceTempView(view)
            return view
        return re.sub(
            r"(paimon_full_text_search|paimon_vector_search|"
            r"paimon_hybrid_search)"
            r"\s*\(([^)]*)\)",
            repl, s, flags=re.IGNORECASE | re.DOTALL)

    def _rewrite_incremental_tvfs(self, s: str) -> str:
        """The reference's incremental table-valued functions
        (ref: PaimonTableValuedFunctions.scala:56-67):
          paimon_incremental_query('t', from_snapshot, to_snapshot)
          paimon_incremental_between_timestamp('t', ms1, ms2)
          paimon_incremental_to_auto_tag('t', 'tag')
        Rewritten to temp views over the Table API equivalents."""
        def repl(m: "re.Match[str]") -> str:
            fn, args_s = m.group(1).lower(), m.group(2)
            args = [a.strip().strip("'\"") for a in _split_top(args_s)]
            t = self._table(args[0])
            safe = args[0].replace(".", "_")
            if fn == "paimon_incremental_query":
                df = t.read_incremental(
                    int(args[1]) if args[1].isdigit() else args[1],
                    int(args[2]) if args[2].isdigit() else args[2])
                view = f"{safe}__inc_{args[1]}_{args[2]}"
            elif fn == "paimon_incremental_between_timestamp":
                df = t.read_incremental_between_timestamps(
                    int(args[1]), int(args[2]))
                view = f"{safe}__incts_{args[1]}_{args[2]}"
            else:
                df = t.read_incremental_to_auto_tag(args[1])
                view = f"{safe}__inctag_{args[1]}"
            view = re.sub(r"[^A-Za-z0-9_]", "_", view)
            df.createOrReplaceTempView(view)
            return view
        return re.sub(
            r"(paimon_incremental_query|"
            r"paimon_incremental_between_timestamp|"
            r"paimon_incremental_to_auto_tag)\s*\(([^)]*)\)",
            repl, s, flags=re.IGNORECASE)

    def _rewrite_time_travel(self, s: str) -> str:
        """`FROM t VERSION AS OF n` / `FROM t TIMESTAMP AS OF 'ts'` →
        registered snapshot views (Spark's own time-travel clause only
        works on V2 catalog tables, not temp views; ref: paimon docs
        spark query — SELECT … VERSION AS OF)."""
        def repl(m: "re.Match[str]") -> str:
            name, kind, lit = m.group(1), m.group(2).upper(), m.group(3)
            try:
                t = self._table(name)
            except Exception:
                return m.group(0)          # not our table — leave as-is
            lit = lit.strip().strip("'\"")
            if kind == "VERSION":
                df = t.read(snapshot_id=int(lit))
                view = f"{name}__v{lit}"
            else:
                import datetime as _dt
                ms = int(lit) if lit.isdigit() else int(
                    _dt.datetime.fromisoformat(lit).timestamp() * 1000)
                df = t.read(as_of_timestamp_ms=ms)
                view = f"{name}__ts{ms}"
            df.createOrReplaceTempView(view)
            return view
        return re.sub(
            rf"({_IDENT})\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+"
            rf"('[^']*'|\S+)",
            repl, s, flags=re.IGNORECASE)

    def _describe(self, s: str):
        m = re.match(rf"DESC(?:RIBE)?\s+(?:TABLE\s+)?({_IDENT})$", s,
                     re.IGNORECASE)
        if not m:
            self.catalog.register_views(system_tables=True)
            return self.spark.sql(s)
        t = self._table(m.group(1))
        rows = []
        for f in t.schema.struct.fields:
            note = []
            if f.name in t.schema.primary_keys:
                note.append("primary key")
            if f.name in t.schema.partition_keys:
                note.append("partition")
            rows.append((f.name, f.dataType.simpleString(),
                         ", ".join(note)))
        return self.spark.createDataFrame(
            rows, "col_name string, data_type string, comment string")

    # ---------------- helpers ----------------

    def _table(self, name: str):
        return self.catalog.get_table(name.strip("`"))

    def _source_df(self, src_sql: str, table, cols: list[str] | None
                  ) -> DataFrame:
        """SELECT …/VALUES … → DataFrame shaped like the table schema."""
        self.catalog.register_views()
        src_sql = src_sql.strip()
        if src_sql.upper().startswith("VALUES"):
            names = cols or table.schema.field_names
            src_sql = (f"SELECT * FROM ({src_sql}) AS "
                       f"__v({', '.join(names)})")
        df = self.spark.sql(src_sql)
        if cols:
            df = df.toDF(*cols)
            for f in table.schema.struct.fields:
                if f.name not in cols:
                    df = df.withColumn(f.name,
                                       F.lit(None).cast(f.dataType))
        else:
            df = df.toDF(*table.schema.field_names)
        return df.select(*table.schema.field_names)

    # ---------------- statements ----------------

    def _insert(self, s: str):
        m = re.match(
            rf"INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?({_IDENT})\s*"
            rf"(\(([^)]*)\))?\s*(?:PARTITION\s*\(([^)]*)\)\s*)?(.+)$",
            s, re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"cannot parse INSERT: {s[:120]}")
        kind, name, _g, cols_s, part_s, rest = m.groups()
        t = self._table(name)
        cols = [c.strip().strip("`") for c in cols_s.split(",")] \
            if cols_s else None
        spec: dict[str, str] = {}
        if part_s:
            # static partition values: PARTITION (dt='2024-01-01')
            for kv in _split_top(part_s):
                k, _, v = kv.partition("=")
                spec[k.strip()] = v.strip()
            if cols is None:
                # source supplies every column except the static keys
                cols = [f for f in t.schema.field_names if f not in spec]
        df = self._source_df(rest, t, cols)
        for k, v in spec.items():
            df = df.withColumn(k, F.expr(v).cast(t.schema.data_type(k)))
        df = df.select(*t.schema.field_names)
        spec = {k: v.strip("'\"") for k, v in spec.items()}
        if kind.upper() == "OVERWRITE":
            # PARTITION (k=v,…) → replace exactly the matched partitions
            # (never the whole table); no spec → Paimon's default
            # dynamic-partition-overwrite (replace touched partitions only)
            t.writer().overwrite(df, dynamic=not spec,
                                 static_partition=spec or None)
        else:
            t.append(df)
        return None

    def _update(self, s: str):
        m = re.match(
            rf"UPDATE\s+({_IDENT})\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$",
            s, re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"cannot parse UPDATE: {s[:120]}")
        name, set_s, where = m.groups()
        t = self._table(name)
        assigns: dict[str, Any] = {}
        for a in _split_top(set_s):
            c, _, e = a.partition("=")
            assigns[c.strip().strip("`")] = F.expr(e.strip())
        pred = P.expr(where) if where else None
        t.update_where(pred, assigns)
        return None

    def _delete(self, s: str):
        m = re.match(
            rf"DELETE\s+FROM\s+({_IDENT})(?:\s+WHERE\s+(.*))?$",
            s, re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"cannot parse DELETE: {s[:120]}")
        name, where = m.groups()
        t = self._table(name)
        if where:
            t.delete_where(P.expr(where))
        else:
            t.truncate()
        return None

    def _truncate(self, s: str):
        m = re.match(rf"TRUNCATE\s+TABLE\s+({_IDENT})"
                     r"(?:\s+PARTITION\s*\(([^)]*)\))?$",
                     s, re.IGNORECASE)
        if not m:
            raise ValueError(f"cannot parse TRUNCATE: {s[:120]}")
        t = self._table(m.group(1))
        if m.group(2):
            # ref: PaimonPartitionManagement.truncatePartition — same
            # file-level truncate commit as DROP PARTITION
            t.delete_where(self._partition_spec_pred(t, m.group(2)))
        else:
            t.truncate()
        return None

    @staticmethod
    def _partition_spec_pred(t, body: str):
        """`dt='2024-01-01', hh=0` → typed AND-of-eq Predicate over
        partition columns (typed leaves keep delete_where on the
        metadata-only file-drop path; partial specs allowed)."""
        leaves = []
        for kv in _split_top(body):
            k, _, v = kv.partition("=")
            k = k.strip().strip("`")
            if k not in t.schema.partition_keys:
                raise ValueError(f"{k} is not a partition column of "
                                 f"{t.schema.partition_keys}")
            v = v.strip()
            st = t.schema.data_type(k).simpleString()
            if v.upper() == "NULL":
                val = None
            elif v[:1] in "'\"":
                val = v.strip("'\"")
                if st == "date":
                    import datetime as _dt
                    val = _dt.date.fromisoformat(val)
            elif st in ("tinyint", "smallint", "int", "bigint"):
                val = int(v)
            elif st in ("float", "double") or st.startswith("decimal"):
                val = float(v)
            elif st == "date":
                import datetime as _dt
                val = _dt.date.fromisoformat(v)
            else:
                val = v
            leaves.append(P.is_null(k) if val is None else P.eq(k, val))
        return leaves[0] if len(leaves) == 1 else P.and_(*leaves)

    def _create_table(self, s: str):
        """CREATE TABLE through SQL, the reference's Spark syntax
        (ref: paimon docs spark DDL — primary keys and bucketing travel
        via TBLPROPERTIES):
          CREATE TABLE [IF NOT EXISTS] t (c1 T1, …)
            [PARTITIONED BY (p1, …)]
            [TBLPROPERTIES ('primary-key'='k1,k2', 'bucket'='4', …)]
          CREATE TABLE t [TBLPROPERTIES (…)] AS SELECT …   (CTAS)
        """
        from pyspark.sql.types import _parse_datatype_string

        lm = re.match(
            rf"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s+"
            rf"LIKE\s+({_IDENT})"
            rf"(?:\s+TBLPROPERTIES\s*\((.*?)\))?$",
            s, re.IGNORECASE | re.DOTALL)
        if lm:      # ref: PaimonSqlExtensions.g4 #createTableLike
            if_nx, name, src, props_s = lm.groups()
            name = name.strip("`")
            if self.catalog.table_exists(name):
                if if_nx:
                    return None
                raise FileExistsError(f"table {name} exists")
            st = self._table(src)
            options = dict(st.schema.options)
            if props_s:
                for item in _split_top(props_s):
                    k, _, v = item.partition("=")
                    options[k.strip().strip("'\"")] = \
                        v.strip().strip("'\"")
            self.catalog.create_table(
                name, st.schema.struct,
                partition_keys=list(st.schema.partition_keys) or None,
                primary_keys=list(st.schema.primary_keys) or None,
                options=options or None)
            return None
        m = re.match(
            rf"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s*"
            rf"(\((.*?)\))?\s*"
            rf"(?:PARTITIONED\s+BY\s*\(([^)]*)\)\s*)?"
            rf"(?:TBLPROPERTIES\s*\((.*?)\)\s*)?"
            rf"(?:AS\s+(SELECT\s+.*|VALUES\s+.*))?$",
            s, re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"cannot parse CREATE TABLE: {s[:120]}")
        if_nx, name, _g, cols_s, part_s, props_s, as_s = m.groups()
        name = name.strip("`")
        if self.catalog.table_exists(name):
            if if_nx:
                return None
            raise FileExistsError(f"table {name} exists")
        options: dict[str, str] = {}
        if props_s:
            for item in _split_top(props_s):
                k, _, v = item.partition("=")
                options[k.strip().strip("'\"")] = v.strip().strip("'\"")
        if options.get("type") == "object-table":
            # CREATE TABLE t TBLPROPERTIES ('type'='object-table',
            # 'object-location'='/path') — ref: object table DDL
            options.pop("type")
            loc = options.pop("object-location", None)
            if not loc:
                raise ValueError("object-table needs 'object-location'")
            self.catalog.create_object_table(name, loc, options or None)
            return None
        primary_keys = [k.strip() for k in
                        options.pop("primary-key", "").split(",")
                        if k.strip()] or None
        partition_keys = [p.strip().strip("`")
                          for p in (part_s or "").split(",")
                          if p.strip()] or None
        if as_s:                                           # CTAS
            self.catalog.register_views()
            df = self.spark.sql(as_s)
            t = self.catalog.create_table(
                name, df.schema, partition_keys=partition_keys,
                primary_keys=primary_keys, options=options or None)
            t.append(df)
            return None
        if not cols_s:
            raise ValueError("CREATE TABLE needs a column list or AS "
                             "SELECT")
        fields = []
        for coldef in _split_top(cols_s):
            cn, _, ct = coldef.strip().partition(" ")
            fields.append((cn.strip("`"), _parse_datatype_string(ct)))
        from pyspark.sql import types as ST
        struct = ST.StructType(
            [ST.StructField(n, dt) for n, dt in fields])
        self.catalog.create_table(name, struct,
                                  partition_keys=partition_keys,
                                  primary_keys=primary_keys,
                                  options=options or None)
        return None

    def _drop_table(self, s: str):
        m = re.match(rf"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?({_IDENT})$",
                     s, re.IGNORECASE)
        if not m:
            raise ValueError(f"cannot parse DROP TABLE: {s[:120]}")
        if_ex, name = m.groups()
        name = name.strip("`")
        if not self.catalog.table_exists(name):
            if if_ex:
                return None
            raise FileNotFoundError(f"no table {name}")
        self.catalog.drop_table(name)
        return None

    def _alter(self, s: str):
        """ALTER TABLE: schema evolution + properties through SQL
        (ref: SparkCatalog.java alterTable → SchemaChange.java
        addColumn/renameColumn/dropColumn/updateColumnType/
        setOption/removeOption). Shapes:
          ALTER TABLE t ADD COLUMN c TYPE | ADD COLUMNS (c1 T1, c2 T2)
          ALTER TABLE t RENAME COLUMN a TO b
          ALTER TABLE t DROP COLUMN c [, c2 …] | DROP COLUMNS (…)
          ALTER TABLE t ALTER COLUMN c TYPE newtype
          ALTER TABLE t SET TBLPROPERTIES ('k'='v', …)
          ALTER TABLE t UNSET TBLPROPERTIES ('k', …)
          ALTER TABLE t RENAME TO t2
        """
        from pyspark.sql.types import _parse_datatype_string

        m = re.match(rf"ALTER\s+TABLE\s+({_IDENT})\s+(.*)$", s,
                     re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"cannot parse ALTER TABLE: {s[:120]}")
        name, rest = m.group(1), m.group(2).strip()
        t = self._table(name)

        rm = re.match(rf"RENAME\s+TO\s+({_IDENT})$", rest, re.IGNORECASE)
        if rm:
            self.catalog.rename_table(name.strip("`"),
                                      rm.group(1).strip("`"))
            return None
        # partition management (ref: PaimonPartitionManagement.scala —
        # dropPartitions = a truncate-partitions commit, file-level drop,
        # no rewrite; createPartitions is metastore-only and a no-op on a
        # filesystem catalog). Batch form: DROP PARTITION (spec)[,
        # [PARTITION] (spec)]…, partial specs allowed.
        pm = re.match(r"(DROP|ADD)\s+(?:IF\s+(?:NOT\s+)?EXISTS\s+)?"
                      r"PARTITION\s*(.+)$", rest,
                      re.IGNORECASE | re.DOTALL)
        if pm:
            if pm.group(1).upper() == "ADD":
                return None
            specs = [self._partition_spec_pred(t, body)
                     for body in re.findall(r"\(([^)]*)\)", pm.group(2))]
            if not specs:
                raise ValueError(f"no partition spec in: {rest[:120]}")
            t.delete_where(specs[0] if len(specs) == 1
                           else P.or_(*specs))
            return None
        # tag management clauses (ref: PaimonSqlExtensions.g4
        # createOrReplaceTag / deleteTag / renameTag)
        tm = re.match(
            r"CREATE\s+(OR\s+REPLACE\s+)?TAG\s+(IF\s+NOT\s+EXISTS\s+)?"
            rf"(`?)({_IDENT})\3"
            r"(?:\s+AS\s+OF\s+VERSION\s+(\d+))?"
            r"(?:\s+RETAIN\s+(\d+)\s+(DAYS?|HOURS?|MINUTES?))?$",
            rest, re.IGNORECASE)
        if tm:
            replace, if_nx, _q, tag, ver, ret_n, ret_u = tm.groups()
            existing = t.paths.list_tags()
            if tag in existing:
                if if_nx:
                    return None
                if not replace:
                    raise FileExistsError(f"tag {tag} exists")
                t.delete_tag(tag)
            retain_ms = None
            if ret_n:
                unit_ms = {"D": 86_400_000, "H": 3_600_000,
                           "M": 60_000}[ret_u[0].upper()]
                retain_ms = int(ret_n) * unit_ms
            t.create_tag(tag, int(ver) if ver else None,
                         time_retained_ms=retain_ms)
            return None
        tm = re.match(
            rf"DELETE\s+TAG\s+(IF\s+EXISTS\s+)?(`?)({_IDENT})\2$",
            rest, re.IGNORECASE)
        if tm:
            if_ex, _q, tag = tm.groups()
            if tag not in t.paths.list_tags():
                if if_ex:
                    return None
                raise FileNotFoundError(f"no tag {tag}")
            t.delete_tag(tag)
            return None
        tm = re.match(
            rf"RENAME\s+TAG\s+(`?)({_IDENT})\1\s+TO\s+(`?)({_IDENT})\3$",
            rest, re.IGNORECASE)
        if tm:
            from paimon_spark.procedures import call
            call(self.spark, "rename_tag", table=t,
                 tag=tm.group(2), target_tag=tm.group(4))
            return None
        am = re.match(r"ADD\s+COLUMNS?\s*(.*)$", rest,
                      re.IGNORECASE | re.DOTALL)
        if am:
            body = am.group(1).strip()
            if body.startswith("("):
                body = body[1:-1]
            for coldef in _split_top(body):
                cn, _, ct = coldef.strip().partition(" ")
                t.alter(lambda sc, cn=cn.strip("`"), ct=ct: sc.add_column(
                    cn, _parse_datatype_string(ct)))
            return None
        rm = re.match(rf"RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)$", rest,
                      re.IGNORECASE)
        if rm:
            t.alter(lambda sc: sc.rename_column(rm.group(1), rm.group(2)))
            return None
        dm = re.match(r"DROP\s+COLUMNS?\s*(.*)$", rest,
                      re.IGNORECASE | re.DOTALL)
        if dm:
            body = dm.group(1).strip()
            if body.startswith("("):
                body = body[1:-1]
            for c in _split_top(body):
                t.alter(lambda sc, c=c.strip().strip("`"):
                        sc.drop_column(c))
            return None
        cm = re.match(r"ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(.+)$", rest,
                      re.IGNORECASE)
        if cm:
            t.alter(lambda sc: sc.update_column_type(
                cm.group(1), _parse_datatype_string(cm.group(2))))
            return None
        pm = re.match(r"(UN)?SET\s+TBLPROPERTIES\s*\((.*)\)$", rest,
                      re.IGNORECASE | re.DOTALL)
        if pm:
            unset, body = pm.groups()
            for item in _split_top(body):
                if unset:
                    t.alter(lambda sc, k=item.strip().strip("'\""):
                            sc.remove_option(k))
                else:
                    k, _, v = item.partition("=")
                    t.alter(lambda sc, k=k.strip().strip("'\""),
                            v=v.strip().strip("'\""): sc.set_option(k, v))
            return None
        raise ValueError(f"unsupported ALTER TABLE action: {rest[:80]}")

    def _merge(self, s: str):
        m = re.match(
            rf"MERGE\s+INTO\s+({_IDENT})(?:\s+AS\s+(\w+)|\s+(\w+))?\s+"
            rf"USING\s+({_IDENT}|\(.*?\))(?:\s+AS\s+(\w+)|\s+(\w+))?\s+"
            rf"ON\s+(.*?)\s+(WHEN\s+.*)$",
            s, re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"cannot parse MERGE: {s[:120]}")
        tname, ta1, ta2, src, sa1, sa2, on_s, when_s = m.groups()
        talias = ta1 or ta2 or tname
        salias = sa1 or sa2 or src
        t = self._table(tname)
        self.catalog.register_views()
        src_df = (self.spark.sql(src[1:-1]) if src.startswith("(")
                  else self.spark.table(src))

        # equality join keys from "a.k = b.k AND …"
        on = []
        for c in re.split(r"\s+AND\s+", on_s, flags=re.IGNORECASE):
            em = re.match(r"\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", c)
            if not em:
                raise ValueError(f"MERGE ON supports t.k = s.k only: {c}")
            q1, c1, q2, c2 = em.groups()
            if {q1, q2} != {talias, salias}:
                raise ValueError(f"MERGE ON qualifiers must be the two "
                                 f"aliases ({talias}, {salias}): {c}")
            if c1 != c2:
                raise ValueError("MERGE ON needs same-named key columns")
            on.append(c1)

        matched, not_matched, nmbs = self._merge_when_clauses(
            when_s, talias, salias)
        t.merge_into(src_df, on=on, matched=matched,
                     not_matched=not_matched, not_matched_by_source=nmbs)
        return None

    def _merge_when_clauses(self, when_s: str, talias: str, salias: str):
        """Parse the WHEN section of a MERGE into ordered MergeClause
        lists. Every clause must match a supported shape — anything else
        raises (a silently-dropped clause would change merge semantics).
        Supported (ref: MergeIntoPaimonTable.scala:47):
          WHEN MATCHED [AND cond] THEN UPDATE SET * | c = e, …
          WHEN MATCHED [AND cond] THEN DELETE
          WHEN NOT MATCHED [BY TARGET] [AND cond] THEN
              INSERT * | INSERT (cols) VALUES (exprs)
          WHEN NOT MATCHED BY SOURCE [AND cond] THEN
              UPDATE SET … | DELETE
        """
        from paimon_spark.table import MergeClause

        def _rw(e: str) -> str:
            e = re.sub(rf"\b{re.escape(salias)}\.", "s.", e)
            return re.sub(rf"\b{re.escape(talias)}\.", "t.", e)

        # split on top-level WHEN keywords (outside parens/quotes)
        pieces, depth, quote, buf, i = [], 0, None, [], 0
        up = when_s.upper()
        while i < len(when_s):
            ch = when_s[i]
            if quote:
                buf.append(ch)
                if ch == quote:
                    quote = None
            elif ch in "'\"":
                quote = ch
                buf.append(ch)
            elif ch == "(":
                depth += 1
                buf.append(ch)
            elif ch == ")":
                depth -= 1
                buf.append(ch)
            elif (depth == 0 and up[i:i + 5] == "WHEN "
                  and (i == 0 or not when_s[i - 1].isalnum())):
                if buf and "".join(buf).strip():
                    pieces.append("".join(buf).strip())
                buf = []
                i += 5
                continue
            else:
                buf.append(ch)
            i += 1
        if buf and "".join(buf).strip():
            pieces.append("".join(buf).strip())

        matched: list = []
        not_matched: list = []
        nmbs: list = []
        for p in pieces:
            m = re.match(
                r"(?:(NOT\s+MATCHED\s+BY\s+SOURCE)|"
                r"(NOT\s+MATCHED(?:\s+BY\s+TARGET)?)|(MATCHED))"
                r"(?:\s+AND\s+(.*?))?\s+THEN\s+(.*)$",
                p, re.IGNORECASE | re.DOTALL)
            if not m:
                raise ValueError(f"cannot parse MERGE WHEN clause: WHEN {p}")
            is_nmbs, is_nm, _is_m, cond_s, action = m.groups()
            cond = _rw(cond_s.strip()) if cond_s else None
            a = action.strip()
            if is_nm:
                im = re.match(r"INSERT\s*\*$", a, re.IGNORECASE)
                if im:
                    not_matched.append(MergeClause.insert("all", cond))
                    continue
                im = re.match(r"INSERT\s*\(([^)]*)\)\s*VALUES\s*\((.*)\)\s*$",
                              a, re.IGNORECASE | re.DOTALL)
                if not im:
                    raise ValueError(
                        f"NOT MATCHED supports INSERT * or INSERT (cols) "
                        f"VALUES (exprs): {a}")
                cols = [c.strip().strip("`") for c in im.group(1).split(",")]
                vals = _split_top(im.group(2))
                if len(cols) != len(vals):
                    raise ValueError(f"INSERT arity mismatch: {a}")
                asg = {c.split(".", 1)[-1]: F.expr(_rw(v))
                       for c, v in zip(cols, vals)}
                not_matched.append(MergeClause.insert(asg, cond))
                continue
            # MATCHED / NOT MATCHED BY SOURCE → UPDATE or DELETE
            bucket = nmbs if is_nmbs else matched
            if re.match(r"DELETE$", a, re.IGNORECASE):
                bucket.append(MergeClause.delete(cond))
                continue
            um = re.match(r"UPDATE\s+SET\s+(.*)$", a,
                          re.IGNORECASE | re.DOTALL)
            if not um:
                raise ValueError(f"cannot parse MERGE action: {a}")
            body = um.group(1).strip()
            if body == "*":
                bucket.append(MergeClause.update("all", cond))
                continue
            asg = {}
            for s_asg in _split_top(body):
                c, _, e = s_asg.partition("=")
                col = c.strip().strip("`")
                col = col.split(".", 1)[1] if "." in col else col
                asg[col] = F.expr(_rw(e.strip()))
            bucket.append(MergeClause.update(asg, cond))
        return matched, not_matched, nmbs

    def _call(self, s: str):
        m = re.match(r"CALL\s+(?:sys\.)?(\w+)\s*\((.*)\)\s*$",
                     s, re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"cannot parse CALL: {s[:120]}")
        proc, args_s = m.groups()
        from paimon_spark.procedures import call
        kwargs: dict[str, Any] = {}
        for a in _split_top(args_s):
            km = re.match(r"(\w+)\s*=>\s*(.*)$", a, re.DOTALL)
            if not km:
                raise ValueError(f"CALL args must be name => value: {a}")
            k, v = km.group(1), km.group(2).strip()
            if re.fullmatch(r"-?\d+", v):
                kwargs[k] = int(v)
            elif re.fullmatch(r"-?\d+\.\d+", v):
                kwargs[k] = float(v)
            elif v.upper() in ("TRUE", "FALSE"):
                kwargs[k] = v.upper() == "TRUE"
            else:
                kwargs[k] = v.strip("'\"")
        if proc.lower() == "init_file_based_privilege":
            # catalog-scoped procedure (ref: InitFileBasedPrivilegeProcedure)
            self.catalog.init_privileges(str(kwargs.get("root_password",
                                                        kwargs.get("root-password", ""))))
            return None
        if "table" in kwargs:
            kwargs["table"] = self._table(str(kwargs["table"]))
        out = call(self.spark, proc.lower(), **kwargs)
        if isinstance(out, DataFrame):
            return out
        return None

    @staticmethod
    def _file_format_clause(clause: str) -> tuple[str, dict]:
        """FILE_FORMAT = (TYPE = PARQUET, k = v, ...) → (format, options)
        (ref: PaimonSqlExtensions.g4 fileFormatClause)."""
        fmt, opts = "parquet", {}
        for item in _split_top(clause):
            k, _, v = item.partition("=")
            k = k.strip().strip("'\"").lower()
            v = v.strip().strip("'\"")
            if k == "type":
                fmt = v.lower()
            else:
                opts[k] = v
        return fmt, opts

    def _copy(self, s: str):
        """COPY INTO statements (ref: PaimonSqlExtensions.g4
        #copyIntoTable / #copyIntoLocation / #copyIntoLocationFromQuery):
          COPY INTO t [(c1, c2)] FROM '<path>'
            FILE_FORMAT = (TYPE = PARQUET[, opt = v]...)
            [PATTERN = '<regex>'] [FORCE = true]
            [ON_ERROR = ABORT_STATEMENT|CONTINUE|SKIP_FILE]
          COPY INTO '<path>' FROM t FILE_FORMAT = (...) [OVERWRITE = true]
          COPY INTO '<path>' FROM (SELECT ...) FILE_FORMAT = (...)
            [OVERWRITE = true]"""
        m = re.match(
            rf"COPY\s+INTO\s+({_IDENT})\s*(?:\(([^)]*)\)\s*)?"
            r"FROM\s+'([^']+)'\s+"
            r"FILE_FORMAT\s*=\s*\(([^)]*)\)"
            r"(?:\s+PATTERN\s*=\s*'([^']*)')?"
            r"(?:\s+FORCE\s*=\s*(TRUE|FALSE))?"
            r"(?:\s+ON_ERROR\s*=\s*(ABORT_STATEMENT|CONTINUE|SKIP_FILE))?"
            r"$", s, re.IGNORECASE)
        if m:
            name, cols_s, src, ff, pat, force, onerr = m.groups()
            fmt, opts = self._file_format_clause(ff)
            cols = [c.strip().strip("`") for c in cols_s.split(",")
                    if c.strip()] if cols_s else None
            n = self._table(name).copy_into(
                src, fmt, opts or None, pattern=pat,
                force=bool(force) and force.upper() == "TRUE",
                on_error=(onerr or "abort_statement").lower(),
                columns=cols)
            return self.spark.createDataFrame([(n,)], "rows_loaded bigint")
        m = re.match(
            r"COPY\s+INTO\s+'([^']+)'\s+FROM\s+"
            rf"(\(.*\)|{_IDENT})\s+"
            r"FILE_FORMAT\s*=\s*\(([^)]*)\)"
            r"(?:\s+OVERWRITE\s*=\s*(TRUE|FALSE))?$",
            s, re.IGNORECASE | re.DOTALL)
        if m:
            target, src, ff, ow = m.groups()
            fmt, opts = self._file_format_clause(ff)
            if src.startswith("("):
                self.catalog.register_views()
                df = self.spark.sql(src[1:-1].strip())
            else:
                df = self._table(src).read()
            mode = "overwrite" if ow and ow.upper() == "TRUE" else \
                "errorifexists"
            w = df.write.format(fmt).mode(mode)
            for k, v in opts.items():
                w = w.option(k, v)
            w.save(target)
            return None
        raise ValueError(f"cannot parse COPY INTO: {s[:120]}")

    def _show(self, s: str):
        m = re.match(rf"SHOW\s+CREATE\s+TABLE\s+({_IDENT})$", s,
                     re.IGNORECASE)
        if m:
            t = self._table(m.group(1))
            sch = t.schema
            cols = ",\n  ".join(f"{f.name} {f.dataType.simpleString().upper()}"
                                for f in sch.struct.fields)
            ddl = f"CREATE TABLE {m.group(1)} (\n  {cols}\n)"
            if sch.partition_keys:
                ddl += f"\nPARTITIONED BY ({', '.join(sch.partition_keys)})"
            props = dict(sch.options)
            if sch.primary_keys:
                props = {"primary-key": ",".join(sch.primary_keys), **props}
            if props:
                kv = ", ".join(f"'{k}' = '{v}'" for k, v in props.items())
                ddl += f"\nTBLPROPERTIES ({kv})"
            return self.spark.createDataFrame([(ddl,)],
                                              "createtab_stmt string")
        m = re.match(rf"SHOW\s+PARTITIONS\s+({_IDENT})$", s, re.IGNORECASE)
        if m:
            return self._table(m.group(1)).partitions_df()
        m = re.match(rf"SHOW\s+TAGS\s+({_IDENT})$", s, re.IGNORECASE)
        if m:       # ref: PaimonSqlExtensions.g4 #showTags
            return self._table(m.group(1)).tags_df()
        if re.match(r"SHOW\s+TABLES$", s, re.IGNORECASE):
            rows = [(n,) for n in self.catalog.list_tables()]
            return self.spark.createDataFrame(rows or [("",)],
                                              "tableName string") \
                .filter(F.col("tableName") != "")
        self.catalog.register_views(system_tables=True)
        return self.spark.sql(s)
