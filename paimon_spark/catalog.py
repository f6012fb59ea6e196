"""Warehouse catalog: databases = directories, tables = table directories.

≈ the reference's FileSystemCatalog
(ref: paimon-core/src/main/java/org/apache/paimon/catalog/FileSystemCatalog.java).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from paimon_spark.table import Table


class Catalog:
    def __init__(self, warehouse: str, spark: SparkSession | None = None):
        self.warehouse = warehouse
        self.spark = spark
        os.makedirs(warehouse, exist_ok=True)

    def _path(self, name: str) -> str:
        db, _, tbl = name.rpartition(".")
        return os.path.join(self.warehouse, db + ".db", tbl) if db \
            else os.path.join(self.warehouse, name)

    def create_table(self, name: str, struct: T.StructType,
                     partition_keys: list[str] | None = None,
                     primary_keys: list[str] | None = None,
                     options: dict[str, str] | None = None) -> Table:
        return Table.create(self._path(name), struct, partition_keys,
                            primary_keys, options, self.spark)

    def create_object_table(self, name: str, location: str,
                            options: dict[str, str] | None = None):
        """A read-only metadata index over a directory of unstructured
        objects (ref: ObjectTable.java; catalogs store type
        'object-table' + the object location)."""
        import json as _json
        from paimon_spark.format_table import ObjectTable
        p = self._path(name)
        # mkdir without exist_ok is the atomic create claim (racing
        # creates: one wins, the loser raises — VERDICT r12 #1 pattern)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        try:
            os.mkdir(p)
        except FileExistsError:
            raise FileExistsError(f"table {name} exists") from None
        with open(os.path.join(p, "OBJECT.json"), "w") as f:
            _json.dump({"type": "object-table", "object-location": location,
                        "options": options or {}}, f)
        return ObjectTable(location, self.spark, options)

    def get_table(self, name: str) -> Table:
        import json as _json
        marker = os.path.join(self._path(name), "OBJECT.json")
        if os.path.exists(marker):
            from paimon_spark.format_table import ObjectTable
            with open(marker) as f:
                d = _json.load(f)
            return ObjectTable(d["object-location"], self.spark,
                               d.get("options"))
        return Table.load(self._path(name), self.spark)

    def table_exists(self, name: str) -> bool:
        p = self._path(name)
        sd = os.path.join(p, "schema")
        try:
            # same loadable criterion as list_tables: the schema JSON,
            # not just the claimed dir (a torn create-vs-drop race can
            # leave an empty schema/ behind)
            if any(fn.startswith("schema-") and fn.endswith(".json")
                   for fn in os.listdir(sd)):
                return True
        except OSError:
            pass
        return os.path.exists(os.path.join(p, "OBJECT.json"))

    def drop_table(self, name: str):
        shutil.rmtree(self._path(name), ignore_errors=True)

    def create_database(self, name: str):
        os.makedirs(os.path.join(self.warehouse, f"{name}.db"),
                    exist_ok=True)

    def list_databases(self) -> list[str]:
        return sorted(n[:-3] for n in os.listdir(self.warehouse)
                      if n.endswith(".db")
                      and os.path.isdir(os.path.join(self.warehouse, n)))

    def drop_database(self, name: str, cascade: bool = False):
        d = os.path.join(self.warehouse, f"{name}.db")
        if not os.path.isdir(d):
            raise FileNotFoundError(f"no database {name}")
        if os.listdir(d) and not cascade:
            raise ValueError(f"database {name} is not empty (use CASCADE)")
        shutil.rmtree(d)

    def rename_table(self, src: str, dst: str):
        """(ref: FileSystemCatalog renameTable — a directory move).
        rename(2) itself is the atomic claim: a racer that created or
        renamed into dst first makes it a non-empty dir, so this rename
        fails ENOTEMPTY/EEXIST — the exists() pre-check alone had a
        lose-the-race window (r13, same class as VERDICT r12 #1)."""
        import errno as _errno
        sp, dp = self._path(src), self._path(dst)
        if not os.path.isdir(os.path.join(sp, "schema")):
            raise FileNotFoundError(f"no table {src}")
        if os.path.exists(dp):               # fast path; rename decides
            raise FileExistsError(f"table {dst} exists")
        os.makedirs(os.path.dirname(dp), exist_ok=True)
        try:
            os.rename(sp, dp)
        except OSError as e:
            if e.errno in (_errno.ENOTEMPTY, _errno.EEXIST):
                raise FileExistsError(f"table {dst} exists") from None
            if e.errno == _errno.ENOENT:
                raise FileNotFoundError(f"no table {src}") from None
            raise

    def list_tables(self, db: str | None = None) -> list[str]:
        base = os.path.join(self.warehouse, db + ".db") if db else self.warehouse

        def _loadable(n: str) -> bool:
            # require an actual schema json, not just the claimed dir:
            # a drop racing a create can leave a schema/ dir whose json
            # was already swept — listing it would advertise a table
            # get_table cannot load (r13 catalog race models)
            sd = os.path.join(base, n, "schema")
            try:
                if any(fn.startswith("schema-") and fn.endswith(".json")
                       for fn in os.listdir(sd)):
                    return True
            except OSError:
                pass
            return os.path.exists(os.path.join(base, n, "OBJECT.json"))

        try:
            return sorted(n for n in os.listdir(base) if _loadable(n))
        except FileNotFoundError:
            return []

    # ---- catalog-wide `sys` database tables (ref: table/system/
    #      AllTablesTable / AllPartitionsTable / AllTableOptionsTable /
    #      CatalogOptionsTable — the `sys.*` global views) ----

    def _iter_tables(self):
        """(database_name, table_name, Table) for every loadable table."""
        dbs = [None] + self.list_databases()
        for db in dbs:
            for name in self.list_tables(db):
                full = f"{db}.{name}" if db else name
                try:
                    yield (db or "default", name, self.get_table(full))
                except Exception:              # noqa: BLE001
                    continue       # e.g. object-table stub mid-create

    def all_tables_df(self):
        """`sys.tables` (ref: AllTablesTable.TABLE_TYPE)."""
        rows = []
        for db, name, t in self._iter_tables():
            sch = t.schema
            created = updated = None
            try:
                sfiles = sorted(
                    os.path.join(t.path, "schema", f)
                    for f in os.listdir(os.path.join(t.path, "schema")))
                created = int(os.path.getmtime(sfiles[0]) * 1000)
                updated = int(os.path.getmtime(sfiles[-1]) * 1000)
            except (OSError, IndexError):
                pass
            rows.append((db, name,
                         sch.options.get("type", "table"),
                         bool(sch.partition_keys),
                         sch.is_pk_table, created, updated))
        return self.spark.createDataFrame(
            rows, "database_name string, table_name string, "
                  "table_type string, partitioned boolean, "
                  "primary_key boolean, created_at long, updated_at long")

    def all_partitions_df(self):
        """`sys.partitions` (ref: AllPartitionsTable.TABLE_TYPE): every
        table's partition rollup, one metadata pass per table."""
        rows = []
        for db, name, t in self._iter_tables():
            agg: dict[tuple, list[int]] = {}
            try:
                entries = t.new_scan().plan().entries
            except Exception:                  # noqa: BLE001
                continue
            for e in entries:
                k = tuple(e.partition.get(p)
                          for p in t.schema.partition_keys)
                a = agg.setdefault(k, [0, 0, 0])
                a[0] += e.row_count
                a[1] += e.file_size
                a[2] += 1
            for k, v in agg.items():
                pname = "/".join(f"{p}={x}" for p, x in
                                 zip(t.schema.partition_keys, k)) or ""
                rows.append((db, name, pname, *v))
        return self.spark.createDataFrame(
            rows, "database_name string, table_name string, "
                  "partition_name string, record_count long, "
                  "file_size_in_bytes long, file_count long")

    def all_table_options_df(self):
        """`sys.table_options` (ref: AllTableOptionsTable.TABLE_TYPE)."""
        rows = [(db, name, k, v)
                for db, name, t in self._iter_tables()
                for k, v in sorted((t.schema.options or {}).items())]
        return self.spark.createDataFrame(
            rows, "database_name string, table_name string, "
                  "key string, value string")

    def catalog_options_df(self):
        """`sys.catalog_options` (ref: CatalogOptionsTable.TABLE_TYPE)."""
        return self.spark.createDataFrame(
            [("warehouse", self.warehouse)], "key string, value string")

    def register_sys_views(self) -> list[str]:
        """Register the catalog-wide system tables as `sys__*` temp
        views (`sys.` is not a valid temp-view prefix)."""
        out = []
        for suffix, fn in (("tables", self.all_tables_df),
                           ("partitions", self.all_partitions_df),
                           ("table_options", self.all_table_options_df),
                           ("catalog_options", self.catalog_options_df)):
            v = f"sys__{suffix}"
            fn().createOrReplaceTempView(v)
            out.append(v)
        return out

    def init_privileges(self, root_password: str) -> None:
        """Initialize the file-based privilege system for this warehouse
        (ref: FileBasedPrivilegeManager initializePrivilege — creates
        the root and anonymous users). Authenticated access afterwards
        goes through paimon_spark.privilege.PrivilegedCatalog."""
        from paimon_spark.privilege import PrivilegeManager
        PrivilegeManager(self.warehouse).initialize(root_password)

    def sql(self, statement: str):
        """The SQL entry point: DML (INSERT/UPDATE/DELETE/MERGE/TRUNCATE),
        CALL sys.*, SHOW, and SELECT passthrough — the surface a reference
        user drives through Spark SQL (see paimon_spark/sql.py)."""
        from paimon_spark.sql import SQLRouter
        return SQLRouter(self).sql(statement)

    def register_views(self, db: str | None = None,
                       system_tables: bool = False,
                       only: set[str] | None = None) -> list[str]:
        """Register tables as Spark temp views so plain
        `spark.sql("SELECT ... FROM tbl")` works — the SQL entry point a
        reference user expects (ref: SparkCatalog.java loadTable; system
        tables `tbl$snapshots` map to `tbl__snapshots` since `$` is not a
        valid temp-view identifier).

        `only` restricts registration to the named tables — the SQL
        router passes the identifiers it saw in the statement so a
        catalog with many tables doesn't pay plan construction for every
        table (and its system views) on every query."""
        names = []
        for n in self.list_tables(db):
            if only is not None and n not in only:
                continue
            t = self.get_table(f"{db}.{n}" if db else n)
            names += t.register_views(n, system_tables=system_tables)
        return names

    # ------- view catalog (ref: view/ in paimon-core — persisted SQL
    #         views with per-engine dialects; AlterViewDialectProcedure) ----

    def _view_dir(self) -> str:
        d = os.path.join(self.warehouse, "_views")
        os.makedirs(d, exist_ok=True)
        return d

    def _view_path(self, name: str) -> str:
        return os.path.join(self._view_dir(), f"{name}.json")

    # ------- materialized views (≈ the reference's materialized tables:
    #         paimon-flink CatalogMaterializedTable — definition query +
    #         freshness stored as table properties, FULL refresh mode;
    #         here refresh is engine-side instead of a Flink job) -------

    def create_materialized_view(self, name: str, query: str,
                                 freshness_s: int | None = None,
                                 partition_keys: list[str] | None = None,
                                 options: dict[str, str] | None = None):
        """Materialize `query` into a snapshot table that remembers its
        definition. `refresh_materialized_view` recomputes (full
        refresh); `freshness_s` marks how stale the data may get —
        `ensure_fresh` refreshes only when the last refresh is older."""
        import time as _time
        self.register_views()
        self.register_sql_views()
        df = self.spark.sql(query)
        opts = dict(options or {})
        opts["materialized-view.definition"] = query
        if freshness_s is not None:
            opts["materialized-view.freshness-seconds"] = str(freshness_s)
        opts["materialized-view.last-refresh-ms"] = str(
            int(_time.time() * 1000))
        t = self.create_table(name, df.schema,
                              partition_keys=partition_keys, options=opts)
        t.append(df)
        return t

    def refresh_materialized_view(self, name: str):
        """FULL refresh: recompute the definition and replace the
        contents atomically (one OVERWRITE commit — readers see the old
        version until the snapshot lands)."""
        import time as _time
        t = self.get_table(name)
        query = t.schema.options.get("materialized-view.definition")
        if not query:
            raise ValueError(f"{name} is not a materialized view")
        self.register_views()
        self.register_sql_views()
        df = self.spark.sql(query)
        t.writer().overwrite(df.select(*t.schema.field_names),
                             dynamic=False)
        t.alter(lambda sc: sc.set_option(
            "materialized-view.last-refresh-ms",
            str(int(_time.time() * 1000))))
        return t

    def ensure_fresh(self, name: str):
        """Refresh iff the view is older than its declared freshness."""
        import time as _time
        t = self.get_table(name)
        fresh = t.schema.options.get(
            "materialized-view.freshness-seconds")
        last = int(t.schema.options.get(
            "materialized-view.last-refresh-ms", "0"))
        if fresh is not None and \
                _time.time() * 1000 - last > int(fresh) * 1000:
            return self.refresh_materialized_view(name)
        return t

    def create_incremental_materialized_view(
            self, name: str, base: str, group_keys: list[str],
            aggregates: dict[str, tuple[str, str]],
            options: dict[str, str] | None = None):
        """Incrementally-maintained aggregate view: the view is a
        PRIMARY-KEY table on the group keys with the AGGREGATION merge
        engine, so a refresh only appends the base table's DELTA and
        the engine folds it in — maintenance cost scales with new data,
        never with view size (the incremental-view-maintenance shape
        the reference reaches via Flink materialized tables + its
        aggregation engine; here it is pure table machinery).

        aggregates: {out_col: (source_col, fn)} with fn ∈
        sum | count | min | max. sum/count are self-inverting (PK-base
        retractions append negated contributions); min/max refresh only
        from append-only deltas."""
        from pyspark.sql import functions as F
        bt = self.get_table(base)
        keys = list(group_keys)
        exprs, opts = [], dict(options or {})
        for out, (src, fn) in aggregates.items():
            if fn == "sum":
                exprs.append(F.sum(src).alias(out))
                opts[f"fields.{out}.aggregate-function"] = "sum"
            elif fn == "count":
                exprs.append(F.count(src).cast("long").alias(out))
                opts[f"fields.{out}.aggregate-function"] = "sum"
            elif fn in ("min", "max"):
                exprs.append(getattr(F, fn)(src).alias(out))
                opts[f"fields.{out}.aggregate-function"] = fn
            else:
                raise ValueError(f"unsupported aggregate {fn}")
        seed = bt.read().groupBy(*keys).agg(*exprs)
        opts["merge-engine"] = "aggregation"
        opts.setdefault("bucket", "4")
        opts["imv.base-table"] = base
        base_sid = bt.paths.latest_snapshot_id() or 0
        opts["imv.base-snapshot"] = str(base_sid)
        # id+timestamp identity: rollback re-uses snapshot ids, so the
        # refresh must detect a rewritten base (same contract as the
        # persisted index metas)
        try:
            opts["imv.base-snapshot-ts"] = str(
                bt.paths.read_snapshot(base_sid).timestamp_ms
                if base_sid else 0)
        except Exception:                              # noqa: BLE001
            opts["imv.base-snapshot-ts"] = "0"
        opts["imv.spec"] = __import__("json").dumps(
            {"group_keys": keys, "aggregates": aggregates})
        t = self.create_table(name, seed.schema, primary_keys=keys,
                              options=opts)
        t.append(seed)
        return t

    def refresh_incremental_materialized_view(self, name: str):
        """Fold the base delta since the last refresh into the view —
        one incremental read + one append; the aggregation engine does
        the merging."""
        import json as _json

        from pyspark.sql import functions as F
        t = self.get_table(name)
        spec_s = t.schema.options.get("imv.spec")
        if not spec_s:
            raise ValueError(f"{name} is not an incremental "
                             f"materialized view")
        spec = _json.loads(spec_s)
        base = t.schema.options["imv.base-table"]
        last = int(t.schema.options["imv.base-snapshot"])
        last_ts = int(t.schema.options.get("imv.base-snapshot-ts",
                                           "0") or 0)
        bt = self.get_table(base)
        latest = bt.paths.latest_snapshot_id() or 0

        def _base_intact() -> bool:
            # the folded-up-to snapshot must still BE that snapshot:
            # a rollback below it re-uses its id, and folding the diff
            # of a REWRITTEN base double-counts (or, with latest < last,
            # the empty walk silently keeps rolled-back rows folded)
            if not last:
                return True
            if latest < last:
                return False
            try:
                snap = bt.paths.read_snapshot(last)
            except FileNotFoundError:
                # fold-base snapshot EXPIRED: the delta since it is
                # underivable (its manifests are gone) — re-seed rather
                # than raise out of an otherwise-routine refresh
                return False
            except Exception:                      # noqa: BLE001
                return True
            if not last_ts:
                return True                        # legacy view: id only
            return snap.timestamp_ms == last_ts

        def _stamp(sid: int):
            try:
                ts = bt.paths.read_snapshot(sid).timestamp_ms if sid else 0
            except Exception:                      # noqa: BLE001
                ts = 0
            t.alter(lambda sc: sc
                    .set_option("imv.base-snapshot", str(sid))
                    .set_option("imv.base-snapshot-ts", str(ts)))

        if not _base_intact():
            # base history rewritten (rollback id-reuse): full re-seed
            # from the rewound state — incremental folding would be
            # wrong by construction
            exprs = []
            for out, (src, fn) in spec["aggregates"].items():
                if fn == "count":
                    exprs.append(F.count(src).cast("long").alias(out))
                else:
                    exprs.append(getattr(F, fn)(src).alias(out))
            seed = bt.read().groupBy(*spec["group_keys"]).agg(*exprs)
            t.truncate()
            t.append(seed.select(*t.schema.field_names))
            _stamp(latest)
            return t
        if latest <= last:
            return t
        if bt.schema.is_pk_table:
            # a PK base's incremental read is a DIFF (+I only) — the
            # view needs true retractions (-U for the replaced value,
            # -D for deletes) or upserts double-count; the changelog
            # derivation provides exactly that
            from paimon_spark.operators.changelog import derive_changelog
            delta = derive_changelog(bt, last, latest)
        else:
            delta = bt.read_incremental(last, latest)
        keys = spec["group_keys"]
        sign = F.lit(1)
        if "_row_kind" in delta.columns:
            retracting = delta.filter(
                F.col("_row_kind").isin("-D", "-U")).limit(1).count() > 0
            if retracting and any(
                    fn in ("min", "max")
                    for _s, fn in spec["aggregates"].values()):
                raise ValueError(
                    "base delta contains retractions; min/max view "
                    "columns need a full refresh")
            sign = F.when(F.col("_row_kind").isin("-D", "-U"),
                          F.lit(-1)).otherwise(F.lit(1))
        exprs = []
        for out, (src, fn) in spec["aggregates"].items():
            if fn == "sum":
                exprs.append(F.sum(F.col(src) * sign)
                             .cast(t.schema.data_type(out)).alias(out))
            elif fn == "count":
                exprs.append(F.sum(F.when(F.col(src).isNotNull(), sign)
                                   .otherwise(F.lit(0)))
                             .cast("long").alias(out))
            else:
                exprs.append(getattr(F, fn)(src).alias(out))
        inc = delta.groupBy(*keys).agg(*exprs)
        t.append(inc.select(*t.schema.field_names))
        _stamp(latest)
        return t

    def create_view(self, name: str, query: str, dialect: str = "spark",
                    replace: bool = False) -> None:
        """Persist a named SQL view. `dialect` keys alternate SQL texts for
        other engines (the reference's view dialects); `spark` is what
        `register_sql_views` executes."""
        import json
        existing = {}
        if os.path.exists(self._view_path(name)):
            if not replace:
                raise FileExistsError(f"view {name} exists")
            with open(self._view_path(name)) as f:
                existing = json.load(f).get("dialects", {})
        existing[dialect] = query
        # O_EXCL open is the atomic create claim for the non-replace
        # path (the exists() check above is advisory — two racing
        # creates both pass it); replace=True is last-writer-wins
        mode = "w" if replace else "x"
        try:
            with open(self._view_path(name), mode) as f:
                json.dump({"name": name, "dialects": existing}, f,
                          indent=2)
        except FileExistsError:
            raise FileExistsError(f"view {name} exists") from None

    def alter_view_dialect(self, name: str, dialect: str, query: str) -> None:
        """(ref: AlterViewDialectProcedure.java)"""
        if not os.path.exists(self._view_path(name)):
            raise FileNotFoundError(f"view {name} doesn't exist")
        self.create_view(name, query, dialect, replace=True)

    def drop_view(self, name: str) -> None:
        os.remove(self._view_path(name))

    def list_views(self) -> list[str]:
        try:
            return sorted(n[:-len(".json")] for n in os.listdir(self._view_dir())
                          if n.endswith(".json"))
        except FileNotFoundError:
            return []

    def view_sql(self, name: str, dialect: str = "spark") -> str:
        import json
        with open(self._view_path(name)) as f:
            return json.load(f)["dialects"][dialect]

    def register_sql_views(self, spark: SparkSession | None = None) -> list[str]:
        """Register every persisted view's spark dialect as a temp view.
        Call after `register_views()` so base tables resolve."""
        spark = spark or self.spark
        out = []
        for n in self.list_views():
            try:
                sql = self.view_sql(n)
            except KeyError:
                continue          # no spark dialect for this view
            spark.sql(sql).createOrReplaceTempView(n)
            out.append(n)
        return out

    # ------- function catalog (ref: CreateFunctionProcedure.java,
    #         paimon-api/.../function/FunctionDefinition.java — we persist
    #         the `sql` definition kind; `file`/JVM-lambda kinds are engine-
    #         specific code shipping, out of scope for a PySpark engine) ----

    def _fn_dir(self) -> str:
        d = os.path.join(self.warehouse, "_functions")
        os.makedirs(d, exist_ok=True)
        return d

    def _fn_path(self, name: str) -> str:
        return os.path.join(self._fn_dir(), f"{name}.json")

    def create_function(self, name: str, input_params: list[tuple[str, str]],
                        return_type: str, definition: str,
                        replace: bool = False) -> None:
        """Persist a SQL scalar function: `input_params` = [(name, sqlType)],
        `definition` = a SQL expression over the params. Registered into
        Spark as a native SQL UDF (fully Catalyst-optimizable — inlined
        into plans, no python round-trip)."""
        import json
        # O_EXCL open is the atomic create claim (racing creates: one
        # wins, the loser raises); replace=True is last-writer-wins
        try:
            with open(self._fn_path(name), "w" if replace else "x") as f:
                json.dump({"name": name,
                           "inputParams": list(map(list, input_params)),
                           "returnType": return_type,
                           "definition": definition,
                           "kind": "sql"}, f, indent=2)
        except FileExistsError:
            raise FileExistsError(f"function {name} exists") from None
        if self.spark is not None:
            self._register_fn(self.spark, name)

    def alter_function(self, name: str, definition: str) -> None:
        import json
        with open(self._fn_path(name)) as f:
            d = json.load(f)
        d["definition"] = definition
        with open(self._fn_path(name), "w") as f:
            json.dump(d, f, indent=2)
        if self.spark is not None:
            self._register_fn(self.spark, name)

    def drop_function(self, name: str) -> None:
        os.remove(self._fn_path(name))

    def list_functions(self) -> list[str]:
        try:
            return sorted(n[:-len(".json")] for n in os.listdir(self._fn_dir())
                          if n.endswith(".json"))
        except FileNotFoundError:
            return []

    def _register_fn(self, spark: SparkSession, name: str) -> None:
        import json
        with open(self._fn_path(name)) as f:
            d = json.load(f)
        params = ", ".join(f"{p} {t}" for p, t in d["inputParams"])
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
                  f"RETURNS {d['returnType']} RETURN {d['definition']}")

    def register_functions(self, spark: SparkSession | None = None) -> list[str]:
        """Re-register every persisted function into the session."""
        spark = spark or self.spark
        out = self.list_functions()
        for n in out:
            self._register_fn(spark, n)
        return out
