"""JDBC-style catalog: table/database METADATA in a SQL database, data in
the warehouse — plus catalog-level locks.

Mirrors the reference's JdbcCatalog (ref: paimon-core/.../jdbc/
JdbcCatalog.java, JdbcCatalogLock.java: databases/tables live as rows in
a relational DB, table data stays under the warehouse path; the DB also
provides an acquire/release lock used where the filesystem lacks atomic
put-if-absent, e.g. object stores).

Python-first shape: sqlite3 (stdlib) plays the JDBC database — the SQL
schema and semantics match (unique keys give atomic create, transactions
give atomic rename); swapping the connection for a real RDBMS is a
driver change, not a design change. Data-plane operations still go
through `Table`, so everything `Catalog` offers (sql(), views, …) works
unchanged.
"""

from __future__ import annotations

import os
import sqlite3
import time
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from paimon_spark.catalog import Catalog
from paimon_spark.table import Table

_DDL = """
CREATE TABLE IF NOT EXISTS paimon_databases (
    name TEXT PRIMARY KEY
);
CREATE TABLE IF NOT EXISTS paimon_tables (
    db   TEXT NOT NULL,
    name TEXT NOT NULL,
    path TEXT NOT NULL,
    PRIMARY KEY (db, name)
);
CREATE TABLE IF NOT EXISTS paimon_locks (
    lock_id     TEXT PRIMARY KEY,
    holder      TEXT NOT NULL,
    acquired_ms INTEGER NOT NULL
);
"""


class JdbcCatalog(Catalog):
    DEFAULT_DB = "default"

    def __init__(self, db_path: str, warehouse: str,
                 spark: SparkSession | None = None,
                 lock_timeout_s: float = 60.0):
        super().__init__(warehouse, spark)
        self.db_path = db_path
        self.lock_timeout_s = lock_timeout_s
        self._holder = uuid.uuid4().hex
        with self._conn() as con:
            con.executescript(_DDL)
            con.execute(
                "INSERT OR IGNORE INTO paimon_databases VALUES (?)",
                (self.DEFAULT_DB,))

    def _conn(self) -> sqlite3.Connection:
        con = sqlite3.connect(self.db_path, timeout=30)
        con.isolation_level = None         # explicit transactions
        return con

    @staticmethod
    def _split(name: str) -> tuple[str, str]:
        db, _, tbl = name.rpartition(".")
        return (db or JdbcCatalog.DEFAULT_DB), tbl

    # ---------------- databases ----------------

    def create_database(self, name: str) -> None:
        with self._conn() as con:
            con.execute("INSERT OR IGNORE INTO paimon_databases VALUES (?)",
                        (name,))

    def list_databases(self) -> list[str]:
        with self._conn() as con:
            return sorted(r[0] for r in con.execute(
                "SELECT name FROM paimon_databases"))

    def drop_database(self, name: str) -> None:
        with self._conn() as con:
            n = con.execute("SELECT COUNT(*) FROM paimon_tables WHERE db=?",
                            (name,)).fetchone()[0]
            if n:
                raise ValueError(f"database {name} is not empty ({n} tables)")
            con.execute("DELETE FROM paimon_databases WHERE name=?", (name,))

    # ---------------- tables ----------------

    def _path(self, name: str) -> str:
        db, tbl = self._split(name)
        with self._conn() as con:
            row = con.execute(
                "SELECT path FROM paimon_tables WHERE db=? AND name=?",
                (db, tbl)).fetchone()
        if row:
            return row[0]
        return os.path.join(self.warehouse, f"{db}.db", tbl)

    def create_table(self, name: str, struct: T.StructType,
                     partition_keys: list[str] | None = None,
                     primary_keys: list[str] | None = None,
                     options: dict[str, str] | None = None) -> Table:
        db, tbl = self._split(name)
        path = os.path.join(self.warehouse, f"{db}.db", tbl)
        # DDL serialized under the catalog lock (ref: JdbcCatalogLock —
        # the reference guards metadata+filesystem mutations the same
        # way): the row insert alone is atomic, but a DROP racing the
        # subsequent directory write could tear the layout while the
        # row says the table exists (r13 catalog race models)
        with self.lock("__ddl__"):
            with self._conn() as con:
                con.execute("BEGIN IMMEDIATE")
                try:
                    if not con.execute(
                            "SELECT 1 FROM paimon_databases WHERE name=?",
                            (db,)).fetchone():
                        raise ValueError(f"database {db} does not exist")
                    # unique PK = the reference's atomic create-if-absent
                    con.execute("INSERT INTO paimon_tables VALUES (?,?,?)",
                                (db, tbl, path))
                    con.execute("COMMIT")
                except sqlite3.IntegrityError:
                    con.execute("ROLLBACK")
                    raise FileExistsError(f"table {name} already exists")
                except Exception:
                    con.execute("ROLLBACK")
                    raise
            try:
                return Table.create(path, struct, partition_keys,
                                    primary_keys, options, self.spark)
            except Exception:
                # never leave a row pointing at a layout that failed to
                # materialize — the insert is rolled back on any write
                # failure so the loser's retry sees a clean slate
                with self._conn() as con:
                    con.execute(
                        "DELETE FROM paimon_tables WHERE db=? AND name=?",
                        (db, tbl))
                raise

    def table_exists(self, name: str) -> bool:
        db, tbl = self._split(name)
        with self._conn() as con:
            return con.execute(
                "SELECT 1 FROM paimon_tables WHERE db=? AND name=?",
                (db, tbl)).fetchone() is not None

    def drop_table(self, name: str):
        import shutil
        db, tbl = self._split(name)
        with self.lock("__ddl__"):
            path = self._path(name)
            with self._conn() as con:
                con.execute(
                    "DELETE FROM paimon_tables WHERE db=? AND name=?",
                    (db, tbl))
            shutil.rmtree(path, ignore_errors=True)

    def rename_table(self, old: str, new: str) -> None:
        """Atomic rename: the row moves in one transaction AND the data
        directory moves with it (ref: JdbcCatalog.renameTableImpl —
        updateTable + fileIO.rename(fromPath, toPath), 'maintain
        consistency between tables in the file system and the
        metastore'). r13: the directory move replaced the old re-point
        — a re-pointed path collided with later creates/drops of the
        OLD name, which resolved the same default location and could
        delete the renamed table's data (found by the catalog race
        models)."""
        import errno as _errno

        odb, otbl = self._split(old)
        ndb, ntbl = self._split(new)
        new_path = os.path.join(self.warehouse, f"{ndb}.db", ntbl)
        with self.lock("__ddl__"), self._conn() as con:
            con.execute("BEGIN IMMEDIATE")
            try:
                row = con.execute(
                    "SELECT path FROM paimon_tables WHERE db=? AND name=?",
                    (odb, otbl)).fetchone()
                if not row:
                    raise FileNotFoundError(f"table {old} does not exist")
                con.execute("INSERT INTO paimon_tables VALUES (?,?,?)",
                            (ndb, ntbl, new_path))
                con.execute(
                    "DELETE FROM paimon_tables WHERE db=? AND name=?",
                    (odb, otbl))
                # move the dir BEFORE COMMIT: a failed move rolls the
                # row move back, so metadata and filesystem stay in step
                if row[0] != new_path and os.path.isdir(row[0]):
                    os.makedirs(os.path.dirname(new_path), exist_ok=True)
                    os.rename(row[0], new_path)
                con.execute("COMMIT")
            except sqlite3.IntegrityError:
                con.execute("ROLLBACK")
                raise FileExistsError(f"table {new} already exists")
            except OSError as e:
                con.execute("ROLLBACK")
                if e.errno in (_errno.ENOTEMPTY, _errno.EEXIST):
                    raise FileExistsError(
                        f"table {new} already exists") from None
                raise
            except Exception:
                con.execute("ROLLBACK")
                raise

    def list_tables(self, db: str | None = None) -> list[str]:
        with self._conn() as con:
            if db:
                rows = con.execute(
                    "SELECT name FROM paimon_tables WHERE db=?", (db,))
            else:
                rows = con.execute("SELECT name FROM paimon_tables")
            return sorted(r[0] for r in rows)

    # ---------------- locks (ref: JdbcCatalogLock.java) ----------------

    def lock(self, lock_id: str, timeout_s: float | None = None):
        """Context manager: catalog-level mutual exclusion keyed by id —
        the hook for commit coordination on stores without atomic
        put-if-absent. Stale locks (older than the timeout) are stolen,
        like the reference's lock expiration."""
        return _JdbcLock(self, lock_id,
                         timeout_s if timeout_s is not None
                         else self.lock_timeout_s)


class _JdbcLock:
    def __init__(self, cat: JdbcCatalog, lock_id: str, timeout_s: float):
        self.cat, self.lock_id, self.timeout_s = cat, lock_id, timeout_s

    def __enter__(self):
        deadline = time.monotonic() + self.timeout_s
        while True:
            now_ms = int(time.time() * 1000)
            stale_ms = now_ms - int(self.timeout_s * 1000)
            with self.cat._conn() as con:
                con.execute("BEGIN IMMEDIATE")
                con.execute("DELETE FROM paimon_locks WHERE lock_id=? "
                            "AND acquired_ms < ?",
                            (self.lock_id, stale_ms))
                try:
                    con.execute("INSERT INTO paimon_locks VALUES (?,?,?)",
                                (self.lock_id, self.cat._holder, now_ms))
                    con.execute("COMMIT")
                    return self
                except sqlite3.IntegrityError:
                    con.execute("ROLLBACK")
            if time.monotonic() > deadline:
                raise TimeoutError(f"lock {self.lock_id} not acquired "
                                   f"within {self.timeout_s}s")
            time.sleep(0.05)

    def __exit__(self, *exc):
        with self.cat._conn() as con:
            con.execute("DELETE FROM paimon_locks WHERE lock_id=? AND holder=?",
                        (self.lock_id, self.cat._holder))
        return False
