"""File-based privilege system (ref: paimon-core/.../privilege/ —
PrivilegeManager, FileBasedPrivilegeManager, PrivilegedCatalog,
PrivilegeType, PrivilegeCheckerImpl).

Reference semantics kept:
  * initializing creates two special users: `root` (all privileges,
    cannot be dropped or restricted) and `anonymous` (default identity,
    password "anonymous") — PrivilegeManager.java:24-48;
  * privilege targets form a hierarchy (catalog "" → database →
    table): a grant on an enclosing identifier covers everything
    inside — PrivilegeType.canGrantOn*;
  * types: SELECT / INSERT / ALTER_TABLE / DROP_TABLE (table),
    CREATE_TABLE / DROP_DATABASE / ALTER_DATABASE (database),
    CREATE_DATABASE / ADMIN (catalog);
  * ADMIN manages users and grants.

State lives under `<warehouse>/_privilege/` as JSON (the reference uses
one file per user/grant in the same directory role); passwords are
stored salted-hashed, never in clear.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

USER_ROOT = "root"
USER_ANONYMOUS = "anonymous"
PASSWORD_ANONYMOUS = "anonymous"
WHOLE_CATALOG = ""

TABLE_PRIVILEGES = {"SELECT", "INSERT", "ALTER_TABLE", "DROP_TABLE"}
DATABASE_PRIVILEGES = {"CREATE_TABLE", "DROP_DATABASE", "ALTER_DATABASE"}
CATALOG_PRIVILEGES = {"CREATE_DATABASE", "ADMIN"}
ALL_PRIVILEGES = TABLE_PRIVILEGES | DATABASE_PRIVILEGES | CATALOG_PRIVILEGES


class NoPrivilegeException(PermissionError):
    def __init__(self, user: str, identifier: str, privilege: str):
        super().__init__(
            f"user {user} lacks privilege {privilege} on "
            f"{identifier or '<catalog>'}")
        self.user, self.identifier, self.privilege = \
            user, identifier, privilege


def _hash(password: str, salt: str) -> str:
    return hashlib.sha256((salt + ":" + password).encode()).hexdigest()


class PrivilegeManager:
    def __init__(self, warehouse: str):
        self.dir = os.path.join(warehouse, "_privilege")

    # ---- state ----

    @property
    def enabled(self) -> bool:
        return os.path.exists(os.path.join(self.dir, "users.json"))

    def _load(self, name: str) -> dict:
        try:
            with open(os.path.join(self.dir, f"{name}.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _save(self, name: str, data: dict) -> None:
        os.makedirs(self.dir, exist_ok=True)
        p = os.path.join(self.dir, f"{name}.json")
        with open(p + ".tmp", "w") as f:
            json.dump(data, f, indent=2)
        os.replace(p + ".tmp", p)

    # ---- lifecycle ----

    def initialize(self, root_password: str) -> None:
        """init_file_based_privilege (ref: FileBasedPrivilegeManager
        initializePrivilege — creates root + anonymous)."""
        if self.enabled:
            raise ValueError("privilege system already initialized")
        users = {}
        for user, pw in ((USER_ROOT, root_password),
                         (USER_ANONYMOUS, PASSWORD_ANONYMOUS)):
            salt = os.urandom(8).hex()
            users[user] = {"salt": salt, "hash": _hash(pw, salt)}
        self._save("users", users)
        self._save("grants", {})

    def authenticate(self, user: str, password: str) -> None:
        users = self._load("users")
        rec = users.get(user)
        if rec is None or _hash(password, rec["salt"]) != rec["hash"]:
            raise NoPrivilegeException(user, WHOLE_CATALOG, "LOGIN")

    # ---- user + grant management (callers must hold ADMIN) ----

    def create_user(self, user: str, password: str) -> None:
        users = self._load("users")
        if user in users:
            raise ValueError(f"user {user} exists")
        salt = os.urandom(8).hex()
        users[user] = {"salt": salt, "hash": _hash(password, salt)}
        self._save("users", users)

    def drop_user(self, user: str) -> None:
        if user in (USER_ROOT, USER_ANONYMOUS):
            raise ValueError(f"cannot drop special user {user}")
        users = self._load("users")
        users.pop(user, None)
        self._save("users", users)
        grants = self._load("grants")
        grants.pop(user, None)
        self._save("grants", grants)

    def grant(self, user: str, identifier: str, privilege: str) -> None:
        privilege = privilege.upper()
        if privilege not in ALL_PRIVILEGES:
            raise ValueError(f"unknown privilege {privilege}")
        # target/identifier compatibility (PrivilegeType.canGrantOn*):
        # catalog-target privs only on "", database-target on "" or db,
        # table-target anywhere
        depth = 0 if identifier == WHOLE_CATALOG else \
            identifier.count(".") + 1
        if privilege in CATALOG_PRIVILEGES and depth > 0:
            raise ValueError(f"{privilege} can only be granted on the "
                             f"whole catalog")
        if privilege in DATABASE_PRIVILEGES and depth > 1:
            raise ValueError(f"{privilege} cannot be granted on a table")
        if user not in self._load("users"):
            raise ValueError(f"no user {user}")
        grants = self._load("grants")
        u = grants.setdefault(user, {})
        lst = u.setdefault(identifier, [])
        if privilege not in lst:
            lst.append(privilege)
        self._save("grants", grants)

    def revoke(self, user: str, identifier: str, privilege: str) -> int:
        if user == USER_ROOT:
            raise ValueError("cannot revoke from root")
        privilege = privilege.upper()
        grants = self._load("grants")
        removed = 0
        for ident, lst in grants.get(user, {}).items():
            # revoking on an identifier cascades into it (reference:
            # revoke on db removes table grants under it)
            if (ident == identifier or identifier == WHOLE_CATALOG
                    or ident.startswith(identifier + ".")) \
                    and privilege in lst:
                lst.remove(privilege)
                removed += 1
        self._save("grants", grants)
        return removed

    # ---- checks ----

    def check(self, user: str, identifier: str, privilege: str) -> None:
        if user == USER_ROOT:
            return
        grants = self._load("grants").get(user, {})
        # the identifier itself and every enclosing scope
        scopes = [identifier, WHOLE_CATALOG]
        if "." in identifier:
            scopes.insert(1, identifier.rsplit(".", 1)[0])
        for s in scopes:
            if privilege in grants.get(s, []):
                return
        raise NoPrivilegeException(user, identifier, privilege)


class PrivilegedTable:
    """Table proxy enforcing SELECT on reads, INSERT on writes and
    maintenance, ALTER_TABLE on schema changes (ref:
    PrivilegedFileStoreTable)."""

    _READ = {"read", "read_with_lineage", "read_audit_log",
             "read_incremental", "read_incremental_between_timestamps",
             "read_incremental_to_auto_tag", "read_optimized", "new_scan",
             "read_topn", "to_df", "snapshots_df", "files_df",
             "partitions_df", "tags_df", "branches_df", "buckets_df",
             "options_df", "schemas_df", "manifests_df", "consumers_df",
             "statistics_df", "aggregation_fields_df", "table_indexes_df",
             "row_tracking_df", "register_views", "list_branches",
             "delta_entries", "max_pt", "vector_search",
             "full_text_search", "hybrid_search", "vector_index_meta",
             "text_index_meta", "file_key_ranges_df",
             "file_format"}
    # refresh_text_index / refresh_vector_index / create_*_index fall
    # through to the default-deny INSERT branch: index builds write
    # under the table directory (maintenance, like compact).
    _ALTER = {"alter"}

    def __init__(self, table: Any, manager: PrivilegeManager, user: str,
                 identifier: str):
        object.__setattr__(self, "_t", table)
        object.__setattr__(self, "_mgr", manager)
        object.__setattr__(self, "_user", user)
        object.__setattr__(self, "_id", identifier)

    def __getattr__(self, name: str):
        attr = getattr(self._t, name)
        if name.startswith("_"):
            return attr
        if name == "branch":
            # branch() returns another Table: keep it privileged
            self._mgr.check(self._user, self._id, "SELECT")

            def _branch(bname: str):
                return PrivilegedTable(attr(bname), self._mgr,
                                       self._user, self._id)
            return _branch
        if name in self._READ:
            self._mgr.check(self._user, self._id, "SELECT")
        elif name in self._ALTER:
            self._mgr.check(self._user, self._id, "ALTER_TABLE")
        elif callable(attr):
            # default-deny: every method not explicitly read-only is a
            # mutation or maintenance action (append, overwrite,
            # rollback_to, fast_forward, remove_orphan_files, branch
            # create/delete, compact, expire_*, copy_into, writer, ...)
            # and requires INSERT — unknown names never pass unchecked.
            self._mgr.check(self._user, self._id, "INSERT")
        return attr


class PrivilegedCatalog:
    """Catalog wrapper with authentication + per-operation checks
    (ref: PrivilegedCatalog.java). Usage:

        Catalog(wh, spark).init_privileges("root-pw")   # once
        cat = PrivilegedCatalog(wh, spark, user="alice", password="pw")
        cat.get_table("t").read()                        # needs SELECT
    """

    def __init__(self, warehouse: str, spark=None,
                 user: str = USER_ANONYMOUS,
                 password: str = PASSWORD_ANONYMOUS):
        from paimon_spark.catalog import Catalog
        self._cat = Catalog(warehouse, spark)
        self.manager = PrivilegeManager(warehouse)
        if not self.manager.enabled:
            raise ValueError("privilege system not initialized; call "
                             "Catalog.init_privileges(root_password)")
        self.manager.authenticate(user, password)
        self.user = user

    # ---- table / database ops with checks ----

    def get_table(self, name: str) -> PrivilegedTable:
        return PrivilegedTable(self._cat.get_table(name), self.manager,
                               self.user, name)

    def create_table(self, name: str, *a, **kw):
        db = name.rsplit(".", 1)[0] if "." in name else WHOLE_CATALOG
        self.manager.check(self.user, db, "CREATE_TABLE")
        return self._cat.create_table(name, *a, **kw)

    def drop_table(self, name: str):
        self.manager.check(self.user, name, "DROP_TABLE")
        return self._cat.drop_table(name)

    def create_database(self, name: str):
        self.manager.check(self.user, WHOLE_CATALOG, "CREATE_DATABASE")
        return self._cat.create_database(name)

    def drop_database(self, name: str, cascade: bool = False):
        self.manager.check(self.user, name, "DROP_DATABASE")
        return self._cat.drop_database(name, cascade)

    def list_tables(self, db: str | None = None):
        return self._cat.list_tables(db)

    def list_databases(self):
        return self._cat.list_databases()

    # ---- user management (ADMIN) ----

    def _admin(self):
        self.manager.check(self.user, WHOLE_CATALOG, "ADMIN")

    def create_privileged_user(self, user: str, password: str):
        self._admin()
        self.manager.create_user(user, password)

    def drop_privileged_user(self, user: str):
        self._admin()
        self.manager.drop_user(user)

    def grant_privilege_to_user(self, user: str, privilege: str,
                                identifier: str = WHOLE_CATALOG):
        self._admin()
        self.manager.grant(user, identifier, privilege)

    def revoke_privilege_from_user(self, user: str, privilege: str,
                                   identifier: str = WHOLE_CATALOG) -> int:
        self._admin()
        return self.manager.revoke(user, identifier, privilege)
