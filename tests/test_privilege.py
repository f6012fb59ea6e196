"""File-based privilege system (ref: paimon-core/.../privilege/ —
root/anonymous special users, hierarchical grants, per-op checks)."""

import pytest
from pyspark.sql import types as T

from paimon_spark import Catalog
from paimon_spark.privilege import (NoPrivilegeException,
                                    PrivilegedCatalog)

SCH = T.StructType([T.StructField("id", T.LongType()),
                    T.StructField("v", T.StringType())])


@pytest.fixture()
def priv_wh(spark, wh):
    cat = Catalog(wh, spark)
    t = cat.create_table("t1", SCH)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCH))
    cat.init_privileges("rootpw")
    return wh


def test_root_has_everything(spark, priv_wh):
    root = PrivilegedCatalog(priv_wh, spark, "root", "rootpw")
    assert root.get_table("t1").read().count() == 2
    root.get_table("t1").append(
        spark.createDataFrame([(3, "c")], SCH))
    root.create_table("t2", SCH)
    root.drop_table("t2")


def test_authentication(spark, priv_wh):
    with pytest.raises(NoPrivilegeException, match="LOGIN"):
        PrivilegedCatalog(priv_wh, spark, "root", "wrong")
    with pytest.raises(ValueError, match="not initialized"):
        PrivilegedCatalog("/tmp/nowhere-priv", spark)
    # anonymous logs in with the default password but has no grants
    anon = PrivilegedCatalog(priv_wh, spark)
    with pytest.raises(NoPrivilegeException, match="SELECT"):
        anon.get_table("t1").read()


def test_grant_revoke_hierarchy(spark, priv_wh):
    root = PrivilegedCatalog(priv_wh, spark, "root", "rootpw")
    root.create_privileged_user("alice", "apw")
    alice = PrivilegedCatalog(priv_wh, spark, "alice", "apw")
    with pytest.raises(NoPrivilegeException):
        alice.get_table("t1").read()
    # table-level SELECT
    root.grant_privilege_to_user("alice", "SELECT", "t1")
    assert alice.get_table("t1").read().count() == 2
    with pytest.raises(NoPrivilegeException, match="INSERT"):
        alice.get_table("t1").append(
            spark.createDataFrame([(9, "z")], SCH))
    # catalog-level INSERT covers every table (hierarchy)
    root.grant_privilege_to_user("alice", "INSERT")
    alice.get_table("t1").append(spark.createDataFrame([(9, "z")], SCH))
    assert alice.get_table("t1").read().count() == 3
    # revoke cascades
    root.revoke_privilege_from_user("alice", "SELECT")
    with pytest.raises(NoPrivilegeException):
        alice.get_table("t1").read()
    # non-admin cannot manage users or grants
    with pytest.raises(NoPrivilegeException, match="ADMIN"):
        alice.create_privileged_user("bob", "bpw")
    with pytest.raises(NoPrivilegeException, match="ADMIN"):
        alice.grant_privilege_to_user("alice", "SELECT", "t1")


def test_special_users_and_target_rules(spark, priv_wh):
    root = PrivilegedCatalog(priv_wh, spark, "root", "rootpw")
    with pytest.raises(ValueError, match="special user"):
        root.drop_privileged_user("root")
    with pytest.raises(ValueError, match="cannot revoke from root"):
        root.revoke_privilege_from_user("root", "SELECT")
    root.create_privileged_user("carol", "cpw")
    with pytest.raises(ValueError, match="whole catalog"):
        root.grant_privilege_to_user("carol", "ADMIN", "t1")
    # DDL checks
    carol = PrivilegedCatalog(priv_wh, spark, "carol", "cpw")
    with pytest.raises(NoPrivilegeException, match="CREATE_TABLE"):
        carol.create_table("t3", SCH)
    with pytest.raises(NoPrivilegeException, match="DROP_TABLE"):
        carol.drop_table("t1")
    root.grant_privilege_to_user("carol", "CREATE_TABLE")
    carol.create_table("t3", SCH)


def test_init_via_sql_call(spark, wh):
    cat = Catalog(wh, spark)
    cat.create_table("p1", SCH)
    cat.sql("CALL sys.init_file_based_privilege(root_password => 'rp')")
    root = PrivilegedCatalog(wh, spark, "root", "rp")
    root.create_privileged_user("dave", "dpw")
    with pytest.raises(NoPrivilegeException):
        PrivilegedCatalog(wh, spark, "dave", "dpw").get_table("p1").read()


def test_destructive_methods_default_deny(spark, priv_wh):
    """Unknown / non-read methods (overwrite, rollback_to, fast_forward,
    remove_orphan_files, branch ops) must require INSERT — never pass
    through unchecked."""
    root = PrivilegedCatalog(priv_wh, spark, "root", "rootpw")
    root.create_privileged_user("eve", "epw")
    root.grant_privilege_to_user("eve", "SELECT", "t1")
    eve = PrivilegedCatalog(priv_wh, spark, "eve", "epw")
    t = eve.get_table("t1")
    df = spark.createDataFrame([(7, "x")], SCH)
    for call in [lambda: t.overwrite(df),
                 lambda: t.rollback_to(1),
                 lambda: t.fast_forward("b"),
                 lambda: t.remove_orphan_files(),
                 lambda: t.create_branch("b"),
                 lambda: t.delete_branch("b"),
                 lambda: t.writer(),
                 lambda: t.truncate(),
                 lambda: t.expire_snapshots()]:
        with pytest.raises(NoPrivilegeException, match="INSERT"):
            call()
    # read-only surface still works with SELECT only
    assert t.read().count() == 2
    assert t.snapshots_df().count() >= 1
    # with INSERT the same calls are allowed
    root.grant_privilege_to_user("eve", "INSERT", "t1")
    t.overwrite(df)
    assert t.read().count() == 1
