"""CLI parity with the reference's pypaimon console commands
(ref: paimon-python/pypaimon/cli/)."""

import json

from paimon_spark.cli import main


def _run(capsys, *argv):
    assert main(list(argv)) == 0
    return capsys.readouterr().out.strip().splitlines()


def test_cli_table_lifecycle(spark, wh, capsys):
    base = ["--warehouse", wh, "--json"]
    _run(capsys, *base, "table", "create", "t",
         "--schema", "k BIGINT, v STRING",
         "--primary-keys", "k", "--option", "bucket=2")
    _run(capsys, *base, "sql", "INSERT INTO t VALUES (1, 'a'), (2, 'b')")
    out = _run(capsys, *base, "table", "read", "t", "--where", "k = 2")
    assert json.loads(out[0]) == {"k": 2, "v": "b"}
    # metadata commands (no Spark needed)
    _run(capsys, *base, "tag", "create", "t", "v1")
    out = _run(capsys, *base, "tag", "list", "t")
    assert json.loads(out[0]) == {"tag": "v1", "snapshot_id": 1}
    out = _run(capsys, *base, "table", "get", "t")
    meta = json.loads("\n".join(out))
    assert meta["primary_keys"] == ["k"]
    out = _run(capsys, *base, "table", "snapshot", "t")
    assert json.loads("\n".join(out))["id"] == 1
    # alter surface
    _run(capsys, *base, "table", "alter", "t", "add-column", "amt",
         "double")
    _run(capsys, *base, "table", "alter", "t", "set-option",
         "snapshot.num-retained.max", "5")
    from paimon_spark import Table
    t = Table.load(f"{wh}/t")
    assert "amt" in t.schema.field_names
    assert t.schema.options["snapshot.num-retained.max"] == "5"
    # branch + db listing
    _run(capsys, *base, "branch", "create", "t", "b1")
    out = _run(capsys, *base, "branch", "list", "t")
    assert json.loads(out[0]) == {"branch": "b1"}
    out = _run(capsys, *base, "db", "list-tables")
    assert {json.loads(line)["table"] for line in out} == {"t"}


def test_cli_import_and_search(spark, wh, tmp_path, capsys):
    base = ["--warehouse", wh, "--json"]
    _run(capsys, *base, "table", "create", "docs",
         "--schema", "id BIGINT, text STRING")
    csv = tmp_path / "in.csv"
    csv.write_text("id,text\n1,alpha beta\n2,beta gamma\n")
    out = _run(capsys, *base, "table", "import", "docs", str(csv))
    assert "imported 2 rows" in out[-1]
    out = _run(capsys, *base, "table", "full-text-search", "docs",
               "--query", "alpha", "-k", "3")
    assert json.loads(out[0])["id"] == 1


def test_cli_explain_scan_plan(spark, wh, capsys):
    """table explain: pypaimon read/explain.py analog — pruning counts
    and split shapes from the engine's scan plan."""
    base = ["--warehouse", wh, "--json"]
    _run(capsys, *base, "table", "create", "p",
         "--schema", "dt STRING, k BIGINT",
         "--partition-keys", "dt")
    _run(capsys, *base, "sql",
         "INSERT INTO p VALUES ('a', 1), ('b', 2), ('c', 3)")
    out = _run(capsys, *base, "table", "explain", "p",
               "--where", "dt = 'a'")
    text = "\n".join(out)
    assert "files: 1 scanned, 2 pruned" in text
    assert "raw groups" in text and "partitions: 1" in text
