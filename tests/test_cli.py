"""CLI golden-output tests — mirrors tools/TestFreshTool.java:104-313
(register/unregister/retrieve/validate modes with exact message asserts).
No SparkSession: the CLI reads table layout from the parquet footer."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kiji_scoring_spark.cli import main

POLICY = "kiji_scoring_spark.policies.ShelfLife"
PRODUCER = "kiji_scoring_spark.producers.Producer"


@pytest.fixture
def user_parquet(tmp_path):
    """user table: flattened group family info(name,email) + map family
    networks (FIXTURES.md §2 layout, arrow map type)."""
    table = pa.table(
        {
            "entity_id": pa.array(["a"]),
            "info_name": pa.array([[{"ts": 1, "value": "x"}]]),
            "info_email": pa.array([[{"ts": 1, "value": "x@y"}]]),
            "networks": pa.array(
                [[("n1", "v")]], type=pa.map_(pa.string(), pa.string())
            ),
        }
    )
    path = tmp_path / "user.parquet"
    pq.write_table(table, path)
    return str(path)


@pytest.fixture
def reg_path(tmp_path):
    return str(tmp_path / "registry.json")


def run(capsys, *argv):
    rc = main(list(argv))
    return rc, capsys.readouterr().out


def register(capsys, reg_path, user_parquet, column="info:name", policy=POLICY):
    return run(
        capsys, "--registry", reg_path, "register", "--table", "user",
        "--table-path", user_parquet, "--column", column,
        "--policy", policy, "--producer", PRODUCER, "--state", "{}",
    )


def test_register_and_retrieve(capsys, reg_path, user_parquet):
    rc, out = register(capsys, reg_path, user_parquet)
    assert rc == 0
    assert (
        out.strip()
        == f"Freshness policy: {POLICY} and producer: {PRODUCER} "
        "attached to column: info:name in table: user"
    )
    # registry persisted as JSON → a second process sees the record
    assert json.loads(open(reg_path).read())[0]["column"] == "info:name"

    rc, out = run(capsys, "--registry", reg_path, "retrieve",
                  "--table", "user", "--column", "info:name")
    assert rc == 0
    assert f"Freshness policy class: {POLICY}" in out
    assert f"Producer class: {PRODUCER}" in out


def test_register_invalid_column_fails(capsys, reg_path, user_parquet):
    rc, out = register(capsys, reg_path, user_parquet, column="info:nosuch")
    assert rc == 1
    assert "NO_QUALIFIED_COLUMN_IN_TABLE" in out
    assert "does not contain specified column: info:nosuch" in out


def test_register_bad_class_name_fails(capsys, reg_path, user_parquet):
    rc, out = register(capsys, reg_path, user_parquet, policy="not a class!!")
    assert rc == 1
    assert "BAD_POLICY_NAME" in out


def test_double_attachment_fails(capsys, reg_path, user_parquet):
    register(capsys, reg_path, user_parquet)
    rc, out = register(capsys, reg_path, user_parquet)
    assert rc == 1
    assert "FRESHENER_ALREADY_ATTACHED" in out


def test_map_family_attachment(capsys, reg_path, user_parquet):
    rc, out = register(capsys, reg_path, user_parquet, column="networks")
    assert rc == 0
    # qualified attachment within an attached map family is rejected
    rc, out = register(capsys, reg_path, user_parquet, column="networks:n1")
    assert rc == 1
    assert "FRESHENER_ALREADY_ATTACHED" in out


def test_unregister(capsys, reg_path, user_parquet):
    register(capsys, reg_path, user_parquet)
    rc, out = run(capsys, "--registry", reg_path, "unregister",
                  "--table", "user", "--column", "info:name")
    assert rc == 0
    assert out.strip() == "Freshness policy removed from column: info:name in table: user"
    rc, out = run(capsys, "--registry", reg_path, "unregister",
                  "--table", "user", "--column", "info:name")
    assert rc == 1
    assert "There is no freshness policy attached" in out


def test_retrieve_all_and_unregister_all(capsys, reg_path, user_parquet):
    register(capsys, reg_path, user_parquet, column="info:name")
    register(capsys, reg_path, user_parquet, column="info:email")
    rc, out = run(capsys, "--registry", reg_path, "retrieve-all", "--table", "user")
    assert rc == 0
    assert out.count("Column:") == 2
    rc, out = run(capsys, "--registry", reg_path, "unregister-all", "--table", "user")
    assert rc == 0
    assert "Removed 2 freshness policies" in out


def test_validate_modes(capsys, reg_path, user_parquet, tmp_path):
    register(capsys, reg_path, user_parquet)
    rc, out = run(capsys, "--registry", reg_path, "validate", "--table", "user",
                  "--table-path", user_parquet, "--column", "info:name")
    assert rc == 0
    assert out.strip() == "Column: info:name valid"

    # layout change (family dropped) → stored record now invalid
    shrunk = pa.table({"entity_id": pa.array(["a"])})
    shrunk_path = tmp_path / "user2.parquet"
    pq.write_table(shrunk, shrunk_path)
    rc, out = run(capsys, "--registry", reg_path, "validate-all", "--table", "user",
                  "--table-path", str(shrunk_path))
    assert rc == 1
    assert "Column: info:name INVALID" in out
    assert "NO_FAMILY_IN_TABLE" in out
