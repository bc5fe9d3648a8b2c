"""Registry CRUD + the 8-mode validation matrix — mirrors
TestKijiFreshnessManager.java:111-253 (golden failure modes)."""

import pytest
from pyspark.sql.types import MapType, StringType, StructField, StructType

from kiji_scoring_spark import model
from kiji_scoring_spark.registry import (
    FreshenerRegistry,
    FreshnessValidationError,
    TableLayout,
    ValidationFailure,
)

# `user` table layout from FIXTURES.md §2: group family info(name, email),
# map family networks.
USER_LAYOUT = TableLayout(
    StructType(
        [
            StructField("entity_id", StringType()),
            StructField("info_name", model.versions_type(StringType())),
            StructField("info_email", model.versions_type(StringType())),
            StructField("networks", MapType(StringType(), model.versions_type(StringType()))),
        ]
    )
)

POLICY = "kiji_scoring_spark.policies.ShelfLife"
PRODUCER = "kiji_scoring_spark.producers.Producer"


@pytest.fixture
def reg():
    return FreshenerRegistry()


def store_ok(reg, column, **kw):
    reg.store(USER_LAYOUT, "user", column, kw.get("producer", PRODUCER), kw.get("policy", POLICY), "{}")


def failures_of(excinfo):
    return set(excinfo.value.failures)


def test_store_retrieve_remove_roundtrip(reg):
    store_ok(reg, "info:name")
    rec = reg.retrieve("user", "info:name")
    assert rec.freshness_policy_class == POLICY
    assert rec.producer_class == PRODUCER
    assert reg.retrieve_all("user") == {"info:name": rec}
    assert reg.remove("user", "info:name") is True
    assert reg.remove("user", "info:name") is False
    assert reg.retrieve("user", "info:name") is None


def test_remove_all(reg):
    store_ok(reg, "info:name")
    store_ok(reg, "info:email")
    assert reg.remove_all("user") == ["info:email", "info:name"]
    assert reg.retrieve_all("user") == {}


def test_bad_class_names(reg):
    with pytest.raises(FreshnessValidationError) as e:
        reg.store(USER_LAYOUT, "user", "info:name", "bad..producer", "2bad.policy", "")
    assert failures_of(e) == {
        ValidationFailure.BAD_POLICY_NAME,
        ValidationFailure.BAD_PRODUCER_NAME,
    }


def test_no_family_in_table(reg):
    with pytest.raises(FreshnessValidationError) as e:
        store_ok(reg, "missing:col")
    assert ValidationFailure.NO_FAMILY_IN_TABLE in failures_of(e)


def test_no_qualified_column_in_table(reg):
    with pytest.raises(FreshnessValidationError) as e:
        store_ok(reg, "info:nope")
    assert failures_of(e) == {ValidationFailure.NO_QUALIFIED_COLUMN_IN_TABLE}


def test_group_family_attachment_rejected(reg):
    # attaching to 'info' (group-type) without a qualifier is invalid
    with pytest.raises(FreshnessValidationError) as e:
        store_ok(reg, "info")
    assert failures_of(e) == {ValidationFailure.GROUP_TYPE_FAMILY_ATTACHMENT}


def test_double_attachment_same_column(reg):
    store_ok(reg, "info:name")
    with pytest.raises(FreshnessValidationError) as e:
        store_ok(reg, "info:name")
    assert failures_of(e) == {ValidationFailure.FRESHENER_ALREADY_ATTACHED}


def test_map_family_then_qualified_conflict(reg):
    # TestKijiFreshnessManager.java:193-215 semantics: a map family and a
    # qualified column within it may not both carry fresheners
    store_ok(reg, "networks")
    with pytest.raises(FreshnessValidationError) as e:
        store_ok(reg, "networks:qualifier")
    assert failures_of(e) == {ValidationFailure.FRESHENER_ALREADY_ATTACHED}


def test_qualified_then_map_family_conflict(reg):
    store_ok(reg, "networks:qualifier")
    with pytest.raises(FreshnessValidationError) as e:
        store_ok(reg, "networks")
    assert failures_of(e) == {ValidationFailure.FRESHENER_ALREADY_ATTACHED}


def test_producer_output_column_mismatch(reg):
    from kiji_scoring_spark.policies import ShelfLife
    from kiji_scoring_spark.producers import ExpressionProducer

    producer = ExpressionProducer(lambda df: None, output_column="networks")
    with pytest.raises(FreshnessValidationError) as e:
        reg.store(
            USER_LAYOUT, "user", "info:name", PRODUCER, POLICY, "",
            instances=(ShelfLife(10), producer),
        )
    assert ValidationFailure.PRODUCER_OUTPUT_COLUMN_DOES_NOT_MATCH in failures_of(e)


def test_producer_request_cannot_be_fulfilled(reg):
    from kiji_scoring_spark.policies import ShelfLife
    from kiji_scoring_spark.producers import ExpressionProducer

    producer = ExpressionProducer(
        lambda df: None, data_request=["info:ghost"], output_column="info:name"
    )
    with pytest.raises(FreshnessValidationError) as e:
        reg.store(
            USER_LAYOUT, "user", "info:name", PRODUCER, POLICY, "",
            instances=(ShelfLife(10), producer),
        )
    assert ValidationFailure.PRODUCER_REQUEST_CANNOT_BE_FULFILLED in failures_of(e)


def test_persistence_roundtrip(reg, tmp_path):
    path = tmp_path / "fresheners.json"
    r1 = FreshenerRegistry(path)
    r1.store(USER_LAYOUT, "user", "info:name", PRODUCER, POLICY, '{"shelfLife": 5}')
    r2 = FreshenerRegistry(path)
    rec = r2.retrieve("user", "info:name")
    assert rec.freshness_policy_state == '{"shelfLife": 5}'
