"""L4 HTTP serving shim (serving_api.py) — verb semantics and 200/400
shaping, parity with lambda_app/api/function.py:7-48."""

from __future__ import annotations

import json
import os

import pytest

from bigdatapipelne_spark.serving_api import ServingApi, TableSpec


@pytest.fixture()
def api(spark, tmp_path):
    path = str(tmp_path / "alerts_store")
    api = ServingApi(spark, {"alerts": TableSpec(path=path, key_col="user_id")})
    # seed three items through the POST verb itself
    for uid, v in ((1, 10.0), (2, 20.0), (3, 30.0)):
        r = api.handler(
            {
                "httpMethod": "POST",
                "body": json.dumps(
                    {"TableName": "alerts",
                     "Item": {"user_id": uid, "value": v, "status": "open"}}
                ),
            }
        )
        assert r["statusCode"] == "200", r["body"]
    return api


def _items(resp):
    assert resp["statusCode"] == "200", resp["body"]
    assert resp["headers"] == {"Content-Type": "application/json"}
    return json.loads(resp["body"])["Items"]


def test_get_scan_returns_all_items(api):
    items = _items(
        api.handler(
            {"httpMethod": "GET",
             "queryStringParameters": {"TableName": "alerts"}}
        )
    )
    assert {i["user_id"] for i in items} == {1, 2, 3}
    assert all("__bucket" not in i for i in items)


def test_get_with_key_is_a_key_query(api):
    items = _items(
        api.handler(
            {"httpMethod": "GET",
             "queryStringParameters": {"TableName": "alerts", "Key": "2"}}
        )
    )
    assert items == [{"user_id": 2, "value": 20.0, "status": "open"}]


def test_post_upserts_last_writer_wins(api):
    api.handler(
        {"httpMethod": "POST",
         "body": json.dumps({"TableName": "alerts",
                             "Item": {"user_id": 2, "value": 99.0,
                                      "status": "closed"}})}
    )
    items = _items(
        api.handler(
            {"httpMethod": "GET",
             "queryStringParameters": {"TableName": "alerts", "Key": "2"}}
        )
    )
    assert items == [{"user_id": 2, "value": 99.0, "status": "closed"}]


def test_put_update_merges_attributes(api):
    """update_item parity: untouched attributes survive the update."""
    r = api.handler(
        {"httpMethod": "PUT",
         "body": json.dumps({"TableName": "alerts",
                             "Key": {"user_id": 3},
                             "Updates": {"status": "ack"}})}
    )
    assert r["statusCode"] == "200"
    items = _items(
        api.handler(
            {"httpMethod": "GET",
             "queryStringParameters": {"TableName": "alerts", "Key": "3"}}
        )
    )
    assert items == [{"user_id": 3, "value": 30.0, "status": "ack"}]


def test_delete_removes_only_that_key(api):
    r = api.handler(
        {"httpMethod": "DELETE",
         "body": json.dumps({"TableName": "alerts", "Key": {"user_id": 1}})}
    )
    assert r["statusCode"] == "200"
    items = _items(
        api.handler(
            {"httpMethod": "GET",
             "queryStringParameters": {"TableName": "alerts"}}
        )
    )
    assert {i["user_id"] for i in items} == {2, 3}


def test_unsupported_method_is_400(api):
    r = api.handler({"httpMethod": "PATCH"})
    assert r["statusCode"] == "400"
    assert "Unsupported method" in r["body"]


def test_unknown_table_is_400(api):
    r = api.handler(
        {"httpMethod": "GET", "queryStringParameters": {"TableName": "nope"}}
    )
    assert r["statusCode"] == "400"
    assert "Unknown TableName" in r["body"]


def test_scan_of_empty_store_is_200_empty(spark, tmp_path):
    api = ServingApi(
        spark, {"empty": TableSpec(path=str(tmp_path / "none"), key_col="k")}
    )
    resp = api.handler(
        {"httpMethod": "GET", "queryStringParameters": {"TableName": "empty"}}
    )
    assert json.loads(resp["body"]) == {"Items": [], "Count": 0}


def test_key_query_prunes_to_one_bucket(api):
    """The GET-with-Key plan reads one partition directory, not the store:
    the physical scan's location list contains only the key's bucket."""
    spec = api.tables["alerts"]
    df = api.spark.read.parquet(spec.path)
    from pyspark.sql import functions as F

    hit = df.filter(
        (F.col("__bucket")
         == F.pmod(F.xxhash64(F.lit(2).cast("bigint")), F.lit(spec.num_buckets)).cast("int"))
    )
    plan = hit._jdf.queryExecution().executedPlan().toString()
    n_dirs = len([d for d in os.listdir(spec.path) if d.startswith("__bucket=")])
    assert n_dirs > 1, "seed should span multiple buckets"
    # partition filter must reach the scan
    assert "PartitionFilters: [" in plan
    assert "__bucket" in plan.split("PartitionFilters", 1)[1][:200]


def test_delete_emptying_a_bucket_removes_its_directory(spark, tmp_path):
    """Dynamic partition overwrite cannot represent an emptied partition
    (no rows -> no partition in the write), so delete_from_store must
    remove the directory explicitly — otherwise the deleted rows silently
    survive. Regression test for that edge: a store with ONE key per
    bucket, delete that key, read back zero rows for it."""
    from bigdatapipelne_spark.operators.serving import (
        delete_from_store,
        merge_into_store,
        read_store,
    )

    path = str(tmp_path / "one_key_store")
    rows = spark.createDataFrame([(i, f"v{i}") for i in range(6)], "k long, v string")
    merge_into_store(spark, path, rows, ["k"], num_buckets=4)
    before = read_store(spark, path).count()
    assert before == 6

    doomed = spark.createDataFrame([(2,)], "k long")
    delete_from_store(spark, path, doomed, ["k"], num_buckets=4)
    after = read_store(spark, path)
    assert after.count() == 5
    assert after.filter("k = 2").count() == 0
    # delete is idempotent, including on a now-possibly-empty bucket
    delete_from_store(spark, path, doomed, ["k"], num_buckets=4)
    assert read_store(spark, path).count() == 5
