"""L4: HTTP-shaped serving dispatcher — the API Gateway/Lambda shim over
the keyed serving store (reference: lambda_app/api/function.py:7-48).

The reference handler is a verb-dispatched DynamoDB proxy: GET scans the
table (or runs a key query when ``Key`` is passed), POST puts an item,
PUT updates it, DELETE removes it, and every response is shaped as
``{statusCode, body, headers}`` with 400 for errors. This module
reproduces exactly that contract over the engine's bucket-partitioned
parquet store (operators/serving.py) — key lookups prune to one bucket
directory, puts/deletes touch only the buckets their keys hash into, so
every verb is O(batch), never O(table).

The event shape mirrors API Gateway's Lambda proxy integration:

    {"httpMethod": "GET", "queryStringParameters":
        {"TableName": "alerts", "Key": "42"}}
    {"httpMethod": "POST", "body": '{"TableName": "alerts",
        "Item": {"user_id": 42, ...}}'}
    {"httpMethod": "DELETE", "body": '{"TableName": "alerts",
        "Key": {"user_id": 42}}'}

This is a single-process shim for parity/testing — fronting it with a
real HTTP server is deployment plumbing, not engine semantics.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.serving import (
    BUCKET_COL,
    SERVING_BUCKETS,
    delete_from_store,
    merge_into_store,
)


def respond(err: Exception | None, res=None) -> dict:
    """The reference's response shaping verbatim (function.py:7-14):
    400 + message on error, 200 + JSON body on success."""
    return {
        "statusCode": "400" if err else "200",
        "body": str(err) if err else json.dumps(res),
        "headers": {"Content-Type": "application/json"},
    }


@dataclass(frozen=True)
class TableSpec:
    """One served table: its store directory and partition key column."""

    path: str
    key_col: str
    num_buckets: int = SERVING_BUCKETS


class ServingApi:
    """Verb-dispatched handler over registered serving tables."""

    def __init__(self, spark: SparkSession, tables: dict[str, TableSpec]):
        self.spark = spark
        self.tables = tables

    # -- engine-side operations ------------------------------------------

    def _read(self, spec: TableSpec) -> DataFrame:
        return self.spark.read.parquet(spec.path)

    def _rows(self, df: DataFrame) -> list[dict]:
        # toJSON handles timestamps/decimals; bucket column stays internal
        return [json.loads(s) for s in df.drop(BUCKET_COL).toJSON().collect()]

    def _query(self, spec: TableSpec, key_value) -> dict:
        """GET with Key — DynamoDB Query parity (function.py:38-46): the
        bucket filter uses the same hash expression as the writer, so the
        scan prunes to one partition directory before the key equality."""
        if not os.path.exists(spec.path):
            return {"Items": [], "Count": 0}
        df = self._read(spec)
        key_typed = F.lit(key_value).cast(df.schema[spec.key_col].dataType)
        hit = df.filter(
            (F.col(BUCKET_COL)
             == F.pmod(F.xxhash64(key_typed), F.lit(spec.num_buckets)).cast("int"))
            & (F.col(spec.key_col) == key_typed)
        )
        items = self._rows(hit)
        return {"Items": items, "Count": len(items)}

    def _scan(self, spec: TableSpec) -> dict:
        if not os.path.exists(spec.path):
            return {"Items": [], "Count": 0}
        items = self._rows(self._read(spec))
        return {"Items": items, "Count": len(items)}

    def _put(self, spec: TableSpec, item: dict) -> dict:
        if spec.key_col not in item:
            raise ValueError(f"Item missing key column {spec.key_col!r}")
        if os.path.exists(spec.path):
            schema = self._read(spec).drop(BUCKET_COL).schema
            row = self.spark.createDataFrame(
                [tuple(item.get(f.name) for f in schema.fields)], schema
            )
        else:
            row = self.spark.createDataFrame([item])
        merge_into_store(
            self.spark, spec.path, row, [spec.key_col], spec.num_buckets
        )
        return {}

    def _update(self, spec: TableSpec, key: dict, updates: dict) -> dict:
        """PUT — update_item parity: merge ``updates`` into the existing
        item's attributes (missing attributes survive)."""
        [(kcol, kval)] = key.items()
        if kcol != spec.key_col:
            raise ValueError(f"Key must be {spec.key_col!r}, got {kcol!r}")
        current = self._query(spec, kval)["Items"]
        base = current[0] if current else {}
        base.update(updates)
        base[spec.key_col] = kval
        return self._put(spec, base)

    def _delete(self, spec: TableSpec, key: dict) -> dict:
        [(kcol, kval)] = key.items()
        if kcol != spec.key_col:
            raise ValueError(f"Key must be {spec.key_col!r}, got {kcol!r}")
        df = self._read(spec)
        keys = self.spark.createDataFrame(
            [(kval,)], f"{spec.key_col} {df.schema[spec.key_col].dataType.simpleString()}"
        )
        delete_from_store(
            self.spark, spec.path, keys, [spec.key_col], spec.num_buckets
        )
        return {}

    # -- the handler ------------------------------------------------------

    def handler(self, event: dict, context=None) -> dict:
        """Verb dispatch with the reference's 200/400 shaping."""
        try:
            op = event.get("httpMethod")
            if op == "GET":
                qs = event.get("queryStringParameters") or {}
                spec = self._spec(qs.get("TableName"))
                if "Key" in qs:
                    return respond(None, self._query(spec, qs["Key"]))
                return respond(None, self._scan(spec))
            if op in ("POST", "PUT", "DELETE"):
                payload = json.loads(event.get("body") or "{}")
                spec = self._spec(payload.get("TableName"))
                if op == "POST":
                    return respond(None, self._put(spec, payload["Item"]))
                if op == "PUT":
                    return respond(
                        None,
                        self._update(
                            spec, payload["Key"], payload.get("Updates", {})
                        ),
                    )
                return respond(None, self._delete(spec, payload["Key"]))
            return respond(ValueError(f'Unsupported method "{op}"'))
        except Exception as e:  # the reference 400s every failure
            return respond(e)

    def _spec(self, table: str | None) -> TableSpec:
        if table not in self.tables:
            raise ValueError(f"Unknown TableName {table!r}")
        return self.tables[table]
