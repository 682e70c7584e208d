"""S10 persistent-catalog parity: tables registered in one session are
visible to a FRESH session — the reference's crawler-populated Glue
catalog outlives any single job (ddk_app/custom/historical.py:312-353),
so the engine's catalog must too.

Embedded Derby allows one JVM at a time, so each session runs in its own
subprocess; the test asserts the second process sees the first one's
external table (with partitions) through nothing but the shared
warehouse/metastore directories.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, **env_extra: str) -> str:
    env = dict(os.environ, PYTHONPATH=REPO, **env_extra)
    proc = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True,
        text=True,
        env=env,
        cwd="/tmp",  # not the repo: catch any cwd-relative path assumptions
        timeout=240,
    )
    assert proc.returncode == 0, f"subprocess failed:\n{proc.stdout}\n{proc.stderr}"
    return proc.stdout


def test_catalog_survives_session_restart(tmp_path):
    wh = str(tmp_path / "warehouse")
    ms = str(tmp_path / "metastore_db")
    data = str(tmp_path / "stage_data")

    out1 = _run(
        f"""
        import os
        from bigdatapipelne_spark.sources.catalog import (
            persistent_session, register_parquet_table)
        spark = persistent_session("writer", {wh!r}, {ms!r})
        df = spark.range(100).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS estado")
        df.write.mode("overwrite").partitionBy("estado").parquet({data!r})
        register_parquet_table(spark, {data!r}, "stage_cards",
                               partitioned_by=["estado"])
        print("WRITER_COUNT", spark.sql(
            "SELECT COUNT(*) c FROM stage_cards").collect()[0].c)
        spark.stop()
        """
    )
    assert "WRITER_COUNT 100" in out1

    out2 = _run(
        f"""
        from bigdatapipelne_spark.sources.catalog import persistent_session
        spark = persistent_session("reader", {wh!r}, {ms!r})
        names = sorted(t.name for t in spark.catalog.listTables())
        print("TABLES", names)
        print("READER_COUNT", spark.sql(
            "SELECT COUNT(*) c FROM stage_cards").collect()[0].c)
        # Partition pruning still works through the restored catalog.
        print("PARTITION_COUNT", spark.sql(
            "SELECT COUNT(*) c FROM stage_cards WHERE estado = '1'"
        ).collect()[0].c)
        spark.stop()
        """
    )
    assert "TABLES ['stage_cards']" in out2
    assert "READER_COUNT 100" in out2
    assert "PARTITION_COUNT 33" in out2
