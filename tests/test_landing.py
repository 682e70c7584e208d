"""Raw-landing streaming job (S1/S2/S4/S5): stream -> gzip JSON-lines,
Hive-partitioned, with the checkpoint as the landing bookmark."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from bigdatapipelne_spark.sources.io import read_json
from bigdatapipelne_spark.sources.testdata import load_table
from bigdatapipelne_spark.streaming.fraud import read_events_stream
from bigdatapipelne_spark.streaming.landing import extract_partition, land_raw_stream

from .conftest import SF_SMALL


def test_land_raw_stream_gzip_partitioned(spark, tmp_path):
    # Stage the sf0.001 events as a file-stream source.
    src = str(tmp_path / "src")
    ev = load_table(spark, SF_SMALL, "events")
    ev.coalesce(1).write.parquet(src)

    sdf = read_events_stream(spark, src, fmt="parquet")
    out = str(tmp_path / "raw")
    land_raw_stream(
        sdf, out, str(tmp_path / "cp"), partition_by=["event_type"]
    )

    # Hive layout + gzip JSON-lines files.
    parts = sorted(os.path.basename(p) for p in glob.glob(f"{out}/event_type=*"))
    assert parts == [
        "event_type=click", "event_type=error", "event_type=purchase",
        "event_type=signup", "event_type=view",
    ]
    assert glob.glob(f"{out}/event_type=*/**/*.json.gz", recursive=True)

    # Round trip: everything landed exactly once, schema intact.
    back = read_json(spark, out)
    assert back.count() == ev.count()
    orig = ev.agg(F.sum("value")).first()[0]
    landed = back.agg(F.sum("value")).first()[0]
    assert abs(orig - landed) < 1e-6

    # The checkpoint is the landing bookmark: a rerun with no new source
    # files writes nothing new.
    n_files = len(glob.glob(f"{out}/event_type=*/**/*.json.gz", recursive=True))
    sdf2 = read_events_stream(spark, src, fmt="parquet")
    land_raw_stream(sdf2, out, str(tmp_path / "cp"), partition_by=["event_type"])
    assert len(glob.glob(f"{out}/event_type=*/**/*.json.gz", recursive=True)) == n_files


def test_extract_partition_from_nested(spark):
    df = spark.createDataFrame(
        [(1, ("ab", "SP"))], "id long, loc struct<cidade:string, estado:string>"
    )
    out = extract_partition(df, "loc.estado", "estado")
    assert out.first().estado == "SP"
