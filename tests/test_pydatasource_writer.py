"""Custom Python DataSource WRITER (manifest_jsonl): two-phase commit —
staged part files, atomic manifest publish on success, nothing visible
on failure."""

from __future__ import annotations

import json
import os

import pytest

from pyspark_postgres_loader_spark.sources.pydatasource import (
    ManifestJsonlSinkDataSource,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(ManifestJsonlSinkDataSource)
    return spark


def test_commit_publishes_manifest_and_all_rows(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "out")
    df = spark.range(1000).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS bucket", "CAST(id * 1.5 AS DOUBLE) AS v"
    ).repartition(4)
    df.write.format("manifest_jsonl").mode("append").option("path", out).save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 1000
    assert manifest["columns"] == ["id", "bucket", "v"]
    assert len(manifest["files"]) == 4  # one part per partition
    # manifest names exactly the published files, staging is gone
    rows = []
    for name in manifest["files"]:
        with open(os.path.join(out, name)) as f:
            rows += [json.loads(l) for l in f]
    assert len(rows) == 1000
    assert {r["id"] for r in rows} == set(range(1000))
    assert all(r["v"] == r["id"] * 1.5 for r in rows[:50])
    assert not os.path.exists(os.path.join(out, "_staging"))


def test_failed_write_publishes_nothing(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "out_fail")

    from pyspark.sql import functions as F

    # a UDF that blows up on one partition's data mid-write
    @F.udf("long")
    def poison(x):
        if x == 777:
            raise RuntimeError("poison row")
        return x

    df = spark.range(1000).select(poison("id").alias("id")).repartition(4)
    with pytest.raises(Exception):
        df.write.format("manifest_jsonl").mode("append").option("path", out).save()
    # no manifest, no published part files
    assert not os.path.exists(os.path.join(out, "_MANIFEST.json"))
    published = [
        p for p in (os.listdir(out) if os.path.exists(out) else [])
        if p.endswith(".jsonl")
    ]
    assert published == []


def _stream_to_manifest(spark, src: str, out: str, ckpt: str) -> None:
    stream = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.format("manifest_jsonl")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_writer_publishes_per_batch_manifests(registered, tmp_path):
    spark = registered
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out_s"), str(
        tmp_path / "ckpt"
    )
    import glob
    import shutil

    os.makedirs(src)
    for i in range(3):
        d = str(tmp_path / f"_w{i}")
        spark.range(i * 100, (i + 1) * 100).selectExpr(
            "id", "CAST(id * 2.0 AS DOUBLE) AS v"
        ).coalesce(1).write.parquet(d)
        part = glob.glob(os.path.join(d, "part-*.parquet"))[0]
        dst = os.path.join(src, f"f{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_000_000_000 + i * 100,) * 2)

    _stream_to_manifest(spark, src, out, ckpt)

    manifests = sorted(p for p in os.listdir(out) if p.startswith("_MANIFEST-"))
    assert len(manifests) == 3
    rows = []
    for mf in manifests:
        m = json.load(open(os.path.join(out, mf)))
        bdir = os.path.join(out, f"batch-{m['batch_id']}")
        for fn in m["files"]:
            with open(os.path.join(bdir, fn)) as f:
                rows += [json.loads(l) for l in f]
        assert m["total_rows"] == 100
    assert {r["id"] for r in rows} == set(range(300))
    assert not os.path.exists(os.path.join(out, "_staging"))

    # replaying the finished stream from the same checkpoint publishes
    # nothing new (no new batches, no duplicate rows)
    _stream_to_manifest(spark, src, out, ckpt)
    manifests2 = sorted(p for p in os.listdir(out) if p.startswith("_MANIFEST-"))
    assert manifests2 == manifests
    rows2 = []
    for mf in manifests2:
        m = json.load(open(os.path.join(out, mf)))
        for fn in m["files"]:
            with open(os.path.join(out, f"batch-{m['batch_id']}", fn)) as f:
                rows2 += [json.loads(l) for l in f]
    assert len(rows2) == 300
