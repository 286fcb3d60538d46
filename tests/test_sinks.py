"""K1-K5 sinks — mirrors reference io/flush_file_test.go:13-142 (dir
validation table), io/flush_s3.go:63,74 (key layout), io/flush_memory.go
(fetch callback), io/flush.go:13-31 (dispatch; ours errors instead of
nil-panicking on unknown sinks)."""

from __future__ import annotations

import gzip
import json
import os
import stat

import pytest
from pyspark.sql import functions as F

from k8stream_spark.io.ndjson import gzip_bytes, ndjson_bytes, write_single_ndjson
from k8stream_spark.io.sinks import FileSink, MemorySink, S3Sink, make_flusher


def test_ndjson_bytes_one_object_per_line():
    data = ndjson_bytes([{"a": 1}, {"b": "x"}])
    lines = data.decode().splitlines()
    assert [json.loads(l) for l in lines] == [{"a": 1}, {"b": "x"}]
    assert data.endswith(b"\n")  # reference flush.go:49 trailing lineBreak


def test_file_sink_layout(tmp_path):
    sink = FileSink(str(tmp_path))
    path = sink.flush("uid1", 123456789, b"payload\n")
    # reference io/flush_file.go:39: {dir}/{uid}_{ident}.log
    assert path == str(tmp_path / "uid1_123456789.log")
    assert open(path, "rb").read() == b"payload\n"


def test_file_sink_dir_validation(tmp_path):
    with pytest.raises(ValueError, match="does not exist"):
        FileSink(str(tmp_path / "missing"))
    f = tmp_path / "afile"
    f.write_text("x")
    with pytest.raises(ValueError, match="not a directory"):
        FileSink(str(f))
    ro = tmp_path / "ro"
    ro.mkdir()
    ro.chmod(stat.S_IRUSR | stat.S_IXUSR)
    try:
        if os.access(str(ro), os.W_OK):
            pytest.skip("running as root; read-only dir not enforceable")
        with pytest.raises(ValueError, match="not writable"):
            FileSink(str(ro))
    finally:
        ro.chmod(0o755)


def test_memory_sink_stores_and_calls_back():
    seen = {}
    sink = MemorySink(on_fetch=lambda ident, data: seen.update({ident: data}))
    uri = sink.flush("u", 42, b"abc")
    assert uri == "memory://u/42"
    assert sink.batches[42] == b"abc"
    assert seen == {42: b"abc"}


def test_s3_sink_key_layout_and_gzip():
    uploads = {}
    sink = S3Sink("bkt", "pre/fix",
                  uploader=lambda b, k, d: uploads.update({(b, k): d}))
    uri = sink.flush("uid9", 777, b"hello\n")
    # reference io/flush_s3.go:63,74: {prefix}/{uid}/{ident}.log.gz
    assert uri == "s3://bkt/pre/fix/uid9/777.log.gz"
    payload = uploads[("bkt", "pre/fix/uid9/777.log.gz")]
    assert gzip.decompress(payload) == b"hello\n"


def test_s3_sink_without_uploader_errors():
    with pytest.raises(RuntimeError, match="uploader"):
        S3Sink("b", "p").flush("u", 1, b"x")


def test_make_flusher_dispatch(tmp_path):
    assert isinstance(make_flusher({"sink": "file", "dir": str(tmp_path)}), FileSink)
    assert isinstance(make_flusher({"sink": "memory"}), MemorySink)
    assert isinstance(make_flusher({"sink": "s3", "bucket": "b"}), S3Sink)
    with pytest.raises(ValueError, match="unknown sink"):
        make_flusher({"sink": "bogus"})  # reference would nil-panic


def test_gzip_bytes_roundtrip():
    assert gzip.decompress(gzip_bytes(b"x" * 1000)) == b"x" * 1000


def test_write_single_ndjson(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    dest = str(tmp_path / "out" / "batch.log")
    write_single_ndjson(df, dest)
    lines = [json.loads(l) for l in open(dest)]
    assert sorted(lines, key=lambda r: r["id"]) == [
        {"id": 1, "v": "a"}, {"id": 2, "v": "b"}]
    gz = str(tmp_path / "out" / "batch.log.gz")
    write_single_ndjson(df, gz, compress_gzip=True)
    assert len([json.loads(l) for l in gzip.open(gz, "rt")]) == 2


def test_write_sized_json_rolls_files(spark, tmp_path):
    import os

    from k8stream_spark.io.sinks import write_sized_json

    df = spark.createDataFrame(
        [(i, "x" * 1000) for i in range(2000)], "id bigint, payload string"
    ).coalesce(1)
    out = str(tmp_path / "sized")
    # ~1 MB of rows with a tiny target -> must roll multiple files
    per_file = write_sized_json(df, out, target_mb=1, compression=None)
    files = [f for f in os.listdir(out) if f.endswith(".json")]
    assert per_file > 0
    assert len(files) >= 2

    out2 = str(tmp_path / "sized-big")
    write_sized_json(df, out2, target_mb=1024, compression=None)
    files2 = [f for f in os.listdir(out2) if f.endswith(".json")]
    assert len(files2) == 1  # big target, one partition -> one file


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    import hashlib

    from k8stream_spark.io.sinks import write_training_shards

    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (i % 5 + 1))) for i in range(60)],
        "doc_id bigint, text string",
    )
    out = str(tmp_path / "shards")
    mpath = write_training_shards(df, out, n_shards=4)

    # every doc lands in the shard its md5 hash dictates
    back = spark.read.parquet(out)
    assert back.count() == 60
    for r in back.select("doc_id", "shard_id").collect():
        okey = int(
            hashlib.md5(f"shard-v1:{r.doc_id}".encode()).hexdigest()[:8], 16
        )
        assert r.shard_id == okey % 4
    # round-trip preserves the payload
    assert sorted(
        (r.doc_id, r.text) for r in back.select("doc_id", "text").collect()
    ) == sorted((i, " ".join(["w"] * (i % 5 + 1))) for i in range(60))

    # manifest agrees with the physical layout, shard by shard
    manifest = {r.shard_id: r for r in spark.read.parquet(mpath).collect()}
    counts = {
        r.shard_id: r.n for r in back.groupBy("shard_id").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    assert {s: m.n_docs for s, m in manifest.items()} == counts
