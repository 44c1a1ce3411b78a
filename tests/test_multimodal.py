"""Multimodal plumbing tests: binary payload assembly, Arrow-batched
feature extraction via mapInPandas (stub decode), and the decode
NotImplementedError gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.operators import multimodal as mm
from adv_big_data_indexing_spark.sources.catalog import load_table
from tests.conftest import SF_CORRECTNESS


@pytest.fixture(scope="module")
def assets(spark):
    d = load_table(spark, SF_CORRECTNESS, "documents")
    e = load_table(spark, SF_CORRECTNESS, "embeddings")
    return mm.assemble_assets(d, e)


def test_asset_schema(assets):
    fields = {f.name: f.dataType.simpleString() for f in assets.schema.fields}
    assert fields["payload"] == "binary"
    assert fields["embedding"] == "array<float>"
    assert fields["n_bytes"] == "bigint"


def test_payload_bytes_roundtrip(assets, spark):
    row = assets.orderBy("asset_id").first()
    text = (
        load_table(spark, SF_CORRECTNESS, "documents")
        .filter(F.col("doc_id") == row.asset_id)
        .first()
        .text
    )
    assert bytes(row.payload).decode("utf-8") == text
    assert row.n_bytes == len(text.encode("utf-8"))


def test_extract_features_batched(assets):
    feats = mm.extract_features(assets)
    rows = {r.asset_id: r for r in feats.collect()}
    assert len(rows) == assets.count()
    sample = assets.orderBy("asset_id").first()
    got = rows[sample.asset_id]
    payload = bytes(sample.payload)
    assert got.n_bytes == len(payload)
    assert got.feat_mean_byte == pytest.approx(sum(payload) / len(payload))
    assert got.feat_checksum == sum((i + 1) * v for i, v in enumerate(payload)) % (1 << 31)


def test_decode_media_is_gated(assets):
    with pytest.raises(NotImplementedError):
        mm.decode_media(assets)


def test_frame_sampling_fanout(assets):
    frames = mm.sample_frames(assets, every_n_bytes=64, frame_len=16)
    one = assets.orderBy("asset_id").first()
    got = sorted(
        (r.frame_index, r.frame_ts_ms, len(bytes(r.frame_bytes)))
        for r in frames.filter(F.col("asset_id") == one.asset_id).collect()
    )
    import math

    expected_n = math.ceil(one.n_bytes / 64)
    assert len(got) == expected_n
    assert got[0] == (0, 0, 16)
    assert all(ts == idx * 40 for idx, ts, _ in got)
    # total fan-out: one row per 64-byte stride across every asset
    total = frames.count()
    expected_total = sum(
        math.ceil(r.n_bytes / 64) for r in assets.select("n_bytes").collect()
    )
    assert total == expected_total


def test_resize_metadata_only(assets):
    frames = mm.sample_frames(assets)
    resized = mm.resize_frames(frames, 224, 224)
    r = resized.first()
    assert (r.width, r.height) == (224, 224)
