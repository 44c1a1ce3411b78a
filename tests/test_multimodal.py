"""Multimodal plumbing tests: binary payload assembly, Arrow-batched
feature extraction via mapInPandas, and golden tests for the pure-numpy
PPM / PCM-WAV media decoders."""

from __future__ import annotations

import struct

import numpy as np
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


def _ppm_bytes(width: int, height: int, pixel_fn) -> bytes:
    header = f"P6\n# golden test image\n{width} {height}\n255\n".encode()
    body = bytes(
        v
        for y in range(height)
        for x in range(width)
        for v in pixel_fn(x, y)
    )
    return header + body


def _wav_bytes(rate: int, channels: int, samples: list[int]) -> bytes:
    body = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def test_decode_ppm_golden():
    img = _ppm_bytes(3, 2, lambda x, y: (x * 10, y * 20, 255 - x))
    got = mm.decode_ppm(img)
    assert got is not None
    w, h, pixels = got
    assert (w, h) == (3, 2)
    assert pixels.shape == (2, 3, 3)
    assert pixels[0, 0].tolist() == [0, 0, 255]
    assert pixels[1, 2].tolist() == [20, 20, 253]
    # malformed payloads refuse, never crash
    assert mm.decode_ppm(b"P6\n3 2\n255") is None  # truncated
    assert mm.decode_ppm(b"JUNK") is None
    assert mm.decode_ppm(img[:10]) is None


def test_decode_wav_golden():
    wav = _wav_bytes(8000, 1, [0, 1000, -1000, 32767, -32768, 0])
    got = mm.decode_wav_pcm(wav)
    assert got is not None
    rate, channels, frames = got
    assert (rate, channels) == (8000, 1)
    assert frames[:, 0].tolist() == [0, 1000, -1000, 32767, -32768, 0]
    stereo = mm.decode_wav_pcm(_wav_bytes(44100, 2, [1, 2, 3, 4]))
    assert stereo[1] == 2 and stereo[2].shape == (2, 2)
    assert mm.decode_wav_pcm(b"RIFFxxxxNOPE") is None
    assert mm.decode_wav_pcm(b"") is None


def test_decode_media_spark_path(spark):
    img = _ppm_bytes(4, 4, lambda x, y: (x, y, (x + y) % 256))
    wav = _wav_bytes(16000, 1, [100, -100, 200, -200])
    rows = [(1, img), (2, wav), (3, b"not media"), (4, None)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r.asset_id: r for r in mm.decode_media(assets).collect()}
    assert got[1].media_kind == "image/ppm"
    assert (got[1].width, got[1].height, got[1].n_samples) == (4, 4, 48)
    px = np.array(
        [[x, y, (x + y) % 256] for y in range(4) for x in range(4)], dtype=np.int64
    )
    assert got[1].mean_value == pytest.approx(px.mean())
    assert got[1].rms == pytest.approx(np.sqrt((px * px).mean()))
    assert got[2].media_kind == "audio/wav"
    assert (got[2].sample_rate, got[2].n_channels, got[2].n_samples) == (16000, 1, 4)
    assert got[2].rms == pytest.approx(np.sqrt((100**2 + 100**2 + 200**2 + 200**2) / 4))
    assert got[3].media_kind is None and got[3].width is None
    assert got[4].media_kind is None


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


def test_resize_ppm_golden(spark):
    """Hand-computed nearest-neighbor resize: a 4x3 P6 image with byte i
    = i resized to 2x2 must pick source pixels (y,x) in
    {0,1}x{0,2} — exact pixel values, sums, and weighted checksum."""
    w, h = 4, 3
    body = bytes(range(w * h * 3))
    payload = f"P6\n{w} {h}\n255\n".encode() + body
    df = spark.createDataFrame([(1, payload)], "asset_id long, payload binary")
    [r] = mm.resize_ppm(df, 2, 2).collect()
    # src index map: ys = [0*3//2, 1*3//2] = [0, 1]; xs = [0, 2]
    expect = []
    for y in (0, 1):
        for x in (0, 2):
            for c in range(3):
                expect.append((y * w + x) * 3 + c)
    assert r.width == 2 and r.height == 2 and r.n_out_bytes == 12
    assert r.pixel_sum == sum(expect)
    assert r.checksum == sum((k + 1) * v for k, v in enumerate(expect))


def test_resize_ppm_skips_non_images(spark):
    df = spark.createDataFrame(
        [(1, b"not an image"), (2, None)], "asset_id long, payload binary"
    )
    assert mm.resize_ppm(df, 2, 2).count() == 0
