"""Multimodal columns (north-star set).

Image/audio/video payloads are opaque ``binary`` columns plus typed
metadata. Decode is REAL for the two formats fully specified by public
docs and decodable without external media libraries: binary PPM (P6)
images and RIFF PCM WAV audio — pure-numpy header/chunk parsing +
``np.frombuffer`` inside ``mapInPandas`` (golden-tested in
tests/test_multimodal.py and oracle-verified end-to-end by
``ns_multimodal_decode``). Formats that need PIL/librosa/av would slot
into the same ``decode_media`` dispatch; only the codec bodies are
absent from this container. Frame sampling keeps a deterministic
stand-in decode with the real fan-out plumbing.

At 100 TB the pattern is: binary parquet columns stay columnar and
compressed, decode runs inside ``mapInPandas`` (Arrow-batched, one
Python worker per core, no driver involvement), and metadata predicates
prune before any byte is decoded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from adv_big_data_indexing_spark.contract import query
from adv_big_data_indexing_spark.sources.catalog import load_table

#: Canonical multimodal record schema: payload + typed metadata + vector.
MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feat_mean_byte", T.DoubleType(), True),
        T.StructField("feat_checksum", T.LongType(), True),
    ]
)


def assemble_assets(documents: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Build multimodal asset records: text payload as bytes + embedding."""
    return (
        documents.select(
            F.col("doc_id").alias("asset_id"),
            F.lit("text").alias("modality"),
            F.encode("text", "UTF-8").alias("payload"),
            F.octet_length("text").cast("bigint").alias("n_bytes"),
        )
        .join(
            embeddings.select(F.col("vec_id").alias("asset_id"), "embedding"),
            "asset_id",
            "left",
        )
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Byte stats are vectorized per payload with ``np.frombuffer`` (zero
    copy from the Arrow buffer) — the per-row Python loop only drives
    variable-length dispatch, never the arithmetic.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, mean_byte, checksum = [], [], []
            for b in pdf["payload"]:
                if b is None:
                    n_bytes.append(None)
                    mean_byte.append(None)
                    checksum.append(None)
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n_bytes.append(len(arr))
                if len(arr) == 0:
                    mean_byte.append(None)
                    checksum.append(None)
                    continue
                a64 = arr.astype(np.int64)
                mean_byte.append(float(a64.mean()))
                checksum.append(
                    int((np.arange(1, len(a64) + 1, dtype=np.int64) @ a64) % (1 << 31))
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": pd.array(n_bytes, dtype="Int64"),
                    "feat_mean_byte": pd.array(mean_byte, dtype="Float64"),
                    "feat_checksum": pd.array(checksum, dtype="Int64"),
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Real media decode: pure-numpy PPM (P6) images and PCM WAV audio.
# No external media libraries — these two formats are fully specified by
# public docs (netpbm man pages / RIFF WAVE spec) and decodable with
# header parsing + np.frombuffer, which keeps the decode Arrow-batched
# and vectorized end-to-end.
# ---------------------------------------------------------------------------

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("mean_value", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def decode_ppm(data: bytes):
    """Decode a binary PPM (P6, maxval ≤ 255) to (width, height, HxWx3 uint8).

    Returns None if the payload is not a well-formed P6 image.
    """
    import numpy as np

    if not data.startswith(b"P6"):
        return None
    # header = magic, width, height, maxval separated by whitespace;
    # '#' comments run to end-of-line
    pos, fields = 2, []
    n = len(data)
    while len(fields) < 3 and pos < n:
        c = data[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            while pos < n and data[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isdigit():
            start = pos
            while pos < n and data[pos : pos + 1].isdigit():
                pos += 1
            fields.append(int(data[start:pos]))
        else:
            return None
    if len(fields) < 3 or pos >= n or not data[pos : pos + 1].isspace():
        return None
    pos += 1  # single whitespace after maxval, then raw pixel bytes
    width, height, maxval = fields
    if maxval <= 0 or maxval > 255 or width <= 0 or height <= 0:
        return None
    need = width * height * 3
    raw = data[pos : pos + need]
    if len(raw) < need:
        return None
    pixels = np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3)
    return width, height, pixels


def decode_wav_pcm(data: bytes):
    """Decode a RIFF/WAVE file with 8- or 16-bit integer PCM samples.

    Returns None unless the payload is a well-formed PCM WAV; result is
    (sample_rate, n_channels, samples ndarray [n_frames, n_channels]).
    """
    import numpy as np

    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, n = 12, len(data)
    fmt = None
    frames = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt = int.from_bytes(body[0:2], "little")
            n_channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1 or n_channels == 0 or bits not in (8, 16):
                return None
            fmt = (sample_rate, n_channels, bits)
        elif cid == b"data" and fmt is not None:
            if len(body) < size:
                return None  # declared chunk size exceeds the payload
            sample_rate, n_channels, bits = fmt
            dtype = np.uint8 if bits == 8 else np.dtype("<i2")
            usable = len(body) - len(body) % (n_channels * dtype.itemsize)
            samples = np.frombuffer(body[:usable], dtype=dtype)
            if bits == 8:  # 8-bit WAV is unsigned, centered at 128
                samples = samples.astype(np.int16) - 128
            frames = samples.reshape(-1, n_channels)
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or frames is None:
        return None
    return fmt[0], fmt[1], frames


def decode_media(assets: DataFrame) -> DataFrame:
    """Arrow-batched media decode: P6 PPM images and PCM WAV audio,
    decoded with pure numpy inside ``mapInPandas``; any other payload
    passes through with ``media_kind = NULL``. Geometry/sample stats are
    exact; pixel/sample math is vectorized per asset.

    Scale shape: decode parallelism == scan parallelism (no shuffle,
    no driver involvement); metadata predicates should prune upstream so
    only surviving assets pay the byte decode.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in DECODE_SCHEMA.fields}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                row = dict.fromkeys(out)
                row["asset_id"] = asset_id
                if payload is not None:
                    data = bytes(payload)
                    img = decode_ppm(data)
                    wav = decode_wav_pcm(data) if img is None else None
                    if img is not None:
                        width, height, pixels = img
                        p64 = pixels.astype(np.int64)
                        row.update(
                            media_kind="image/ppm",
                            width=width,
                            height=height,
                            n_samples=int(p64.size),
                            mean_value=float(p64.mean()),
                            rms=float(np.sqrt((p64 * p64).mean())),
                        )
                    elif wav is not None:
                        rate, channels, frames = wav
                        f64 = frames.astype(np.float64)
                        row.update(
                            media_kind="audio/wav",
                            sample_rate=rate,
                            n_channels=channels,
                            n_samples=int(frames.shape[0]),
                            mean_value=float(f64.mean()) if f64.size else None,
                            rms=float(np.sqrt((f64 * f64).mean())) if f64.size else None,
                        )
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "asset_id": pd.array(out["asset_id"], dtype="Int64"),
                    "media_kind": out["media_kind"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "sample_rate": pd.array(out["sample_rate"], dtype="Int32"),
                    "n_channels": pd.array(out["n_channels"], dtype="Int32"),
                    "n_samples": pd.array(out["n_samples"], dtype="Int64"),
                    "mean_value": pd.array(out["mean_value"], dtype="Float64"),
                    "rms": pd.array(out["rms"], dtype="Float64"),
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema=DECODE_SCHEMA)


@query(
    "ns_multimodal_metadata",
    oracle="""
    SELECT d.doc_id AS asset_id,
           'text' AS modality,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
           (e.vec_id IS NOT NULL) AS has_embedding,
           CAST(coalesce(len(e.embedding), 0) AS INTEGER) AS dim
    FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    doc="NS multimodal metadata projection: binary payload size + typed "
    "metadata + embedding presence, no decode. Metadata predicates prune "
    "before payload bytes are ever read (parquet column pruning).",
)
def ns_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    assets = assemble_assets(d, e)
    return assets.select(
        "asset_id",
        "modality",
        "n_bytes",
        F.col("embedding").isNotNull().alias("has_embedding"),
        F.coalesce(F.size("embedding"), F.lit(0)).cast("int").alias("dim"),
    )


# ---------------------------------------------------------------------------
# frame-sampling / resize plumbing (video & image modalities)
# ---------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def sample_frames(assets: DataFrame, every_n_bytes: int = 64, frame_len: int = 16) -> DataFrame:
    """Frame sampling over opaque media payloads via mapInPandas.

    STUB decode (no av/ffmpeg in this container): frames are fixed-size
    byte slices at a regular stride with synthetic 4:3 geometry — a
    deterministic stand-in with the REAL Spark plumbing: one input asset
    row fans out to N frame rows inside the Arrow batch iterator (the
    shape a real decoder produces), schema is typed, and partitioning
    is inherited from the asset table so decode parallelism == scan
    parallelism.
    """
    import pandas as pd  # noqa: PLC0415

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "frame_index", "frame_ts_ms", "frame_bytes", "width", "height")}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                for idx, off in enumerate(range(0, len(data), every_n_bytes)):
                    out["asset_id"].append(asset_id)
                    out["frame_index"].append(idx)
                    out["frame_ts_ms"].append(idx * 40)  # 25 "fps"
                    out["frame_bytes"].append(data[off : off + frame_len])
                    out["width"].append(4)
                    out["height"].append(3)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


def resize_frames(frames: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stub: geometry metadata transforms JVM-side (column ops);
    only the pixel resample itself would live in the decode UDF. Keeping
    metadata transforms out of Python is the pattern — predicates on
    width/height prune before any byte moves to a worker."""
    return frames.withColumn("width", F.lit(target_w)).withColumn("height", F.lit(target_h))


# ---------------------------------------------------------------------------
# End-to-end decode contract query: synthesized payloads, real decoders,
# closed-form oracle.
# ---------------------------------------------------------------------------

_IMG_W, _IMG_H = 4, 3  # 36 pixel bytes
_WAV_N, _WAV_RATE = 16, 8000


def _synth_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic media payloads per doc: even doc_ids get a P6 PPM
    whose byte i is (doc_id*7 + i) % 256; odd doc_ids get a mono 16-bit
    PCM WAV whose sample i is (doc_id*13 + i) % 2001 - 1000."""
    import struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                if doc_id % 2 == 0:
                    body = bytes((doc_id * 7 + i) % 256 for i in range(_IMG_W * _IMG_H * 3))
                    payload = f"P6\n{_IMG_W} {_IMG_H}\n255\n".encode() + body
                else:
                    samples = b"".join(
                        struct.pack("<h", (doc_id * 13 + i) % 2001 - 1000)
                        for i in range(_WAV_N)
                    )
                    fmt = struct.pack("<HHIIHH", 1, 1, _WAV_RATE, _WAV_RATE * 2, 2, 16)
                    chunks = (
                        b"WAVE"
                        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                        + b"data" + struct.pack("<I", len(samples)) + samples
                    )
                    payload = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
                ids.append(doc_id)
                payloads.append(payload)
            yield pd.DataFrame({"asset_id": pd.array(ids, dtype="Int64"), "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        run, schema="asset_id long, payload binary"
    )


@query(
    "ns_multimodal_decode",
    oracle=f"""
    WITH img AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(0, {_IMG_W * _IMG_H * 3 - 1}),
                                          i -> (doc_id * 7 + i) % 256)) AS BIGINT) AS s,
             CAST(list_sum(list_transform(generate_series(0, {_IMG_W * _IMG_H * 3 - 1}),
                                          i -> ((doc_id * 7 + i) % 256) * ((doc_id * 7 + i) % 256))) AS BIGINT) AS ss
      FROM documents WHERE doc_id % 2 = 0
    ),
    wav AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(0, {_WAV_N - 1}),
                                          i -> (doc_id * 13 + i) % 2001 - 1000)) AS BIGINT) AS s,
             CAST(list_sum(list_transform(generate_series(0, {_WAV_N - 1}),
                                          i -> ((doc_id * 13 + i) % 2001 - 1000) * ((doc_id * 13 + i) % 2001 - 1000))) AS BIGINT) AS ss
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT doc_id AS asset_id, 'image/ppm' AS media_kind,
           CAST({_IMG_W} AS INTEGER) AS width, CAST({_IMG_H} AS INTEGER) AS height,
           CAST(NULL AS INTEGER) AS sample_rate, CAST(NULL AS INTEGER) AS n_channels,
           CAST({_IMG_W * _IMG_H * 3} AS BIGINT) AS n_samples,
           CAST(s AS DOUBLE) / {_IMG_W * _IMG_H * 3} AS mean_value,
           sqrt(CAST(ss AS DOUBLE) / {_IMG_W * _IMG_H * 3}) AS rms
    FROM img
    UNION ALL
    SELECT doc_id, 'audio/wav',
           CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST({_WAV_RATE} AS INTEGER), CAST(1 AS INTEGER),
           CAST({_WAV_N} AS BIGINT),
           CAST(s AS DOUBLE) / {_WAV_N},
           sqrt(CAST(ss AS DOUBLE) / {_WAV_N})
    FROM wav
    """,
    doc="NS end-to-end media decode contract: every document gets a "
    "deterministic synthesized payload (even ids: P6 PPM image; odd ids: "
    "16-bit PCM WAV), the REAL pure-numpy decoders parse the actual "
    "bytes (header walk, chunk walk, np.frombuffer), and the oracle "
    "computes the expected geometry and pixel/sample statistics in "
    "closed form from the synthesis formula — a wrong header parse, "
    "stride, endianness, or channel split hash-mismatches immediately. "
    "Decode parallelism == scan parallelism (two chained mapInPandas, "
    "no shuffle).",
)
def ns_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from adv_big_data_indexing_spark.sources.catalog import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return decode_media(_synth_payloads(docs))


# ---------------------------------------------------------------------------
# Real pixel resize (nearest-neighbor) over decoded P6 frames
# ---------------------------------------------------------------------------

RESIZE_W, RESIZE_H = 2, 2

RESIZE_SCHEMA = (
    "asset_id long, width int, height int, n_out_bytes long, "
    "pixel_sum long, checksum long"
)


def resize_ppm(assets: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """REAL nearest-neighbor resize of P6 PPM payloads inside
    ``mapInPandas`` (supersedes the former metadata-only
    ``resize_frames`` stub): decode the actual bytes, index-map the
    pixel grid (``src = dst * src_dim // dst_dim`` — the classic NN
    kernel, pure numpy fancy indexing, no per-pixel Python), and emit
    the resized geometry plus exact integer checksums of the RESIZED
    pixels (position-weighted, so a transposed or off-by-one resample
    cannot cancel out). Non-PPM payloads are skipped. Decode+resize
    parallelism == scan parallelism; no shuffle anywhere.
    """
    import numpy as np  # noqa: PLC0415

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "width", "height", "n_out_bytes", "pixel_sum", "checksum",
            )}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                dec = decode_ppm(bytes(payload))
                if dec is None:
                    continue
                w, h, pixels = dec
                ys = (np.arange(target_h) * h) // target_h
                xs = (np.arange(target_w) * w) // target_w
                resized = pixels[ys][:, xs, :]
                flat = resized.reshape(-1).astype(np.int64)
                out["asset_id"].append(int(asset_id))
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["n_out_bytes"].append(int(flat.size))
                out["pixel_sum"].append(int(flat.sum()))
                out["checksum"].append(int(((np.arange(flat.size) + 1) * flat).sum()))
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(run, schema=RESIZE_SCHEMA)


@query(
    "ns_multimodal_resize",
    oracle=f"""
    WITH grid AS (
      SELECT j, i, c,
             ((j * {RESIZE_W} + i) * 3 + c) AS k,
             (((j * {_IMG_H}) // {RESIZE_H} * {_IMG_W}
               + (i * {_IMG_W}) // {RESIZE_W}) * 3 + c) AS src
      FROM (SELECT unnest(generate_series(0, {RESIZE_H - 1})) AS j)
      CROSS JOIN (SELECT unnest(generate_series(0, {RESIZE_W - 1})) AS i)
      CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS c)
    )
    SELECT d.doc_id AS asset_id,
           CAST({RESIZE_W} AS INTEGER) AS width,
           CAST({RESIZE_H} AS INTEGER) AS height,
           CAST({RESIZE_W * RESIZE_H * 3} AS BIGINT) AS n_out_bytes,
           CAST(sum((d.doc_id * 7 + g.src) % 256) AS BIGINT) AS pixel_sum,
           CAST(sum((g.k + 1) * ((d.doc_id * 7 + g.src) % 256)) AS BIGINT)
             AS checksum
    FROM documents d CROSS JOIN grid g
    WHERE d.doc_id % 2 = 0
    GROUP BY 1
    """,
    doc="NS real pixel resize contract: the synthesized P6 payloads "
    "(even doc ids, byte i = (id*7+i)%256) are DECODED from actual "
    "bytes and nearest-neighbor-resampled 4x3 -> 2x2 by the numpy "
    "index-map kernel; the oracle computes the resized pixels in "
    "closed form from the synthesis formula and the SAME src = "
    "dst*src_dim//dst_dim mapping, with a position-weighted checksum "
    "so a wrong stride/transpose/rounding cannot cancel. This "
    "replaces the round-3 metadata-only resize stub with a real "
    "resample kernel; scale shape unchanged (chained mapInPandas, "
    "zero shuffle).",
)
def ns_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from adv_big_data_indexing_spark.sources.catalog import spread  # noqa: PLC0415

    docs = spread(load_table(spark, sf_dir, "documents"))
    return resize_ppm(_synth_payloads(docs), RESIZE_W, RESIZE_H)
