"""Multimodal column plumbing (north-star set).

Image/audio/video payloads are opaque ``binary`` columns plus typed
metadata. The container has no media libraries, so the decode /
feature-extract step is a clearly-marked deterministic STUB — but the
Spark-side plumbing (schema, Arrow batch shape, ``mapInPandas``
signature, partition behavior) is real and tested
(tests/test_multimodal.py).

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

    STUB decode: a real deployment would decode image/audio bytes here
    (PIL/librosa absent from this container); the deterministic fake
    computes mean byte value + a rolling checksum so the batch plumbing
    is end-to-end testable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else None)
            mean_byte = payloads.map(
                lambda b: (sum(b) / len(b)) if b else None
            )
            checksum = payloads.map(
                lambda b: sum((i + 1) * v for i, v in enumerate(b)) % (1 << 31) if b else None
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": n_bytes,
                    "feat_mean_byte": mean_byte,
                    "feat_checksum": checksum,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def decode_media(assets: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Real media decode — requires image/audio libs not in this container."""
    raise NotImplementedError(
        "media decode needs PIL/librosa/av; wire a decoder into extract_features's "
        "mapInPandas body — the Spark plumbing (schema, batching, partitioning) is already here"
    )


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
