"""OP-A11/A12/2.H — the write-behind index pipeline, done right.

Reference architecture: writes land in Redis (authoritative), an index
request is published to RabbitMQ (sendMessage, src/utils/rabbitMq.ts:5-42,
message = {doc, type: insert|update}), a consumer drains the queue into
ES (receiveMessage, :92-115, manual-ack at-least-once + idempotent
upsert-by-_id), while the HTTP writer polls ES every 200 ms until
visible (OP-G7, apiLogicForCRUD.ts:17-58).

Spark-first replacement (SURVEY.md §3.1):
- the queue is a streaming source directory of JSON CDC records
  {key, op, seq, doc} (op ∈ insert|update|delete — delete via queue is
  the reference's unimplemented V2 requirement, README.md:118; shipped
  here),
- the consumer is ONE Structured Streaming job: readStream →
  foreachBatch MERGE into the parquet entity store,
- exactly-once: checkpointed source offsets + an idempotent,
  deterministic merge (max-seq wins per key; replays converge),
- the 200 ms visibility poll disappears — micro-batch commit IS the
  visibility barrier (processAllAvailable ≈ awaiting the queue drain).

Scale: foreachBatch merges by key; with the store bucketed by key the
merge is co-partitioned. The batch dedup (row_number over key) keeps
state out of the streaming engine, so no state-store growth.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

CDC_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("op", T.StringType(), False),  # insert | update | delete
        T.StructField("seq", T.LongType(), False),  # monotone per key
        T.StructField("doc", T.StringType(), True),  # payload JSON (null for delete)
    ]
)


def enqueue(spark: SparkSession, queue_dir: str, records: list[dict]) -> None:
    """OP-A11 producer: append CDC records to the queue directory.

    One JSON file per call ≈ one AMQP publish batch (sendESRequest,
    rabbitMq.ts:5-17). Files are immutable-once-written, which is what
    makes the directory a valid replayable streaming source.
    """
    df = spark.createDataFrame(
        [(r["key"], r["op"], r["seq"], r.get("doc")) for r in records], CDC_SCHEMA
    )
    df.coalesce(1).write.mode("append").json(queue_dir)


def apply_cdc_batch(store_dir: str, batch: DataFrame, batch_id: int) -> None:
    """Idempotent MERGE of one micro-batch into the parquet entity store.

    Replay-safe by construction: (1) within-batch dedup keeps the max
    seq per key; (2) the union with the current store re-resolves by
    seq, so applying the same batch twice is a no-op (the reference
    leans on ES upsert-by-_id for this, rabbitMq.ts:44-48).
    """
    spark = batch.sparkSession
    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    latest = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    try:
        current = spark.read.parquet(store_dir)
        merged = (
            current.unionByName(latest)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    except Exception:  # first batch: store does not exist yet
        merged = latest

    survivors = merged.filter(F.col("op") != "delete")
    # write-then-swap: parquet has no transactional MERGE, so stage the
    # new store and atomically rename (a Delta MERGE on a real deployment).
    tmp = f"{store_dir}__stage_{batch_id}_{uuid.uuid4().hex[:8]}"
    survivors.write.mode("overwrite").parquet(tmp)
    old = f"{store_dir}__old_{batch_id}_{uuid.uuid4().hex[:8]}"
    if os.path.exists(store_dir):
        os.rename(store_dir, old)
    os.rename(tmp, store_dir)
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old, ignore_errors=True)


def run_indexer(
    spark: SparkSession,
    queue_dir: str,
    store_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """OP-A12 consumer: the streaming index-maintenance job."""
    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(queue_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda b, i: apply_cdc_batch(store_dir, b, i)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def drain(query: StreamingQuery, timeout_sec: int = 120) -> None:
    """OP-G7 analog: await queue visibility. The reference polls ES every
    200 ms (apiLogicForCRUD.ts:47-58); here commit == visibility, so
    waiting for the availableNow trigger to finish is the whole story."""
    query.awaitTermination(timeout_sec)


def read_store(spark: SparkSession, store_dir: str) -> DataFrame:
    return spark.read.parquet(store_dir)


# ---------------------------------------------------------------------------
# full document write path as one streaming job (SURVEY §3.1 "Spark shape")
# ---------------------------------------------------------------------------


def run_document_indexer(
    spark: SparkSession,
    queue_dir: str,
    entities_dir: str,
    rejects_dir: str,
    checkpoint_dir: str,
    schema: dict,
    reconstructed_dir: str | None = None,
) -> StreamingQuery:
    """POST /plan, end-to-end, streaming: each micro-batch of CDC records
    carrying raw plan JSON is validated against the registered schema
    (plans/json_schema_compiler), invalid docs are routed to a rejects
    table (the 400 path, with their violation list), valid docs are
    shredded (operators/shred) and their entity fragments merged into
    the store by (id, seq) — replacing the reference's 10-step
    Redis→AMQP→poll→ES choreography (apiLogicForCRUD.ts:82-144) with one
    exactly-once pipeline.
    """
    from adv_big_data_indexing_spark.operators.shred import shred
    from adv_big_data_indexing_spark.plans.json_schema_compiler import validate

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        w = Window.partitionBy("key").orderBy(F.col("seq").desc())
        latest = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        upserts = latest.filter(F.col("op") != "delete")
        v = validate(upserts.select("key", "seq", F.col("doc").alias("raw")), schema)
        bad = v.filter(~F.col("is_valid")).select(
            "key", "seq", "violations", F.col("raw").alias("doc")
        )
        if bad.take(1):
            bad.write.mode("append").parquet(rejects_dir)
        good = v.filter(F.col("is_valid"))
        tables = shred(good.select("doc.*"))
        # entity fragments inherit the CDC seq of their root document
        seq_of = good.select(
            F.concat_ws("_", F.lit("plan"), F.col("doc.objectId")).alias("root_key"),
            "seq",
        )
        edges = tables["edges"]
        root_of = edges.alias("e1").join(
            edges.alias("e2"),
            F.col("e1.parent_id") == F.col("e2.child_id"),
            "left",
        ).select(
            F.col("e1.child_id").alias("id"),
            F.coalesce(F.col("e2.parent_id"), F.col("e1.parent_id"), F.col("e1.child_id")).alias(
                "root_key"
            ),
        )
        fragments = (
            tables["entities"]
            .join(root_of, "id")
            .join(seq_of, "root_key")
            .select("id", "root_key", "seq", "object_type", "payload")
        )
        # deletes remove the whole document closure by root key
        delete_roots = latest.filter(F.col("op") == "delete").select(
            F.col("key").alias("root_key"), "seq"
        )
        try:
            current = spark.read.parquet(entities_dir)
        except Exception:
            current = None
        merged = fragments if current is None else current.unionByName(fragments)
        # last-writer per fragment id by root seq, then drop deleted roots
        w2 = Window.partitionBy("id").orderBy(F.col("seq").desc())
        merged = (
            merged.withColumn("__rn", F.row_number().over(w2))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if delete_roots.take(1):
            kill = delete_roots.select("root_key").distinct()
            merged = merged.join(kill, "root_key", "left_anti")
        tmp = f"{entities_dir}__stage_{batch_id}_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{entities_dir}__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(entities_dir):
            os.rename(entities_dir, old)
        os.rename(tmp, entities_dir)
        if os.path.exists(old):
            import shutil

            shutil.rmtree(old, ignore_errors=True)
        if reconstructed_dir is not None:
            refresh_reconstructed(
                spark, reconstructed_dir, good.select("doc.*"), delete_roots
            )

    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(queue_dir)
    )
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def refresh_reconstructed(
    spark: SparkSession,
    reconstructed_dir: str,
    changed_docs: DataFrame,
    deleted_roots: DataFrame | None,
) -> None:
    """Incremental search-projection maintenance: upsert the reconstructed
    (nested, ETag-stamped) view for CHANGED documents only, drop deleted
    ones. The Spark analog of the reference's ES index being brought up
    to date per queue message — but set-oriented per micro-batch, and
    only touched documents are re-reconstructed, not the corpus.
    """
    from adv_big_data_indexing_spark.operators.reconstruct import reconstruct, with_etag
    from adv_big_data_indexing_spark.operators.shred import shred

    fresh = None
    if changed_docs is not None and changed_docs.take(1):
        fresh = with_etag(reconstruct(shred(changed_docs)))
    try:
        current = spark.read.parquet(reconstructed_dir)
    except Exception:
        current = None

    if current is None:
        merged = fresh
    elif fresh is None:
        merged = current
    else:
        replaced_ids = fresh.select("id")
        merged = current.join(replaced_ids, "id", "left_anti").unionByName(fresh)
    if merged is None:
        return
    if deleted_roots is not None and deleted_roots.take(1):
        kill = deleted_roots.select(F.col("root_key").alias("id")).distinct()
        merged = merged.join(kill, "id", "left_anti")
    tmp = f"{reconstructed_dir}__stage_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{reconstructed_dir}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(reconstructed_dir):
        os.rename(reconstructed_dir, old)
    os.rename(tmp, reconstructed_dir)
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old, ignore_errors=True)
