"""Streaming corpus maintenance: incremental near-dup detection over a
document stream (SURVEY §2.H × the north-star dedup tier).

``ns_dedup_incremental`` (operators/dedup.py) is the batch shape of
"probe today's crawl against the existing corpus"; this module is the
streaming shape: an LSH band index maintained as APPEND-ONLY SET LOGS,
each arriving micro-batch probed against everything indexed so far,
and the accumulated verified pair set equal to the full-corpus
``ns_dedup_minhash_lsh`` result under ANY chunking of the same
documents (tests/test_streaming_corpus.py).

The state discipline (COVERAGE.md §2.H inventory): append-only SET
state with distinct-at-read — shared, since r10, with the funnel and
log-structured retention twins via ``statelog.read_set_log``.
Indexed facts (a doc's shingle-hash set, its band keys, a verified
pair) are immutable rows of a growing set, so every log supports the
survival frontier's LSM layout (Θ(batch) appends, bounded-fan-in
compaction) with an even weaker merge: duplicate rows from replays or
crash-retries are REMOVED BY ``distinct()`` at read time — set union
is idempotent, so no batch_id guard and no retraction machinery exist
anywhere in the pipeline.

Scale notes (the 100 TB story):
- per-batch work is batch bands × colliding index entries + the
  verify joins, never a corpus re-pair;
- the band-log probe join is keyed on (band, band_key) — at cluster
  scale the base log should be BUCKETED by band_key so the probe
  prunes to colliding buckets instead of scanning the index (the
  bucketed-join discipline tests/test_partitioning.py pins for the
  batch tiers);
- the verify joins prune the sig log to candidate doc_ids;
- bucket-degeneracy boundary: since the r9 route-never-drop change the
  batch tier expands EVERY bucket through the spill-safe self-join, so
  the streaming pair set equals the batch result at any bucket size;
  a degenerate (boilerplate) bucket costs its quadratic pair volume in
  both shapes, and the bucket audit is the signal to re-key it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.streaming import statelog

#: compact a set log's delta batches into its base once this many
#: accumulate (same knob shape as events.SURVIVAL_COMPACT_FANIN).
CORPUS_COMPACT_FANIN = 8

_PAIRS_SCHEMA = "doc_a bigint, doc_b bigint, n_inter bigint, jaccard double"


def _read_set_log(spark, log_dir: str, schema: str):
    """Shared set-log reader — see statelog.read_set_log."""
    return statelog.read_set_log(spark, log_dir, schema)


def _maybe_compact_set_log(
    spark, log_dir: str, schema: str, batch_id: int, fanin: int
) -> None:
    """Fold the delta batches into the base once ``fanin`` accumulate —
    the survival log's protocol with distinct() in place of max()."""
    if statelog.delta_batches(log_dir) >= fanin:
        statelog.compact(
            spark, log_dir, _read_set_log(spark, log_dir, schema), batch_id
        )


def run_streaming_dedup_index(
    docs: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    compact_fanin: int = CORPUS_COMPACT_FANIN,
) -> "StreamingQuery":
    """Maintain the LSH near-dup index over a document stream and emit
    every verified duplicate pair exactly once (up to the distinct-at-
    read view): per micro-batch, shingle + minhash + band the arriving
    docs (the batch tier's own expressions — `_banded`, dedup.py), probe
    the new band rows against the indexed band log AND against each
    other, verify candidates on the carried shingle-hash sets, and
    append (new docs' signatures, band rows, qualifying pairs) to the
    three set logs. A pair is found in whichever batch completes it —
    arrival order and chunking do not matter, so the accumulated pair
    set equals the full-corpus batch operator on the same documents.
    """
    from adv_big_data_indexing_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _banded,
        _with_jaccard,
        shingles_of,
    )

    sigs_log = os.path.join(state_dir, "sigs")
    bands_log = os.path.join(state_dir, "bands")
    pairs_log = os.path.join(state_dir, "pairs")

    def fold(batch: DataFrame, batch_id: int) -> None:
        from pyspark import StorageLevel

        spark = batch.sparkSession
        banded_new, _carry = _banded(shingles_of(batch))
        # reused by the probe join, both verify sides and both appends;
        # persist, NOT localCheckpoint: reuse is all that is needed
        # (_banded is deterministic md5 arithmetic, so a cache-miss
        # recompute cannot diverge), unpersist() actually releases a
        # persisted frame (it is a no-op on a checkpointed one), and
        # DISK_ONLY keeps the batch-sized blocks out of the storage
        # pool (the unroll-starvation class, r9 find #5)
        banded_new = banded_new.persist(StorageLevel.DISK_ONLY)
        # array_sort: hs comes from collect_set, whose element ORDER is
        # nondeterministic — a replayed batch could otherwise append the
        # same doc's set in a different order, a row distinct() cannot
        # collapse, so the sigs log (and its compacted base) would grow
        # duplicate doc_id rows across replays (ADVICE r9). Sorting
        # makes replays byte-identical; every consumer is set-invariant.
        sig_new = banded_new.filter(F.col("band") == 0).select(
            "doc_id", F.array_sort("hs").alias("hs")
        )
        bands_new = banded_new.select("doc_id", "band", "band_key")

        prev_bands = _read_set_log(
            spark, bands_log, "doc_id bigint, band int, band_key string"
        )
        def id_pairs(left, right, strict_lt):
            id_cond = (
                F.col("n.doc_id") < F.col("e.doc_id")
                if strict_lt
                else F.col("n.doc_id") != F.col("e.doc_id")
            )
            return (
                left.alias("n")
                .join(
                    right.alias("e"),
                    (F.col("n.band") == F.col("e.band"))
                    & (F.col("n.band_key") == F.col("e.band_key"))
                    & id_cond,
                )
                .select(
                    F.least("n.doc_id", "e.doc_id").alias("doc_a"),
                    F.greatest("n.doc_id", "e.doc_id").alias("doc_b"),
                )
            )

        cand = (
            id_pairs(bands_new, prev_bands, strict_lt=False)
            .unionByName(id_pairs(bands_new, bands_new, strict_lt=True))
            .distinct()
        )

        all_sigs = (
            _read_set_log(spark, sigs_log, "doc_id bigint, hs array<bigint>")
            .unionByName(sig_new)
            .dropDuplicates(["doc_id"])  # replayed sigs: same SET, any order
        )
        a = all_sigs.select(
            F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")
        )
        b = all_sigs.select(
            F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")
        )
        stats = (
            cand.join(a, "doc_a")
            .join(b, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.size(F.array_intersect("hs_a", "hs_b"))
                .cast("bigint")
                .alias("n_inter"),
                F.size("hs_a").cast("bigint").alias("n_a"),
                F.size("hs_b").cast("bigint").alias("n_b"),
            )
        )
        pairs = (
            _with_jaccard(stats)
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .distinct()
        )

        statelog.append_delta(pairs, pairs_log, batch_id)
        statelog.append_delta(sig_new, sigs_log, batch_id)
        statelog.append_delta(bands_new, bands_log, batch_id)
        for log_dir, schema in (
            (pairs_log, _PAIRS_SCHEMA),
            (sigs_log, "doc_id bigint, hs array<bigint>"),
            (bands_log, "doc_id bigint, band int, band_key string"),
        ):
            _maybe_compact_set_log(spark, log_dir, schema, batch_id, compact_fanin)
        banded_new.unpersist()

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup_pairs(spark, state_dir: str) -> DataFrame:
    """Every verified near-dup pair the index has ever emitted —
    matches ``ns_dedup_minhash_lsh`` on the documents streamed so far
    (column-for-column: doc_a, doc_b, n_inter, jaccard)."""
    return _read_set_log(spark, os.path.join(state_dir, "pairs"), _PAIRS_SCHEMA)
