"""Price the SEMANTIC sigs-log reduction before building it (VERDICT
r12 item 7): the r12 codec experiment showed encoding is done (~15%
left), so the remaining lever on the sigs log is carrying FEWER shingle
hashes per doc — a bottom-k (k-min) sketch of the doc's shingle-hash
set instead of the full set.

What that changes: the per-batch verify is EXACT overlap —
|A∩B| / (|A|+|B|-|A∩B|) over the full 48-bit-hash sets, and the
streaming pair set is contract-equal (bit-identical) to the batch
ns_dedup_minhash_lsh result, whose DuckDB oracle enumerates the same
full-set overlaps. A bottom-k sketch turns the verify into the k-min
Jaccard ESTIMATOR est = |X ∩ kmin(A) ∩ kmin(B)| / |X| (X = k smallest
of kmin(A) ∪ kmin(B)) — unbiased, but any candidate pair whose estimate
falls on the other side of the threshold from its exact Jaccard FLIPS
the verify verdict, so the streaming pair set would no longer equal the
batch/oracle pair set.

This probe measures, over the REAL candidate-pair population (the LSH
band collisions at the given SF):
  - the byte arithmetic: the |hs| distribution vs k (what fraction of
    array cells a bottom-k log would drop);
  - the flip count at k = 64 and k = 32: candidates whose est-vs-exact
    threshold verdicts disagree, split into false-keeps (est passes,
    exact fails) and false-drops (est fails, exact passes).

A nonzero flip count = the exactness contract breaks = REJECT (record
the numbers, the way bands-partitioning was rejected in r11).

Usage: python tools/probe_sigs_kmin.py [sf_dir] (default /tmp/sf10)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from adv_big_data_indexing_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _banded,
        shingles_of,
    )
    from adv_big_data_indexing_spark.sources.catalog import load_table

    t0 = time.time()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bands, _ = _banded(shingles_of(docs))

    # per-doc: full sorted set + its bottom-64 prefix (bottom-32 is a
    # further prefix of that)
    per_doc = (
        bands.filter(F.col("band") == 0)
        .select("doc_id", F.array_sort("hs").alias("hs"))
        .withColumn("k64", F.slice("hs", 1, 64))
    )

    # |hs| distribution → the byte arithmetic
    dist = per_doc.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("hs")).alias("cells_full"),
        F.sum(F.least(F.size("hs"), F.lit(64))).alias("cells_k64"),
        F.sum(F.least(F.size("hs"), F.lit(32))).alias("cells_k32"),
        F.avg(F.size("hs")).alias("avg_hs"),
        F.max(F.size("hs")).alias("max_hs"),
        F.sum((F.size("hs") > 64).cast("long")).alias("docs_gt_64"),
        F.sum((F.size("hs") > 32).cast("long")).alias("docs_gt_32"),
    ).collect()[0]
    print(
        f"docs={dist.n_docs} avg|hs|={dist.avg_hs:.1f} max|hs|={dist.max_hs} "
        f"docs>|64|={dist.docs_gt_64} docs>|32|={dist.docs_gt_32}"
    )
    print(
        f"array cells: full={dist.cells_full} k64={dist.cells_k64} "
        f"(x{dist.cells_full / max(1, dist.cells_k64):.2f} reduction) "
        f"k32={dist.cells_k32} (x{dist.cells_full / max(1, dist.cells_k32):.2f})"
    )

    # candidate pairs via the band self-join (row-per-member, spill-safe
    # at any bucket size — same shape as the hot tier of
    # _lsh_pair_stats), deduped to distinct (a, b)
    keyed = bands.select("band", "bk", "doc_id").alias("x")
    cand = (
        keyed.join(
            bands.select("band", "bk", "doc_id").alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bk") == F.col("y.bk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    a = per_doc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hs").alias("hs_a"),
        F.col("k64").alias("ka"),
    )
    b = per_doc.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hs").alias("hs_b"),
        F.col("k64").alias("kb"),
    )
    paired = cand.join(a, "doc_a").join(b, "doc_b")

    def est(ka, kb, k):
        ka_k = F.slice(ka, 1, k)
        kb_k = F.slice(kb, 1, k)
        x = F.slice(F.array_sort(F.array_union(ka_k, kb_k)), 1, k)
        inter = F.array_intersect(x, F.array_intersect(ka_k, kb_k))
        return F.size(inter).cast("double") / F.size(x)

    T = F.lit(JACCARD_THRESHOLD)
    ex = F.size(F.array_intersect("hs_a", "hs_b")).cast("double") / (
        F.size("hs_a") + F.size("hs_b")
        - F.size(F.array_intersect("hs_a", "hs_b"))
    )
    rows = paired.select(
        (ex >= T).alias("exact_pass"),
        (est(F.col("ka"), F.col("kb"), 64) >= T).alias("p64"),
        (est(F.col("ka"), F.col("kb"), 32) >= T).alias("p32"),
    )
    agg = rows.agg(
        F.count(F.lit(1)).alias("n_cand"),
        F.sum(F.col("exact_pass").cast("long")).alias("n_exact"),
        F.sum((F.col("p64") & ~F.col("exact_pass")).cast("long")).alias("fk64"),
        F.sum((~F.col("p64") & F.col("exact_pass")).cast("long")).alias("fd64"),
        F.sum((F.col("p32") & ~F.col("exact_pass")).cast("long")).alias("fk32"),
        F.sum((~F.col("p32") & F.col("exact_pass")).cast("long")).alias("fd32"),
    ).collect()[0]
    print(
        f"candidate pairs={agg.n_cand} exact-pass={agg.n_exact}\n"
        f"k=64: false-keeps={agg.fk64} false-drops={agg.fd64} "
        f"flips={agg.fk64 + agg.fd64}\n"
        f"k=32: false-keeps={agg.fk32} false-drops={agg.fd32} "
        f"flips={agg.fk32 + agg.fd32}"
    )
    verdict64 = "REJECT" if (agg.fk64 + agg.fd64) else "no flips at this SF"
    verdict32 = "REJECT" if (agg.fk32 + agg.fd32) else "no flips at this SF"
    print(f"k=64 verdict: {verdict64}; k=32 verdict: {verdict32}")
    print(f"wall={time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
