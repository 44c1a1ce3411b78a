"""Round-9 scaling probes (VERDICT r8 item 1): the op families the r8
sf10 campaign left unprobed — tokenizer, mining, embeddings, multimodal,
retrieval text stats, sketches, curation packing/chunking/decontam, and
the TPC-H q2/q11/q12 shapes. Four probed families yielded four real
scale bugs in r8 (two JVM OOM, two ENOSPC), so the unprobed half can't
be presumed clean.

Per query: best-of-2 at sf0.1 and sf1, single run at sf10 (the runs are
minutes-long there), full-run timing (build + materialize inside the
clock, the r6 bench convention). A query that REFUSES at a scale (a
routing guard firing) is a PASS for the routing design and is printed
as such. Exponent = log10(t_sf10 / t_sf1) — 1.0 is linear scaling,
< 1 sublinear, > 1.3 is a red flag worth a plan read.

Usage: python tools/measure_r9.py [family ...]   (default: all)
       python tools/measure_r9.py semdedup       (VERDICT item 4 probe)
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PROBES = {
    "tokenizer": ["ns_bpe_train_merges", "ns_bpe_apply_fertility"],
    "mining": ["ns_assoc_rules", "ns_negative_sampling"],
    "embeddings": [
        "ns_embed_pca_power",
        "ns_embed_centroids",
        "ns_embed_outliers",
        "ns_embed_matryoshka",
        "ns_embed_dim_stats",
        "ns_embed_quantize_int8",
    ],
    "multimodal": [
        "ns_multimodal_metadata",
        "ns_multimodal_decode",
        "ns_multimodal_resize",
    ],
    "retrieval": [
        "ns_tfidf_keywords",
        "ns_text_collocations_pmi",
        "ns_phrase_search",
        "ns_bm25_topk",
    ],
    "sketches": ["ext_approx_distinct_portable", "ext_bloom_semijoin"],
    "curation": ["ns_pack_sequences", "ns_doc_chunking", "ns_decontaminate"],
    "tpch": ["ext_tpch_q2_shape", "ext_tpch_q11_shape", "ext_tpch_q12_shape"],
}

SF_DIRS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/tmp/sf1"),
    ("sf10", "/tmp/sf10"),
]


def _mat(df):
    df.write.format("noop").mode("overwrite").save()


def _spark_time(fn, spark, sf_dir: str, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        _mat(fn(spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    return best


def run_family(spark, specs, family: str) -> None:
    print(f"== {family}", flush=True)
    for name in PROBES[family]:
        times: dict[str, float] = {}
        for label, sf_dir in SF_DIRS:
            if not Path(sf_dir).exists():
                print(f"  {name} {label}: MISSING dir, skipped", flush=True)
                continue
            runs = 1 if label == "sf10" else 2
            try:
                times[label] = _spark_time(specs[name].fn, spark, sf_dir, runs)
                print(f"  {name} {label}: {times[label]:.3f}s", flush=True)
            except ValueError as e:
                # a routing/size guard refusing at scale is the designed
                # behavior — report which route it points to
                print(f"  {name} {label}: REFUSED (guard): {e}", flush=True)
            except Exception as e:  # noqa: BLE001 — probe must survive
                print(
                    f"  {name} {label}: FAILED {type(e).__name__}: "
                    f"{str(e).splitlines()[0][:200]}",
                    flush=True,
                )
        if "sf1" in times and "sf10" in times and times["sf1"] > 0:
            exp = math.log10(times["sf10"] / times["sf1"])
            print(f"  {name} exponent sf1->sf10: {exp:.2f}", flush=True)


def make_degenerate_embeddings(spark, out_dir: str, n: int) -> None:
    """VERDICT r8 item 4 fixture: an embeddings table whose k-means
    outcome is ONE dominant cluster (all vectors in a tight ball around
    a single point, a handful of distant outliers) at sf10 density —
    the per-cluster pairwise stage's hot-group case, with 'cluster' as
    the hot group."""
    from pyspark.sql import functions as F

    d = 64
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            # tight ball: component j of vec i = 0.9 + tiny deterministic
            # jitter — every pairwise cosine lands ~1.0, one k-means cell
            f"transform(sequence(0, {d - 1}), j -> CAST("
            "  0.9 + (pmod(hash(id, j), 1000) - 500) / 1000000.0"
            "  AS FLOAT))"
        ).alias("embedding"),
    )
    far = spark.range(8).select(
        (F.col("id") + n).alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {d - 1}), j -> CAST("
            "  CASE WHEN pmod(j, 8) = pmod(id, 8) THEN -5.0 ELSE 0.05 END"
            "  AS FLOAT))"
        ).alias("embedding"),
    )
    base.unionByName(far).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def run_semdedup_probe(spark, specs) -> None:
    """Degenerate-cluster SemDeDup probe: one k-means cluster holds
    ~everything at sf10's embedding count (200k vectors)."""
    import shutil
    import tempfile

    n = 200_000  # sf10 embeddings cardinality
    out_dir = tempfile.mkdtemp(prefix="semdedup_degen_")
    try:
        make_degenerate_embeddings(spark, out_dir, n)
        for name in ("ns_semdedup_kmeans", "ns_semdedup_prune"):
            try:
                t0 = time.perf_counter()
                _mat(specs[name].fn(spark, out_dir))
                print(
                    f"  {name} degenerate-1-cluster n={n}: "
                    f"{time.perf_counter() - t0:.3f}s",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(
                    f"  {name} degenerate-1-cluster n={n}: FAILED "
                    f"{type(e).__name__}: {str(e).splitlines()[0][:200]}",
                    flush=True,
                )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def main() -> None:
    from adv_big_data_indexing_spark.contract import registry
    from adv_big_data_indexing_spark.session import get_spark

    args = sys.argv[1:] or [*PROBES, "semdedup"]
    spark = get_spark("measure-r9")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    specs = registry()
    for family in args:
        if family == "semdedup":
            print("== semdedup degenerate-cluster probe (item 4)", flush=True)
            run_semdedup_probe(spark, specs)
        else:
            run_family(spark, specs, family)


if __name__ == "__main__":
    main()
