"""Probe the statelog bucketing lever (VERDICT r10 item 3): per-batch
cost of the streaming dedup index in the regime where the INDEX terms
dominate — a ~10⁶-doc indexed corpus probed by small steady-state
batches (trickle ingestion, the production steady state).

Corpus: /tmp/sf10 documents (500k) replicated with per-token salting
(every token prefixed "r<k>", so replicas share NO shingles with the
original — duplicate structure scales linearly, never across replicas).
Build: 8 equal chunks stream in (fanin 8 → the bases compact right as
the build ends). Steady state: 4 chunks of ~1250 fresh salted sf0.1
docs each probe the full index.

Variants: OLD = corpus.py from a git ref (pre-lever: raw probe join
shuffles the whole band log per batch; verify scans + shuffles the
whole hs-carrying sig log twice per batch), NEW = working tree
(broadcast semi prunes + dk-partitioned sigs base with candidate-bucket
pruning). Each variant builds its own state (the sigs schema differs).

Also prints a component attribution measured on the final NEW state:
the old-form and new-form probe/verify expressions executed against the
same 10⁶-doc index with a representative 1250-doc batch.

Usage: python tools/probe_statelog_bucketing.py [old_ref] [n_reps]
"""

from __future__ import annotations

import importlib.util
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPO = "/root/repo"
CORPUS_REL = "adv_big_data_indexing_spark/streaming/corpus.py"


def load_corpus_module(tag: str, ref: str | None):
    if ref is None:
        from adv_big_data_indexing_spark.streaming import corpus

        return corpus
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{ref}:{CORPUS_REL}"],
        check=True, capture_output=True, text=True,
    ).stdout
    spec = importlib.util.spec_from_loader(f"corpus_{tag}", loader=None)
    mod = importlib.util.module_from_spec(spec)
    mod.__file__ = f"<{tag}:{CORPUS_REL}>"
    sys.modules[f"corpus_{tag}"] = mod
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod


def salted(df, k: int, id_off: int):
    """Replica with every token prefixed r<k> — zero shared shingles."""
    return df.select(
        (F.col("doc_id") + id_off).alias("doc_id"),
        F.concat(
            F.lit(f"r{k} "), F.regexp_replace("text", r"(\S+)", f"r{k}$1")
        ).alias("text"),
    )


def main() -> None:
    old_ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = sys.argv[3] if len(sys.argv) > 3 else None  # "old"/"new"

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="statelog_bucket_probe_")
    big = spark.read.parquet("/tmp/sf10/documents.parquet").select(
        "doc_id", "text"
    )
    reps = [big if k == 0 else salted(big, k, k * 10**7) for k in range(n_reps)]
    docs = reps[0]
    for r in reps[1:]:
        docs = docs.unionByName(r)
    n_docs = docs.count()

    steady_src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    # fresh docs (salted, no index collisions) + 200 UNSALTED sf10 docs
    # under new ids — dup-of-indexed probes, so the verify really pulls
    # indexed sig rows across buckets every steady batch
    steady = salted(steady_src, 99, 9 * 10**7).unionByName(
        big.orderBy("doc_id").limit(200).select(
            (F.col("doc_id") + 8 * 10**7).alias("doc_id"), "text"
        )
    )

    src = f"{work}/src"
    n_build = 8
    for c in range(n_build):
        # coalesce: one FILE per chunk, or maxFilesPerTrigger=1 turns
        # every part file into its own micro-batch
        docs.filter(F.col("doc_id") % n_build == c).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    n_steady = 4
    for c in range(n_steady):
        steady.filter(F.col("doc_id") % n_steady == c).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    print(f"index_docs={n_docs} steady_docs={steady.count()} chunks={n_build}+{n_steady}")

    results = {}
    for tag, ref in (("old", old_ref), ("new", None)):
        if only and tag != only:
            continue
        mod = load_corpus_module(tag, ref)
        state = f"{work}/state_{tag}"
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        q = mod.run_streaming_dedup_index(
            stream, state, f"{work}/ck_{tag}", compact_fanin=n_build
        )
        q.awaitTermination(7200)
        total = time.time() - t0
        durs = [
            p["batchDuration"] / 1000.0
            for p in (q.recentProgress or [])
            if p.get("numInputRows", 0) > 0
        ]
        build, tail = durs[:n_build], durs[n_build:]
        results[tag] = (total, build, tail, state, mod)
        print(
            f"{tag}: total={total:.1f}s build=[{', '.join(f'{d:.1f}' for d in build)}]"
            f" steady=[{', '.join(f'{d:.2f}' for d in tail)}]"
        )

    # sanity: identical accumulated pair sets (count + value hash)
    def digest(mod, state):
        row = (
            mod.streaming_dedup_pairs(spark, state)
            .select(
                F.count("*").alias("n"),
                F.sum(
                    F.xxhash64(
                        "doc_a", "doc_b", "n_inter", F.format_number("jaccard", 17)
                    ).cast("decimal(38,0)")
                ).alias("h"),
            )
            .collect()[0]
        )
        return row.n, row.h

    if "old" in results and "new" in results:
        d_old = digest(results["old"][4], results["old"][3])
        d_new = digest(results["new"][4], results["new"][3])
        print(f"pairs old={d_old[0]} new={d_new[0]} identical={d_old == d_new}")
    else:
        tag = next(iter(results))
        print(f"pairs {tag}={digest(results[tag][4], results[tag][3])[0]}")

    # component attribution: the SAME representative batch's semi-pruned
    # probe and pruned verify, each form run against ITS OWN variant's
    # 10⁶-doc logs — so old-vs-new isolates the layout terms (r12: bk64
    # bands schema + sorted compaction) at identical index content.
    from adv_big_data_indexing_spark.operators.dedup import _banded, shingles_of
    from adv_big_data_indexing_spark.streaming import statelog

    batch = steady.filter(F.col("doc_id") % n_steady == 0)
    banded, _ = _banded(shingles_of(batch))
    from pyspark import StorageLevel

    banded = banded.persist(StorageLevel.DISK_ONLY)
    banded.count()

    def timed(label, fn):
        t = time.time()
        n = fn()
        print(f"  {label:55s} {time.time() - t:7.2f}s  (rows={n})")

    print("component attribution (1250-doc batch vs the 10^6-doc index):")
    for tag, (_t, _b, _s, state, mod) in results.items():
        bands_schema = mod._BANDS_SCHEMA
        bk64 = "bk bigint" in bands_schema
        key = "bk" if bk64 else "band_key"
        if not bk64:
            # r13: _banded emits bk directly (no band_key column), so a
            # string-keyed (pre-r12) variant can no longer be probed
            # with the current tree's batch expressions — the r12 A/B is
            # on record in BASELINE.md.
            print(f"  [{tag}] string-keyed bands layout: skipping (pre-r12)")
            continue
        bands_new = banded.select("doc_id", "band", "bk")
        full_bands = statelog.read_set_log(
            spark, f"{state}/bands", bands_schema
        )
        keys = bands_new.select("band", key).distinct()
        timed(f"bands probe [{tag}]: semi prune + join ({key})", lambda fb=full_bands, bn=bands_new, ks=keys, k=key: (
            bn.alias("n")
            .join(
                fb.join(F.broadcast(ks), ["band", k], "left_semi").alias("e"),
                (F.col("n.band") == F.col("e.band"))
                & (F.col(f"n.{k}") == F.col(f"e.{k}"))
                & (F.col("n.doc_id") != F.col("e.doc_id")),
            )
            .count()
        ))
        full_sigs = statelog.read_set_log(
            spark, f"{state}/sigs", mod._SIGS_SCHEMA
        )
        some_ids = banded.filter(F.col("band") == 0).select("doc_id").limit(200)
        bks = [
            r[0]
            for r in some_ids.select(mod._dk(F.col("doc_id")).alias("dk"))
            .distinct()
            .collect()
        ]
        timed(f"sigs verify [{tag}]: {len(bks)}-bucket prune + semi", lambda fs=full_sigs, si=some_ids, b=bks: (
            fs.filter(F.col("dk").isin(b))
            .join(F.broadcast(si), "doc_id", "left_semi")
            .dropDuplicates(["doc_id"])
            .count()
        ))
        # layout context: bytes actually on disk under each base
        for log in ("bands", "sigs"):
            nbytes = sum(
                f.stat().st_size
                for f in Path(f"{state}/{log}").rglob("*.parquet")
            )
            print(f"  {tag} {log} log on disk: {nbytes / 1e6:.1f} MB")
    banded.unpersist()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
