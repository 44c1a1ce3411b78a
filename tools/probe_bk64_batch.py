"""A/B the batch-LSH bk64 lever (VERDICT r12 item 3): the (band, bk)
exchange in dedup._lsh_pair_stats vs the pre-r13 (band, band_key)
string exchange, measured on ns_dedup_minhash_lsh /
ns_dedup_lsh_pair_recall / ns_dedup_lsh_bucket_audit at a given SF.

Per (variant, query): wall seconds plus the delta in the application's
cumulative shuffle read/write bytes around the timed run (Spark status
REST API — the exchange the lever shrinks is the only data-sized
shuffle in the pipeline), plus a row-count + xxhash64-sum digest of the
result so old-vs-new bit-identity of the pair set is asserted by the
numbers, not claimed.

OLD runs from a git worktree at the pre-port ref (default: the parent
of the port commit), NEW from the working tree; each variant is its own
subprocess/JVM so neither sees the other's warm state. Run variants
back-to-back on a quiet machine (memory r11: a load spike between two
separate probe sittings produced a 1.8x phantom regression).

Usage:
  python tools/probe_bk64_batch.py [sf_dir] [old_ref]
  python tools/probe_bk64_batch.py child <sf_dir>       (internal role)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = "/root/repo"
#: PROBE_QUERIES=a,b (env) restricts the list (the sf10 sitting times
#: only the two VERDICT-named queries); PROBE_WARM=0 skips the warm
#: pass (sf10: minutes-long queries amortize JIT within the run, and
#: both variants are equally cold, so the A/B stays fair).
QUERIES = tuple(
    os.environ.get(
        "PROBE_QUERIES",
        "ns_dedup_minhash_lsh,ns_dedup_lsh_pair_recall,"
        "ns_dedup_lsh_bucket_audit",
    ).split(",")
)


def _shuffle_totals(ui: str) -> tuple[int, int]:
    import urllib.request

    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    sw = sr = 0
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        for st in json.load(r):
            sw += st.get("shuffleWriteBytes", 0)
            sr += st.get("shuffleReadBytes", 0)
    return sw, sr


def child(sf_dir: str) -> None:
    sys.path.insert(0, os.getcwd())  # the variant's own tree
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from adv_big_data_indexing_spark.contract import registry

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    specs = registry()
    for name in QUERIES:
        fn = specs[name].fn
        # digest forces full materialization AND yields the equality
        # witness; run once warm (JIT/page cache), then timed
        def digest():
            df = fn(spark, sf_dir)
            cols = [
                F.format_number(f.name, 17)
                if f.dataType.simpleString() == "double"
                else F.col(f.name)
                for f in df.schema.fields
            ]
            row = df.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
            ).collect()[0]
            return int(row.n), (None if row.h is None else int(row.h))

        if os.environ.get("PROBE_WARM", "1") != "0":
            digest()  # warm
        sw0, sr0 = _shuffle_totals(ui)
        t0 = time.perf_counter()
        n, h = digest()
        sec = time.perf_counter() - t0
        sw1, sr1 = _shuffle_totals(ui)
        print(
            "RESULT "
            + json.dumps(
                {
                    "query": name,
                    "sec": round(sec, 2),
                    "shuffle_write_mb": round((sw1 - sw0) / 2**20, 1),
                    "shuffle_read_mb": round((sr1 - sr0) / 2**20, 1),
                    "rows": n,
                    "hash": h,
                }
            ),
            flush=True,
        )
    spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    old_ref = sys.argv[2] if len(sys.argv) > 2 else "09b9ba2~1"
    wt = f"/tmp/bk64_old_{old_ref.replace('~', '_').replace('/', '_')}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", wt, old_ref],
            check=True,
        )
    results: dict[str, dict[str, dict]] = {}
    try:
        for tag, tree in (("old", wt), ("new", REPO)):
            print(f"== variant {tag} ({tree}) sf_dir={sf_dir} ==", flush=True)
            # always the CONTROLLING repo's copy of this script (the old
            # ref predates it); cwd picks which tree the child imports
            p = subprocess.Popen(
                [sys.executable, str(Path(REPO) / "tools/probe_bk64_batch.py"),
                 "child", sf_dir],
                cwd=tree,
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
            )
            results[tag] = {}
            for line in p.stdout:
                line = line.rstrip()
                if line.startswith("RESULT "):
                    rec = json.loads(line[len("RESULT "):])
                    results[tag][rec["query"]] = rec
                    print(f"  {rec}", flush=True)
            p.wait()
            assert p.returncode == 0, f"{tag} child failed"
    finally:
        subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force", wt],
                       check=False)
    print("\nsummary (old -> new):", flush=True)
    for q in QUERIES:
        o, n = results["old"][q], results["new"][q]
        same = (o["rows"], o["hash"]) == (n["rows"], n["hash"])
        print(
            f"  {q:28s} {o['sec']:7.2f}s -> {n['sec']:7.2f}s   "
            f"shufW {o['shuffle_write_mb']:8.1f} -> {n['shuffle_write_mb']:8.1f} MB  "
            f"identical={same}",
            flush=True,
        )
        assert same, f"{q}: result digests differ between variants"
    print("PAIR SETS BIT-IDENTICAL across variants", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2])
    else:
        main()
