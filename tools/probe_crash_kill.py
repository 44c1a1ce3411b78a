"""Crash-kill certification of the statelog twins (VERDICT r10 item 5;
r11 item 5 extends it to the retention-log and survival twins): kill -9
the whole driver process group mid-batch and — deterministically —
inside the TORN-COMPACTION window (base committed, delta reset never
ran) on each statelog twin at sf1, restart from the same checkpoint +
state, drain, and assert exact equality with the batch operator. The
unit tests pin these invariants on synthetic fixtures; this probe
executes the real kill on the real pipelines end-to-end.

Ops: funnel, dedup (the dedup index — re-certified in r12 on the
bk64 + sorted-compaction layout), retention (the log-structured
retention twin), survival (the KM frontier log).

Roles (subprocesses of this same file, each with its own Spark session,
launched in their own process group so SIGKILL takes the JVM down too):

  prep   <op> <work> <sf_dir>     write the source chunks once
  run    <op> <work> <sf_dir> [--torn]   start/resume the stream; with
         --torn, statelog.compact is wrapped to print TORN_WINDOW_OPEN
         and sleep between the base commit and the delta reset — the
         parent kills inside that exact window
  verify <op> <work> <sf_dir>     digest streaming result vs batch op

Parent: for each (op, kill-mode) scenario — prep, run+kill,
run-to-drain, verify. Kill modes: 'mid' (a fixed delay after
STREAM_STARTED, landing mid-batch) and 'torn' (on the marker).

Usage: python tools/probe_crash_kill.py [sf_dir] [mid_delay_funnel]
       [mid_delay_dedup] [--ops=funnel,dedup,retention,survival]
       (NOTE: only the --ops=a,b form is parsed — a space-separated
       value would be taken as a positional arg; retention/survival
       mid-delay defaults to 12 s — their sf1 batches drain faster
       than the funnel's)
"""

from __future__ import annotations

import os
import shutil
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FUNNEL_FANIN = 3
DEDUP_FANIN = 3
N_CHUNKS = 8
ALL_OPS = ("funnel", "dedup", "retention", "survival")


def _spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def role_prep(op: str, work: str, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from adv_big_data_indexing_spark.sources.catalog import load_table

    spark = _spark()
    src = f"{work}/src"
    if os.path.isdir(src):
        print("SRC_EXISTS", flush=True)
        return
    table = "documents" if op == "dedup" else "events"
    df = load_table(spark, sf_dir, table)
    if op == "dedup":
        df = df.select("doc_id", "text")
    key = "doc_id" if op == "dedup" else "event_id"
    for k in range(N_CHUNKS):
        df.filter(F.col(key) % N_CHUNKS == k).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    print(f"PREP_DONE rows={df.count()}", flush=True)


def _torn_wrap():
    """Wrap statelog.compact so the torn window is open and announced."""
    from pyspark.sql import functions as F

    from adv_big_data_indexing_spark.streaming import statelog
    from adv_big_data_indexing_spark.streaming.events import _commit_state

    def torn_compact(
        spark, log_dir, merged, batch_id, partition_by=None, sort_within=None
    ):
        _commit_state(
            merged.withColumn("batch_id", F.lit(batch_id)),
            os.path.join(log_dir, "base"),
            single_file=False,
            partition_by=partition_by,
            sort_within=sort_within,
        )
        print("TORN_WINDOW_OPEN", flush=True)
        time.sleep(15)  # the parent SIGKILLs us inside this window
        shutil.rmtree(statelog._deltas_dir(log_dir), ignore_errors=True)

    statelog.compact = torn_compact


def role_run(op: str, work: str, sf_dir: str, torn: bool) -> None:
    from adv_big_data_indexing_spark.sources.catalog import load_table

    spark = _spark()
    if torn:
        _torn_wrap()
    src, state, ck = f"{work}/src", f"{work}/state", f"{work}/ck"
    if op == "dedup":
        from adv_big_data_indexing_spark.streaming import corpus as sc

        schema = (
            load_table(spark, sf_dir, "documents").select("doc_id", "text").schema
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = sc.run_streaming_dedup_index(
            stream, state, ck, compact_fanin=DEDUP_FANIN
        )
    else:
        from adv_big_data_indexing_spark.streaming import events as ev

        schema = load_table(spark, sf_dir, "events").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        if op == "funnel":
            q = ev.run_streaming_funnel(
                stream, state, ck, delay_sec=10**9, compact_fanin=FUNNEL_FANIN
            )
        elif op == "retention":
            q = ev.run_streaming_retention_log(
                stream, state, ck, compact_fanin=FUNNEL_FANIN
            )
        elif op == "survival":
            q = ev.run_streaming_survival(
                stream, state, ck, compact_fanin=FUNNEL_FANIN
            )
        else:
            raise SystemExit(f"unknown op {op}")
    print("STREAM_STARTED", flush=True)
    q.awaitTermination(3600)
    print("DRAINED", flush=True)


def role_verify(op: str, work: str, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    spark = _spark()
    state = f"{work}/state"
    if op == "funnel":
        from adv_big_data_indexing_spark.operators.timeseries import ts_funnel
        from adv_big_data_indexing_spark.streaming import events as ev

        cols = [
            "user_id", "signup_us", "click_us", "purchase_us",
            "reached_click", "reached_purchase",
        ]
        got, exp = ev.streaming_funnel_result(spark, state), ts_funnel(
            spark, sf_dir
        )
    elif op == "retention":
        from adv_big_data_indexing_spark.operators.timeseries import (
            ts_retention_cohort,
        )
        from adv_big_data_indexing_spark.streaming import events as ev

        cols = ["cohort_day", "day_offset", "active_users"]
        got = ev.streaming_retention_log_result(spark, state)
        exp = ts_retention_cohort(spark, sf_dir)
    elif op == "survival":
        from adv_big_data_indexing_spark.operators.timeseries import (
            ts_survival_km,
        )
        from adv_big_data_indexing_spark.streaming import events as ev

        cols = ["day", "n_risk", "n_churn", "log_s_q4"]
        got = ev.streaming_survival_result(spark, state)
        exp = ts_survival_km(spark, sf_dir)
    else:
        from adv_big_data_indexing_spark.operators.dedup import (
            ns_dedup_minhash_lsh,
        )
        from adv_big_data_indexing_spark.streaming import corpus as sc

        cols = ["doc_a", "doc_b", "n_inter", F.format_number("jaccard", 17)]
        got = sc.streaming_dedup_pairs(spark, state)
        exp = ns_dedup_minhash_lsh(spark, sf_dir)

    def digest(df):
        row = df.select(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return row.n, row.h

    g, e = digest(got), digest(exp)
    print(f"VERIFY rows={g[0]} batch_rows={e[0]} equal={g == e}", flush=True)
    assert g == e, f"{op}: streaming != batch after crash-kill recovery"


def _launch(args):
    return subprocess.Popen(
        [sys.executable, __file__, *args],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,  # killpg reaches the child's JVM too
    )


def _wait_marker(proc, markers, timeout=3600):
    """Read stdout lines until one of markers appears; echo lines."""
    t0 = time.time()
    for line in proc.stdout:
        line = line.rstrip()
        if line:
            print(f"    | {line}", flush=True)
        for m in markers:
            if m in line:
                return m
        if time.time() - t0 > timeout:
            break
    return None


def _killpg(proc):
    try:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    except ProcessLookupError:
        pass
    proc.wait()


def parent(sf_dir: str, mid_delay: dict, ops: tuple[str, ...]) -> None:
    import tempfile

    scenarios = [(op, mode) for op in ops for mode in ("mid", "torn")]
    for op, mode in scenarios:
        work = tempfile.mkdtemp(prefix=f"crashkill_{op}_{mode}_")
        print(f"== {op} / kill-{mode} ==  work={work}", flush=True)
        p = _launch(["prep", op, work, sf_dir])
        assert _wait_marker(p, ["PREP_DONE", "SRC_EXISTS"]) is not None
        p.wait()

        args = ["run", op, work, sf_dir] + (["--torn"] if mode == "torn" else [])
        p = _launch(args)
        if mode == "torn":
            m = _wait_marker(p, ["TORN_WINDOW_OPEN", "DRAINED"])
            assert m == "TORN_WINDOW_OPEN", f"no compaction happened ({m})"
            time.sleep(2)  # firmly inside the window
        else:
            assert _wait_marker(p, ["STREAM_STARTED"]) is not None
            time.sleep(mid_delay[op])
        _killpg(p)
        print(f"  killed -9 ({mode})", flush=True)

        p = _launch(["run", op, work, sf_dir])  # resume, no kill
        m = _wait_marker(p, ["DRAINED"])
        assert m == "DRAINED", "restart did not drain"
        p.wait()

        p = _launch(["verify", op, work, sf_dir])
        m = _wait_marker(p, ["VERIFY"])
        p.wait()
        assert p.returncode == 0, f"{op}/{mode}: verification failed"
        print(f"  {op}/{mode}: recovered exactly (streaming == batch)", flush=True)
        shutil.rmtree(work, ignore_errors=True)
    print("ALL CRASH-KILL SCENARIOS: exact recovery", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("prep", "run", "verify"):
        role, op, work, sf = sys.argv[1:5]
        if role == "prep":
            role_prep(op, work, sf)
        elif role == "run":
            role_run(op, work, sf, torn="--torn" in sys.argv)
        else:
            role_verify(op, work, sf)
    else:
        if "--ops" in sys.argv:
            raise SystemExit("use --ops=a,b (space-separated value not parsed)")
        args = [a for a in sys.argv[1:] if not a.startswith("--ops=")]
        ops = ALL_OPS
        for a in sys.argv[1:]:
            if a.startswith("--ops="):
                ops = tuple(a.split("=", 1)[1].split(","))
        unknown = set(ops) - set(ALL_OPS)
        if unknown:
            raise SystemExit(f"unknown ops {sorted(unknown)}; choose from {ALL_OPS}")
        sf_dir = args[0] if len(args) > 0 else "/tmp/sf1"
        d_funnel = int(args[1]) if len(args) > 1 else 25
        d_dedup = int(args[2]) if len(args) > 2 else 25
        delays = {
            "funnel": d_funnel,
            "dedup": d_dedup,
            "retention": 12,
            "survival": 12,
        }
        parent(sf_dir, delays, ops)
