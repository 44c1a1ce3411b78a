"""Portable mergeable sketches beyond HLL (which lives in udfs.py):
count-min frequency estimation and a Bloom-filter semi-join reduction.

Both are defined over md5-derived hash functions (public, engine-neutral)
so the DuckDB oracle reproduces every counter and every bit — the same
discipline as the portable HLL sketch (operators/udfs.py) and the
universal-hash minhashes (functions/text.py). The reference has no
sketch surface at all (SURVEY §2.D: its only aggregate is a hit count);
these are north-star scale operators: sketch state is O(1) per group
regardless of corpus size, and both sketches merge associatively, so
they survive any partitioning and any AQE re-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.contract import query
from adv_big_data_indexing_spark.functions.text import token_rows, tokens
from adv_big_data_indexing_spark.sources.catalog import load_table, spread

# --- Count-min sketch ------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 32  # buckets per row (small on purpose: collisions make the
# overestimate property visible at test scale; size w ~ e/eps for real use)
CMS_TOP = 20  # report the sketch estimate for the top-k exact tokens


def _cms_bucket(col, i: int):
    """Bucket in [0, CMS_W) for hash row i: md5 nibble arithmetic, exact
    and identical in both engines (conv stays in whole-stage codegen)."""
    h = F.md5(F.concat_ws(":", F.lit(f"cms{i}"), col))
    return (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % CMS_W).alias(f"b{i}")


def _duck_cms_bucket(sql: str, i: int) -> str:
    h = f"md5('cms{i}:' || {sql})"
    n1 = f"(strpos('0123456789abcdef', substr({h}, 1, 1)) - 1)"
    n2 = f"(strpos('0123456789abcdef', substr({h}, 2, 1)) - 1)"
    return f"CAST(({n1} * 16 + {n2}) % {CMS_W} AS INTEGER)"


@query(
    "ns_sketch_cms_heavy_hitters",
    oracle=f"""
    WITH occ AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
      FROM documents
    ),
    exact AS (SELECT w, count(*) AS exact_count FROM occ GROUP BY w),
    cms AS (
      SELECT ri, b, CAST(sum(exact_count) AS BIGINT) AS cnt
      FROM (
        SELECT exact_count,
               unnest(generate_series(0, {CMS_D - 1})) AS ri,
               unnest([{", ".join(_duck_cms_bucket("w", i) for i in range(CMS_D))}]) AS b
        FROM exact
      ) GROUP BY ri, b
    ),
    top AS (
      SELECT w, exact_count,
             row_number() OVER (ORDER BY exact_count DESC, w) AS rk
      FROM exact QUALIFY rk <= {CMS_TOP}
    )
    SELECT t.w AS token, t.exact_count,
           CAST(min(c.cnt) AS BIGINT) AS cms_estimate
    FROM top t
    CROSS JOIN (SELECT unnest(generate_series(0, {CMS_D - 1})) AS ri) g
    JOIN cms c ON c.ri = g.ri
     AND c.b = CASE g.ri {" ".join(f"WHEN {i} THEN {_duck_cms_bucket('t.w', i)}" for i in range(CMS_D))} END
    GROUP BY t.w, t.exact_count
    """,
    doc=f"NS count-min sketch: {CMS_D}x{CMS_W} counter matrix over md5-derived "
    "buckets; estimate = min over rows, reported next to the exact count for "
    "the top tokens (estimate >= exact always; equality iff no collision). "
    "Counters fold token COUNTS, not occurrences — same result by "
    "commutativity, and the occurrence aggregate is map-side combined. The "
    "sketch state is a constant d*w longs however large the corpus, and "
    "merges by addition — the aggregate a 100 TB frequency pipeline keeps "
    "when the exact vocabulary no longer fits.",
)
def ns_sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    exact = token_rows(d, [], alias="w").groupBy("w").agg(
        F.count("*").alias("exact_count")
    )
    # counter(ri, b) = sum of counts of all tokens hashing to (ri, b)
    cms = (
        exact.select(
            "exact_count",
            F.posexplode(F.array(*[_cms_bucket(F.col("w"), i) for i in range(CMS_D)])).alias(
                "ri", "b"
            ),
        )
        .groupBy("ri", "b")
        .agg(F.sum("exact_count").cast("bigint").alias("cnt"))
    )
    # Top-k pool via ordered take (TakeOrderedAndProject), never a rank
    # window over the full vocabulary: at web scale the distinct-token
    # table is 1e8+ rows, and an unpartitioned row_number would pull all
    # of it through one task. The (exact_count DESC, w) tiebreak makes
    # the take deterministic, so the pool equals the oracle's QUALIFY
    # rk <= CMS_TOP set exactly.
    top = exact.orderBy(F.col("exact_count").desc(), F.col("w")).limit(CMS_TOP)
    probes = top.select(
        F.col("w").alias("token"),
        "exact_count",
        F.posexplode(F.array(*[_cms_bucket(F.col("w"), i) for i in range(CMS_D)])).alias(
            "ri", "b"
        ),
    )
    return (
        probes.join(F.broadcast(cms), ["ri", "b"])
        .groupBy("token", "exact_count")
        .agg(F.min("cnt").alias("cms_estimate"))
    )


# --- Bloom-filter semi-join reduction --------------------------------------

BLOOM_M = 1 << 16  # bits
BLOOM_K = 3  # hash functions
BLOOM_DIM_PRED = 450_000  # orders with o_totalprice > this build the filter


def _and_all(*conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _bloom_pos(col, j: int):
    """Bit position in [0, BLOOM_M): 4 md5 hex chars of a salted key."""
    h = F.md5(F.concat_ws(":", F.lit(f"bf{j}"), col.cast("string")))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % BLOOM_M).cast("int")


def _duck_bloom_pos(sql: str, j: int) -> str:
    h = f"md5('bf{j}:' || CAST({sql} AS VARCHAR))"
    nib = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {p}, 1)) - 1) * {16 ** (4 - p)}"
        for p in range(1, 5)
    )
    return f"CAST(({nib}) % {BLOOM_M} AS INTEGER)"


# 63-bit words: bit 63 is never set, so shiftleft stays in BIGINT
# range in both engines (DuckDB errors on 1<<63)
BLOOM_WORDS = (BLOOM_M + 62) // 63


@query(
    "ext_bloom_semijoin",
    oracle=f"""
    WITH dim AS (
      SELECT o_orderkey FROM orders WHERE o_totalprice > {BLOOM_DIM_PRED}
    ),
    pos AS (
      SELECT unnest([{", ".join(_duck_bloom_pos("o_orderkey", j) for j in range(BLOOM_K))}]) AS p
      FROM dim
    ),
    words AS (
      SELECT p // 63 AS w, bit_or(CAST(1 AS BIGINT) << (p % 63)) AS v
      FROM pos GROUP BY 1
    ),
    bloom AS (
      SELECT list(coalesce(words.v, 0) ORDER BY g.w) AS bits
      FROM (SELECT unnest(generate_series(0, {BLOOM_WORDS - 1})) AS w) g
      LEFT JOIN words ON words.w = g.w
    ),
    probe AS (
      SELECT l.l_returnflag, l.l_orderkey,
             {" AND ".join(f"(b.bits[({_duck_bloom_pos('l.l_orderkey', j)}) // 63 + 1] & (CAST(1 AS BIGINT) << (({_duck_bloom_pos('l.l_orderkey', j)}) % 63))) <> 0" for j in range(BLOOM_K))} AS bloom_pass
      FROM lineitem l CROSS JOIN bloom b
    )
    SELECT p.l_returnflag,
           CAST(count(*) FILTER (WHERE p.bloom_pass) AS BIGINT) AS bloom_pass_rows,
           CAST(count(*) FILTER (WHERE d.o_orderkey IS NOT NULL) AS BIGINT) AS true_match_rows,
           CAST(count(*) FILTER (WHERE p.bloom_pass AND d.o_orderkey IS NULL) AS BIGINT) AS false_positive_rows
    FROM probe p LEFT JOIN dim d ON p.l_orderkey = d.o_orderkey
    GROUP BY p.l_returnflag
    """,
    doc=f"EXT Bloom-filter semi-join reduction: the selective dim side "
    f"(orders above {BLOOM_DIM_PRED}) folds its keys into an m={BLOOM_M}, "
    f"k={BLOOM_K} md5-derived Bloom filter packed into {BLOOM_WORDS} bitmap "
    "longs (~8 KB) that broadcast to the fact scan and drop non-matching "
    "rows BEFORE any shuffle — the runtime-filter technique Spark applies "
    "automatically when stats allow (spark.sql.optimizer.runtime."
    "bloomFilter), made explicit and portable. Probes are O(1): element_at "
    "into the packed array + a bit mask (never array_contains over a "
    "position list — that is a linear scan per row). Output compares "
    "bloom-passing vs true-matching rows per returnflag, so the "
    "false-positive rate is part of the contract (identical in both "
    "engines: same hashes, same bits).",
)
def ext_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dim = o.filter(F.col("o_totalprice") > BLOOM_DIM_PRED).select("o_orderkey")
    pos = dim.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("o_orderkey"), j) for j in range(BLOOM_K)])
        ).alias("p")
    )
    words = pos.groupBy((F.col("p") / 63).cast("int").alias("w")).agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), p % 63)")).alias("v")
    )
    # dense 1024-long bitmap: map lookups happen ONCE here (1024 of them),
    # the per-row probe below is O(1) element_at + mask
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "v"))).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(BLOOM_WORDS - 1)),
            lambda w: F.coalesce(F.element_at(F.col("wm"), w), F.lit(0).cast("bigint")),
        ).alias("bits")
    )

    l = spread(load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_orderkey"))
    probe = (
        l.crossJoin(F.broadcast(bloom))
        .select(
            "l_returnflag",
            "l_orderkey",
            "bits",
            *[_bloom_pos(F.col("l_orderkey"), j).alias(f"p{j}") for j in range(BLOOM_K)],
        )
        .select(
            "l_returnflag",
            "l_orderkey",
            # O(1) probe: packed-word lookup + bit mask, all in codegen
            _and_all(
                *[
                    F.expr(
                        f"(element_at(bits, CAST(p{j} / 63 AS INT) + 1)"
                        f" & shiftleft(CAST(1 AS BIGINT), p{j} % 63)) != 0"
                    )
                    for j in range(BLOOM_K)
                ]
            ).alias("bloom_pass"),
        )
    )
    joined = probe.join(
        dim.withColumnRenamed("o_orderkey", "d_key"),
        probe.l_orderkey == F.col("d_key"),
        "left",
    )
    return joined.groupBy("l_returnflag").agg(
        F.count_if(F.col("bloom_pass")).alias("bloom_pass_rows"),
        F.count_if(F.col("d_key").isNotNull()).alias("true_match_rows"),
        F.count_if(F.col("bloom_pass") & F.col("d_key").isNull()).alias(
            "false_positive_rows"
        ),
    )


@query(
    "ts_cms_event_types",
    oracle=f"""
    SELECT ri, b, CAST(count(*) AS BIGINT) AS cnt
    FROM (
      SELECT unnest(generate_series(0, {CMS_D - 1})) AS ri,
             unnest([{", ".join(_duck_cms_bucket("event_type", i) for i in range(CMS_D))}]) AS b
      FROM events
    ) GROUP BY ri, b
    """,
    doc="EXT batch twin of the streaming count-min maintenance "
    "(streaming/events.py:run_streaming_cms, exactly-once additive "
    "merge verified in test_streaming.py): the full d×w counter "
    "matrix over events.event_type. Identical md5 bucket arithmetic, "
    "one map-side-combined aggregate — the sketch the stream "
    "converges to equals this batch result row for row, which is "
    "what makes the streaming state auditable without re-scanning "
    "history. Driver row here = the oracle gate for the streaming "
    "sketch's bucket/count semantics (VERDICT r3 item 6).",
)
def ts_cms_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.posexplode(
                F.array(*[_cms_bucket(F.col("event_type"), i) for i in range(CMS_D)])
            ).alias("ri", "b")
        )
        .groupBy("ri", "b")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
