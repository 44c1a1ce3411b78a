"""TPC-H query shapes beyond the star-join/top-k ones in relational.py
(q3/q5/q18) and the correlated-quantifier pair in relational.py
(q20/q21): the remaining patterns expressible on the testdata's columns
— EXISTS semi-joins (q4), nation-pair volume matrices (q7), profit
rollups (q9), outer-join distributions (q13), share-of-total (q14),
max-of-aggregate (q15), negative-filtered distinct counts (q16),
correlated scalar aggregates (q17), disjunctive predicate pushdown
(q19), and anti-join + global-average scalar subqueries (q22).

With relational.py's q1/q3/q5/q18/q20/q21 shapes, ALL 22 TPC-H
patterns ship oracle-verified (since r7): q22's phone prefix is
approximated by nationkey, and the three partsupp/shipmode-dependent
shapes (q2, q11, q12) derive their missing inputs — partsupp as the
per-(part, supplier) aggregate of lineitem (min price = supplycost for
q2, price x qty value for q11), shipmode as the l_returnflag
categorical for q12. The testdata lacks partsupp and some lineitem
columns (commit/receiptdate, shipmode, shipinstruct), so each shape
keeps the PATTERN — the join tree, quantifier, and aggregate structure
Catalyst must optimize — with predicates adapted to the available
columns.
Money math is exact throughout: revenue = cents(extendedprice) *
(100 - discount_pct) in integer centi-cents ("c2" columns), summed as
int64, with shares as integer ppm — no float aggregation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.contract import query
from adv_big_data_indexing_spark.operators.advanced import (
    consistent_materialize,
)
from adv_big_data_indexing_spark.functions.exact import DUCK_REV_C2, cents, rev_c2
from adv_big_data_indexing_spark.sources.catalog import load_table

# shared exact centi-cent revenue recipe (functions/exact.py)
_DUCK_REV = DUCK_REV_C2
_rev_c2 = rev_c2


# ---------------------------------------------------------------------------
# Q4: order-priority checking (correlated EXISTS -> semi join)
# ---------------------------------------------------------------------------

Q4_LATE_DAYS = 60


@query(
    "ext_tpch_q4_shape",
    oracle=f"""
    SELECT o.o_orderpriority AS priority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
    )
    GROUP BY 1
    """,
    doc="EXT TPC-H Q4 shape — correlated EXISTS over the fact table: "
    "orders, per priority, having at least one line shipped more than "
    "60 days after the order date (the commit/receipt columns don't "
    "exist in the testdata; ship-vs-order lateness keeps the identical "
    "pattern). Spark compiles the quantifier to ONE left-semi join on "
    "orderkey with the date comparison as a residual condition, then a "
    "partial-agg count — no per-row subquery, no dedup needed (semi "
    "join emits each order once).",
)
def ext_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7: volume shipping between a nation pair, by direction and year
# ---------------------------------------------------------------------------

Q7_NATION_A, Q7_NATION_B = 1, 2


@query(
    "ext_tpch_q7_shape",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(sum({_DUCK_REV}) AS BIGINT) AS revenue_c2
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE (s.s_nationkey = {Q7_NATION_A} AND c.c_nationkey = {Q7_NATION_B})
       OR (s.s_nationkey = {Q7_NATION_B} AND c.c_nationkey = {Q7_NATION_A})
    GROUP BY 1, 2, 3
    """,
    doc="EXT TPC-H Q7 shape — the bidirectional nation-pair trade matrix: "
    "revenue between nations 1 and 2, split by direction and ship year, "
    "in exact centi-cents. The two nation dims and supplier/customer "
    "broadcast; the nation-pair disjunction prunes on the dimension "
    "keys BEFORE the fact join (Catalyst pushes the customer/supplier "
    "nationkey filters through the join), so the big lineitem⋈orders "
    "shuffle carries only matching rows.",
)
def ext_tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = (
        (F.col("s_nationkey") == Q7_NATION_A) & (F.col("c_nationkey") == Q7_NATION_B)
    ) | (
        (F.col("s_nationkey") == Q7_NATION_B) & (F.col("c_nationkey") == Q7_NATION_A)
    )
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation"))
    # join ORDER matters without CBO stats: reduce orders by the
    # selective customer-nation filter FIRST (pair-nation customers are
    # 2/|nations| of the table), then let the shrunken order set drive
    # the fact join — the big lineitem⋈orders shuffle carries only
    # pair-relevant rows instead of filtering after the fact
    c_pair = c.filter(F.col("c_nationkey").isin(Q7_NATION_A, Q7_NATION_B))
    s_pair = s.filter(F.col("s_nationkey").isin(Q7_NATION_A, Q7_NATION_B))
    o_red = o.join(F.broadcast(c_pair), o.o_custkey == c_pair.c_custkey)
    return (
        # no broadcast hint here: at 100 TB the reduced order set may
        # still be huge — AQE's dynamic join selection broadcasts it
        # when the runtime size allows, else keeps the keyed shuffle
        li.join(o_red, li.l_orderkey == o_red.o_orderkey)
        .join(F.broadcast(s_pair), li.l_suppkey == s_pair.s_suppkey)
        .filter(pair)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_rev_c2()).cast("bigint").alias("revenue_c2"))
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (outer join + double aggregate)
# ---------------------------------------------------------------------------


@query(
    "ext_tpch_q13_shape",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1
    )
    GROUP BY 1
    """,
    doc="EXT TPC-H Q13 shape — the customer order-count distribution: a "
    "LEFT join (zero-order customers must appear at c_count = 0) under "
    "a per-customer count, re-aggregated into the histogram. Both "
    "aggregates are map-side partial; the only data-sized shuffle is "
    "the custkey join, and the second aggregate runs on "
    "customer-cardinality rows. The nulls-into-count(col) semantics "
    "(count skips the null orderkey of unmatched rows) are the point "
    "of the pattern.",
)
def ext_tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q14: promotion revenue share (share-of-total in one pass)
# ---------------------------------------------------------------------------

Q14_LO, Q14_HI = "1997-01-01 00:00:00", "1998-01-01 00:00:00"


@query(
    "ext_tpch_q14_shape",
    oracle=f"""
    SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_DUCK_REV} ELSE 0 END)
                AS BIGINT) AS promo_rev_c2,
           CAST(sum({_DUCK_REV}) AS BIGINT) AS total_rev_c2,
           CAST(CAST(1000000 AS HUGEINT)
                * sum(CASE WHEN p.p_type = 'PROMO' THEN {_DUCK_REV}
                      ELSE 0 END)
                // sum({_DUCK_REV}) AS BIGINT) AS promo_ppm
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{Q14_LO}'
      AND l.l_shipdate < TIMESTAMP '{Q14_HI}'
    GROUP BY ALL
    """,
    doc="EXT TPC-H Q14 shape — promotion revenue share for one ship year, "
    "as integer ppm over exact centi-cent revenue (the original's "
    "100*sum/sum double division, made hashable). One broadcast part "
    "join with the date range pushed to the lineitem scan; the "
    "conditional and unconditional sums ride the SAME partial "
    "aggregate, so share-of-total costs one pass.",
)
def ext_tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q14_HI).cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev_c2()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).cast("bigint").alias("promo_rev_c2"),
            F.sum(rev).cast("bigint").alias("total_rev_c2"),
        )
    )
    return agg.select(
        "promo_rev_c2",
        "total_rev_c2",
        # 1e6 * the c2 revenue sum exceeds int64 past ~sf0.03 — the share
        # is computed in 128-bit DECIMAL (DuckDB: HUGEINT), like chi2
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * promo_rev_c2"
            " DIV CAST(total_rev_c2 AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("promo_ppm"),
    )


# ---------------------------------------------------------------------------
# Q15: top supplier (max-of-aggregate, the original's view + subquery)
# ---------------------------------------------------------------------------

Q15_LO, Q15_HI = "1997-01-01 00:00:00", "1997-04-01 00:00:00"


@query(
    "ext_tpch_q15_shape",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum({_DUCK_REV}) AS BIGINT) AS total_rev_c2
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
        AND l_shipdate < TIMESTAMP '{Q15_HI}'
      GROUP BY 1
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS s_name, r.total_rev_c2
    FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_rev_c2 = (SELECT max(total_rev_c2) FROM revenue)
    ORDER BY suppkey
    """,
    doc="EXT TPC-H Q15 shape — the top-revenue supplier via "
    "max-of-aggregate (the original's CREATE VIEW + scalar subquery): "
    "per-supplier quarterly revenue in exact centi-cents, the scalar "
    "max joined back as a one-row broadcast, supplier dim broadcast "
    "onto the winners. The revenue table is computed ONCE "
    "(checkpointed) and feeds both the max and the filter — the "
    "view-reuse the original query text implies.",
)
def ext_tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q15_HI).cast("timestamp_ntz"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_c2()).cast("bigint").alias("total_rev_c2"))
        .transform(consistent_materialize)
    )
    mx = revenue.agg(F.max("total_rev_c2").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev_c2") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(F.col("s_suppkey").alias("suppkey"), "s_name", "total_rev_c2")
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit by nation and year
# ---------------------------------------------------------------------------


@query(
    "ext_tpch_q9_shape",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum({_DUCK_REV}
                    - CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
                      * CAST(floor(l.l_quantity) AS BIGINT) * 100)
                AS BIGINT) AS profit_c2
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
    doc="EXT TPC-H Q9 shape — profit rollup by supplier nation and order "
    "year: revenue minus cost (retail price x quantity standing in for "
    "the absent partsupp supplycost) in exact signed centi-cents. "
    "Part/supplier/nation broadcast; the one big shuffle is "
    "lineitem⋈orders; the group count is |nations|x|years|, so the "
    "aggregate is fully map-side-combined — the classic fact-to-tiny "
    "rollup that survives any scale.",
)
def ext_tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cost = (
        cents("p_retailprice")
        * F.floor("l_quantity").cast("bigint")
        * 100
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(_rev_c2() - cost).cast("bigint").alias("profit_c2"))
    )


# ---------------------------------------------------------------------------
# Q16: supplier diversity per part attribute (negative filters + distinct)
# ---------------------------------------------------------------------------

Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)


@query(
    "ext_tpch_q16_shape",
    oracle=f"""
    WITH edges AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand AS brand, p.p_size AS psize,
           count(DISTINCT e.l_suppkey) AS supplier_cnt
    FROM edges e JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_type <> 'PROMO'
      AND p.p_size IN ({", ".join(str(x) for x in Q16_SIZES)})
      AND e.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2
    """,
    doc="EXT TPC-H Q16 shape — supplier diversity per (brand, size) with "
    "BOTH negative filters: a type exclusion pushed into the broadcast "
    "part dim, and a NOT IN supplier blacklist (negative-balance "
    "suppliers standing in for the complaints LIKE) compiled to a "
    "left-ANTI join — null-safe because s_suppkey is a key. The "
    "distinct supplier count runs on the deduplicated (part, supplier) "
    "edge set, partial-aggregated before the exchange.",
)
def ext_tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(*Q16_SIZES)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    edges = li.select("l_partkey", "l_suppkey").distinct()
    return (
        edges.join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
                   edges.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(bad), edges.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_size").alias("psize"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity revenue (correlated scalar aggregate, division-free)
# ---------------------------------------------------------------------------


@query(
    "ext_tpch_q17_shape",
    oracle=f"""
    WITH stats AS (
      SELECT l_partkey,
             count(*) AS n,
             CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_qc
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_small_lines,
           CAST(sum({_DUCK_REV}) AS BIGINT) AS small_rev_c2
    FROM lineitem l JOIN stats t ON t.l_partkey = l.l_partkey
    WHERE CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT) * 5 * t.n < t.sum_qc
    GROUP BY ALL
    """,
    doc="EXT TPC-H Q17 shape — revenue from small-quantity lines (below "
    "20% of their part's average quantity), the correlated scalar "
    "aggregate pattern, made DIVISION-FREE: qty < 0.2·avg becomes "
    "5·qty·n < Σqty in exact integer centi-quantities, so no float "
    "average ever exists. The per-part (n, Σ) statistics come from ONE "
    "partial-agg pass joined back on partkey — the decorrelation "
    "Catalyst would emit for the subquery, written explicitly.",
)
def ext_tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qc = cents("l_quantity")
    stats = li.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.sum(qc).cast("bigint").alias("sum_qc"),
    )
    small = li.join(stats, "l_partkey").filter(qc * 5 * F.col("n") < F.col("sum_qc"))
    return small.agg(
        F.count("*").cast("bigint").alias("n_small_lines"),
        F.sum(_rev_c2()).cast("bigint").alias("small_rev_c2"),
    )


# ---------------------------------------------------------------------------
# Q19: disjunctive multi-attribute predicate (OR-of-conjuncts pushdown)
# ---------------------------------------------------------------------------

Q19_ARMS = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#34", 1, 15, 20, 30),
)


def _q19_duck_arm(brand: str, s_lo: int, s_hi: int, q_lo: int, q_hi: int) -> str:
    return (
        f"(p.p_brand = '{brand}' AND p.p_size BETWEEN {s_lo} AND {s_hi}"
        f" AND l.l_quantity >= {q_lo} AND l.l_quantity <= {q_hi})"
    )


@query(
    "ext_tpch_q19_shape",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum({_DUCK_REV}) AS BIGINT) AS revenue_c2
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {" OR ".join(_q19_duck_arm(*a) for a in Q19_ARMS)}
    GROUP BY ALL
    """,
    doc="EXT TPC-H Q19 shape — the OR-of-conjuncts predicate spanning "
    "BOTH join sides (brand+size from part, quantity from lineitem): "
    "the optimizer must keep the disjunction as a residual on the "
    "broadcast join while still pushing the derivable per-side "
    "envelopes (brand IN-list to the part scan, quantity range union "
    "to the fact scan). Exact centi-cent revenue; one broadcast join, "
    "one scalar aggregate.",
)
def ext_tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    arm = lambda b, slo, shi, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(slo, shi)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    cond = arm(*Q19_ARMS[0]) | arm(*Q19_ARMS[1]) | arm(*Q19_ARMS[2])
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(_rev_c2()).cast("bigint").alias("revenue_c2"),
        )
    )


# ---------------------------------------------------------------------------
# Q22: dormant high-balance customers (anti join + global-average scalar)
# ---------------------------------------------------------------------------


@query(
    "ext_tpch_q22_shape",
    oracle="""
    WITH pos AS (
      SELECT count(*) AS n_pos,
             CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_pos
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey % 10 AS cntrycode,
           count(*) AS numcust,
           CAST(sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS totacctbal_cents
    FROM customer c CROSS JOIN pos
    WHERE CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) * pos.n_pos
            > pos.sum_pos
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      )
    GROUP BY 1
    """,
    doc="EXT TPC-H Q22 shape — dormant high-value customers: balance "
    "above the global positive-balance average (the scalar subquery, "
    "made exact as bal·n > Σ — no float average) AND no orders at all "
    "(NOT EXISTS -> left-ANTI join on custkey), grouped by country "
    "code (nationkey mod 10 standing in for the phone prefix). The "
    "global (n, Σ) scalar broadcasts; the anti join is the only "
    "data-sized shuffle.",
)
def ext_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.count("*").alias("n_pos"),
        F.sum(cents("c_acctbal")).cast("bigint").alias("sum_pos"),
    )
    rich = (
        c.crossJoin(F.broadcast(pos))
        .filter(cents("c_acctbal") * F.col("n_pos") > F.col("sum_pos"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return rich.groupBy((F.col("c_nationkey") % 10).alias("cntrycode")).agg(
        F.count("*").alias("numcust"),
        F.sum(cents("c_acctbal")).cast("bigint").alias("totacctbal_cents"),
    )


# ---------------------------------------------------------------------------
# Q10: returned-item reporting (who returned the most revenue)
# ---------------------------------------------------------------------------

Q10_LO, Q10_HI = "1997-01-01 00:00:00", "1997-04-01 00:00:00"


@query(
    "ext_tpch_q10_shape",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS c_name, n.n_name AS nation,
           CAST(sum({_DUCK_REV}) AS BIGINT) AS revenue_c2
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{Q10_LO}'
      AND o.o_orderdate < TIMESTAMP '{Q10_HI}'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue_c2 DESC, custkey
    LIMIT 20
    """,
    doc="EXT TPC-H Q10 shape — returned-item reporting: the 20 customers "
    "who returned the most revenue in a quarter, in exact centi-cents "
    "with a fully tie-broken ordered take. The returnflag filter pushes "
    "into the lineitem scan, the quarter filter into orders; the "
    "customer/nation dims broadcast and the top-20 is a "
    "TakeOrderedAndProject — never a global sort of the per-customer "
    "aggregate.",
)
def ext_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_LO).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(Q10_HI).cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(_rev_c2()).cast("bigint").alias("revenue_c2"))
        .orderBy(F.desc("revenue_c2"), "custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q6: forecasting revenue change (pure scan-filter-aggregate)
# ---------------------------------------------------------------------------

Q6_LO, Q6_HI = "1997-01-01 00:00:00", "1998-01-01 00:00:00"


@query(
    "ext_tpch_q6_shape",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS discount_revenue_c3
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_LO}'
      AND l_shipdate < TIMESTAMP '{Q6_HI}'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    GROUP BY ALL
    """,
    doc="EXT TPC-H Q6 shape — the canonical scan-filter-aggregate "
    "(forecast revenue change: price x discount over a year, a "
    "discount band, and small quantities), in exact integer "
    "cent-percent units. EVERY predicate (date range, discount band, "
    "quantity cap) pushes into the parquet scan as a data filter, the "
    "aggregate is a single partial-combined scalar — the query whose "
    "entire cost is I/O at any scale, and the purest test that "
    "pushdown actually happens.",
)
def ext_tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q6_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q6_HI).cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(cents("l_extendedprice") * cents("l_discount"))
        .cast("bigint")
        .alias("discount_revenue_c3"),
    )


# ---------------------------------------------------------------------------
# Q8: national market share (conditional share-of-total by year)
# ---------------------------------------------------------------------------

Q8_NATION = 1
Q8_REGION = 0
Q8_PTYPE = "PROMO"


@query(
    "ext_tpch_q8_shape",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CASE WHEN s.s_nationkey = {Q8_NATION} THEN {_DUCK_REV}
                         ELSE 0 END) AS BIGINT) AS nation_rev_c2,
           CAST(sum({_DUCK_REV}) AS BIGINT) AS total_rev_c2,
           CAST(CAST(1000000 AS HUGEINT)
                * sum(CASE WHEN s.s_nationkey = {Q8_NATION} THEN {_DUCK_REV}
                      ELSE 0 END)
                // sum({_DUCK_REV}) AS BIGINT) AS share_ppm
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE nc.n_regionkey = {Q8_REGION} AND p.p_type = '{Q8_PTYPE}'
    GROUP BY 1
    """,
    doc="EXT TPC-H Q8 shape — national market share: nation 1's slice of "
    "PROMO-part revenue sold into region-0 customers, per order year, "
    "as integer ppm (conditional and total sums in ONE partial "
    "aggregate; the 128-bit share division like Q14/chi2). All five "
    "dimensions broadcast; region and part-type predicates prune "
    "before the fact join; the lineitem⋈orders shuffle is the only "
    "data-sized exchange. Contrary to the common assumption, Q8 needs "
    "no partsupp — it is fully expressible on these tables.",
)
def ext_tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nc = load_table(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") == Q8_REGION
    ).select("n_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_PTYPE).select(
        "p_partkey"
    )
    rev = _rev_c2()
    nat = F.when(F.col("s_nationkey") == Q8_NATION, rev).otherwise(F.lit(0))
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == nc.n_nationkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(nat).cast("bigint").alias("nation_rev_c2"),
            F.sum(rev).cast("bigint").alias("total_rev_c2"),
        )
    )
    return agg.select(
        "o_year",
        "nation_rev_c2",
        "total_rev_c2",
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * nation_rev_c2"
            " DIV CAST(total_rev_c2 AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier (correlated min over a derived partsupp)
# ---------------------------------------------------------------------------

_DUCK_PS_COST = (
    "CAST(min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)"
)


@query(
    "ext_tpch_q2_shape",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             {_DUCK_PS_COST} AS ps_cost_c
      FROM lineitem GROUP BY 1, 2
    ),
    euro AS (
      SELECT ps.ps_partkey, ps.ps_cost_c, s.s_acctbal, s.s_name, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    pruned AS (
      SELECT e.*, p.p_type
      FROM euro e JOIN part p ON p.p_partkey = e.ps_partkey
      WHERE p.p_size = 15 AND p.p_type LIKE '%ARD'
    ),
    mn AS (SELECT ps_partkey, min(ps_cost_c) AS min_cost_c
           FROM pruned GROUP BY 1)
    SELECT pr.s_acctbal, pr.s_name, pr.n_name,
           pr.ps_partkey AS p_partkey, pr.p_type,
           pr.ps_cost_c AS supplycost_c
    FROM pruned pr
    JOIN mn ON mn.ps_partkey = pr.ps_partkey
           AND mn.min_cost_c = pr.ps_cost_c
    ORDER BY pr.s_acctbal DESC, pr.s_name, pr.ps_partkey
    LIMIT 100
    """,
    doc="EXT TPC-H Q2 shape — minimum-cost supplier: the correlated "
    "MIN-subquery pattern (for each qualifying part, the European "
    "supplier(s) offering the minimum supply cost), with the absent "
    "partsupp table derived as min-observed-price per (part, supplier) "
    "pair from lineitem — the join tree (part x partsupp x supplier x "
    "nation x region), the decorrelated per-part min, and the "
    "acctbal-ordered top-100 are the original's structure exactly. "
    "Scale shape: ONE lineitem shuffle builds ps; supplier/nation/"
    "region and the filtered part dim ride broadcasts; the pruned "
    "frame materializes once (consistent_materialize) and feeds both "
    "the per-part min and the winner join, so the corpus is never "
    "re-derived; the final cut is an ordered take, not a global sort.",
)
def ext_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(cents("l_extendedprice")).cast("bigint").alias("ps_cost_c"))
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dim = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == F.col("r_regionkey"), "left_semi"
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & F.col("p_type").like("%ARD"))
        .select("p_partkey", "p_type")
    )
    pruned = (
        ps.join(F.broadcast(dim), ps.ps_suppkey == dim.s_suppkey)
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .select("ps_partkey", "ps_cost_c", "s_acctbal", "s_name", "n_name", "p_type")
        .transform(consistent_materialize)
    )
    mn = pruned.groupBy(F.col("ps_partkey").alias("m_partkey")).agg(
        F.min("ps_cost_c").alias("min_cost_c")
    )
    return (
        pruned.join(
            F.broadcast(mn),
            (F.col("ps_partkey") == F.col("m_partkey"))
            & (F.col("ps_cost_c") == F.col("min_cost_c")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_type",
            F.col("ps_cost_c").alias("supplycost_c"),
        )
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q11: important stock (share-of-global-total HAVING over a derived partsupp)
# ---------------------------------------------------------------------------

Q11_NATION = "NATION_7"
Q11_PPM = 1500  # HAVING threshold: part value > 1500e-6 x national total


@query(
    "ext_tpch_q11_shape",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                      * CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS val_c
      FROM lineitem GROUP BY 1, 2
    ),
    nat AS (
      SELECT ps.ps_partkey, ps.val_c
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = '{Q11_NATION}'
    ),
    byp AS (
      SELECT ps_partkey, CAST(sum(val_c) AS BIGINT) AS part_val_c
      FROM nat GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(part_val_c) AS HUGEINT) AS total_c FROM byp)
    SELECT b.ps_partkey AS partkey, b.part_val_c
    FROM byp b, tot t
    WHERE CAST(b.part_val_c AS HUGEINT) * 1000000 > t.total_c * {Q11_PPM}
    """,
    doc="EXT TPC-H Q11 shape — important stock: per-part inventory value "
    "for one nation's suppliers, kept only when it exceeds a fixed "
    "fraction of the national total (the original's GROUP BY + HAVING "
    "> scalar-subquery-of-the-same-aggregate), with partsupp derived "
    "from lineitem as value = sum(price_cents x qty) per (part, "
    "supplier). The share test runs in 128-bit DECIMAL/HUGEINT exact "
    "integer arithmetic (ppm threshold) — no float thresholds. Scale "
    "shape: one lineitem shuffle to ps, nation filter rides a "
    "broadcast, the global total is a one-row aggregate OF the "
    "per-part frame (no second corpus pass) broadcast back.",
)
def ext_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum(
            cents("l_extendedprice")
            * F.floor(F.col("l_quantity")).cast("bigint")
        )
        .cast("bigint")
        .alias("val_c")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == Q11_NATION
    )
    dim = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
    byp = (
        ps.join(F.broadcast(dim), ps.ps_suppkey == dim.s_suppkey, "left_semi")
        .groupBy("ps_partkey")
        .agg(F.sum("val_c").cast("bigint").alias("part_val_c"))
        .transform(consistent_materialize)
    )
    tot = byp.agg(
        F.sum(F.col("part_val_c").cast("decimal(38,0)")).alias("total_c")
    )
    return (
        byp.crossJoin(F.broadcast(tot))
        .filter(
            F.col("part_val_c").cast("decimal(38,0)") * 1000000
            > F.col("total_c") * Q11_PPM
        )
        .select(F.col("ps_partkey").alias("partkey"), "part_val_c")
    )


# ---------------------------------------------------------------------------
# Q12: shipping modes and order priority (conditional pivot counts)
# ---------------------------------------------------------------------------

Q12_LO, Q12_HI = "1997-01-01 00:00:00", "1998-01-01 00:00:00"
_Q12_HIGH = ("1-URGENT", "2-HIGH")


@query(
    "ext_tpch_q12_shape",
    oracle=f"""
    SELECT l.l_returnflag AS mode,
           CAST(sum(CASE WHEN o.o_orderpriority IN
                    ({", ".join(f"'{p}'" for p in _Q12_HIGH)})
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN
                    ({", ".join(f"'{p}'" for p in _Q12_HIGH)})
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('R', 'A')
      AND l.l_shipdate >= TIMESTAMP '{Q12_LO}'
      AND l.l_shipdate < TIMESTAMP '{Q12_HI}'
    GROUP BY 1
    """,
    doc="EXT TPC-H Q12 shape — shipping-mode priority matrix: per "
    "category, how many high- vs low-priority orders shipped in the "
    "year window (the original's two-branch conditional pivot over an "
    "IN-filtered categorical + date window + fact-fact join), with "
    "l_returnflag standing in for the absent l_shipmode column and the "
    "ship-date window for the absent commit/receipt lateness chain. "
    "Scale shape: both the IN filter and the date range push into the "
    "lineitem scan (PushedFilters), orders prunes to two columns, the "
    "one shuffle is the orderkey join, and the conditional counts "
    "partial-aggregate map-side to a |modes|-row result.",
)
def ext_tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit(Q12_LO).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(Q12_HI).cast("timestamp_ntz"))
    ).select("l_orderkey", "l_returnflag")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin(*_Q12_HIGH)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_returnflag").alias("mode"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )
