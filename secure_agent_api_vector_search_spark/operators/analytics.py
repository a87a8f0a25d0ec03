"""Relational analytics over the TPC-H-ish star schema ([EXT],
SURVEY.md §2.5-2.7: the reference has no joins/aggregations/windows;
these supply the relational surface a real engine needs).

Numeric contract for oracle parity: every money aggregate is computed
over DECIMAL casts (exact, order-independent — a float sum would differ
in low bits between any two execution orders) and cast to DOUBLE only
at the end; averages divide the exact decimal-sum by the exact count.
Dates are emitted as formatted strings so Spark/DuckDB timestamp
representations never disagree.

Scale shapes: only BOUNDED dimensions carry a broadcast hint (region is
5 rows, nation 25, supplier grows slowly enough to stay under the
broadcast threshold at any realistic SF). Tables that scale linearly
with the data volume — orders, customer, part — get NO hint: a forced
`F.broadcast()` bypasses `autoBroadcastJoinThreshold` entirely and
becomes an executor/driver OOM at large SF, whereas AQE's runtime size
estimation still picks a broadcast join for them at small SF and
degrades gracefully to shuffle joins beyond the threshold. Fact
aggregates are partial-agg + single shuffle on the group key; windows
partition by their natural key. AQE handles skew/coalescing at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.sources.tables import load_table


def _dec(col: str, prec: int = 18, scale: int = 4):
    return F.col(col).cast(f"decimal({prec},{scale})")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate, 8 aggregates, 2 group
    cols. Map-side partial aggregation makes the shuffle 6 rows."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = _dec("l_extendedprice", 12, 2) * (F.lit(1).cast("decimal(3,0)") - _dec("l_discount", 8, 4))
    charge = disc_price * (F.lit(1).cast("decimal(3,0)") + _dec("l_tax", 8, 4))
    out = (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity", 12, 2)).alias("_sum_qty"),
            F.sum(_dec("l_extendedprice", 12, 2)).alias("_sum_base"),
            F.sum(disc_price).alias("_sum_disc"),
            F.sum(charge).alias("_sum_charge"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sum_qty").cast("double").alias("sum_qty"),
            F.col("_sum_base").cast("double").alias("sum_base_price"),
            # round the high-scale decimal sums (scale 6/10) to 2 before the
            # double cast: a scale-10 decimal can exceed 2^53 ulps, where
            # decimal→double rounding is implementation-defined (Spark
            # correctly rounds, DuckDB rounds twice via hugeint) — at scale 2
            # both casts are exact-single-rounding and bit-identical
            F.round(F.col("_sum_disc"), 2).cast("double").alias("sum_disc_price"),
            F.round(F.col("_sum_charge"), 2).cast("double").alias("sum_charge"),
            (F.col("_sum_qty").cast("double") / F.col("count_order")).alias("avg_qty"),
            (F.col("_sum_base").cast("double") / F.col("count_order")).alias("avg_price"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    return out


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters → join into the fact →
    aggregate → top-10. orders and customer scale with SF, so the join
    strategy is left to AQE (broadcast at small SF, shuffle join at
    scale) rather than forced."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = _dec("l_extendedprice", 12, 2) * (F.lit(1).cast("decimal(3,0)") - _dec("l_discount", 8, 4))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"), "o_orderpriority")
        .agg(F.sum(revenue).alias("_rev"))
        .select(
            "l_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            "orderdate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join; BOUNDED dimensions (nation 25
    rows, region 5) broadcast; supplier/orders/customer scale with SF,
    so their join strategy is left to AQE (it still picks broadcast at
    small SF from runtime sizes, and switches to shuffle joins at
    scale — a forced hint would OOM the build side at 100×)."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice", 12, 2) * (F.lit(1).cast("decimal(3,0)") - _dec("l_discount", 8, 4))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, (l["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]))
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("_rev"))
        .select("n_name", F.col("_rev").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure pushdown showcase — four scan
    predicates (date range, discount band, quantity cap) and one
    decimal aggregate, no shuffle beyond the single partial-agg
    exchange of ONE row per task. At 100 TB this is the query whose
    cost is entirely decided by how much the parquet reader can skip:
    every predicate reaches PushedFilters, and with the events-style
    date-partitioned or z-ordered layout (sources/layout.py) the date
    range prunes whole files before a byte is read."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.sum(_dec("l_extendedprice", 12, 2) * _dec("l_discount", 8, 4))
    return l.agg(F.round(rev, 2).cast("double").alias("revenue"))


def q18_large_volume_customer(spark: SparkSession, sf_dir: str, min_qty: int = 150) -> DataFrame:
    """TPC-H Q18 shape: having-filtered aggregate drives a 3-way join
    + bounded top-k. The lineitem sum is map-side combined down to one
    row per order BEFORE any join (never join-then-aggregate — the
    join input shrinks from |lineitem| to |qualifying orders|), the
    customer dim broadcasts, and the final order is
    TakeOrderedAndProject (k-sized heap, no global sort)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity", 12, 2)).alias("_qty"))
        .filter(F.col("_qty") > F.lit(min_qty).cast("decimal(12,2)"))
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            F.col("_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str, brand: str = "Brand#1") -> DataFrame:
    """TPC-H Q2 shape: a correlated min-subquery ("the supplier whose
    unit price IS the minimum for that part"), decorrelated the way
    Catalyst would — one combiner-safe groupBy-min per part, joined
    back on (part, price) equality. The correlated form re-evaluates
    the subquery per outer row; the decorrelated form costs one
    aggregate exchange + one join, and ties keep ALL minimal suppliers
    (the reference semantics of Q2's = (SELECT MIN ...)). Unit price is
    ONE IEEE double division — decimal division result-scales differ
    between engines (each rounds at a different last digit), doubles
    are bit-identical, so min and the equality join cannot drift.
    The brand dim filter broadcasts into the fact scan."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
    s = load_table(spark, sf_dir, "supplier")
    unit = (
        F.col("l_extendedprice").cast("double") / F.col("l_quantity").cast("double")
    ).alias("_unit")
    offers = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .select("p_partkey", "p_name", "l_suppkey", unit)
    )
    best = offers.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("_unit").alias("_best")
    )
    return (
        offers.join(
            best,
            (offers["p_partkey"] == best["_pk"]) & (offers["_unit"] == best["_best"]),
        )
        .join(F.broadcast(s), offers["l_suppkey"] == s["s_suppkey"])
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("_unit").cast("double").alias("min_unit_price"),
        )
        .distinct()
    )


def q7_volume_shipping(
    spark: SparkSession, sf_dir: str,
    nation_a: str = "NATION_1", nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.
    The nation dim joins TWICE under different roles (supplier side /
    customer side) — alias-disambiguated self-reuse of one broadcast —
    and the pair filter is the OR of both directions, evaluated after
    both joins (predicate references columns of both). Aggregate keys:
    (supp_nation, cust_nation, year)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n1k"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n2k"), F.col("n_name").alias("cust_nation")
    )
    revenue = _dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(3,0)") - _dec("l_discount", 8, 4)
    )
    return (
        l.join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1k"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2k"))
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(revenue).alias("_rev"))
        .select(
            "supp_nation", "cust_nation",
            F.col("l_year").cast("int").alias("l_year"),
            F.col("_rev").cast("double").alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(
    spark: SparkSession, sf_dir: str,
    nation: str = "NATION_3", region: str = "ASIA", p_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q8 shape: per-year market share — a conditional-aggregate
    RATIO (nation's revenue / all revenue) over a 7-table join. Both
    sums stay exact DECIMAL; the share is ONE double division, so the
    oracle comparison is bit-exact. The numerator's CASE keys on the
    supplier nation resolved through the second nation role."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == p_type)
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    n2 = load_table(spark, sf_dir, "nation")  # customer side, region-gated
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n1k"), F.col("n_name").alias("supp_nation")
    )
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    revenue = _dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(3,0)") - _dec("l_discount", 8, 4)
    )
    joined = (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n2), c["c_nationkey"] == n2["n_nationkey"])
        .join(F.broadcast(r), n2["n_regionkey"] == r["r_regionkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("_n1k"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("supp_nation") == nation, revenue)),
                F.lit(0).cast("decimal(38,6)"),
            ).alias("_nat"),
            F.sum(revenue).alias("_all"),
        )
        .select(
            F.col("o_year").cast("int").alias("o_year"),
            (F.col("_nat").cast("double") / F.col("_all").cast("double")).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )


def q9_product_type_profit(
    spark: SparkSession, sf_dir: str, name_like: str = "%red%"
) -> DataFrame:
    """TPC-H Q9 shape: profit by (supplier nation, year) over parts
    matching a name pattern. The schema has no partsupp, so supply
    cost is proxied as 10% of the part's retail price per unit —
    decimal end to end, preserving Q9's amount expression shape
    (rev − qty·cost) and its 5-table join + LIKE + year rollup."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like(name_like))
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    amount = _dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(3,0)") - _dec("l_discount", 8, 4)
    ) - _dec("l_quantity", 12, 2) * _dec("p_retailprice", 12, 2) * F.lit(
        "0.1"
    ).cast("decimal(2,1)")
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).alias("_profit"))
        .select(
            "nation",
            F.col("o_year").cast("int").alias("o_year"),
            F.col("_profit").cast("double").alias("sum_profit"),
        )
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one quarter — selective order-date range, returnflag filter on the
    fact, 4-table join, TakeOrderedAndProject top-k (no global
    sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(3,0)") - _dec("l_discount", 8, 4)
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).alias("_rev"))
        .select(
            "c_custkey", "c_name",
            F.col("_rev").cast("double").alias("revenue"),
            "c_acctbal", "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q14_promo_revenue(
    spark: SparkSession, sf_dir: str, month: str = "1997-09"
) -> DataFrame:
    """TPC-H Q14 shape: promotion share of one month's revenue — a
    conditional-aggregate ratio over a part join. One row out; both
    sums exact decimal, one double division, scaled by an exact
    literal."""
    y, m = (int(x) for x in month.split("-"))
    nxt = f"{y + (m == 12)}-{m % 12 + 1:02d}-01"
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{month}-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(nxt).cast("timestamp"))
    )
    revenue = _dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(3,0)") - _dec("l_discount", 8, 4)
    )
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("p_type") == "PROMO", revenue)),
                F.lit(0).cast("decimal(38,6)"),
            ).alias("_promo"),
            F.sum(revenue).alias("_all"),
        )
        .select(
            (
                F.lit(100.0)
                * F.col("_promo").cast("double")
                / F.col("_all").cast("double")
            ).alias("promo_revenue_pct")
        )
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part descriptor
    with a NOT-IN exclusion subquery. The schema has no partsupp, so
    lineitem stands in as the part↔supplier relation (distinct pairs);
    the exclusion (suppliers in bad standing, s_acctbal < 0) runs as a
    LEFT ANTI join — the decorrelated NOT IN. COUNT(DISTINCT) keys the
    one real shuffle; part filters prune first."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("_bad"))
    return (
        l.join(F.broadcast(bad), l["l_suppkey"] == F.col("_bad"), "left_anti")
        .join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(), F.col("p_type").asc(), F.col("p_size").asc(),
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    both join sides (brand × size-band × quantity-band). The join is a
    plain equi-join on partkey; the disjunction stays ONE post-join
    filter Catalyst can partially push (each side's common conjuncts),
    exactly Q19's optimizer test. One decimal sum out."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(3,0)") - _dec("l_discount", 8, 4)
    )
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(11, 20)
            & F.col("l_quantity").between(5, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(21, 30)
            & F.col("l_quantity").between(10, 30)
        )
    )
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .filter(band)
        .agg(F.coalesce(
            F.sum(revenue), F.lit(0).cast("decimal(38,6)")
        ).alias("_rev"))
        .select(F.col("_rev").cast("double").alias("revenue"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the maximum — the "revenue view + scalar max subquery" pattern,
    decorrelated to one aggregate + a broadcast one-row max joined back
    on equality (ties kept, the Q15 contract). Revenue stays exact
    DECIMAL through the max/equality so the tie set cannot drift."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = _dec("l_extendedprice", 12, 2) * (
        F.lit(1).cast("decimal(3,0)") - _dec("l_discount", 8, 4)
    )
    rev = l.groupBy("l_suppkey").agg(F.sum(revenue).alias("_rev"))
    best = rev.agg(F.max("_rev").alias("_best"))
    return (
        rev.join(F.broadcast(best), rev["_rev"] == best["_best"])
        .join(F.broadcast(s), rev["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("s_suppkey"), F.col("s_name"),
            F.col("_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers in selected
    country codes with NO RECENT orders — a scalar-average subquery
    (broadcast one-row) + NOT EXISTS (left-anti on a date-filtered
    order set) + group-by-code rollup. Two schema adaptations, same
    shape: the country code derives as c_nationkey % 10 (no phone
    column), and the anti-join keys on recent orders (every customer
    in this corpus has SOME order, so Q22's literal "no orders ever"
    is degenerate — dormancy keeps the anti-join semantics and a
    non-empty result the gate can actually value-check). The average
    is one double division of exact sums."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_nationkey") % 10).cast("int")
    )
    codes = [1, 3, 5, 7, 9]
    pos = c.filter(F.col("c_acctbal") > 0)
    avg_bal = pos.agg(
        (
            F.sum(_dec("c_acctbal", 12, 2)).cast("double")
            / F.count("*").cast("double")
        ).alias("_avg")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("_ck"))
    )
    return (
        c.filter(F.col("cntrycode").isin(codes))
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("double") > F.col("_avg"))
        .join(o, F.col("c_custkey") == F.col("_ck"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal", 12, 2)).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def top_customers_by_revenue(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(_dec("o_totalprice", 14, 2)).alias("_rev"), F.count("*").alias("n_orders"))
        .select("c_custkey", "c_name", F.col("_rev").cast("double").alias("revenue"), "n_orders")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_type")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum(_dec("p_retailprice", 12, 2)).alias("_sum_price"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
        )
        .select(
            "p_type",
            "n_parts",
            (F.col("_sum_price").cast("double") / F.col("n_parts")).alias("avg_price"),
            "min_price",
            "max_price",
        )
        .orderBy("p_type")
    )


def orders_window_top3(spark: SparkSession, sf_dir: str, max_custkey: int = 100) -> DataFrame:
    """Top-3 orders per customer by value — the canonical top-k-per-group
    window. Partition by customer: the shuffle key matches the window
    key, one exchange."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < max_custkey)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(F.sum(_dec("o_totalprice", 14, 2)).alias("_rev"), F.count("*").alias("n_orders"))
        .select("r_name", F.col("_rev").cast("double").alias("revenue"), "n_orders")
        .orderBy("r_name")
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour rollup of the event stream table (batch twin of the
    streaming/events.py windowed aggregation)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("value", 14, 2)).alias("_sum_value"),
        )
        .select("hour", "event_type", "n", F.col("_sum_value").cast("double").alias("sum_value"))
        .orderBy("hour", "event_type")
    )


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props column + bucketed aggregate."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select((k - k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.sum(_dec("value", 14, 2)).alias("_sum"))
        .select("k_bucket", "n", F.col("_sum").cast("double").alias("sum_value"))
        .orderBy("k_bucket")
    )


def orders_semi_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS decorrelated to a left-semi join): count
    orders per priority having at least one line shipped after the
    cutoff. The semi join never materializes lineitem columns and
    short-circuits per order key."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    late = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        o.join(late, o["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join: customers with no recent orders
    (none since 2000-01-01), profiled per market segment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


def brand_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations over brand assortments: brands selling both
    ECONOMY and PROMO parts (INTERSECT) vs ECONOMY-only (EXCEPT),
    labeled and unioned. Distinct-set semantics on both engines."""
    p = load_table(spark, sf_dir, "part")
    eco = p.filter(F.col("p_type") == "ECONOMY").select("p_brand")
    promo = p.filter(F.col("p_type") == "PROMO").select("p_brand")
    both = eco.intersect(promo).select(F.lit("both").alias("which"), "p_brand")
    only = eco.subtract(promo).select(F.lit("economy_only").alias("which"), "p_brand")
    return both.unionAll(only).orderBy("which", "p_brand")


def price_quantiles_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation quantiles (SQL percentile_cont
    semantics) of retail price per brand. Exact percentile needs the
    group's values together — one shuffle on brand; at 100 TB scale
    swap in approx_percentile (t-digest, partial-mergeable) and drop
    the oracle to tolerance checks."""
    p = load_table(spark, sf_dir, "part")
    qs = [
        F.round(F.percentile("p_retailprice", F.lit(q)), 6).alias(f"p{int(q * 100)}")
        for q in (0.25, 0.5, 0.75)
    ]
    return (
        p.groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"), *qs)
        .orderBy("p_brand")
    )


def region_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order revenue per priority × region, regions as columns.
    Spark's pivot is a single hash aggregate with composite keys; the
    pivot value list is declared so no extra distinct-values job runs."""
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # customer scales with SF — no forced broadcast hint; AQE picks a
    # broadcast join at small SF and a shuffle join at 100×. Only the
    # fixed-cardinality dims (nation=25, region=5) keep the hint.
    joined = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    pivoted = (
        joined.groupBy("o_orderpriority")
        .pivot("r_name", regions)
        .agg(F.sum(_dec("o_totalprice", 14, 2)))
    )
    cols = [
        F.coalesce(F.col(f"`{reg}`").cast("double"), F.lit(0.0)).alias(
            f"rev_{reg.lower().replace(' ', '_')}"
        )
        for reg in regions
    ]
    return pivoted.select("o_orderpriority", *cols).orderBy("o_orderpriority")


def part_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines with quantity below 20% of their part's
    average. The correlated scalar subquery decorrelates to a window
    average over the part key — one shuffle, no self-join re-scan.
    part scales with SF (the PROMO filter keeps ~1/5 of it), so the
    join strategy is AQE's call, not a forced broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    joined = l.join(p, l["l_partkey"] == p["p_partkey"])
    w = Window.partitionBy("l_partkey")
    flagged = joined.withColumn("_avg_qty", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < 0.2 * F.col("_avg_qty")
    )
    return (
        flagged.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_small_lines"),
            F.sum(_dec("l_extendedprice", 12, 2)).alias("_rev"),
        )
        .select("l_partkey", "n_small_lines", F.col("_rev").cast("double").alias("small_qty_revenue"))
        .orderBy("l_partkey")
    )


def events_funnel(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_sec: int = 86_400,
) -> DataFrame:
    """Ordered funnel analysis (first-touch): a user enters at their
    earliest ``steps[0]`` event; each later step is the earliest
    matching event AT OR AFTER the previous step's time and within
    ``window_sec`` of entry. Output per entered user:
    (user_id, t_<step>_us ... as epoch-µs BIGINTs, stage, completed).

    Scale shape: one chained aggregation per step, ALL keyed on
    user_id — the per-step event filter prunes the scan (event_type
    pushdown), and every exchange shares the same hash key, so the
    funnel costs one logical shuffle of the entered-user set per step,
    never a per-user sort or a self-join on the full event stream.
    Timestamps compare in microseconds (unix_micros ↔ DuckDB epoch_us)
    so the oracle can never disagree on a boundary.
    """
    return funnel_frame(load_table(spark, sf_dir, "events"), steps, window_sec)


def funnel_frame(
    e: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_sec: int = 86_400,
) -> DataFrame:
    """Core funnel plan over an injected events frame (see
    :func:`events_funnel` for semantics and scale shape)."""
    cur = (
        e.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t0"))
    )
    deadline = F.col("t0") + F.lit(window_sec * 1_000_000)
    for i, step in enumerate(steps[1:], start=1):
        nxt = e.filter(F.col("event_type") == step).select(
            "user_id", F.unix_micros("ts").alias("_ts")
        )
        keys = ["user_id"] + [f"t{j}" for j in range(i)]
        hit = F.when(
            (F.col("_ts") >= F.col(f"t{i - 1}")) & (F.col("_ts") <= deadline),
            F.col("_ts"),
        )
        cur = cur.join(nxt, "user_id", "left").groupBy(*keys).agg(
            F.min(hit).alias(f"t{i}")
        )
    n = len(steps)
    stage = F.lit(1)
    for i in range(1, n):
        stage = stage + F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
    return cur.select(
        "user_id",
        *[F.col(f"t{i}").alias(f"t_{s}_us") for i, s in enumerate(steps)],
        stage.cast("long").alias("stage"),
        F.col(f"t{n - 1}").isNotNull().alias("completed"),
    )


def events_funnel_summary(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_sec: int = 86_400,
) -> DataFrame:
    """One-row funnel rollup: users reaching each stage + conversion."""
    per_user = events_funnel(spark, sf_dir, steps, window_sec)
    n = len(steps)
    aggs = [F.count("*").alias("n_entered")] + [
        F.sum(F.col(f"t_{s}_us").isNotNull().cast("long")).alias(f"n_{s}")
        for s in steps[1:]
    ]
    return per_user.agg(*aggs).select(
        "*",
        (
            F.col(f"n_{steps[-1]}").cast("double") / F.col("n_entered")
        ).alias("conversion"),
    )


def events_retention(
    spark: SparkSession, sf_dir: str, max_offset_days: int = 7
) -> DataFrame:
    """Cohort retention analysis — the funnel's companion: users are
    cohorted by the DATE of their first event; for each (cohort,
    day_offset ≤ ``max_offset_days``) the output counts how many of
    that cohort were active again ``day_offset`` days later, plus the
    retention fraction vs the cohort's day-0 size.

    Scale shape: the raw event stream collapses FIRST to distinct
    (user_id, day) — map-side combinable, so the 100 TB event volume
    reduces to |users|·|active days| before any join. First-seen is a
    groupBy on the SAME user_id key (AQE reuses the hash partitioning),
    the activity⋈first join is co-partitioned on user_id, and the final
    rollup keys on (cohort, day_offset) — a tiny domain (days ×
    max_offset). The day-0 size frame is |days| rows and explicitly
    broadcast. No window over the raw stream, no self-join of events.

    Output: (cohort DATE, day_offset INT, n_users, cohort_size,
    retention) ordered by (cohort, day_offset).
    """
    return retention_frame(load_table(spark, sf_dir, "events"), max_offset_days)


def retention_frame(e: DataFrame, max_offset_days: int = 7) -> DataFrame:
    """Core retention plan over an injected events frame (see
    :func:`events_retention` for semantics and scale shape)."""
    activity = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    first = activity.groupBy("user_id").agg(F.min("d").alias("cohort"))
    ret = (
        activity.join(first, "user_id")
        .select(
            "cohort",
            F.datediff("d", "cohort").alias("day_offset"),
            "user_id",
        )
        .filter(F.col("day_offset") <= max_offset_days)
        .groupBy("cohort", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    base = ret.filter(F.col("day_offset") == 0).select(
        "cohort", F.col("n_users").alias("cohort_size")
    )
    return (
        ret.join(F.broadcast(base), "cohort")
        .select(
            "cohort",
            "day_offset",
            "n_users",
            "cohort_size",
            (F.col("n_users").cast("double") / F.col("cohort_size"))
            .alias("retention"),
        )
        .orderBy("cohort", "day_offset")
    )


def events_engagement(
    spark: SparkSession, sf_dir: str, window_days: int = 28
) -> DataFrame:
    """Daily engagement panel: DAU, trailing-``window_days`` MAU, and
    the DAU/MAU stickiness ratio per active day.

    Scale shape: events collapse FIRST to distinct (user_id, day) —
    map-side combinable, same reduction as :func:`events_retention`.
    The trailing window is then a join of the TINY distinct-day frame
    (|days| rows — explicitly broadcast) against the user-day activity
    with a half-open date-range predicate: each activity row expands to
    at most ``window_days`` output days, so the MAU count-distinct
    shuffles ≤ window_days·|user-days| rows — bounded by the window
    constant, never quadratic, and no per-day rescan of raw events.

    Output: (day DATE, dau, mau, stickiness) ordered by day.
    """
    return engagement_frame(load_table(spark, sf_dir, "events"), window_days)


def engagement_frame(e: DataFrame, window_days: int = 28) -> DataFrame:
    """Core engagement plan over an injected events frame (see
    :func:`events_engagement` for semantics and scale shape)."""
    act = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    days = act.select("d").distinct()
    dau = act.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))
    x = days.select(F.col("d").alias("day"))
    window_hits = F.broadcast(x).join(
        act,
        (F.col("d") <= F.col("day"))
        & (F.col("d") > F.date_sub(F.col("day"), window_days)),
    )
    mau = window_hits.groupBy("day").agg(
        F.countDistinct("user_id").alias("mau")
    )
    return (
        dau.withColumnRenamed("d", "day")
        .join(mau, "day")
        .select(
            "day",
            "dau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
        .orderBy("day")
    )


def events_sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: a session break is a gap > ``gap_minutes`` since
    the previous event of the same user; session count = 1 + breaks.
    Lag + conditional-sum windows, both partitioned by user — one
    shuffle on user_id. Output: (user_id, n_events, n_sessions)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (unix_micros ↔ DuckDB epoch_us) so the
    # boundary comparison can never disagree with the oracle
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    is_break = F.when(gap > gap_minutes * 60 * 1_000_000, 1).otherwise(0)
    return (
        e.withColumn("brk", is_break)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), (F.sum("brk") + 1).alias("n_sessions"))
    )


def events_hourly_anomaly(
    spark: SparkSession, sf_dir: str, z_thresh: float = 2.0
) -> DataFrame:
    """Volume-anomaly detector over the hourly event rollup: flag
    (hour, event_type) cells whose count sits more than ``z_thresh``
    sample standard deviations from that type's hourly mean — the
    first-line ops alarm ("clicks fell off a cliff at 14:00") computed
    batch-side; the streaming twin is the same arithmetic over the
    windowed_counts sink.

    Determinism contract (hard-gate): mean and std are derived from
    EXACT integer sums (H hours, S = sum of counts, Q = sum of squared
    counts) — var = (H*Q - S^2) / (H*(H-1)) — so the only floating
    steps are final IEEE divisions and one sqrt (correctly rounded by
    IEEE-754, unlike ln — same reasoning as lm_likelihood_buckets).
    stddev_samp over doubles would be aggregation-order-dependent;
    this formulation is not. The squared terms (n*n, H*Q, S*S) run as
    DECIMAL(38,0): at web-scale traffic (S beyond ~3e9) the int64
    products would silently wrap, forcing every z to 0 and muting the
    alarm exactly when traffic is largest — the same guard
    source_drift_tvd carries.

    Scale shape: one hour-keyed aggregate (map-side combinable), one
    tiny per-type stats frame broadcast back. Zero-variance types
    (constant traffic) get z = 0, never NaN.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"))
    dec = "decimal(38,0)"
    stats = hourly.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("h"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n").cast(dec) * F.col("n").cast(dec)).alias("q"),
    )
    joined = hourly.join(F.broadcast(stats), "event_type")
    mean_n = F.col("s").cast("double") / F.col("h").cast("double")
    var = (
        (
            F.col("h").cast(dec) * F.col("q")
            - F.col("s").cast(dec) * F.col("s").cast(dec)
        ).cast("double")
        / (F.col("h") * (F.col("h") - 1)).cast("double")
    )
    std = F.sqrt(var)
    z = F.when(
        (F.col("h") > 1) & (std > 0.0),
        (F.col("n").cast("double") - mean_n) / std,
    ).otherwise(F.lit(0.0))
    return joined.select(
        "hour",
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        mean_n.alias("mean_n"),
        z.alias("z"),
        (F.abs(z) > z_thresh).alias("is_anomaly"),
    )


# -- round-10 TPC-H shapes: Q4 / Q12 / Q13 / Q21 -----------------------------
# The synthetic lineitem carries no commit/receipt dates or ship mode
# (TESTDATA.md), so "late" is proxied as l_shipdate > o_orderdate + N
# days (same proxy discipline as q9's supply cost) and l_returnflag
# stands in for l_shipmode. The PLAN shapes are the real ones: Q4's
# decorrelated EXISTS becomes a semi join whose condition mixes an
# equi key with a cross-table non-equi conjunct; Q13 is the left-outer
# two-level count distribution; Q21 is the semi + anti lineitem
# self-join over a shared derived relation.


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: orders per priority in one quarter having at least one
    late line. The EXISTS is a LEFT SEMI join on (orderkey, shipdate >
    orderdate + 90d) — the non-equi conjunct rides on the hash-join
    output rows, so the plan stays a single shuffle on orderkey and
    lineitem contributes only two columns."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o["o_orderkey"] == l["l_orderkey"])
            & (l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: late-line counts split by order priority class,
    grouped by a lineitem attribute (l_returnflag proxies the absent
    l_shipmode). Conditional aggregation over one fact-fact join; the
    priority CASE runs map-side so the shuffle carries two ints per
    group."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_returnflag").isin("A", "N")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer including
    zero-order customers — customer LEFT OUTER orders (with a
    predicate that must stay in the join's ON clause, not a WHERE,
    or the outer rows vanish), per-customer count, then a second
    count over the counts. Two shuffles by construction; the second
    one is tiny (distinct counts ≤ max orders/customer)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers whose line was the ONLY late one on a
    finished multi-supplier order. One derived relation (lineitem ⋈
    finished orders, with a boolean `late` column) feeds all three
    roles: l1 (late lines), the EXISTS (semi join: another supplier on
    the same order), and the NOT EXISTS (anti join: another supplier
    also late). All three branches hash on l_orderkey — the classic
    three-scan Q21 plan — with the suppkey inequality left as a cheap
    residual on the sort-merge output; supplier/nation are broadcast
    dims."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    flagged = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("late"),
        )
    )
    l1 = flagged.filter(F.col("late")).alias("l1")
    l2 = flagged.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = flagged.filter(F.col("late")).select("l_orderkey", "l_suppkey").alias("l3")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    waiting = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), F.col("l1.l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("s_name", "n_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: per-part holdings value in a nation group exceeding
    a fraction of the GLOBAL total — the scalar-subquery-in-HAVING
    shape. lineitem stands in for partsupp (this corpus ships none;
    same convention as the Q16 adaptation), value = extendedprice
    net of discount. Plan shape: one shared scan-side aggregate feeds
    both the per-part values and the global total; the total is a
    1-row broadcast into the filter (no recompute, no shuffle for the
    scalar), supplier/nation broadcast dims. At 100 TB the only big
    exchange is the partkey hash — Catalyst pushes the nation filter
    below it."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2")
    ).select("n_nationkey")
    val = (
        l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"],
              "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("value")
        )
    )
    thresh = val.agg((F.sum("value") * F.lit(0.001)).alias("_t"))
    return (
        val.join(F.broadcast(thresh))
        .filter(F.col("value") > F.col("_t"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), F.col("l_partkey"))
    )


def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers holding EXCESS recent stock of one part
    type — the nested-semi-join + correlated-aggregate shape.
    partsupp's availqty is proxied by per-(supplier, part) shipped
    quantity (same no-partsupp convention as Q11/Q16): a pair
    qualifies when its post-2001 quantity exceeds half its all-time
    quantity (the correlated scalar decorrelates into one conditional
    aggregate — one grouped pass computes both sides), with a volume
    floor so singleton pairs don't trivially qualify. Qualifying
    suppliers semi-join into the supplier×nation dim; part and nation
    broadcast."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    sp = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"], "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(
                    F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp"),
                    F.col("l_quantity"),
                ).otherwise(F.lit(0))
            ).alias("recent_qty"),
            F.sum("l_quantity").alias("total_qty"),
        )
        .filter(
            (F.col("total_qty") >= 30)
            & (F.col("recent_qty") > 0.5 * F.col("total_qty"))
        )
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4"
        )
    ).select("n_nationkey", "n_name")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(sp, s["s_suppkey"] == sp["l_suppkey"], "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
