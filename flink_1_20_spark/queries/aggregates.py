"""Aggregation coverage (SURVEY.md §2.4, §2.8 agg functions).

Reference parity:
- batch hash agg             exec/batch/BatchExecHashAggregate.java:55
- distinct aggregates        BuiltInFunctionDefinitions.java:831 (distinct), 721 (count)
- stat aggs                  BuiltInFunctionDefinitions.java:787-814 (stddev/var pop+samp)
- first_value / last_value   BuiltInFunctionDefinitions.java:747,754
- listAgg                    BuiltInFunctionDefinitions.java:761
- sum0                       BuiltInFunctionDefinitions.java:778
- collect (multiset)         BuiltInFunctionDefinitions.java:823
- grouping sets/rollup/cube  rules/logical/DecomposeGroupingSetsRule.scala:130
- table agg (top-2 emit)     exec/stream/StreamExecGroupTableAggregate.java:59

Spark: two-phase (partial+final) hash aggregation is automatic; grouping
sets compile to the same Expand-based plan Flink generates. LISTAGG and
FIRST_VALUE are made deterministic here (sorted collect_list / min_by on
a total order) because both engines otherwise leave tie order undefined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.queries._util import T, V, money
from flink_1_20_spark.registry import register


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS nd_parts,
           COUNT(DISTINCT l_suppkey) AS nd_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggs in one group-by — Flink splits these with
    TABLE_OPTIMIZER_DISTINCT_AGG_SPLIT (OptimizerConfigOptions.java:64);
    Spark plans them via Expand automatically."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("nd_parts"),
            F.count_distinct("l_suppkey").alias("nd_supps"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_linestatus,
           ROUND(STDDEV_POP(l_quantity), 4)  AS sd_pop,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_samp,
           ROUND(VAR_POP(l_quantity), 4)     AS v_pop,
           ROUND(VAR_SAMP(l_quantity), 4)    AS v_samp,
           ROUND(CORR(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
           ROUND(COVAR_POP(l_quantity, l_extendedprice), 2)  AS cov_pop,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS cov_samp
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        money(F.stddev_pop("l_quantity"), 4).alias("sd_pop"),
        money(F.stddev_samp("l_quantity"), 4).alias("sd_samp"),
        money(F.var_pop("l_quantity"), 4).alias("v_pop"),
        money(F.var_samp("l_quantity"), 4).alias("v_samp"),
        money(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        money(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("cov_pop"),
        money(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_samp"),
    )


@register(
    "agg_first_last_value",
    oracle="""
    SELECT c_mktsegment,
           first(o_orderkey ORDER BY o_orderdate, o_orderkey) AS first_order,
           last(o_orderkey ORDER BY o_orderdate, o_orderkey)  AS last_order
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def agg_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE (BuiltInFunctionDefinitions.java:747,754)
    made deterministic via a total order (date, key) → min_by/max_by."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    order_key = F.struct("o_orderdate", "o_orderkey")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.min_by("o_orderkey", order_key).alias("first_order"),
            F.max_by("o_orderkey", order_key).alias("last_order"),
        )
    )


@register(
    "agg_listagg",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG (BuiltInFunctionDefinitions.java:761), deterministic order."""
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"))
    )


@register(
    "agg_sum0_empty",
    oracle="""
    SELECT COALESCE(SUM(c_acctbal), 0.0) AS sum0_bal, COUNT(*) AS n
    FROM customer WHERE c_acctbal < -99999999
    """,
)
def agg_sum0_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM0 (BuiltInFunctionDefinitions.java:778): 0 instead of NULL on
    empty input — the flink_1_20_spark.functions.compat.sum0 helper."""
    from flink_1_20_spark.functions.compat import sum0

    return (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < -99999999)
        .agg(sum0("c_acctbal").alias("sum0_bal"), F.count("*").alias("n"))
    )


@register(
    "agg_collect_multiset",
    oracle="""
    SELECT n_name, o_orderpriority AS elem, COUNT(*) AS multiplicity
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name, o_orderpriority
    """,
)
def agg_collect_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLECT → MULTISET (BuiltInFunctionDefinitions.java:823): Flink's
    multiset is a value→count map; flattened here to (group, elem,
    multiplicity) rows — the scalable representation (a map column of
    unbounded cardinality is an anti-pattern at 100 TB)."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.col("o_orderpriority").alias("elem"))
        .agg(F.count("*").alias("multiplicity"))
    )


_GSETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
"""


@register("agg_grouping_sets", oracle=_GSETS_SQL)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS + GROUPING() (DecomposeGroupingSetsRule.scala:130)
    — dialect-identical SQL runs on both engines (Expand-based plan)."""
    V(spark, sf_dir, "lineitem")
    return spark.sql(_GSETS_SQL)


_ROLLUP_SQL = """
    SELECT r_name, n_name, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
"""


@register("agg_rollup", oracle=_ROLLUP_SQL)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    V(spark, sf_dir, "customer", "nation", "region")
    return spark.sql(_ROLLUP_SQL)


_CUBE_SQL = """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 2) AS sum_price, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("agg_cube", oracle=_CUBE_SQL)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    V(spark, sf_dir, "lineitem")
    return spark.sql(_CUBE_SQL)


@register(
    "agg_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING_ID(l_returnflag, l_linestatus) AS gid,
           GROUPING(l_returnflag) AS g_rf,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP_ID()/GROUPING() super-aggregate markers
    (BuiltInFunctionDefinitions GROUP_ID; DecomposeGroupingSetsRule.scala:130)
    via the DataFrame cube() builder — Spark's grouping_id() bit order
    (first cube column = MSB) matches Flink's and DuckDB's."""
    li = T(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.count("*").alias("n"),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(money(F.sum("l_quantity")))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


@register(
    "agg_having",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS n_items, ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 100 AND SUM(l_quantity) > 500
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_items"), F.sum("l_quantity").alias("raw_qty"))
        .filter((F.col("n_items") > 100) & (F.col("raw_qty") > 500))
        .select("l_suppkey", "n_items", money("raw_qty").alias("total_qty"))
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(MEDIAN(o_totalprice), 2) AS med_price,
           ROUND(quantile_cont(o_totalprice, 0.95), 2) AS p95_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (interpolated). At 100 TB you'd swap these for
    approx_percentile — exact percentile requires a per-group sort."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            money(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("med_price"),
            money(F.expr("percentile(o_totalprice, 0.95)"), 2).alias("p95_price"),
        )
    )


@register(
    "agg_bool_bit",
    oracle="""
    SELECT l_returnflag,
           BOOL_AND(l_quantity > 1)  AS all_multi,
           BOOL_OR(l_discount > 0.09) AS any_deep_discount,
           BIT_AND(l_linenumber) AS band,
           BIT_OR(l_linenumber)  AS bor,
           BIT_XOR(l_linenumber) AS bxor
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 1).alias("all_multi"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.bit_and("l_linenumber").alias("band"),
        F.bit_or("l_linenumber").alias("bor"),
        F.bit_xor("l_linenumber").alias("bxor"),
    )


@register(
    "table_agg_top2_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS acctbal
    FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer)
    WHERE rn <= 2
    """,
)
def table_agg_top2_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableAggregateFunction's canonical example — top-2 per group
    emitting multiple rows (StreamExecGroupTableAggregate.java:59,
    Table.flatAggregate, Table.java:903) — as a declarative rank+filter
    (incremental emission is a streaming concern; Spark's update-mode
    agg covers it)."""
    from pyspark.sql import Window as W

    c = T(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("c_mktsegment", "c_custkey", money("c_acctbal").alias("acctbal"))
    )
