"""Relational operator surface (SURVEY.md §2 Part B) over the TPC-H-ish
test tables.

The reference never joins, groups, windows, or sorts anything (SURVEY.md
§2 A.5: zero joins; §2 A.4: count/limit only), so this module is the
``[EXT]`` generalized closure its clean->enrich->combine->count patterns
imply. Everything is declarative DataFrame API — Catalyst does pushdown,
join selection (broadcast vs shuffle via AQE), and whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_airflow_docker_spark.catalog import table
from pipeline_airflow_docker_spark.functions import davg, dec, dsum
from pipeline_airflow_docker_spark.plans.registry import query

# --------------------------------------------------------------------
# B7 hash aggregate — the flagship query (pricing summary, TPC-H Q1
# shape). Generalizes the reference's only aggregate (row count,
# dags/etl_data_pipeline_mongodb_complex.py:43) to grouped multi-agg.
# Physical plan: parquet scan (shipdate filter pushed) -> partial
# HashAggregate -> shuffle on 2 low-cardinality keys -> final
# HashAggregate -> sort. At 100 TB the partial aggregation collapses
# 6B rows/TB to 6 groups per task before the shuffle.
# --------------------------------------------------------------------

_PRICING_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))
           * (1 + CAST(l_tax AS DECIMAL(18,4)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q_agg_group", oracle=_PRICING_ORACLE)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
