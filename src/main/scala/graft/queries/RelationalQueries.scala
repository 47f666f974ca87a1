package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Core relational coverage (SURVEY §2, q*).
  *
  * Oracle-determinism: every floating aggregate is computed in scaled
  * integer (cents) arithmetic with a single final division, so Spark and
  * DuckDB produce bit-identical doubles regardless of partial-agg order.
  */
object RelationalQueries {

  /** round(x*100) as long — exact cents. */
  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          (sum(cents($"l_quantity")) / 100.0).as("sum_qty"),
          (sum(cents($"l_extendedprice")) / 100.0).as("sum_base_price"),
          (sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))) / 10000.0)
            .as("sum_disc_price"),
          (sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")) *
               (lit(100L) + cents($"l_tax"))) / 1000000.0).as("sum_charge"),
          (sum(cents($"l_quantity")) / 100.0 / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(round(l_quantity*100) AS BIGINT)) / 100.0 AS sum_qty,
        |  sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS sum_base_price,
        |  sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS sum_disc_price,
        |  sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) / 1000000.0 AS sum_charge,
        |  sum(CAST(round(l_quantity*100) AS BIGINT)) / 100.0 / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
