package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables
import graft.util.Tables.dec
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 expressed over the
  * driver's synthetic tables; `oracleSql` holds the DuckDB-equivalent SQL
  * the driver uses as a correctness oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue of urgent-priority orders by ship year and return flag —
    * exercises scan→filter→join→agg→sort in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val l = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderpriority").startsWith("1"))
      .groupBy(year(col("l_shipdate")).as("ship_yr"), col("l_returnflag"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("ship_yr"), col("l_returnflag"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.q ++ ScaleQueries.q ++ RebuildQueries.q ++
      OpsQueries.q ++ MultimodalQueries.q

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.sql ++ ScaleQueries.sql ++ RebuildQueries.sql ++
      OpsQueries.sql ++ MultimodalQueries.sql
}
