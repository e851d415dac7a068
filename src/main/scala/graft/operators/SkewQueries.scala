package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Skew-mitigation patterns as oracle-checked operators: the results are
  * EXACTLY the plain aggregate/join results (that is the point — salting
  * changes the shuffle shape, never the answer), so DuckDB runs the plain
  * formulation while Spark runs the salted one.
  *
  * Scale posture: `l_returnflag` has 3 values — a direct groupBy sends
  * every row to 3 reducers no matter how many executors exist; salting
  * fans the partial aggregate over `key × nSalts` reducers and the final
  * combine touches only nSalts rows per key. The salted join replicates
  * the SMALL side nSalts times (bounded) so the big side's hot key spreads
  * over nSalts reducers. Sums go through DECIMAL so reassociation cannot
  * change the answer (double addition is not associative; decimal is).
  */
object SkewQueries {

  private val nSalts = 16

  /** q45: two-phase salted aggregation over a 3-value grouping key. */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val partial = li
      .withColumn("__salt", pmod(hash(col("l_orderkey")), lit(nSalts)))
      .groupBy(col("l_returnflag"), col("__salt"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("q"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("p"),
        count(lit(1)).as("n"))
    partial.groupBy("l_returnflag")
      .agg(sum(col("q")).cast("double").as("sum_qty"),
        sum(col("p")).cast("double").as("sum_price"),
        sum(col("n")).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** q46: salted equi-join — small side replicated nSalts times, big side
    * deterministically salted by an uncorrelated column's hash. */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .withColumn("__salt", pmod(hash(col("l_orderkey")), lit(nSalts)))
    val sup = Tables.load(spark, dir, "supplier")
      .withColumn("__salt",
        explode(sequence(lit(0), lit(nSalts - 1))))
    li.join(sup,
        li("l_suppkey") === sup("s_suppkey") && li("__salt") === sup("__salt"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast("double").as("sum_price"))
      .orderBy("s_nationkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_salted_agg"  -> (saltedAgg _),
    "q46_salted_join" -> (saltedJoin _))

  val oracles: Map[String, String] = Map(
    "q45_salted_agg" ->
      """SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         COUNT(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q46_salted_join" ->
      """SELECT s_nationkey, COUNT(*) AS n_items,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_nationkey ORDER BY s_nationkey""")
}
