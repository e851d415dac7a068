package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** UDF surface (SURVEY.md §2.8).
  *
  * U1 — catalog SQL scalar UDF `discount` (reference: Silver_Products.py:25-27,
  * called from SQL at :32 and via expr() at :36). Declared with
  * `CREATE FUNCTION … RETURN expr`, so Catalyst inlines the body into the
  * plan — it stays inside whole-stage codegen, unlike a closure UDF.
  *
  * U2 — registered Scala UDF `upper_func` (reference: Silver_Products.py:42-47,
  * a Python UDF; the idiomatic Spark-native replacement is a JVM closure —
  * no Python worker round-trip, still null-safe).
  */
object Udfs {

  def register(spark: SparkSession): Unit = {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION discount(p_price DOUBLE)
         RETURNS DOUBLE RETURN p_price * 0.90""")
    if (!spark.catalog.functionExists("upper_func"))
      spark.udf.register("upper_func", (s: String) =>
        if (s == null) null else s.toUpperCase)
  }

  /** U1+U2 exercised from both the SQL path and the DataFrame/expr() path. */
  def udfShowcase(spark: SparkSession, dir: String): DataFrame = {
    register(spark)
    Tables.load(spark, dir, "part")
      .select(
        col("p_partkey"),
        col("p_retailprice"),
        expr("discount(p_retailprice)").as("discounted_price"),
        call_udf("upper_func", col("p_brand")).as("brand_upper"))
      .orderBy("p_partkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_udf" -> (udfShowcase _))

  val oracles: Map[String, String] = Map(
    "q18_udf" ->
      """SELECT p_partkey, p_retailprice,
         p_retailprice * 0.90 AS discounted_price,
         upper(p_brand) AS brand_upper
         FROM part ORDER BY p_partkey""")
}
