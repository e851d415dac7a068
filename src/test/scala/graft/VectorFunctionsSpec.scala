package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, VectorFunctions}

/** The native DotProductF expression must be arithmetic-identical to the
  * interpreted aggregate(zip_with(...)) formulation it replaced (sequential
  * double accumulation), in both codegen and interpreted eval paths. */
class VectorFunctionsSpec extends AnyFunSuite with SparkSuite {

  private def vecDf = {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    val rows = Seq(
      Row(1, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      Row(2, Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.66f)),
      Row(3, Array.fill(64)(0.123f), Array.fill(64)(-0.456f)),
      Row(4, Array.empty[Float], Array.empty[Float]))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("dotF matches interpreted zip_with/aggregate exactly") {
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val out = vecDf
      .select(col("id"), VectorFunctions.dotF(col("a"), col("b")).as("native"),
        hof.as("interp"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"id=${r.getInt(0)}: native=${r.getDouble(1)} interp=${r.getDouble(2)}")
    }
  }

  test("dotF known value and null propagation") {
    val out = vecDf.select(col("id"),
      VectorFunctions.dotF(col("a"), col("b")).as("d")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out(1) == (1.0 * 4 + 2.0 * 5 + 3.0 * 6))
    assert(out(4) == 0.0)
    val n = vecDf.select(
      VectorFunctions.dotF(lit(null).cast(ArrayType(FloatType)), col("b"))
        .as("d")).collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("vec_dot is SQL-addressable after extension registration") {
    GraftExtensions.register(spark)
    vecDf.createOrReplaceTempView("vecs")
    val out = spark.sql(
      "SELECT id, vec_dot(a, b) AS d FROM vecs WHERE id = 1").collect()
    assert(out.head.getDouble(1) == 32.0)
  }

  test("dotF reads double arrays as doubles (mixed widths too)") {
    // regression: ArrayData slots are 8 bytes for double arrays — a
    // getFloat read there returns garbage, not a rounded value
    val d = vecDf.select(col("id"), col("a"),
      transform(col("a"), _.cast("double")).as("ad"),
      transform(col("b"), _.cast("double")).as("bd"), col("b"))
    val out = d.select(col("id"),
      VectorFunctions.dotF(col("ad"), col("bd")).as("dd"),
      VectorFunctions.dotF(col("a"), col("bd")).as("fd"),
      VectorFunctions.dotF(col("a"), col("b")).as("ff")).collect()
    out.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(3),
        s"id=${r.getInt(0)}: double-double=${r.getDouble(1)} float-float=${r.getDouble(3)}")
      assert(r.getDouble(2) == r.getDouble(3),
        s"id=${r.getInt(0)}: float-double=${r.getDouble(2)} float-float=${r.getDouble(3)}")
    }
  }

  test("l2normF equals sqrt of self-dot") {
    val out = vecDf.select(
      VectorFunctions.l2normF(col("a")).as("n"),
      sqrt(VectorFunctions.dotF(col("a"), col("a"))).as("m")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }
}
