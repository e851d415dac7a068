package graft

import org.apache.spark.sql.functions._

/** `GENERATED ALWAYS AS` columns: materialization over existing data,
  * auto-computation on later writes, and the Delta consistency rule for
  * writer-provided values. */
class GeneratedSpec extends SparkSuite {
  import spark.implicits._

  test("add materializes over existing rows as a new version") {
    val cat = new graft.catalog.Catalog(spark, tmpDir("graft-gen"))
    cat.create(Seq((1L, 10.0), (2L, 25.0)).toDF("id", "price"),
      "silver", "g1")
    cat.addGeneratedColumn("silver", "g1", "price_band",
      "CASE WHEN price >= 20 THEN 'high' ELSE 'low' END")
    assert(cat.generatedColumns("silver", "g1").map(_._1) ==
      Seq("price_band"))
    assert(rowsOf(cat.read("silver", "g1"), "id") == Seq(
      Seq(1L, 10.0, "low"), Seq(2L, 25.0, "high")))
    assert(cat.currentVersion("silver", "g1") == 2)
    // pre-materialization state is still time-travelable (no column)
    assert(cat.readVersion("silver", "g1", 1).columns.toSeq ==
      Seq("id", "price"))
  }

  test("later writes compute the column when absent, validate when given") {
    val cat = new graft.catalog.Catalog(spark, tmpDir("graft-gen2"))
    cat.create(Seq((1L, 10.0)).toDF("id", "price"), "silver", "g2")
    cat.addGeneratedColumn("silver", "g2", "doubled", "price * 2")
    // writer omits the column → engine computes it
    cat.overwriteSnapshot(Seq((1L, 3.0), (2L, 4.0)).toDF("id", "price"),
      "silver", "g2")
    assert(rowsOf(cat.read("silver", "g2"), "id") == Seq(
      Seq(1L, 3.0, 6.0), Seq(2L, 4.0, 8.0)))
    // writer provides a CONSISTENT value → accepted
    cat.overwriteSnapshot(Seq((1L, 5.0, 10.0)).toDF("id", "price", "doubled"),
      "silver", "g2")
    // writer provides an INCONSISTENT value → the swap aborts
    val e = intercept[IllegalStateException] {
      cat.overwriteSnapshot(
        Seq((1L, 5.0, 99.0)).toDF("id", "price", "doubled"), "silver", "g2")
    }
    assert(e.getMessage.contains("__generated_doubled"))
    assert(rowsOf(cat.read("silver", "g2")) == Seq(Seq(1L, 5.0, 10.0)))
    // duplicate registration and data-column collisions refuse
    intercept[IllegalArgumentException] {
      cat.addGeneratedColumn("silver", "g2", "doubled", "price * 3")
    }
    intercept[IllegalArgumentException] {
      cat.addGeneratedColumn("silver", "g2", "price", "id * 1.0")
    }
    // dropping stops generation/validation; the data column remains
    cat.dropGeneratedColumn("silver", "g2", "doubled")
    assert(cat.generatedColumns("silver", "g2").isEmpty)
    cat.overwriteSnapshot(
      Seq((1L, 5.0, 99.0)).toDF("id", "price", "doubled"), "silver", "g2")
    assert(rowsOf(cat.read("silver", "g2")) == Seq(Seq(1L, 5.0, 99.0)))
  }

  test("schema-on-write: drifted overwrites are rejected, evolution is explicit") {
    val cat = new graft.catalog.Catalog(spark, tmpDir("graft-schema"))
    cat.create(Seq((1L, 10.0)).toDF("id", "price"), "silver", "s1")
    // same shape, different column ORDER and case → accepted
    cat.overwriteSnapshot(Seq((2.0, 5L)).toDF("PRICE", "id")
      .select(col("id"), col("PRICE")), "silver", "s1")
    // added column → rejected with the diff named
    val e1 = intercept[IllegalStateException] {
      cat.overwriteSnapshot(
        Seq((1L, 1.0, "x")).toDF("id", "price", "extra"), "silver", "s1")
    }
    assert(e1.getMessage.contains("added [extra]"))
    // type drift → rejected
    val e2 = intercept[IllegalStateException] {
      cat.overwriteSnapshot(Seq((1L, "oops")).toDF("id", "price"),
        "silver", "s1")
    }
    assert(e2.getMessage.contains("retyped [price"))
    // explicit evolution works, and RESTORE back across the change works
    cat.overwriteSnapshot(Seq((1L, 1.0, "x")).toDF("id", "price", "extra"),
      "silver", "s1", allowSchemaChange = true)
    cat.restore("silver", "s1", 2)
    assert(cat.read("silver", "s1").columns.toSeq == Seq("id", "PRICE"))
  }

  test("DESCRIBE DETAIL reports generated columns") {
    val cat = new graft.catalog.Catalog(spark, tmpDir("graft-gen3"))
    cat.create(Seq((1L, 2.0)).toDF("id", "price"), "silver", "g3")
    cat.register("silver", "g3")
    cat.addGeneratedColumn("silver", "g3", "cents",
      "CAST(price * 100 AS BIGINT)")
    val r = graft.sql.GraftSql.sql(spark, "DESCRIBE DETAIL silver.g3")
      .collect()(0)
    assert(r.getAs[String]("generated_columns") ==
      "cents AS (CAST(price * 100 AS BIGINT))")
    // the registration saw the widened schema
    assert(spark.table("silver.g3").columns.contains("cents"))
    spark.sql("DROP TABLE IF EXISTS silver.g3")
  }
}
