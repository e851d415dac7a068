package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog

/** `GENERATED ALWAYS AS IDENTITY`: materialization, watermark-continuing
  * assignment on INSERT/append/overwrite, ALWAYS enforcement, and the
  * ALTER TABLE statement. */
class IdentitySpec extends SparkSuite {
  import spark.implicits._

  test("addIdentityColumn materializes; appends continue above the watermark") {
    val cat = new Catalog(spark, tmpDir("graft-ident"))
    cat.overwriteSnapshot(Seq("a", "b", "c").toDF("v"), "silver", "i1")
    cat.addIdentityColumn("silver", "i1", "rid", start = 100L, step = 10L)
    val v1 = cat.read("silver", "i1")
    assert(v1.columns.toSeq == Seq("v", "rid"))
    val ids1 = v1.select("rid").as[Long].collect().sorted.toSeq
    assert(ids1 == Seq(100L, 110L, 120L), s"materialized ids: $ids1")
    // an append that omits the column gets fresh ids above the watermark
    cat.append(Seq("d", "e").toDF("v"), "silver", "i1")
    val ids2 = cat.read("silver", "i1").select("rid")
      .as[Long].collect().sorted.toSeq
    assert(ids2 == Seq(100L, 110L, 120L, 130L, 140L), s"appended ids: $ids2")
    // ids are unique across further appends
    cat.append(Seq("f").toDF("v"), "silver", "i1")
    val all = cat.read("silver", "i1").select("rid").as[Long].collect().toSeq
    assert(all.distinct.length == all.length)
    assert(all.max == 150L)
  }

  test("rewrites carrying the column preserve it; INSERT cannot provide it") {
    val cat = new Catalog(spark, tmpDir("graft-ident-sql"))
    cat.overwriteSnapshot(Seq((1L, "a")).toDF("id", "v"), "silver", "i2")
    cat.register("silver", "i2")
    graft.sql.GraftSql.sql(spark,
      "ALTER TABLE silver.i2 ADD COLUMN rid BIGINT GENERATED ALWAYS AS " +
        "IDENTITY (START WITH 5 INCREMENT BY 1)")
    assert(rowsOf(spark.table("silver.i2")) == Seq(Seq(1L, "a", 5L)))
    // positional INSERT skips the identity column (assigned at write)
    graft.sql.GraftSql.sql(spark, "INSERT INTO silver.i2 VALUES (2, 'b')")
    assert(rowsOf(spark.table("silver.i2"), "id") ==
      Seq(Seq(1L, "a", 5L), Seq(2L, "b", 6L)))
    // ALWAYS: providing a value is rejected, table untouched
    val e = intercept[IllegalArgumentException] {
      graft.sql.GraftSql.sql(spark,
        "INSERT INTO silver.i2 (id, v, rid) VALUES (3, 'c', 999)")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS AS IDENTITY"))
    assert(spark.table("silver.i2").count() == 2)
    // OPTIMIZE rewrites carry the column through unchanged
    graft.sql.GraftSql.sql(spark, "OPTIMIZE silver.i2")
    assert(rowsOf(spark.table("silver.i2"), "id") ==
      Seq(Seq(1L, "a", 5L), Seq(2L, "b", 6L)))
    // DESCRIBE DETAIL surfaces the identity definition
    assert(graft.sql.GraftSql.sql(spark, "DESCRIBE DETAIL silver.i2")
      .collect()(0).getAs[String]("identity_columns") ==
      "rid IDENTITY (START WITH 5 INCREMENT BY 1)")
    // identity columns resist rename/drop while recorded
    intercept[IllegalArgumentException] {
      cat.renameColumn("silver", "i2", "rid", "rid2")
    }
    cat.dropIdentityColumn("silver", "i2", "rid")
    cat.renameColumn("silver", "i2", "rid", "rid2") // ordinary column now
    assert(spark.table("silver.i2").columns.contains("rid2"))
    spark.sql("DROP TABLE silver.i2")
  }

  test("identity guards: duplicate, existing column, bad step") {
    val cat = new Catalog(spark, tmpDir("graft-ident-guard"))
    cat.overwriteSnapshot(Seq((1L, "a")).toDF("id", "v"), "silver", "i3")
    cat.addIdentityColumn("silver", "i3", "rid")
    intercept[IllegalArgumentException] {
      cat.addIdentityColumn("silver", "i3", "rid") }
    intercept[IllegalArgumentException] {
      cat.addIdentityColumn("silver", "i3", "id") } // column exists in data
    intercept[IllegalArgumentException] {
      cat.addIdentityColumn("silver", "i3", "r2", step = 0L) }
    // overwrite omitting the column re-assigns above the old watermark
    // (monotone across snapshot replaces, Delta's high-water contract)
    cat.overwriteSnapshot(Seq("z", "w").toDF("v"), "silver", "i3",
      allowSchemaChange = true)
    val ids = cat.read("silver", "i3").select("rid")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(2L, 3L), s"post-overwrite ids: $ids")
  }
}
