package graft

import org.apache.spark.sql.functions._

import graft.ingest.Ingest
import graft.ingest.Ingest.IngestSpec

/** Incremental ingest semantics (SURVEY.md §2.9 T1-T3): a second run picks
  * up ONLY files that arrived after the first run's checkpoint. */
class IngestSpecSuite extends SparkSuite {
  import spark.implicits._

  test("runOnce is incremental + exactly-once across runs; schema pinned; _rescued_data added") {
    val root = tmpDir("graft-ingest")
    val src = s"$root/landing"
    val spec = IngestSpec("events", src, s"$root/bronze/events",
      s"$root/_checkpoints/events", s"$root/_schemas/events.ddl")

    // batch 1: two files land
    Seq((1L, "click"), (2L, "view")).toDF("id", "etype")
      .write.mode("append").parquet(src)
    val n1 = Ingest.runOnce(spark, spec)
    assert(n1 == 2L)

    // re-run with nothing new: no duplicates (exactly-once)
    assert(Ingest.runOnce(spark, spec) == 0L)

    // batch 2: one more file lands; only it is processed
    Seq((3L, "click")).toDF("id", "etype")
      .write.mode("append").parquet(src)
    assert(Ingest.runOnce(spark, spec) == 1L)

    val bronze = Ingest.readBronze(spark, spec.dstDir)
    assert(bronze.count() == 3L)
    assert(bronze.columns.contains("_rescued_data"))
    // schema file pinned
    assert(new java.io.File(spec.schemaFile).exists())
  }

  test("fan-out runAll ingests every spec (parameters.py loop)") {
    val root = tmpDir("graft-ingest2")
    val specs = Seq("a", "b").map { n =>
      Seq((1L, n)).toDF("id", "tag").write.mode("append").parquet(s"$root/land/$n")
      IngestSpec(n, s"$root/land/$n", s"$root/bronze/$n",
        s"$root/_cp/$n", s"$root/_schemas/$n.ddl")
    }
    assert(Ingest.runAll(spark, specs) == Map("a" -> 1L, "b" -> 1L))
  }
}
