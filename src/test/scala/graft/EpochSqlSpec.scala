package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.PipelineEpoch
import graft.sql.GraftSql

/** SQL surface for cross-table epoch reads —
  * `SELECT * FROM pipeline_epoch('pipe'[, n], 'layer.table')` and the
  * `pipeline_epochs('pipe', 'layer.table')` audit listing, through BOTH
  * parser paths (the session extension and extension-less
  * [[GraftSql.sql]]). The semantic pin: while a pipeline is mid-commit
  * (dim advanced, fact not), direct SQL reads show the mixed state but
  * epoch reads stay one complete generation. */
class EpochSqlSpec extends SparkSuite {
  import spark.implicits._

  private val Pipe = "medallion"

  /** Dedicated session WITH the parser extension (a parser cannot be
    * injected into an already-built SessionState) — MergeSqlSpec's
    * discipline, both session pointers restored. */
  private lazy val sqlSpark: SparkSession = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-epoch-sql-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("pipeline_epoch pins one generation across tables while a " +
      "mid-commit pipeline shows mixed state to direct reads; " +
      "pipeline_epochs lists every retained manifest; both parser " +
      "paths agree") {
    val s = sqlSpark
    import s.implicits._
    val cat = new graft.catalog.Catalog(s, tmpDir("graft-epoch-sql"))
    cat.create(Seq((1L, "a"), (2L, "b")).toDF("id", "attr"),
      "gold", "edim")
    cat.create(Seq(("a", 1L), ("b", 1L)).toDF("attr", "n"),
      "gold", "efact")
    cat.register("gold", "edim")
    cat.register("gold", "efact")
    PipelineEpoch.commit(s, cat, Pipe, Seq("gold.edim", "gold.efact"))

    // generation-2 run commits the dim… and stalls before the fact
    cat.overwriteSnapshot(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "attr"),
      "gold", "edim")
    assert(s.sql("SELECT * FROM gold.edim").count() == 3) // mixed, direct
    // …but the epoch TVF reads ONE complete generation for both tables
    val dim1 = s.sql(
      s"SELECT * FROM pipeline_epoch('$Pipe', 'gold.edim')")
    val fact1 = s.sql(
      s"SELECT * FROM pipeline_epoch('$Pipe', 'gold.efact')")
    assert(dim1.count() == 2 && fact1.count() == 2)

    // fact commits, epoch 2 publishes → current-epoch reads move to
    // gen 2 as a unit; the explicit-epoch form still reads gen 1
    cat.overwriteSnapshot(
      Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("attr", "n"),
      "gold", "efact")
    PipelineEpoch.commit(s, cat, Pipe, Seq("gold.edim", "gold.efact"))
    assert(s.sql(
      s"SELECT * FROM pipeline_epoch('$Pipe', 'gold.edim')").count() == 3)
    assert(s.sql(
      s"SELECT * FROM pipeline_epoch('$Pipe', 1, 'gold.edim')")
      .count() == 2)
    assert(s.sql(
      s"SELECT * FROM pipeline_epoch('$Pipe', 1, 'gold.efact')")
      .count() == 2)

    // audit listing: (epoch, table_name, version) for both epochs
    val audit = s.sql(
      s"SELECT * FROM pipeline_epochs('$Pipe', 'gold.edim')")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(audit == Set((1, "gold.edim", 1), (1, "gold.efact", 1),
      (2, "gold.edim", 2), (2, "gold.efact", 2)), s"audit: $audit")

    // epoch DISCOVERY: one row per epoch with commit metadata — the
    // entry point an auditor uses before picking a number to read at
    val hist = s.sql(
      s"SELECT * FROM pipeline_epoch_history('$Pipe', 'gold.edim')")
      .collect().map(r => (r.getInt(0), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getTimestamp(1)))
    assert(hist.map(h => (h._1, h._2, h._3, h._4)).toSeq ==
      Seq((1, 2, 1, 1), (2, 2, 2, 2)), s"history: ${hist.toSeq}")
    // commit times are real and ordered with the epochs
    assert(!hist(0)._5.after(hist(1)._5))

    // the extension-less entry point resolves the same statements
    assert(GraftSql.sql(s,
      s"SELECT * FROM pipeline_epoch('$Pipe', 1, 'gold.edim')")
      .count() == 2)
    assert(GraftSql.sql(s,
      s"SELECT * FROM pipeline_epochs('$Pipe', 'gold.edim')")
      .count() == 4)
    assert(GraftSql.sql(s,
      s"SELECT * FROM pipeline_epoch_history('$Pipe', 'gold.edim')")
      .count() == 2)

    // unknown epoch / non-member table fail loudly
    intercept[Exception] {
      s.sql(s"SELECT * FROM pipeline_epoch('$Pipe', 9, 'gold.edim')")
        .collect()
    }
  }
}
