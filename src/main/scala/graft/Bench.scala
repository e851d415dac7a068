package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: first Spark action in a JVM pays ~4s of classloading
    // + codegen compilation that has nothing to do with any query's cost.
    locally {
      import org.apache.spark.sql.functions._
      val w = spark.read.parquet(s"$sfDir/region.parquet")
      w.join(w.select("r_regionkey").limit(1), Seq("r_regionkey"), "left")
        .groupBy("r_name").count().orderBy("r_name").count()
      // warm the interpreted higher-order-function + regexp + md5 paths
      // the text/dedup queries lean on
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        .select(col("doc_id"), explode(array_distinct(
          graft.functions.TextFunctions.shingles3(col("text")))).as("s"))
        .withColumn("h", md5(col("s")))
        .groupBy("h").count().count()
      // warm the Structured Streaming machinery (MicroBatchExecution,
      // state store, memory sink) that q26 exercises; the file source
      // wants a directory, so stage the small fixture into a temp dir
      val stage = java.nio.file.Files.createTempDirectory("graft-warm")
      val srcF = java.nio.file.Paths.get(s"$sfDir/region.parquet")
      val dstF = stage.resolve("region.parquet")
      try java.nio.file.Files.createLink(dstF, srcF)
      catch { case _: Exception => java.nio.file.Files.copy(srcF, dstF) }
      graft.streaming.Streams.runToMemory(
        spark.readStream
          .schema(spark.read.parquet(s"$sfDir/region.parquet").schema)
          .parquet(stage.toString)
          .groupBy("r_name").count(), "graft_warmup_stream").count()
    }
    // Timed runs per query, report the min: a single-shot number on a
    // shared VM folds transient host contention into the engine's score.
    // Three reps (was two): round-2's flagged 3-5x per-query swings were
    // traced with graft.TimeQ to first-run JIT/codegen/page-cache effects —
    // steady state needs the first run discarded AND one spare against a
    // contention spike landing on the second (see BENCH_NOTES.md).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    var failed = List.empty[String]
    // sorted by query name: stable key order makes round-over-round BENCH
    // diffs line up; 3-decimal rounding keeps the single JSON line short
    // enough that log captures don't truncate it (sub-ms digits are noise
    // next to the host's run-to-run variance anyway)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          if (!failed.contains(name)) failed ::= name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // Locale.ROOT: f"" interpolation uses the JVM default locale, which on
    // comma-decimal locales (de_DE, fr_FR, ...) would emit "1,234" and break
    // the single-line JSON contract this main exists to serve.
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // The driver's log capture truncates long stdout lines (round 6 lost
    // 60 of 138 queries from BENCH_r06.json) — persist the full line to a
    // file as the durable copy. Best-effort: a read-only CWD must not fail
    // the bench itself.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] bench_out.json write failed: $e") }
    spark.stop()
  }
}
