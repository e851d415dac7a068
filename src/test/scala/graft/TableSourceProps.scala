package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Fuzz of the streaming table source's exactly-once contract: against a
  * RANDOM commit history (appends, copy-on-write updates/deletes,
  * deletion-vector DML, OPTIMIZE, mode flips), draining the cdc feed
  * after every commit and FOLDING the accumulated change rows must
  * reconstruct the live table exactly — if the source ever skips a
  * version, double-delivers one, or emits a wrong-typed row, the fold
  * diverges. The fold is the standard CDF apply: per key, the latest
  * change wins (delete removes, insert/postimage upserts), ordered by
  * arrival batch. */
class TableSourceProps extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("cdc stream folds to the live table under random commit histories") {
    (1 to 2).foreach { c =>
      val cat = new graft.catalog.Catalog(spark, tmpDir(s"graft-tsp$c"))
      val tbl = "src"
      cat.create(Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("id", "v"),
        "silver", tbl)
      val dir = cat.path("silver", tbl)
      val ckpt = tmpDir(s"tsp-ckpt$c")
      val out = tmpDir(s"tsp-out$c") + "/sink"

      // accumulate (batch_seq, id, v, change) via a parquet sink; the
      // batch sequence comes from a monotonically increasing drain count
      var drainNo = 0
      def drain(): Unit = {
        drainNo += 1
        val q = spark.readStream.format("graft-table")
          .option("path", dir).option("feed", "cdc").option("keys", "id")
          .load()
          .withColumn("__drain", lit(drainNo))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
      }

      def fold(): Map[Long, Long] = {
        val rows = spark.read.parquet(out)
          .select("__drain", "id", "v", "_change_type")
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
            r.getString(3)))
          .sortBy(t => t._1) // arrival order; within a drain see below
        var state = Map.empty[Long, Long]
        // within one drain the keyed diff has at most one net change per
        // key; apply deletes/preimages first, then inserts/postimages
        rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, batch) =>
          batch.filter(t => t._4 == "delete").foreach(t =>
            state -= t._2)
          batch.filter(t => t._4 == "insert" || t._4 == "update_postimage")
            .foreach(t => state += t._2 -> t._3)
        }
        state
      }

      drain() // initial snapshot
      val ops = sample(Gen.listOfN(8, Gen.chooseNum(0, 4)), c * 97L)
      ops.zipWithIndex.foreach { case (op, i) =>
        op match {
          case 0 => // append fresh ids
            cat.append(Seq((100L + i, i.toLong)).toDF("id", "v"),
              "silver", tbl)
          case 1 => // copy-on-write update
            cat.updateWhere("silver", tbl, col("id") % 2 === 0,
              Seq("v" -> (col("v") + 10L)))
          case 2 => // deletion-vector delete (mode on for this statement)
            cat.enableDeletionVectors("silver", tbl)
            cat.deleteWhere("silver", tbl, col("id") % 5 === (i % 5).toLong)
            cat.disableDeletionVectors("silver", tbl)
          case 3 => // OPTIMIZE (contents unchanged — must emit NO changes)
            cat.compact("silver", tbl, targetFileSize = 1L << 20)
          case 4 => // copy-on-write delete
            cat.deleteWhere("silver", tbl, col("id") % 7 === (i % 7).toLong)
        }
        drain()
        val live = cat.read("silver", tbl).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(fold() == live,
          s"case $c op $i (#$op): folded cdc stream diverged from table")
      }
    }
  }
}
