package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftShims, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.streaming.OutputMode

import graft.catalog.Catalog

/** Streaming SINK into a graft-versioned table — Delta's
  * `writeStream.format("delta")` parity (the reference platform's Bronze
  * layer streams INTO managed tables; ref `Bronze_Layer.py` does this via
  * Auto Loader + Delta, see SURVEY §3.1). Together with
  * [[GraftTableSource]] this closes the loop: a medallion pipeline can
  * stream table→table end-to-end with exactly-once versioned commits on
  * both sides.
  *
  * ```
  * df.writeStream.format("graft-table")
  *   .option("path", dir)              // table directory
  *   .option("keepVersions", "10")     // version-log retention
  *   .outputMode("append" | "complete")
  *   .option("checkpointLocation", ckpt)
  *   .start()
  * ```
  *
  * Exactly-once: each micro-batch commits ONE table version stamped with
  * a `stream_epoch_<queryId>` commit tag carrying the epoch id. On a
  * checkpoint-recovery replay (engine re-delivers the last epoch after a
  * crash between sink commit and checkpoint commit), the sink reads the
  * newest tag for its query id and skips any epoch it already committed —
  * Delta's idempotent-txn (appId, version) rule with the version log as
  * the txn store. The tag is probed through retained history, so
  * `keepVersions` must cover the maximum crash-to-restart gap times the
  * table's commit rate (the same retention contract the SOURCE documents
  * for offset replay).
  *
  * - `append` (default): each epoch's rows become one versioned APPEND —
  *   O(new data) staging plus O(file count) hard links, never a table
  *   rewrite. CHECK constraints, generated and identity columns apply to
  *   the appended rows exactly as they do for batch `INSERT INTO`.
  * - `complete`: each epoch REPLACES the table (streaming aggregate
  *   results — the engine re-emits the full state, so the table is the
  *   current aggregate; Delta's complete-mode semantics). Versioned like
  *   any overwrite: time travel across epochs works.
  * - `update` is refused at sink-construction time (no keyed merge target
  *   semantics in a generic sink — Delta refuses identically; pipelines
  *   that need keyed upserts use `foreachBatch` + MERGE, which
  *   [[Streams.applyChangesScd2]] wraps declaratively).
  *
  * Targets SNAPSHOT tables (flat or hive-partitioned). Bucket-partitioned
  * layouts are refused by the underlying append (per-bucket history has
  * no epoch-tag store — [[Catalog.appendPath]] documents the boundary);
  * a streaming pipeline lands in a snapshot table and a batch
  * `PartitionedMerge` promotes downstream.
  *
  * Scale: per epoch the sink does one idempotence probe (driver-side tag
  * read), one distributed write of the epoch's rows, and one O(file
  * count) link-commit. Nothing is proportional to table size in append
  * mode, so an always-on ingest stream's cost stays O(arriving data) —
  * with version retention bounding the log exactly as for batch appends.
  */
class GraftTableSink(sqlContext: SQLContext, dir: String,
    outputMode: OutputMode, partitionCols: Seq[String],
    keepVersions: Int) extends Sink {

  private val spark = sqlContext.sparkSession

  /** Tag key scoping epoch idempotence to THIS query: concurrent streams
    * into one table track independent epochs (Delta's per-appId txn
    * versions). The engine publishes the query id as a local property
    * during addBatch; a direct programmatic call (tests, backfills) falls
    * back to a stable default. */
  private def epochTagKey: String = {
    val qid = Option(spark.sparkContext
      .getLocalProperty(org.apache.spark.sql.execution.streaming
        .runtime.StreamExecution.QUERY_ID_KEY))
    s"stream_epoch_${qid.getOrElse("default")}"
  }

  // The whole epoch commit runs under bounded optimistic retry: a batch
  // table writer (an OPTIMIZE, a takedown DELETE) racing the stream's
  // target must not kill the query — every attempt re-reads the epoch
  // tag and the live files, so a retry rebases exactly-once onto the
  // interleaved commit (the [[Catalog.commitWithRetry]] contract; a
  // conflict is only ever raised BEFORE our version lands).
  override def addBatch(batchId: Long, data: DataFrame): Unit =
    Catalog.commitWithRetry(dir) {
      val tagKey = epochTagKey
      val already = Catalog.lastCommitTag(spark, dir, tagKey)
        .exists(_.toLong >= batchId)
      if (!already) { // replayed epoch: version already committed
        val batch = GraftShims.batchFrame(sqlContext, data)
        val tag = Some(tagKey -> batchId.toString)
        val f = new Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val exists = f.exists(new Path(dir))
        if (outputMode == OutputMode.Complete())
          Catalog.overwritePath(spark, batch, dir, partitionCols,
            keepVersions, commitTag = tag,
            operation = "STREAMING COMPLETE")
        else if (!exists)
          // first epoch creates the table, honoring partitionBy from the
          // writer (appendPath's first-load path would drop it)
          Catalog.overwritePath(spark, batch, dir, partitionCols,
            keepVersions, commitTag = tag, operation = "STREAMING APPEND")
        else
          Catalog.appendPath(spark, batch, dir, keepVersions,
            commitTag = tag, operation = "STREAMING APPEND")
      }
    }

  override def toString: String = s"GraftTableSink[$dir]"
}
