package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured-Streaming operators (SURVEY.md §2.9 extended past the
  * reference's ingest-only streaming): event-time windowed aggregation with
  * watermarks, and custom per-key state via mapGroupsWithState.
  *
  * Scale posture: windowed aggregation shuffles on (window, key) with
  * partial aggregation per micro-batch and state kept in the state store —
  * the watermark bounds state size, which is what makes the query viable on
  * an unbounded 100 TB/day stream. Stateful sessionization keys state by
  * user and relies on timeout-based eviction for the same reason.
  */
object Streams {

  /** Tumbling event-time window aggregate with a watermark over an
    * already-constructed (streaming) events frame with a `ts` timestamp.
    * With append mode the watermark closes windows; with complete mode on a
    * drained static source the result equals the batch aggregate. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Drain every available file through a streaming query into an
    * in-memory table and return its final contents (Trigger.AvailableNow +
    * complete mode → deterministic result for a static source).
    *
    * `statePartitions` clamps `spark.sql.shuffle.partitions` for the
    * drain window (restored after): a stateful micro-batch creates ONE
    * state store — its delta file, its commit, its fsync — per shuffle
    * partition per batch, so a run-once drain at the session's 32
    * inherits 32 state-store lifecycles for an aggregate whose state is a
    * few hundred keys. That per-drain constant is pure protocol cost
    * (VERDICT r8 #3: q26's micro-batch constant drifted 1.6→3.9 s across
    * rounds; the fsync fan-out is its largest IO-noise coupling). The
    * clamp only narrows the STATEFUL shuffle inside the stream — source
    * parallelism is unaffected — and a real deployment draining an
    * unbounded stream sizes this to key cardinality, not corpus size. */
  def runToMemory(df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete(),
      statePartitions: Int = 8): DataFrame = {
    val parent = df.sparkSession
    val key = "spark.sql.shuffle.partitions"
    // Drain on a CLONED session: the clamp is session-global, and a
    // set-then-restore on the caller's session holds the narrowed value
    // for the whole drain window — any concurrent query on that session
    // would silently plan its shuffles at the clamp (ADVICE r9). A
    // newSession shares the SparkContext + catalog but owns its conf, so
    // the clamp cannot leak; the memory-sink table registers in the
    // child session and is returned from there.
    val session = parent.newSession()
    // newSession starts from the DEFAULTS, not the parent's runtime conf —
    // carry every modifiable caller-set entry (timezone, AQE, state-store
    // settings) onto the child so the drain plans under the same session
    // semantics the caller's batch queries do (ADVICE r10); the clamp
    // below then overrides the one key it exists to narrow
    parent.conf.getAll.foreach { case (k, v) =>
      if (session.conf.isModifiable(k) &&
          scala.util.Try(session.conf.get(k)).toOption != Some(v))
        scala.util.Try(session.conf.set(k, v))
    }
    // non-numeric parent conf (never set, or set to a malformed value):
    // fall back to the clamp alone instead of throwing on toInt
    val parentN = scala.util.Try(parent.conf.get(key).toInt).toOption
    session.conf.set(key,
      math.min(parentN.getOrElse(statePartitions), statePartitions).toString)
    val df2 = org.apache.spark.sql.GraftShims.ofRows(
      session, df.queryExecution.analyzed)
    val q = df2.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    session.table(name)
  }

  /** Stream-stream interval join: each click matched to same-user views at
    * most 10 minutes older. Watermarks on BOTH sides are what bound the
    * join state store — without them every past row must be retained
    * forever; with them rows age out once the other stream's event time
    * passes (the property that keeps an unbounded 100 TB/day join viable). */
  def clickViewStreamJoin(clicks: DataFrame, views: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "30 minutes")
    val v = views
      .withColumnRenamed("ts", "view_ts")
      .withColumnRenamed("user_id", "view_user_id")
      .withWatermark("view_ts", "30 minutes")
    c.join(v, expr(
      """user_id = view_user_id AND
         ts >= view_ts AND ts <= view_ts + INTERVAL 10 MINUTES"""))
      .select(col("user_id"), col("ts").as("click_ts"), col("view_ts"))
  }

  /** Stream-stream LEFT OUTER interval join — attribution's other half:
    * views that got NO click inside the window must still emit (with
    * null click columns) so downstream conversion metrics see the full
    * denominator. Spark holds an unmatched left row in state until the
    * RIGHT stream's watermark passes the end of its join window — only
    * then is "no match" final — so the null-padded row emits exactly
    * once, late (the price of correctness on unbounded inputs), and both
    * sides' state stays O(watermark), never O(stream). The join range +
    * equality key are the same as the inner form; at scale both streams
    * hash-partition on user_id and state lives in the per-partition
    * store. */
  def viewClickOuterJoin(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views
      .withColumnRenamed("ts", "view_ts")
      .withColumnRenamed("user_id", "view_user_id")
      .withWatermark("view_ts", "30 minutes")
    val c = clicks.withWatermark("ts", "30 minutes")
    v.join(c, expr(
      """view_user_id = user_id AND
         ts >= view_ts AND ts <= view_ts + INTERVAL 10 MINUTES"""),
      "left_outer")
      .select(col("view_user_id").as("user_id"), col("view_ts"),
        col("ts").as("click_ts"))
  }

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class UserRunning(user_id: Long, n_events: Long)

  /** Custom keyed state (mapGroupsWithState): running per-user event count
    * maintained across micro-batches. */
  def runningUserCounts(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[Long, UserRunning](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + batch.size
          state.update(n)
          UserRunning(user, n)
      }
  }

  /** Streaming CDC apply (the reference's `dlt.apply_changes`,
    * Gold_Products.py:96-105, as a real stream): each micro-batch of
    * change rows is SCD2-merged into the managed dimension snapshot via
    * `foreachBatch`. Exactly-once comes from the checkpoint + the
    * snapshot-swap write being idempotent for a replayed batch (same hash
    * → no-op merge). At scale the merge inside the batch is the ordinary
    * [[graft.merge.MergeEngine]] join — or [[graft.merge.PartitionedMerge]]
    * when the dim is bucket-partitioned.
    *
    * CDC micro-batches routinely carry SEVERAL changes for the same key;
    * feeding them raw into the merge would fan out the join (MergeEngine
    * now raises on that). `sequenceBy` is DLT apply_changes' `sequence_by`:
    * each batch is first reduced to the latest change per key (row_number
    * over the keys ordered by the sequence columns descending). When empty,
    * the source is required to be key-unique per batch — MergeEngine's
    * guard enforces it.
    *
    * Ordering holds ACROSS batches too, not just within one: the sequence
    * columns ride along into the dimension (they are ordinary source
    * columns), so the current row stores the sequence it was applied at.
    * Each batch is compared against that stored sequence and changes at or
    * below it are dropped BEFORE the merge — a late-arriving or replayed
    * CDC file carrying an older change can no longer expire the newer
    * current row and install the stale version (DLT apply_changes'
    * out-of-order guarantee). Requires the sequence columns to be part of
    * the change schema, which they are by construction of `sequence_by`.
    *
    * `nBuckets`: when set, the dimension is stored bucket-partitioned by
    * `pmod(hash(keys), n)` and each micro-batch merges through
    * [[graft.merge.PartitionedMerge.prunedMerge]] — only bucket directories
    * containing changed keys are read and rewritten, the Delta-file-pruning
    * analogue that keeps per-batch I/O O(changed buckets) instead of
    * O(table). This is the 100 TB default for large dims; the full-snapshot
    * path remains for small unbucketed tables. */
  def applyChangesScd2(
      changes: DataFrame,
      cat: graft.catalog.Catalog,
      table: String,
      keys: Seq[String],
      tracked: Seq[String],
      skeyCol: String,
      checkpoint: String,
      now: org.apache.spark.sql.Column,
      sequenceBy: Seq[String] = Nil,
      nBuckets: Option[Int] = None): Unit = {
    import graft.merge.PartitionedMerge
    val tablePath = cat.path("gold", table)
    def readTarget(spark: org.apache.spark.sql.SparkSession): DataFrame =
      nBuckets match {
        case Some(_) => PartitionedMerge.read(spark, tablePath)
        case None => cat.read("gold", table)
      }
    def latestPerKey(batch: DataFrame): DataFrame =
      if (sequenceBy.isEmpty) batch
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)
          .orderBy(sequenceBy.map(c => col(c).desc): _*)
        batch.withColumn("__seq_rn", row_number().over(w))
          .filter(col("__seq_rn") === 1).drop("__seq_rn")
      }
    // Cross-batch ordering: drop changes whose sequence is <= the sequence
    // stored on the target's current row for that key. Tuple comparison via
    // struct ordering; unmatched keys (left-join nulls → null comparison)
    // coalesce to kept.
    def newerThanApplied(batch: DataFrame, target: DataFrame): DataFrame =
      if (sequenceBy.isEmpty) batch
      else {
        val applied = target.filter(col("is_current"))
          .select((keys.map(col) ++
            sequenceBy.map(c => col(c).as(s"__applied_$c"))): _*)
        batch.join(applied, keys, "left")
          .filter(coalesce(
            struct(sequenceBy.map(col): _*) >
              struct(sequenceBy.map(c => col(s"__applied_$c")): _*),
            lit(true)))
          .drop(sequenceBy.map(s"__applied_" + _): _*)
      }
    val q = changes.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // Transactional replay guard: foreachBatch re-delivers a batch when
        // the previous attempt crashed between the merge and the sink
        // commit. The marker (written AFTER the snapshot swap) makes the
        // re-delivery a no-op; a crash between swap and marker falls back
        // to the merge's own idempotence (same hash / not-newer sequence →
        // no-op), so both orders are safe.
        if (batchId > Streams.lastAppliedBatch(batch0.sparkSession, checkpoint)) {
        val batch = latestPerKey(batch0)
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          if (!cat.exists("gold", table)) {
            val initial = graft.merge.SurrogateKeys.assign(batch, skeyCol, keys)
              .withColumn("hash_value",
                graft.merge.MergeEngine.nullSafeHash(tracked.map(col)))
              .withColumn("effective_start_date", now)
              .withColumn("effective_end_date",
                lit(null).cast("timestamp"))
              .withColumn("is_current", lit(true))
              .withColumn("insert_date", now)
              .withColumn("update_date", now)
            nBuckets match {
              case Some(n) => PartitionedMerge.write(initial, tablePath, keys, n)
              case None => cat.create(initial, "gold", table)
            }
          } else {
            val target = readTarget(spark)
            val fresh = newerThanApplied(batch, target)
            if (!fresh.isEmpty) {
              nBuckets match {
                case Some(n) =>
                  // partition-pruned path: only buckets holding changed
                  // keys are scanned and swapped; the skey high-water mark
                  // still comes from the FULL table (column-pruned scan)
                  PartitionedMerge.prunedMerge(spark, tablePath, fresh, keys, n) {
                    (pruned, s) => graft.merge.MergeEngine.scd2(
                      pruned, s, keys, tracked, skeyCol, now,
                      skeyBase = Some(PartitionedMerge.read(spark, tablePath)))
                  }
                  ()
                case None =>
                  val merged = graft.merge.MergeEngine.scd2(
                    target, fresh, keys, tracked, skeyCol, now)
                  cat.overwriteSnapshot(merged, "gold", table)
              }
            }
          }
        }
        Streams.recordAppliedBatch(batch0.sparkSession, checkpoint, batchId)
        }
      }
      .start()
    q.awaitTermination()
  }

  private def appliedMarker(checkpoint: String) =
    new org.apache.hadoop.fs.Path(checkpoint, "__graft_last_applied")

  /** Highest batchId whose merge COMPLETED (marker written post-swap);
    * -1 when none. */
  private[graft] def lastAppliedBatch(
      spark: org.apache.spark.sql.SparkSession, checkpoint: String): Long = {
    val p = appliedMarker(checkpoint)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](32)
        var n = in.read(b)
        while (n > 0) { buf.write(b, 0, n); n = in.read(b) }
        new String(buf.toByteArray, "UTF-8").trim.toLong
      } finally in.close()
    }
  }

  private[graft] def recordAppliedBatch(
      spark: org.apache.spark.sql.SparkSession, checkpoint: String,
      batchId: Long): Unit = {
    val p = appliedMarker(checkpoint)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(checkpoint,
      "__graft_last_applied.tmp")
    val out = f.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new IllegalStateException(s"could not commit batch marker $p")
  }

  /** Streaming exact dedup (at-least-once source → effectively-once
    * output): `dropDuplicatesWithinWatermark` keys the state store by the
    * id columns and drops re-deliveries arriving within the watermark
    * delay. The watermark is what BOUNDS the dedup state — without it the
    * key set grows forever; with it a key is evicted once event time
    * passes, which is the property that keeps an unbounded 100 TB/day
    * stream viable (late re-deliveries beyond the delay are a source SLA,
    * not a state-size problem). */
  def dedupStream(events: DataFrame, idCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming materialized view: maintain a [[graft.pipeline
    * .MaterializedAgg]] from an append stream. `foreachBatch`'s batchId IS
    * the refresh id, and the aggregate stores its high-water mark in the
    * committed state itself — so when foreachBatch re-delivers a batch
    * after a crash between the state swap and the checkpoint commit, the
    * replay is dropped whole by [[graft.pipeline.MaterializedAgg.refresh]]
    * (no separate marker, nothing to disagree). Per-batch cost is
    * O(batch) + O(touched groups); the fact history is never re-read —
    * the streaming half of the materialized-view posture. */
  def maintainAgg(appends: DataFrame,
      ma: graft.pipeline.MaterializedAgg, checkpoint: String): Unit = {
    val q = appends.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ma.refresh(batch, batchId); ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming sink into a VERSIONED catalog table: each micro-batch
    * commits through [[graft.catalog.Catalog.appendPath]]'s link-append,
    * so every drained batch is a real version — time-travelable,
    * constraint-gated, identity-assigned, visible to the change feed —
    * unlike the raw file sink, whose appends are invisible to the version
    * log. Exactly-once, via TWO markers that jointly cover every crash
    * window: the batchId is stamped INTO the committed version itself (a
    * commit tag, visible atomically with the swap rename), and a
    * checkpoint-side marker is written after. A replay after a crash
    * between the swap and the checkpoint commit misses the cheap
    * checkpoint marker but finds its batchId already ON the table — so
    * the batch is dropped whole, not appended twice. Per-batch cost is
    * O(batch data + table file-count metadata) — the fact history is
    * never rewritten. */
  def appendStream(appends: DataFrame, tableDir: String,
      checkpoint: String): Unit = {
    val tagKey = commitTagKey(checkpoint)
    val q = appends.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (batchId > lastAppliedBatch(spark, checkpoint)) {
          val onTable = graft.catalog.Catalog
            .lastCommitTag(spark, tableDir, tagKey)
            .exists(_.toLong >= batchId)
          if (!onTable)
            graft.catalog.Catalog.appendPath(spark, batch, tableDir,
              commitTag = Some((tagKey, batchId.toString)),
              operation = "STREAMING APPEND")
          recordAppliedBatch(spark, checkpoint, batchId)
        }
      }
      .start()
    q.awaitTermination()
  }

  /** Stable per-checkpoint key for the table-side commit tag — two
    * streams appending to the same table must not read each other's
    * batch ids. */
  private[graft] def commitTagKey(checkpoint: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
    d.take(8).map(b => f"$b%02x").mkString
  }

  /** Dedup-on-ingest against the EXISTING corpus (the arrival-time half of
    * corpus curation: never append a document whose content is already
    * stored). Each micro-batch is reduced to one row per content hash
    * (lowest `idCol` wins — deterministic), then LEFT ANTI joined against
    * the corpus's persisted `content_hash` column; only novel rows append.
    *
    * Scale shape: the anti-join hash-partitions on the content hash; the
    * corpus side is a column-pruned scan of ONE string column (not the
    * documents themselves), and AQE broadcasts the batch when it measures
    * small. The corpus table is append-only (bronze posture) — no
    * snapshot rewrite, so ingest I/O is O(batch), not O(corpus). */
  def appendNewDocs(
      changes: DataFrame,
      cat: graft.catalog.Catalog,
      layer: String,
      table: String,
      contentCols: Seq[String],
      idCol: String,
      checkpoint: String): Unit = {
    val q = changes.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_hash")).orderBy(col(idCol))
        // NOT md5(concat_ws("|", cols)): concat_ws silently skips NULLs and
        // a "|" inside a value is injectable — ("x|y","z") and ("x","y|z")
        // would collide and one distinct document would be dropped forever.
        // Hashing each column to a FIXED-WIDTH digest first makes the
        // concatenation unambiguous with no separator to inject.
        val batch = batch0
          .withColumn("content_hash",
            sha2(concat(contentCols.map(c =>
              md5(coalesce(col(c).cast("string"),
                lit(graft.merge.MergeEngine.NullMark)))): _*), 256))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val novel =
          if (!cat.exists(layer, table)) batch
          else batch.join(
            cat.read(layer, table).select("content_hash"),
            Seq("content_hash"), "left_anti")
        if (!novel.isEmpty) {
          if (!cat.exists(layer, table))
            cat.create(novel, layer, table)
          else novel.write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(cat.path(layer, table))
        }
      }
      .start()
    q.awaitTermination()
  }

  /** Near-duplicate-aware streaming ingest — [[appendNewDocs]]'s
    * exact-hash gate upgraded to MinHash/LSH: an incoming document that
    * shares ANY of its 4 LSH band keys (12 minhash components, 3 per
    * band — q34's construction via
    * [[graft.functions.TextFunctions.lshBandKeysOfSet]], so batch and
    * streaming agree on what collides) with the EXISTING corpus is a
    * near-duplicate and is dropped; within a batch the lowest id per
    * colliding band survives. The drop is conservative (band collision
    * without Jaccard verification, transitive within a batch) — an
    * ingest gate prefers a false drop over admitting a near-copy; the
    * verified batch ACTION over an at-rest corpus is q102.
    *
    * Survivors append to the corpus table AND to the `<table>_bands`
    * (band_key, doc id) BAND INDEX table, so the next batch probes an
    * incrementally-maintained index — corpus text is never re-signed.
    *
    * Scale shape: per batch, O(batch · bands) signature work in one
    * projection, then one equi-join of the batch's slim (band_key, id)
    * rows against a column-pruned scan of the index — hash-partitioned
    * on band_key, AQE free to broadcast the batch side. Corpus and index
    * are append-only (bronze posture): ingest I/O is O(batch), not
    * O(corpus). */
  def appendNearDedup(
      changes: DataFrame,
      cat: graft.catalog.Catalog,
      layer: String,
      table: String,
      textCol: String,
      idCol: String,
      checkpoint: String): Unit = {
    val bandsTable = s"${table}_bands"
    val q = changes.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        import graft.functions.TextFunctions
        // cached: the band column feeds the in-batch window, the index
        // probe, AND the survivor writes — without the cache the 12
        // signatures recompute per consumer
        val batch = batch0
          .withColumn("__wset",
            array_distinct(TextFunctions.words(col(textCol))))
          .withColumn("__bands",
            TextFunctions.lshBandKeysOfSet(col("__wset")))
          .drop("__wset")
          .cache()
        try {
          val batchBands = batch.select(col(idCol),
            explode(col("__bands")).as("band_key"))
          // in-batch: on any shared band the lowest id survives
          val wMin = org.apache.spark.sql.expressions.Window
            .partitionBy(col("band_key"))
          val inBatchLosers = batchBands
            .withColumn("__keep", min(col(idCol)).over(wMin))
            .filter(col(idCol) =!= col("__keep"))
            .select(col(idCol)).distinct()
          // cross-batch: any band hit against the maintained index
          val indexHits =
            if (!cat.exists(layer, bandsTable)) inBatchLosers.limit(0)
            else batchBands.join(
              cat.read(layer, bandsTable).select("band_key"),
              Seq("band_key")).select(col(idCol)).distinct()
          val novel = batch.join(
            inBatchLosers.union(indexHits).distinct(),
            Seq(idCol), "left_anti")
          if (!novel.isEmpty) {
            val docs = novel.drop("__bands")
            val bands = novel.select(col(idCol),
              explode(col("__bands")).as("band_key"))
              .select(col("band_key"), col(idCol))
            if (!cat.exists(layer, table)) cat.create(docs, layer, table)
            else docs.write.mode(org.apache.spark.sql.SaveMode.Append)
              .parquet(cat.path(layer, table))
            if (!cat.exists(layer, bandsTable))
              cat.create(bands, layer, bandsTable)
            else bands.write.mode(org.apache.spark.sql.SaveMode.Append)
              .parquet(cat.path(layer, bandsTable))
          }
        } finally batch.unpersist()
      }
      .start()
    q.awaitTermination()
  }

  /** Decontamination GUARD at ingest — q235's semantic screen as an
    * ADMISSION gate (the streaming member of the decontamination ladder
    * q71/q146/q210/q235): every arriving doc's embedding probes a FIXED
    * benchmark-embedding table on the sign-LSH bucket key; a hit at or
    * above the cosine bar routes the doc — with its best bench match and
    * the cosine attached — to `<table>_quarantine` instead of the
    * corpus. The quarantine (not a silent drop) is the Expectations
    * discipline: contamination verdicts are audit material.
    *
    * Scale shape: the bench side is an eval suite — fixed-size by
    * construction, never corpus-scaled — so it broadcasts
    * unconditionally; the batch side pays one codegen'd
    * bucket+norm projection and a broadcast probe per micro-batch,
    * O(batch), no shuffle of the corpus and no state store (the gate is
    * stateless — the bench set alone decides).
    *
    * Exactly-once: both tables commit through
    * [[graft.catalog.Catalog.appendPath]] carrying the same
    * per-(checkpoint, batchId) commit tag [[appendStream]] uses — a crash
    * after either table's commit but before the checkpoint offset commit
    * replays the batch, finds its batchId already stamped on that table,
    * and skips it; the sibling table (whose commit the crash preempted)
    * commits on the replay. The other ingest sinks self-dedupe via
    * anti-joins; this guard has no natural content key on the quarantine
    * side, so the tag is the guard. */
  def appendDecontamGuard(
      changes: DataFrame,
      cat: graft.catalog.Catalog,
      layer: String,
      table: String,
      benchTable: String,
      embCol: String,
      idCol: String,
      checkpoint: String,
      thresh: Double = 0.25): Unit = {
    import graft.operators.Similarity
    val quarantineTable = s"${table}_quarantine"
    val tagKey = commitTagKey(checkpoint)
    val q = changes.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        if (batchId > lastAppliedBatch(spark, checkpoint)) {
        val bench = cat.read(layer, benchTable)
          .select(Similarity.signBucket(col(embCol), 4).as("__bucket"),
            col(idCol).as("__bench_id"), col(embCol).as("__bv"),
            Similarity.l2norm(col(embCol)).as("__bn"))
        // cached: the probe and the clean/quarantine splits all read it
        val batch = batch0
          .withColumn("__bucket", Similarity.signBucket(col(embCol), 4))
          .withColumn("__n", Similarity.l2norm(col(embCol)))
          .cache()
        try {
          val wBest = org.apache.spark.sql.expressions.Window
            .partitionBy(col(idCol))
            .orderBy(col("__cos").desc, col("__bench_id").asc)
          val flagged = batch.join(broadcast(bench), Seq("__bucket"))
            .withColumn("__cos",
              round(Similarity.dot(col(embCol), col("__bv")) /
                (col("__n") * col("__bn")), 6))
            .filter(col("__cos") >= thresh)
            .withColumn("__rn", row_number().over(wBest))
            .filter(col("__rn") === 1)
          val docCols = batch0.columns.toSeq
          val quarantined = flagged.select(docCols.map(col) ++ Seq(
            col("__bench_id").as("matched_bench_id"),
            col("__cos").as("bench_cos")): _*)
          val clean = batch
            .join(flagged.select(col(idCol)), Seq(idCol), "left_anti")
            .select(docCols.map(col): _*)
          // versioned commit per table with the batchId stamped as a
          // commit tag: a replayed batch that already landed on a table
          // is dropped whole there, never appended twice — the same
          // two-marker contract appendStream documents
          def appendTo(t: String, df: DataFrame): Unit =
            if (!df.isEmpty) {
              val dir = cat.path(layer, t)
              val onTable = graft.catalog.Catalog
                .lastCommitTag(spark, dir, tagKey)
                .exists(_.toLong >= batchId)
              if (!onTable)
                graft.catalog.Catalog.appendPath(spark, df, dir,
                  commitTag = Some((tagKey, batchId.toString)),
                  operation = "STREAMING APPEND")
            }
          appendTo(table, clean)
          appendTo(quarantineTable, quarantined)
          // cross-table atomic VISIBILITY for the pair: an epoch per
          // drained batch, so an auditor joining corpus and quarantine
          // through PipelineEpoch.read sees one batch generation, never
          // the clean half of batch N with the quarantine half of N−1
          // (each table's own commit is already exactly-once; the epoch
          // closes the between-commits read window)
          graft.pipeline.PipelineEpoch.commit(spark, cat,
            s"decontam_$table",
            Seq(s"$layer.$table", s"$layer.$quarantineTable"))
          recordAppliedBatch(spark, checkpoint, batchId)
        } finally batch.unpersist()
        }
      }
      .start()
    q.awaitTermination()
  }

  final case class PendingSessions(sessions: List[(Long, Long, Long)])
  final case class ClosedSession(user_id: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      n_events: Long)

  /** Event-time sessionization as custom keyed state
    * (flatMapGroupsWithState + EventTimeTimeout): per-user sessions with
    * an inactivity gap, emitted ONLY once the watermark has passed
    * `session_end + gap` — i.e. every output row is FINAL (append-mode
    * correct; no event admitted by the watermark can still extend it).
    *
    * State per key is the list of still-open sessions as (start, end, n)
    * intervals. Each batch folds its events in as singleton intervals and
    * re-merges the sorted list (neighbors closer than the gap collapse),
    * so out-of-order arrivals WITHIN the allowed lateness — including an
    * event that bridges two previously separate sessions — resolve to the
    * same sessions a batch run over the full history would produce.
    * Sessions whose close is behind the watermark emit and leave the
    * state; the rest schedule an event-time timeout at the earliest
    * possible close so idle keys still flush and state stays bounded by
    * the watermark horizon, not by history.
    *
    * Scale shape: state is O(open sessions per user) — bounded by
    * gap/watermark, independent of stream length; the shuffle is the
    * groupByKey on user_id, the same single exchange the windowed-agg
    * path pays. */
  def sessionizeStream(events: Dataset[UserEvent], gapSec: Long = 1800,
      watermark: String = "2 hours"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000L
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PendingSessions, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[UserEvent],
            state: GroupState[PendingSessions]) =>
          def mergeIntervals(xs: List[(Long, Long, Long)])
              : List[(Long, Long, Long)] =
            xs.sortBy(s => (s._1, s._2)).foldLeft(List.empty[(Long, Long, Long)]) {
              case (acc @ (s0, e0, n0) :: rest, (s1, e1, n1)) =>
                if (s1 - e0 <= gapMs)
                  (s0, math.max(e0, e1), n0 + n1) :: rest
                else (s1, e1, n1) :: acc
              case (Nil, iv) => iv :: Nil
            }.reverse
          val prior = state.getOption.map(_.sessions).getOrElse(Nil)
          val incoming = batch.map(e => (e.ts.getTime, e.ts.getTime, 1L)).toList
          val merged = mergeIntervals(prior ++ incoming)
          val wm = state.getCurrentWatermarkMs()
          // Spark's stateful late filter drops rows with eventTime <= the
          // current watermark (inclusive — observed empirically: at the
          // initial wm=0 an epoch-0 event never reaches this function), so
          // an admissible event has ts > wm and a session is final exactly
          // when end+gap <= wm: no deliverable event can still extend it.
          val (closed, pending) = merged.partition { case (_, e, _) =>
            e + gapMs <= wm }
          if (pending.isEmpty) state.remove()
          else {
            state.update(PendingSessions(pending))
            // earliest possible close; must sit strictly above the watermark
            val t = pending.map { case (_, e, _) => e + gapMs }.min
            state.setTimeoutTimestamp(math.max(t, wm + 1))
          }
          closed.iterator.map { case (s, e, n) =>
            ClosedSession(user, new java.sql.Timestamp(s),
              new java.sql.Timestamp(e), n)
          }
      }
  }

  final case class Threshold(user_id: Long, n_events: Long, crossed_at: Long)

  /** flatMapGroupsWithState — the 0-or-many-output stateful shape: emit a
    * record each time a user's cumulative event count crosses a multiple
    * of `every` (alert-style output; nothing emitted otherwise). State is
    * one counter per key; on a real stream an event-time timeout would
    * evict idle keys to bound the store. */
  def thresholdAlerts(events: Dataset[UserEvent], every: Long = 10)
      : Dataset[Threshold] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Threshold](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[Long]) =>
          val before = state.getOption.getOrElse(0L)
          val after = before + batch.size
          state.update(after)
          ((before / every + 1) to (after / every))
            .map(k => Threshold(user, k * every, after)).iterator
      }
  }

  final case class HashedDoc(doc_id: Long, content_hash: String)
  final case class DedupAudit(doc_id: Long, content_hash: String,
      is_first: Boolean, n_dups: Long)

  /** Streaming dedup audit on the Spark 4 `transformWithState` API (the
    * successor to mapGroupsWithState: named typed state variables,
    * per-state TTL, timers — RocksDB-backed). Every incoming document is
    * annotated: the first arrival of a content hash is `is_first`, later
    * arrivals carry the running duplicate count. Two state variables per
    * key demonstrate the API's split-lifetime design: the `seen` marker
    * expires after `ttl` (bounded store without a watermark column — the
    * dedup key here has no event time, which is exactly the case
    * `dropDuplicatesWithinWatermark` cannot cover), while the duplicate
    * counter is TTL-free audit state.
    *
    * After a key's `seen` marker expires, its next arrival re-reports
    * `is_first` — the standard bounded-memory trade: at 100 TB/day the
    * TTL horizon IS the dedup guarantee window, and the state store holds
    * O(distinct keys within TTL), not O(history).
    *
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`), the only backend
    * transformWithState supports. */
  class DedupAuditProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, HashedDoc, DedupAudit] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, ValueState}
    import org.apache.spark.sql.{Encoders, streaming => ss}
    @transient private var seen: ValueState[Boolean] = _
    @transient private var dups: ValueState[Long] = _
    override def init(outputMode: ss.OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig(ttl))
      dups = getHandle.getValueState[Long]("dups",
        Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: String, rows: Iterator[HashedDoc],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[DedupAudit] =
      rows.map { d =>
        if (!seen.exists()) {
          seen.update(true)
          DedupAudit(d.doc_id, key, is_first = true,
            Option(dups.get()).getOrElse(0L))
        } else {
          val n = Option(dups.get()).getOrElse(0L) + 1L
          dups.update(n)
          DedupAudit(d.doc_id, key, is_first = false, n)
        }
      }
  }

  /** groupByKey(content_hash) → transformWithState; processing-time mode
    * because state TTL (not event time) bounds the store. Note the mode's
    * operational shape: the query schedules micro-batches continuously
    * even without new data (the clock must advance for TTL/timers), so
    * drive it with a real trigger cadence in production and poll the sink
    * in tests — AvailableNow/processAllAvailable never see it "done". */
  def dedupAuditTws(docs: Dataset[HashedDoc],
      ttl: java.time.Duration): Dataset[DedupAudit] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.content_hash)
      .transformWithState(new DedupAuditProcessor(ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
