package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Join-based MERGE: the Delta-free upsert/SCD engine (SURVEY.md §4.3).
  *
  * The reference does all three Gold loads with Delta `MERGE INTO`
  * (SCD1: Gold_Customers.py:75-97; fact upsert: Gold_Orders.py:60-81;
  * SCD2: Gold_Products_No_Delta_Live.py:69-95). Without Delta jars the
  * equivalent relational program is a full-outer join between target and
  * source plus per-column conditional resolution — which is exactly what
  * Delta's own MergeIntoCommand plans internally after file pruning.
  *
  * Scale posture: the join shuffles both sides hash-partitioned on the merge
  * key — at 100 TB the win Delta adds is *file pruning* (only touched files
  * are rewritten). The equivalent here is partitioning the managed table by
  * a bucket of the key and rewriting only partitions containing source keys
  * (see graft.catalog.Catalog); the merge program below is unchanged by that,
  * it only narrows the `target` input. When the source batch is small it is
  * broadcast by AQE automatically, so the target never shuffles at all.
  *
  * Reference bugs deliberately fixed (SURVEY §2.10):
  *  - §2.10.2: single-MERGE SCD2 never re-inserts the new version of a
  *    changed key — `scd2` stages expire ∪ insert explicitly.
  *  - §2.10.4: `concat` null-propagation makes null attributes permanently
  *    un-updatable — `nullSafeHash` uses concat_ws over null-marked casts.
  *  - §2.10.9: `monotonically_increasing_id` surrogate keys are unstable
  *    across runs — inserts get `max(existing) + row_number` instead.
  */
object MergeEngine {

  /** Marker used for nulls inside the change-detection hash; concat_ws
    * would otherwise silently skip nulls ('a',null,'b' == 'ab','b'). */
  val NullMark = "<NULL>"

  /** Null-safe sha2-256 change-detection hash over tracked attributes
    * (replaces the reference's null-propagating concat, Gold_Customers.py:36-48). */
  def nullSafeHash(cols: Seq[Column]): Column =
    sha2(concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit(NullMark))): _*), 256)

  private def keyCond(keys: Seq[String]): Column =
    keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)

  /** Plan-embedded source-key-uniqueness guard. The full-outer merge join
    * FANS OUT on duplicate source keys — each target row matches every
    * duplicate, silently emitting multiple post-merge versions per key —
    * so fail loudly instead, exactly as Delta's MERGE INTO raises
    * `DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW`. Implemented as a
    * per-key window count feeding a raise_error wrapped INTO the first key
    * column: it cannot be column-pruned away, adds no driver-side action,
    * and the window's hash partitioning is on the same keys the merge join
    * shuffles on. Callers with genuinely multi-change sources must pick
    * one row per key first (see Streams.applyChangesScd2's sequenceBy). */
  private def requireUniqueKeys(source: DataFrame, keys: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    val k = keys.head
    source
      .withColumn("__key_rows", count(lit(1)).over(w))
      .withColumn(k,
        when(col("__key_rows") > 1, raise_error(concat(
          lit("MergeEngine: duplicate source rows for merge key ("),
          concat_ws(", ", keys.map(c => col(c).cast("string")): _*),
          lit(") — the merge join would fan out; dedupe the source to one row per key first"))))
          .otherwise(col(k)))
      .drop("__key_rows")
  }

  private def sPresent(keys: Seq[String]): Column = col(s"s.${keys.head}").isNotNull
  private def tPresent(keys: Seq[String]): Column = col(s"t.${keys.head}").isNotNull

  /** Next-surrogate-key source: scalar max over the target, broadcast into
    * the insert branch lazily (no driver-side action, stays one plan).
    * Partition-pruned merges pass the FULL table as `skeyBase` so the
    * high-water mark is global even though the merge target is a slice
    * (a column-pruned scan of just the skey column — cheap). */
  private def withNewKeys(inserts: DataFrame, target: DataFrame, skeyCol: String,
      orderCols: Seq[String]): DataFrame = {
    val maxKey = target.agg(coalesce(max(col(skeyCol)), lit(0L)).as("__max_skey"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderCols.map(col): _*)
    // row_number over a global window is a single-partition sort — fine for
    // an insert *batch* (small relative to the table); never applied to the
    // full target.
    inserts.crossJoin(broadcast(maxKey))
      .withColumn(skeyCol, (col("__max_skey") + row_number().over(w)).cast(LongType))
      .drop("__max_skey")
  }

  /** Fact-table upsert (Gold_Orders.py:60-81): matched → update data columns
    * and touch `updated_dt`; not matched → insert with both audit stamps.
    * Target rows without a source match pass through untouched.
    *
    * @param target  current snapshot: keys ++ data ++ (created_dt, updated_dt)
    * @param source  update batch: keys ++ data
    * @param now     audit timestamp (injectable for deterministic tests)
    */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String],
      now: Column = current_timestamp()): DataFrame = {
    val dataCols = source.columns.filterNot(keys.contains).toSeq
    val src = requireUniqueKeys(source, keys)
    val j = target.alias("t").join(src.alias("s"), keyCond(keys), "full_outer")
    val sp = sPresent(keys)
    val keyOut = keys.map(k => coalesce(col(s"s.$k"), col(s"t.$k")).as(k))
    val dataOut = dataCols.map(c => when(sp, col(s"s.$c")).otherwise(col(s"t.$c")).as(c))
    val audit = Seq(
      when(tPresent(keys), col("t.created_dt")).otherwise(now).as("created_dt"),
      when(sp, now).otherwise(col("t.updated_dt")).as("updated_dt"))
    j.select(keyOut ++ dataOut ++ audit: _*)
  }

  /** SCD Type-1 dimension merge (Gold_Customers.py:75-97): matched + hash
    * changed → overwrite attributes in place, keep the target's surrogate
    * key and created_date, mark change_type='U'; brand-new keys → insert
    * with change_type='I' and a durable new surrogate key.
    *
    * @param target  keys ++ attrs ++ (skey, created_date, updated_date,
    *                change_type, hash_value)
    * @param source  keys ++ attrs
    * @param tracked attribute subset feeding the change hash
    */
  def scd1(target: DataFrame, source: DataFrame, keys: Seq[String],
      tracked: Seq[String], skeyCol: String = "customer_skey",
      now: Column = current_timestamp(),
      skeyBase: Option[DataFrame] = None): DataFrame = {
    val attrs = source.columns.filterNot(keys.contains).toSeq
    val src = requireUniqueKeys(source, keys)
      .withColumn("__hash", nullSafeHash(tracked.map(col)))
    val j = target.alias("t").join(src.alias("s"), keyCond(keys), "full_outer")
    val sp = sPresent(keys); val tp = tPresent(keys)
    val changed = sp && tp && (col("t.hash_value") =!= col("s.__hash"))

    val existing = j.filter(tp).select(
      keys.map(k => col(s"t.$k").as(k)) ++
      attrs.map(c => when(changed, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)) ++
      Seq(col(s"t.$skeyCol").as(skeyCol),
        col("t.created_date").as("created_date"),
        when(changed, now).otherwise(col("t.updated_date")).as("updated_date"),
        when(changed, lit("U")).otherwise(col("t.change_type")).as("change_type"),
        when(changed, col("s.__hash")).otherwise(col("t.hash_value")).as("hash_value")): _*)

    val inserts0 = j.filter(sp && !tp).select(
      keys.map(k => col(s"s.$k").as(k)) ++
      attrs.map(c => col(s"s.$c").as(c)) ++
      Seq(now.as("created_date"), now.as("updated_date"),
        lit("I").as("change_type"), col("s.__hash").as("hash_value")): _*)
    val inserts = withNewKeys(inserts0, skeyBase.getOrElse(target), skeyCol, keys)
      .select(existing.columns.map(col): _*)

    existing.unionByName(inserts)
  }

  /** SCD Type-2 dimension merge — the corrected two-phase rewrite
    * (Gold_Products_No_Delta_Live.py:69-95 intent; fixes §2.10.2's missed
    * re-insert): history rows pass through; current rows whose hash differs
    * from the source are expired (is_current=false, effective_end_date=now);
    * changed AND brand-new source keys get a fresh current version row.
    * Invariant (property-tested): exactly one is_current row per key.
    *
    * @param target keys ++ attrs ++ (skey, hash_value, effective_start_date,
    *               effective_end_date, is_current, insert_date, update_date)
    */
  def scd2(target: DataFrame, source: DataFrame, keys: Seq[String],
      tracked: Seq[String], skeyCol: String = "product_skey",
      now: Column = current_timestamp(),
      skeyBase: Option[DataFrame] = None): DataFrame = {
    val attrs = source.columns.filterNot(keys.contains).toSeq
    val src = requireUniqueKeys(source, keys)
      .withColumn("__hash", nullSafeHash(tracked.map(col)))
    val history = target.filter(!col("is_current"))
    val current = target.filter(col("is_current"))

    val j = current.alias("t").join(src.alias("s"), keyCond(keys), "full_outer")
    val sp = sPresent(keys); val tp = tPresent(keys)
    val changed = sp && tp && (col("t.hash_value") =!= col("s.__hash"))

    // phase 1: surviving current rows — expired in place when changed
    val keptOrExpired = j.filter(tp).select(
      keys.map(k => col(s"t.$k").as(k)) ++
      attrs.map(c => col(s"t.$c").as(c)) ++
      Seq(col(s"t.$skeyCol").as(skeyCol),
        col("t.hash_value").as("hash_value"),
        col("t.effective_start_date").as("effective_start_date"),
        when(changed, now).otherwise(col("t.effective_end_date")).as("effective_end_date"),
        when(changed, lit(false)).otherwise(col("t.is_current")).as("is_current"),
        col("t.insert_date").as("insert_date"),
        when(changed, now).otherwise(col("t.update_date")).as("update_date")): _*)

    // phase 2: new current versions — for changed keys AND brand-new keys
    val versions0 = j.filter(sp && (!tp || changed)).select(
      keys.map(k => col(s"s.$k").as(k)) ++
      attrs.map(c => col(s"s.$c").as(c)) ++
      Seq(col("s.__hash").as("hash_value"),
        now.as("effective_start_date"),
        lit(null).cast("timestamp").as("effective_end_date"),
        lit(true).as("is_current"),
        now.as("insert_date"), now.as("update_date")): _*)
    val versions = withNewKeys(versions0, skeyBase.getOrElse(target), skeyCol, keys)
      .select(history.columns.map(col): _*)

    history.unionByName(keptOrExpired).unionByName(versions)
  }
}
