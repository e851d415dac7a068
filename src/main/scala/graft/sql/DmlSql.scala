package graft.sql

import org.apache.spark.sql.{Column, GraftShims, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Row-level `DELETE FROM` / `UPDATE` SQL over graft snapshot tables —
  * the remaining two DML verbs next to [[MergeIntoRunner]]'s MERGE (the
  * reference platform gets all three from Delta; Spark PARSES both since
  * 3.4 — `DeleteFromTable` / `UpdateTable` — but executes them only
  * against v2 merge-capable catalogs, so a plain parquet external table
  * raises). Same lowering strategy as MERGE: a declarative rewrite of the
  * table (filter for DELETE, conditional projection for UPDATE) committed
  * through the catalog's atomic snapshot swap — versioned, time-travelable
  * and CHECK-constraint-gated like every other write.
  *
  * Semantics (Delta's):
  *   - `DELETE FROM t WHERE c`: rows where the condition is TRUE are
  *     removed; NULL/false rows stay. Returns num_affected_rows.
  *   - `UPDATE t SET x = e, ... [WHERE c]`: assignments apply to matching
  *     rows (every row when no WHERE), cast to the column's existing type;
  *     all other columns and rows pass through. Returns num_affected_rows.
  *
  * Scale: the lowering is layout-routed, never O(table) —
  *   - flat snapshots: FILE-GRANULAR rewrite
  *     ([[graft.layout.FileGranularDml]]) — one probe finds the files
  *     holding matches, untouched files hard-link into the new version,
  *     only matched files rewrite (Delta's narrowed-rewrite shape);
  *   - bucketed layouts: per-bucket rewrite or per-bucket DV sidecars
  *     ([[graft.layout.BucketedDml]]);
  *   - merge-on-read mode: position sidecars, zero data movement
  *     ([[graft.layout.DeletionVectors]]);
  *   - partition-dir trees: full rewrite preserving the partition layout
  *     (the remaining O(table) case; partition-wise narrowing is the
  *     upgrade path).
  * The affected-row count rides the probe (one column-pruned job). */
object DmlRunner {

  private def resolveTarget(spark: SparkSession, table
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      stmt: String) = {
    val (nameParts, alias) = MergeIntoRunner.targetNameAndAlias(table)
    val tableName = nameParts.map(p => s"`$p`").mkString(".")
    val (uri, partCols) = GraftShims.tableStorage(spark, nameParts)
      .getOrElse(throw new IllegalArgumentException(
        s"$stmt target $tableName must be a catalog table with a storage " +
          "location (temp views cannot be rewritten)"))
    val dir = new org.apache.hadoop.fs.Path(uri).toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (nameParts, alias.getOrElse(nameParts.last), tableName, dir, partCols,
      graft.catalog.Catalog.isBucketedLayout(fs, dir))
  }

  /** `DELETE FROM t [AS a] WHERE cond` → rows where cond is not TRUE.
    * Copy-on-write by default; tables with deletion vectors enabled
    * (`graft.layout.DeletionVectors.enable` / the TBLPROPERTIES SQL)
    * record positions instead of rewriting — O(matched rows), not
    * O(table). Either way the base read applies any existing sidecar, so
    * flipping the mode never resurrects deleted rows. */
  def delete(spark: SparkSession, d: DeleteFromTable): Long = {
    val (nameParts, aliasName, tableName, dir, partCols, bucketed) =
      resolveTarget(spark, d.table, "DELETE FROM")
    val affected =
      if (graft.layout.DeletionVectors.isEnabled(spark, dir))
        // deleteWhere routes bucketed layouts to the per-bucket sidecar
        // commit (BucketedDml) itself
        graft.layout.DeletionVectors.deleteWhere(spark, dir,
          GraftShims.column(d.condition), alias = Some(aliasName))
      else if (bucketed)
        graft.layout.BucketedDml.deleteWhereCow(spark, dir,
          GraftShims.column(d.condition), alias = Some(aliasName))
      else if (partCols.isEmpty)
        // flat snapshot: file-granular rewrite (touched files only)
        graft.layout.FileGranularDml.deleteWhere(spark, dir,
          GraftShims.column(d.condition), alias = Some(aliasName))
      else {
        val t = graft.layout.DeletionVectors.readPath(spark, dir)
          .alias(aliasName)
        val cond = coalesce(GraftShims.column(d.condition), lit(false))
        val n = t.filter(cond).count()
        if (n > 0)
          graft.catalog.Catalog.overwritePath(spark, t.filter(!cond), dir,
            partCols, operation = "DELETE")
        n
      }
    if (affected > 0) GraftSql.refreshTarget(spark, nameParts, dir)
    affected
  }

  /** `UPDATE t [AS a] SET x = e, ... [WHERE cond]`. */
  def update(spark: SparkSession, u: UpdateTable): Long = {
    val (nameParts, aliasName, tableName, dir, partCols, bucketed) =
      resolveTarget(spark, u.table, "UPDATE")
    val cond = u.condition
      .map(e => coalesce(GraftShims.column(e), lit(false)))
      .getOrElse(lit(true))
    def keyName(e: Expression): String = e match {
      case ua: UnresolvedAttribute => ua.nameParts.last
      case a: Attribute => a.name
      case other => other.sql
    }
    val t = graft.layout.DeletionVectors.readPath(spark, dir)
      .alias(aliasName)
    val schema = t.schema
    u.assignments.foreach { a =>
      val n = keyName(a.key)
      require(schema.fieldNames.exists(_.equalsIgnoreCase(n)),
        s"UPDATE assigns unknown column $n on $tableName")
    }
    def assignedValue(c: String): Option[Column] =
      u.assignments.collectFirst {
        case a if keyName(a.key).equalsIgnoreCase(c) =>
          GraftShims.column(a.value)
      }
    val affected =
      if (graft.layout.DeletionVectors.isEnabled(spark, dir))
        // merge-on-read: old images into the sidecar + updated rows
        // appended, one commit — O(matched data), never O(table);
        // updateWhere routes bucketed layouts to BucketedDml itself
        graft.layout.DeletionVectors.updateWhere(spark, dir, cond,
          u.assignments.map(a =>
            keyName(a.key) -> GraftShims.column(a.value)),
          alias = Some(aliasName))
      else if (bucketed)
        graft.layout.BucketedDml.updateWhereCow(spark, dir, cond,
          u.assignments.map(a =>
            keyName(a.key) -> GraftShims.column(a.value)),
          alias = Some(aliasName))
      else if (partCols.isEmpty)
        graft.layout.FileGranularDml.updateWhere(spark, dir, cond,
          u.assignments.map(a =>
            keyName(a.key) -> GraftShims.column(a.value)),
          alias = Some(aliasName))
      else {
        val projected = t.select(schema.fields.toSeq.map { f =>
          assignedValue(f.name) match {
            case Some(v) =>
              when(cond, v.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
            case None => col(f.name)
          }
        }: _*)
        val n = t.filter(cond).count()
        if (n > 0)
          graft.catalog.Catalog.overwritePath(spark, projected, dir, partCols,
            operation = "UPDATE")
        n
      }
    if (affected > 0) GraftSql.refreshTarget(spark, nameParts, dir)
    affected
  }
}

/** The executables the parser substitutes for raw `DeleteFromTable` /
  * `UpdateTable` plans (leaf commands — resolution is late-bound inside
  * [[DmlRunner]], the [[GraftMergeIntoCommand]] pattern). One row:
  * num_affected_rows, Delta's result shape. */
case class GraftDeleteCommand(d: DeleteFromTable) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_affected_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(DmlRunner.delete(spark, d)))
}

case class GraftUpdateCommand(u: UpdateTable) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_affected_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(DmlRunner.update(spark, u)))
}
