package graft.layout

import org.apache.spark.sql.{GraftPrunedFileIndex, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Automatic file-level data skipping — the Catalyst rule that makes the
  * `_skipping` manifest work for ORDINARY `spark.sql` / DataFrame reads,
  * not just the explicit [[DataSkipping.read]] API (Delta's stats pruning
  * is likewise transparent; an index nobody's queries use is shelf-ware).
  *
  * Runs once per query (pre-CBO, after operator optimization has pushed
  * filters down to the scans): for a `Filter` directly over an
  * unpartitioned parquet relation whose directory carries a skipping
  * manifest, the simple conjuncts (=, <, <=, >, >=, IN on literals) are
  * translated to [[DataSkipping.SkipPred]]s and the relation is rebuilt
  * over the surviving file list. The Filter node itself is NEVER touched:
  * pruning can only shrink IO, never change rows — strict inequalities
  * widen to inclusive stat ranges, unknown conjuncts are simply not used
  * for pruning, unprofiled files always survive, and any error falls back
  * to the unpruned plan. The [[GraftPrunedFileIndex]] class marks a scan
  * as already pruned so re-entry is a no-op.
  *
  * At 100 TB this is the metadata-elimination lever: the manifest probe
  * is one driver-side FS stat per filtered scan, the pruning decision is
  * a driver-side pass over O(files × stat columns) manifest rows — the
  * same scale Delta holds in log checkpoints — and the executors then
  * open only surviving files. */
case class SkippingPruneRule(spark: SparkSession)
    extends Rule[LogicalPlan] {
  import DataSkipping._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond,
        l @ LogicalRelation(r: HadoopFsRelation, _, _, false, _))
        if r.fileFormat.isInstanceOf[
             org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] &&
           r.partitionSchema.isEmpty &&
           r.location.rootPaths.length == 1 &&
           !r.location.isInstanceOf[GraftPrunedFileIndex] =>
      try {
        val dir = r.location.rootPaths.head.toString
        val preds = skipPreds(cond)
        if (preds.isEmpty || !hasManifest(spark, dir)) f
        else prunedPaths(spark, dir, preds) match {
          case None => f
          case Some(paths) =>
            f.copy(child = l.copy(
              relation = org.apache.spark.sql.GraftShims
                .prunedFsRelation(spark, r, paths)))
        }
      } catch { case _: Exception => f } // pruning is strictly best-effort
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  private def scalaLit(l: Literal): Option[Any] =
    Option(l.value).map(CatalystTypeConverters.convertToScala(_, l.dataType))

  /** Translate the prunable conjuncts; anything else is ignored (the
    * residual Filter still applies it row-wise). Strict inequalities map
    * to INCLUSIVE stat bounds — a widening, so only IO is at stake. */
  private def skipPreds(cond: Expression): Seq[SkipPred] =
    conjuncts(cond).flatMap {
      case GreaterThanOrEqual(a: AttributeReference, v: Literal) =>
        scalaLit(v).map(x => Range(a.name, Some(x), None))
      case GreaterThan(a: AttributeReference, v: Literal) =>
        scalaLit(v).map(x => Range(a.name, Some(x), None))
      case LessThanOrEqual(a: AttributeReference, v: Literal) =>
        scalaLit(v).map(x => Range(a.name, None, Some(x)))
      case LessThan(a: AttributeReference, v: Literal) =>
        scalaLit(v).map(x => Range(a.name, None, Some(x)))
      // literal-first orientations flip the bound
      case GreaterThanOrEqual(v: Literal, a: AttributeReference) =>
        scalaLit(v).map(x => Range(a.name, None, Some(x)))
      case GreaterThan(v: Literal, a: AttributeReference) =>
        scalaLit(v).map(x => Range(a.name, None, Some(x)))
      case LessThanOrEqual(v: Literal, a: AttributeReference) =>
        scalaLit(v).map(x => Range(a.name, Some(x), None))
      case LessThan(v: Literal, a: AttributeReference) =>
        scalaLit(v).map(x => Range(a.name, Some(x), None))
      case EqualTo(a: AttributeReference, v: Literal) =>
        scalaLit(v).map(x => EqVal(a.name, x))
      case EqualTo(v: Literal, a: AttributeReference) =>
        scalaLit(v).map(x => EqVal(a.name, x))
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val xs = vs.map(v => scalaLit(v.asInstanceOf[Literal]))
        if (xs.forall(_.isDefined)) Some(InVals(a.name, xs.map(_.get)))
        else None
      case _ => None
    }
}
