package graft.functions

import org.apache.spark.sql.{Column, GraftShims, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native (codegen'd) vector primitives for the similarity-search surface.
  *
  * A dot product over `array<float>` is the one hot-loop operation the
  * built-in function set cannot express without interpreted higher-order
  * functions (`zip_with` + `aggregate` dispatch a lambda per element, per
  * row). Per the engine's extension ladder (SURVEY.md §4.2) this is the
  * case for a custom Catalyst `Expression` with `doGenCode`: the generated
  * loop is a straight-line fused multiply-add over the unsafe array data,
  * keeping embedding scans inside whole-stage codegen at 100 TB scale.
  *
  * Accumulation is sequential in ascending index order, in double
  * precision — bit-identical to the `aggregate(zip_with(...))` formulation
  * and to DuckDB's `list_sum(list_transform(list_zip(...)))` oracle.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  // element accessor per side — an ArrayData holds 4-byte slots for
  // float arrays and 8-byte slots for double arrays, so reading a
  // double array with getFloat returns garbage, not a rounded value
  private def isDouble(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xd, yd) = (isDouble(left), isDouble(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(arr: String, e: Expression) =
        if (isDouble(e)) s"$arr.getDouble($i)"
        else s"(double)$arr.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(x, left)} * ${get(y, right)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Codegen'd float-vector dot product (double accumulation). */
  def dotF(a: Column, b: Column): Column =
    GraftShims.column(
      DotProductF(GraftShims.expression(a), GraftShims.expression(b)))

  /** L2 norm as sqrt(self-dot) — same sequential accumulation as the
    * `aggregate(transform(...))` formulation it replaces. */
  def l2normF(a: Column): Column = sqrt(dotF(a, a))

  /** Cosine over precomputed norms (callers should compute each side's
    * norm ONCE per vector, not once per pair). */
  def cosineFromNorms(dot: Column, normA: Column, normB: Column): Column =
    round(dot / (normA * normB), 6)
}

/** `SparkSessionExtensions` installer making the native expressions
  * SQL-addressable (`SELECT vec_dot(a.embedding, b.embedding) ...`) via
  * `spark.sql.extensions=graft.GraftExtensions`-style wiring or
  * [[GraftExtensions.register]] on an existing session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
    ext.injectFunction(GraftExtensions.nfcDescriptor)
    ext.injectFunction(GraftExtensions.bpeDescriptor)
    ext.injectFunction(GraftExtensions.cdcDescriptor)
    // MERGE INTO support: the native parser already produces MergeIntoTable;
    // the delegating parser swaps it for graft's executable lowering
    // (graft.sql.MergeIntoRunner) so `spark.sql("MERGE INTO ...")` runs
    // against plain parquet catalog tables.
    ext.injectParser((session, delegate) =>
      new graft.sql.GraftSqlParser(session, delegate))
    // transparent file skipping: filtered scans over manifest-carrying
    // tables are rebuilt over the surviving file list (once per query,
    // after filter pushdown; the residual filter is never touched)
    ext.injectPreCBORule(session =>
      graft.layout.SkippingPruneRule(session))
    // transparent deletion vectors: scans over tables carrying a `_dv`
    // position sidecar subtract those rows (runs AFTER the skipping rule
    // in the same batch, so a pruned scan stays pruned under the anti-join)
    ext.injectPreCBORule(session =>
      graft.layout.DvApplyRule(session))
  }
}

object GraftExtensions {
  private[graft] val vecDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[DotProductF].getName, "vec_dot"),
    (children: Seq[Expression]) => DotProductF(children(0), children(1)))

  private[graft] val nfcDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
    (children: Seq[Expression]) => NfcNormalizeExpr(children.head))

  /** `bpe_encode(word, 'a b,ab c,...')` — the merge table rides as a
    * foldable string literal ("a b" pairs, comma-separated, rank order),
    * the standard way a SQL surface carries a trained artifact. */
  private[graft] val bpeDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bpe_encode"),
    new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
    (children: Seq[Expression]) => {
      require(children.length == 2 && children(1).foldable,
        "bpe_encode(word, '<a b,...>' ) needs a literal merge table")
      val spec = Option(children(1).eval(null))
        .map(_.toString).getOrElse("")
      val merges = spec.split(',').toSeq.filter(_.nonEmpty).map { m =>
        val p = m.split(' ')
        require(p.length == 2, s"bad merge '$m' (want 'left right')")
        (p(0), p(1))
      }
      BpeEncode(children.head, merges)
    })

  private[graft] val cdcDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cdc_chunks"),
    new ExpressionInfo(classOf[CdcChunksExpr].getName, "cdc_chunks"),
    (children: Seq[Expression]) => CdcChunksExpr(children.head))

  /** Idempotent per-session registration for sessions built without the
    * extensions config (e.g. the driver-owned Verify/Bench sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(vecDotDescriptor, nfcDescriptor, cdcDescriptor)
      .foreach { case (id, info, builder) =>
        GraftShims.registerFunction(spark, id, info, builder)
      }
}
