package graft.sql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._

import graft.catalog.{Catalog, ChangeFeed}
import graft.pipeline.MaterializedAgg
import graft.pipeline.MaterializedAgg._

/** SQL surface for incrementally maintained materialized views —
  * Databricks' `CREATE MATERIALIZED VIEW` / `REFRESH MATERIALIZED VIEW`
  * (the reference's gold rollups are full-recompute notebooks; the MV
  * statement is what Databricks replaced that pattern with).
  *
  *   CREATE MATERIALIZED VIEW gold.mv AS
  *     SELECT k1, k2, sum(x * y) AS s, count(*) AS n
  *     FROM silver.fact [WHERE pred] GROUP BY k1, k2
  *
  *   REFRESH MATERIALIZED VIEW gold.mv [FULL]
  *
  * The SELECT must be a single-table algebraic aggregate (sum / count(*)
  * / min / max over any row expression, every aggregate aliased) —
  * exactly [[MaterializedAgg]]'s admission rule, because that is what an
  * O(batch) incremental refresh is mathematically possible for. CREATE
  * computes the initial state (partial-over-everything IS the state for
  * algebraic measures), pins a change-feed cursor at the source version
  * it read, registers the view as a queryable external table, and
  * persists the definition in a sidecar. REFRESH pulls the source's
  * change feed since the cursor and folds ONLY the new rows in — cost
  * O(changes), never O(source). A source that changed by more than
  * appends (deletes/updates in the feed) cannot be folded algebraically
  * (min/max cannot retract); REFRESH then demands the FULL form, which
  * recomputes and re-pins. The refresh high-water mark rides IN the
  * state (`_graft_refresh_id`), so a replayed refresh drops whole. */
case class GraftCreateMviewCommand(nameParts: Seq[String],
    selectSql: String) extends LeafRunnableCommand {
  import MaterializedViewSql._

  override def run(spark: SparkSession): Seq[Row] = {
    require(nameParts.length == 2,
      s"materialized view name must be layer.table, got ${nameParts.mkString(".")}")
    val d = parseDefinition(spark, selectSql)
    val cat = catalogOf(spark, d)
    val viewDir = cat.path(nameParts.head, nameParts(1))
    val fs = new org.apache.hadoop.fs.Path(viewDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new org.apache.hadoop.fs.Path(viewDir)),
      s"materialized view target exists: $viewDir")
    val srcVersion = Catalog.readPointer(fs, d.srcDir)
    require(srcVersion >= 1, s"source does not exist: ${d.srcDir}")
    val ma = new MaterializedAgg(spark, cat, nameParts.head, nameParts(1),
      d.groupBy, d.measures)
    ma.refresh(d.filtered(spark.read.parquet(d.srcDir)), 1L)
    ChangeFeed.commitCursor(spark, cursorFile(viewDir), srcVersion)
    writeDefinition(spark, viewDir, d)
    spark.sql(s"CREATE SCHEMA IF NOT EXISTS ${nameParts.head}")
    spark.sql(s"""CREATE TABLE IF NOT EXISTS ${nameParts.mkString(".")}
                  USING parquet LOCATION '$viewDir'""")
    Seq.empty
  }
}

case class GraftRefreshMviewCommand(nameParts: Seq[String],
    full: Boolean) extends LeafRunnableCommand {
  import MaterializedViewSql._

  override def run(spark: SparkSession): Seq[Row] = {
    val viewDir = GraftSql.resolveDir(spark, nameParts,
      "REFRESH MATERIALIZED VIEW")
    val d = readDefinition(spark, viewDir)
    val cat = catalogOf(spark, d)
    val ma = new MaterializedAgg(spark, cat, nameParts.head, nameParts(1),
      d.groupBy, d.measures)
    val fs = new org.apache.hadoop.fs.Path(viewDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (full) {
      // recompute from the live source and re-pin — the escape hatch for
      // non-append source history (and the only correct fold for it)
      val cur = Catalog.readPointer(fs, d.srcDir)
      val state = d.filtered(spark.read.parquet(d.srcDir))
        .groupBy(d.groupBy.map(col): _*)
        .agg(d.measures.head.partialExpr,
          d.measures.tail.map(_.partialExpr): _*)
        .withColumn(RefreshIdCol, lit(ma.lastRefreshId + 1))
      cat.overwriteSnapshot(state, nameParts.head, nameParts(1))
      ChangeFeed.commitCursor(spark, cursorFile(viewDir), cur)
    } else ChangeFeed.consumeChanges(spark, d.srcDir,
        cursorFile(viewDir)) match {
      case None => ()
      case Some((ch, from, to)) =>
        val inserts = d.filtered(
          ch.filter(col(ChangeFeed.ChangeCol) === "insert")
            .drop(ChangeFeed.ChangeCol))
        val deletes = d.filtered(
          ch.filter(col(ChangeFeed.ChangeCol) === "delete")
            .drop(ChangeFeed.ChangeCol))
        if (deletes.isEmpty)
          ma.refresh(inserts, ma.lastRefreshId + 1)
        else {
          // classic incremental view maintenance: deleted source rows
          // fold as NEGATED partials — sound exactly when every measure's
          // combine is group addition (sum/count; min/max are extremal,
          // not invertible) and a count(*) measure is present to detect
          // groups whose last row left (count 0 → the group vanishes,
          // matching a full recompute)
          val retractable = d.measureDefs
            .forall(m => m.kind == "sum" || m.kind == "count")
          val countOut = d.measureDefs.find(_.kind == "count").map(_.out)
          require(retractable && countOut.isDefined,
            s"source ${d.srcDir} changed by more than appends between " +
              s"versions $from and $to, and the view is not retractable " +
              "(retraction needs sum/count-only measures incl. a " +
              "count(*)) — run REFRESH MATERIALIZED VIEW " +
              s"${nameParts.mkString(".")} FULL")
          def signedPartial(df: DataFrame, neg: Boolean) =
            df.groupBy(d.groupBy.map(col): _*)
              .agg(signedExpr(d.measureDefs.head, neg),
                d.measureDefs.tail.map(signedExpr(_, neg)): _*)
          val delta = signedPartial(inserts, neg = false)
            .unionByName(signedPartial(deletes, neg = true))
          ma.applyDelta(delta, ma.lastRefreshId + 1,
            prune = Some(col(countOut.get) === 0L))
        }
        ChangeFeed.commitCursor(spark, cursorFile(viewDir), to)
    }
    spark.catalog.refreshByPath(viewDir)
    Seq.empty
  }
}

/** `DROP MATERIALIZED VIEW layer.view` — removes the registration, the
  * state (with its version history), the definition sidecar, and the
  * change-feed cursor; refuses for tables that are not materialized
  * views (a plain DROP TABLE must not silently destroy data files). */
case class GraftDropMviewCommand(nameParts: Seq[String])
    extends LeafRunnableCommand {
  import MaterializedViewSql._

  override def run(spark: SparkSession): Seq[Row] = {
    val viewDir = GraftSql.resolveDir(spark, nameParts,
      "DROP MATERIALIZED VIEW")
    val fs = new org.apache.hadoop.fs.Path(viewDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(defFile(viewDir))),
      s"${nameParts.mkString(".")} is not a materialized view")
    spark.sql(s"DROP TABLE ${nameParts.map(p => s"`$p`").mkString(".")}")
    Seq(viewDir, viewDir + ".history", defFile(viewDir),
        cursorFile(viewDir))
      .map(new org.apache.hadoop.fs.Path(_))
      .foreach(p => if (fs.exists(p)) fs.delete(p, true))
    Seq.empty
  }
}

object MaterializedViewSql {
  /** One aggregate of the view: kind ∈ count/sum/min/max, the row
    * expression's ORIGINAL sql text (None for count), output name. */
  final case class MeasureDef(kind: String, exprSql: Option[String],
      out: String) {
    def toMeasure: Measure = kind match {
      case "count" => CountRows(out)
      case "sum" => Sum(expr(exprSql.get), out)
      case "min" => Min(expr(exprSql.get), out)
      case "max" => Max(expr(exprSql.get), out)
    }
  }

  /** The persisted view definition (sidecar next to the state dir). */
  final case class Definition(srcDir: String, where: Option[String],
      groupBy: Seq[String], measureDefs: Seq[MeasureDef]) {
    def measures: Seq[Measure] = measureDefs.map(_.toMeasure)
    def filtered(df: DataFrame): DataFrame =
      where.map(w => df.filter(expr(w))).getOrElse(df)
  }

  private[sql] def cursorFile(viewDir: String) = s"$viewDir.mviewcursor"
  private[sql] def defFile(viewDir: String) = s"$viewDir.mviewdef"

  /** A measure's partial over a batch, negated for retraction batches.
    * `negate` preserves the aggregate's type (a `* -1` would widen
    * decimals); count negates too — the count partial is a group SIZE
    * here, summed by the combine, not an idempotent count. */
  private[sql] def signedExpr(m: MeasureDef,
      neg: Boolean): org.apache.spark.sql.Column = {
    val pos = m.kind match {
      case "count" => count(lit(1))
      case "sum" => sum(expr(m.exprSql.get))
      case "min" => min(expr(m.exprSql.get))
      case "max" => max(expr(m.exprSql.get))
    }
    (if (neg) negate(pos) else pos).as(m.out)
  }

  /** The warehouse root is the source dir's grandparent (`wh/layer/tbl`)
    * — views live in the same warehouse as their source. */
  private[sql] def catalogOf(spark: SparkSession, d: Definition): Catalog =
    new Catalog(spark, new org.apache.hadoop.fs.Path(d.srcDir)
      .getParent.getParent.toString)

  private val SelectRe =
    """(?is)^\s*SELECT\s+(.*?)\s+FROM\s+([\w.`]+)(?:\s+WHERE\s+(.*?))?\s+GROUP\s+BY\s+(.+?)\s*;?\s*$""".r
  private val AggRe =
    """(?is)^(sum|min|max)\s*\((.+)\)\s+AS\s+(\w+)$""".r
  private val CountRe =
    """(?is)^count\s*\(\s*(?:\*|1)\s*\)\s+AS\s+(\w+)$""".r

  /** Split on commas at paren depth 0 (aggregate arguments may nest). */
  private[sql] def topLevelSplit(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur += c
    }
    val last = cur.toString.trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Parse + validate the MV SELECT into a [[Definition]]. The source
    * must be a registered graft table (its storage dir anchors the change
    * feed); every aggregate must be algebraic and aliased; the projected
    * keys must equal the GROUP BY list. */
  private[sql] def parseDefinition(spark: SparkSession,
      selectSql: String): Definition = selectSql match {
    case SelectRe(items, src, where, grp) =>
      val groupBy = topLevelSplit(grp).map { g =>
        require(g.matches("""[\w`]+"""),
          s"GROUP BY must name plain columns, got: $g")
        g.stripPrefix("`").stripSuffix("`")
      }
      var keysSeen = Vector.empty[String]
      val measures = topLevelSplit(items).flatMap {
        case CountRe(out) => Some(MeasureDef("count", None, out))
        case AggRe(fn, inner, out) =>
          Some(MeasureDef(fn.toLowerCase, Some(inner.trim), out))
        case key if key.matches("""[\w`]+""") =>
          keysSeen :+= key.stripPrefix("`").stripSuffix("`"); None
        case other => throw new IllegalArgumentException(
          "materialized views admit algebraic aggregates only — " +
            s"sum/count(*)/min/max AS alias — got: $other")
      }
      require(measures.nonEmpty, "no aggregate in the SELECT")
      require(keysSeen.map(_.toLowerCase).sorted ==
          groupBy.map(_.toLowerCase).sorted,
        s"projected keys ${keysSeen.mkString(",")} must equal GROUP BY " +
          groupBy.mkString(","))
      val srcDir = GraftSql.resolveDir(spark,
        src.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`")),
        "CREATE MATERIALIZED VIEW source")
      Definition(srcDir, Option(where).map(_.trim).filter(_.nonEmpty),
        groupBy, measures)
    case _ => throw new IllegalArgumentException(
      "materialized view query must be SELECT ... FROM <table> " +
        "[WHERE ...] GROUP BY ... — got: " + selectSql)
  }

  private def b64(s: String) = java.util.Base64.getEncoder
    .encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String) =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  private[sql] def writeDefinition(spark: SparkSession, viewDir: String,
      d: Definition): Unit = {
    val lines = Seq(
      s"src\t${b64(d.srcDir)}",
      s"where\t${d.where.map(b64).getOrElse("-")}",
      s"groupBy\t${d.groupBy.map(b64).mkString(",")}") ++
      d.measureDefs.map(m =>
        s"m\t${m.kind}\t${m.exprSql.map(b64).getOrElse("-")}\t${b64(m.out)}")
    val p = new org.apache.hadoop.fs.Path(defFile(viewDir))
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(p, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private[sql] def readDefinition(spark: SparkSession,
      viewDir: String): Definition = {
    val p = new org.apache.hadoop.fs.Path(defFile(viewDir))
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(p),
      s"$viewDir is not a materialized view (no definition sidecar)")
    val in = f.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      val b = new Array[Byte](4096)
      var n = in.read(b)
      while (n > 0) { buf.write(b, 0, n); n = in.read(b) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
    val lines = text.split('\n').toSeq
    def field(k: String) = lines.find(_.startsWith(s"$k\t")).get
      .split('\t')(1)
    val measures = lines.filter(_.startsWith("m\t")).map { l =>
      val Array(_, kind, src, out) = l.split('\t')
      MeasureDef(kind, Some(src).filter(_ != "-").map(unb64), unb64(out))
    }
    Definition(unb64(field("src")),
      Some(field("where")).filter(_ != "-").map(unb64),
      field("groupBy").split(',').toSeq.map(unb64), measures)
  }
}
