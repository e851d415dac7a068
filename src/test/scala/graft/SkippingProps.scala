package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.layout.DataSkipping
import graft.layout.DataSkipping.{EqVal, InVals, Range, SkipPred}

/** Property: for ANY data distribution, physical layout, and predicate,
  * a stats-pruned read returns EXACTLY the rows of the unpruned filter —
  * pruning is pure IO, never semantics. Sampled with fixed scalacheck
  * seeds (the MergeProps harness pattern; no scalatestplus bridge in the
  * offline dependency set). */
class SkippingProps extends SparkSuite {
  import spark.implicits._

  private val rowGen: Gen[(Long, String, Option[Long])] = for {
    id <- Gen.chooseNum(-500L, 500L)
    key <- Gen.oneOf(Gen.alphaLowerStr.map(_.take(6)), Gen.const(""))
    v <- Gen.option(Gen.chooseNum(0L, 99L))
  } yield (id, key, v)

  private val predsGen: Gen[List[SkipPred]] = Gen.listOfN(2, Gen.oneOf(
    for {
      a <- Gen.chooseNum(-600L, 600L); w <- Gen.chooseNum(0L, 300L)
    } yield Range("id", Some(a), Some(a + w)),
    Gen.chooseNum(-600L, 600L).map(a => Range("id", Some(a), None)),
    Gen.chooseNum(0L, 120L).map(v => Range("v", None, Some(v))),
    Gen.oneOf("a", "zz", "", "k42").map(k => EqVal("key", k)),
    Gen.listOfN(3, Gen.chooseNum(-500L, 500L)).map(vs =>
      InVals("id", vs.distinct))))

  test("pruned read == unpruned filter over random data/layout/predicates") {
    (1 to 8).foreach { i =>
      val params = Gen.Parameters.default
      val rows = Gen.listOfN(300, rowGen)
        .apply(params, Seed(i.toLong)).get
      val preds = predsGen.apply(params, Seed(i.toLong + 500)).get
      val df = rows.toDF("id", "key", "v")
      val laidOut = (i % 3) match {
        case 0 => df.repartitionByRange(5, col("id"))
          .sortWithinPartitions("id")
        case 1 => df.repartition(4, col("key"))
        case _ => df.coalesce(2)
      }
      val dir = tmpDir(s"skip-prop-$i") + "/t"
      laidOut.write.parquet(dir)
      DataSkipping.analyze(spark, dir, Seq("id", "v"),
        bloomCols = Seq("key"))
      val pruned = DataSkipping.read(spark, dir, preds)
      val full = preds.map(_.toColumn)
        .foldLeft(spark.read.parquet(dir))((d, c) => d.where(c))
      val (p, fl) =
        (rowsOf(pruned, "id", "key", "v"), rowsOf(full, "id", "key", "v"))
      assert(p == fl, s"case $i (preds=$preds): pruned=${p.size} " +
        s"full=${fl.size}")
    }
  }
}
