package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{MixQueries, TextQueries}

/** Property pin for q215 (fixed-seed scalacheck): the distributed
  * Hare-quota allocation must equal a sequential largest-remainder
  * apportionment on random cell distributions — ties on the remainder
  * included (broken by lang ascending, like the window). */
class QuotaProps extends SparkSuite {
  import spark.implicits._

  private def model(cells: Map[String, Long]): Map[String, Long] = {
    val n = cells.values.sum
    val e = n / 10
    val base = cells.map { case (l, c) => l -> e * c / n }
    val rem = cells.map { case (l, c) => l -> e * c % n }
    val spare = e - base.values.sum
    val extras = cells.keys.toSeq
      .sortBy(l => (-rem(l), l)).take(spare.toInt).toSet
    cells.keys.map(l =>
      l -> (base(l) + (if (extras(l)) 1L else 0L))).toMap
  }

  private val caseGen: Gen[Seq[(String, Long)]] = for {
    k <- Gen.chooseNum(2, 6)
    counts <- Gen.listOfN(k, Gen.chooseNum(1L, 40L))
  } yield counts.zipWithIndex.map { case (c, i) => (s"l$i", c) }

  test("q215: distributed allocation == sequential largest remainder") {
    (1 to 6).foreach { cse =>
      val cells = caseGen.apply(Gen.Parameters.default, Seed(3307L + cse))
        .get.toMap
      val rows = cells.toSeq.flatMap { case (lang, c) =>
        (0L until c).map(i => (lang, i))
      }.zipWithIndex.map { case ((lang, _), id) =>
        (id.toLong, "t", lang, "s", 1L)
      }
      val dir = tmpDir(s"qp$cse") + "/t"
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = MixQueries.quotaSplit(spark, dir).collect()
        .map(r => r.getAs[String]("lang") -> r.getAs[Long]("alloc")).toMap
      assert(got == model(cells), s"case $cse: cells=$cells")
    }
  }
}
