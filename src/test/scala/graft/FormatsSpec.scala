package graft

import org.apache.spark.sql.functions._

import graft.sources.Formats

/** Format round-trip fidelity on exactly the strings that break naive
  * CSV/JSON handling: embedded newlines, quotes, commas, backslashes,
  * unicode, empty strings and NULLs. q80's oracle covers ORC on the real
  * fixture; this spec covers the adversarial corner the fixture is too
  * clean to carry. */
class FormatsSpec extends SparkSuite {
  import spark.implicits._

  private val nasty = Seq(
    (1L, "plain words", "en"),
    (2L, "comma, inside", "en"),
    (3L, "a \"quoted\" token", "de"),
    (4L, "line\nbreak and\r\nCRLF", "fr"),
    (5L, "trailing backslash \\", "es"),
    (6L, "unicode: 汉字 → ümlaut — dash", "zh"),
    (7L, "", "en"),
    (8L, null, "en"))

  private def df = nasty.toDF("doc_id", "text", "lang")

  for (fmt <- Seq("orc", "json", "csv"))
    test(s"$fmt round trip preserves adversarial strings, nulls and types") {
      val back = Formats.roundTrip(df, fmt)
      // file sources read all columns nullable — names and types must
      // survive, nullability flags legitimately widen
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        df.schema.map(f => (f.name, f.dataType)), s"$fmt changed the schema")
      val orig = df.collect().map(r => r.getLong(0) -> r).toMap
      val got = back.collect().map(r => r.getLong(0) -> r).toMap
      assert(got.keySet == orig.keySet, s"$fmt lost rows: ${got.keySet}")
      for ((id, r) <- orig) {
        // CSV cannot distinguish NULL from empty string without a quirky
        // nullValue config — accept either for the two degenerate rows,
        // require exact equality everywhere else
        val gt = got(id).getAs[String]("text")
        val ot = r.getAs[String]("text")
        if (fmt == "csv" && (ot == null || ot.isEmpty))
          assert(gt == null || gt.isEmpty, s"csv row $id: '$gt'")
        else assert(gt == ot, s"$fmt row $id: '$gt' != '$ot'")
        assert(got(id).getAs[String]("lang") == r.getAs[String]("lang"))
      }
    }

  test("q80 orc round trip equals the source table on the fixture") {
    val src = Tables.load(spark, sf0001, "documents")
    val back = Formats.orcRoundTrip(spark, sf0001)
    assert(back.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(back.exceptAll(src.select(back.columns.map(col): _*)).isEmpty &&
      src.select(back.columns.map(col): _*).exceptAll(back).isEmpty)
  }
}
