package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, EvalQueries, SearchQueries}

/** Hand-computed fixed points for the q179–q184 eval/preference surface:
  * Bradley–Terry ordering on a planted dominance hierarchy, Cohen's kappa
  * on perfect/zero/degenerate agreement, cross-source overlap on a planted
  * shared document, HITS on a planted hub, and nDCG against the discount
  * table evaluated by hand. All integer-exact, so assertions are
  * equalities, not tolerances. */
class EvalQueriesSpec extends SparkSuite {
  import spark.implicits._

  /** documents fixture with the sf tables' schema subset the queries use. */
  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String, String, Long)]): Unit =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

  test("bradley-terry: planted dominance A > B > C comes out in skill") {
    val dir = tmpDir("bt") + "/d"
    // one doc per (source, bucket): A always longest, B middle, C shortest
    val rows = (0L until 10L).flatMap { b =>
      Seq((b, "t", "en", "A", 300L + b),
        (10L + b, "t", "en", "B", 200L),
        (20L + b, "t", "en", "C", 100L))
    }
    writeDocs(dir, rows)
    val out = EvalQueries.bradleyTerry(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_games"), r.getAs[Long]("wins_half"),
          r.getAs[Long]("skill_ppb"))).toMap
    // each bucket cohort holds one doc of each source: A beats B and C,
    // B beats C — 20 games each, half-wins 40 / 20 / 0
    assert(out("A")._1 == 20 && out("B")._1 == 20 && out("C")._1 == 20)
    assert(out("A")._2 == 40 && out("B")._2 == 20 && out("C")._2 == 0)
    assert(out("A")._3 > out("B")._3 && out("B")._3 > out("C")._3,
      s"skills must order with dominance: $out")
    assert(out("C")._3 > 0, "virtual-game smoothing keeps winless > 0")
    // deterministic: a second run is bit-identical
    val again = EvalQueries.bradleyTerry(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("skill_ppb"))).toMap
    assert(out.forall { case (k, v) => again(k) == v._3 })
  }

  test("kappa: perfect two-class agreement = 1e6; independence = 0; " +
      "single-class cohort undefined") {
    val dir = tmpDir("kappa") + "/d"
    val w20 = Seq.fill(20)("w").mkString(" ") // 20 tokens → B-class 0
    val w50 = Seq.fill(50)("w").mkString(" ") // 50 tokens → B-class 1
    val rows =
      // en: 5 docs both-class-0 + 5 docs both-class-1 → kappa = 1
      (0L until 5L).map(i => (i, w20, "en", "s", 100L)) ++
      (5L until 10L).map(i => (i, w50, "en", "s", 300L)) ++
      // de: 3 agree on class 0, 1 disagrees (A=0, B=1) → kappa = 0
      (10L until 13L).map(i => (i, w20, "de", "s", 100L)) ++
      Seq((13L, w50, "de", "s", 100L)) ++
      // xx: all docs single class on both raters → pe = 1, kappa NULL
      (14L until 17L).map(i => (i, w20, "xx", "s", 100L))
    writeDocs(dir, rows)
    val out = EvalQueries.raterAgreement(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("en").getAs[Long]("kappa_ppm") == 1000000L)
    assert(out("en").getAs[Long]("po_ppm") == 1000000L)
    assert(out("en").getAs[Long]("pe_ppm") == 500000L)
    assert(out("de").getAs[Long]("kappa_ppm") == 0L)
    assert(out("xx").isNullAt(out("xx").fieldIndex("kappa_ppm")),
      "degenerate cohort must yield NULL kappa, not a crash")
  }

  test("source overlap: planted shared doc is the only pair, jaccard 1e6") {
    val dir = tmpDir("overlap") + "/d"
    val shared = "alpha beta gamma delta" // 2 distinct 3-shingles
    val rows = Seq(
      (0L, shared, "en", "srcA", shared.length.toLong),
      (1L, shared, "en", "srcB", shared.length.toLong)) ++
      // 38 filler docs with unique shingles so the 5% df cap is 2 and
      // the shared shingles (df = 2) survive it
      (2L until 40L).map { i =>
        (i, s"u${i}a u${i}b u${i}c", "en", s"src$i", 10L)
      }
    writeDocs(dir, rows)
    val out = Dedup.sourceOverlap(spark, dir).collect()
    assert(out.length == 1, s"only the planted pair overlaps: ${out.toSeq}")
    val r = out(0)
    assert(r.getString(0) == "srcA" && r.getString(1) == "srcB")
    assert(r.getAs[Long]("inter") == 2L)
    assert(r.getAs[Long]("jaccard_ppm") == 1000000L,
      "identical shingle sets must read as full overlap")
  }

  test("source overlap: a <= 20-doc corpus keeps its index and detects " +
      "the planted pair (df-cap floor, VERDICT r8 #1)") {
    val dir = tmpDir("overlap-tiny") + "/d"
    val shared = "alpha beta gamma delta" // 2 distinct 3-shingles, df = 2
    // 10 docs: without the floor the cap is 10 * 5 DIV 100 = 0 and the
    // whole index silently empties; with floor 1 the df=2 overlap
    // evidence is still dropped. Floor 2 keeps exactly the minimal
    // shared-pair signal.
    val rows = Seq(
      (0L, shared, "en", "srcA", shared.length.toLong),
      (1L, shared, "en", "srcB", shared.length.toLong)) ++
      (2L until 10L).map { i =>
        (i, s"u${i}a u${i}b u${i}c", "en", s"src$i", 10L)
      }
    writeDocs(dir, rows)
    val out = Dedup.sourceOverlap(spark, dir).collect()
    assert(out.length == 1, s"planted pair must survive the floored cap " +
      s"on a tiny corpus: ${out.toSeq}")
    assert(out(0).getString(0) == "srcA" && out(0).getString(1) == "srcB")
    assert(out(0).getAs[Long]("jaccard_ppm") == 1000000L)
  }

  test("fleiss kappa: perfect panel = 1e6, three-way split = -0.5, degenerate cohort = NULL") {
    val dir = tmpDir("fleiss") + "/d"
    val long70 = Seq.fill(70)("abcdef").mkString(" ")   // 70 tok, len 489
    val mid40 = Seq.fill(40)("abcdefghijk").mkString(" ") // 40 tok, len 479
    val rows = Seq(
      // pp: both items unanimous, spread over cats 0 and 2
      (1L, "a b c", "pp", "s", 100L),      // ra=rb=rc=0
      (2L, long70, "pp", "s", 500L),       // ra=rb=rc=2
      // dd: one item rated 0/1/2 by the three judges
      (3L, mid40, "dd", "s", 100L),        // ra=0, rb=1, rc=2
      // one: single unanimous item — every rating in one category
      (4L, "a b c", "one", "s", 100L))
    writeDocs(dir, rows)
    val out = EvalQueries.fleissKappa(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("p_bar_ppm"), r.getAs[Long]("p_e_ppm"),
          Option(r.getAs[java.lang.Long]("fleiss_kappa_ppm")))).toMap
    // pp: S=12, N=2, c=(3,0,3) → P̄=1, Pe=18/36=0.5, κ=1
    assert(out("pp") == ((1000000L, 500000L, Some(1000000L))))
    // dd: S=0, c=(1,1,1) → P̄=0, Pe=1/3, κ=(0-6)/(18-6)=-0.5 exactly
    assert(out("dd") == ((0L, 333333L, Some(-500000L))))
    // one: Σc²=9N² → denominator 0 → undefined
    assert(out("one")._3.isEmpty, "single-category cohort must be NULL")
  }

  test("containment dup: aggregator quoting a whole doc reads full containment, half-ish jaccard") {
    val dir = tmpDir("containment") + "/d"
    // doc 7 (7 % 7 == 0) becomes the aggregator quoting doc 8; fillers
    // give 42 docs so the 5% df cap is 2 and the quoted shingles
    // (df = 2) survive it. Filler aggregators (14, 21, ...) share only
    // ONE shingle with their quoted neighbor — pruned by shared >= 2.
    val rows = Seq(
      (7L, "a1 a2 a3 a4", "en", "srcA", 11L),
      (8L, "b1 b2 b3 b4", "en", "srcB", 11L)) ++
      (10L until 50L).map { i =>
        (i, s"u${i}a u${i}b u${i}c", "en", s"src$i", 10L)
      }
    writeDocs(dir, rows)
    val out = Dedup.containmentDup(spark, dir).collect()
    assert(out.length == 1, s"only the planted pair qualifies: ${out.toSeq}")
    val r = out(0)
    assert(r.getAs[Long]("id1") == 7L && r.getAs[Long]("id2") == 8L)
    // augmented doc 7 = "a1 a2 a3 a4 b1 b2 b3 b4" → 6 distinct shingles
    // (2 own + 2 junction + 2 quoted); doc 8 has 2, both inside doc 7
    assert(r.getAs[Long]("shared") == 2L)
    assert(r.getAs[Long]("containment_ppm") == 1000000L,
      "the whole quoted doc is contained")
    assert(r.getAs[Long]("jaccard_ppm") == 1000000L * 2 / 6,
      "resemblance must stay far below the containment signal")
  }

  test("chi2 drift: balanced source reads 0, drifting source dominates") {
    val dir = tmpDir("chi2") + "/d"
    // "steady": 4 docs split 2/2 over halves (doc_id parity). "drifted":
    // 4 docs all in the new half (odd ids). Totals: N=8, C_old=2, C_new=6
    val rows = Seq(
      (0L, "t", "en", "steady", 10L), (1L, "t", "en", "steady", 10L),
      (2L, "t", "en", "steady", 10L), (3L, "t", "en", "steady", 10L),
      (5L, "t", "en", "drifted", 10L), (7L, "t", "en", "drifted", 10L),
      (9L, "t", "en", "drifted", 10L), (11L, "t", "en", "drifted", 10L))
    writeDocs(dir, rows)
    val out = EvalQueries.chi2Drift(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_old"), r.getAs[Long]("n_new"),
          r.getAs[Long]("chi2_ppm"))).toMap
    // steady: O=(2,2), E=(4*2/8, 4*6/8)=(1,3) → 1e6*(1+1/3) = 1333333
    assert(out("steady") == ((2L, 2L, 1000000L + 1000000L / 3L)))
    // drifted: O=(0,4), E=(1,3) → 1e6*(1+1/3) same table mirrored
    assert(out("drifted")._3 == out("steady")._3,
      "2x2 table contributions are symmetric")
    // a perfectly proportional fixture reads exactly 0
    val dir2 = tmpDir("chi20") + "/d"
    writeDocs(dir2, Seq(
      (0L, "t", "en", "a", 1L), (1L, "t", "en", "a", 1L),
      (2L, "t", "en", "b", 1L), (3L, "t", "en", "b", 1L)))
    val zero = EvalQueries.chi2Drift(spark, dir2).collect()
    assert(zero.forall(_.getAs[Long]("chi2_ppm") == 0L))
  }

  test("stride schedule: 2x-weighted lang appears twice as often in any " +
      "schedule prefix; shards balanced by construction") {
    val dir = tmpDir("stride") + "/d"
    val rows = (0L until 40L).map(i => (i, "t", "en", "s", 1L)) ++
      (40L until 60L).map(i => (i, "t", "de", "s", 1L))
    writeDocs(dir, rows)
    val out = EvalQueries.strideSchedule(spark, dir).collect()
    // keys strictly interleave: stride(en)=1e6, stride(de)=5e5 — in the
    // first 30 scheduled docs, de (2x weight) contributes ~2x of en
    val prefix = out.sortBy(r => (r.getAs[Long]("sched_key"),
      r.getString(1), r.getAs[Long]("doc_id"))).take(30)
    val de = prefix.count(_.getString(1) == "de")
    val en = prefix.count(_.getString(1) == "en")
    assert(de == 2 * en, s"weighted interleave broken: de=$de en=$en")
    // schedule is deterministic and keys are unique per (lang, i)
    assert(out.map(r => (r.getString(1), r.getAs[Long]("i"))).distinct
      .length == out.length)
  }

  test("spearman: aligned scorers read 1e6, reversed read -1e6") {
    val dir = tmpDir("rho") + "/d"
    def toks(k: Int) = Seq.fill(k)("w").mkString(" ")
    val rows =
      // en: token count tracks n_chars → identical rankings
      (0L until 5L).map(i => (i, toks(10 + i.toInt), "en", "s",
        100L + 10L * i)) ++
      // de: token count anti-tracks n_chars → exactly reversed rankings
      (10L until 15L).map(i => (i, toks(30 - i.toInt), "de", "s",
        100L + 10L * i))
    writeDocs(dir, rows)
    val out = EvalQueries.spearman(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("rho_ppm")).toMap
    assert(out("en") == 1000000L, s"aligned: $out")
    assert(out("de") == -1000000L, s"reversed: $out")
  }

  test("auc: separable cohort reads 1e6, inverted 0, degenerate NULL") {
    val dir = tmpDir("auc") + "/d"
    val rows = Seq(
      // en: both positives outscore all negatives → AUC = 1
      (1L, "vector a", "en", "s", 900L), (2L, "vector b", "en", "s", 800L),
      (3L, "plain", "en", "s", 100L), (4L, "plain", "en", "s", 50L),
      // de: the positive is the LOWEST-scored doc → AUC = 0
      (11L, "vector", "de", "s", 10L),
      (12L, "plain", "de", "s", 500L), (13L, "plain", "de", "s", 400L),
      // xx: no positive → AUC undefined
      (21L, "plain", "xx", "s", 100L))
    writeDocs(dir, rows)
    val out = EvalQueries.aucEval(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("en").getAs[Long]("auc_ppm") == 1000000L)
    assert(out("de").getAs[Long]("auc_ppm") == 0L)
    assert(out("xx").isNullAt(out("xx").fieldIndex("auc_ppm")))
  }

  test("skyline: hand-built Pareto frontier, dominance and tie rules") {
    val dir = tmpDir("sky") + "/d"
    def words(ws: String*) = ws.mkString(" ")
    val rows = Seq(
      // (chars, vocab): frontier is (100,3) and (300,5); (200,2) is
      // dominated by (100,3); (300,4) loses the equal-length tie;
      // (400,5) is dominated by (300,5) (same vocab, longer)
      (1L, words("a", "b", "c"), "en", "s", 100L),
      (2L, words("a", "a"), "en", "s", 200L),
      (3L, words("a", "b", "c", "d", "e"), "en", "s", 300L),
      (4L, words("a", "b", "c", "d"), "en", "s", 300L),
      (5L, words("a", "b", "c", "d", "e"), "en", "s", 400L))
    writeDocs(dir, rows)
    val out = EvalQueries.skyline(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_vocab")))
    assert(out.toSeq == Seq((1L, 3L), (3L, 5L)), s"frontier: ${out.toSeq}")
  }

  test("source percentile: rank calibration and the 30% gate") {
    val dir = tmpDir("pct") + "/d"
    val rows = (0L until 11L).map(i => (i, "t", "en", "A", 100L + i)) ++
      Seq((100L, "t", "en", "B", 5L)) // singleton source
    writeDocs(dir, rows)
    val out = EvalQueries.sourcePercentile(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("pct_ppm"), r.getAs[Int]("kept"))).toMap
    // 11 docs: pct = (r-1)*1e6/10 → doc 0 → 0, doc 10 → 1e6
    assert(out(0L) == ((0L, 0)) && out(10L) == ((1000000L, 1)))
    assert(out(7L) == ((700000L, 1)) && out(6L) == ((600000L, 0)),
      "the 30% gate cuts exactly at 700000 ppm")
    assert(out(100L) == ((1000000L, 1)), "singleton source is kept")
    assert(out.values.count(_._2 == 1) == 4 + 1) // docs 7..10 + singleton
  }

  test("ks test: identical halves read 0, disjoint halves read 1e6") {
    val dir = tmpDir("ks") + "/d"
    val rows =
      // en: both halves see scores {100, 200} once each → D = 0
      Seq((0L, "t", "en", "s", 100L), (2L, "t", "en", "s", 200L),
        (1L, "t", "en", "s", 100L), (3L, "t", "en", "s", 200L)) ++
      // de: old half all 100, new half all 900 → D = 1
      Seq((10L, "t", "de", "s", 100L), (12L, "t", "de", "s", 100L),
        (11L, "t", "de", "s", 900L), (13L, "t", "de", "s", 900L))
    writeDocs(dir, rows)
    val out = EvalQueries.ksTest(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("ks_ppm")).toMap
    assert(out("en") == 0L, s"identical distributions: $out")
    assert(out("de") == 1000000L, s"disjoint distributions: $out")
  }

  test("vocab gini: uniform counts read 0, concentration raises it") {
    val dir = tmpDir("gini") + "/d"
    val rows = Seq(
      // A: four types once each → perfectly equal → gini = 0
      (0L, "a b c d", "en", "A", 7L),
      // B: one dominant type: counts (1,1,1,9) sorted asc →
      // 2*(1*1+2*1+3*1+4*9)-(5*12) = 84-60 = 24; /(4*12) → 500000
      (1L, "x x x x x x x x x y z w", "en", "B", 23L))
    writeDocs(dir, rows)
    val out = EvalQueries.vocabGini(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("gini_ppm")).toMap
    assert(out("A") == 0L, s"uniform: $out")
    assert(out("B") == 500000L, s"concentrated: $out")
  }

  test("ndcg: hand-computed dcg/idcg on a three-doc cohort") {
    val dir = tmpDir("ndcg") + "/d"
    val rows = Seq(
      (1L, "has vector inside", "en", "s", 500L), // rank 1, gain 3
      (2L, "nothing relevant here", "en", "s", 400L), // rank 2, gain 0
      (3L, "a merge mention", "en", "s", 300L)) // rank 3, gain 1
    writeDocs(dir, rows)
    val r = SearchQueries.ndcgEval(spark, dir).collect()(0)
    val dcg = 3L * 1000000L + 1L * 500000L // ranks 1 and 3
    val idcg = 3L * 1000000L + 1L * 630930L // ideal ranks 1 and 2
    assert(r.getAs[Long]("rel_retrieved") == 2L)
    assert(r.getAs[Long]("dcg_ppm") == dcg)
    assert(r.getAs[Long]("idcg_ppm") == idcg)
    assert(r.getAs[Long]("ndcg_ppm") == 1000000L * dcg / idcg)
  }

  test("q231 pass@k: estimator bounds, monotonicity in k, degenerate " +
      "tasks exact, and the textbook n=10 c=3 k=5 value") {
    val rows = graft.operators.EvalQueries.passAtK(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val c = r.getAs[Long]("c")
      val ks = Seq(1, 5, 10).map(k =>
        k -> (if (r.isNullAt(r.fieldIndex(s"pass${k}_ppm"))) None
              else Some(r.getAs[Long](s"pass${k}_ppm"))))
      ks.foreach { case (k, v) =>
        assert(v.isDefined == (n >= k), s"n=$n k=$k definedness")
        v.foreach { p =>
          assert(p >= 0 && p <= 1000000, s"pass@$k out of range: $p")
          // degenerate tasks are exact regardless of k
          if (c == 0) assert(p == 0L, "no passing sample must give 0")
          if (c >= n) assert(p == 1000000L, "all-pass must give 1")
          // k >= the failure count makes a pass certain in every draw
          if (c > 0 && k > n - c) assert(p == 1000000L,
            s"k=$k > n-c=${n - c} must be certain")
        }
      }
      // monotone in k: drawing more samples can only help
      val defined = ks.flatMap { case (_, v) => v }
      assert(defined == defined.sorted, s"pass@k not monotone: $defined")
    }
    // hand value: n=10, c=3 -> pass@5 = 1 - C(7,5)/C(10,5)
    //   = 1 - 21/252 = 11/12 -> 1e6 - (1e6*21*120... as the falling
    //   factorial: 1e6 - (1e6 * 7*6*5*4*3) DIV (10*9*8*7*6) = 916667
    val n = 10L; val c = 3L
    def fp(x: Long, k: Int) = (0 until k).map(i => math.max(x - i, 0L)).product
    assert(1000000L - 1000000L * fp(n - c, 5) / fp(n, 5) == 916667L)
    rows.filter(r => r.getAs[Long]("n") == 10 && r.getAs[Long]("c") == 3)
      .foreach(r => assert(r.getAs[Long]("pass5_ppm") == 916667L))
  }
}
