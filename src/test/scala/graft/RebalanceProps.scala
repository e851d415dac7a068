package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Property fuzz for the persisted-IVF maintenance op: random embedding
  * tables × random skew bounds, asserting the invariants that make a
  * re-balance SAFE to run against a live index — conservation (no vector
  * lost or duplicated), bound enforcement (or an exhausted round budget),
  * cold-cell immutability, split-log/table agreement, and search
  * equivalence: with a budget covering every posting, the budget-probed
  * search must return exactly the brute-force top-k over the index
  * contents, before AND after maintenance (a re-balance must never
  * change what an exhaustive search sees). */
class RebalanceProps extends SparkSuite {
  import spark.implicits._

  private def writeEmbeddings(dir: String, n: Int, dims: Int,
      seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dims)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  /** Brute-force cosine top-k over the POSTING TABLE, with the same
    * column expressions the index search uses (same rounding, same
    * tie-break) — the equivalence target for an all-postings budget. */
  private def bruteTopK(dir: String, indexDir: String, k: Int) = {
    val post = spark.read.parquet(s"$indexDir/postings")
      .select(col("cand_id"), col("lv"), col("ln"))
    val q = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        graft.functions.VectorFunctions.l2normF(col("embedding")).as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    q.join(post, col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(
        graft.functions.VectorFunctions.dotF(col("qv"), col("lv")) /
          (col("qn") * col("ln")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "rn", "cand_id", "cos")
  }

  test("rebalance invariants + exhaustive-budget search equivalence " +
      "hold across random tables and skew bounds") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 7919L)
      val n = 250 + rnd.nextInt(150)
      val maxList = 20 + rnd.nextInt(61)
      val root = tmpDir(s"graft-rebal-prop-$seed")
      writeEmbeddings(root, n, dims = 8, seed = seed * 104729L)
      val indexDir = s"$root/index"
      Similarity.ivfBuildIndex(spark, root, indexDir, maxList)
      val postDir = s"$indexDir/postings"
      def cellCounts() = spark.read.parquet(postDir)
        .groupBy("cent_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gen0 = cellCounts()
      assert(gen0.values.sum == n, s"seed $seed: gen0 lost vectors")
      val hot = gen0.filter(_._2 > maxList).keySet
      // exhaustive-budget search BEFORE maintenance
      val big = n.toLong + 1
      val before = Similarity
        .ivfSearchIndex(spark, root, indexDir, k = 3, probeBudget = big)
        .collect().map(_.toSeq).toSet
      assert(before == bruteTopK(root, indexDir, 3).collect()
        .map(_.toSeq).toSet,
        s"seed $seed: pre-maintenance exhaustive search != brute force")
      val log = Similarity.ivfRebalance(spark, indexDir, maxList,
        maxRounds = 6).collect()
      val genN = cellCounts()
      assert(genN.values.sum == n, s"seed $seed: rebalance lost vectors")
      assert((hot.isEmpty && log.isEmpty) || log.nonEmpty)
      if (log.map(_.getAs[Int]("round")).distinct.size < 6)
        assert(genN.values.forall(_ <= maxList),
          s"seed $seed: converged run left a cell over $maxList: $genN")
      gen0.filterNot(kv => hot(kv._1)).foreach { case (cold, cnt) =>
        assert(genN.get(cold).contains(cnt),
          s"seed $seed: cold cell $cold rewritten") }
      // split-log rows of the FINAL round agree with the live table
      // (earlier rounds' children may have split again; the last round's
      // cannot, so their logged counts must be live)
      val lastRound = if (log.isEmpty) -1 else log.map(_.getAs[Int]("round")).max
      log.filter(_.getAs[Int]("round") == lastRound).foreach { r =>
        val child = r.getAs[Long]("child_id")
        val cnt = r.getAs[Long]("n_postings")
        assert(genN.getOrElse(child, 0L) == cnt,
          s"seed $seed: log child $child=$cnt vs ${genN.get(child)}")
      }
      // exhaustive-budget search AFTER maintenance: identical results
      val after = Similarity
        .ivfSearchIndex(spark, root, indexDir, k = 3, probeBudget = big)
        .collect().map(_.toSeq).toSet
      assert(after == before,
        s"seed $seed: exhaustive search changed across the re-balance")
    }
  }

  test("repeated split+merge rounds hold the centroid table under the " +
      "declared cap, conserve every vector, and leave exhaustive search " +
      "unchanged — across random tables and bounds") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 6101L)
      val n = 300 + rnd.nextInt(150)
      val maxList = 40 + rnd.nextInt(41)
      // minList ≤ maxList/2 guarantees every underfull pair's combined
      // count clears the ≤ maxList merge gate, so merge passes converge
      // to at most ONE underfull straggler — the cap below is a theorem,
      // not a fixture accident
      val minList = maxList / 2
      val root = tmpDir(s"graft-merge-prop-$seed")
      writeEmbeddings(root, n, dims = 8, seed = seed * 15485863L)
      val indexDir = s"$root/index"
      Similarity.ivfBuildIndex(spark, root, indexDir, maxList)
      val postDir = s"$indexDir/postings"
      val big = n.toLong + 1
      val before = Similarity
        .ivfSearchIndex(spark, root, indexDir, k = 3, probeBudget = big)
        .collect().map(_.toSeq).toSet
      // alternate the two maintenance moves until both are no-ops
      var pass = 0
      var quiet = false
      while (pass < 8 && !quiet) {
        val splits = Similarity
          .ivfRebalance(spark, indexDir, maxList, maxRounds = 6).count()
        val merged = Similarity
          .ivfMergeCells(spark, indexDir, maxList, minList).count()
        quiet = splits == 0 && merged == 0
        pass += 1
      }
      assert(quiet, s"seed $seed: split+merge did not converge in 8 passes")
      val cells = spark.read.parquet(postDir)
        .groupBy("cent_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cells.values.sum == n, s"seed $seed: vectors lost/duplicated")
      assert(cells.values.forall(_ <= maxList),
        s"seed $seed: a cell exceeds $maxList after maintenance")
      assert(cells.values.count(_ < minList) <= 1,
        s"seed $seed: more than one underfull straggler survives: $cells")
      val cap = n / minList + 1
      assert(cells.size <= cap,
        s"seed $seed: ${cells.size} cells exceed the declared cap $cap")
      // centroid table tracks live cells exactly — the probe-time
      // broadcast stays bounded by the same cap
      val centIds = spark.read.parquet(s"$indexDir/centroids")
        .select("cent_id").collect().map(_.getLong(0)).toSet
      assert(centIds == cells.keySet,
        s"seed $seed: centroid table diverged from live cells")
      val after = Similarity
        .ivfSearchIndex(spark, root, indexDir, k = 3, probeBudget = big)
        .collect().map(_.toSeq).toSet
      assert(after == before,
        s"seed $seed: exhaustive search changed across split+merge")
    }
  }
}
