package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Preference-data aggregation and annotation-quality surface — the
  * reward-modeling side of an LLM data pipeline, downstream of the pair
  * construction in [[SftQueries]] (q166): once candidate pairs have been
  * judged (by humans or an LLM judge), the pipeline must (a) turn the
  * pairwise game log into per-generator skill estimates and (b) audit the
  * raters themselves for agreement before trusting their labels.
  *
  * q179 is Bradley–Terry skill estimation (Bradley & Terry 1952; the
  * ranking model behind Chatbot-Arena-style leaderboards) via the
  * standard minorization–maximization update (Hunter 2004),
  *   p_i ← W_i / Σ_j n_ij / (p_i + p_j),
  * run for a FIXED number of rounds. q180 is Cohen's kappa — the
  * chance-corrected inter-rater agreement statistic every annotation
  * effort reports — computed per language cohort.
  *
  * Arithmetic follows the q143 PageRank recipe: every step is
  * order-independent integer math (skills at ppb scale, wins counted in
  * half-units, `DIV` everywhere), so the DuckDB oracle hash-compares
  * bit-for-bit — no doubles, no libm, no float-summation-order hazard.
  *
  * Scale shape (q179): the game log is the input at scale (a real system
  * reads judged comparisons); here it is synthesized with a BOUNDED
  * cohort self-join — documents pair only within (lang, doc_id%B)
  * buckets, so pair volume is Σ cohort² / B, never corpus². The MM loop
  * itself moves only O(players) skill rows per round against an
  * O(player-pairs) aggregate — both tiny relative to the corpus, and the
  * per-round join keys on the player id, so on a cluster the pair table
  * is broadcast (player counts are leaderboard-sized) while the heavy
  * work — folding raw games into per-pair counts — happens once,
  * map-side combinable.
  */
object EvalQueries {

  private val SCALE = 1000000000L // skills in parts-per-billion
  private val NUM = 1000000000000L // DIV numerator scale (SCALE * 1000)

  /** Bradley–Terry skills over the source-vs-source game log: documents
    * meet within (lang, doc_id%10) cohorts, longer text wins (2 half-win
    * units; ties split 1/1), and two MM rounds refine uniform-start
    * skills. A virtual n=1 game against a fixed p=1.0 opponent
    * regularizes undefeated/winless players (standard BT smoothing), so
    * no skill ever hits 0 or diverges. Output: one row per source with
    * its game count, half-win total, and final skill in ppb.
    *
    * Overflow bound (ADVICE r7): the MM numerator `n · 1e12` wraps
    * silently as a Java long once a single (p,q) pair logs n >
    * Long.MaxValue/1e12 ≈ 9.2e6 games — and DuckDB raises instead of
    * wrapping, so the engines would diverge in FAILURE MODE there, not
    * in answers. At that volume rescale NUM down (skills are
    * scale-invariant under MM) or pre-aggregate games per cohort shard;
    * same pattern as the Fleiss-kappa 18N² bound (q197). */
  def bradleyTerry(spark: SparkSession, dir: String, iters: Int = 2)
      : DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"), col("lang"), (col("doc_id") % 10).as("bucket"),
        col("n_chars"))
      // single-file fixture reads as one task; spread the cohort
      // self-join across the cores (the q37 recipe)
      .repartition(spark.sparkContext.defaultParallelism,
        col("lang"), col("bucket"))
    // bounded pair generation: cross-source pairs inside each cohort only
    val games = docs.as("a").join(docs.as("b"),
        col("a.lang") === col("b.lang") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.source") < col("b.source"))
      .select(col("a.source").as("p"), col("b.source").as("q"),
        when(col("a.n_chars") > col("b.n_chars"), lit(2L))
          .when(col("a.n_chars") === col("b.n_chars"), lit(1L))
          .otherwise(lit(0L)).as("wa"))
    // the heavy corpus-side work (cohort self-join folded to per-pair
    // counts) is checkpointed ONCE at O(player-pairs) rows; the MM loop
    // below re-reads only this leaderboard-sized frame
    val pairAgg = games.groupBy("p", "q")
      .agg(count(lit(1)).as("n"), sum(col("wa")).as("w"))
      .localCheckpoint()
    // symmetrize: one row per (player, opponent) direction
    val sym = pairAgg.select(col("p").as("player"), col("q").as("opp"),
        col("n"), col("w"))
      .unionAll(pairAgg.select(col("q").as("player"), col("p").as("opp"),
        col("n"), (lit(2L) * col("n") - col("w")).as("w")))
    val totals = sym.groupBy("player")
      .agg(sum(col("n")).as("n_games"), sum(col("w")).as("wins_half"))
    var skills = totals.select(col("player"), lit(SCALE).as("skill"))
    for (_ <- 1 to iters) {
      val si = skills.select(col("player"), col("skill").as("pi"))
      val sj = skills.select(col("player").as("opp"), col("skill").as("pj"))
      val denom = sym
        .join(si, "player").join(sj, "opp")
        .select(col("player"),
          expr(s"n * $NUM DIV (pi + pj)").as("d"))
        .groupBy("player").agg(sum(col("d")).as("dsum"))
      skills = denom.join(si, "player").join(totals, "player")
        .select(col("player"),
          expr(s"(wins_half + 1) * $NUM DIV " +
            s"(2 * (dsum + $NUM DIV (pi + $SCALE)))").as("skill"))
    }
    // sym appears in several aggregate subtrees (totals + one per round),
    // but each re-evaluation is a projection over the checkpointed
    // pair-count blocks — the corpus is never rescanned.
    totals.join(skills, "player")
      .select(col("player").as("source"), col("n_games"), col("wins_half"),
        col("skill").as("skill_ppb"))
      .orderBy("source")
  }

  /** Cohen's kappa between two deterministic "raters" per language
    * cohort: rater A buckets quality by raw length (n_chars <200 / <400 /
    * else), rater B by whitespace token count (<30 / <70 / else) — two
    * length-family judges with deliberately unaligned scales, the classic
    * moderate-agreement setup. kappa = (p_o − p_e)/(1 − p_e) is computed
    * from the contingency marginals as exact integers:
    *   kappa_ppm = 1e6·(N·A − S) DIV (N² − S),  S = Σ_k cA_k·cB_k.
    * One aggregation pass per cohort — the marginals and the agreement
    * diagonal come out of the same groupBy (map-side combinable; no
    * second scan, no pivot). */
  def raterAgreement(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val ra = when(col("n_chars") < 200, 0)
      .when(col("n_chars") < 400, 1).otherwise(2)
    val nTok = size(split(trim(lower(col("text"))), "\\s+"))
    val rb = when(nTok < 30, 0).when(nTok < 70, 1).otherwise(2)
    val rated = docs.select(col("lang"), ra.as("ra"), rb.as("rb"))
    val agg = rated.groupBy("lang").agg(
      count(lit(1)).as("n"),
      sum(when(col("ra") === col("rb"), 1L).otherwise(0L)).as("agree"),
      sum(when(col("ra") === 0, 1L).otherwise(0L)).as("ca0"),
      sum(when(col("ra") === 1, 1L).otherwise(0L)).as("ca1"),
      sum(when(col("ra") === 2, 1L).otherwise(0L)).as("ca2"),
      sum(when(col("rb") === 0, 1L).otherwise(0L)).as("cb0"),
      sum(when(col("rb") === 1, 1L).otherwise(0L)).as("cb1"),
      sum(when(col("rb") === 2, 1L).otherwise(0L)).as("cb2"))
    agg
      .withColumn("s", col("ca0") * col("cb0") + col("ca1") * col("cb1") +
        col("ca2") * col("cb2"))
      .select(col("lang"), col("n"), col("agree"),
        expr("1000000 * agree DIV n").as("po_ppm"),
        expr("1000000 * s DIV (n * n)").as("pe_ppm"),
        // pe = 1 (single-class degenerate cohort) leaves kappa undefined
        when(col("n") * col("n") =!= col("s"),
          expr("1000000 * (n * agree - s) DIV (n * n - s)")).as("kappa_ppm"))
      .orderBy("lang")
  }

  /** χ² drift audit between two corpus snapshots: are documents
    * distributed over sources the same way in the "old" half (even
    * doc_ids — the stand-in for the previous crawl) as in the "new" half?
    * Every ingestion pipeline runs this gate before re-weighting its
    * mixture; a drifting feed shows up as a large per-source χ²
    * contribution. The statistic is the textbook Σ (O−E)²/E over the
    * source×half contingency table, kept integer-exact: E is truncated
    * to `R·C DIV N` FIRST, so the squared deviation stays O(cell-count)
    * and the ppm term `1e6·d² DIV max(E,1)` is safe while every cell
    * count stays below √(Long.MaxValue/1e6) ≈ 3.0e6 documents — past
    * that, 1e6·d² wraps as a Java long where DuckDB raises (ADVICE r7:
    * divergent failure modes, not divergent answers). Shard the
    * contingency per cohort or drop the ppm scale before that bound.
    *
    * Scale shape: one map-side-combinable groupBy(source) builds the
    * whole table; the (N, C_old, C_new) totals ride in on a broadcast
    * single-row frame. O(sources) output. */
  def chi2Drift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"), (col("doc_id") % 2 === 0).as("old_half"))
    val cells = docs.groupBy("source").agg(
      sum(when(col("old_half"), 1L).otherwise(0L)).as("n_old"),
      sum(when(!col("old_half"), 1L).otherwise(0L)).as("n_new"))
    val totals = docs.agg(
      count(lit(1)).as("n"),
      sum(when(col("old_half"), 1L).otherwise(0L)).as("c_old"),
      sum(when(!col("old_half"), 1L).otherwise(0L)).as("c_new"))
    cells.crossJoin(broadcast(totals))
      .withColumn("e_old", expr("(n_old + n_new) * c_old DIV n"))
      .withColumn("e_new", expr("(n_old + n_new) * c_new DIV n"))
      .select(col("source"), col("n_old"), col("n_new"),
        expr("""1000000 * (n_old - e_old) * (n_old - e_old)
                  DIV greatest(e_old, 1)
              + 1000000 * (n_new - e_new) * (n_new - e_new)
                  DIV greatest(e_new, 1)""").as("chi2_ppm"))
      .orderBy("source")
  }

  /** Stride-scheduled training order (the deterministic weighted
    * interleave a data loader materializes): low-resource languages get
    * weight 2e6 ppm (2× upsampling), English 1e6, and each document's
    * schedule key is `i · (1e12 DIV weight)` for its within-language
    * index i — classic stride scheduling, so a 2×-weighted language
    * appears twice as often in any prefix of the key-sorted stream.
    * Shards are `key-order mod nShards`. Emitting the KEY (not a global
    * row_number) keeps the plan scale-safe: the total order is sortable
    * without a single-partition window, and any range of the schedule
    * can be produced independently.
    *
    * Scale shape: one window per language cohort (the within-lang
    * index), then pure projection; the output order is the consumer's
    * range-sort. */
  def strideSchedule(spark: SparkSession, dir: String, nShards: Int = 8)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("doc_id")
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("weight_ppm",
        when(col("lang") === "en", 1000000L).otherwise(2000000L))
      .withColumn("sched_key", expr("i * (1000000000000 DIV weight_ppm)"))
      .withColumn("shard",
        expr(s"(i * (1000000000000 DIV weight_ppm)) % $nShards"))
      .select("doc_id", "lang", "i", "sched_key", "shard")
      .orderBy("sched_key", "lang", "doc_id")
  }

  /** Spearman rank correlation between two quality scorers per language
    * cohort — "do my cheap heuristic and my expensive scorer agree?" is
    * the question every quality-filter ablation starts with. Scorer A is
    * raw length, scorer B the token count; ranks are ROW_NUMBER with a
    * doc_id tiebreak (deterministic total order — documented departure
    * from midrank ties, same trade as q88's rational idf), and
    *   ρ_ppm = 1e6 − 6e6·Σd² DIV (n·(n²−1))
    * is exact BIGINT end to end.
    *
    * Scale shape: two windows over the same cohort exchange (the q184
    * pattern) + one per-cohort sum. */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long")
          .as("n_tok"))
    val ra = Window.partitionBy("lang")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val rb = Window.partitionBy("lang")
      .orderBy(col("n_tok").desc, col("doc_id").asc)
    docs
      .withColumn("r_a", row_number().over(ra).cast("long"))
      .withColumn("r_b", row_number().over(rb).cast("long"))
      .groupBy("lang").agg(
        count(lit(1)).as("n"),
        sum((col("r_a") - col("r_b")) * (col("r_a") - col("r_b")))
          .as("d2"))
      .select(col("lang"), col("n"), col("d2"),
        when(col("n") > 1,
          expr("1000000 - 6000000 * d2 DIV (n * (n * n - 1))"))
          .as("rho_ppm"))
      .orderBy("lang")
  }

  /** ROC AUC via the Mann–Whitney rank-sum, per language cohort: label =
    * "document mentions vector" (the q184 qrel convention), score = raw
    * length. AUC = (Σ ranks(positives) − P(P+1)/2) / (P·N) with ranks
    * ascending by score — the probability a random positive outscores a
    * random negative, the metric every quality-classifier ablation
    * reports. ROW_NUMBER ranks with doc_id tiebreaks (deterministic;
    * midrank tie-correction documented away), exact BIGINT ppm.
    *
    * Scale shape: one window per cohort + one aggregation — AUC over a
    * 100 TB score table is one sort-shuffle, never a pairwise join. */
  def aucEval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"),
        array_contains(split(trim(lower(col("text"))), "\\s+"), "vector")
          .cast("long").as("label"))
    val byScore = Window.partitionBy("lang")
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    docs
      .withColumn("r", row_number().over(byScore).cast("long"))
      .groupBy("lang").agg(
        count(lit(1)).as("n"),
        sum(col("label")).as("n_pos"),
        sum(col("label") * col("r")).as("rank_sum"))
      .select(col("lang"), col("n"), col("n_pos"),
        when(col("n_pos") > 0 && col("n_pos") < col("n"),
          expr("""1000000 * (2 * rank_sum - n_pos * (n_pos + 1))
                  DIV (2 * n_pos * (n - n_pos))"""))
          .as("auc_ppm"))
      .orderBy("lang")
  }

  /** Fleiss' kappa per language — q180's Cohen kappa generalized to a
    * rater PANEL (here three deterministic judges bucketing each doc
    * into short/medium/long by chars, tokens, and raw length). This is
    * the agreement audit for multi-judge preference/SFT labeling: Cohen
    * handles exactly two raters; panels need Fleiss.
    *
    * Exact integer form (n = 3 raters, k = 3 categories): per item
    * Σ_j n_ij² − n = 2·(pairwise matches among the three ratings), so
    * P̄ = S/(6N) with S = Σ_i 2·matches_i, P̄e = Σ_j c_j²/(9N²) over
    * category column totals, and
    *   κ = (3N·S − 2Σc²) / (18N² − 2Σc²)
    * after clearing denominators — all BIGINT (cohorts to ~7·10⁸ rows
    * before 18N² overflows; rescale per-shard beyond). NULL when every
    * rating lands in one category (denominator 0, κ undefined).
    *
    * Scale shape: one map-side-combinable groupBy(lang) over per-row
    * integer columns; O(langs) output, no joins, no shuffle beyond the
    * single aggregation exchange. */
  def fleissKappa(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val ra = when(col("n_chars") < 200, 0)
      .when(col("n_chars") < 400, 1).otherwise(2)
    val nTok = size(split(trim(lower(col("text"))), "\\s+"))
    val rb = when(nTok < 30, 0).when(nTok < 70, 1).otherwise(2)
    val len = length(col("text"))
    val rc = when(len < 220, 0).when(len < 420, 1).otherwise(2)
    val rated = docs.select(col("lang"), ra.as("ra"), rb.as("rb"),
      rc.as("rc"))
    val matches =
      when(col("ra") === col("rb"), 1L).otherwise(0L) +
      when(col("ra") === col("rc"), 1L).otherwise(0L) +
      when(col("rb") === col("rc"), 1L).otherwise(0L)
    def catCount(j: Int) =
      (when(col("ra") === j, 1L).otherwise(0L) +
       when(col("rb") === j, 1L).otherwise(0L) +
       when(col("rc") === j, 1L).otherwise(0L))
    val agg = rated.groupBy("lang").agg(
      count(lit(1)).as("n"),
      sum(lit(2L) * matches).as("s"),
      sum(catCount(0)).as("c0"),
      sum(catCount(1)).as("c1"),
      sum(catCount(2)).as("c2"))
    agg
      .withColumn("sc2",
        col("c0") * col("c0") + col("c1") * col("c1") +
          col("c2") * col("c2"))
      .select(col("lang"), col("n"),
        expr("1000000 * s DIV (6 * n)").as("p_bar_ppm"),
        expr("1000000 * sc2 DIV (9 * n * n)").as("p_e_ppm"),
        when(expr("18 * n * n - 2 * sc2") =!= 0L,
          expr("1000000 * (3 * n * s - 2 * sc2) DIV " +
            "(18 * n * n - 2 * sc2)")).as("fleiss_kappa_ppm"))
      .orderBy("lang")
  }

  /** q231: the unbiased pass@k estimator (Chen et al. 2021, "Evaluating
    * Large Language Models Trained on Code", eq. 1) — per task with n
    * samples of which c pass, `pass@k = 1 − C(n−c,k)/C(n,k)`: the
    * number every code-eval harness (HumanEval/MBPP) reports, and the
    * aggregation a sampling-eval pipeline runs over millions of
    * (task, sample, verdict) rows. Tasks and verdicts are synthesized
    * deterministically (task = doc_id DIV 10 — a FIXED ~10 samples per
    * task at every scale factor, which keeps the falling-factorial
    * products in BIGINT range at any corpus size; a sample passes when
    * its seeded-md5 uniform lands in 1/3), so the oracle replays them.
    * The binomial ratio is computed EXACTLY: Π_{i<k}(n−c−i) /
    * Π_{i<k}(n−i) with the C(m,k)=0-for-m<k convention riding the
    * greatest(·,0) factors, one integer DIV per k, null when n < k.
    *
    * Scale shape: one map pass for verdicts, one map-side-combined hash
    * aggregate keyed by task, per-row integer products — output is
    * O(tasks). */
  def passAtK(spark: SparkSession, dir: String,
      ks: Seq[Int] = Seq(1, 5, 10)): DataFrame = {
    val s = Tables.load(spark, dir, "documents")
      .select(expr("doc_id DIV 10").as("task_id"),
        (conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("#pak42"))), 1, 6), 16, 10) % 3 === 0)
          .cast("long").as("pass"))
    val per = s.groupBy("task_id")
      .agg(count(lit(1)).as("n"), sum(col("pass")).as("c"))
    def fallProd(x: Column, k: Int): Column =
      (0 until k).map(i => greatest(x - lit(i.toLong), lit(0L)))
        .reduce(_ * _)
    val withK = ks.foldLeft(per) { (df, k) =>
      df.withColumn(s"num$k", fallProd(col("n") - col("c"), k))
        .withColumn(s"den$k", fallProd(col("n"), k))
        .withColumn(s"pass${k}_ppm",
          when(col("n") >= k,
            expr(s"1000000 - (1000000 * num$k) DIV den$k"))
            .otherwise(lit(null).cast("long")))
    }
    withK.select(Seq(col("task_id"), col("n"), col("c")) ++
      ks.map(k => col(s"pass${k}_ppm")): _*)
      .orderBy("task_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q231_pass_at_k" ->
      ((s: SparkSession, d: String) => passAtK(s, d)),
    "q179_bradley_terry" ->
      ((s: SparkSession, d: String) => bradleyTerry(s, d)),
    "q180_rater_agreement" -> (raterAgreement _),
    "q197_fleiss_kappa" -> (fleissKappa _),
    "q185_chi2_drift" -> (chi2Drift _),
    "q186_stride_schedule" ->
      ((s: SparkSession, d: String) => strideSchedule(s, d)),
    "q188_spearman" -> (spearman _),
    "q189_auc" -> (aucEval _),
    "q191_skyline" -> (skyline _),
    "q192_source_percentile" -> (sourcePercentile _),
    "q193_ks_test" -> (ksTest _),
    "q194_vocab_gini" -> (vocabGini _))

  /** Two-sample Kolmogorov–Smirnov statistic per language: does the
    * LENGTH DISTRIBUTION of the new half (odd doc_ids) match the old
    * half? The continuous-score sibling of q185's categorical χ² — the
    * drift gate for scores rather than labels. D = max|F₁−F₂| kept
    * rational: at every distinct score the deviation is
    * |cum₁·n₂ − cum₂·n₁| (exact BIGINT), and
    * ks_ppm = 1e6·max DIV (n₁·n₂).
    *
    * Scale shape: one (lang, score) two-phase count, one cumulative
    * window over the per-lang sorted distinct scores (O(distinct
    * scores), not O(docs)), one max. */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(spark, dir, "documents")
      .select(col("lang"), (col("doc_id") % 2 === 0).as("old_half"),
        col("n_chars"))
    val byScore = d.groupBy("lang", "n_chars").agg(
      sum(when(col("old_half"), 1L).otherwise(0L)).as("c1"),
      sum(when(!col("old_half"), 1L).otherwise(0L)).as("c2"))
    val cum = Window.partitionBy("lang").orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("lang")
    byScore
      .withColumn("cum1", sum(col("c1")).over(cum))
      .withColumn("cum2", sum(col("c2")).over(cum))
      .withColumn("n1", sum(col("c1")).over(whole))
      .withColumn("n2", sum(col("c2")).over(whole))
      .withColumn("dev",
        abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
      .groupBy("lang").agg(
        max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(col("dev")).as("d_scaled"))
      .select(col("lang"), col("n1"), col("n2"),
        when(col("n1") > 0 && col("n2") > 0,
          expr("1000000 * d_scaled DIV (n1 * n2)")).as("ks_ppm"))
      .orderBy("lang")
  }

  /** Vocabulary Gini concentration per source: how unequal is the token
    * frequency distribution — a diversity signal next to q187's unseen
    * mass (boilerplate-heavy feeds concentrate probability on few
    * types). Standard rank formula on counts sorted ascending
    * (deterministic word tiebreak), exact integers:
    *   gini_ppm = 1e6·(2·Σ i·cᵢ − (n+1)·S) DIV (n·S).
    * Scale shape: one (source, word) two-phase count, one per-source
    * rank window over the vocab (O(vocab), not O(tokens)), one fold. */
  def vocabGini(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = Tables.load(spark, dir, "documents")
      .select(col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val rank = Window.partitionBy("source")
      .orderBy(col("c").asc, col("w").asc)
    wc.withColumn("i", row_number().over(rank).cast("long"))
      .groupBy("source").agg(
        count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        sum(col("i") * col("c")).as("ic"))
      .select(col("source"), col("n_types"), col("n_tokens"),
        expr("""1000000 * (2 * ic - (n_types + 1) * n_tokens)
                DIV (n_types * n_tokens)""").as("gini_ppm"))
      .orderBy("source")
  }

  /** 2-D Pareto skyline per language: documents not dominated on
    * (vocabulary richness ↑, length ↓) — the multi-criteria selection
    * operator behind "best quality per token budget" curation choices,
    * and a query shape Spark has no native operator for. The classic
    * sort-scan lowers to TWO range windows (no self-join, no NOT
    * EXISTS): a document is dominated iff a strictly-shorter document
    * reaches at least its vocabulary, or an equal-length one strictly
    * exceeds it.
    *
    * Scale shape: one cohort exchange, two RANGE windows over the same
    * sort — O(n log n) per cohort vs the O(n²) anti-join a naive NOT
    * EXISTS would plan. */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"),
        size(array_distinct(split(trim(lower(col("text"))), "\\s+")))
          .cast("long").as("n_vocab"))
    val strictlyShorter = Window.partitionBy("lang")
      .orderBy(col("n_chars"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val sameLength = Window.partitionBy("lang", "n_chars")
    docs
      .withColumn("best_shorter",
        max(col("n_vocab")).over(strictlyShorter))
      .withColumn("best_equal", max(col("n_vocab")).over(sameLength))
      .filter(
        (col("best_shorter").isNull || col("best_shorter") < col("n_vocab"))
          && col("best_equal") === col("n_vocab"))
      .select("lang", "doc_id", "n_chars", "n_vocab")
      .orderBy("lang", "n_chars", "doc_id")
  }

  /** Per-source percentile calibration + relative quality gate: raw
    * scores are not comparable across sources (a mediocre doc from a
    * clean feed outscores a good doc from a noisy one), so production
    * filters keep the top X% WITHIN each source rather than applying a
    * global cutoff. pct_ppm = (rank−1)·1e6 DIV (n−1) over the source
    * cohort (deterministic doc_id tiebreak), kept = top 30%. One window
    * + a broadcast-free projection; O(docs) with the cohort exchange as
    * the only shuffle. */
  def sourcePercentile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("source")))
      .withColumn("pct_ppm",
        when(col("n") > 1, expr("(r - 1) * 1000000 DIV (n - 1)"))
          .otherwise(lit(1000000L)))
      .withColumn("kept", (col("pct_ppm") >= 700000L).cast("int"))
      .select("source", "doc_id", "n_chars", "pct_ppm", "kept")
      .orderBy("source", "doc_id")
  }

  /** SQL falling-factorial product Π_{i<k} GREATEST(x−i, 0) — the exact
    * binomial-ratio building block the q231 oracle shares with the Spark
    * side (same factors, same zero convention). */
  private def fallProdSql(x: String, k: Int): String =
    (0 until k).map(i => s"GREATEST($x - $i, 0)").mkString(" * ")

  val oracles: Map[String, String] = Map(
    // q231: same task/verdict synthesis, same exact falling-factorial
    // binomial ratio, same n >= k gating
    "q231_pass_at_k" ->
      s"""WITH s AS (
           SELECT doc_id // 10 AS task_id,
             CASE WHEN CAST(('0x' || substring(
                 md5(CAST(doc_id AS VARCHAR) || '#pak42'), 1, 6))
               AS BIGINT) % 3 = 0 THEN 1 ELSE 0 END AS pass
           FROM documents),
         p AS (SELECT task_id, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(pass) AS BIGINT) AS c
               FROM s GROUP BY task_id)
         SELECT task_id, n, c,
           CASE WHEN n >= 1 THEN 1000000
             - (1000000 * ${fallProdSql("(n - c)", 1)})
               // (${fallProdSql("n", 1)}) END AS pass1_ppm,
           CASE WHEN n >= 5 THEN 1000000
             - (1000000 * ${fallProdSql("(n - c)", 5)})
               // (${fallProdSql("n", 5)}) END AS pass5_ppm,
           CASE WHEN n >= 10 THEN 1000000
             - (1000000 * ${fallProdSql("(n - c)", 10)})
               // (${fallProdSql("n", 10)}) END AS pass10_ppm
         FROM p ORDER BY task_id""",
    // identical cohorting, half-win units, and two unrolled integer MM
    // rounds (DuckDB `//` = Spark `DIV` on positive BIGINTs)
    "q179_bradley_terry" ->
      """WITH d AS (
           SELECT source, lang, doc_id % 10 AS bucket, n_chars
           FROM documents),
         g AS (
           SELECT a.source AS p, b.source AS q,
             CASE WHEN a.n_chars > b.n_chars THEN 2
                  WHEN a.n_chars = b.n_chars THEN 1 ELSE 0 END AS wa
           FROM d a JOIN d b
             ON a.lang = b.lang AND a.bucket = b.bucket
            AND a.source < b.source),
         pa AS (
           SELECT p, q, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(wa) AS BIGINT) AS w
           FROM g GROUP BY p, q),
         sym AS (
           SELECT p AS player, q AS opp, n, w FROM pa
           UNION ALL
           SELECT q AS player, p AS opp, n, 2 * n - w FROM pa),
         tot AS (
           SELECT player, CAST(sum(n) AS BIGINT) AS n_games,
             CAST(sum(w) AS BIGINT) AS wins_half
           FROM sym GROUP BY player),
         s1 AS (
           SELECT t.player,
             (t.wins_half + 1) * 1000000000000 //
               (2 * (d.dsum + 1000000000000 // (1000000000 + 1000000000)))
               AS skill
           FROM tot t JOIN (
             SELECT player,
               CAST(sum(n * 1000000000000 //
                 (1000000000 + 1000000000)) AS BIGINT) AS dsum
             FROM sym GROUP BY player) d USING (player)),
         s2 AS (
           SELECT t.player,
             (t.wins_half + 1) * 1000000000000 //
               (2 * (d.dsum + 1000000000000 // (si.skill + 1000000000)))
               AS skill
           FROM tot t
           JOIN (
             SELECT sym.player,
               CAST(sum(sym.n * 1000000000000 //
                 (si.skill + sj.skill)) AS BIGINT) AS dsum
             FROM sym
             JOIN s1 si ON si.player = sym.player
             JOIN s1 sj ON sj.player = sym.opp
             GROUP BY sym.player) d ON d.player = t.player
           JOIN s1 si ON si.player = t.player)
         SELECT t.player AS source, t.n_games, t.wins_half,
           s2.skill AS skill_ppb
         FROM tot t JOIN s2 ON s2.player = t.player
         ORDER BY source""",
    // same rater bucketings, same exact-integer kappa
    "q180_rater_agreement" ->
      raw"""WITH r AS (
           SELECT lang,
             CASE WHEN n_chars < 200 THEN 0
                  WHEN n_chars < 400 THEN 1 ELSE 2 END AS ra,
             CASE WHEN len(string_split_regex(trim(lower(text)), '\s+')) < 30
                    THEN 0
                  WHEN len(string_split_regex(trim(lower(text)), '\s+')) < 70
                    THEN 1 ELSE 2 END AS rb
           FROM documents),
         a AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT)
               AS agree,
             CAST(sum(CASE WHEN ra = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca0,
             CAST(sum(CASE WHEN ra = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ca1,
             CAST(sum(CASE WHEN ra = 2 THEN 1 ELSE 0 END) AS BIGINT) AS ca2,
             CAST(sum(CASE WHEN rb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb0,
             CAST(sum(CASE WHEN rb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb1,
             CAST(sum(CASE WHEN rb = 2 THEN 1 ELSE 0 END) AS BIGINT) AS cb2
           FROM r GROUP BY lang)
         SELECT lang, n, agree,
           1000000 * agree // n AS po_ppm,
           1000000 * (ca0*cb0 + ca1*cb1 + ca2*cb2) // (n * n) AS pe_ppm,
           CASE WHEN n * n <> (ca0*cb0 + ca1*cb1 + ca2*cb2) THEN
             1000000 * (n * agree - (ca0*cb0 + ca1*cb1 + ca2*cb2)) //
               (n * n - (ca0*cb0 + ca1*cb1 + ca2*cb2)) END AS kappa_ppm
         FROM a ORDER BY lang""",
    // q197: same three rater bucketings, same cleared-denominator
    // integer Fleiss arithmetic
    "q197_fleiss_kappa" ->
      raw"""WITH r AS (
           SELECT lang,
             CASE WHEN n_chars < 200 THEN 0
                  WHEN n_chars < 400 THEN 1 ELSE 2 END AS ra,
             CASE WHEN len(string_split_regex(trim(lower(text)), '\s+')) < 30
                    THEN 0
                  WHEN len(string_split_regex(trim(lower(text)), '\s+')) < 70
                    THEN 1 ELSE 2 END AS rb,
             CASE WHEN len(text) < 220 THEN 0
                  WHEN len(text) < 420 THEN 1 ELSE 2 END AS rc
           FROM documents),
         a AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(2 * (CASE WHEN ra = rb THEN 1 ELSE 0 END
               + CASE WHEN ra = rc THEN 1 ELSE 0 END
               + CASE WHEN rb = rc THEN 1 ELSE 0 END)) AS BIGINT) AS s,
             CAST(sum(CASE WHEN ra = 0 THEN 1 ELSE 0 END
               + CASE WHEN rb = 0 THEN 1 ELSE 0 END
               + CASE WHEN rc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN ra = 1 THEN 1 ELSE 0 END
               + CASE WHEN rb = 1 THEN 1 ELSE 0 END
               + CASE WHEN rc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN ra = 2 THEN 1 ELSE 0 END
               + CASE WHEN rb = 2 THEN 1 ELSE 0 END
               + CASE WHEN rc = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
           FROM r GROUP BY lang)
         SELECT lang, n,
           1000000 * s // (6 * n) AS p_bar_ppm,
           1000000 * (c0*c0 + c1*c1 + c2*c2) // (9 * n * n) AS p_e_ppm,
           CASE WHEN 18 * n * n - 2 * (c0*c0 + c1*c1 + c2*c2) <> 0 THEN
             1000000 * (3 * n * s - 2 * (c0*c0 + c1*c1 + c2*c2)) //
               (18 * n * n - 2 * (c0*c0 + c1*c1 + c2*c2))
           END AS fleiss_kappa_ppm
         FROM a ORDER BY lang""",
    // same truncated-expected integer χ², same even/odd halves
    "q185_chi2_drift" ->
      """WITH d AS (
           SELECT source, doc_id % 2 = 0 AS old_half FROM documents),
         cells AS (
           SELECT source,
             CAST(sum(CASE WHEN old_half THEN 1 ELSE 0 END) AS BIGINT)
               AS n_old,
             CAST(sum(CASE WHEN old_half THEN 0 ELSE 1 END) AS BIGINT)
               AS n_new
           FROM d GROUP BY source),
         t AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN old_half THEN 1 ELSE 0 END) AS BIGINT)
               AS c_old,
             CAST(sum(CASE WHEN old_half THEN 0 ELSE 1 END) AS BIGINT)
               AS c_new
           FROM d),
         e AS (
           SELECT source, n_old, n_new,
             (n_old + n_new) * c_old // n AS e_old,
             (n_old + n_new) * c_new // n AS e_new
           FROM cells, t)
         SELECT source, n_old, n_new,
           1000000 * (n_old - e_old) * (n_old - e_old)
             // greatest(e_old, 1)
           + 1000000 * (n_new - e_new) * (n_new - e_new)
             // greatest(e_new, 1) AS chi2_ppm
         FROM e ORDER BY source""",
    // same row_number ranks (doc_id tiebreak), same rational rho
    "q188_spearman" ->
      raw"""WITH d AS (
           SELECT lang, doc_id, n_chars,
             CAST(len(string_split_regex(trim(lower(text)), '\s+'))
               AS BIGINT) AS n_tok
           FROM documents),
         r AS (
           SELECT lang,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS r_a,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY n_tok DESC, doc_id ASC) AS BIGINT) AS r_b
           FROM d)
         SELECT lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum((r_a - r_b) * (r_a - r_b)) AS BIGINT) AS d2,
           CASE WHEN count(*) > 1 THEN
             1000000 - 6000000 * CAST(sum((r_a - r_b) * (r_a - r_b))
               AS BIGINT)
               // (CAST(count(*) AS BIGINT)
                   * (CAST(count(*) AS BIGINT)
                      * CAST(count(*) AS BIGINT) - 1))
           END AS rho_ppm
         FROM r GROUP BY lang ORDER BY lang""",
    // same ascending-score ranks, same Mann-Whitney rank-sum AUC
    "q189_auc" ->
      raw"""WITH d AS (
           SELECT lang, doc_id, n_chars,
             CASE WHEN list_contains(
               string_split_regex(trim(lower(text)), '\s+'), 'vector')
               THEN 1 ELSE 0 END AS label
           FROM documents),
         r AS (
           SELECT lang, label,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS r
           FROM d)
         SELECT lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(label) AS BIGINT) AS n_pos,
           CASE WHEN sum(label) > 0 AND sum(label) < count(*) THEN
             1000000 * (2 * CAST(sum(label * r) AS BIGINT)
                 - CAST(sum(label) AS BIGINT)
                   * (CAST(sum(label) AS BIGINT) + 1))
               // (2 * CAST(sum(label) AS BIGINT)
                   * (CAST(count(*) AS BIGINT)
                      - CAST(sum(label) AS BIGINT)))
           END AS auc_ppm
         FROM r GROUP BY lang ORDER BY lang""",
    // same (lang, score) fold, cumulative window, rational D
    "q193_ks_test" ->
      """WITH d AS (
           SELECT lang, doc_id % 2 = 0 AS old_half, n_chars
           FROM documents),
         s AS (
           SELECT lang, n_chars,
             CAST(sum(CASE WHEN old_half THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
             CAST(sum(CASE WHEN old_half THEN 0 ELSE 1 END) AS BIGINT)
               AS c2
           FROM d GROUP BY lang, n_chars),
         c AS (
           SELECT lang,
             sum(c1) OVER (PARTITION BY lang ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             sum(c2) OVER (PARTITION BY lang ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
             sum(c1) OVER (PARTITION BY lang) AS n1,
             sum(c2) OVER (PARTITION BY lang) AS n2
           FROM s)
         SELECT lang, CAST(max(n1) AS BIGINT) AS n1,
           CAST(max(n2) AS BIGINT) AS n2,
           CASE WHEN max(n1) > 0 AND max(n2) > 0 THEN
             1000000 * CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT)
               // CAST(max(n1) * max(n2) AS BIGINT)
           END AS ks_ppm
         FROM c GROUP BY lang ORDER BY lang""",
    // same ascending (count, word) ranks, same rational Gini
    "q194_vocab_gini" ->
      raw"""WITH wc AS (
           SELECT source, w, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT source,
                   unnest(string_split_regex(trim(lower(text)), '\s+'))
                     AS w
                 FROM documents)
           GROUP BY source, w),
         r AS (
           SELECT source, c,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY c ASC, w ASC) AS BIGINT) AS i
           FROM wc)
         SELECT source, CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           1000000 * (2 * CAST(sum(i * c) AS BIGINT)
               - (CAST(count(*) AS BIGINT) + 1)
                 * CAST(sum(c) AS BIGINT))
             // (CAST(count(*) AS BIGINT) * CAST(sum(c) AS BIGINT))
             AS gini_ppm
         FROM r GROUP BY source ORDER BY source""",
    // same two-window skyline lowering (strict-shorter range frame +
    // equal-length max)
    "q191_skyline" ->
      raw"""WITH d AS (
           SELECT lang, doc_id, n_chars,
             CAST(len(list_distinct(
               string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT)
               AS n_vocab
           FROM documents),
         w AS (
           SELECT lang, doc_id, n_chars, n_vocab,
             max(n_vocab) OVER (PARTITION BY lang ORDER BY n_chars
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_shorter,
             max(n_vocab) OVER (PARTITION BY lang, n_chars)
               AS best_equal
           FROM d)
         SELECT lang, doc_id, n_chars, n_vocab FROM w
         WHERE (best_shorter IS NULL OR best_shorter < n_vocab)
           AND best_equal = n_vocab
         ORDER BY lang, n_chars, doc_id""",
    // same rank-percentile formula and 30% gate
    "q192_source_percentile" ->
      """WITH r AS (
           SELECT source, doc_id, n_chars,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS r,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
           FROM documents)
         SELECT source, doc_id, n_chars,
           CASE WHEN n > 1 THEN (r - 1) * 1000000 // (n - 1)
                ELSE 1000000 END AS pct_ppm,
           CASE WHEN (CASE WHEN n > 1 THEN (r - 1) * 1000000 // (n - 1)
                           ELSE 1000000 END) >= 700000
                THEN 1 ELSE 0 END AS kept
         FROM r ORDER BY source, doc_id""",
    // same per-lang stride keys and shard assignment
    "q186_stride_schedule" ->
      """WITH r AS (
           SELECT doc_id, lang,
             CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id)
               AS BIGINT) AS i,
             CASE WHEN lang = 'en' THEN 1000000 ELSE 2000000 END
               AS weight_ppm
           FROM documents)
         SELECT doc_id, lang, i,
           i * (1000000000000 // weight_ppm) AS sched_key,
           (i * (1000000000000 // weight_ppm)) % 8 AS shard
         FROM r ORDER BY sched_key, lang, doc_id""")
}
