package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaAsset

/** The multimodal decode path is REAL for images: javax.imageio reads true
  * dimensions and pixel-derived features from actual PNG/JPEG bytes; bytes
  * with no installed reader fall back deterministically with decoded=false. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  private def solid(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  test("PNG bytes decode to true dimensions and a real luminance histogram") {
    val png = encode(solid(5, 3, 0xffffff), "png") // all white
    val out = Multimodal.extractFeatures(
      Seq(MediaAsset(1L, png, "image/png")).toDS()).collect()
    assert(out.length == 1)
    val f = out(0)
    assert(f.decoded, "PNG must take the real-decode path")
    assert(f.width == 5 && f.height == 3,
      s"true dimensions expected, got ${f.width}x${f.height}")
    // every pixel is white → luminance 255 → all mass in the top bin
    assert(f.features(7) == 1.0f && f.features.take(7).forall(_ == 0.0f),
      s"histogram wrong: ${f.features.toSeq}")
    assert(f.n_bytes == png.length)
  }

  test("black PNG puts all histogram mass in the bottom bin") {
    val png = encode(solid(4, 4, 0x000000), "png")
    val f = Multimodal.extractFeatures(
      Seq(MediaAsset(2L, png, "image/png")).toDS()).collect()(0)
    assert(f.decoded && f.width == 4 && f.height == 4)
    assert(f.features(0) == 1.0f && f.features.drop(1).forall(_ == 0.0f))
  }

  test("JPEG bytes decode to true dimensions through the same path") {
    val jpg = encode(solid(7, 2, 0x808080), "jpg")
    val f = Multimodal.extractFeatures(
      Seq(MediaAsset(3L, jpg, "image/jpeg")).toDS()).collect()(0)
    assert(f.decoded, "JPEG must take the real-decode path")
    assert(f.width == 7 && f.height == 2)
  }

  test("undecodable bytes take the deterministic fallback with decoded=false") {
    val textBytes = "not an image at all".getBytes("UTF-8")
    val run1 = Multimodal.extractFeatures(
      Seq(MediaAsset(4L, textBytes, "text/plain")).toDS()).collect()(0)
    val run2 = Multimodal.extractFeatures(
      Seq(MediaAsset(4L, textBytes, "text/plain")).toDS()).collect()(0)
    assert(!run1.decoded && run1.width == 0 && run1.height == 0)
    assert(run1.checksum == run2.checksum &&
      run1.features.toSeq == run2.features.toSeq, "fallback must be deterministic")
  }

  test("synthetic-PNG round trip: decoded outputs equal the doc_id arithmetic the oracle uses") {
    val out = Multimodal.roundtripQuery(spark, sf0001).collect()
    assert(out.length > 0)
    out.foreach { r =>
      val id = r.getAs[Long]("asset_id")
      assert(r.getAs[Boolean]("decoded"), s"asset $id fell to the fallback")
      assert(r.getAs[Int]("width") == 1 + (id % 7).toInt)
      assert(r.getAs[Int]("height") == 1 + (id % 5).toInt)
      assert(r.getAs[Int]("lum_bin") == (id % 256).toInt / 32,
        s"asset $id: luminance bin disagrees with gray>>5")
    }
  }

  test("dhash: gradient image bits, duplicate invariance, fallback") {
    // left-dark/right-light 8×8: every adjacent-column comparison rises →
    // all 56 bits set
    val rising = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val g = x * 30
      rising.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    assert(Multimodal.dhashOf(rising) == (1L << 56) - 1)
    // falling gradient → no bit set; solid → no bit set
    val falling = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val g = (7 - x) * 30
      falling.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    assert(Multimodal.dhashOf(falling) == 0L)
    assert(Multimodal.dhashOf(solid(8, 8, 0x808080)) == 0L)
    // scale invariance: the same gradient at 16×16 block-means to the
    // same 8×8 cells → identical hash (the resize-robustness dHash is for)
    val big = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val g = (x / 2) * 30
      big.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    assert(Multimodal.dhashOf(big) == (1L << 56) - 1)
    // PNG and JPEG encodings of the same gradient hash identically —
    // JPEG's lossy DCT must not flip a 30-gray-level column step
    val viaPng = Multimodal.dhashAssets(
      Seq(MediaAsset(1L, encode(rising, "png"), "image/png")).toDS())
      .collect()(0)
    val viaJpg = Multimodal.dhashAssets(
      Seq(MediaAsset(2L, encode(rising, "jpg"), "image/jpeg")).toDS())
      .collect()(0)
    assert(viaPng.decoded && viaPng.dhash == (1L << 56) - 1)
    assert(viaJpg.decoded && viaJpg.dhash == viaPng.dhash,
      s"JPEG hash ${viaJpg.dhash} != PNG hash ${viaPng.dhash}")
    // undecodable bytes: flagged, zero hash, no exception
    val bad = Multimodal.dhashAssets(
      Seq(MediaAsset(3L, Array.tabulate[Byte](32)(_.toByte), "x")).toDS())
      .collect()(0)
    assert(!bad.decoded && bad.dhash == 0L)
  }

  test("q168/q169: fixture dhash equals the oracle arithmetic; near-dup pairs are hamming-sound") {
    val hashes = Multimodal.dhashQuery(spark, sf0001).collect()
    assert(hashes.nonEmpty && hashes.forall(_.getAs[Boolean]("decoded")))
    hashes.take(64).foreach { r =>
      val id = r.getAs[Long]("asset_id")
      var expect = 0L
      for (cy <- 0 until 8; cx <- 0 until 7) {
        val shift =
          if (cy < 7) (id / 4 * (2 * cy + 3) * 41) % 256
          else (id / 4 * 97 + (id % 4) * 8) % 256
        if ((cx * 73 + shift) % 256 < 183)
          expect |= 1L << (cy * 7 + cx)
      }
      assert(r.getAs[Long]("dhash") == expect,
        s"asset $id: decoded dhash diverged from the gradient arithmetic")
    }
    val byId = hashes.map(r =>
      r.getAs[Long]("asset_id") -> r.getAs[Long]("dhash")).toMap
    val pairs = Multimodal.imageNearDupQuery(spark, sf0001).collect()
    assert(pairs.nonEmpty, "the mod-256 fixture must contain exact dups")
    pairs.foreach { p =>
      val (a, b) = (p.getAs[Long]("id1"), p.getAs[Long]("id2"))
      val ham = java.lang.Long.bitCount(byId(a) ^ byId(b)).toLong
      assert(a < b && ham == p.getAs[Long]("hamming") && ham <= 6)
    }
    // planted structure: same id-div-4 group shares rows 0–6, so every
    // intra-group pair within the hamming budget differs only in row-7
    // bits (one band) — the band gate must catch ALL of them
    val got = pairs.map(p =>
      (p.getAs[Long]("id1"), p.getAs[Long]("id2"))).toSet
    val byGroup = hashes.map(r =>
      r.getAs[Long]("asset_id") -> r.getAs[Long]("dhash"))
      .groupBy(_._1 / 4)
    var intra = 0
    byGroup.values.filter(_.length >= 2).foreach { g =>
      val s = g.sortBy(_._1)
      for (i <- s.indices; j <- i + 1 until s.length)
        if (java.lang.Long.bitCount(s(i)._2 ^ s(j)._2) <= 6) {
          intra += 1
          assert(got.contains((s(i)._1, s(j)._1)),
            s"intra-group pair (${s(i)._1}, ${s(j)._1}) missed by the band gate")
        }
    }
    assert(intra > 0, "fixture lost its planted near-dup groups")
  }

  test("mixed batch: images and non-images keep their lanes (batched mapPartitions)") {
    val png = encode(solid(2, 2, 0xffffff), "png")
    val assets = (1L to 50L).map { i =>
      if (i % 2 == 0) MediaAsset(i, png, "image/png")
      else MediaAsset(i, s"doc $i".getBytes("UTF-8"), "text/plain")
    }
    val out = Multimodal.extractFeatures(assets.toDS().repartition(4),
      batchSize = 8).collect().map(f => f.asset_id -> f).toMap
    assert(out.size == 50)
    assert((1L to 50L).forall(i => out(i).decoded == (i % 2 == 0)))
    assert(out(2L).width == 2 && out(1L).width == 0)
  }

  test("q190 video near-dup: planted triples recovered exactly at a " +
      "scale below the mod-256 ramp aliasing") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("video") + "/d"
    // 30 videos → triples 0..9 → gradient group ids ≤ 64: no two frame
    // ramps coincide mod 256, so the ONLY shared frames are the planted
    // five-frame prefixes
    (0L until 30L).map(i => (i, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Multimodal.videoNearDup(spark, dir).collect()
    // exactly C(3,2)=3 pairs per triple, all inside triples
    assert(out.length == 30, s"expected 10 triples x 3 pairs: ${out.length}")
    assert(out.forall(r =>
      r.getAs[Long]("vid_a") / 3 == r.getAs[Long]("vid_b") / 3),
      "a pair crossed triple boundaries")
    // shared = the 5-frame prefix; signatures are 6 distinct hashes each
    assert(out.forall(_.getAs[Long]("shared_frames") == 5L))
    assert(out.forall(_.getAs[Long]("jaccard_ppm") == 1000000L * 5 / 7))
  }

  test("q199: video clusters close the q190 pair graph; min id kept") {
    val pairs = Multimodal.videoNearDup(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("vid_a"), r.getAs[Long]("vid_b")))
    assert(pairs.nonEmpty)
    val rows = Multimodal.videoDedupClusters(spark, sf0001).collect()
    val label = rows.map(r =>
      r.getAs[Long]("video") -> r.getAs[Long]("cluster_id")).toMap
    pairs.foreach { case (a, b) =>
      assert(label(a) == label(b), s"pair ($a,$b) split across clusters")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("cluster_id") <= r.getAs[Long]("video"))
      assert((r.getAs[Int]("is_kept") == 1) ==
        (r.getAs[Long]("video") == r.getAs[Long]("cluster_id")))
    }
    assert(rows.count(_.getAs[Int]("is_kept") == 1) ==
      label.values.toSet.size)
  }

  test("q205 scene cuts: within-shot transitions never cut (hamming <= 7 " +
      "by construction); shot boundaries dominate the cut set") {
    val rows = Multimodal.sceneCuts(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // transitions at f=3 and f=6 cross shot boundaries; the rest are
    // within-shot: same gradient group, row-7-only difference — the
    // hamming bound is structural, not statistical
    val (boundary, within) =
      rows.partition(r => Set(3L, 6L)(r.getAs[Long]("frame_no")))
    within.foreach { r =>
      assert(r.getAs[Long]("hamming") <= 7L,
        s"within-shot transition ${r} exceeded the row-7 bound")
      assert(r.getAs[Int]("is_cut") == 0)
    }
    // boundary ramps are unrelated — a handful may land under the
    // threshold by ramp coincidence, but the overwhelming majority cut
    val cutRate = boundary.count(_.getAs[Int]("is_cut") == 1).toDouble /
      boundary.length
    assert(cutRate >= 0.9, f"boundary cut rate $cutRate%.2f < 0.9")
  }

  test("q217 resize: every asset decodes to exactly 16 box-filtered " +
      "blocks whose means match the raster average") {
    val rows = graft.multimodal.Multimodal
      .resizeQuery(spark, sf0001).collect()
    val docs = graft.Tables.load(spark, sf0001, "documents").count()
    assert(rows.length == docs * 16, "16 output pixels per decoded asset")
    rows.foreach { r =>
      val lum = r.getAs[Long]("lum")
      assert(lum >= 0L && lum <= 255L, s"out-of-range luminance: $r")
    }
    // spot-check one block against the synthesis arithmetic: asset 0's
    // (0,0) block averages g(x,y) for x,y in {0,1} with shift(y,0)=0
    // (id DIV 4 = 0): pixels 0,73,0,73 -> 36
    val b00 = rows.find(r => r.getAs[Long]("asset_id") == 0L &&
      r.getAs[Long]("bx") == 0L && r.getAs[Long]("by") == 0L).get
    assert(b00.getAs[Long]("lum") == 36L, s"block (0,0) of asset 0: $b00")
  }

  test("q249 cross-modal takedown: every member of ANY modality cluster " +
      "holding a named doc is removed; a planted image-only partner of " +
      "a named doc is removed without being a text near-dup") {
    import org.apache.spark.sql.functions._
    val out = Multimodal.crossmodalTakedown(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
    val named = out.keySet.filter(_ % 29 == 11)
    assert(named.nonEmpty)
    named.foreach(id => assert(out(id)._1 == "removed_direct"))
    // independent per-modality cross-check: collect each modality's
    // clusters and recompute the closure in driver code
    val modClusters: Seq[(String, Map[Long, Long])] = Seq(
      "text" -> graft.operators.Dedup
        .dedupClustersOf(graft.Tables.load(spark, sf0001, "documents"))
        .select("doc_id", "cluster_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "image" -> Multimodal.imageDedupClusters(spark, sf0001)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "audio" -> graft.multimodal.Audio.dedupClustersQuery(spark, sf0001)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "video" -> Multimodal.videoDedupClusters(spark, sf0001)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val expected = out.keySet.map { id =>
      val flagged = modClusters.filter { case (_, cl) =>
        cl.get(id).exists(c =>
          cl.exists { case (d, cd) => cd == c && d % 29 == 11 })
      }.map(_._1)
      val verdict =
        if (id % 29 == 11) "removed_direct"
        else if (flagged.nonEmpty) "removed_duplicate"
        else "retained"
      id -> ((verdict, flagged.size.toLong))
    }.toMap
    assert(out == expected,
      s"closure mismatch: ${out.toSeq.diff(expected.toSeq).take(5)}")
    // planted property: the image fixture clusters ids by doc_id DIV 4
    // (shared gradient group), so a named doc's DIV-4 partners must be
    // removed even when text ties them to nothing
    val imgClusters = modClusters.toMap.apply("image")
    val partner = named.flatMap(id =>
      imgClusters.collect { case (d, c) if d != id &&
        c == imgClusters(id) && d % 29 != 11 => d }).headOption
    partner.foreach { p =>
      assert(out(p)._1 == "removed_duplicate",
        s"image partner $p of a named doc not removed: ${out(p)}")
    }
    assert(partner.nonEmpty, "fixture produced no image partner — " +
      "planted case vacuous")
  }
}
