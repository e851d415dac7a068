package graft

import graft.multimodal.Audio
import graft.multimodal.Audio.{AudioAsset, AudioFeatures}

/** The audio codec path on REAL bytes: WAVE round trips (mono + stereo,
  * silence, single-sample), and the corrupt-asset fallback contract. */
class AudioSpec extends SparkSuite {
  import spark.implicits._

  private def wav(samples: Seq[Int], channels: Int = 1,
      rate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt,
      samples.length.toLong / channels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decode: signal stats from real WAVE bytes") {
    val f = Audio.decodeOne(AudioAsset(1L, wav(Seq(100, -200, 300, 0, -50))))
    // crossings are strict sign flips: 100→-200 and -200→300; the zero
    // sample breaks the 300→-50 alternation (0 has no sign)
    assert(f == AudioFeatures(1L, decoded = true, 8000, 5,
      peak_abs = 300, mean_abs = (100 + 200 + 300 + 0 + 50) / 5,
      zero_crossings = 2))
  }

  test("decode: stereo strides the frame, silence has no crossings, corrupt bytes fall back") {
    // stereo: the scan reads channel 0 only (frames of 2 samples)
    val st = Audio.decodeOne(AudioAsset(2L,
      wav(Seq(10, 99, -10, 99, 10, 99), channels = 2)))
    assert(st.decoded && st.n_samples == 3 && st.peak_abs == 10 &&
      st.zero_crossings == 2, s"stereo decode diverged: $st")
    val silent = Audio.decodeOne(AudioAsset(3L, wav(Seq(0, 0, 0, 0))))
    assert(silent.decoded && silent.peak_abs == 0 &&
      silent.zero_crossings == 0)
    val corrupt = Audio.decodeOne(AudioAsset(4L,
      Array.tabulate[Byte](64)(i => (i * 7).toByte)))
    assert(!corrupt.decoded, "garbage must fall back, not throw")
    // and a truncated RIFF header (real-world partial upload)
    val trunc = Audio.decodeOne(AudioAsset(5L, wav(Seq(1, 2, 3)).take(10)))
    assert(!trunc.decoded)
  }

  test("trim: VAD frame scan — spans, edge cases, corrupt fallback") {
    import graft.multimodal.Audio.AudioAsset
    def frames(specs: Seq[Int]): Seq[Int] = // amp per 16-sample frame
      specs.flatMap(a => (0 until 16).map(i => if (i % 2 == 0) a else -a))
    // silence, voiced, voiced, silence → keep frames [1,2]
    val t = Audio.trimOne(AudioAsset(1L, wav(frames(Seq(4, 600, 600, 4)))))
    assert(t.decoded && t.n_frames == 4 && t.n_voiced == 2 &&
      t.first_voiced == 1 && t.last_voiced == 2 &&
      t.trimmed_samples == 32, s"trim span wrong: $t")
    // interior silence stays inside the keep-span (trim ≠ strike)
    val gap = Audio.trimOne(AudioAsset(2L, wav(frames(Seq(600, 4, 600)))))
    assert(gap.n_voiced == 2 && gap.first_voiced == 0 &&
      gap.last_voiced == 2 && gap.trimmed_samples == 48)
    // all-silent → empty span, zero samples kept
    val silent = Audio.trimOne(AudioAsset(3L, wav(frames(Seq(4, 4)))))
    assert(silent.n_voiced == 0 && silent.first_voiced == -1 &&
      silent.trimmed_samples == 0)
    // threshold boundary: mean |x| exactly 256 is voiced, 255 is not
    val lo = Audio.trimOne(AudioAsset(4L, wav(frames(Seq(255)))))
    val hi = Audio.trimOne(AudioAsset(5L, wav(frames(Seq(256)))))
    assert(lo.n_voiced == 0 && hi.n_voiced == 1)
    // trailing partial frame is dropped by the fixed-frame contract
    val part = Audio.trimOne(AudioAsset(6L,
      wav(frames(Seq(600)) ++ Seq(600, -600, 600))))
    assert(part.n_frames == 1 && part.n_voiced == 1)
    // corrupt bytes fall back flagged
    val bad = Audio.trimOne(AudioAsset(7L,
      Array.tabulate[Byte](48)(i => (i * 11).toByte)))
    assert(!bad.decoded && bad.trimmed_samples == 0)
  }

  test("q170: decoded trim equals doc_id arithmetic on the speech fixture") {
    val rows = Audio.trimQuery(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("decoded")))
    rows.take(64).foreach { r =>
      val id = r.getAs[Long]("asset_id")
      assert(r.getAs[Long]("n_frames") == id % 5 + 2 + id % 4 + id % 3)
      assert(r.getAs[Long]("first_voiced") == id % 5)
      assert(r.getAs[Long]("last_voiced") == id % 5 + 2 + id % 4 - 1)
      assert(r.getAs[Long]("trimmed_samples") == (2 + id % 4) * 16)
    }
  }

  test("q136 roundtrip: decoded stats equal doc_id arithmetic on the fixture") {
    val got = Audio.roundtripQuery(spark, sf0001)
    val rows = got.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("decoded")))
    rows.take(50).foreach { r =>
      val id = r.getAs[Long]("asset_id")
      assert(r.getAs[Long]("n_samples") == 8 + id % 32)
      assert(r.getAs[Long]("peak_abs") == (id % 1000) * 16)
      assert(r.getAs[Long]("mean_abs") == (id % 1000) * 16)
    }
  }

  test("fingerprint: energy-delta bits from real WAVE bytes; corrupt fallback") {
    def frames(amps: Seq[Int]): Seq[Int] =
      amps.flatMap(a => (0 until 16).map(i => if (i % 2 == 0) a else -a))
    // energies 100, 300, 200, 200, 500 → deltas (>): 1, 0, 0, 1
    val fp = Audio.fingerprintOne(
      AudioAsset(1L, wav(frames(Seq(100, 300, 200, 200, 500)))))
    assert(fp.decoded && fp.n_frames == 5 &&
      fp.sig == ((1L << 0) | (1L << 3)), s"fingerprint diverged: $fp")
    val corrupt = Audio.fingerprintOne(AudioAsset(2L,
      Array.tabulate[Byte](64)(i => (i * 3).toByte)))
    assert(!corrupt.decoded && corrupt.sig == 0L)
  }

  test("q198: clusters close the q195 pair graph; min id kept per cluster") {
    val pairs = Audio.nearDupQuery(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    val rows = Audio.dedupClustersQuery(spark, sf0001).collect()
    val label = rows.map(r =>
      r.getAs[Long]("asset_id") -> r.getAs[Long]("cluster_id")).toMap
    // every confirmed pair must land in one cluster
    pairs.foreach { case (a, b) =>
      assert(label(a) == label(b), s"pair ($a,$b) split across clusters")
    }
    // the representative is the component minimum, and is_kept marks
    // exactly one row per cluster
    rows.foreach { r =>
      assert(r.getAs[Long]("cluster_id") <= r.getAs[Long]("asset_id"))
      assert((r.getAs[Int]("is_kept") == 1) ==
        (r.getAs[Long]("asset_id") == r.getAs[Long]("cluster_id")))
    }
    assert(rows.count(_.getAs[Int]("is_kept") == 1) ==
      label.values.toSet.size)
  }

  test("q195: every intra-group pair surfaces with hamming <= 2; pairs are ordered and distinct") {
    val rows = Audio.nearDupQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"),
      r.getAs[Long]("hamming")))
    // planted structure: members of one group of four differ only in the
    // two member-perturbed frames → signature hamming <= 2, and the band
    // gate is complete at maxHamming 3, so ALL intra-group pairs of the
    // fixture's ids must be present
    val ids = Audio.syntheticNearDupWavAssets(spark, sf0001)
      .collect().map(_.asset_id).toSet
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    val intra = for {
      a <- ids.toSeq; b <- ids.toSeq
      if a < b && a / 4 == b / 4
    } yield (a, b)
    assert(intra.nonEmpty)
    intra.foreach { case (a, b) =>
      val h = byPair.get((a, b))
      assert(h.isDefined, s"missing planted pair ($a,$b)")
      assert(h.get <= 2, s"intra-group pair ($a,$b) hamming ${h.get} > 2")
    }
    // output contract: strictly ordered keys, no duplicate pairs
    assert(pairs.forall(p => p._1 < p._2))
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
  }
}
