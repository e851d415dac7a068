package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Audio-modality column processing — the second opaque-binary medium
  * next to [[Multimodal]]'s images (reference §multimodal: decode /
  * feature-extract over binary columns). The codec is the JDK's REAL
  * WAVE parser (`javax.sound.sampled` — headless-safe for file IO), so
  * the decode path exercised here is the production contract a native
  * codec (ffmpeg bindings) would slot into: bytes in → typed per-asset
  * features out, batch-shaped, deterministic for fixed bytes.
  *
  * The q75 pattern makes it ORACLE-ABLE: [[syntheticWavAssets]] encodes
  * a square wave whose every decoded statistic is doc_id arithmetic —
  * sample count, peak, mean |amplitude|, zero crossings — so DuckDB
  * hash-compares a REAL RIFF/WAVE parse + PCM scan without decoding
  * anything. A decoder regression (byte order, header offset, channel
  * math, fallback taken) breaks the hash.
  *
  * Scale: encode+decode are map-only `mapPartitions` passes (the only
  * shape a JVM codec can take — same stance as the image path); no
  * shuffle until a consumer aggregates. */
object Audio {

  final case class AudioAsset(asset_id: Long, media: Array[Byte])
  final case class AudioFeatures(asset_id: Long, decoded: Boolean,
      sample_rate: Int, n_samples: Long, peak_abs: Long, mean_abs: Long,
      zero_crossings: Long)

  /** Real WAVE decode: header via AudioSystem, then a PCM scan for
    * integer signal stats (16-bit little-endian signed mono/stereo; the
    * first channel is scanned). Unreadable bytes → decoded=false row,
    * never an exception (corrupt assets must not kill a corpus job). */
  def decodeOne(a: AudioAsset): AudioFeatures = {
    try {
      val in = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(a.media))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
      val bytes = in.readAllBytes()
      val stride = 2 * fmt.getChannels
      val n = bytes.length / stride
      var peak = 0L; var sumAbs = 0L; var zc = 0L
      var prev = 0; var first = true; var i = 0
      while (i + 1 < bytes.length) {
        val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt
        val abs = math.abs(s.toLong)
        if (abs > peak) peak = abs
        sumAbs += abs
        if (!first && s.toLong * prev < 0) zc += 1
        prev = s; first = false
        i += stride
      }
      AudioFeatures(a.asset_id, decoded = true,
        fmt.getSampleRate.toInt, n, peak,
        if (n > 0) sumAbs / n else 0L, zc)
    } catch {
      case _: Exception =>
        AudioFeatures(a.asset_id, decoded = false, 0, 0L, 0L, 0L, 0L)
    }
  }

  def extractFeatures(assets: Dataset[AudioAsset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(decodeOne))
  }

  /** Deterministic WAVE corpus: per doc_id, a square wave of
    * `8 + doc_id % 32` samples at amplitude `(doc_id % 1000) * 16`
    * (alternating sign), 8 kHz 16-bit mono — encoded by the real
    * `AudioSystem.write` WAVE writer. */
  def syntheticWavAssets(spark: SparkSession, dir: String)
      : Dataset[AudioAsset] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = 8 + (id % 32).toInt
          val amp = ((id % 1000) * 16).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = if (i % 2 == 0) amp else -amp
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new AudioFormat(8000f, 16, 1, true, false)
          val ais = new AudioInputStream(
            new ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
          AudioAsset(id, bos.toByteArray)
        }
      }
  }

  /** q136: WAVE encode → real decode round trip, outputs pure doc_id
    * arithmetic (see object doc). */
  def roundtripQuery(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(syntheticWavAssets(spark, dir))
      .select(col("asset_id"), col("decoded"), col("sample_rate"),
        col("n_samples"), col("peak_abs"), col("mean_abs"),
        col("zero_crossings"))
      .orderBy("asset_id")

  final case class AudioTrim(asset_id: Long, decoded: Boolean,
      n_frames: Long, n_voiced: Long, first_voiced: Long,
      last_voiced: Long, trimmed_samples: Long)

  /** Energy-based voice-activity trim (the silence-strip every audio
    * ingestion pipeline runs before feature extraction): the decoded PCM
    * is scanned in fixed frames, a frame is voiced iff its mean |sample|
    * clears the threshold, and the keep-span is [first, last] voiced
    * frame. Integer frame energies — exact for the oracle. A trailing
    * partial frame (< frameLen samples) is dropped, matching the
    * fixed-frame contract of real VAD front ends. */
  def trimOne(a: AudioAsset, frameLen: Int = 16, threshold: Long = 256)
      : AudioTrim = {
    try {
      val in = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(a.media))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
      val bytes = in.readAllBytes()
      val stride = 2 * fmt.getChannels
      val n = bytes.length / stride
      val nFrames = n / frameLen
      var first = -1L; var last = -1L; var voiced = 0L
      var f = 0
      while (f < nFrames) {
        var sumAbs = 0L
        var i = 0
        while (i < frameLen) {
          val off = (f * frameLen + i) * stride
          val s = ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort.toInt
          sumAbs += math.abs(s.toLong)
          i += 1
        }
        if (sumAbs / frameLen >= threshold) {
          if (first < 0) first = f
          last = f; voiced += 1
        }
        f += 1
      }
      AudioTrim(a.asset_id, decoded = true, nFrames.toLong, voiced,
        first, last,
        if (first >= 0) (last - first + 1) * frameLen else 0L)
    } catch {
      case _: Exception =>
        AudioTrim(a.asset_id, decoded = false, 0L, 0L, -1L, -1L, 0L)
    }
  }

  /** Deterministic "speech-shaped" WAVE corpus: `id % 5` silent lead
    * frames (alternating ±4 — audible as noise floor, below threshold),
    * `2 + id % 4` voiced frames (square wave at 512 + (id % 100)·16),
    * `id % 3` silent tail frames; 16 samples per frame, 8 kHz mono. Every
    * trim output is doc_id arithmetic. */
  def syntheticSpeechWavAssets(spark: SparkSession, dir: String)
      : Dataset[AudioAsset] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val frameLen = 16
          val lead = (id % 5).toInt
          val voiced = 2 + (id % 4).toInt
          val tail = (id % 3).toInt
          val n = (lead + voiced + tail) * frameLen
          val loAmp = 4
          val hiAmp = (512 + (id % 100) * 16).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val f = i / frameLen
            val amp = if (f >= lead && f < lead + voiced) hiAmp else loAmp
            val v = if (i % 2 == 0) amp else -amp
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new AudioFormat(8000f, 16, 1, true, false)
          val ais = new AudioInputStream(
            new ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
          AudioAsset(id, bos.toByteArray)
        }
      }
  }

  /** q170: WAVE encode → real decode → frame-energy VAD trim,
    * hash-compared against the arithmetic oracle (the q136 pattern). */
  def trimQuery(spark: SparkSession, dir: String): DataFrame = {
    val ds = syntheticSpeechWavAssets(spark, dir)
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(trimOne(_))).toDF()
      .select(col("asset_id"), col("decoded"), col("n_frames"),
        col("n_voiced"), col("first_voiced"), col("last_voiced"),
        col("trimmed_samples"))
      .orderBy("asset_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q136_audio_roundtrip" -> (roundtripQuery _),
    "q170_audio_trim"      -> (trimQuery _))

  val oracles: Map[String, String] = Map(
    // every output is doc_id arithmetic: n samples, square-wave peak =
    // mean|x| = amplitude, n-1 sign alternations (0 when silent)
    "q136_audio_roundtrip" ->
      """SELECT doc_id AS asset_id, TRUE AS decoded,
         CAST(8000 AS INTEGER) AS sample_rate,
         CAST(8 + doc_id % 32 AS BIGINT) AS n_samples,
         CAST((doc_id % 1000) * 16 AS BIGINT) AS peak_abs,
         CAST((doc_id % 1000) * 16 AS BIGINT) AS mean_abs,
         CAST(CASE WHEN doc_id % 1000 = 0 THEN 0
              ELSE 8 + doc_id % 32 - 1 END AS BIGINT) AS zero_crossings
         FROM documents ORDER BY asset_id""",
    // q170: lead = id%5 silent frames, voiced = 2 + id%4, tail = id%3 —
    // the trim outputs are that arithmetic verbatim (silence mean |x| = 4
    // < 256 threshold, voiced mean = 512 + (id%100)*16 >= 512)
    "q170_audio_trim" ->
      """SELECT doc_id AS asset_id, TRUE AS decoded,
         CAST(doc_id % 5 + 2 + doc_id % 4 + doc_id % 3 AS BIGINT)
           AS n_frames,
         CAST(2 + doc_id % 4 AS BIGINT) AS n_voiced,
         CAST(doc_id % 5 AS BIGINT) AS first_voiced,
         CAST(doc_id % 5 + 2 + doc_id % 4 - 1 AS BIGINT) AS last_voiced,
         CAST((2 + doc_id % 4) * 16 AS BIGINT) AS trimmed_samples
         FROM documents ORDER BY asset_id""")
}
