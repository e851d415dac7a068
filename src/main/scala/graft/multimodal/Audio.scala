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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q136_audio_roundtrip" -> (roundtripQuery _))

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
         FROM documents ORDER BY asset_id""")
}
