package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/video
  * as opaque `binary` columns with typed metadata, processed by batched
  * per-partition extractors — the Scala equivalent of `mapInPandas` (same
  * batch shape: partition iterator → fixed-size batches → vectorized call).
  *
  * The image path is a REAL codec: `javax.imageio` (pure JVM, ships with
  * the JDK) decodes PNG/JPEG/GIF/BMP bytes to true dimensions and an
  * 8-bin luminance histogram. Bytes no installed reader understands (the
  * text-bytes fixture, audio/video payloads — no FFmpeg in this container)
  * take the deterministic byte-statistics fallback, flagged by
  * `decoded=false` so downstream filters can tell real metadata from
  * fallback metadata.
  */
object Multimodal {

  final case class MediaAsset(asset_id: Long, media: Array[Byte],
      media_type: String)
  final case class MediaFeatures(asset_id: Long, media_type: String,
      n_bytes: Long, decoded: Boolean, width: Int, height: Int,
      checksum: Long, features: Array[Float])
  final case class Frame(asset_id: Long, frame_no: Int, offset_bytes: Long)

  /** Image decoder over `javax.imageio`. One batch in, one batch out — the
    * production contract a vectorized codec (libjpeg-turbo, nvJPEG) slots
    * into; ImageIO itself decodes per asset inside the batch loop.
    * Everything emitted is deterministic for fixed input bytes. */
  object Decoder {
    def decodeBatch(batch: Seq[MediaAsset]): Seq[MediaFeatures] =
      batch.map(decodeOne)

    private def decodeOne(a: MediaAsset): MediaFeatures = {
      val n = a.media.length
      var sum = 0L
      var i = 0
      while (i < n) { sum = sum * 31 + (a.media(i) & 0xff); i += 1 }
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.media))
        catch { case _: Exception => null }
      if (img != null) {
        // real decode: true dimensions + 8-bin luminance histogram
        val w = img.getWidth; val h = img.getHeight
        val bins = new Array[Long](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            bins(lum >> 5) += 1
            x += 1
          }
          y += 1
        }
        val total = (w.toLong * h).max(1L)
        MediaFeatures(a.asset_id, a.media_type, n.toLong, decoded = true,
          width = w, height = h, checksum = sum,
          features = bins.map(b => b.toFloat / total))
      } else {
        // no installed reader for these bytes: deterministic byte-stat
        // fallback, dimensions zeroed so they can't be mistaken for real
        val feats = Array.tabulate(8) { j =>
          var acc = 0L
          var k = j
          while (k < n) { acc += (a.media(k) & 0xff); k += 8 }
          (acc % 1000).toFloat / 1000f
        }
        MediaFeatures(a.asset_id, a.media_type, n.toLong, decoded = false,
          width = 0, height = 0, checksum = sum, features = feats)
      }
    }
  }

  /** Batched per-partition feature extraction (the mapInPandas shape:
    * bounded batches keep peak memory flat regardless of partition size). */
  def extractFeatures(assets: Dataset[MediaAsset],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(Decoder.decodeBatch)
    }
  }

  /** Frame sampling stub for video-like assets: n evenly spaced offsets per
    * asset (generate + explode — stays distributed and codegen'd). */
  def sampleFrames(assets: DataFrame, nFrames: Int = 4): DataFrame =
    assets
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .withColumn("frame_no", explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("offset_bytes",
        ((col("frame_no").cast("long") * col("n_bytes")) / nFrames).cast("long"))
      .select("asset_id", "frame_no", "offset_bytes")

  /** Documents → pseudo media assets (text bytes as the opaque payload) —
    * the fixture path for exercising the plumbing without codecs. */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        col("text").cast("binary").as("media"),
        concat(lit("image/stub-"), col("source")).as("media_type"))
      .as[MediaAsset]
  }

  /** Feature-extraction query (rows-only check: mapPartitions closures are
    * outside DuckDB's vocabulary; determinism is covered by scalatest). */
  def featureQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(assetsFromDocuments(spark, dir))
      .withColumn("f0", round(element_at(col("features"), 1).cast("double"), 6))
      .drop("features")
      .orderBy("asset_id")
  }

  /** Frame-sampling metadata query — oracle-checkable (pure arithmetic). */
  def frameQuery(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(
      Tables.docAssets(spark, dir), nFrames = 4)
      .orderBy("asset_id", "frame_no")

  private object Tables {
    def docAssets(spark: SparkSession, dir: String): DataFrame =
      graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id").as("asset_id"),
          col("text").cast("binary").as("media"))
  }

  /** Deterministic synthetic PNGs: per document a (1 + id%7)×(1 + id%5)
    * uniform-gray image (gray = id%256) ENCODED through ImageIO — real PNG
    * bytes on the wire, not a fabricated header. */
  def syntheticPngAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 1 + (id % 7).toInt
          val h = 1 + (id % 5).toInt
          val g = (id % 256).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (g << 16) | (g << 8) | g
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaAsset(id, bos.toByteArray, "image/png")
        }
      }
  }

  /** The oracle-able slice of the image path (VERDICT r3 stretch): PNG
    * encode → REAL ImageIO decode round-trip, where every decoded output
    * is arithmetic of doc_id — width/height by construction, the luminance
    * histogram collapses to one full bin at gray>>5 (uniform image, and
    * gray (g,g,g) has luminance exactly g under the 299/587/114 weights) —
    * so DuckDB replicates the result without decoding anything. A decoder
    * regression (wrong dimensions, wrong luminance, fallback path taken)
    * breaks the hash compare. */
  def roundtripQuery(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(syntheticPngAssets(spark, dir))
      .withColumn("lum_bin",
        (array_position(col("features"), lit(1.0f)) - 1).cast("int"))
      .select(col("asset_id"), col("width"), col("height"), col("decoded"),
        col("lum_bin"))
      .orderBy("asset_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_multimodal_features"  -> (featureQuery _),
    "q43_multimodal_frames"    -> (frameQuery _),
    "q75_multimodal_roundtrip" -> (roundtripQuery _))

  val oracles: Map[String, String] = Map(
    // q42 is rows-only (JVM closure); q43 is pure arithmetic on byte lengths:
    "q43_multimodal_frames" ->
      """SELECT doc_id AS asset_id, frame_no,
         CAST(frame_no * octet_length(CAST(text AS BLOB)) // 4 AS BIGINT) AS offset_bytes
         FROM documents, (SELECT unnest([0,1,2,3]) AS frame_no)
         ORDER BY asset_id, frame_no""",
    // q75: the decode outputs are doc_id arithmetic by construction
    "q75_multimodal_roundtrip" ->
      """SELECT doc_id AS asset_id,
         CAST(1 + doc_id % 7 AS INTEGER) AS width,
         CAST(1 + doc_id % 5 AS INTEGER) AS height,
         TRUE AS decoded,
         CAST((doc_id % 256) // 32 AS INTEGER) AS lum_bin
         FROM documents ORDER BY asset_id""")
}
