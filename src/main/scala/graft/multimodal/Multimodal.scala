package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/video
  * as opaque `binary` columns with typed metadata, processed by batched
  * per-partition extractors — the Scala equivalent of `mapInPandas` (same
  * batch shape: partition iterator → fixed-size batches → vectorized call).
  *
  * The actual codec calls are STUBBED (no image/audio libraries in this
  * container): `DecoderStub` produces deterministic pseudo-metadata from
  * the bytes. Everything around it — schema, partitioning, batch size,
  * typed Dataset plumbing, frame-sampling explode — is real and tested,
  * so swapping in a real JNI/FFmpeg decoder changes one function.
  */
object Multimodal {

  final case class MediaAsset(asset_id: Long, media: Array[Byte],
      media_type: String)
  final case class MediaFeatures(asset_id: Long, media_type: String,
      n_bytes: Long, width: Int, height: Int, checksum: Long,
      features: Array[Float])
  final case class Frame(asset_id: Long, frame_no: Int, offset_bytes: Long)

  /** STUB decoder — stands in for e.g. libjpeg/FFmpeg. Deterministic fake:
    * dimensions and features derived from byte statistics. Replace the body
    * with a real codec call; the signature (one batch in, one batch out) is
    * the production contract. */
  object DecoderStub {
    def decodeBatch(batch: Seq[MediaAsset]): Seq[MediaFeatures] =
      batch.map { a =>
        val n = a.media.length
        var sum = 0L
        var i = 0
        while (i < n) { sum = sum * 31 + (a.media(i) & 0xff); i += 1 }
        val feats = Array.tabulate(8) { j =>
          var acc = 0L
          var k = j
          while (k < n) { acc += (a.media(k) & 0xff); k += 8 }
          (acc % 1000).toFloat / 1000f
        }
        MediaFeatures(a.asset_id, a.media_type, n.toLong,
          width = 64 + (math.abs(sum) % 512).toInt,
          height = 64 + (math.abs(sum / 7) % 512).toInt,
          checksum = sum, features = feats)
      }
  }

  /** Batched per-partition feature extraction (the mapInPandas shape:
    * bounded batches keep peak memory flat regardless of partition size). */
  def extractFeatures(assets: Dataset[MediaAsset],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(DecoderStub.decodeBatch)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_multimodal_features" -> (featureQuery _),
    "q43_multimodal_frames"   -> (frameQuery _))

  val oracles: Map[String, String] = Map(
    // q42 is rows-only (JVM closure); q43 is pure arithmetic on byte lengths:
    "q43_multimodal_frames" ->
      """SELECT doc_id AS asset_id, frame_no,
         CAST(frame_no * octet_length(CAST(text AS BLOB)) // 4 AS BIGINT) AS offset_bytes
         FROM documents, (SELECT unnest([0,1,2,3]) AS frame_no)
         ORDER BY asset_id, frame_no""")
}
