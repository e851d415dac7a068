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
}
