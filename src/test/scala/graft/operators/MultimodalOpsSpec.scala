package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal surface's real-codec integration point: [[
  * MultimodalOps.resize]] with the JDK-native [[MultimodalOps
  * .imageIoResizer]] must run an ACTUAL image decode → scale →
  * re-encode through the same partition-batch plumbing the m3 gate
  * exercises, with the gate's integer-exact dimension contract intact
  * — the codec changes payload bytes, never the histogram. */
class MultimodalOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** A real `w`×`h` PNG of one solid RGB color. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(new java.awt.Color(rgb))
      g.fillRect(0, 0, w, h): Unit
    } finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos): Unit
    baos.toByteArray
  }

  // colors picked per id; sizes straddle the box (256) so some rows
  // resize (codec runs) and some pass through (codec must not)
  private def mediaRows = Seq(
    (1L, "image", 640, 480, 0xff0000), // lands at 256x192
    (2L, "image", 512, 512, 0x00ff00), // lands at 256x256
    (3L, "image", 100, 50, 0x0000ff),  // inside the box: passthrough
    (4L, "image", 300, 257, 0x123456)  // lands at 256x219 (floor math)
  )

  private def mediaDf = mediaRows
    .map { case (id, kind, w, h, c) => (id, kind, w, h, png(w, h, c)) }
    .toDF("media_id", "kind", "width", "height", "payload")

  test("imageIoResizer: a REAL decode/scale/re-encode lands the exact " +
      "integer dimensions the operator chose, preserving content") {
    val out = MultimodalOps.resize(mediaDf, box = 256,
      codec = MultimodalOps.imageIoResizer)
      .collect().map(r => r.getLong(0) ->
        (r.get(2), r.get(3), r.getAs[Array[Byte]]("payload"))).toMap
    // the operator's integer math: (w*box/max, h*box/max)
    val expectDims = Map(1L -> (256, 192), 2L -> (256, 256),
      3L -> (100, 50), 4L -> (256, 219))
    mediaRows.foreach { case (id, _, w, h, rgb) =>
      val (ow, oh, payload) = out(id)
      assert((ow, oh) == (expectDims(id)._1, expectDims(id)._2),
        s"media $id dims")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      assert(img != null, s"media $id output must be a decodable image")
      // the re-encoded PNG's pixel geometry equals the metadata
      assert(img.getWidth == expectDims(id)._1 &&
        img.getHeight == expectDims(id)._2, s"media $id pixel geometry")
      // area-averaged solid color stays that color (tolerate rounding)
      val px = new java.awt.Color(img.getRGB(img.getWidth / 2,
        img.getHeight / 2))
      val want = new java.awt.Color(rgb)
      assert(math.abs(px.getRed - want.getRed) <= 2 &&
        math.abs(px.getGreen - want.getGreen) <= 2 &&
        math.abs(px.getBlue - want.getBlue) <= 2,
        s"media $id color drifted: got $px want $want")
      // a within-box row passes its ORIGINAL bytes through untouched
      if (math.max(w, h) <= 256)
        assert(payload.sameElements(png(w, h, rgb)), s"media $id " +
          "must not re-encode when no resize happens")
    }
  }

  test("the real codec changes ONLY payload bytes: the m3 gate's " +
      "dimension histogram is bit-identical to the stub run") {
    def hist(codec: () => MultimodalOps.ImageResizer) =
      MultimodalOps.resize(mediaDf, box = 256, codec = codec)
        .groupBy(col("out_w"), col("out_h"))
        .agg(count(lit(1)).as("n"), min(col("media_id")).as("min_id"))
        .orderBy("out_w", "out_h")
        .collect().map(_.toSeq).toSeq
    assert(hist(MultimodalOps.imageIoResizer) ==
      hist(MultimodalOps.passthroughResizer))
  }

  test("imageIoFeaturizer: a REAL decode produces the descriptor the " +
      "pixels dictate; non-image kinds ride the stub path unchanged") {
    // left half red, right half blue — pins the half-luminance split
    val img = new java.awt.image.BufferedImage(100, 40,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.RED); g.fillRect(0, 0, 50, 40): Unit
      g.setColor(java.awt.Color.BLUE); g.fillRect(50, 0, 50, 40): Unit
    } finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos): Unit
    val audioBytes = Array[Byte](10, 20, 30)
    val media = Seq((1L, "image", baos.toByteArray),
      (2L, "audio", audioBytes))
      .toDF("media_id", "kind", "payload")
    val got = MultimodalOps.extractFeatures(media,
        featurize = MultimodalOps.imageIoFeaturizer)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](3).toArray).toMap
    val f = got(1L)
    // mean RGB: half red + half blue → r ≈ 0.5, g ≈ 0, b ≈ 0.5
    assert(math.abs(f(0) - 0.5f) < 0.01 && f(1) < 0.01 &&
      math.abs(f(2) - 0.5f) < 0.01, f.mkString(","))
    assert(f(3) == 0.1f && f(4) == 0.04f) // w/1000, h/1000
    // left-half luminance = red's (0.299), right = blue's (0.114)
    assert(math.abs(f(5) - 0.299f) < 0.01 && math.abs(f(6) - 0.114f) < 0.01,
      f.mkString(","))
    // the audio row took the stub bytes path
    val sf = got(2L)
    assert(sf.take(3).toSeq == Seq(10 / 255.0f, 20 / 255.0f, 30 / 255.0f))
    // and the m1 aggregation shape runs unchanged over the real path
    val stats = MultimodalOps.extractFeatures(media,
        featurize = MultimodalOps.imageIoFeaturizer)
      .groupBy(col("kind")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(stats == Map("image" -> 1L, "audio" -> 1L))
  }

  /** A real multi-frame animated GIF: one solid-color frame per entry
    * of `colors`, written through the JDK's GIF sequence writer. */
  private def animatedGif(w: Int, h: Int, colors: Seq[Int]): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try {
        g.setColor(new java.awt.Color(c))
        g.fillRect(0, 0, w, h): Unit
      } finally g.dispose()
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    baos.toByteArray
  }

  test("imageIoFrameSampler: a REAL multi-frame GIF decode serves each " +
      "sampled timestamp the frame the animation loop dictates, on the " +
      "same integer grid as the stub") {
    // GIF palettes are exact for solid primaries
    val colorsA = Seq(0xff0000, 0x00ff00, 0x0000ff)          // 3 frames
    val colorsB = Seq(0x000000, 0xffffff, 0xff0000, 0x00ff00,
      0x0000ff)                                              // 5 frames
    // durations chosen so sampling at 5000 ms wraps past the frame
    // count: A gets idx 0..4 over 3 frames, B gets idx 0..6 over 5
    val media = Seq(
      (1L, "video", 20000L, animatedGif(16, 8, colorsA)),
      (2L, "video", 30000L, animatedGif(16, 8, colorsB)))
      .toDF("media_id", "kind", "duration_ms", "payload")
    val got = MultimodalOps.sampleFrames(media, everyMs = 5000,
        sampler = MultimodalOps.imageIoFrameSampler)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getAs[Array[Byte]]("frame"))).toMap
    // the integer grid: floor(dur/every)+1 frames at every*i
    assert(got.keySet == (0 until 5).map(i => (1L, i.toLong)).toSet ++
      (0 until 7).map(i => (2L, i.toLong)))
    val expected = Map(1L -> colorsA, 2L -> colorsB)
    got.foreach { case ((id, idx), (ts, frame)) =>
      assert(ts == idx * 5000L, s"($id,$idx) ts")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(frame))
      assert(img != null && img.getWidth == 16 && img.getHeight == 8,
        s"($id,$idx) must decode as a 16x8 PNG frame")
      // timestamp past the clip wraps: frame idx mod numFrames
      val want = new java.awt.Color(
        expected(id)((idx % expected(id).size).toInt))
      val px = new java.awt.Color(img.getRGB(8, 4))
      assert(px == want, s"($id,$idx): got $px want $want")
    }
    // the gate's contract is codec-independent: the integer columns of
    // the real-codec run equal the stub run bit-for-bit
    def grid(sampler: () => MultimodalOps.FrameSampler) =
      MultimodalOps.sampleFrames(media, everyMs = 5000, sampler = sampler)
        .select(col("media_id"), col("frame_idx"), col("frame_ts_ms"))
        .orderBy("media_id", "frame_idx").collect().map(_.toSeq).toSeq
    assert(grid(MultimodalOps.imageIoFrameSampler) ==
      grid(MultimodalOps.stubFrameSampler))
  }

  test("a negative duration_ms fails loudly naming the media id — the " +
      "sequence() form this replaced errored on a decreasing sequence, " +
      "and corrupt metadata must not launder into a frame grid") {
    val bad = Seq((7L, "video", -1L, Array[Byte](0)))
      .toDF("media_id", "kind", "duration_ms", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.sampleFrames(bad, everyMs = 5000,
        sampler = MultimodalOps.stubFrameSampler).collect()
    }
    def names(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(m =>
        m.contains("negative duration_ms") && m.contains("media 7"))
        || names(t.getCause))
    assert(names(e), e.getMessage)
  }

  test("imageIoFrameSampler: a corrupt or frameless payload fails " +
      "loudly naming the defect") {
    val bad = Seq((9L, "video", 10000L, Array[Byte](1, 2, 3, 4)))
      .toDF("media_id", "kind", "duration_ms", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.sampleFrames(bad, everyMs = 5000,
        sampler = MultimodalOps.imageIoFrameSampler).collect()
    }
    def names(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("not a decodable animation"))
        || names(t.getCause))
    assert(names(e), e.getMessage)
  }

  test("an undecodable payload fails loudly, and null dimensions pass " +
      "through without touching the codec") {
    val bad = Seq((9L, "image", 640, 480,
      Array[Byte](1, 2, 3, 4))).toDF(
      "media_id", "kind", "width", "height", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.resize(bad, box = 256,
        codec = MultimodalOps.imageIoResizer).collect()
    }
    assert(e.getMessage.contains("not a decodable image") ||
      Option(e.getCause).exists(
        _.getMessage.contains("not a decodable image")), e.getMessage)
    // audio row: null dims — the codec must never see it
    val audio = Seq((10L, "audio", Option.empty[Int], Option.empty[Int],
      Array[Byte](1, 2, 3))).toDF(
      "media_id", "kind", "width", "height", "payload")
    val kept = MultimodalOps.resize(audio, box = 256,
      codec = MultimodalOps.imageIoResizer).collect().head
    assert(kept.isNullAt(2) && kept.isNullAt(3) &&
      kept.getAs[Array[Byte]]("payload").sameElements(Array[Byte](1, 2, 3)))
  }
}
