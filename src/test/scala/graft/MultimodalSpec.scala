package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val bin = Seq(
    (1L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2, 3, 4, 5, 6)),
    (2L, "plain text bytes here".getBytes("UTF-8")),
    (3L, Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 9, 9))
  ).toDF("doc_id", "payload")

  test("withMeta sniffs magic bytes and records size + digest") {
    val m = Multimodal.withMeta(bin, $"payload")
      .select($"doc_id", $"meta.format", $"meta.n_bytes")
      .as[(Long, String, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m(1L) === (("jpeg", 10L)))
    assert(m(2L)._1 === "unknown")
    assert(m(3L) === (("png", 6L)))
  }

  test("frameSample yields k fixed-width evenly spaced slices") {
    val frames = bin.filter($"doc_id" === 1L)
      .select(Multimodal.frameSample($"payload", k = 3, frameBytes = 2).as("f"))
      .as[Seq[Array[Byte]]].head()
    assert(frames.length === 3)
    assert(frames.forall(_.length === 2))
    assert(frames.head.toSeq === Seq(0xFF.toByte, 0xD8.toByte)) // start
    assert(frames(2).toSeq === Seq(5.toByte, 6.toByte)) // end
  }

  test("decodeFeaturesStub: fixed dims, deterministic, normalized") {
    val f1 = Multimodal.decodeFeaturesStub(bin).orderBy("doc_id")
      .as[(Long, Seq[Float])].collect()
    val f2 = Multimodal.decodeFeaturesStub(bin.repartition(3)).orderBy("doc_id")
      .as[(Long, Seq[Float])].collect()
    assert(f1.toSeq === f2.toSeq) // partitioning-invariant
    assert(f1.forall(_._2.length === 16))
    assert(math.abs(f1.head._2.sum - 1.0f) < 1e-6) // histogram normalized
  }

  /** A real in-memory PNG: 4×4, left half black, right half white. */
  private def pngBytes: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("imageio codec: REAL decode behind the conf gate; stub stays the default") {
    val png = pngBytes
    val data = Seq((10L, png), (11L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    // default (no conf): decodeFeatures IS the stub path
    assert(Multimodal.decodeFeatures(data).orderBy("doc_id")
      .as[(Long, Seq[Float])].collect().toSeq ===
      Multimodal.decodeFeaturesStub(data).orderBy("doc_id")
        .as[(Long, Seq[Float])].collect().toSeq)
    spark.conf.set(Multimodal.CodecConfKey, "imageio")
    try {
      val real = Multimodal.decodeFeatures(data).orderBy("doc_id")
        .as[(Long, Seq[Float])].collect().toMap
      // 8 black pixels → luminance bin 0 at 0.5; 8 white → top bin at 0.5
      assert(real(10L).head === 0.5f)
      assert(real(10L).last === 0.5f)
      assert(math.abs(real(10L).sum - 1.0f) < 1e-6)
      // a payload ImageIO cannot decode quarantines as the zero vector
      assert(real(11L).forall(_ === 0f) && real(11L).length === 16)
      // PARITY on the metadata columns: metadata is payload-derived, so
      // it must be IDENTICAL whichever codec the session runs
      val metaReal = Multimodal.withMeta(data, $"payload")
        .select($"doc_id", $"meta.n_bytes", $"meta.digest", $"meta.format")
        .as[(Long, Long, String, String)].collect().toSet
      spark.conf.set(Multimodal.CodecConfKey, "stub")
      val metaStub = Multimodal.withMeta(data, $"payload")
        .select($"doc_id", $"meta.n_bytes", $"meta.digest", $"meta.format")
        .as[(Long, Long, String, String)].collect().toSet
      assert(metaReal === metaStub)
      assert(metaReal.find(_._1 == 10L).get._4 === "png") // real PNG sniffs as png
    } finally spark.conf.unset(Multimodal.CodecConfKey)
    // unknown codec name fails fast on the driver
    spark.conf.set(Multimodal.CodecConfKey, "ffmpeg")
    try intercept[IllegalArgumentException](Multimodal.decodeFeatures(data))
    finally spark.conf.unset(Multimodal.CodecConfKey)
  }

  test("resize: stub is deterministic fixed-shape; imageio REALLY rescales") {
    val png = pngBytes
    val data = Seq((10L, png), (11L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    // default (no conf) = stub: output is always w·h bytes, partitioning-invariant
    val s1 = Multimodal.resizePayloads(data, 4, 4).orderBy("doc_id")
      .as[(Long, Array[Byte])].collect()
    val s2 = Multimodal.resizePayloads(data.repartition(3), 4, 4).orderBy("doc_id")
      .as[(Long, Array[Byte])].collect()
    assert(s1.map(_._2.toSeq).toSeq === s2.map(_._2.toSeq).toSeq)
    assert(s1.forall(_._2.length === 16))
    // real path: 4×4 PNG → 2×2 PNG, decodable at the target size with the
    // halves' colors preserved (left black, right white)
    val real = Multimodal.resizeWith(data, "imageio", 2, 2, batchSize = 64)
      .as[(Long, Array[Byte])].collect().toMap
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(real(10L)))
    assert(out.getWidth === 2 && out.getHeight === 2)
    assert((out.getRGB(0, 0) & 0xFFFFFF) === 0x000000)
    assert((out.getRGB(1, 0) & 0xFFFFFF) === 0xFFFFFF)
    // undecodable payload quarantines as EMPTY bytes (never a valid PNG)
    assert(real(11L).isEmpty)
  }

  test("dHash: deterministic 16-hex fingerprint, invariant under a global brightness shift") {
    import org.apache.spark.sql.functions._
    val texts = Seq((1L, "the quick brown fox jumps over the lazy dog repeatedly and often"),
      (2L, "a completely different document about distributed query engines"))
    val base = texts.toDF("doc_id", "text")
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
    // +1 every byte (codes stay < 127): a global luminance shift — the
    // transform gradient signs are DEFINED to survive
    val shifted = texts.map { case (id, t) => (id + 100L, t.map(c => (c + 1).toChar)) }
      .toDF("doc_id", "text")
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
    val h = Multimodal.dHashesStub(base.unionByName(shifted))
      .as[(Long, String)].collect().toMap
    assert(h.values.forall(v => v.length === 16 && v.matches("[0-9a-f]{16}")))
    assert(h(1L) === h(101L)) // shift-invariant
    assert(h(2L) === h(102L))
    assert(h(1L) !== h(2L)) // distinct content separates
    // determinism across invocations
    assert(Multimodal.dHashesStub(base).as[(Long, String)].collect().toMap
      === h.view.filterKeys(_ < 100L).toMap)
    // bit layout: monotonically increasing bytes → every gradient 0 → all-zero hash
    val flat = Seq((9L, Array.tabulate(72)(_.toByte))).toDF("doc_id", "payload")
    assert(Multimodal.dHashesStub(flat).as[(Long, String)].head()._2 === "0000000000000000")
  }

  test("dHash imageio path: hashes decoded PIXELS — brightness-shifted re-encode collides, distinct image doesn't") {
    import org.apache.spark.sql.functions._
    // 18×16 source → 9×8 thumb is an exact 2× downsample, so a uniform
    // +40 brightness shift survives the bilinear average EXACTLY and
    // the gradient signs must be identical — but only because the hash
    // reads the DECODED luminance grid; hashing the re-encoded PNG
    // bytes would scatter the shift through the compressor
    def png(shift: Int, invert: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 18) {
        val base = if (invert) 200 - (x * 11) else x * 11 + (y % 3) * 7
        val v = math.min(215, math.max(0, base)) + shift
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    val df = Seq((1L, png(0, invert = false)), (2L, png(40, invert = false)),
      (3L, png(0, invert = true)), (4L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val prev = spark.conf.getOption(Multimodal.CodecConfKey)
    spark.conf.set(Multimodal.CodecConfKey, "imageio")
    try {
      val h = Multimodal.dHashes(df).as[(Long, String)].collect().toMap
      def dist(a: String, b: String): Int = java.lang.Long.bitCount(
        java.lang.Long.parseUnsignedLong(a, 16) ^ java.lang.Long.parseUnsignedLong(b, 16))
      assert(dist(h(1L), h(2L)) <= 1, s"brightness shift moved the hash: ${h(1L)} vs ${h(2L)}")
      assert(dist(h(1L), h(3L)) >= 10, s"distinct image too close: ${h(1L)} vs ${h(3L)}")
      assert(h(4L) === "0000000000000000") // undecodable → quarantine fingerprint
    } finally prev.fold(spark.conf.unset(Multimodal.CodecConfKey))(
      spark.conf.set(Multimodal.CodecConfKey, _))
  }

  test("audioStats: hand-computed RMS/peak/silence/clipping on crafted PCM") {
    import spark.implicits._
    // 4 samples centered at 128: amplitudes 0, +2, -100, +127
    val pcm = Array(128, 130, 28, 255).map(_.toByte)
    val silence = Array.fill(8)(129.toByte) // |a| = 1 throughout
    val stats = Multimodal.audioStats(
      Seq((1L, pcm), (2L, silence), (3L, Array.empty[Byte]))
        .toDF("doc_id", "payload"))
      .as[(Long, Long, Double, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n1, rms1, peak1, sil1, clip1) = stats(1L)
    assert(n1 === 4L)
    // sumSq = 0 + 4 + 10000 + 16129 = 26133; rms = sqrt(26133/4)
    assert(rms1 === BigDecimal(math.sqrt(26133.0 / 4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(peak1 === 127L)
    assert(sil1 === 0.5)  // amplitudes 0 and +2 are silent
    assert(clip1 === 0.25) // +127 clips
    assert(stats(2L) === ((2L, 8L, 1.0, 1L, 1.0, 0.0)))
    assert(stats(3L) === ((3L, 0L, 0.0, 0L, 0.0, 0.0))) // quarantine row
  }

  test("audioStats × frameSample: an empty-text doc keeps its full frame spine as quarantine rows") {
    import spark.implicits._
    // the q_audio_stats composition on a corpus the fixture never
    // produces (empty text): every (doc, frame) key must survive as the
    // all-zero row — the oracle's LEFT-joined frame spine mirrors this
    val frames = Seq((7L, ""), (8L, "x")).toDF("doc_id", "text")
      .select(col("doc_id"), posexplode(Multimodal.frameSample(
        encode(col("text"), "utf-8"), 4, 96)).as(Seq("frame", "fpay")))
      .select((col("doc_id") * 8 + col("frame")).as("doc_id"),
        col("fpay").as("payload"))
    val rows = Multimodal.audioStats(frames)
      .as[(Long, Long, Double, Long, Double, Double)].collect()
      .map(r => (r._1 / 8, r._1 % 8) -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(rows.keySet === (for (d <- Seq(7L, 8L); f <- 0L until 4L) yield (d, f)).toSet)
    for (f <- 0L until 4L)
      assert(rows((7L, f)) === ((0L, 0.0, 0L, 0.0, 0.0))) // empty payload → zero row
    // 'x' = 120: amp = -8, every frame sees the single sample
    for (f <- 0L until 4L)
      assert(rows((8L, f)) === ((1L, 8.0, 8L, 0.0, 0.0)))
  }
}
