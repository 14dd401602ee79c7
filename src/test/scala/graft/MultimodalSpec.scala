package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary columns, declarative metadata, and the
  * mapPartitions (stub-)decode batch shape.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((0L, "hello world"), (1L, ""), (2L, "binary blob stand-in"))
    .toDF("doc_id", "text")

  test("withContent: binary column carries exact UTF-8 bytes") {
    val b = Multimodal.withContent(docs, "text")
      .filter(col("doc_id") === 0).select("content").head().getAs[Array[Byte]](0)
    assert(new String(b, "UTF-8") == "hello world")
  }

  test("contentMeta: sizes exact, pseudo-dims bounded and deterministic") {
    val m = Multimodal.contentMeta(Multimodal.withContent(docs, "text"), "doc_id")
      .orderBy("doc_id").collect()
    assert(m(0).getLong(1) == 11 && m(1).getLong(1) == 0)
    m.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) < 1024)
      assert(r.getLong(3) >= 0 && r.getLong(3) < 1024)
      assert(r.getLong(4) >= 1 && r.getLong(4) <= 16)
    }
    val again = Multimodal.contentMeta(Multimodal.withContent(docs, "text"), "doc_id")
      .orderBy("doc_id").collect()
    assert(m.toSeq == again.toSeq)
  }

  test("decodeFeatures: schema, row count, and per-partition batch shape survive repartitioning") {
    val src = Multimodal.withContent(docs, "text").repartition(3)
    val out = Multimodal.decodeFeatures(spark, src, "doc_id")
    assert(out.schema == Multimodal.featureSchema)
    val rows = out.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getSeq[Float](4).length == 8))
    // deterministic: same content -> same features regardless of partitioning
    val again = Multimodal.decodeFeatures(spark, Multimodal.withContent(docs, "text").repartition(1), "doc_id")
      .orderBy("id").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("decodeFeaturesWith: a custom decoder plugs into the same plumbing") {
    val src = Multimodal.withContent(docs, "text")
    val out = Multimodal.decodeFeaturesWith(spark, src, "doc_id") { (id, content) =>
      graft.operators.MediaFeatures(id, content.length, 0, 1, Array(content.length.toFloat))
    }
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(11, 0, 20)) // widths = byte lengths
  }

  /** Encode a solid-color image of the given size/format to bytes. */
  private def solidImage(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no JDK writer for $format")
    out.toByteArray
  }

  /** Horizontal gradient image: red channel = x * 255 / (w-1). */
  private def gradientImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 255 / (w - 1)) << 16); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no JDK writer for $format")
    out.toByteArray
  }

  test("imageDecode: REAL bytes (PNG and BMP) flow through the injection point") {
    // PNG and BMP are both lossless, so the decoded raster is exactly the
    // raster we wrote and every expected statistic is exact arithmetic
    val fixtures = Seq(
      (0L, solidImage(17, 9, 0xc86432, "png")),  // r=200 g=100 b=50
      (1L, solidImage(4, 4, 0x000000, "bmp")),   // black
      (2L, solidImage(300, 2, 0xffffff, "png")), // white
      (3L, gradientImage(33, 5, "png"))          // non-uniform raster
    )
    val src = fixtures.toDF("doc_id", "content")
    val rows = Multimodal.decodeFeaturesWith(spark, src, "doc_id")(Multimodal.imageDecode)
      .orderBy("id").collect()

    // dimensions are the REAL decoded ones
    assert(rows.map(r => (r.getInt(1), r.getInt(2))).toSeq ==
      Seq((17, 9), (4, 4), (300, 2), (33, 5)))

    def feats(i: Int): Seq[Float] = rows(i).getSeq[Float](4)
    assert(feats(0) == Seq(200 / 256.0f, 100 / 256.0f, 50 / 256.0f, (350 / 3) / 256.0f))
    assert(feats(1) == Seq(0f, 0f, 0f, 0f))
    assert(feats(2) == Seq(255 / 256.0f, 255 / 256.0f, 255 / 256.0f, 255 / 256.0f))
    // gradient: expected red mean from the same integer arithmetic
    val rSum = (0 until 33).map(x => x * 255 / 32).sum.toLong * 5
    val n = 33L * 5
    assert(feats(3) == Seq((rSum / n) / 256.0f, 0f, 0f, (rSum / (3 * n)) / 256.0f))

    // partitioning-independent: same bytes, different split, same rows
    val again = Multimodal.decodeFeaturesWith(
      spark, src.repartition(3), "doc_id")(Multimodal.imageDecode)
      .orderBy("id").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  /** Horizontal luma ramp with a base offset: red = base + x*200/(w-1)
    * (base <= 55 keeps the channel unclipped, so a brightness shift
    * changes every pixel but no left-vs-right comparison).
    */
  private def rampImage(w: Int, h: Int, base: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (base + x * 200 / (w - 1)) << 16); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  /** rampImage with one 10x10 block (exactly dhash cell r=3, c=4 on a
    * 90x80 canvas) blacked out — perturbs ONE pooled cell.
    */
  private def rampWithHole(w: Int, h: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rampImage(w, h, 0)))
    for (y <- 30 until 40; x <- 40 until 50) img.setRGB(x, y, 0)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  test("imageDHash: invariant to brightness shift and rescale; far from flat") {
    val base = Multimodal.imageDHash(rampImage(90, 80, 0))
    // uniform brightness shift: every pixel changes, no comparison does
    assert(Multimodal.imageDHash(rampImage(90, 80, 40)) == base)
    // rescale preserving the pooled gradient structure
    assert(Multimodal.imageDHash(rampImage(45, 16, 0)) == base)
    // a monotone ramp sets every left<right bit; a flat image sets none
    assert(java.lang.Long.bitCount(base) == 64)
    val flat = Multimodal.imageDHash(solidImage(90, 80, 0x808080, "png"))
    assert(java.lang.Long.bitCount(base ^ flat) == 64)
  }

  test("imageDHash: a single-cell perturbation flips at most its two comparisons") {
    val base = Multimodal.imageDHash(rampImage(90, 80, 0))
    val holed = Multimodal.imageDHash(rampWithHole(90, 80))
    val d = java.lang.Long.bitCount(base ^ holed)
    assert(d >= 1 && d <= 2, s"one perturbed cell should flip 1-2 bits, got $d")
  }

  test("imageDHash: banded near-dup retrieval finds real near-dup images only") {
    // the q164 machinery on REAL decoded images: 64-bit dHash through the
    // same pigeonhole banding + exact-hamming verify as the parquet gate
    val fixtures = Seq(
      (0L, rampImage(90, 80, 0)),    // base
      (1L, rampImage(90, 80, 40)),   // brightness-shifted near-dup (hamming 0)
      (2L, rampWithHole(90, 80)),    // locally-perturbed near-dup (hamming 1-2)
      (3L, solidImage(90, 80, 0x406080, "png")) // unrelated (hamming 64 from base)
    ).toDF("doc_id", "content")
    val hashed = Multimodal.imageDHashes(spark, fixtures, "doc_id")
    val pairs = graft.operators.Dedup
      .simhashCandidates(hashed, "doc_id", "dhash", bits = 64, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(p => (p._1, p._2))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L), (0L, 2L), (1L, 2L)),
      s"expected exactly the three near-dup pairs, got ${pairs.mkString(", ")}")
    assert(pairs.forall(_._3 <= 2), s"near-dup hammings should be tiny: ${pairs.mkString(", ")}")
  }

  test("frameSetNearDupPairs: shared frames pair, df cap drops boilerplate") {
    import spark.implicits._
    val frames = Seq(
      (0L, "w1"), (0L, "w2"), (0L, "w3"),
      (1L, "w2"), (1L, "w3"), (1L, "w4"),
      (2L, "w9")) ++ (10L until 30L).map(i => (i, "bp")) // 20 docs share 'bp'
    val out = Multimodal.frameSetNearDupPairs(
        frames.toDF("doc_id", "win"), "doc_id", minShared = 2, dfCap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // exactly one pair: docs 0 and 1 share {w2, w3}; jacc = 2 / (3+3-2)
    assert(out.toSeq == Seq((0L, 1L, 2L, 0.5)),
      s"expected only the (0,1) pair, got ${out.toSeq}")
    // boilerplate 'bp' (df 20 > cap 16) generated no pairs at all
    assert(!out.exists(p => p._1 >= 10L))
  }

  test("frameWindows: grid offsets, short-doc window, empty doc drops") {
    import spark.implicits._
    val long = ("x" * 300)
    val docs = Seq((0L, long), (1L, long), (2L, "short"), (3L, "")).toDF("doc_id", "text")
    val w = Multimodal.frameWindows(docs, "doc_id", "text", windowBytes = 48, maxFrames = 4)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // exact dups produce identical frame sets
    assert(w.filter(_._1 == 0L).map(_._2).toSet == w.filter(_._1 == 1L).map(_._2).toSet)
    // every window is a substring at a multiple-of-48 offset
    for ((id, win) <- w if id == 0L) assert(long.indexOf(win) % 48 == 0 && win.length <= 48)
    // short doc: single window = the whole text; empty doc: no rows
    assert(w.filter(_._1 == 2L).map(_._2).toSeq == Seq("short"))
    assert(!w.exists(_._1 == 3L))
  }

  test("imageDecode: undecodable bytes fail loudly, not silently") {
    val bad = Seq((7L, Array[Byte](1, 2, 3))).toDF("doc_id", "content")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeaturesWith(spark, bad, "doc_id")(Multimodal.imageDecode).collect()
    }
    assert(e.getMessage.contains("decodable") ||
      Option(e.getCause).exists(_.getMessage.contains("decodable")))
  }
}
