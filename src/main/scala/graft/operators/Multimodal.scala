package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed output row of the (stub) decoder — the Dataset element type that
  * keeps decodeFeatures on the Dataset API (Tungsten encoders, no RDD
  * round-trip).
  */
case class MediaFeatures(
    id: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    features: Array[Float]
)

/** Multimodal column plumbing (builder-brief pillar): images/audio/video
  * ride through the engine as opaque `binary` columns plus typed metadata.
  * Two decoders share one injection point (`decodeFeaturesWith`): a REAL
  * pure-JVM `javax.imageio` image decoder (`imageDecode`, gated on
  * generated PNG/BMP fixtures) and a deterministic stub (`stubDecode`)
  * for the parquet testdata path, whose stand-in content bytes are not
  * images. The plumbing (schema, batch iteration shape, partitioning) is
  * identical either way.
  *
  * Scale design: decode/feature-extract runs inside mapPartitions so a
  * real codec would amortize per-partition setup (model load, codec init)
  * across the batch — the same shape a Pandas-UDF/mapInPandas pipeline
  * has in PySpark. No shuffle is introduced; partition counts carry over.
  */
object Multimodal {

  /** Output schema of the (stub) decoder (= the MediaFeatures encoder's). */
  val featureSchema: StructType =
    org.apache.spark.sql.Encoders.product[MediaFeatures].schema

  /** Attach an opaque binary content column (testdata has no true media
    * blobs; UTF-8 bytes of the text column stand in — the engine treats
    * them as opaque either way).
    */
  def withContent(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("content", encode(col(textCol), "UTF-8"))

  /** Column-level metadata extraction from the binary content: byte size
    * plus md5-derived pseudo-dimensions. Purely declarative (codegen'd,
    * oracle-reproducible) — the cheap pre-filter before any real decode.
    */
  def contentMeta(df: DataFrame, idCol: String): DataFrame = {
    val h = md5(col("content"))
    df.select(
      col(idCol),
      octet_length(col("content")).cast("long").as("n_bytes"),
      (conv(substring(h, 1, 4), 16, 10).cast("long") % 1024).as("width"),
      (conv(substring(h, 5, 4), 16, 10).cast("long") % 1024).as("height"),
      (conv(substring(h, 9, 2), 16, 10).cast("long") % 16 + 1).as("n_frames")
    )
  }

  /** STUB decoder: a real implementation would decode the media bytes and
    * run feature extraction here (per-partition batch, amortized setup).
    * This stand-in derives deterministic pseudo-features from the bytes so
    * the distributed plumbing is fully exercisable and testable.
    */
  private def stubDecode(id: Long, content: Array[Byte]): MediaFeatures = {
    // ??? <- real codec goes here; deterministic fake below
    val h = java.security.MessageDigest.getInstance("MD5").digest(content)
    def u(i: Int): Int = h(i) & 0xff
    val width = (u(0) << 8 | u(1)) % 1024
    val height = (u(2) << 8 | u(3)) % 1024
    val nFrames = u(4) % 16 + 1
    // 256 (power of two), not 255: u/256 is exactly representable in
    // float32, which makes the stub's output bit-reproducible from SQL
    // (the q76 DuckDB oracle recomputes it from md5 hex) — no float
    // double-rounding hazard
    val features = Array.tabulate(8)(i => u(i * 2) / 256.0f)
    MediaFeatures(id, width, height, nFrames, features)
  }

  /** Dataset.mapPartitions feature extraction over (id, content) — the
    * batch shape a production decode would use (per-partition setup
    * amortized; Tungsten encoders both directions, no RDD round-trip).
    * Output schema = `featureSchema`. Defaults to the deterministic stub;
    * pass a real codec via `decodeFeaturesWith` when one is available.
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String): DataFrame =
    decodeFeaturesWith(spark, df, idCol)(stubDecode)

  /** As `decodeFeatures` but with a caller-supplied decoder — the
    * extension point where a production image/audio codec plugs in
    * (initialize per-partition state by wrapping the iterator instead of
    * the element function if the codec has setup cost).
    */
  def decodeFeaturesWith(spark: SparkSession, df: DataFrame, idCol: String)(
      decoder: (Long, Array[Byte]) => MediaFeatures): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, content) => decoder(id, content) })
      .toDF()
  }

  /** REAL decoder through the same injection point: pure-JVM
    * `javax.imageio` decode (PNG/BMP/GIF/JPEG readers ship with the JDK —
    * no external codec needed). Emits the image's ACTUAL dimensions and
    * deterministic pixel statistics as the feature vector: per-channel
    * means and luma, computed with integer sums. For LOSSLESS formats
    * (PNG, BMP, GIF) the decoded pixels — and therefore the features —
    * are bit-reproducible across JVMs and partitionings (mean/256 with an
    * integer mean is exactly representable in float32). JPEG also decodes
    * through this path, but JPEG IDCT output is only required to be
    * approximately correct (JVM-vendor/version dependent), so treat JPEG
    * features as approximate, not gate-able. n_frames = 1 — still images;
    * a multi-frame reader (animated GIF, video container) plugs in
    * through `decodeFeaturesWith` the same way.
    *
    * The parquet testdata path keeps `stubDecode` (its text-bytes stand-in
    * content is not an image); this decoder is gated by MultimodalSpec on
    * generated PNG/BMP fixtures.
    */
  /** Pseudo perceptual hash for the STUB decode path: `hexChars * 4`
    * md5-derived bits of the opaque content. The testdata's stand-in
    * bytes are not images, so no locality is possible — this column
    * exists to drive the banding + exact-hamming-verify machinery
    * through the DuckDB oracle gate bit-for-bit (q164). The gate uses 24
    * bits: random 48-bit hashes sit >= hamming 9 apart at oracle scale
    * (an always-empty gate proves nothing), while 24 bits give a
    * deterministic non-empty near-collision set. The REAL perceptual
    * hash is the 64-bit `imageDHash` below — width is a banding
    * parameter, not a property of the operator.
    */
  def pseudoDHash(content: Column, hexChars: Int = 6): Column =
    conv(substring(md5(content), 1, hexChars), 16, 10).cast("long")

  /** Per-frame content fingerprints for VIDEO-level near-dup: the q103
    * frame grid (md5-meta frame count, evenly-spaced sample of up to
    * `maxFrames` frames) with each sampled frame fingerprinted by its
    * `windowBytes`-byte content window at offset frame_idx * windowBytes
    * (the deterministic stand-in for a per-frame perceptual hash — two
    * assets sharing raw frame bytes share the fingerprint, which is the
    * property frame-set matching needs). Empty windows (frames past the
    * content) drop; output is the DISTINCT (id, win) frame set.
    */
  def frameWindows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowBytes: Int = 48,
      maxFrames: Int = 4
  ): DataFrame = {
    val h = md5(col(textCol))
    docs
      .select(col(idCol), col(textCol).as("t"),
        (conv(substring(h, 9, 2), 16, 10).cast("long") % 16 + 1).as("n_frames"))
      .withColumn("step", expr(s"greatest((n_frames + ${maxFrames - 1}) div $maxFrames, 1)"))
      .select(col(idCol), col("t"),
        explode(sequence(lit(0L), col("n_frames") - 1, col("step"))).as("fi"))
      .select(col(idCol),
        expr(s"substring(t, cast(fi * $windowBytes + 1 as int), $windowBytes)").as("win"))
      .filter(col("win") =!= "")
      .distinct()
  }

  /** VIDEO near-dup by frame-set overlap: assets sharing >= `minShared`
    * frame fingerprints pair, scored by frame-set Jaccard — the standard
    * video dedup shape (per-frame perceptual hashes, set overlap), and
    * the third multimodal x dedup pairing after the image-level q164/q168
    * (those compare ONE hash per asset; this matches assets whose frame
    * SETS overlap even when no single whole-asset hash collides).
    *
    * Scale shape: an inverted index on the frame fingerprint — pairs are
    * generated per shared fingerprint, never all-pairs. The `dfCap`
    * filter drops degenerate fingerprints shared by more than `dfCap`
    * assets (blank frames, boilerplate intros — the video analogue of
    * q159's df stop cut), bounding every index bucket's pair fan-out at
    * dfCap^2 regardless of corpus size; set sizes are counted AFTER the
    * cap so the Jaccard denominator matches the indexed universe.
    */
  def frameSetNearDupPairs(
      frames: DataFrame,
      idCol: String,
      minShared: Int,
      dfCap: Int
  ): DataFrame = {
    require(minShared >= 1 && dfCap >= 1)
    val kept = frames
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("win")))
      .filter(col("df") <= dfCap)
      .drop("df")
      .localCheckpoint(false) // both sides of the index join + the size agg
    val sizes = kept.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    kept.select(col(idCol).as("id_a"), col("win"))
      .join(kept.select(col(idCol).as("id_b"), col("win")), Seq("win"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        (col("n_shared").cast("double") / (col("n_a") + col("n_b") - col("n_shared")))
          .as("jacc"))
  }

  /** REAL 64-bit difference hash (dHash) — the standard LAION-style
    * image near-dup signature: decode (pure-JVM javax.imageio), integer
    * luma (299r + 587g + 114b), average-pool onto a 9x8 grid, one bit
    * per horizontally-adjacent cell pair (set iff left cell is darker).
    * Integer sums + integer division make the hash bit-reproducible
    * across JVMs and partitionings for lossless formats. Invariant to
    * uniform brightness shift (comparisons unchanged short of clipping)
    * and to rescaling that preserves the pooled gradient structure;
    * MultimodalSpec gates both properties plus the banded near-dup
    * retrieval on generated PNG/BMP fixtures.
    */
  def imageDHash(content: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, "bytes are not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val gw = 9; val gh = 8
    require(w >= gw && h >= gh, s"image ${w}x$h smaller than the ${gw}x$gh dhash grid")
    val sums = new Array[Long](gh * gw)
    val cnts = new Array[Long](gh * gw)
    var y = 0
    while (y < h) {
      val cell0 = (y * gh / h) * gw
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val luma = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
        val i = cell0 + x * gw / w
        sums(i) += luma
        cnts(i) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var r = 0
    while (r < gh) {
      var c = 0
      while (c < gw - 1) {
        val left = sums(r * gw + c) / cnts(r * gw + c)
        val right = sums(r * gw + c + 1) / cnts(r * gw + c + 1)
        if (left < right) bits |= 1L << (r * (gw - 1) + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Distributed dHash extraction — same mapPartitions batch shape as
    * `decodeFeatures` (per-partition codec setup amortized, Tungsten
    * encoders, no shuffle). Output: (idCol, dhash: long).
    */
  def imageDHashes(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) => (id, imageDHash(c)) })
      .toDF(idCol, "dhash")
  }

  /** Adjacent-window energy CONTOUR bits — the audio analogue of the
    * image dHash: bit w is set iff window w+1's mean amplitude exceeds
    * window w's. The comparison is cross-multiplied integer sums
    * (sum(w+1)*cnt(w) > sum(w)*cnt(w+1)) — no division, so a SQL oracle
    * reproduces it bit-for-bit AND uniform gain (volume) scaling leaves
    * every comparison unchanged: the hash is volume-invariant by
    * construction (the spec pins this). Empty windows compare as 0.
    */
  private[graft] def contourBits(sums: Array[Long], cnts: Array[Long]): Long = {
    // 128-bit-safe cross-multiply: sums reach maxAmp*n and cnts reach n,
    // so the 64-bit product overflows around n ~ 5.5e8 16-bit samples
    // (< 2 h of 44.1 kHz stereo) — compare via multiplyHigh + unsigned
    // low halves instead of trusting the wrap
    def gt(a: Long, b: Long, c: Long, d: Long): Boolean = {
      val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
      val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
      hi1 > hi2 || (hi1 == hi2 && java.lang.Long.compareUnsigned(lo1, lo2) > 0)
    }
    var bits = 0L
    var w = 0
    while (w < sums.length - 1) {
      if (gt(sums(w + 1), cnts(w), sums(w), cnts(w + 1))) bits |= 1L << w
      w += 1
    }
    bits
  }

  private def windowed(n: Int, wins: Int)(amp: Int => Long): (Array[Long], Array[Long]) = {
    val sums = new Array[Long](wins)
    val cnts = new Array[Long](wins)
    var i = 0
    while (i < n) {
      val w = (i.toLong * wins / n).toInt
      sums(w) += amp(i)
      cnts(w) += 1
      i += 1
    }
    (sums, cnts)
  }

  /** AUDIO stand-in decoder for the parquet path (testdata content
    * bytes are not WAV containers): interpret the opaque bytes AS an
    * 8-bit unsigned PCM stream — a real windowed-DSP computation
    * (per-eighth integer mean amplitude), not an md5 fake — through the
    * same `decodeFeaturesWith` injection point the real `wavDecode`
    * uses. Integer means / 256 are exactly representable in float32, so
    * the DuckDB oracle (which reads the same bytes as ASCII codepoints
    * — the q115 convention; the testdata is ASCII) matches bit-for-bit.
    * width carries the stand-in sample rate, height the channel count,
    * n_frames the sample count.
    */
  def pcmDecode(id: Long, content: Array[Byte]): MediaFeatures = {
    val n = content.length
    val wins = 8
    val (sums, cnts) = windowed(n, wins)(i => (content(i) & 0xff).toLong)
    val features = Array.tabulate(wins) { w =>
      if (cnts(w) == 0) 0f else (sums(w) / cnts(w)) / 256.0f
    }
    MediaFeatures(id, 8000, 1, n, features)
  }

  /** Audio fingerprint for the parquet path: 32 contour bits over 33
    * windows of the 8-bit PCM interpretation. Drives the q47/q164
    * pigeonhole hamming machinery (q202). Empty content hashes to 0.
    */
  def pcmContourHash(content: Array[Byte], nBits: Int = 32): Long = {
    require(nBits >= 1 && nBits <= 63)
    if (content.isEmpty) return 0L
    val (sums, cnts) = windowed(content.length, nBits + 1)(i => (content(i) & 0xff).toLong)
    contourBits(sums, cnts)
  }

  /** Distributed audio-fingerprint extraction — the mapPartitions batch
    * shape of `decodeFeatures`, emitting (idCol, ahash).
    */
  def pcmContourHashes(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) => (id, pcmContourHash(c)) })
      .toDF(idCol, "ahash")
  }

  private def parseWav(id: Long, content: Array[Byte]): (Int, Int, Int, Int) = {
    require(content.length >= 44 &&
      content(0) == 'R' && content(1) == 'I' && content(2) == 'F' && content(3) == 'F' &&
      new String(content, 8, 4, "US-ASCII") == "WAVE",
      s"id=$id: bytes are not a RIFF/WAVE container")
    val bb = java.nio.ByteBuffer.wrap(content).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // pos walks as Long: a corrupt 2 GiB chunk size would overflow an
    // Int walk back to a negative offset and crash the string slice
    // instead of hitting the malformed-input rejection below
    var pos = 12L
    var sampleRate = 0
    var channels = 0
    var dataOff = -1
    var dataLen = 0
    while (pos + 8 <= content.length) {
      val p = pos.toInt
      val cid = new String(content, p, 4, "US-ASCII")
      val sz = bb.getInt(p + 4)
      // a corrupt negative chunk size would walk `pos` backwards (or
      // stall it), spinning an executor forever on one bad record —
      // malformed bytes are exactly what a decoder gets fed at scale
      require(sz >= 0, s"id=$id: corrupt chunk '$cid' with negative size $sz")
      if (cid == "fmt ") {
        // the fmt fields must belong to THIS chunk — a short fmt chunk
        // would otherwise silently decode the next chunk's header bytes
        // as channels/rate/bps
        require(sz >= 16, s"id=$id: fmt chunk too short ($sz bytes)")
        require(pos + 24 <= content.length, s"id=$id: truncated fmt chunk")
        val fmt = bb.getShort(p + 8) & 0xffff
        require(fmt == 1, s"id=$id: only PCM (format 1) supported, got $fmt")
        channels = bb.getShort(p + 10) & 0xffff
        sampleRate = bb.getInt(p + 12)
        val bps = bb.getShort(p + 22) & 0xffff
        require(bps == 16, s"id=$id: only 16-bit PCM supported, got $bps")
      } else if (cid == "data") {
        dataOff = p + 8
        dataLen = math.min(sz, content.length - dataOff)
      }
      pos += 8L + sz + (sz & 1)
    }
    require(sampleRate > 0 && channels > 0 && dataOff >= 0,
      s"id=$id: missing fmt /data chunk")
    (sampleRate, channels, dataOff, dataLen)
  }

  /** REAL audio decoder through the same injection point: pure-JVM
    * RIFF/WAVE parse (16-bit little-endian PCM — the uncompressed
    * interchange format; compressed codecs would plug in the same way).
    * Features: per-eighth integer mean |sample| / 32768 — exactly
    * representable in float32, bit-reproducible across JVMs and
    * partitionings. width = sample rate, height = channels, n_frames =
    * per-channel sample count. The parquet testdata path keeps
    * `pcmDecode` (its stand-in content bytes are not WAV); this decoder
    * is gated by AudioSpec on generated WAV fixtures.
    */
  def wavDecode(id: Long, content: Array[Byte]): MediaFeatures = {
    val (sampleRate, channels, dataOff, dataLen) = parseWav(id, content)
    val bb = java.nio.ByteBuffer.wrap(content).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nS = dataLen / 2
    val wins = 8
    val (sums, cnts) = windowed(nS, wins)(i => math.abs(bb.getShort(dataOff + 2 * i).toLong))
    val features = Array.tabulate(wins) { w =>
      if (cnts(w) == 0) 0f else (sums(w) / cnts(w)) / 32768.0f
    }
    MediaFeatures(id, sampleRate, channels, nS / channels, features)
  }

  /** REAL audio fingerprint: contour bits over the WAV stream's
    * windowed mean |sample| — volume-invariant by the cross-multiplied
    * integer comparison (see contourBits), so the same recording at a
    * different gain lands at hamming 0 and a banded screen (the q202
    * machinery) retrieves it.
    */
  def wavContourHash(content: Array[Byte], nBits: Int = 32): Long = {
    require(nBits >= 1 && nBits <= 63)
    val (_, _, dataOff, dataLen) = parseWav(-1L, content)
    val bb = java.nio.ByteBuffer.wrap(content).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nS = dataLen / 2
    if (nS == 0) return 0L
    val (sums, cnts) = windowed(nS, nBits + 1)(i => math.abs(bb.getShort(dataOff + 2 * i).toLong))
    contourBits(sums, cnts)
  }

  def imageDecode(id: Long, content: Array[Byte]): MediaFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, s"id=$id: bytes are not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    var r = 0L; var g = 0L; var b = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val features = Array(
      (r / n) / 256.0f, (g / n) / 256.0f, (b / n) / 256.0f,
      ((r + g + b) / (3 * n)) / 256.0f)
    MediaFeatures(id, w, h, 1, features)
  }
}
