package graft

import graft.operators.Multimodal

/** Gates for the REAL audio path (RIFF/WAVE 16-bit PCM decode + the
  * energy-contour fingerprint) on generated WAV fixtures — the audio
  * twin of MultimodalSpec's PNG/BMP image gates. The parquet-path
  * queries (q201/q202) ride the same injection point with the 8-bit PCM
  * stand-in and are gated by the DuckDB oracle.
  */
class AudioSpec extends SparkSpec {

  /** Minimal RIFF/WAVE writer: 16-bit little-endian PCM. */
  private def wav(samples: Array[Short], rate: Int = 8000, channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16.toShort) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s))
    bb.array()
  }

  /** Deterministic pseudo-noise with a rising loudness envelope. */
  private def risingSamples(n: Int): Array[Short] =
    Array.tabulate(n) { i =>
      val noise = ((i * 2654435761L) >>> 16 & 0xff).toInt - 128 // [-128, 127]
      val gain = 1 + (i * 60) / n // rising 1..60
      (noise * gain).toShort
    }

  test("wavDecode: header fields and per-window integer mean |amplitude| features") {
    val samples = Array.tabulate[Short](800)(i => if (i < 400) 1000 else -2000)
    val m = Multimodal.wavDecode(7L, wav(samples, rate = 44100))
    assert(m.id == 7L && m.width == 44100 && m.height == 1 && m.n_frames == 800)
    assert(m.features.length == 8)
    // windows 0..3 cover the |1000| half, 4..7 the |-2000| half exactly
    assert(m.features.take(4).forall(_ == 1000 / 32768.0f), m.features.toSeq)
    assert(m.features.drop(4).forall(_ == 2000 / 32768.0f), m.features.toSeq)
  }

  test("wavDecode rejects non-WAV bytes and non-PCM formats") {
    intercept[IllegalArgumentException] {
      Multimodal.wavDecode(1L, "definitely not a wav file at all........".getBytes)
    }
  }

  test("wavContourHash: volume-invariant (exact 2x gain), deterministic, envelope-sensitive") {
    val base = risingSamples(3300)
    val louder = base.map(s => (s * 2).toShort) // no clipping: |s| <= 2*128*60 < 32768/2
    val h1 = Multimodal.wavContourHash(wav(base))
    val h2 = Multimodal.wavContourHash(wav(louder))
    assert(h1 == h2, "uniform gain must not change any contour comparison")
    assert(h1 == Multimodal.wavContourHash(wav(base)), "hash must be deterministic")
    // a strictly rising envelope sets every comparison bit
    assert(h1 == (1L << 32) - 1, s"rising envelope should set all 32 bits, got $h1")
    // the reversed envelope clears them all
    val falling = Multimodal.wavContourHash(wav(base.reverse))
    assert(falling == 0L, s"falling envelope should clear all bits, got $falling")
  }

  test("wavDecode through the decodeFeaturesWith injection point (mapPartitions plumbing)") {
    import spark.implicits._
    val rows = (0L until 6L).map { i =>
      (i, wav(risingSamples(660 + i.toInt * 7), rate = 16000))
    }.toDF("doc_id", "content")
    val out = Multimodal.decodeFeaturesWith(spark, rows, "doc_id")(Multimodal.wavDecode)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.keySet == (0L until 6L).toSet)
    assert(out.values.forall(_ == 16000), "sample rate must survive the Dataset round-trip")
  }

  test("parseWav rejects corrupt negative chunk sizes instead of spinning forever") {
    val samples = risingSamples(100)
    val good = wav(samples)
    // corrupt the data chunk's size field (offset 40) to -8: an
    // unvalidated parser would advance pos by 0 and loop forever
    val bad = good.clone()
    val bb = java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, -8)
    val ex = intercept[IllegalArgumentException] { Multimodal.wavDecode(9L, bad) }
    assert(ex.getMessage.contains("negative size"))
  }

  test("parseWav rejects a 2 GiB chunk size via the Long walk, not an index crash") {
    // a leading junk chunk claiming Int.MaxValue bytes: an Int `pos`
    // walk (12 + 8 + MaxValue + pad) wraps NEGATIVE, keeps the loop
    // condition true, and crashes the chunk-id slice with
    // StringIndexOutOfBounds; the Long walk runs off the end and hits
    // the controlled missing-chunk rejection
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("junk".getBytes("US-ASCII")).putInt(Int.MaxValue)
    val ex = intercept[IllegalArgumentException] {
      Multimodal.wavDecode(9L, bb.array())
    }
    assert(ex.getMessage.contains("missing fmt /data"))
  }

  test("parseWav rejects a short fmt chunk instead of reading the next chunk's bytes") {
    val good = wav(risingSamples(100))
    // shrink the fmt chunk's own size to 0: the format fields would
    // otherwise be decoded from whatever bytes follow the fmt header
    val bad = good.clone()
    java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, 0)
    val ex = intercept[IllegalArgumentException] { Multimodal.wavDecode(9L, bad) }
    assert(ex.getMessage.contains("fmt chunk too short"))
  }

  test("contourBits comparison survives 64-bit product overflow (multiplyHigh path)") {
    // Window 1's mean (8/3) beats window 0's (1) -> bit 0 must be set,
    // but the cross-product 8e9 * 3e9 = 2.4e19 wraps to 5.55e18 while
    // 3e9 * 3e9 = 9e18 stays positive, so the NAIVE wrapped comparison
    // concludes 5.55e18 < 9e18 and clears the bit — this fixture fails
    // on any regression to unchecked 64-bit multiplication. Window 2's
    // mean (1/3) is lower -> bit 1 clear.
    val sums = Array(3000000000L, 8000000000L, 1000000000L)
    val cnts = Array(3000000000L, 3000000000L, 3000000000L)
    assert(Multimodal.contourBits(sums, cnts) == 1L,
      "overflowing cross-products must still compare exactly")
  }

  test("pcmDecode / pcmContourHash: 8-bit stand-in parity invariants") {
    // bytes 0..255 repeated: exact window means are computable by hand
    val content = Array.tabulate[Byte](256)(i => i.toByte)
    val m = Multimodal.pcmDecode(3L, content)
    assert(m.n_frames == 256 && m.height == 1)
    // window w covers bytes [32w, 32w+31]: integer mean = 32w + 15
    (0 until 8).foreach { w =>
      assert(m.features(w) == (32 * w + 15) / 256.0f, s"window $w: ${m.features(w)}")
    }
    // rising byte ramp -> all 32 contour bits set; empty content -> 0
    assert(Multimodal.pcmContourHash(content) == (1L << 32) - 1)
    assert(Multimodal.pcmContourHash(Array.emptyByteArray) == 0L)
  }
}
