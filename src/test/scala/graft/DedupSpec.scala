package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup operator semantics: exact groups, LSH candidate generation
  * guarantees, near-dup verification, simhash properties.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog again and AGAIN"), // near dup of 0
    (3L, "completely different content about spark query engines here"),
    (4L, "xy") // shorter than the shingle width
  ).toDF("doc_id", "text")

  test("exactGroups: identical texts share a hash group; keep-one is min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    val dup = g.find(_.getLong(1) == 2).get
    assert(dup.getLong(2) == 0L) // keep_id = min(0, 1)
    assert(g.count(_.getLong(1) == 1) == 3) // docs 2, 3, 4 unique
  }

  test("nearDuplicates: exact and near duplicates found, unrelated pairs absent") {
    val nd = Dedup.nearDuplicates(docs, "doc_id", "text",
      shingleN = 4, numHashes = 8, rowsPerBand = 4, threshold = 0.4)
    val pairs = nd.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // exact dup always survives (jaccard 1.0)
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup (one word case-flipped)
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L }) // unrelated doc never pairs
  }

  test("nearDupPairsOnBands: band-table self-join equals nearDuplicates") {
    val direct = Dedup.nearDuplicates(docs, "doc_id", "text",
        shingleN = 4, numHashes = 8, rowsPerBand = 4, threshold = 0.4)
      .orderBy("id_a", "id_b").collect().toSeq
    val viaBands = Dedup.nearDupPairsOnBands(
        Dedup.signatureBands(docs, "doc_id", "text",
          shingleN = 4, numHashes = 8, rowsPerBand = 4),
        "doc_id", threshold = 0.4)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(direct.nonEmpty)
    assert(viaBands == direct)
  }

  test("nearDuplicates: exact dup pair has jaccard exactly 1.0") {
    val nd = Dedup.nearDuplicates(docs, "doc_id", "text")
    val j = nd.filter(col("id_a") === 0 && col("id_b") === 1).select("jacc").head().getDouble(0)
    assert(j == 1.0)
  }

  test("nearDuplicates: too-short docs drop out (null signature semantics)") {
    val nd = Dedup.nearDuplicates(docs, "doc_id", "text")
    assert(nd.filter(col("id_a") === 4 || col("id_b") === 4).count() == 0)
  }

  test("incrementalNearDupFilter: dup counts match the symmetric join restricted to cross-side pairs") {
    val incoming = docs.filter(col("doc_id").isin(1L, 2L, 4L))
    val corpus = docs.filter(col("doc_id").isin(0L, 3L))
    val inc = Dedup.incrementalNearDupFilter(incoming, corpus, "doc_id", "text",
      shingleN = 4, numHashes = 8, rowsPerBand = 4, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList.sortBy(_._1)
    // every incoming doc reports exactly once, including the too-short one
    assert(inc.map(_._1) == List(1L, 2L, 4L))
    // cross-side ground truth from the symmetric operator over all docs
    val all = Dedup.nearDuplicates(docs, "doc_id", "text",
        shingleN = 4, numHashes = 8, rowsPerBand = 4, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val corpusIds = Set(0L, 3L)
    for ((id, nDups, kept) <- inc) {
      val expected = corpusIds.count(c => all.contains((math.min(id, c), math.max(id, c))))
      assert(nDups == expected, s"doc $id: n_dups $nDups != symmetric-join $expected")
      assert(kept == (if (nDups == 0) 1L else 0L))
    }
    // doc 4 is too short for a signature: never a candidate, always kept
    assert(inc.find(_._1 == 4L).get._3 == 1L)
  }

  test("nearDuplicatesWithEstimate: same pairs/jacc as nearDuplicates; exact dup estimates 1.0") {
    val plain = Dedup.nearDuplicates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val est = Dedup.nearDuplicatesWithEstimate(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(est.map(t => (t._1, t._2, t._4)).toSet == plain)
    assert(est.forall(t => t._3 >= 0.0 && t._3 <= 1.0))
    // identical docs agree in every signature slot
    assert(est.find(t => t._1 == 0L && t._2 == 1L).get._3 == 1.0)
  }

  test("lshCandidates: band collision requires identical minhash band") {
    val withSh = docs.select(col("doc_id"), Dedup.shingleSet(col("text"), 4).as("sh"))
    val cands = Dedup.lshCandidates(withSh, "doc_id", "sh", 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L))) // identical docs collide in every band
    assert(cands.forall { case (a, b) => a < b }) // canonical pair order
  }

  test("simhash: identical texts get identical hashes; value fits the bit width") {
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text"), 16).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0L) == h(1L))
    assert(h.values.forall(v => v >= 0 && v < (1 << 16)))
  }

  test("simhash: near-identical texts are close in hamming distance") {
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text"), 16).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(0L), h(2L)) <= hamming(h(0L), h(3L)))
  }

  test("ngramJaccardPairs: identical pair scores 1.0, threshold filters") {
    val pairs = Dedup.ngramJaccardPairs(docs.filter(col("doc_id") < 4), "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0))
    assert(!pairs.exists(p => p._2 == 3L))
  }

  test("ngramJaccardPairs: prefix-filtered result == brute-force all-pairs result") {
    import spark.implicits._
    // deterministic pseudo-random corpus with overlapping vocabulary so
    // thresholds land both sides of 0.4
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val corpus = (0 until 40).map { i =>
      val txt = (0 until 6).map(j => words((i * 7 + j * 3) % words.length)).mkString(" ")
      (i.toLong, txt)
    }.toDF("doc_id", "text")
    val fast = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force over the same shingle sets
    val withSh = corpus.select(col("doc_id"), Dedup.shingleSet(col("text"), 3).as("sh"))
    val brute = withSh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(withSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
      .where(col("id_a") < col("id_b"))
      .withColumn("jacc", graft.functions.TextFunctions.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jacc") >= 0.4)
      .select("id_a", "id_b", "jacc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty, "fixture should produce at least one qualifying pair")
    assert(fast == brute)
  }

  test("containmentPairs: excerpt is found in the direction Jaccard misses") {
    import spark.implicits._
    val big = (0 until 30).map(i => s"tok$i").mkString(" ")
    val excerpt = (5 until 12).map(i => s"tok$i").mkString(" ")
    val other = "completely unrelated words here nothing shared"
    val corpus = Seq((0L, big), (1L, excerpt), (2L, other)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(corpus, "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // excerpt -> big clears 0.9 (every excerpt shingle lives in big)
    assert(cont.exists(p => p._1 == 1L && p._2 == 0L && p._3 == 1.0))
    // big -> excerpt does NOT (most of big's shingles are absent)
    assert(!cont.exists(p => p._1 == 0L && p._2 == 1L))
    assert(!cont.exists(p => p._1 == 2L || p._2 == 2L))
    // and Jaccard at the same bar misses the pair entirely
    val jacc = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.9).collect()
    assert(!jacc.exists(r => Set(r.getLong(0), r.getLong(1)) == Set(0L, 1L)))
  }

  test("containmentPairs: prefix-filtered result == brute-force all-pairs result") {
    import spark.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val corpus = (0 until 40).map { i =>
      val n = 4 + (i % 5) // varied lengths so the asymmetric size filter matters
      val txt = (0 until n).map(j => words((i * 7 + j * 3) % words.length)).mkString(" ")
      (i.toLong, txt)
    }.toDF("doc_id", "text")
    val fast = Dedup.containmentPairs(corpus, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val withSh = corpus.select(col("doc_id"), Dedup.shingleSet(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val brute = withSh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(withSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
      .where(col("id_a") =!= col("id_b"))
      .withColumn("containment",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") / size(col("sh_a")))
      .filter(col("containment") >= 0.5)
      .select("id_a", "id_b", "containment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty, "fixture should produce at least one qualifying pair")
    // directed: at least one pair must qualify in exactly one direction
    assert(brute.exists(p => !brute.exists(q => q._1 == p._2 && q._2 == p._1)),
      "fixture should exercise the asymmetric case")
    assert(fast == brute)
  }

  test("containmentScreenAudit: k >= |A| degenerates to exact containment >= screenFrac") {
    import spark.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val corpus = (0 until 30).map { i =>
      val n = 4 + (i % 5)
      (i.toLong, (0 until n).map(j => words((i * 7 + j * 3) % words.length)).mkString(" "))
    }.toDF("doc_id", "text")
    // k = 1000 >= every doc's shingle count → the sample IS the full set,
    // so candidates = pairs with exact containment >= 0.5, and at
    // threshold 0.5 = screenFrac the audit must report recall 1.0 AND
    // precision 1.0 (candidates == truth, both from the same sets)
    val audit = Dedup.containmentScreenAudit(
        corpus, "doc_id", "text", shingleN = 3, threshold = 0.5,
        ks = Seq(4, 1000), screenFrac = 0.5, sampleTarget = 1000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toMap
    val (nTruth, nCand, nHit, recall, precision) = audit(1000L)
    assert(nTruth > 0, "fixture generated no containment pairs")
    assert(nCand == nTruth && nHit == nTruth, s"k>=|A| not exact: $audit")
    assert(recall == 1.0 && precision == 1.0)
    // the small-k row stays internally coherent (hits bounded by both
    // sides; the ratios are exactly the integer ratios)
    val (nT4, nCand4, nHit4, rec4, prec4) = audit(4L)
    assert(nT4 == nTruth && nHit4 <= math.min(nCand4, nTruth))
    assert(rec4 == nHit4.toDouble / nTruth && prec4 == nHit4.toDouble / nCand4)
  }

  test("containmentScreenAudit: 1-in-m sample bound == audit of the pre-filtered corpus") {
    import spark.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val corpus = (0 until 30).map { i =>
      val n = 4 + (i % 5)
      (i.toLong, (0 until n).map(j => words((i * 7 + j * 3) % words.length)).mkString(" "))
    }.toDF("doc_id", "text")
    // 30 docs / target 10 -> m = 3: the audit must equal the unsampled
    // audit of exactly the doc_id % 3 == 0 subset (the convention's
    // whole point: sketch AND exact truth both see only the sample)
    val sampled = Dedup.containmentScreenAudit(
        corpus, "doc_id", "text", shingleN = 3, threshold = 0.5,
        ks = Seq(4, 1000), screenFrac = 0.5, sampleTarget = 10L)
      .collect().map(_.toSeq).toSet
    val manual = Dedup.containmentScreenAudit(
        corpus.filter(col("doc_id") % 3 === 0), "doc_id", "text",
        shingleN = 3, threshold = 0.5,
        ks = Seq(4, 1000), screenFrac = 0.5, sampleTarget = Long.MaxValue)
      .collect().map(_.toSeq).toSet
    assert(sampled == manual)
  }

  test("containmentScreenAudit: a k whose screen passes nothing still reports a zeroed row") {
    import spark.implicits._
    // pairwise-disjoint character alphabets (shingles are CHAR n-grams)
    // -> empty truth AND an empty screen
    val corpus = (0 until 6).map { i =>
      (i.toLong, ('a' + i).toChar.toString * 8)
    }.toDF("doc_id", "text")
    val rows = Dedup.containmentScreenAudit(
        corpus, "doc_id", "text", shingleN = 3, threshold = 0.5,
        ks = Seq(2, 8), screenFrac = 0.5, sampleTarget = Long.MaxValue)
      .orderBy("k").collect()
    assert(rows.length == 2, "every swept k must emit a row")
    rows.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
      assert(r.isNullAt(4) && r.isNullAt(5),
        "recall/precision must be NULL (0/0), not a crash or a vanished row")
    }
  }

  test("incrementalContainmentScreen: prefix-filtered screen == brute-force incoming x corpus") {
    import spark.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val corpus = (0 until 25).map { i =>
      (i.toLong, (0 until 8).map(j => words((i * 5 + j * 3) % words.length)).mkString(" "))
    }.toDF("doc_id", "text")
    // incoming: an excerpt of corpus doc 0, a fresh doc, and a too-short doc
    val c0 = (0 until 8).map(j => words((j * 3) % words.length)).mkString(" ")
    val incoming = Seq(
      (100L, c0.split(" ").slice(2, 6).mkString(" ")),
      (101L, "votre nouveau document sans aucun recouvrement"),
      (102L, "ab")).toDF("doc_id", "text")
    val fast = Dedup.incrementalContainmentScreen(incoming, corpus, "doc_id", "text", 3, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val shI = incoming.select(col("doc_id"), Dedup.shingleSet(col("text"), 3).as("sh"))
    val shC = corpus.select(col("doc_id").as("c_id"), Dedup.shingleSet(col("text"), 3).as("c_sh"))
      .filter(size(col("c_sh")) > 0)
    val brute = shI.crossJoin(shC)
      .withColumn("cont",
        when(size(col("sh")) === 0, lit(0.0))
          .otherwise(size(array_intersect(col("sh"), col("c_sh"))).cast("double") / size(col("sh"))))
      .groupBy("doc_id")
      .agg(sum(when(col("cont") >= 0.6, 1L).otherwise(0L)).as("n_containers"))
      .select(col("doc_id"), col("n_containers"),
        (col("n_containers") === 0).as("kept"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(brute.exists(p => p._1 == 100L && p._2 >= 1L), "excerpt must find a container")
    assert(brute.exists(p => p._1 == 101L && p._3), "fresh doc must be kept")
    assert(fast == brute)
    // the shingle-less doc is kept, not dropped from the output spine
    assert(fast.exists(p => p._1 == 102L && p._2 == 0L && p._3))
  }

  test("bottomKContainmentScreen: k/cap unbounded degenerates to exact containment >= screenFrac") {
    import spark.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val corpus = (0 until 25).map { i =>
      (i.toLong, (0 until 8).map(j => words((i * 5 + j * 3) % words.length)).mkString(" "))
    }.toDF("doc_id", "text")
    val c0 = (0 until 8).map(j => words((j * 3) % words.length)).mkString(" ")
    val incoming = Seq(
      (100L, c0.split(" ").slice(2, 6).mkString(" ")),
      (101L, "votre nouveau document sans aucun recouvrement"),
      (102L, "ab")).toDF("doc_id", "text")
    // k >= every |A| and dfCap >= corpus size → the sample IS the full
    // set and nothing is capped: the screen must equal brute-force
    // "exact containment >= screenFrac"
    val fast = Dedup.bottomKContainmentScreen(incoming, corpus, "doc_id", "text",
        shingleN = 3, k = 1000, screenFrac = 0.6, dfCap = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val sh = (t: org.apache.spark.sql.Column) =>
      array_distinct(graft.operators.Dedup.shingleSet(t, 3))
    val brute = incoming.select(col("doc_id"), sh(col("text")).as("sa"))
      .filter(size(col("sa")) > 0)
      .crossJoin(corpus.select(col("doc_id").as("c_id"), sh(col("text")).as("sb")))
      .withColumn("cont",
        size(array_intersect(col("sa"), col("sb"))).cast("double") / size(col("sa")))
      .groupBy("doc_id")
      .agg(sum(when(col("cont") >= 0.6, 1L).otherwise(0L)).as("n_containers"))
      .union(incoming.select(col("doc_id"), sh(col("text")).as("sa"))
        .filter(size(col("sa")) === 0).select(col("doc_id"), lit(0L)))
      .select(col("doc_id"), col("n_containers"),
        (col("n_containers") === 0).as("kept"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(brute.exists(p => p._1 == 100L && p._2 >= 1L), "excerpt must find a container")
    assert(fast == brute)
  }

  test("bottomKContainmentScreen: stop-only sharing creates no candidates") {
    import spark.implicits._
    // every corpus doc carries the SAME boilerplate phrase (all of its
    // shingles exceed any small df cap) plus unique content; the
    // incoming doc is boilerplate-only — it shares ONLY stop shingles,
    // which must not create a candidate, so it is kept
    val boiler = "lorem ipsum dolor sit amet"
    val corpus = (0 until 20).map(i => (i.toLong, s"$boiler unique${i}a unique${i}b"))
      .toDF("doc_id", "text")
    val incoming = Seq((100L, boiler)).toDF("doc_id", "text")
    val out = Dedup.bottomKContainmentScreen(incoming, corpus, "doc_id", "text",
        shingleN = 3, k = 32, screenFrac = 0.5, dfCap = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((100L, 0L, true)),
      s"boilerplate-only doc must be kept: ${out.toSeq}")
    // sanity: with the cap lifted the same doc IS screened out (every
    // corpus doc contains it) — the cap is what made the difference
    val uncapped = Dedup.bottomKContainmentScreen(incoming, corpus, "doc_id", "text",
        shingleN = 3, k = 32, screenFrac = 0.5, dfCap = 100000L)
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(uncapped.toSeq == Seq((100L, false)))
  }

  test("bottomKContainmentScreenOnPostings: pre-built term index == text path") {
    import spark.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val corpus = (0 until 25).map { i =>
      (i.toLong, (0 until 8).map(j => words((i * 5 + j * 3) % words.length)).mkString(" "))
    }.toDF("doc_id", "text")
    val incoming = Seq(
      (100L, (0 until 8).map(j => words((j * 3) % words.length)).mkString(" ")
        .split(" ").slice(2, 6).mkString(" ")),
      (101L, "votre nouveau document sans aucun recouvrement"),
      (102L, "ab")).toDF("doc_id", "text")
    // the streaming shape: index built once, screened against — answers
    // must be identical to the single-call text path at every config
    for ((k, cap) <- Seq((8, 5L), (1000, 100000L))) {
      val post = Dedup.containmentPostings(corpus, "doc_id", "text", shingleN = 3)
        .localCheckpoint(false)
      val onIdx = Dedup.bottomKContainmentScreenOnPostings(incoming, post,
          Dedup.postingDf(post), "doc_id", "text", shingleN = 3,
          k = k, screenFrac = 0.6, dfCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val direct = Dedup.bottomKContainmentScreen(incoming, corpus, "doc_id", "text",
          shingleN = 3, k = k, screenFrac = 0.6, dfCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(onIdx == direct, s"k=$k dfCap=$cap")
    }
  }

  test("simhashCandidates: banded result == brute-force hamming filter; no crossJoin in plan") {
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text"), 16).as("sh"))
    val banded = Dedup.simhashCandidates(h, "doc_id", "sh", bits = 16, maxHamming = 2)
    val fast = banded.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = h.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(h.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
      .where(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= 2)
      .select("id_a", "id_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast == brute)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"banded plan must not contain a cross join:\n$plan")
  }

  test("resolveGroups: chains collapse to min id, singletons keep themselves") {
    import spark.implicits._
    val verts = (0L to 6L).map(i => Tuple1(i)).toDF("doc_id")
    // two components: {0,1,2,3} via a chain (0-1, 1-2, 2-3), {5,6}; 4 isolated
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val groups = Dedup.resolveGroups(verts, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("resolveGroups: label flows against edge direction too (cycle + reversed edge)") {
    import spark.implicits._
    val verts = (0L to 3L).map(i => Tuple1(i)).toDF("doc_id")
    // edges given with the LARGER id first; component {0,1,2,3} as a cycle
    val pairs = Seq((3L, 2L), (2L, 1L), (1L, 0L), (0L, 3L)).toDF("id_a", "id_b")
    val groups = Dedup.resolveGroups(verts, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups.values.toSet == Set(0L))
  }

  test("resolveGroups: pointer jumping converges a 60-vertex chain within the round budget") {
    import spark.implicits._
    // a pure chain 0-1-2-...-59 has diameter 59 — plain propagation needs
    // ~59 rounds; pointer jumping must finish well inside maxIter=10
    val n = 60
    val verts = (0L until n).map(Tuple1(_)).toDF("doc_id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val groups = Dedup.resolveGroups(verts, "doc_id", pairs, maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups.size == n.toInt && groups.values.forall(_ == 0L))
  }

  test("keepBest: highest-quality group member survives, ties break to smallest id") {
    import spark.implicits._
    // group {1,2,3} (chain), singleton {4}; quality: 2 is best in group;
    // 1 and 3 tie below — group/best assignment must be deterministic
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 10L), (4L, 7L)).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.keepBest(docs, "doc_id", pairs, "quality")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, false),
      (2L, 1L, 2L, true),
      (3L, 1L, 2L, false),
      (4L, 4L, 4L, true)))
  }

  test("simhashCandidates: pigeonhole holds across the full hamming<=2 ball (property)") {
    import spark.implicits._
    // signatures that differ from a base in 0, 1, 2, and 3 bit positions:
    // everything at hamming <= 2 must be found, hamming 3 must not
    val base = 0xBEEFL & 0xFFFFL
    val sigs = Seq(
      (0L, base),
      (1L, base ^ 1L), // hamming 1 (band 0)
      (2L, base ^ (1L << 7) ^ (1L << 8)), // hamming 2 (spans bands)
      (3L, base ^ (1L << 1) ^ (1L << 6) ^ (1L << 12)) // hamming 3 — one flip per band
    ).toDF("doc_id", "sh")
    val pairs = Dedup.simhashCandidates(sigs, "doc_id", "sh", 16, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("simhashTuningAudit: truth matches brute force; bands >= maxHamming+1 reach recall 1.0") {
    val audit = Dedup.simhashTuningAudit(docs, "doc_id", "text",
        bits = 16, bandConfigs = Seq(2, 3, 4), maxHamming = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), Option(r.get(4)).map(_ => r.getDouble(4)))))
      .toMap
    assert(audit.keySet == Set(2L, 3L, 4L))
    // brute-force truth over the same simhash values
    val sh = docs.select(Dedup.simhash(col("text"), 16)).collect().map(_.getLong(0))
    val nTrue = (for {
      i <- sh.indices; j <- (i + 1) until sh.length
      if java.lang.Long.bitCount(sh(i) ^ sh(j)) <= 2
    } yield 1).size.toLong
    assert(nTrue > 0, "fixture must contain at least one true hamming<=2 pair")
    for ((bands, (nCand, nFound, nTotal, recall)) <- audit) {
      assert(nTotal == nTrue, s"bands=$bands truth total")
      assert(nFound <= nCand && nFound <= nTotal)
      // pigeonhole: >= maxHamming+1 contiguous bands are a lossless index
      if (bands >= 3L) assert(recall.contains(1.0), s"bands=$bands must reach recall 1.0")
    }
  }

  test("incrementalHammingScreen: band screen == brute-force incoming x corpus hamming") {
    val rnd = new scala.util.Random(17)
    // clustered 24-bit hashes so some incoming items have close corpus
    // neighbors and some don't
    val centers = Array.fill(6)(rnd.nextLong() & 0xffffffL)
    def near(c: Long): Long = {
      var h = c
      (0 until rnd.nextInt(5)).foreach(_ => h ^= 1L << rnd.nextInt(24))
      h
    }
    val rows = (0 until 120).map(i => (i.toLong, near(centers(rnd.nextInt(6)))))
    val df = rows.toDF("id", "sh")
    val incoming = df.filter(col("id") % 5 === 4)
    val corpus = df.filter(col("id") % 5 =!= 4)
    val got = Dedup.incrementalHammingScreen(incoming, corpus, "id", "sh",
        bits = 24, maxHamming = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val corpusRows = rows.filter(_._1 % 5 != 4)
    for ((id, sh) <- rows if id % 5 == 4) {
      val n = corpusRows.count(c => java.lang.Long.bitCount(c._2 ^ sh) <= 3).toLong
      assert(got(id) == ((n, n == 0)), s"id=$id expected $n corpus neighbors")
    }
    assert(got.values.exists(_._1 > 0) && got.values.exists(_._1 == 0),
      "fixture must exercise both dup and clean incoming items")
  }

  test("dupSpanStats: spans shared across docs count; unique and too-short docs report zero") {
    val d = Seq(
      (1L, "abcdefgh"),    // 5 distinct 4-spans, all inside doc 2 -> ratio 1.0
      (2L, "xxabcdefgh"),  // 7 distinct 4-spans, 5 shared with doc 1
      (3L, "qrstuv"),      // unique content -> 0 dup
      (4L, "ab"),          // shorter than the span width -> 0 shingles, 0.0 ratio
      (5L, "ZZZZabcd")     // lowercased spans: zzzz unique, abcd shared
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(d, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((5L, 5L, 1.0)))
    assert(out(2L) == ((7L, 5L, 5.0 / 7)))
    assert(out(3L) == ((3L, 0L, 0.0)))
    assert(out(4L) == ((0L, 0L, 0.0)), "doc shorter than n still reports a row")
    // "zzzzabcd" -> {zzzz, zzza, zzab, zabc, abcd}: only abcd is shared
    assert(out(5L) == ((5L, 1L, 1.0 / 5)))
  }
}
