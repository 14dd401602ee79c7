package graft

/** Semantic invariants for the round-11 fifth wave (q186/q187/q189)
  * beyond their oracle gates, run on the sf0.001 testdata.
  */
class GraphRetentionSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q186 kNN graph: ranks bounded, <= K edges per node, mutual flag symmetric") {
    val edges = SparkEntry.queries("q186_knn_graph")(spark, dir).collect()
    assert(edges.nonEmpty)
    val k = 3L
    val bySrc = edges.groupBy(_.getLong(0))
    bySrc.foreach { case (src, es) =>
      assert(es.length <= k, s"node $src has ${es.length} edges")
      val ranks = es.map(_.getLong(2)).sorted
      assert(ranks.sameElements(1L to ranks.length), s"node $src ranks: ${ranks.toSeq}")
    }
    // mutual(a->b) must equal "edge b->a exists", and is therefore symmetric
    val set = edges.map(r => (r.getLong(0), r.getLong(1))).toSet
    edges.foreach { r =>
      val (src, dst, mutual) = (r.getLong(0), r.getLong(1), r.getBoolean(4))
      assert(mutual == set.contains((dst, src)), s"mutual flag wrong on ($src,$dst)")
    }
  }

  test("q187 retention curve: kept counts monotone per source, final tier keeps everything") {
    val rows = SparkEntry.queries("q187_quality_retention")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (srcName, rs) =>
      val ordered = rs.sortBy(_.getLong(1)) // rarity_le ascending
      val docs = ordered.map(_.getLong(2))
      val toks = ordered.map(_.getLong(3))
      assert(docs.zip(docs.tail).forall { case (a, b) => a <= b }, s"$srcName docs not monotone")
      assert(toks.zip(toks.tail).forall { case (a, b) => a <= b }, s"$srcName toks not monotone")
      // last tier's ppm is exactly 1e6 on both axes (everything kept)
      assert(ordered.last.getLong(4) == 1000000L, s"$srcName docs_ppm tail")
      assert(ordered.last.getLong(5) == 1000000L, s"$srcName toks_ppm tail")
    }
  }

  test("q189 packing sweep: ceil identities hold and the 512 row reconciles with q128") {
    val rows = SparkEntry.queries("q189_packing_sweep")(spark, dir).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (l, nDocs, total) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (packed, split, pad) = (r.getLong(3), r.getLong(4), r.getLong(5))
      val (waste, ppm) = (r.getLong(6), r.getLong(7))
      assert(packed == (total + l - 1) / l)
      assert(pad >= packed && split <= nDocs && waste == pad * l - total && waste >= 0)
      assert(ppm == waste * 1000000L / (pad * l))
    }
    // stream-packing seq count at L=512 equals q128's layout: its last
    // doc's last_seq + 1
    val q128 = SparkEntry.queries("q128_sequence_packing")(spark, dir).collect()
    val lastSeq = q128.map(_.getLong(4)).max
    val packed512 = rows.find(_.getLong(0) == 512L).get.getLong(3)
    assert(packed512 == lastSeq + 1, s"packed $packed512 vs q128 last_seq $lastSeq")
  }
}
