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
}
