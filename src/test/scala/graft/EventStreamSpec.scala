package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

/** Structured Streaming slice: the streaming hourly aggregate must agree
  * with the batch aggregate over the same files, and foreachBatch must
  * deliver transformed micro-batches.
  */
class EventStreamSpec extends SparkSpec {

  private def stageEventsDir(): String = {
    val dir = Files.createTempDirectory("graft-events")
    Files.copy(
      Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING
    )
    dir.toString
  }

  test("streaming hourly aggregate matches the batch aggregate") {
    val dir = stageEventsDir()
    val q = EventStream
      .hourlyStream(spark, dir)
      .writeStream
      .format("memory")
      .queryName("hourly_stream_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = EventStream
      .hourlyAggregate(spark.read.parquet(s"$dir/events.parquet"))
      .orderBy("hour_epoch", "event_type")
      .collect()
      .toSeq
    val streamed = spark
      .table("hourly_stream_test")
      .orderBy("hour_epoch", "event_type")
      .collect()
      .toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("foreachBatchSink applies a batch transform to each micro-batch") {
    val dir = stageEventsDir()
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val stream = EventStream.readEventStream(spark, dir)
    val q = EventStream
      .foreachBatchSink(stream, b => b.filter(b("event_type") === "click")) {
        (batch, _) => seen.addAndGet(batch.count())
      }
      .start()
    q.awaitTermination(120000)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val expected = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "click").count()
    assert(seen.get() == expected)
    assert(expected > 0)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
