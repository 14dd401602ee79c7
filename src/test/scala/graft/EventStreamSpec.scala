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
    assert(q.awaitTermination(120000), "stream did not finish within 120s")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = EventStream
      .hourlyAggregate(EventStream.readEvents(spark, s"$dir/events.parquet"))
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
    assert(q.awaitTermination(120000), "stream did not finish within 120s")

    val expected = EventStream.readEvents(spark, s"$dir/events.parquet")
      .filter(col("event_type") === "click").count()
    assert(seen.get() == expected)
    assert(expected > 0)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  test("sessionAggregate: streaming session_window result matches the batch result") {
    val dir = stageEventsDir()
    val q = EventStream
      .sessionAggregate(EventStream.readEventStream(spark, dir), "4 hours", Some("8 hours"))
      .writeStream
      .format("memory")
      .queryName("session_stream_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within 120s")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = EventStream
      .sessionAggregate(EventStream.readEvents(spark, s"$dir/events.parquet"), "4 hours")
      .orderBy("user_id", "session_start")
      .collect()
      .toSeq
    val streamed = spark
      .table("session_stream_test")
      .orderBy("user_id", "session_start")
      .collect()
      .toSeq
    assert(batch.nonEmpty)
    assert(batch.exists(_.getLong(3) > 1), "fixture should merge at least one multi-event session")
    assert(streamed == batch)
  }

  test("runningUserCounts: mapGroupsWithState totals equal the batch group counts") {
    val dir = stageEventsDir()
    val q = EventStream
      .runningUserCounts(spark, EventStream.readEventStream(spark, dir))
      .writeStream
      .format("memory")
      .queryName("running_counts_test")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within 120s")

    val expected = EventStream.readEvents(spark, s"$dir/events.parquet")
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // update mode re-emits a user's total each batch; the LAST emission
    // per user is the final running count
    val got = spark.table("running_counts_test")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expected.nonEmpty)
    assert(got == expected)
  }

  test("dedupStream: duplicated input files collapse back to distinct events") {
    // stage the SAME parquet twice -> the stream delivers every event
    // twice; watermark-scoped dedup on event_id must restore the original
    val dir = Files.createTempDirectory("graft-dup-events")
    for (n <- Seq("a.parquet", "b.parquet"))
      Files.copy(
        Paths.get("/root/testdata/sf0.001/events.parquet"),
        dir.resolve(n), StandardCopyOption.REPLACE_EXISTING)
    val q = EventStream
      .dedupStream(EventStream.readEventStream(spark, dir.toString), Seq("event_id"), "1 hour")
      .writeStream
      .format("memory")
      .queryName("dedup_stream_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within 120s")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val expected = spark.read.parquet(s"$dir/a.parquet").count()
    val got = spark.table("dedup_stream_test").count()
    val gotDistinct = spark.table("dedup_stream_test").select("event_id").distinct().count()
    assert(expected > 0)
    assert(got == expected, s"expected $expected deduped events, got $got")
    assert(gotDistinct == expected)
  }

  test("clickPriorViewsStream: stream-stream range join matches the batch join") {
    val dir = stageEventsDir()
    val q = EventStream
      .clickPriorViewsStream(spark, dir)
      .writeStream
      .format("memory")
      .queryName("ss_join_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within 120s")

    val ev = EventStream.withEventTime(EventStream.readEvents(spark, s"$dir/events.parquet"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("event_time").as("c_time"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_time").as("v_time"))
    val batch = clicks
      .join(views,
        col("user_id") === col("v_user") &&
          col("v_time") >= col("c_time") - org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR") &&
          col("v_time") <= col("c_time"))
      .groupBy("event_id")
      .count()
      .orderBy("event_id")
      .collect().toSeq
    val streamed = spark.table("ss_join_test")
      .groupBy("event_id").count().orderBy("event_id")
      .collect().toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("enrichedHourlyStream: stream-static join matches the batch join+agg") {
    val dir = stageEventsDir()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dim = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val q = EventStream
      .enrichedHourlyStream(spark, dir, dim, "c_custkey", "c_mktsegment")
      .writeStream
      .format("memory")
      .queryName("enriched_stream_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish within 120s")

    val ev = EventStream.withEventTime(EventStream.readEvents(spark, s"$dir/events.parquet"))
    val batch = ev
      .join(dim.select(col("c_custkey"), col("c_mktsegment")), col("user_id") === col("c_custkey"))
      .groupBy(
        org.apache.spark.sql.functions.window(col("event_time"), "1 hour"),
        col("c_mktsegment"))
      .agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(
        org.apache.spark.sql.functions.unix_timestamp(col("window.start")).as("hour_epoch"),
        col("c_mktsegment"), col("n_events"), col("sum_value"))
      .orderBy("hour_epoch", "c_mktsegment")
      .collect().toSeq
    val streamed = spark.table("enriched_stream_test")
      .orderBy("hour_epoch", "c_mktsegment").collect().toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("funnel digests: any batch split merges to the exact batch funnel") {
    import org.apache.spark.sql.functions.{count, lit, min}
    val ev = EventStream
      .readEvents(spark, "/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    // the q149 batch funnel, computed directly
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "view").join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    val expected = Seq(s1.count(), s2.count(), s3.count())
    assert(expected.last > 0, "fixture must convert some users to stage 3")

    def counts(summaries: org.apache.spark.sql.DataFrame): Seq[Long] =
      EventStream.funnelStageCounts(EventStream.funnelUserStages(summaries))
        .orderBy("stage").collect().toSeq.map(_.getLong(2))

    // one digest over everything
    assert(counts(EventStream.funnelBatchSummary(ev)) == expected)
    // 3-way interleaved split: per-user event sets genuinely straddle
    // the parts, the situation the pruning proof is about
    val parts = (0 until 3).map(i =>
      EventStream.funnelBatchSummary(ev.filter(col("event_id") % 3 === i)))
    assert(counts(parts.reduce(_ unionAll _)) == expected)
  }

  test("funnelWindowed: digest path equals the directly-computed windowed funnel; split-invariant") {
    import org.apache.spark.sql.functions.{count, lit, min}
    val W = 86400000000000L // 1 day in nanos
    val ev = EventStream
      .readEvents(spark, "/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    // windowed funnel computed directly (min within each stage window)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "view").join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + lit(W))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2") && col("ts") <= col("t2") + lit(W))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    val expected = Seq(s1.count(), s2.count(), s3.count())
    // the window must BIND on this fixture or the test is vacuous
    val unwindowed = EventStream.funnelUserStages(EventStream.funnelBatchSummary(ev))
    assert(expected(1) < unwindowed.filter(col("t2").isNotNull).count())

    def counts(summaries: org.apache.spark.sql.DataFrame): Seq[Long] =
      EventStream.funnelStageCounts(EventStream.funnelWindowed(
          EventStream.funnelUserStages(summaries), W))
        .orderBy("stage").collect().toSeq.map(_.getLong(2))

    assert(counts(EventStream.funnelBatchSummary(ev)) == expected)
    val parts = (0 until 3).map(i =>
      EventStream.funnelBatchSummary(ev.filter(col("event_id") % 3 === i)))
    assert(counts(parts.reduce(_ unionAll _)) == expected)
  }

  test("cohort digests: any batch split (and replays) merge to the batch retention matrix") {
    val ev = EventStream
      .readEvents(spark, "/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("ts"))
    import org.apache.spark.sql.functions.{count, expr, lit, min}
    // the q150 batch matrix, computed directly
    val w = ev.select(col("user_id"), expr("ts div 604800000000000").as("wk")).distinct()
    val f = w.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
    val expected = w.join(f, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_week", "week_offset").collect().toSeq
    assert(expected.nonEmpty)

    val parts = (0 until 3).map(i =>
      EventStream.cohortBatchSummary(ev.filter(col("event_id") % 3 === i)))
    val merged = EventStream.cohortRetention(parts.reduce(_ unionAll _))
      .orderBy("cohort_week", "week_offset").collect().toSeq
    assert(merged == expected)
    // idempotence: replaying a digest (at-least-once delivery) changes nothing
    val replayed = EventStream.cohortRetention(
        (parts :+ parts.head).reduce(_ unionAll _))
      .orderBy("cohort_week", "week_offset").collect().toSeq
    assert(replayed == expected)
  }

  test("funnelStatePruned: in-order replay with pruning equals the exact batch funnel") {
    import org.apache.spark.sql.functions.{lit, max, ntile}
    import org.apache.spark.sql.expressions.Window
    val ev = EventStream
      .readEvents(spark, "/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val expected = EventStream.funnelStageCounts(
        EventStream.funnelUserStages(EventStream.funnelBatchSummary(ev)))
      .orderBy("stage").collect().toSeq.map(_.getLong(2))
    assert(expected.last > 0)

    // 4 time-ordered batches (cross-batch lateness 0); W much smaller
    // than a batch span so the horizon prunes hard inside every merge
    val W = 86400000000000L // 1 day; the fixture spans ~30
    val batches = (1 to 4).map(i =>
      ev.withColumn("q", ntile(4).over(Window.orderBy("ts", "event_id")))
        .filter(col("q") === i).drop("q"))
    var state = EventStream.funnelBatchSummary(ev).filter(lit(false))
    var seenMax = Long.MinValue
    for (b <- batches) {
      seenMax = math.max(seenMax, b.agg(max(col("ts"))).head().getLong(0))
      val horizon1 = spark.range(1).select(lit(seenMax - W).as("horizon"))
      state = EventStream.funnelStatePruned(state, EventStream.funnelBatchSummary(b), horizon1)
        .localCheckpoint(true)
    }
    val got = EventStream.funnelStageCounts(EventStream.funnelUserStages(state))
      .orderBy("stage").collect().toSeq.map(_.getLong(2))
    assert(got == expected, s"watermarked state $got != batch funnel $expected")

    // the bound the variant exists for: signup-less users retain ONLY
    // candidates inside the lateness horizon
    import org.apache.spark.sql.functions.{array_min, col => c}
    val unbounded = state.filter(c("t1").isNull)
      .select(array_min(c("views")).as("mv"), array_min(c("purchases")).as("mp"))
      .filter(c("mv") <= seenMax - W || c("mp") <= seenMax - W)
    assert(unbounded.count() == 0, "signup-less state must be horizon-bounded")
  }

  test("funnelStatePruned: a late lower signup WITHIN the horizon still resurrects") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // same fixture as the digest resurrection test, replayed through the
    // stateful path: batch 2's signup at ts=1 is late but within W of the
    // running max (20), so the state kept the view at 3 / purchase at 4
    val b1 = Seq(
      (1L, "signup", 5L), (1L, "view", 3L), (1L, "view", 10L),
      (1L, "purchase", 20L), (1L, "purchase", 4L)
    ).toDF("user_id", "event_type", "ts")
    val b2 = Seq((1L, "signup", 1L)).toDF("user_id", "event_type", "ts")
    val W = 100L
    val empty = EventStream.funnelBatchSummary(b1).filter(lit(false))
    val h1 = spark.range(1).select(lit(20L - W).as("horizon"))
    val s1 = EventStream.funnelStatePruned(empty, EventStream.funnelBatchSummary(b1), h1)
    val s2 = EventStream.funnelStatePruned(s1, EventStream.funnelBatchSummary(b2), h1)
    val r = EventStream.funnelUserStages(s2).collect().head
    assert(r.getLong(r.fieldIndex("t1")) == 1L)
    assert(r.getLong(r.fieldIndex("t2")) == 3L)
    assert(r.getLong(r.fieldIndex("t3")) == 4L)
  }

  test("funnel digest pruning survives a late lower signup") {
    import spark.implicits._
    // batch 1 alone: t1=5 -> t2=10 (the view at 3 precedes the local
    // signup); an eager (t1,t2,t3) state would discard ts=3 and a
    // min-merge would keep t2=10. The digest keeps every view <= the
    // local t2, so batch 2's earlier signup resurrects ts=3 as the true
    // t2 — and the purchase at 4 (pruned-safe: <= local t3=20) as t3.
    val b1 = Seq(
      (1L, "signup", 5L), (1L, "view", 3L), (1L, "view", 10L),
      (1L, "purchase", 20L), (1L, "purchase", 4L)
    ).toDF("user_id", "event_type", "ts")
    val b2 = Seq((1L, "signup", 1L)).toDF("user_id", "event_type", "ts")
    val merged = EventStream.funnelUserStages(
      EventStream.funnelBatchSummary(b1)
        .unionAll(EventStream.funnelBatchSummary(b2)))
      .collect()
    assert(merged.length == 1)
    val r = merged.head
    assert(r.getLong(r.fieldIndex("t1")) == 1L)
    assert(r.getLong(r.fieldIndex("t2")) == 3L)
    assert(r.getLong(r.fieldIndex("t3")) == 4L)
  }
}
