package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming slice over the events table (builder-brief
  * extension; the reference is fully batch, SURVEY §2.2).
  *
  * The transforms are shared with the batch path: `hourlyAggregate` is the
  * same logical aggregation as SparkEntry's q40 — in streaming mode Spark
  * maintains it incrementally with watermark-bounded state, in batch mode
  * it is a plain groupBy. `foreachBatchSink` shows the standard pattern of
  * reusing arbitrary batch operators (e.g. the dedup/match pipelines) on
  * each micro-batch.
  *
  * Scale design: state is keyed by (window, event_type) — cardinality
  * bounded by types x watermark horizon, so executor state stays small no
  * matter the event volume; the watermark bounds late data instead of
  * letting state grow unboundedly.
  */
object EventStream {

  /** Read schema forced onto the driver's events.parquet: `ts BIGINT`
    * reads the physical INT64 of the parquet TIMESTAMP(MICROS) column
    * directly (timezone-free — no session-zone reinterpretation on the
    * NTZ logical type), yielding raw epoch MICROSECONDS.
    */
  def eventsSchemaDdl: String =
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"

  /** Engine-boundary events reader: the driver's testdata carries ts as
    * TIMESTAMP(MICROS) int64 (it carried TIMESTAMP(NANOS) when the
    * engine's long-nanos ts convention was set); read the physical
    * micros and rescale once here, so every downstream operator and
    * every epoch_us-parity oracle stays on long nanoseconds unchanged.
    * Exact: micros * 1000 fits int64 until year 2262.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventsSchemaDdl).parquet(path)
      .withColumn("ts", col("ts") * lit(1000L))

  /** Normalize the raw events frame: nanosecond-long ts -> timestamp. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 1-hour aggregate per event type. Works on both batch and
    * streaming frames; streaming callers get watermark-bounded state.
    */
  def hourlyAggregate(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = withEventTime(events)
    val marked = watermark.fold(src)(w => src.withWatermark("event_time", w))
    marked
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value")
      )
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_events"), col("sum_value")
      )
  }

  /** File-source stream over a directory of event parquet files.
    * `maxFilesPerTrigger` caps files per micro-batch — the knob gates use
    * to force a genuine multi-batch run over staged input.
    */
  def readEventStream(
      spark: SparkSession,
      dir: String,
      maxFilesPerTrigger: Option[Int] = None
  ): DataFrame = {
    val r = spark.readStream.schema(eventsSchemaDdl)
    // same micros-int64 readout + rescale as `readEvents`: the stream
    // yields ts as long NANOS, matching every batch-side oracle
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).parquet(dir)
      .withColumn("ts", col("ts") * lit(1000L))
  }

  /** Streaming hourly aggregate with a 2-hour watermark, update mode. */
  def hourlyStream(spark: SparkSession, dir: String): DataFrame =
    hourlyAggregate(readEventStream(spark, dir), watermark = Some("2 hours"))

  /** Stream-static join + windowed aggregate: enrich the event stream
    * with a static dimension (broadcast — stream-static equi-joins are
    * STATELESS in Structured Streaming; each micro-batch joins against
    * the dim snapshot, no join state accumulates), then the watermarked
    * hourly aggregate keyed by the dimension attribute. The standard
    * "events x user/customer dim" enrichment every pipeline runs; state
    * is bounded by (hours in watermark horizon) x (dim attribute
    * cardinality), independent of event volume or dim size.
    */
  def enrichedHourlyStream(
      spark: SparkSession,
      dir: String,
      dim: DataFrame,
      dimKey: String,
      dimAttr: String
  ): DataFrame =
    withEventTime(readEventStream(spark, dir))
      .withWatermark("event_time", "2 hours")
      .join(broadcast(dim.select(col(dimKey), col(dimAttr))), col("user_id") === col(dimKey))
      .groupBy(window(col("event_time"), "1 hour"), col(dimAttr))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value")
      )
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col(dimAttr), col("n_events"), col("sum_value")
      )

  /** Stream-STREAM inner join with an event-time range constraint:
    * every click joined to the same user's views from the trailing hour.
    * Both sides carry watermarks and the join condition bounds v_time
    * relative to c_time, so Spark can size the join state exactly —
    * buffered rows evict as soon as the watermark proves they can never
    * match a future row (state ~ arrival rate x (watermark + range),
    * independent of stream length). Emits raw matched pairs (append
    * mode); aggregate downstream.
    */
  def clickPriorViewsStream(spark: SparkSession, dir: String): DataFrame = {
    val clicks = withEventTime(readEventStream(spark, dir))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id").as("c_user"), col("event_time").as("c_time"))
      .withWatermark("c_time", "2 hours")
    val views = withEventTime(readEventStream(spark, dir))
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_time").as("v_time"))
      .withWatermark("v_time", "2 hours")
    clicks.join(
      views,
      col("c_user") === col("v_user") &&
        col("v_time") >= col("c_time") - expr("INTERVAL 1 HOUR") &&
        col("v_time") <= col("c_time"))
  }

  /** foreachBatch sink reusing an arbitrary batch transform — the bridge
    * that lets every batch operator in this engine (dedup, match, ...)
    * run over a stream without a streaming rewrite.
    */
  def foreachBatchSink(
      stream: DataFrame,
      transform: DataFrame => DataFrame
  )(handle: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      // checkpoint (offset/commit log) on the fast scratch root — see
      // Staging.fastDir: commit latency, not compute, dominated gate time
      .option("checkpointLocation", graft.Staging.fastDir("ckpt-").toString)
      .foreachBatch { (batch: DataFrame, id: Long) => handle(transform(batch), id) }

  /** Gap-based per-user session aggregate via Spark's native
    * `session_window` — the same expression works on batch and streaming
    * frames; in streaming mode Spark merges overlapping session state
    * incrementally and the watermark closes sessions (state per OPEN
    * session only, bounded by the watermark horizon, not event volume).
    */
  def sessionAggregate(events: DataFrame, gap: String, watermark: Option[String] = None): DataFrame = {
    val src = withEventTime(events)
    val marked = watermark.fold(src)(w => src.withWatermark("event_time", w))
    marked
      .groupBy(col("user_id"), session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("n_events")
      )
  }

  /** Streaming exact dedup: drops rows whose key columns repeat within
    * the watermark horizon — the streaming half of the dedup pillar
    * (batch exact dedup is operators/Dedup.exactGroups). State holds one
    * entry per DISTINCT key seen inside the horizon and is evicted by the
    * watermark, so memory is bounded by key arrival rate × horizon, not
    * stream length.
    */
  def dedupStream(events: DataFrame, keys: Seq[String], watermark: String): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Custom arbitrary state (the mapGroupsWithState surface): a running
    * per-user event count carried across micro-batches. Update-mode
    * output — each batch emits the refreshed totals for the users it saw.
    *
    * State tradeoff: counts are lifetime totals, so state holds one entry
    * per distinct user EVER seen and grows with user cardinality — unlike
    * the watermark-bounded operators above, nothing here is evicted. That
    * is inherent to the semantics ("running count since stream start");
    * a long-running deployment whose user space is unbounded should swap
    * `NoTimeout` for `ProcessingTimeTimeout` + `setTimeoutDuration` and
    * accept counts resetting for users idle past the TTL.
    */
  def runningUserCounts(spark: SparkSession, stream: DataFrame): Dataset[UserCount] = {
    import spark.implicits._
    stream
      .select(col("user_id"))
      .as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + events.size
          state.update(n)
          UserCount(user, n)
      }
  }

  /** FUNNEL ON A STREAM, part 1: the mergeable per-micro-batch digest.
    *
    * The ordered funnel (t1 = min signup, t2 = min view AFTER t1, t3 =
    * min purchase AFTER t2) is NOT decomposable into per-batch
    * (t1, t2, t3) triples — a later batch's earlier signup can lower t1
    * and make a view this batch discarded (because it preceded the
    * batch-local t1) the true t2. The correct mergeable state is a
    * pruned candidate set per user:
    *
    *   - `t1`: min signup ts in the batch (a plain min — associative).
    *   - `views`: every distinct view ts `<=` the batch-local t2.
    *     Safe to drop views `v >` local t2: local t2 is itself a view
    *     with local t2 `>` local t1 `>=` final t1 (a subset's min is
    *     `>=` the full min), so local t2 stays eligible under ANY final
    *     threshold and beats `v`. Views `<=` local t1 are KEPT — a late
    *     lower signup can make them eligible.
    *   - `purchases`: every distinct purchase ts `<=` the batch-local
    *     t3, by the same argument one stage down (final t2 `<=` local
    *     t2, so local t3 stays eligible).
    *
    * When a stage threshold doesn't exist in the batch (no signup / no
    * post-signup view), nothing downstream of it can be pruned and the
    * full distinct set is kept. Digest size per (user, batch) is the
    * few events preceding the user's first conversion — not the event
    * volume — and merging digests (min the t1s, union the arrays,
    * re-derive t2/t3) provably equals the batch funnel over the union.
    */
  def funnelBatchSummary(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isin("signup", "view", "purchase"))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t1"),
        sort_array(array_distinct(collect_list(
          when(col("event_type") === "view", col("ts"))))).as("views"),
        sort_array(array_distinct(collect_list(
          when(col("event_type") === "purchase", col("ts"))))).as("purchases"))
      // null-threshold filters drop every element (comparison with a null
      // t yields null = not kept), so array_min over them is null and the
      // `when` keeps the full array — exactly the no-pruning case above
      .withColumn("t2", array_min(filter(col("views"), v => v > col("t1"))))
      .withColumn("views",
        when(col("t2").isNotNull, filter(col("views"), v => v <= col("t2")))
          .otherwise(col("views")))
      .withColumn("t3", array_min(filter(col("purchases"), p => p > col("t2"))))
      .withColumn("purchases",
        when(col("t3").isNotNull, filter(col("purchases"), p => p <= col("t3")))
          .otherwise(col("purchases")))
      .select("user_id", "t1", "views", "purchases")

  /** FUNNEL ON A STREAM, part 2: merge per-batch digests into per-user
    * stage times (t1, t2, t3) — min the signup mins, union the pruned
    * candidate arrays, re-derive the stage thresholds. Equals the batch
    * funnel over the union of the digested batches for ANY batch split
    * (see `funnelBatchSummary` for the pruning-safety argument).
    */
  def funnelUserStages(summaries: DataFrame): DataFrame =
    summaries
      .groupBy("user_id")
      .agg(
        min(col("t1")).as("t1"),
        array_distinct(flatten(collect_list(col("views")))).as("views"),
        array_distinct(flatten(collect_list(col("purchases")))).as("purchases"))
      .withColumn("t2", array_min(filter(col("views"), v => v > col("t1"))))
      .withColumn("t3", array_min(filter(col("purchases"), p => p > col("t2"))))
      .select("user_id", "t1", "t2", "t3")

  /** CONVERSION-WINDOW overlay on funnel stage times: stage n counts
    * only if it happened within `windowNanos` of stage n-1. This is a
    * pure post-map over the UNWINDOWED stage times — the windowed
    * stage-2 time is the unwindowed one when `t2 - t1 <= W` and does
    * not exist otherwise (the first view after t1 is the minimum; if
    * it overshoots the window, every later view does too), and nulling
    * t2 cascades to t3. Because it is a function of the exact
    * unwindowed (t1, t2, t3), the same per-batch digests (and the same
    * pruning-safety proof) serve every window length, including none.
    */
  def funnelWindowed(userStages: DataFrame, windowNanos: Long): DataFrame =
    userStages
      .withColumn("t2", when(col("t2") - col("t1") <= windowNanos, col("t2")))
      .withColumn("t3",
        when(col("t2").isNotNull && col("t3") - col("t2") <= windowNanos, col("t3")))

  /** COHORT RETENTION ON A STREAM, part 1: the mergeable per-batch
    * digest — each user's sorted distinct week-index set. State is
    * bounded by weeks-in-horizon per user, not event volume, and set
    * union is associative, commutative AND idempotent: digests merge
    * exactly for any micro-batch split, and an at-least-once replay of
    * a batch cannot change the answer (unlike a count-based digest).
    */
  def cohortBatchSummary(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), expr("ts div 604800000000000").as("wk"))
      .groupBy("user_id")
      .agg(sort_array(array_distinct(collect_list(col("wk")))).as("weeks"))

  /** COHORT RETENTION ON A STREAM, part 2: union the per-batch week
    * sets per user, derive each user's cohort (min week), and count
    * distinct active users per (cohort_week, week_offset) — the q150
    * retention matrix, exactly, for any batch split.
    */
  def cohortRetention(summaries: DataFrame): DataFrame =
    summaries
      .groupBy("user_id")
      .agg(array_distinct(flatten(collect_list(col("weeks")))).as("weeks"))
      .select(col("user_id"), array_min(col("weeks")).as("cohort_week"),
        explode(col("weeks")).as("wk"))
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))

  /** FUNNEL ON A STREAM, part 4: WATERMARK-BOUNDED incremental state —
    * the production shape. `funnelBatchSummary`'s digest is exact under
    * ARBITRARY lateness, but for users with no signup yet it must retain
    * every distinct view/purchase ts (any of them could become t2/t3
    * under a late signup), so that cohort's state is event-volume-
    * bounded. Under the standard watermark contract — every event in a
    * future micro-batch has ts > horizon, where horizon = (max ts seen
    * across ALL batches so far) - allowed lateness W — older candidates
    * provably cannot matter and are dropped:
    *
    *   - view v with v <= horizon and v <= t1: a future signup s has
    *     s > horizon >= v, so the future t1' = min(t1, s) still
    *     satisfies v <= t1' — v is never eligible as t2. DROP.
    *   - view v with v > t1: eligible under the CURRENT t1; a late
    *     signup can only add eligible views > horizon, never retire v
    *     below the local-t2 prune. KEEP (bounded by first conversion).
    *   - purchase p with p <= horizon and p <= t2: p becomes eligible
    *     only if the final t2' < p <= t2; t2' < t2 requires a late
    *     signup s > horizon lowering t1, making t2' a view > s >
    *     horizon >= p — contradiction. DROP.
    *
    * The pruning MUST run against the RUNNING state and RUNNING max-ts
    * horizon, not per batch: batch-locally a user looks signup-less even
    * when an EARLIER batch already delivered their signup, and dropping
    * their views on that evidence is unsound (the late-lower-signup
    * resurrection the unbounded digest exists for). EventStreamSpec
    * proves merge+prune == the exact batch funnel whenever cross-batch
    * lateness <= W, and that signup-less state is horizon-bounded.
    *
    * `state` is the previous merged state ((user_id, t1, views,
    * purchases), empty on the first batch), `digest` the new batch's
    * `funnelBatchSummary`, `horizon1` a 1-ROW frame (`horizon` long) =
    * running max ts - W, broadcast onto the merge — no driver-side
    * collect. Output: the new state, same schema.
    */
  def funnelStatePruned(state: DataFrame, digest: DataFrame, horizon1: DataFrame): DataFrame =
    state.unionByName(digest)
      .groupBy("user_id")
      .agg(
        min(col("t1")).as("t1"),
        sort_array(array_distinct(flatten(collect_list(col("views"))))).as("views"),
        sort_array(array_distinct(flatten(collect_list(col("purchases"))))).as("purchases"))
      .crossJoin(broadcast(horizon1))
      // watermark drop, then the funnelBatchSummary local-t2/t3 prune on
      // the merged arrays (null comparisons keep the no-threshold case)
      .withColumn("views",
        filter(col("views"), v => v > col("t1") || v > col("horizon")))
      .withColumn("t2m", array_min(filter(col("views"), v => v > col("t1"))))
      .withColumn("views",
        when(col("t2m").isNotNull, filter(col("views"), v => v <= col("t2m")))
          .otherwise(col("views")))
      .withColumn("purchases",
        filter(col("purchases"), p => p > col("t2m") || p > col("horizon")))
      .withColumn("t3m", array_min(filter(col("purchases"), p => p > col("t2m"))))
      .withColumn("purchases",
        when(col("t3m").isNotNull, filter(col("purchases"), p => p <= col("t3m")))
          .otherwise(col("purchases")))
      .select("user_id", "t1", "views", "purchases")

  /** FUNNEL ON A STREAM, part 3: the q149-shaped conversion table
    * (stage, event_type, n_users) from per-user stage times. `count`
    * skips nulls, so each row counts the users that reached that stage.
    */
  def funnelStageCounts(userStages: DataFrame): DataFrame = {
    val counts = userStages.agg(
      count(col("t1")).as("n1"),
      count(col("t2")).as("n2"),
      count(col("t3")).as("n3"))
    counts
      .select(lit(1L).as("stage"), lit("signup").as("event_type"),
        col("n1").as("n_users"))
      .unionAll(counts.select(lit(2L).as("stage"), lit("view").as("event_type"),
        col("n2").as("n_users")))
      .unionAll(counts.select(lit(3L).as("stage"), lit("purchase").as("event_type"),
        col("n3").as("n_users")))
  }
}

/** Output row of `runningUserCounts`. */
case class UserCount(user_id: Long, n_events: Long)
