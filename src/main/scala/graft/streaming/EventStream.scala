package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured-Streaming operators over the `events` stream
  * (event_id, ts, user_id, event_type, value, props) — the streaming half
  * of a training-data pipeline: late-data-tolerant windowed aggregation
  * (watermark + tumbling window) and custom sessionization state
  * (flatMapGroupsWithState), each with a batch twin so stream≡batch is a
  * testable identity rather than a hope.
  *
  * Scale notes: the windowed agg is keyed by (window, event_type) — partial
  * aggregation + state store per key, bounded by the watermark horizon; the
  * sessionizer keeps ONE small state record per live user (no event buffer —
  * events fold into the open session as they arrive), so state size is
  * O(active users), not O(events).
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  // ------------------------------------------------------------------
  // Windowed aggregation (watermark + tumbling window)
  // ------------------------------------------------------------------

  /** 5-minute tumbling counts/sums per event_type, tolerating events up to
    * `lateness` out of order. The same Column expressions run in batch via
    * [[windowedCountsBatch]] — the stream≡batch identity test. */
  def windowedCounts(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Batch twin of [[windowedCounts]] (no watermark — batch sees all data). */
  def windowedCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  // ------------------------------------------------------------------
  // Sessionization (flatMapGroupsWithState)
  // ------------------------------------------------------------------

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  /** Open-session state: one record per live user, O(1) size. */
  case class SessionState(start: Long, last: Long, n: Long, sum_value: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, sum_value: Double)

  final val GapMs: Long = 30L * 60 * 1000

  /** java.sql.Timestamp ↔ epoch MICROseconds (getTime alone floors to ms —
    * the event table carries microsecond timestamps). */
  private def toMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Fold a user's new events into the open session; emit every session
    * CLOSED by a gap > 30 min. Emit-on-close semantics: the trailing open
    * session stays in state until a later event (or a sentinel flush event)
    * closes it — deterministic, no dependence on watermark timing. */
  def sessionStep(userId: Long, events: Iterator[Event],
                  state: GroupState[SessionState]): Iterator[Session] = {
    val sorted = events.toArray.sortBy(e => (toMicros(e.ts), e.event_id))
    val closed = Seq.newBuilder[Session]
    var cur = state.getOption.orNull
    for (e <- sorted) {
      val t = toMicros(e.ts)
      if (cur == null) cur = SessionState(t, t, 1, e.value)
      else if (t - cur.last > GapMs * 1000L) {
        closed += Session(userId, fromMicros(cur.start),
          fromMicros(cur.last), cur.n, cur.sum_value)
        cur = SessionState(t, t, 1, e.value)
      } else cur = SessionState(cur.start, math.max(cur.last, t),
        cur.n + 1, cur.sum_value + e.value)
    }
    if (cur != null) state.update(cur)
    closed.result().iterator
  }

  /** Streaming sessionizer: one state record per user, sessions emitted as
    * they close. Works identically on a batch Dataset (Spark runs
    * flatMapGroupsWithState in batch too) — see EventStreamSpec. */
  def sessions(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        sessionStep)
  }

  /** Relational batch oracle for [[sessions]] (closed sessions only):
    * classic gap-based session ids via lag + cumulative sum. */
  def sessionsBatchOracle(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > GapMs * 1000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val all = withGap.groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
    // closed sessions = all but each user's LAST session (emit-on-close)
    val lastSess = all.groupBy(col("user_id"))
      .agg(max(col("session_id")).as("last_id"))
    all.join(lastSess, "user_id")
      .filter(col("session_id") < col("last_id"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
  }

  /** Start the windowed-count stream over a directory of event parquet
    * files, writing results to an in-memory table `name`.
    *
    * Default output mode is APPEND: the watermark finalizes and EVICTS each
    * window once it passes, so state is bounded by the watermark horizon
    * (the production semantics). "complete" re-emits every window each
    * batch and keeps ALL window state forever — test/debug only (it is what
    * lets a finite file stream show its trailing, never-finalized windows). */
  def startWindowed(spark: SparkSession, sourceDir: String, name: String,
                    outputMode: String = "append"): StreamingQuery =
    windowedCounts(spark.readStream.schema(eventSchema).parquet(sourceDir))
      .writeStream.outputMode(outputMode).format("memory")
      .queryName(name).start()
}
