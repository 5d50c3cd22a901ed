package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Stream ≡ batch identities for the event-stream operators, driven by the
  * real sf0.001 events table split into two micro-batches (state must carry
  * across batch boundaries). */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  // normalize TIMESTAMP_NTZ → TIMESTAMP once (UTC session: same instants)
  private lazy val events =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", $"ts".cast("timestamp"))

  /** Write the events as two time-ordered chunks (so per-user event order
    * is preserved across micro-batches, matching the batch oracle). */
  private def twoChunkSource(): String = {
    val dir = tmpDir("ev-src")
    val sorted = events.orderBy($"ts", $"event_id").collect()
    val (a, b) = sorted.splitAt(sorted.length / 2)
    Seq(a, b).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(chunk.toSeq, 2), events.schema)
        .write.parquet(s"$dir/chunk$i")
    }
    // a file-stream source needs one directory; re-lay chunks as files.
    // FileStreamSource orders files by MODIFICATION TIME — the chunks must
    // get distinct mtimes or batch order (and so session folding) is luck.
    val src = tmpDir("ev-stream")
    Seq(0, 1).foreach { i =>
      spark.read.parquet(s"$dir/chunk$i").coalesce(1)
        .write.mode("append").parquet(src)
      Thread.sleep(1200)
    }
    src
  }

  test("watermarked windowed counts over a 2-batch stream equal the batch agg") {
    val src = twoChunkSource()
    // maxFilesPerTrigger=1 forces at least two micro-batches
    val stream = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = EventStream.windowedCounts(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("win_counts").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("win_counts")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val want = EventStream.windowedCountsBatch(events)
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(got == want, s"stream vs batch diff: ${(got diff want).take(3)} / ${(want diff got).take(3)}")
    assert(got.nonEmpty)
  }

  test("flatMapGroupsWithState sessionization: stream over 2 batches equals " +
    "the relational gap-session oracle (closed sessions)") {
    val src = twoChunkSource()
    val stream = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStream.Event]
    val q = EventStream.sessions(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    try q.processAllAvailable() finally q.stop()

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"user_id", $"session_start", $"session_end", $"n_events",
        round($"sum_value", 6).as("sv"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().toSet

    val got = canon(spark.table("sessions"))
    val want = canon(EventStream.sessionsBatchOracle(events))
    assert(got == want, s"diff: ${(got diff want).take(3)} / ${(want diff got).take(3)}")
    assert(got.nonEmpty, "expected at least one closed session in sf0.001 events")

    // batch execution of the SAME typed sessionizer also matches
    val batchGot = canon(EventStream.sessions(
      events.select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[EventStream.Event]).toDF())
    assert(batchGot == want)
  }
}
