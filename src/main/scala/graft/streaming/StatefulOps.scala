package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful Structured Streaming operators (SURVEY §2.10: the reference
  * has no stateful streaming — these are the north-star extensions that a
  * continuously-ingesting training-data pipeline needs).
  */
object StatefulOps {

  final case class Event(user_id: Long, event_id: Long, ts: Timestamp)
  final case class SessionState(sessionCount: Long, lastTsUs: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Streaming gap-based sessionization with explicit per-key state
    * (`flatMapGroupsWithState`): counts sessions per user across
    * micro-batches — the streaming equivalent of
    * [[graft.operators.SessionOps.sessionStats]].
    *
    * State per user is two longs — O(users) total, independent of event
    * volume, so the state store stays small at any scale. Events within a
    * batch are sorted by (ts, event_id) before folding; with
    * AvailableNow over a bounded source every event lands in one batch,
    * making the result comparable to the batch operator.
    */
  def streamingSessionStats(spark: SparkSession, eventsPath: String,
      gapSeconds: Long = 1800L,
      queryName: String = "graft_sessions"): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = StreamingOps.asSourceDir(eventsPath)
    val schema = spark.read.parquet(srcDir).schema
    val events = spark.readStream.schema(schema).parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select(col("user_id"), col("event_id"), col("ts")).as[Event]

    val gapUs = gapSeconds * 1000000L
    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (user, it, state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime * 1000, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          var n = 0L
          sorted.foreach { e =>
            val us = e.ts.getTime * 1000
            val newSession = st.sessionCount == 0 || us - st.lastTsUs > gapUs
            st = SessionState(st.sessionCount + (if (newSession) 1 else 0), us)
            n += 1
          }
          state.update(st)
          Iterator(UserSessions(user, st.sessionCount, n))
      }

    val q = sessions.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming exact dedup with watermarked state (`dropDuplicates` on a
    * key within the watermark horizon) — the streaming counterpart of
    * DedupOps.exactDedup: duplicates arriving within `watermark` of each
    * other emit once. State is bounded by the watermark (expired keys are
    * dropped), which is what makes this viable on an unbounded stream.
    */
  def streamingDedup(spark: SparkSession, eventsPath: String,
      keyCols: Seq[String], watermark: String = "1 hour",
      queryName: String = "graft_stream_dedup"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = StreamingOps.asSourceDir(eventsPath)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Stream-stream interval inner join: click events joined to the
    * signup (by `joinType` filter columns) of the same user within
    * `intervalSeconds` *before* the click. Both sides carry watermarks,
    * which is what lets Spark bound the join state: a buffered signup can
    * be dropped once the click-side watermark passes its interval upper
    * bound — state stays O(events in the interval window), not O(stream).
    *
    * Over a bounded source with AvailableNow the result equals the batch
    * interval join, which is what the oracle checks (q51).
    */
  def streamStreamIntervalJoin(spark: SparkSession, eventsPath: String,
      leftType: String = "click", rightType: String = "signup",
      intervalSeconds: Long = 3600L,
      queryName: String = "graft_stream_join"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = StreamingOps.asSourceDir(eventsPath)
    val schema = spark.read.parquet(srcDir).schema
    def side(eventType: String, prefix: String) =
      spark.readStream.schema(schema).parquet(srcDir)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .where(col("event_type") === eventType)
        .select(col("user_id").as(s"${prefix}_user"),
          col("event_id").as(s"${prefix}_id"), col("ts").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "1 hour")
    val clicks = side(leftType, "c")
    val signups = side(rightType, "s")
    val joined = clicks.join(signups,
      col("c_user") === col("s_user")
        && col("c_ts") >= col("s_ts")
        && col("c_ts") <= col("s_ts") + expr(s"INTERVAL $intervalSeconds SECONDS"))
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
