package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (the `KeyValueGroupedDataset` state API) —
  * per-user running profiles maintained across micro-batches. This is the
  * piece of the streaming surface that windows can't express: arbitrary
  * per-key state with engine-managed fault tolerance (checkpointed state
  * store, at-least-once state transitions).
  *
  * Scale shape: state is hash-partitioned by key across executors; each
  * micro-batch touches only the keys present in the batch plus timed-out
  * state. The batch oracle (`profilesBatch`) computes the same final
  * profiles with a plain aggregation — StatefulSpec asserts equality.
  */
object StatefulOps {

  case class EventIn(user_id: Long, event_id: Long, value: Double, tsMicros: Long)

  case class UserProfile(user_id: Long, n_events: Long, total_cents: Long,
                         first_event: Long, last_event: Long)

  /** Streaming: fold events into per-user profiles with mapGroupsWithState.
    * Values are accumulated in integer cents so the result is identical
    * regardless of arrival order (double addition would be order-
    * sensitive; at-least-once replays make that matter in production).
    */
  def profilesStreaming(events: Dataset[EventIn]): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserProfile](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[EventIn], state: GroupState[UserProfile]) =>
          val prev = state.getOption.getOrElse(
            UserProfile(user, 0L, 0L, Long.MaxValue, Long.MinValue))
          val next = batch.foldLeft(prev) { (p, e) =>
            UserProfile(user,
              p.n_events + 1,
              // HALF_UP away from zero like the batch oracle's round():
              // Scala math.round goes toward +infinity and diverges on
              // negative half-cent values
              p.total_cents + (if (e.value >= 0) math.round(e.value * 100)
                else -math.round(-e.value * 100)),
              math.min(p.first_event, e.event_id),
              math.max(p.last_event, e.event_id))
          }
          state.update(next)
          next
      }
  }

  /** Batch oracle: same profiles via plain aggregation. */
  def profilesBatch(events: DataFrame): DataFrame =
    events
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("total_cents"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))

  // ---- arbitrary-stateful sessionization (flatMapGroupsWithState) ---------

  /** Typed input for the streaming sessionizer. `ts` stays in the row so
    * the event-time watermark column survives into the keyed state op
    * (projecting it away would drop the watermark and EventTimeTimeout
    * with it); `ts_us` carries the exact micros, `cents` the engine's own
    * decimal(18,2) cast of `value` so the folded sum is bit-identical to
    * the batch aggregation at any arrival order.
    */
  case class SessEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                       cents: Long)

  /** Per-user open session carried across micro-batches. */
  case class OpenSession(user_id: Long, start_us: Long, last_us: Long,
                         n_events: Long, cents: Long)

  /** Gap-based session windows via `flatMapGroupsWithState` — the
    * arbitrary-stateful API executed for real (EventTimeTimeout + append
    * mode), not the built-in `session_window` aggregation. Contract
    * (matches the batch `StreamPipelines.sessionize` exactly): an event
    * extends the user's open session iff it is STRICTLY less than
    * `gapUs` after the session's last event; a completed session is
    * emitted either when a later event proves the gap (append-time
    * emission — no future event can land between them because the input
    * is watermark-ordered across batches) or when the event-time
    * watermark passes `last + gap` (timeout flush for each user's final
    * session). State per key is ONE open session — O(active users), the
    * production sessionization shape; at-least-once replays of a batch
    * fold to the same session set because emission happens exactly once
    * per proven gap.
    *
    * Requires arrival order that never delivers an event below the
    * current watermark (the executed query stages a range-ordered log;
    * production uses a positive watermark delay sized to the disorder).
    */
  def sessionizeStreaming(events: Dataset[SessEvent],
                          gapUs: Long): Dataset[OpenSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, OpenSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[SessEvent], state: GroupState[OpenSession]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var out = List.empty[OpenSession]
          var cur = state.getOption.orNull
          // within-batch arrival order is arbitrary (parallel file read):
          // sort by event time; cross-batch order is watermark-enforced
          for (e <- batch.toArray.sortBy(ev => (ev.ts_us, ev.user_id))) {
            if (cur == null)
              cur = OpenSession(user, e.ts_us, e.ts_us, 1L, e.cents)
            else if (e.ts_us - cur.last_us < gapUs)
              cur = OpenSession(user, cur.start_us,
                math.max(cur.last_us, e.ts_us), cur.n_events + 1,
                cur.cents + e.cents)
            else { out ::= cur
              cur = OpenSession(user, e.ts_us, e.ts_us, 1L, e.cents) }
          }
          // flush the open session once the watermark proves no future
          // event can extend it (covers the hasTimedOut invocation and
          // the data invocation alike)
          if (cur != null && wmUs >= cur.last_us + gapUs) {
            out ::= cur; cur = null
          }
          if (cur == null) state.remove()
          else {
            state.update(cur)
            // fire strictly after last+gap (ms-truncation guarded by +1)
            state.setTimeoutTimestamp((cur.last_us + gapUs) / 1000L + 1L)
          }
          out.reverseIterator
      }
  }

  /** Adapt the events table (ts already normalized) to the typed input. */
  def asEventIn(events: DataFrame): Dataset[EventIn] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"), col("value"),
      unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
      .as[EventIn]
  }

  /** Run the stateful query over a file stream to completion (update mode;
    * the LAST emitted row per user is the final profile).
    */
  def runToFinalProfiles(spark: SparkSession, src: Dataset[EventIn],
                         queryName: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val q = profilesStreaming(src).toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // last update per user wins
    val all = spark.table(queryName)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    all.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }
}
