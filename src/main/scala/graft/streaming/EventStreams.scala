package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream. The reference has
  * no stream engine (SURVEY.md §1.2: its only incremental flow is the
  * changed-key pipeline re-sync, collection.rs:718-735); these operators
  * provide the streaming counterpart a 100-TB training-data pipeline needs:
  * watermarked windowed aggregation, exactly-once-style dedup, and stateful
  * sessionization. Each transform is defined on an untyped DataFrame so the
  * same code runs in batch mode (spark.read) and streaming mode
  * (spark.readStream) — the Spark idiom for testing stream semantics.
  */
object EventStreams {

  /** Tumbling-window count/sum per event type with a 10-minute watermark.
    * In append mode a window emits once its watermark passes — at scale
    * state is bounded by (watermark horizon × event types).
    */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup on event_id within the watermark horizon
    * (dropDuplicates + watermark bounds the dedup state). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes").dropDuplicates("event_id")

  case class SessionState(count: Long, sumValue: Double, lastTs: Long)
  case class SessionOut(user_id: Long, n_events: Long, sum_value: Double)

  /** Per-user session aggregation with custom state —
    * `flatMapGroupsWithState` (the KeyValueGroupedDataset surface).
    * A session closes after `gapMinutes` of inactivity (event-time gap).
    *
    * Per-key memory is BOUNDED at `maxBufferedPerKey` (plus closed-session
    * output): events fold incrementally through a fixed-size min-heap
    * reorder buffer instead of materializing and sorting the whole group —
    * one pathological key (a bot with millions of events per batch) streams
    * through the buffer rather than OOMing the executor. Ordering is exact
    * while no event arrives more than `maxBufferedPerKey` positions out of
    * order within the batch (the classic bounded-reorder guarantee; equal
    * timestamps never affect session boundaries, counts, or sums, so heap
    * tie order is immaterial). Disorder beyond the buffer degrades to the
    * same behavior as late data beyond a watermark: the stray event starts
    * or extends a session at fold time instead of its exact slot.
    */
  def sessionize(
      events: Dataset[EventRow],
      gapMinutes: Int = 30,
      maxBufferedPerKey: Int = 65536): DataFrame =
    sessionizeCounted(events, gapMinutes, maxBufferedPerKey)._1

  /** [[sessionize]] plus its degradation signal: a LongAccumulator counting
    * events folded OUT OF ORDER (fold-time ts < the session's lastTs) — the
    * observable trace of intra-batch disorder exceeding the reorder buffer.
    * Zero means every event folded in exact event-time order, so results
    * equal the unbounded full-sort; nonzero quantifies how often the bounded
    * buffer degraded (the stray events still fold, as with late data beyond
    * a watermark, but at their arrival slot).
    */
  def sessionizeCounted(
      events: Dataset[EventRow],
      gapMinutes: Int = 30,
      maxBufferedPerKey: Int = 65536)
      : (DataFrame, org.apache.spark.util.LongAccumulator) = {
    import events.sparkSession.implicits._
    val disorder = events.sparkSession.sparkContext
      .longAccumulator("sessionize.outOfOrderFolds")
    val out = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          val gapMs = gapMinutes * 60L * 1000L
          var st = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          def fold(e: EventRow): Unit = {
            val t = e.ts.getTime
            if (st.count > 0 && t < st.lastTs) disorder.add(1L)
            if (st.count > 0 && t - st.lastTs > gapMs) {
              closed += SessionOut(userId, st.count, st.sumValue)
              st = SessionState(0L, 0.0, Long.MinValue)
            }
            st = SessionState(st.count + 1, st.sumValue + e.value, math.max(st.lastTs, t))
          }
          // min-heap on event time; capped at maxBufferedPerKey entries
          val heap = scala.collection.mutable.PriorityQueue.empty[EventRow](
            Ordering.by((e: EventRow) => e.ts.getTime).reverse)
          rows.foreach { e =>
            heap.enqueue(e)
            if (heap.size > maxBufferedPerKey) fold(heap.dequeue())
          }
          while (heap.nonEmpty) fold(heap.dequeue())
          state.update(st)
          closed.iterator
      }.toDF()
    (out, disorder)
  }
}

final case class EventRow(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)
