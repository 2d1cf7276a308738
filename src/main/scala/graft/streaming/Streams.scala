package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Structured Streaming twins of the batch event queries (SURVEY.md §2b/§5):
  * each transform takes a (possibly streaming) DataFrame with the `events`
  * schema and returns the transformed frame, so the same code path serves
  * `spark.readStream` in production and `MemoryStream` in tests, and the
  * batch analogs (C9/C10/C11) validate the semantics against the oracle.
  *
  * Watermarks bound state: at 100 TB/day the grouping state for windows and
  * dedup would grow without bound otherwise. Output-mode/trigger choices are
  * the caller's (sink concern, not transform concern).
  */
object Streams {

  /** Tumbling event-time window aggregate (streaming twin of C9). */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("v"))

  /** Sliding window aggregate. */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
                    slide: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Session windows by event-time gap (streaming twin of C10 / batch
    * Sessionize).
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
              col("user_id"), col("n_events"))

  /** Stream-stream interval join: each click joined to the same user's
    * views within the preceding `within` interval. Both sides carry
    * watermarks and the join condition bounds event time in BOTH
    * directions — exactly what Spark needs to evict old rows from both
    * join-state stores instead of buffering the streams forever (the
    * required shape for stream-stream joins at 100 TB/day).
    */
  def clicksWithRecentViews(clicks: DataFrame, views: DataFrame,
                            watermark: String = "2 hours",
                            within: String = "30 minutes"): DataFrame =
    intervalJoin(clicks, views, watermark, within, "inner")

  /** LEFT OUTER stream-stream interval join: like [[clicksWithRecentViews]],
    * but a click with NO qualifying view still emits — null-padded — and
    * only once the watermark passes the last instant at which a matching
    * view could still arrive. That emission timing is where state-store
    * semantics actually bite: the unmatched click is NOT dropped and NOT
    * emitted early; it waits in the join state until the global watermark
    * proves absence, then leaves with nulls (and its state is evicted).
    * StreamingSpec pins both the timing and the batch-analog equality.
    */
  def clicksWithRecentViewsOuter(clicks: DataFrame, views: DataFrame,
                                 watermark: String = "2 hours",
                                 within: String = "30 minutes"): DataFrame =
    intervalJoin(clicks, views, watermark, within, "left_outer")

  private def intervalJoin(clicks: DataFrame, views: DataFrame,
                           watermark: String, within: String,
                           joinType: String): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
              col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
              col("value").as("view_value"))
      .withWatermark("v_ts", watermark)
    c.join(v, expr(
        s"c_user = v_user AND v_ts >= c_ts - INTERVAL $within AND v_ts <= c_ts"),
        joinType)
      .select(col("click_id"), col("c_user").as("user_id"),
              col("view_value"), col("v_ts"))
  }

  /** Stream-static enrichment: each streaming event joined to a STATIC
    * dimension frame. No watermark and no state store involved — the static
    * side is re-planned per micro-batch, and broadcasting it keeps the
    * stream side shuffle-free: the standard shape for attaching
    * slowly-changing metadata to a 100 TB/day event stream.
    */
  def enriched(events: DataFrame, dims: DataFrame, key: String = "user_id"): DataFrame =
    events.join(broadcast(dims), Seq(key), "left")

  /** Streaming dedup with bounded state: duplicates arriving within the
    * watermark delay of each other collapse to one row
    * (`dropDuplicatesWithinWatermark`); a duplicate arriving after state
    * eviction is re-emitted. This is deliberately NOT global exact distinct
    * (that would require unbounded state on an infinite stream) — C11's
    * batch query remains the exact-distinct analog.
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "value")

  /** Running per-user profile via Spark 4's arbitrary-state API
    * (`transformWithState` + [[UserProfileProcessor]]) — the successor to
    * `flatMapGroupsWithState` with typed per-state-variable storage, TTL
    * support, and timers. Each micro-batch updates one small ValueState
    * per user and emits the refreshed profile (Update mode), so state is
    * per-key constant-size — the shape that holds at 100 TB/day. Requires
    * the RocksDB state store provider (the API's backing store).
    */
  def userProfiles(events: DataFrame): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
                  col("value").cast("double").as("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new UserProfileProcessor, TimeMode.None(),
                          OutputMode.Update())
  }

  /** Timeout-driven session summaries via EVENT-TIME TIMERS — the piece
    * `session_window` aggregation can't express: arbitrary per-session
    * state emitted exactly once, when the watermark proves the session
    * over (no event within `gap` of its end). Each user's state is one
    * [[SessionSummary]] plus one armed timer at `session_end + gap`;
    * input rows extend the session and re-arm the timer; the timer firing
    * (watermark passed it) emits the summary and clears state — so state
    * is per-ACTIVE-key only, the shape that holds on an unbounded stream.
    *
    * Micro-batch semantics note: the watermark a batch's timers see is
    * the one computed at the END of the PREVIOUS batch, so a session
    * emits on the first batch that runs after the watermark passed its
    * timeout — the same one-batch lag every watermark-gated emission in
    * Structured Streaming has (see the outer interval join spec).
    */
  def sessionSummaries(events: DataFrame, gapMs: Long = 30L * 60 * 1000,
                       watermark: String = "10 minutes"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    require(gapMs > 0, s"session gap must be positive, got $gapMs ms")
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimeoutProcessor(gapMs),
                          TimeMode.EventTime(), OutputMode.Append())
  }
}

/** Input/output rows of [[Streams.userProfiles]]. */
case class UserEvent(user_id: Long, value: Double)
case class UserProfile(user_id: Long, n_events: Long,
                       total_value: Double, max_value: Double)

/** Input/output rows of [[Streams.sessionSummaries]]. */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
case class SessionSummary(user_id: Long, session_start: java.sql.Timestamp,
                          session_end: java.sql.Timestamp, n_events: Long)

/** Event-time-timer session processor: state = the open session summary;
  * one timer armed at session_end + gap, re-armed on every extension;
  * expiry (the watermark passed the timeout) emits and clears. A key with
  * no open session holds NO state — eviction is the emission itself.
  */
class SessionTimeoutProcessor(gapMs: Long)
    extends StatefulProcessor[Long, SessionEvent, SessionSummary] {

  @transient private var sess: ValueState[SessionSummary] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[SessionSummary](
      "session", Encoders.product[SessionSummary], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
                               timers: TimerValues): Iterator[SessionSummary] = {
    var lo = Long.MaxValue
    var hi = Long.MinValue
    var n = 0L
    rows.foreach { e =>
      val t = e.ts.getTime
      lo = math.min(lo, t); hi = math.max(hi, t); n += 1
    }
    if (n > 0) {
      val merged =
        if (sess.exists()) {
          val cur = sess.get()
          SessionSummary(user,
            new java.sql.Timestamp(math.min(cur.session_start.getTime, lo)),
            new java.sql.Timestamp(math.max(cur.session_end.getTime, hi)),
            cur.n_events + n)
        } else {
          SessionSummary(user, new java.sql.Timestamp(lo),
                         new java.sql.Timestamp(hi), n)
        }
      sess.update(merged)
      // one armed timer per key: re-arm at the new timeout. Materialize
      // the timer list BEFORE deleting — delete-during-scan would lean on
      // the state store's iterator snapshot semantics, which are
      // provider-specific.
      getHandle.listTimers().map(_.asInstanceOf[Long]).toSeq
        .foreach(getHandle.deleteTimer)
      getHandle.registerTimer(merged.session_end.getTime + gapMs)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, timers: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[SessionSummary] = {
    val out = if (sess.exists()) Iterator.single(sess.get()) else Iterator.empty
    sess.clear()
    out
  }
}

/** Arbitrary-state processor: one [[UserProfile]] ValueState per user,
  * folded over each batch's rows and re-emitted when the user appears.
  * State access goes through the handle (init runs once per partition per
  * batch AFTER the handle is set); no TTL — profile state is meant to live
  * for the stream's lifetime (pair with TTLConfig for bounded retention).
  */
class UserProfileProcessor
    extends StatefulProcessor[Long, UserEvent, UserProfile] {

  @transient private var profile: ValueState[UserProfile] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    profile = getHandle.getValueState[UserProfile](
      "profile", Encoders.product[UserProfile], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[UserEvent],
                               timers: TimerValues): Iterator[UserProfile] = {
    val prev =
      if (profile.exists()) profile.get()
      else UserProfile(user, 0L, 0.0, Double.NegativeInfinity)
    var n = prev.n_events
    var tot = prev.total_value
    var mx = prev.max_value
    rows.foreach { e =>
      n += 1; tot += e.value; mx = math.max(mx, e.value)
    }
    val next = UserProfile(user, n, tot, mx)
    profile.update(next)
    Iterator.single(next)
  }
}
