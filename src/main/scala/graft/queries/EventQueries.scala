package graft.queries

import graft.Tables
import graft.operators.Sessionize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C-series part 2 (SURVEY.md §2c C8–C11): JSON extraction, event-time
  * windows (batch analogs of the streaming twins in graft.streaming),
  * sessionization, and dedup/distinct counting over `events`.
  */
object EventQueries {

  /** C8 — JSON field extraction + aggregate. */
  def c8(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
              get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** C8b — structured JSON parsing: from_json to a typed struct, filter on
    * the extracted field (vs C8's get_json_object string path).
    */
  def c8b(s: SparkSession, d: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    Tables.events(s, d)
      .select(col("event_type"), from_json(col("props"), schema).getField("k").as("k"))
      .filter(col("k") > 50)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
      .orderBy("event_type")
  }

  /** C9b — sliding-window batch analog: 2-hour windows sliding by 1 hour
    * (each event lands in two windows).
    */
  def c9b(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
              col("event_type"), col("n"), col("v"))
      .orderBy("win_start", "event_type")

  /** C9 — tumbling-window batch analog: hourly counts/sums per event type. */
  def c9(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
               col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("hour", "event_type")

  /** C10 — sessionization batch analog: 30-minute-gap sessions per user. */
  def c10(s: SparkSession, d: String): DataFrame =
    Sessionize(Tables.events(s, d), "user_id", "ts", 1800L, "event_id")
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_id")

  /** C11 — exact dedup counts: distinct triples + distinct users. */
  def c11(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).agg(
      countDistinct(col("user_id"), col("event_type"), col("value")).as("n_distinct_triples"),
      countDistinct(col("user_id")).as("n_users"))

  /** C17 — weekly cohort retention: users grouped by first-activity week,
    * counted at each later active week offset — the canonical warehouse
    * triangle matrix. Two shuffles (distinct user-weeks, then per-user
    * min), both on user_id, so AQE reuses the exchange.
    */
  def c17(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val firsts = ev.groupBy("user_id").agg(min("wk").as("cw"))
    ev.join(firsts, "user_id")
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
              (datediff(col("wk"), col("cw")) / 7).cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** C18 — conversion funnel: of users with a 'view', how many 'purchase'
    * within 7 days of their FIRST view.
    */
  def c18(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val firstViews = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("fv"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
    val flags = firstViews.join(purchases, Seq("user_id"), "left")
      .withColumn("hit",
        col("pts").isNotNull && col("pts") >= col("fv") &&
          col("pts") <= col("fv") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id")
      .agg(max(when(col("hit"), 1L).otherwise(0L)).as("converted"))
    flags.agg(
      count(lit(1)).as("n_view_users"),
      sum("converted").cast("long").as("n_converted"),
      round(sum("converted").cast("double") / count(lit(1)).cast("double"), 4)
        .as("conv_rate"))
  }

  /** C29 — multi-step SEQUENTIAL funnel (view → click → purchase): a user
    * reaches step k only with an event STRICTLY AFTER their step-(k−1)
    * timestamp — the ordered-sequence semantics [[c18]]'s single
    * view→purchase window doesn't state (a purchase before the first
    * click counts there, not here). Per step: users reaching it and the
    * step-over-step conversion in exact integer micro-units.
    *
    * Scale shape: one user-keyed aggregate per step + one user-keyed join
    * per transition (shuffle on user_id throughout — co-locates at scale
    * if events are bucketed by user); the conversion window runs over the
    * #steps-row summary, never the events. Determinism: min timestamps
    * and strict `>` comparisons only — no floats anywhere.
    */
  def c29(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    def step(prev: DataFrame, evType: String, tPrev: String, tOut: String): DataFrame =
      ev.filter(col("event_type") === evType)
        .join(prev, "user_id")
        .filter(col("ts") > col(tPrev))
        .groupBy("user_id").agg(min("ts").as(tOut))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = step(v, "click", "t1", "t2")
    val p = step(c, "purchase", "t2", "t3")
    val counts = Seq((1L, "view", v), (2L, "click", c), (3L, "purchase", p))
      .map { case (i, t, df) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i).as("step"), lit(t).as("event_type"), col("n_users"))
      }
      .reduce(_ unionByName _)
    // the lag window runs over the 3-row step summary — driver-scale
    val w = Window.orderBy("step")
    counts
      .withColumn("__prev", lag("n_users", 1).over(w))
      .select(col("step"), col("event_type"), col("n_users"),
        when(col("__prev").isNull, lit(1000000L))
          .when(col("__prev") === 0L, lit(-1L))
          .otherwise(expr("(n_users * 1000000) div __prev")).as("conv_micro"))
      .orderBy("step")
  }

  /** C19 — DAU and rolling 7-day WAU per day. Distinct users cannot ride a
    * running window (distinct isn't decomposable), so WAU joins the tiny
    * day list to the (day, user) pairs within its 7-day range — a
    * broadcast range join whose left side is |days|, never |events|.
    */
  def c19(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = daily.select("day").distinct()
    val dau = daily.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = broadcast(days.select(col("day").as("wday"))).join(daily,
        col("day").between(date_sub(col("wday"), 6), col("wday")))
      .groupBy("wday").agg(countDistinct("user_id").as("wau"))
      .select(col("wday").as("day"), col("wau"))
    dau.join(wau, "day").orderBy("day")
  }

  /** C21 — SCD Type-2 dimension build from a change stream: per user, the
    * history of `event_type` states as versioned validity intervals —
    * collapse consecutive repeats (a state is one row no matter how many
    * events re-assert it), then `valid_to` = the next state's
    * `valid_from`, open interval (NULL) on the current state. The
    * warehouse-maintenance twin of `c20_merge_upsert`: c20 folds a
    * changeset into the latest snapshot, this keeps every version — the
    * reference's BigQuery-table-maintenance family taken one step further.
    *
    * Determinism: interval bounds are emitted as epoch MICROSECONDS
    * (`unix_micros` ≡ DuckDB `epoch_us`) — exact integers, no timestamp
    * formatting/precision drift; ties on `ts` break by `event_id`.
    *
    * Scale shape: both windows share one (user_id) hash partitioning and
    * one (ts, event_id) sort — Spark plans a single exchange + sort, and
    * the second window runs on the collapsed (transitions-only) rows.
    * 100 TB of events shuffles once, on the natural key.
    */
  def c21(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val transitions = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    transitions
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_ts", lead("ts", 1).over(w))
      .select(col("user_id"), col("event_type"), col("version"),
        unix_micros(col("ts")).as("valid_from_us"),
        unix_micros(col("valid_to_ts")).as("valid_to_us"),
        col("valid_to_ts").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  /** Gap-filled daily resample: per-user day grid over each user's own
    * [first_day, last_day] span with zero rows for silent days — the
    * time-series regularization every downstream model/monitor needs
    * (a missing day must read as 0, not as an absent row).
    *
    * Shape for scale: events reduce to per-(user, day) partials FIRST
    * (map-side combine does most of the work), the grid explodes from the
    * per-user span aggregate — bounded by span length, never by event
    * count — and the fill join runs on (user_id, day), the same key the
    * daily aggregate already shuffled on. No calendar table, no global
    * min/max: each user carries only its own span.
    */
  def resample(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
    val grid = daily.groupBy("user_id")
      .agg(min("day").as("mn"), max("day").as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 day"))).as("day"))
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(coalesce(col("v"), lit(0.0)), 2).as("v"))
      .orderBy("user_id", "day")
  }

  /** C30 — top user-journey 3-grams: each user's event stream in strict
    * (ts, event_id) order yields overlapping event-type trigrams; the
    * corpus-wide top-10 paths are the "what do users actually do"
    * sequence census behind funnel design (c18/c29 test a HYPOTHESIZED
    * path; this discovers the paths worth hypothesizing). `lead` windows
    * stay codegen and partition by user — no per-user list
    * materialization; the trigram census is a map-side-combined groupBy
    * and top-10 comes off as TakeOrderedAndProject.
    */
  def c30(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("path")).limit(10)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c26_resample" -> (resample _),
    "c30_user_paths" -> (c30 _),
    "c21_scd2" -> (c21 _),
    "c19_active_users" -> (c19 _),
    "c17_retention" -> (c17 _),
    "c18_funnel" -> (c18 _),
    "c29_funnel_steps" -> (c29 _),
    "c8_json" -> (c8 _),
    "c8b_from_json" -> (c8b _),
    "c9_tumbling_hour" -> (c9 _),
    "c9b_sliding" -> (c9b _),
    "c10_sessionize" -> (c10 _),
    "c11_exact_distinct" -> (c11 _),
  )

  val oracle: Map[String, String] = Map(
    "c30_user_paths" ->
      """WITH p AS (
        |  SELECT event_type || '>' || lead(event_type, 1) OVER w
        |    || '>' || lead(event_type, 2) OVER w AS path
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT path, CAST(count(*) AS BIGINT) AS n
        |FROM p WHERE path IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin,
    "c29_funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, ts FROM events),
        |v AS (SELECT user_id, min(ts) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id),
        |n AS (
        |  SELECT 1 AS step, 'view' AS event_type, (SELECT count(*) FROM v) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p))
        |SELECT CAST(step AS BIGINT) AS step, event_type,
        |  CAST(n_users AS BIGINT) AS n_users,
        |  CAST(CASE WHEN lag(n_users) OVER (ORDER BY step) IS NULL THEN 1000000
        |    WHEN lag(n_users) OVER (ORDER BY step) = 0 THEN -1
        |    ELSE (n_users * 1000000) // lag(n_users) OVER (ORDER BY step)
        |  END AS BIGINT) AS conv_micro
        |FROM n ORDER BY step""".stripMargin,
    "c26_resample" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |         CAST(count(*) AS BIGINT) AS n, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
        |  FROM (SELECT user_id, min(day) AS mn, max(day) AS mx
        |        FROM daily GROUP BY user_id) t)
        |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
        |  coalesce(d.n, 0) AS n, round(coalesce(d.v, 0), 2) AS v
        |FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
        |ORDER BY g.user_id, day""".stripMargin,
    "c21_scd2" ->
      """WITH c AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_type, ts, event_id FROM c
        |  WHERE prev IS NULL OR prev <> event_type),
        |g AS (
        |  SELECT user_id, event_type,
        |    CAST(row_number() OVER w AS BIGINT) AS version,
        |    epoch_us(ts) AS valid_from_us,
        |    epoch_us(lead(ts) OVER w) AS valid_to_us
        |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_type, version, valid_from_us, valid_to_us,
        |  (valid_to_us IS NULL) AS is_current
        |FROM g ORDER BY user_id, version""".stripMargin,
    "c19_active_users" ->
      """WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM daily),
        |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM daily GROUP BY day),
        |wau AS (
        |  SELECT d.day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
        |  FROM days d JOIN daily a ON a.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY d.day)
        |SELECT day, dau.dau, wau.wau
        |FROM days JOIN dau USING (day) JOIN wau USING (day)
        |ORDER BY day""".stripMargin,
    "c17_retention" ->
      """WITH e AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS cw FROM e GROUP BY user_id)
        |SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
        |  CAST(date_diff('day', CAST(f.cw AS DATE), CAST(e.wk AS DATE)) // 7 AS BIGINT)
        |    AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
    "c18_funnel" ->
      """WITH fv AS (SELECT user_id, min(ts) AS fv FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |p AS (SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'),
        |fl AS (
        |  SELECT fv.user_id,
        |    max(CASE WHEN p.pts IS NOT NULL AND p.pts >= fv.fv
        |              AND p.pts <= fv.fv + INTERVAL 7 DAY
        |         THEN 1 ELSE 0 END) AS converted
        |  FROM fv LEFT JOIN p USING (user_id) GROUP BY fv.user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_view_users,
        |  CAST(sum(converted) AS BIGINT) AS n_converted,
        |  round(CAST(sum(converted) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS conv_rate
        |FROM fl""".stripMargin,
    "c8_json" ->
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "c8b_from_json" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events) t
        |WHERE k > 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "c9b_sliding" ->
      """WITH w AS (
        |  SELECT unnest([date_trunc('hour', ts),
        |                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS win_start,
        |         event_type, value
        |  FROM events)
        |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS v
        |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "c9_tumbling_hour" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS v
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "c10_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
        |), f AS (
        |  SELECT user_id, event_id, ts, sec,
        |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), g AS (
        |  SELECT user_id,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f
        |)
        |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,
    "c11_exact_distinct" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM
        |    (SELECT DISTINCT user_id, event_type, value FROM events) t) AS n_distinct_triples,
        |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS n_users""".stripMargin,
  )
}
