package graft.queries

import graft.Tables
import graft.functions.CentroidAgg
import graft.operators.{AsOfJoin, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Coverage extensions beyond §2c's core list: pivot (unpivot's inverse),
  * cube grouping sets, as-of join (union + running window — the scalable
  * form), and a typed Aggregator UDAF (vector centroid).
  */
object MiscQueries {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: per-user event-type value sums as columns (O4's inverse). */
  def pivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(round(sum("value"), 2))
      .orderBy("user_id")

  /** Cube over (o_orderstatus, o_orderpriority) with grouping id. */
  def cube(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("cube_orders")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS prio,
        |       count(1) AS n,
        |       CAST(grouping_id() AS BIGINT) AS gid,
        |       round(sum(o_totalprice), 2) AS total
        |FROM cube_orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, prio, gid, n, total""".stripMargin)
  }

  /** As-of join: for each 'error' event, the value of the user's most
    * recent 'view' event at or before it (null if none).
    */
  def asofLastView(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts", "value")
    AsOfJoin.lastValue(errors, views, "user_id", "ts", "value")
      .select("event_id", "user_id", "asof_value")
      .orderBy("event_id")
  }

  /** Typed-Aggregator centroid per embedding label (first 4 dims shown). */
  def centroid(s: SparkSession, d: String): DataFrame = {
    val centroidUdaf = udaf(new CentroidAgg(64))
    Similarity.prepared(Tables.embeddings(s, d))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), centroidUdaf(col("v")).as("c"))
      .select(col("label"), col("n"),
              round(element_at(col("c"), 1), 4).as("c0"),
              round(element_at(col("c"), 2), 4).as("c1"),
              round(element_at(col("c"), 3), 4).as("c2"),
              round(element_at(col("c"), 4), 4).as("c3"))
      .orderBy("label")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c14_pivot" -> (pivot _),
    "c4b_cube" -> (cube _),
    "asof_last_view" -> (asofLastView _),
    "sim_centroid" -> (centroid _),
  )

  val oracle: Map[String, String] = Map(
    "c14_pivot" ->
      """SELECT user_id,
        |  round(sum(value) FILTER (WHERE event_type = 'click'), 2) AS click,
        |  round(sum(value) FILTER (WHERE event_type = 'error'), 2) AS error,
        |  round(sum(value) FILTER (WHERE event_type = 'purchase'), 2) AS purchase,
        |  round(sum(value) FILTER (WHERE event_type = 'signup'), 2) AS signup,
        |  round(sum(value) FILTER (WHERE event_type = 'view'), 2) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "c4b_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS prio,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, prio, gid, n, total""".stripMargin,
    "asof_last_view" ->
      """WITH u AS (
        |  SELECT event_id, user_id, ts, 1 AS tag, CAST(NULL AS DOUBLE) AS val
        |  FROM events WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT CAST(NULL AS BIGINT), user_id, ts, 0 AS tag, value
        |  FROM events WHERE event_type = 'view'
        |)
        |SELECT event_id, user_id,
        |  last_value(val IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), tag, val
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
        |FROM u QUALIFY tag = 1 ORDER BY event_id""".stripMargin,
    "sim_centroid" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(v[1]), 4) AS c0, round(avg(v[2]), 4) AS c1,
        |  round(avg(v[3]), 4) AS c2, round(avg(v[4]), 4) AS c3
        |FROM e GROUP BY label ORDER BY label""".stripMargin,
  )
}
