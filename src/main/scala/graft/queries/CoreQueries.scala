package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C-series capability suite, part 1 (SURVEY.md §2c C1–C7): joins,
  * aggregations, window frames, set ops, scalar/date functions — all pure
  * Spark built-ins so Catalyst keeps pushdown/pruning/codegen.
  */
object CoreQueries {

  /** C1 — TPC-H Q3 shape: 3-way equi-join + agg + top-k. The customer filter
    * is applied before the join so the scan prunes; at scale AQE picks
    * broadcast for the filtered customer side.
    *
    * Bench note (round 9, the watch-list item): of the ~0.9 s sf0.1
    * median, 0.30 s is the bare lineitem scan + partial aggregate
    * (measured in isolation) and most of the rest is AQE's RUNTIME
    * broadcast build of the ~15 MB lineitem side — a legitimate choice at
    * this scale (it is under the threshold) that a static `broadcast()`
    * of the segment-filtered c⋈o side would beat here (~0.55 s measured)
    * but would OOM at 100 TB, where c⋈o is ~1/5 of orders and AQE
    * correctly falls back to sort-merge. The declarative form is kept so
    * the planner re-decides per scale; the gap vs the 0.05 s in-memory
    * comparator is the job floor + broadcast build, not a plan defect.
    */
  def c1(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(10)
  }

  /** C2 — anti + semi join in one tagged output. */
  def c2(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select("c_custkey")
    val o = Tables.orders(s, d)
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_orders").as("tag"))
    val semi = c.join(o.filter(col("o_orderstatus") === "F"),
                      col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_f_order").as("tag"))
    anti.unionByName(semi).orderBy("tag", "c_custkey")
  }

  /** C3 — broadcast dimension joins: customers per region name. */
  def c3(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(count(lit(1)).as("n_customers"))
      .orderBy("r_name")

  /** C4 — rollup + grouping id, via the SQL entry path (the DataFrame-API
    * `rollup` after a join trips Spark 4.1's ambiguous-self-join guard).
    * NULL subtotal rows are coalesced to 'ALL' so ordering and hashing are
    * engine-neutral.
    */
  def c4(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("c4_customer")
    Tables.nation(s, d).createOrReplaceTempView("c4_nation")
    s.sql(
      """SELECT coalesce(n_name, 'ALL') AS nation,
        |       coalesce(c_mktsegment, 'ALL') AS segment,
        |       count(1) AS n,
        |       CAST(grouping_id() AS BIGINT) AS gid
        |FROM c4_customer JOIN c4_nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY nation, segment, gid, n""".stripMargin)
  }

  /** C5 — window frames: lag/lead + running sum per customer. */
  def c5(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_custkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
      col("o_orderkey"),
      lag("o_totalprice", 1).over(w).as("prev_price"),
      lead("o_totalprice", 1).over(w).as("next_price"),
      round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
        .as("running_total"))
      .orderBy("o_custkey", "o_date", "o_orderkey")
  }

  /** C6 — set operations with a tag column. */
  def c6(s: SparkSession, d: String): DataFrame = {
    val sk = Tables.supplier(s, d).select(col("s_suppkey").as("k"))
    val ck = Tables.customer(s, d).select(col("c_custkey").as("k"))
    sk.intersect(ck).withColumn("op", lit("intersect"))
      .unionByName(sk.except(ck).withColumn("op", lit("except")))
      .unionByName(sk.union(ck).distinct().withColumn("op", lit("union")))
      .select("op", "k").orderBy("op", "k")
  }

  /** C7a — scalar string/math functions on part. */
  def c7Scalar(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      lower(col("p_brand")).as("brand_lc"),
      substring(col("p_type"), 1, 5).as("type5"),
      regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
      round(col("p_retailprice") * 1.1, 2).as("price_inc"))
      .orderBy("p_partkey", "brand_lc", "type5", "first_word", "price_inc")

  /** C7b — date truncation + monthly aggregate on orders. */
  def c7Date(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("month")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_join_agg_topk" -> (c1 _),
    "c2_semi_anti" -> (c2 _),
    "c3_broadcast_dims" -> (c3 _),
    "c4_rollup" -> (c4 _),
    "c5_window_frames" -> (c5 _),
    "c6_set_ops" -> (c6 _),
    "c7_scalar_fns" -> (c7Scalar _),
    "c7_date_fns" -> (c7Date _),
  )

  val oracle: Map[String, String] = Map(
    "c1_join_agg_topk" ->
      """SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "c2_semi_anti" ->
      """SELECT c_custkey, 'no_orders' AS tag FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT c_custkey, 'has_f_order' AS tag FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY tag, c_custkey""".stripMargin,
    "c3_broadcast_dims" ->
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "c4_rollup" ->
      """SELECT coalesce(n_name, 'ALL') AS nation, coalesce(c_mktsegment, 'ALL') AS segment,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY nation, segment, gid, n""".stripMargin,
    "c5_window_frames" ->
      """SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderkey,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_date, o_orderkey""".stripMargin,
    "c6_set_ops" ->
      """SELECT 'intersect' AS op, k FROM (SELECT s_suppkey AS k FROM supplier INTERSECT SELECT c_custkey FROM customer) t
        |UNION ALL
        |SELECT 'except' AS op, k FROM (SELECT s_suppkey AS k FROM supplier EXCEPT SELECT c_custkey FROM customer) t
        |UNION ALL
        |SELECT 'union' AS op, k FROM (SELECT s_suppkey AS k FROM supplier UNION SELECT c_custkey FROM customer) t
        |ORDER BY op, k""".stripMargin,
    "c7_scalar_fns" ->
      """SELECT p_partkey, lower(p_brand) AS brand_lc, substring(p_type, 1, 5) AS type5,
        |       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |       round(p_retailprice * 1.1, 2) AS price_inc
        |FROM part ORDER BY p_partkey, brand_lc, type5, first_word, price_inc""".stripMargin,
    "c7_date_fns" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
  )
}
