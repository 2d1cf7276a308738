package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build-time installation path: one `withExtensions(new GraftExtensions)`
  * must provide the whole graft surface — optimizer rule + every custom
  * function — with zero per-session register calls.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("withExtensions installs optimizer rule and all custom functions") {
    val base = spark // force the shared session (and its SparkContext) up
    try {
      // inside the try so a failed build still restores the shared session
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s2 = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base) // a genuinely new session, same SparkContext
      // every custom function resolves in plain SQL, no register() calls
      val row = s2.sql(
        """SELECT
          |  cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs,
          |  bitset_intersect(map(0L, 3L), map(0L, 1L)) AS bi,
          |  hll_estimate(hll_sketch(x)) AS est,
          |  cms_query(cms_sketch(x, 5, 64), 2L) AS freq
          |FROM VALUES (1L), (2L), (2L) AS t(x)""".stripMargin).head()
      assert(row.getDouble(0) === 1.0)
      assert(row.getLong(1) === 1L)
      assert(row.getLong(2) === 2L)
      assert(row.getLong(3) === 2L)
      // cms_merge resolves too (separate query: aggregates can't nest)
      val merged = s2.sql(
        """SELECT cms_query(cms_merge(sk, 5, 64), 2L) AS freq FROM (
          |  SELECT cms_sketch(x, 5, 64) AS sk
          |  FROM VALUES (1L), (2L), (2L) AS t(x) GROUP BY x % 2)""".stripMargin).head()
      assert(merged.getLong(0) === 2L)
      // the bloom family resolves: agg + merge + contains, no register()
      val bloomed = s2.sql(
        """SELECT bloom_contains(bloom_merge(f, 65536, 7), 2L) AS hit,
          |       bloom_contains(bloom_merge(f, 65536, 7), 999L) AS miss
          |FROM (SELECT bloom_agg(x, 65536, 7) AS f
          |      FROM VALUES (1L), (2L), (2L) AS t(x) GROUP BY x % 2)""".stripMargin).head()
      assert(bloomed.getBoolean(0) === true)
      assert(bloomed.getBoolean(1) === false)
      // the optimizer rule is active at build time: a constant-false unpivot
      // branch is pruned from Expand
      import s2.implicits._
      val df = Seq((1L, 10.0, 20.0)).toDF("id", "a", "b")
        .unpivot(Array(col("id")), Array(col("a"), col("b")), "m", "v")
        .filter(col("m") === "a")
      assert(df.count() === 1)
      val expandLine = df.queryExecution.optimizedPlan.treeString
        .linesIterator.find(_.contains("Expand"))
      // the Expand node must exist (else this pin checks nothing) and the
      // pruned branch's column must be gone from its projections
      assert(expandLine.isDefined, df.queryExecution.optimizedPlan.treeString)
      assert(!expandLine.get.contains("b#"), expandLine.get)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
      // do NOT stop s2 — it shares the one SparkContext with every suite
    }
  }
}
