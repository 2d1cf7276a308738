package graft

import graft.pipeline.TrendsPipeline
import graft.sources.TrendsSource
import graft.sources.TrendsSource.{Fetcher, Interest}

/** Source adapter: retry behavior, explicit schema, and composition with
  * the pipeline (fetch -> transform -> rank as one flow).
  */
class TrendsSourceSpec extends SparkSpec {

  private val terms = TrendsPipeline.DefaultTerms

  private class FlakyFetcher(failures: Int) extends Fetcher {
    var calls = 0
    override def fetch(t: Seq[String], ws: String, we: String): Seq[Interest] = {
      calls += 1
      if (calls <= failures) throw new RuntimeException(s"transient #$calls")
      Seq(Interest("Atlantis", Seq(10L, 40L, 40L, 5L, 0L)),
          Interest("Flatland", Seq(3L, 3L, 3L, 3L, 3L)))
    }
  }

  test("fetcher source retries transient failures then yields the wide schema") {
    val fetcher = new FlakyFetcher(failures = 3)
    val wide = TrendsSource.fromFetcher(spark, fetcher, terms, "2024-01-01", "2024-01-07")
    assert(fetcher.calls === 4)
    assert(wide.schema === TrendsSource.wideSchema(terms))
    assert(wide.count() === 2)
  }

  test("retry budget exhaustion surfaces the last error") {
    val e = intercept[RuntimeException] {
      TrendsSource.fromFetcher(spark, new FlakyFetcher(failures = 100), terms,
        "2024-01-01", "2024-01-07", retries = 2)
    }
    assert(e.getMessage.contains("after 2 retries"))
  }

  test("source composes with the pipeline end-to-end") {
    val wide = TrendsSource.fromFetcher(spark, new FlakyFetcher(0), terms,
      "2024-01-01", "2024-01-07")
    val out = TrendsPipeline.run(wide, "2024-01-01", "2024-01-07")
    // Flatland dropped (all-equal), Atlantis ranked 1..5
    assert(out.count() === 5)
  }
}
