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

  test("retrying decorator follows the urllib3 backoff schedule then succeeds") {
    val inner = new FlakyFetcher(failures = 3)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val f = new TrendsSource.RetryingFetcher(inner, retries = 20,
      backoffFactorMs = 100L, sleeper = sleeps += _)
    val rows = f.fetch(terms, "2024-01-01", "2024-01-07")
    assert(inner.calls === 4)
    assert(rows.map(_.country) === Seq("Atlantis", "Flatland"))
    // backoff_factor * 2^(attempt-1): 100, 200, 400
    assert(sleeps.toSeq === Seq(100L, 200L, 400L))
  }

  test("decorator exhaustion rethrows the LAST inner error as cause") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val f = new TrendsSource.RetryingFetcher(new FlakyFetcher(100), retries = 2,
      backoffFactorMs = 100L, sleeper = sleeps += _)
    val e = intercept[RuntimeException] {
      f.fetch(terms, "2024-01-01", "2024-01-07")
    }
    assert(e.getMessage.contains("after 2 retries"))
    assert(e.getCause.getMessage === "transient #3")
    // no sleep after the final (budget-exhausting) failure
    assert(sleeps.toSeq === Seq(100L, 200L))
  }

  test("backoff is capped and a zero factor (reference default) never sleeps") {
    val capped = new TrendsSource.RetryingFetcher(new FlakyFetcher(0),
      backoffFactorMs = 1000L, maxBackoffMs = 3000L)
    assert(capped.backoffMs(1) === 1000L)
    assert(capped.backoffMs(2) === 2000L)
    assert(capped.backoffMs(3) === 3000L)  // capped, not 4000
    assert(capped.backoffMs(60) === 3000L) // deep attempts can't overflow
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val noBackoff = new TrendsSource.RetryingFetcher(new FlakyFetcher(5),
      retries = 20, sleeper = sleeps += _)
    noBackoff.fetch(terms, "2024-01-01", "2024-01-07")
    assert(sleeps.isEmpty)
  }

  test("fromFetcher does not stack a second budget on an already-retrying fetcher") {
    val inner = new FlakyFetcher(failures = 2)
    val decorated = new TrendsSource.RetryingFetcher(inner, retries = 1)
    val e = intercept[RuntimeException] {
      // default retries=20 here must NOT override the decorator's budget of 1
      TrendsSource.fromFetcher(spark, decorated, terms, "2024-01-01", "2024-01-07")
    }
    assert(e.getMessage.contains("after 1 retries"))
    assert(inner.calls === 2)
  }

  test("source composes with the pipeline end-to-end") {
    val wide = TrendsSource.fromFetcher(spark, new FlakyFetcher(0), terms,
      "2024-01-01", "2024-01-07")
    val out = TrendsPipeline.run(wide, "2024-01-01", "2024-01-07")
    // Flatland dropped (all-equal), Atlantis ranked 1..5
    assert(out.count() === 5)
  }
}
