package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._
import scala.util.Random

/** Correctness of the winnowing fingerprint sampler
  * ([[graft.functions.WinnowSpans]]) against an independent in-spec
  * reference implementation, plus the two contracts the scheme is chosen
  * for: the catch guarantee (every duplicated span of >= SpanW+WinnowW-1
  * tokens shares a selected fingerprint between copies) and sub-linear
  * selection density (~2/(w+1) of the stride-1 window stream).
  */
class WinnowSpansSpec extends SparkSpec {
  import spark.implicits._

  private val spanW = DedupQueries.SpanW
  private val winW = DedupQueries.WinnowW

  /** Independent reference: plain-Scala winnowing, MessageDigest md5 (the
    * main path uses commons-codec md5Hex — different code, same digest).
    */
  private def refWinnow(tokens: Seq[String]): Seq[(Long, String)] = {
    if (tokens.length < spanW) return Nil
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = tokens.sliding(spanW).map { w =>
      md.reset()
      val d = md.digest(w.mkString(" ").getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }.toVector
    val nh = hs.length
    val maxj = math.max(nh - winW + 1, 1)
    val wmin = (0 until maxj).map(j => hs.slice(j, math.min(j + winW, nh)).min)
    (0 until nh).flatMap { i =>
      val lo = math.max(i - winW + 1, 0)
      val hi = math.min(i, maxj - 1)
      val mx = wmin.slice(lo, hi + 1).max
      if (mx == hs(i)) Some(((i + 1).toLong, hs(i))) else None
    }
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, Seq[(Long, String)]] =
    DedupQueries.winnowSelect(docs.toDF("doc_id", "text"), spanW, winW)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(identity).toSeq).toMap

  test("matches the independent reference on seeded random docs (incl. length edges)") {
    val rnd = new Random(0x51a0L)
    def tok() = rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString.toLowerCase
    // lengths straddle every clamp: < spanW (empty), spanW..spanW+winW-2
    // (single whole-doc group), exactly spanW+winW-1, and long docs; a
    // small token alphabet forces repeated hashes (min ties)
    val lengths = Seq(3, 7, 8, 9, 12, 14, 15, 16, 40, 120, 300)
    val docs = lengths.zipWithIndex.map { case (n, id) =>
      (id.toLong, Seq.fill(n)(if (rnd.nextBoolean()) tok() else "a").mkString(" "))
    }
    val got = run(docs)
    docs.foreach { case (id, text) =>
      val want = refWinnow(text.split(" ").filter(_.nonEmpty).toSeq).sortBy(identity)
      assert(got.getOrElse(id, Nil) === want, s"doc $id (${text.take(60)}…)")
    }
  }

  test("catch guarantee: every planted duplicated span of SpanW+WinnowW-1 tokens is shared") {
    val rnd = new Random(0xcafeL)
    val span = spanW + winW - 1 // 15: the minimum guaranteed-catch length
    def filler(n: Int) = Seq.fill(n)(f"f${rnd.nextInt(1 << 30)}%08x")
    val cases = (0 until 40).map { i =>
      val planted = Seq.fill(span)(f"p${rnd.nextInt(1 << 30)}%08x")
      // random placement: start, middle, end of each copy
      val a = filler(rnd.nextInt(60)) ++ planted ++ filler(rnd.nextInt(60))
      val b = filler(rnd.nextInt(60)) ++ planted ++ filler(rnd.nextInt(60))
      (2L * i, a.mkString(" "), 2L * i + 1, b.mkString(" "))
    }
    val docs = cases.flatMap(c => Seq((c._1, c._2), (c._3, c._4)))
    val got = run(docs)
    cases.foreach { case (ia, _, ib, _) =>
      val shared = got.getOrElse(ia, Nil).map(_._2).toSet
        .intersect(got.getOrElse(ib, Nil).map(_._2).toSet)
      assert(shared.nonEmpty, s"planted span between docs $ia/$ib not caught")
    }
  }

  test("short exact duplicates (>= spanW tokens) still share the whole-doc group min") {
    // 10 tokens: nh = 3 < winW, one clamped whole-doc group — the min is
    // selected, so byte-identical short docs are still catchable
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = run(Seq((0L, text), (1L, text)))
    val shared = got(0L).map(_._2).toSet.intersect(got(1L).map(_._2).toSet)
    assert(shared.nonEmpty)
  }

  test("winnowed stream is a subset of the stride-1 window stream, at ~2/(w+1) density") {
    val d = sf()
    val all = DedupQueries.spanWindows(spark, d)
      .select("doc_id", "start", "span_md5").as[(Long, Long, String)]
      .collect().toSet
    val sel = DedupQueries.winnowedWindows(spark, d)
      .select("doc_id", "start", "span_md5").as[(Long, Long, String)]
      .collect()
    assert(sel.toSet.subsetOf(all))
    // the emitted-row bound the scheme is FOR: <= 2·windows/w (expected
    // density 2/(w+1) ≈ 0.222 on md5-random hashes; the fixture is
    // deterministic so this pins, not flakes)
    val density = sel.length.toDouble / all.size
    assert(density <= 2.0 / winW, s"density $density (${sel.length}/${all.size})")
    assert(density >= 1.0 / (winW + 1), s"suspiciously sparse: $density")
  }
}
