package graft.pipeline

import graft.Sessions
import graft.sinks.TableSink
import graft.sources.TrendsSource
import org.apache.spark.sql.SparkSession

import java.time.LocalDate

/** The schedulable artifact for the weekly trends job — the analog of the
  * reference's two DAG entry points (EP1 weekly:
  * `/root/reference/dags/google_trends_to_bigquery.py:162-196`, EP2
  * backfill: `google_trends_to_bigquery historical.py:18-20` where the week
  * is pinned by hand). One binary, the week window is a parameter: absent
  * `--week-start/--week-end` it defaults to the previous full Mon–Sun week
  * (ref `get_previous_week_dates`, `:19-28`), present it is the historical
  * backfill.
  *
  * A user submits this with `spark-submit --class graft.pipeline.TrendsJob`;
  * the library surface (`TrendsSource` → `TrendsPipeline.run` → `TableSink`)
  * stays importable for everything else.
  *
  * Sink modes: `overwrite` (default) is [[TableSink.overwriteWindow]] on
  * `week_start` — re-running a week replaces exactly that week's partition
  * (the idempotent mode a production deployment wants); `append` is the
  * reference's bit-parity `WRITE_APPEND` (re-runs duplicate, ref `:146-159`).
  */
object TrendsJob {

  final case class Config(
      input: String = "",
      out: String = "",
      weekStart: Option[String] = None,
      weekEnd: Option[String] = None,
      terms: Seq[String] = TrendsPipeline.DefaultTerms,
      mode: String = "overwrite",
      // live-mode fetch retry budget (ref `TrendReq(retries=20)`)
      retries: Int = 20)

  def parse(args: Array[String]): Config = {
    def loop(rest: List[String], cfg: Config): Config = rest match {
      case "--input" :: v :: t      => loop(t, cfg.copy(input = v))
      case "--out" :: v :: t        => loop(t, cfg.copy(out = v))
      case "--week-start" :: v :: t => loop(t, cfg.copy(weekStart = Some(v)))
      case "--week-end" :: v :: t   => loop(t, cfg.copy(weekEnd = Some(v)))
      case "--terms" :: v :: t      => loop(t, cfg.copy(terms = v.split(",").toSeq))
      case "--mode" :: v :: t       => loop(t, cfg.copy(mode = v))
      case "--retries" :: v :: t    => loop(t, cfg.copy(retries = v.toInt))
      case Nil                      => cfg
      case bad :: _ => throw new IllegalArgumentException(
        s"unknown argument '$bad'; expected --input --out " +
          "[--week-start --week-end] [--terms a,b,c] [--mode overwrite|append] " +
          "[--retries n]")
    }
    val cfg = loop(args.toList, Config())
    require(cfg.input.nonEmpty && cfg.out.nonEmpty, "--input and --out are required")
    require(cfg.mode == "overwrite" || cfg.mode == "append",
      s"--mode must be overwrite or append, got '${cfg.mode}'")
    require(cfg.weekStart.isDefined == cfg.weekEnd.isDefined,
      "--week-start and --week-end must be given together (or neither)")
    cfg
  }

  /** Resolve the week window: explicit args = backfill (EP2), none = the
    * previous full Mon–Sun week relative to `today` (EP1).
    */
  def resolveWeek(cfg: Config, today: LocalDate): (String, String) =
    (cfg.weekStart, cfg.weekEnd) match {
      case (Some(ws), Some(we)) => (ws, we)
      case _                    => TrendsPipeline.previousWeek(today)
    }

  /** The whole job as a function of (session, config, source) — `main` minus
    * arg parsing and session construction, so tests and schedulers can call
    * it directly. `fetcher` plugs a live API source in front of the
    * file-drop input (the reference's pytrends pull); absent, `--input` is
    * read as parquet (or csv by extension).
    */
  def execute(spark: SparkSession, cfg: Config,
              fetcher: Option[TrendsSource.Fetcher] = None,
              // UTC, like every timestamp in the engine — the JVM default
              // zone would shift the resolved week near midnight boundaries
              today: LocalDate = LocalDate.now(java.time.ZoneOffset.UTC)): (String, String) = {
    val (ws, we) = resolveWeek(cfg, today)
    val wide = fetcher match {
      // the retry budget wraps HERE, at the job boundary, so a scheduler
      // plugging a raw HTTP fetcher gets the reference's retries=20
      // semantics without knowing about the decorator
      case Some(f) => TrendsSource.fromFetcher(spark,
        new TrendsSource.RetryingFetcher(f, cfg.retries), cfg.terms, ws, we)
      case None if cfg.input.endsWith(".csv") =>
        TrendsSource.fromCsv(spark, cfg.input, cfg.terms)
      case None => TrendsSource.fromParquet(spark, cfg.input, cfg.terms)
    }
    val ranked = TrendsPipeline.run(wide, ws, we, cfg.terms)
    cfg.mode match {
      case "append" => TableSink.append(ranked, cfg.out, Some("week_start"))
      case _        => TableSink.overwriteWindow(ranked, cfg.out, "week_start")
    }
    (ws, we)
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    val spark = Sessions.withGraftConf(SparkSession.builder()
      .appName("graft-trends-weekly"))
      .getOrCreate()
    try {
      val (ws, we) = execute(spark, cfg)
      println(s"trends job wrote week [$ws, $we] to ${cfg.out} (mode=${cfg.mode})")
    } finally spark.stop()
  }
}
