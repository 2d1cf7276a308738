package graft

import graft.operators.Sessionize
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class Doc(doc_id: Long, text: String)
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Structured Streaming twins vs their batch analogs (SURVEY.md §5.5):
  * the same transform fed by MemoryStream must agree with the batch frame,
  * and `session_window` must agree with the batch Sessionize operator.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Long): Timestamp = new Timestamp(1704067200000L + min * 60000L)

  private val evs = Seq(
    Ev(0, t(0), 1, "view", 1.0), Ev(1, t(5), 1, "view", 2.0),
    Ev(2, t(50), 1, "click", 3.0),                    // gap 45min -> new session
    Ev(3, t(65), 2, "view", 4.0), Ev(4, t(70), 2, "view", 4.0),
    Ev(5, t(200), 2, "purchase", 5.0),                // gap 130min -> new session
    Ev(6, t(10), 3, "view", 1.0), Ev(7, t(10), 3, "view", 1.0)) // dup triple

  private def runStream(transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        mode: String): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"out_${System.nanoTime()}"
    val q = transform(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try {
      // feed in event-time order so nothing is late w.r.t. the watermark
      val ordered = evs.sortBy(_.ts.getTime)
      mem.addData(ordered.take(5))
      q.processAllAvailable()
      mem.addData(ordered.drop(5))
      q.processAllAvailable()
      // two far-future sentinels push the watermark past every real window
      mem.addData(Seq(Ev(98, t(10000), 99, "sentinel", 0.0)))
      q.processAllAvailable()
      mem.addData(Seq(Ev(99, t(20000), 99, "sentinel", 0.0)))
      q.processAllAvailable()
      spark.table(name).filter($"user_id" =!= 99 || lit(mode) === "complete").collect().toSeq
    } finally q.stop()
  }

  test("streaming tumbling counts match the batch analog") {
    val batch = Streams.tumblingCounts(evs.toDF())
      .orderBy("win_start", "event_type").collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.tumblingCounts(mem.toDF()).writeStream
      .format("memory").queryName("tumb").outputMode("complete").start()
    try {
      mem.addData(evs); q.processAllAvailable()
      val got = spark.table("tumb").orderBy("win_start", "event_type").collect().toSeq
      assert(got === batch)
    } finally q.stop()
  }

  test("streaming session_window matches batch Sessionize session counts") {
    // batch twin: per-user sorted multiset of session sizes
    val batchSizes = Sessionize(evs.toDF(), "user_id", "ts", 1800L, "event_id")
      .groupBy("user_id", "session_id").agg(count(lit(1)).as("n_events"))
      .groupBy("user_id").agg(sort_array(collect_list("n_events")).as("sizes"))
      .orderBy("user_id").as[(Long, Seq[Long])].collect().toSeq

    val rows = runStream(df => Streams.sessionCounts(df, "30 minutes", "0 seconds"), "append")
    val streamed = rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
      .groupBy(_._1).map { case (u, xs) => (u, xs.map(_._2).sorted.toSeq) }
      .toSeq.sortBy(_._1)
    assert(streamed === batchSizes)
  }

  test("streaming dropDuplicates dedups the duplicate triple") {
    val rows = runStream(df => Streams.dedupEvents(df, "0 seconds"), "append")
    // user 3 emitted twice with identical (user_id, event_type, value)
    assert(rows.count(_.getAs[Long]("user_id") == 3L) === 1)
    assert(rows.count(_.getAs[Long]("user_id") == 1L) === 3)
  }

  test("watermark drops events arriving behind the advanced watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.sessionCounts(mem.toDF(), "30 minutes", "0 seconds")
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    try {
      mem.addData(Seq(Ev(0, t(0), 1, "view", 1.0), Ev(1, t(500), 2, "view", 1.0)))
      q.processAllAvailable() // watermark advances to t(500) after this batch
      mem.addData(Seq(Ev(2, t(5), 3, "view", 1.0))) // behind watermark -> dropped
      q.processAllAvailable()
      mem.addData(Seq(Ev(3, t(1000), 9, "s", 0.0), Ev(4, t(2000), 9, "s", 0.0)))
      q.processAllAvailable()
      mem.addData(Seq(Ev(5, t(3000), 9, "s", 0.0)))
      q.processAllAvailable()
      val users = spark.table("late").select("user_id").as[Long].collect().toSet
      assert(users.contains(1L) && !users.contains(3L))
    } finally q.stop()
  }

  test("file-source stream (readStream.parquet) matches batch tumbling counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val src = Tables.events(spark, sf()).limit(300)
    src.write.parquet(s"$dir/in")
    val batch = Streams.tumblingCounts(spark.read.parquet(s"$dir/in"))
      .orderBy("win_start", "event_type").collect().toSeq
    val schema = spark.read.parquet(s"$dir/in").schema
    val q = Streams.tumblingCounts(spark.readStream.schema(schema).parquet(s"$dir/in"))
      .writeStream.format("memory").queryName("file_tumb").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_tumb").orderBy("win_start", "event_type").collect().toSeq
      assert(got === batch)
    } finally q.stop()
  }

  test("streaming parquet sink with checkpoint lands exactly the input rows") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-stream").toString
    val mem = MemoryStream[Ev]
    val q = mem.toDF().writeStream
      .format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .start()
    try {
      mem.addData(evs.take(4)); q.processAllAvailable()
      mem.addData(evs.drop(4)); q.processAllAvailable()
      val landed = spark.read.parquet(s"$dir/out")
      assert(landed.count() === evs.size)
      assert(landed.select("event_id").as[Long].collect().sorted.toSeq ===
        evs.map(_.event_id).sorted)
    } finally q.stop()
  }

  test("foreachBatch drives the idempotent TableSink from a stream") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-feb").toString
    val mem = MemoryStream[Ev]
    // the aggregate lives in STREAM state (complete mode emits total counts
    // per window), so a window whose events span micro-batches still lands
    // with its full count — aggregating inside foreachBatch and overwriting
    // per batch would silently drop the earlier batches' contribution.
    // overwriteWindow then makes the landing idempotent per window.
    val counts = mem.toDF()
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("win"),
               col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.sinks.TableSink.overwriteWindow(batch, s"$dir/out", "win")
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      // deliberately split the SAME hour across two micro-batches
      mem.addData(evs.take(2)); q.processAllAvailable()
      mem.addData(evs.drop(2)); q.processAllAvailable()
      val landed = spark.read.parquet(s"$dir/out")
      val expected = evs.groupBy(e =>
        (java.time.Instant.ofEpochMilli(e.ts.getTime).toString.take(13), e.event_type))
        .view.mapValues(_.size.toLong).toMap
      assert(landed.count() === expected.size)
      assert(landed.agg(sum("n")).head().getLong(0) === evs.size.toLong,
        "cross-batch windows must land with their full counts")
    } finally q.stop()
  }

  test("foreachBatch streaming-ingest dedup equals the batch dedup_incremental") {
    // the rolling-ingest deployment shape: the corpus band table is STORED
    // state (checkpointed once), each micro-batch of incoming docs signs
    // only its own rows and joins the stored bands — new×corpus candidates
    // only, exactly like the batch query. Split the incoming docs across
    // TWO micro-batches to prove batch boundaries don't change the pair set.
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val (k, r) = (16, 4)
    val docs = Tables.documents(spark, sf())
    val corpusToks = Dedup.distinctTokenRows(
      docs.filter($"doc_id" < 400), "doc_id", "text").localCheckpoint(true)
    val corpusBands = Dedup.minhashBands(
      Dedup.minhashSignatures(corpusToks, "doc_id", k), "doc_id", k, r)
      .localCheckpoint(true)

    val incoming = docs.filter($"doc_id" >= 400).select("doc_id", "text")
      .as[Doc].collect().sortBy(_.doc_id)
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val mem = MemoryStream[Doc]
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val toksNew = Dedup.distinctTokenRows(batch, "doc_id", "text")
        val bandsNew = Dedup.minhashBands(
          Dedup.minhashSignatures(toksNew, "doc_id", k), "doc_id", k, r)
        val cand = Dedup.lshCrossCandidatePairs(bandsNew, corpusBands, "doc_id", k / r)
        val parts = cand.select($"a".as("doc_id"))
          .union(cand.select($"b".as("doc_id"))).distinct()
        val toks = toksNew.unionByName(corpusToks).join(parts, Seq("doc_id"), "left_semi")
        val pairs = Dedup.jaccardVerifyBitset(cand, toks, "doc_id")
          .filter($"jaccard" >= 0.7)
          .select($"a", $"b", round($"jaccard", 4).as("j"))
          .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
        got.synchronized { got ++= pairs }
        ()
      }
      .start()
    try {
      val (first, second) = incoming.splitAt(incoming.length / 2)
      mem.addData(first); q.processAllAvailable()
      mem.addData(second); q.processAllAvailable()
    } finally q.stop()

    val expected = graft.queries.DedupQueries.defs("dedup_incremental")(spark, sf())
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(got.toSet === expected,
      s"streaming pairs ${got.size} != batch pairs ${expected.size}")
  }

  test("streaming CDC chunking equals batch: content-defined cuts are batch-boundary-free") {
    // cdcChunks is a stateless per-row map, so a streaming ingest must
    // produce the identical chunk rows no matter how docs split across
    // micro-batches — the property that lets the chunk census run as a
    // rolling ingest (per-batch chunk rows appended, census incrementally
    // refreshed) with zero reprocessing
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    val source = Tables.documents(spark, sf()).filter($"doc_id" < 100)
    val docs = source.select("doc_id", "text").as[Doc].collect().sortBy(_.doc_id)
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    val mem = MemoryStream[Doc]
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = Dedup.cdcChunks(batch, "doc_id", "text")
          .select($"doc_id", $"chunk_idx", $"chunk_md5")
          .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
        got.synchronized { got ++= rows }
        ()
      }.start()
    try {
      val (first, second) = docs.splitAt(docs.length / 2)
      mem.addData(first); q.processAllAvailable()
      mem.addData(second); q.processAllAvailable()
    } finally q.stop()
    val expected = Dedup.cdcChunks(source, "doc_id", "text")
      .select($"doc_id", $"chunk_idx", $"chunk_md5")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
    assert(got.size === expected.size, "duplicate or missing chunk emissions")
    assert(got.toSet === expected)
  }

  test("stream-stream interval join matches its batch analog") {
    val clicks = Seq(
      Ev(10, t(50), 1, "click", 0.0),   // joins user 1's view at t(40) only
      Ev(11, t(200), 2, "click", 0.0))  // user 2's view at t(10) is too old
    val views = Seq(
      Ev(20, t(0), 1, "view", 1.0), Ev(21, t(40), 1, "view", 2.0),
      Ev(22, t(10), 2, "view", 3.0))
    val batch = Streams.clicksWithRecentViews(clicks.toDF(), views.toDF())
      .orderBy("click_id", "v_ts").collect().toSeq
    assert(batch.map(r => (r.getAs[Long]("click_id"), r.getAs[Double]("view_value")))
      === Seq((10L, 2.0)))

    implicit val sqlCtx = spark.sqlContext
    val memC = MemoryStream[Ev]
    val memV = MemoryStream[Ev]
    val q = Streams.clicksWithRecentViews(memC.toDF(), memV.toDF())
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      memV.addData(views)
      q.processAllAvailable()
      memC.addData(clicks)
      q.processAllAvailable()
      val got = spark.table("ssj").orderBy("click_id", "v_ts").collect().toSeq
      assert(got === batch)
    } finally q.stop()
  }

  test("outer interval join: null-padded rows emit only after the watermark passes") {
    val clicks = Seq(
      Ev(10, t(50), 1, "click", 0.0),   // matches user 1's view at t(40)
      Ev(11, t(200), 2, "click", 0.0))  // user 2's view at t(10) is too old -> unmatched
    val views = Seq(
      Ev(20, t(0), 1, "view", 1.0), Ev(21, t(40), 1, "view", 2.0),
      Ev(22, t(10), 2, "view", 3.0))
    // batch analog: the unmatched click emits null-padded immediately
    val batch = Streams.clicksWithRecentViewsOuter(clicks.toDF(), views.toDF())
      .orderBy("click_id", "v_ts").collect().toSeq
    assert(batch.map(r => (r.getAs[Long]("click_id"), Option(r.get(2)))) ===
      Seq((10L, Some(2.0)), (11L, None)))

    implicit val sqlCtx = spark.sqlContext
    val memC = MemoryStream[Ev]
    val memV = MemoryStream[Ev]
    val q = Streams.clicksWithRecentViewsOuter(memC.toDF(), memV.toDF())
      .writeStream.format("memory").queryName("ssjo").outputMode("append").start()
    try {
      memV.addData(views)
      memC.addData(clicks)
      q.processAllAvailable()
      // the unmatched click is neither dropped nor emitted early: with the
      // watermark still behind t(200), a matching view could yet arrive, so
      // only the matched row is out and click 11 sits in the join state
      val early = spark.table("ssjo").collect().toSeq
      assert(early.map(_.getAs[Long]("click_id")) === Seq(10L),
        s"unmatched click must be held until the watermark proves absence, got $early")
      // advance BOTH watermarks (the global watermark is their min) far past
      // t(200) + within: absence is now proven -> null-padded emission
      memV.addData(Seq(Ev(98, t(10000), 99, "view", 0.0)))
      memC.addData(Seq(Ev(99, t(10000), 99, "click", 0.0)))
      q.processAllAvailable()
      memV.addData(Seq(Ev(96, t(20000), 99, "view", 0.0)))
      memC.addData(Seq(Ev(97, t(20000), 99, "click", 0.0)))
      q.processAllAvailable()
      val got = spark.table("ssjo").filter($"user_id" =!= 99)
        .orderBy("click_id", "v_ts").collect().toSeq
      assert(got === batch)
      val late = got.find(_.getAs[Long]("click_id") == 11L).get
      assert(late.isNullAt(2) && late.isNullAt(3),
        s"late emission must be null-padded on the view side, got $late")
    } finally q.stop()
  }

  test("interval join DROPS late rows at the watermark and reports the count") {
    // the other half of watermark semantics: eviction is pinned elsewhere;
    // here a row arriving BEHIND the watermark must be discarded pre-join
    // — and the discard must be observable in stateOperators'
    // numRowsDroppedByWatermark, the metric a production monitor alarms on
    // (silent late-data loss is how a 100 TB/day pipeline quietly
    // undercounts)
    implicit val sqlCtx = spark.sqlContext
    val memC = MemoryStream[Ev]
    val memV = MemoryStream[Ev]
    val q = Streams.clicksWithRecentViewsOuter(memC.toDF(), memV.toDF())
      .writeStream.format("memory").queryName("ssjl").outputMode("append").start()
    def drops(): Long =
      q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
    try {
      memV.addData(Seq(Ev(20, t(40), 1, "view", 2.0)))
      memC.addData(Seq(Ev(10, t(50), 1, "click", 0.0)))
      q.processAllAvailable()
      // push BOTH sides' watermarks (the global one is their min) far past
      // the first batch, so t(30) is now provably late
      memV.addData(Seq(Ev(98, t(10000), 99, "view", 0.0)))
      memC.addData(Seq(Ev(99, t(10000), 99, "click", 0.0)))
      q.processAllAvailable()
      val before = drops()
      // a late view that WOULD have matched click 10 (t(50) - 30min <=
      // t(30) <= t(50)) had it arrived on time
      memV.addData(Seq(Ev(30, t(30), 1, "view", 7.0)))
      q.processAllAvailable()
      assert(drops() - before >= 1L,
        s"late view not counted in numRowsDroppedByWatermark (before=$before, after=${drops()})")
      // and it must NOT have joined: no output row carries its value
      assert(spark.table("ssjl").filter($"view_value" === 7.0).isEmpty,
        "late view leaked into the join output despite the watermark")
    } finally q.stop()
  }

  test("stream-static broadcast enrichment matches the batch join, stateless") {
    val dims = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val batch = Streams.enriched(evs.toDF(), dims)
      .select($"event_id", $"tier").orderBy("event_id").collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.enriched(mem.toDF(), dims).writeStream
      .format("memory").queryName("enrich").outputMode("append").start()
    try {
      mem.addData(evs)
      q.processAllAvailable()
      val got = spark.table("enrich")
        .select($"event_id", $"tier").orderBy("event_id").collect().toSeq
      assert(got === batch)
      // user 3 has no dim row -> left join keeps it null-padded
      assert(got.filter(_.getLong(0) == 6L).head.isNullAt(1))
      // stream-static involves NO state store (nothing to watermark/evict)
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("watermark actually evicts window state (bounded state at scale)") {
    // 100 events in distinct hours: without eviction the state store would
    // hold all 100 windows; with a 2h watermark trailing the max event time,
    // finalized windows must leave the store. This is the mechanism that
    // bounds state at 100 TB/day — asserted, not assumed.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.tumblingCounts(mem.toDF()).writeStream
      .format("memory").queryName("evict").outputMode("append").start()
    try {
      for (batch <- 0 until 4) {
        mem.addData((0 until 25).map { i =>
          val h = batch * 25 + i
          Ev(h.toLong, t(h * 60L), 1, "view", 1.0)
        })
        q.processAllAvailable()
      }
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty, "windowed agg must report a state operator")
      val rows = state.map(_.numRowsTotal).sum
      // watermark = max(ts) - 2h: only the last ~3 unfinalized windows may
      // remain; 100 retained rows would mean eviction never happened
      assert(rows <= 10, s"state store holds $rows rows — watermark not evicting")
      // and the finalized windows were emitted downstream, not dropped
      assert(spark.table("evict").count() >= 90)
    } finally q.stop()
  }

  test("sliding windows assign each event to width/slide windows") {
    val batch = Streams.slidingCounts(evs.toDF(), "1 hour", "30 minutes")
    // every event lands in exactly 2 sliding windows
    val total = batch.agg(sum("n")).as[Long].head()
    assert(total === evs.size * 2L)
  }
}
