package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Engine-test surface that is not oracle-checkable (SURVEY.md §2c tail):
  * approx_count_distinct accuracy, and custom state via
  * flatMapGroupsWithState (running per-user event counter).
  */
class StatefulStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct tracks exact distinct within rsd") {
    val ev = Tables.events(spark, sf("sf0.01"))
    val (exact, approx) = ev
      .agg(countDistinct("user_id").cast("double"),
           approx_count_distinct("user_id", 0.05).cast("double"))
      .as[(Double, Double)].head()
    assert(math.abs(approx - exact) / exact < 0.15)
  }

  test("flatMapGroupsWithState keeps running per-user counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val counted = mem.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + evs.size
          state.update(total)
          Iterator((user, total))
      }.toDF("user_id", "running_total")
    val q = counted.writeStream.format("memory")
      .queryName("fmgs").outputMode("append").start()
    try {
      def t(min: Long) = new Timestamp(1704067200000L + min * 60000L)
      mem.addData(Seq(Ev(0, t(0), 1, "view", 1.0), Ev(1, t(1), 1, "view", 1.0),
                      Ev(2, t(2), 2, "view", 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(Ev(3, t(3), 1, "click", 1.0)))
      q.processAllAvailable()
      val rows = spark.table("fmgs")
        .groupBy("user_id").agg(max("running_total").as("m"))
        .as[(Long, Long)].collect().toMap
      assert(rows(1L) === 3L) // state carried across the two batches
      assert(rows(2L) === 1L)
    } finally q.stop()
  }

  test("transformWithState folds per-user profiles across batches (RocksDB store)") {
    implicit val sqlCtx = spark.sqlContext
    // the arbitrary-state API requires the RocksDB provider; scope the
    // session conf to this test and restore the default after
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Ev]
    val q = graft.streaming.Streams.userProfiles(mem.toDF())
      .writeStream.format("memory").queryName("tws").outputMode("update").start()
    try {
      def t(min: Long) = new Timestamp(1704067200000L + min * 60000L)
      mem.addData(Seq(Ev(0, t(0), 1, "view", 2.0), Ev(1, t(1), 1, "click", 5.0),
                      Ev(2, t(2), 2, "view", 3.0)))
      q.processAllAvailable()
      mem.addData(Seq(Ev(3, t(3), 1, "purchase", 1.0), Ev(4, t(4), 3, "view", 4.0)))
      q.processAllAvailable()
      // Update mode re-emits a user's profile each batch they appear in;
      // the LAST emission per user is the folded state across all batches
      val last = spark.table("tws")
        .groupBy("user_id")
        .agg(max("n_events").as("n"), max("total_value").as("tot"),
             max("max_value").as("mx"))
        .as[(Long, Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(last(1L) === ((3L, 8.0, 5.0)), "user 1 folded across both batches")
      assert(last(2L) === ((1L, 3.0, 3.0)))
      assert(last(3L) === ((1L, 4.0, 4.0)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("event-time timers emit a session exactly once after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Ev]
    // gap 30 min, watermark delay 10 min
    val q = graft.streaming.Streams
      .sessionSummaries(mem.toDF(), gapMs = 30L * 60 * 1000, watermark = "10 minutes")
      .writeStream.format("memory").queryName("tws_sess").outputMode("append").start()
    try {
      def t(min: Long) = new Timestamp(1704067200000L + min * 60000L)
      // batch 1: user 1 has events at minute 0 and 5; user 2 at minute 3
      mem.addData(Seq(Ev(0, t(0), 1, "view", 1.0), Ev(1, t(5), 1, "click", 1.0),
                      Ev(2, t(3), 2, "view", 1.0)))
      q.processAllAvailable()
      assert(spark.table("tws_sess").isEmpty, "no watermark has passed any timeout yet")
      // batch 2: a DIFFERENT user's event at minute 100 pushes the
      // watermark to 90 — past user 1's timeout (5 + 30 = 35) and user
      // 2's (33) — but timers see the previous batch's watermark, so...
      mem.addData(Seq(Ev(3, t(100), 99, "view", 1.0)))
      q.processAllAvailable()
      // ...batch 3 (any data) runs with watermark 90 and fires both timers
      mem.addData(Seq(Ev(4, t(101), 99, "view", 1.0)))
      q.processAllAvailable()
      val out = spark.table("tws_sess")
        .as[graft.streaming.SessionSummary].collect()
        .map(s => s.user_id -> ((s.session_start.getTime, s.session_end.getTime,
                                 s.n_events))).toMap
      assert(out(1L) === ((t(0).getTime, t(5).getTime, 2L)))
      assert(out(2L) === ((t(3).getTime, t(3).getTime, 1L)))
      assert(!out.contains(99L), "user 99's session is still open — no emission")
      // exactly once: state was cleared on emission, so no duplicates
      assert(spark.table("tws_sess").count() === 2)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("foreachBatch probe of the PERSISTED corpus state equals dedup_incremental_stored") {
    // the full rolling-ingest deployment: the standing corpus's band/token
    // state lives in BUCKETED CATALOG TABLES (DedupState — written once,
    // never rebuilt), and each micro-batch of incoming docs signs only its
    // own rows and probes the stored bands. Split the incoming docs across
    // two micro-batches: new×corpus pairs are per-batch disjoint, so the
    // union over batches must equal the batch-mode stored query exactly.
    import graft.operators.{Dedup, DedupState}
    import graft.queries.DedupQueries
    implicit val sqlCtx = spark.sqlContext
    val (k, r) = (16, 4)
    val d = sf()
    val st = DedupQueries.corpusState(spark, d) // memoized bucketed-table write
    val corpusToks = DedupState.toks(spark, st)
    val incoming = Tables.documents(spark, d).filter($"doc_id" >= 400)
      .select("doc_id", "text").as[Doc].collect().sortBy(_.doc_id)
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val mem = MemoryStream[Doc]
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val toksNew = Dedup.distinctTokenRows(batch, "doc_id", "text")
        val newBands = Dedup.longBands(
          Dedup.minhashBands(
            Dedup.minhashSignatures(toksNew, "doc_id", k), "doc_id", k, r),
          "doc_id", k / r)
        val cand = Dedup.lshCrossCandidatePairsLong(
          newBands, DedupState.bands(spark, st), "doc_id", k / r)
        val parts = cand.select($"a".as("doc_id"))
          .union(cand.select($"b".as("doc_id"))).distinct()
        val toks = toksNew.unionByName(corpusToks)
          .join(parts, Seq("doc_id"), "left_semi")
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

    val expected = DedupQueries.defs("dedup_incremental_stored")(spark, d)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(got.toSet === expected,
      s"streaming pairs ${got.size} != stored batch pairs ${expected.size}")
  }

  test("foreachBatch probe of the PERSISTED IVF index equals sim_ivf_stored") {
    // the vector-side rolling ingest: the cell index lives in a bucketed
    // catalog table; each micro-batch of incoming vectors assigns itself
    // against the seed set and probes only its own cells. Per-query top-k
    // is batch-local, so the union over two disjoint micro-batches must
    // equal the one-shot batch query exactly.
    import graft.queries.SimilarityQueries
    implicit val sqlCtx = spark.sqlContext
    val d = sf()
    val split = SimilarityQueries.embSplit(spark, d)
    val incoming = graft.operators.Similarity.prepared(Tables.embeddings(spark, d))
      .filter($"vec_id" >= split)
      .select($"vec_id", $"v").as[(Long, Seq[Double])].collect().sortBy(_._1)
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double, Int)]()
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = mem.toDF().toDF("vec_id", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = SimilarityQueries.ivfProbe(spark, d, batch)
          .collect()
          .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
            x.getDouble(3), x.getInt(4)))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try {
      val (first, second) = incoming.splitAt(incoming.length / 2)
      mem.addData(first); q.processAllAvailable()
      mem.addData(second); q.processAllAvailable()
    } finally q.stop()

    val expected = SimilarityQueries.defs("sim_ivf_stored")(spark, d)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getInt(4))).toSet
    assert(got.toSet === expected,
      s"streaming probe ${got.size} != stored batch ${expected.size}")
  }

  test("streaming corpus curation: N micro-batch publishes equal one batch run on the union") {
    // the full curation funnel as a rolling ingest (CorpusStream): three
    // ascending micro-batches advance the persisted dedup head state with
    // batch-sized work and republish the snapshot through the SHARED
    // release tail. Equivalence is exact, not monotone-approximate: the
    // comps transition is the proven contraction, retractions (cluster
    // merges, late-arriving eval twins) are absorbed by the snapshot
    // republish, and the final publish must be row-identical to one batch
    // CorpusJob.execute over the union.
    import graft.pipeline.{CorpusJob, CorpusStream}
    implicit val sqlCtx = spark.sqlContext
    val d = sf()
    val docs = Tables.documents(spark, d).as[CorpusDoc].collect().sortBy(_.doc_id)
    val outStream = java.nio.file.Files.createTempDirectory("graft-cstream").toString
    val outBatch = java.nio.file.Files.createTempDirectory("graft-cbatch").toString
    val snapRoot = java.nio.file.Files.createTempDirectory("graft-csnap").toString
    val n = CorpusStream.names("graft_cstream_spec")
    CorpusStream.reset(spark, n)
    val mem = MemoryStream[CorpusDoc]
    val q = CorpusStream.run(mem.toDF(),
      CorpusJob.Config(input = d, out = outStream), n, Some(snapRoot))
    try {
      docs.grouped(math.ceil(docs.length / 3.0).toInt).foreach { p =>
        mem.addData(p); q.processAllAvailable()
      }
    } finally q.stop()
    val (batchOut, f) = CorpusJob.execute(spark,
      CorpusJob.Config(input = d, out = outBatch))
    val streamOut = spark.read.parquet(outStream)
    assert(streamOut.count() === f.mixKept,
      "streamed snapshot size differs from the batch funnel")
    assert(streamOut.exceptAll(batchOut).isEmpty &&
           batchOut.exceptAll(streamOut).isEmpty,
      "streamed curated corpus differs from the batch run on the union")
    // the versioned-release leg: one SnapshotStore version per epoch, the
    // _CURRENT pointer resolves to the final (batch-equal) corpus
    import graft.sinks.SnapshotStore
    assert(SnapshotStore.currentVersion(snapRoot) === Some(2L),
      "three epochs must publish three corpus releases (versions 0..2)")
    val released = SnapshotStore.read(spark, snapRoot)
      .select(batchOut.columns.map(col): _*)
    assert(released.exceptAll(batchOut).isEmpty &&
           batchOut.exceptAll(released).isEmpty,
      "the _CURRENT release differs from the batch run")
  }

  test("foreachBatch scoring against the PERSISTED frozen weights equals text_clf_stored") {
    // the model-deployment rolling ingest: the quality filter's weights
    // live in a catalog table (trained once on the standing corpus);
    // each micro-batch of incoming docs featurizes and scores ONLY
    // itself against the frozen weights. Per-doc feature normalization
    // makes batch scores independent of batching, so the union over
    // micro-batches must equal the batch-mode stored query exactly.
    import graft.queries.{DedupQueries, TextQueries}
    implicit val sqlCtx = spark.sqlContext
    val d = sf()
    val tbl = TextQueries.clfState(spark, d) // memoized bucketed-table write
    val split = DedupQueries.splitId(spark, d)
    val incoming = Tables.documents(spark, d).filter($"doc_id" >= split)
      .as[CorpusDoc].collect().sortBy(_.doc_id)
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val mem = MemoryStream[CorpusDoc]
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = graft.operators.Classifier.score(
            TextQueries.clfFeaturesOf(batch), spark.table(tbl))
          .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    try {
      val (first, second) = incoming.splitAt(incoming.length / 2)
      mem.addData(first); q.processAllAvailable()
      mem.addData(second); q.processAllAvailable()
    } finally q.stop()

    val expected = TextQueries.defs("text_clf_stored")(spark, d)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(got.toSet === expected,
      s"streaming scores ${got.size} != stored batch scores ${expected.size}")
  }
}

/** Full documents-table row for the streaming curation twin. */
case class CorpusDoc(doc_id: Long, text: String, lang: String,
                     source: String, n_chars: Long)
