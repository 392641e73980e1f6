package graft

import java.sql.Timestamp
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
  private def th(hour: Int, minute: Int) =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("batch sessionize groups by 30-minute gaps per user") {
    val rows = Seq(
      Ev(t(0), 1L, "a", 1.0), Ev(t(10), 1L, "a", 2.0),   // session 1
      Ev(th(11, 0), 1L, "a", 4.0),                        // gap 50m → session 2
      Ev(t(5), 2L, "b", 8.0))                             // user 2, own session
    val out = StreamingOps.sessionize(rows.toDF())
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, t(0), 2L, 3.0),
      (1L, th(11, 0), 1L, 4.0),
      (2L, t(5), 1L, 8.0)))
  }

  test("stream z-score gate matches batch scoring on the same stats") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "event_type", "value")
    val stats = graft.operators.EventAnalytics.typeStats(
      Tables.load(spark, "/root/testdata/sf0.001", "events"))
    val mem = MemoryStream[(Long, String, Double)]
    mem.addData(ev.as[(Long, String, Double)].collect().toSeq: _*)
    val q = graft.operators.EventAnalytics
      .scoreZ(mem.toDF().toDF("event_id", "event_type", "value"), stats)
      .writeStream.outputMode("append")
      .format("memory").queryName("zgate_test").start()
    try {
      q.processAllAvailable()
      val got = spark.table("zgate_test")
        .select("event_id").as[Long].collect().toSet
      val want = graft.operators.EventAnalytics.scoreZ(ev, stats)
        .select("event_id").as[Long].collect().toSet
      assert(got.nonEmpty && got == want,
        "stateless stream gate must flag exactly the batch outliers")
    } finally q.stop()
  }

  test("streaming CMS counter build: bounded state, equals the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val half = docs.as[(Long, String)].collect().toSeq.splitAt(100)
    mem.addData(half._1: _*)
    val q = graft.functions.TextOps.cmsCounters(
        mem.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_test").start()
    try {
      q.processAllAvailable()
      mem.addData(half._2: _*)   // counters keep accumulating
      q.processAllAvailable()
      val got = spark.table("cms_test")
        .as[(Int, Long, Long)].collect().toSet
      val want = graft.functions.TextOps.cmsCounters(docs)
        .as[(Int, Long, Long)].collect().toSet
      assert(got == want, "stream counters must equal the batch sketch")
      // the scale property: state is d*w rows, not vocabulary-sized
      assert(got.size <= graft.functions.TextOps.CmsDepth *
        graft.functions.TextOps.CmsWidth)
    } finally q.stop()
  }

  test("streaming sessionize over MemoryStream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.sessionize(
        mem.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_test").start()
    try {
      mem.addData(Ev(t(0), 1L, "a", 1.0), Ev(t(5), 1L, "a", 2.0))
      q.processAllAvailable()
      mem.addData(Ev(th(12, 0), 1L, "a", 5.0))
      q.processAllAvailable()
      val out = spark.table("sess_test")
        .orderBy("user_id", "session_start")
        .as[(Long, Timestamp, Long, Double)].collect().toSeq
      assert(out == Seq(
        (1L, t(0), 2L, 3.0),
        (1L, th(12, 0), 1L, 5.0)))
    } finally q.stop()
  }

  test("sliding window counts each event in overlapping windows") {
    val rows = Seq(Ev(th(10, 15), 1L, "x", 1.0))
    val out = StreamingOps.slidingCounts(rows.toDF())
      .select("win_start", "event_type", "cnt")
      .orderBy("win_start")
      .as[(Timestamp, String, Long)].collect().toSeq
    // 1h window sliding 30m → event at 10:15 lands in [9:30,10:30) and [10:00,11:00)
    assert(out.map(_._1) == Seq(th(9, 30), th(10, 0)))
    assert(out.forall(_._3 == 1L))
  }

  test("stream-stream interval join matches clicks to recent views only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    val q = StreamingOps.clickViewJoin(
        clicks.toDF().select("user_id", "ts"),
        views.toDF().select("user_id", "ts", "value"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_test").start()
    try {
      views.addData(Ev(t(0), 1L, "view", 1.0), Ev(t(30), 1L, "view", 2.0))
      clicks.addData(Ev(t(8), 1L, "click", 0.0),   // matches view@0 only
        Ev(t(35), 1L, "click", 0.0),               // matches view@30 only
        Ev(t(50), 2L, "click", 0.0))               // other user: no match
      q.processAllAvailable()
      val out = spark.table("ssj_test")
        .select("ts", "value").as[(Timestamp, Double)].collect().sorted.toSeq
      assert(out == Seq((t(8), 1.0), (t(35), 2.0)))
    } finally q.stop()
  }

  test("file-stream replay of events produces sessions matching batch") {
    val q = StreamingOps.runSessionStream(spark, sf)
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_sessions").count()
      val batch = StreamingOps.queries("e_stream_session")(spark, sf).count()
      assert(streamed == batch,
        s"streamed $streamed sessions vs batch $batch")
    } finally q.stop()
  }

  test("two-stream interval-join replay equals the batch interval join") {
    val streamed = StreamingOps.queries("e_stream_join_replay")(spark, sf)
    val ev = Tables.load(spark, sf, "events")
    val c = ev.where(col("event_type") === "click").select("user_id", "ts")
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"))
    val batch = c.join(v, expr(
        """user_id = v_user_id AND
          |v_ts BETWEEN ts - INTERVAL '4 hours' AND ts""".stripMargin))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("unix_micros(ts) - unix_micros(v_ts)")).as("sum_gap_us"))
      .orderBy("user_id")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("checkpoint restart resumes session state (kill mid-stream, resume, match batch)") {
    val resumed = StreamingOps.resumeSessionStream(spark, sf)
    val batch = StreamingOps.queries("e_stream_session")(spark, sf)
    assert(resumed.collect().toSeq == batch.collect().toSeq,
      "restarted query must fold recovered state into the second half")
  }

  test("checkpoint restart resumes under the RocksDB state store") {
    val resumed = StreamingOps.resumeSessionStream(spark, sf,
      stateStoreProvider = Some(
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    val batch = StreamingOps.queries("e_stream_session")(spark, sf)
    assert(resumed.collect().toSeq == batch.collect().toSeq)
  }

  test("streaming hygiene filter agrees with batch decontamination") {
    import graft.operators.DedupOps
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    // a synthetic ingest doc embedding eval doc 0's text verbatim —
    // containment 1.0, must be dropped by both formulations
    val evalText = docs.where(col("doc_id") === 0L).head().getString(1)
    val combined = docs.union(
      Seq((100000L, evalText + " padding tokens after the eval payload"))
        .toDF("doc_id", "text"))
    val evalSets = DedupOps.evalShingleSets(combined)
    assert(evalSets.nonEmpty)
    val batchKept = DedupOps.decontaminate(combined)
      .select("doc_id").as[Long].collect().toSet

    // the stream side is the stateless predicate: no join, no state
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamed = mem.toDF.toDF("doc_id", "text")
      .where(!DedupOps.evalContains(col("text"), evalSets))
      .select("doc_id")
    val q = streamed.writeStream.format("memory")
      .queryName("graft_hygiene").outputMode("append").start()
    try {
      mem.addData(combined.as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
      val streamKept = spark.table("graft_hygiene").as[Long].collect().toSet
      assert(streamKept == batchKept,
        s"stream/batch disagree: only-stream=${streamKept -- batchKept} " +
          s"only-batch=${batchKept -- streamKept}")
      assert(!streamKept.contains(100000L) && !streamKept.contains(0L))
    } finally q.stop()
  }

  test("qualityGateStream drops short, contaminated, and duplicate docs") {
    import graft.operators.DedupOps
    import graft.streaming.DocEvent
    // pure-alpha words: digits would fail the ≥0.8 alpha-ratio gate
    def words(prefix: String) = (0 until 30)
      .map(i => s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
      .mkString(" ")
    val evalText = words("eval")
    val goodText = words("good")
    val evalDocs = Seq((0L, evalText)).toDF("doc_id", "text")
    val evalSets = DedupOps.evalShingleSets(evalDocs)
    assert(evalSets.nonEmpty)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    val q = StreamingOps.qualityGateStream(mem.toDS(), evalSets)
      .writeStream.format("memory")
      .queryName("graft_gate").outputMode("append").start()
    try {
      mem.addData(
        DocEvent(1L, 10L, goodText),
        DocEvent(1L, 11L, goodText),          // exact duplicate → dropped
        DocEvent(2L, 12L, "too short"),       // fails length gate
        DocEvent(3L, 13L, evalText))          // eval containment 1.0
      q.processAllAvailable()
      val kept = spark.table("graft_gate")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(10L),
        s"only the first clean doc may survive, got $kept")
    } finally q.stop()
  }

  test("streaming quality gate agrees with batch qualityGateBatch") {
    import graft.operators.DedupOps
    import graft.streaming.DocEvent
    val docs = Tables.load(spark, sf, "documents")
    val batchKept = StreamingOps.qualityGateBatch(docs)
      .select("doc_id").as[Long].collect().toSet
    val evalSets = DedupOps.evalShingleSets(docs)
    val events = docs
      .select(xxhash64(col("text")).as("fingerprint"), col("doc_id"), col("text"))
      .as[DocEvent].collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    val q = StreamingOps.qualityGateStream(mem.toDS(), evalSets)
      .writeStream.format("memory")
      .queryName("graft_gate_full").outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamKept = spark.table("graft_gate_full")
        .select("doc_id").as[Long].collect().toSet
      assert(streamKept == batchKept,
        s"stream/batch gate disagree: only-stream=${streamKept -- batchKept} " +
          s"only-batch=${batchKept -- streamKept}")
    } finally q.stop()
  }

  test("stream-static join replay equals the batch join, segment for segment") {
    val got = StreamingOps.replayStreamStaticJoin(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    val cust = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val batch = Tables.load(spark, sf, "events")
      .join(cust, col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast(
          org.apache.spark.sql.types.DecimalType(18, 6))), 2)
          .cast("double").as("sum_value"))
      .orderBy("c_mktsegment")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == batch)
    assert(got.nonEmpty)
  }
}
