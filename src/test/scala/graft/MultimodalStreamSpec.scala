package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalStreamSpec extends AnyFunSuite {
  import TestSession._

  test("decode stub: frame math and byte stats are exact") {
    val payload = Array.tabulate[Byte](600)(i => (i % 251).toByte)
    val f = Multimodal.decodeStub(7L, payload)
    assert(f.doc_id == 7L)
    assert(f.n_bytes == 600L)
    assert(f.n_frames == 3L) // ceil(600/256)
    val expectedMean = payload.map(_ & 0xff).sum.toDouble / 600
    assert(math.abs(f.mean_byte - expectedMean) < 1e-12)
    assert(Multimodal.decodeStub(1L, Array.emptyByteArray).n_frames == 0L)
  }

  test("codec swap preserves the oracle-gated columns (stub ⇄ custom)") {
    // a "real" codec must reproduce the byte-arithmetic features the
    // registered query oracle-checks; codec-specific signal lives in
    // first_frame_checksum (NOT in the registered output). Installing
    // one must leave mm_decode_features' output bit-identical.
    val stubOut = SparkEntry.queries("mm_decode_features")(spark, sf)
      .collect().map(_.toSeq)
    object FancyCodec extends Multimodal.AssetCodec {
      override def decode(id: Long, payload: Array[Byte]): Multimodal.AssetFeatures = {
        val base = Multimodal.decodeStub(id, payload)
        base.copy(first_frame_checksum = base.first_frame_checksum ^ 0x5eedL)
      }
    }
    val stubChecksums = Multimodal.decodedAssets(spark, sf)
      .select(col("doc_id"), col("first_frame_checksum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      Multimodal.AssetCodec.install(FancyCodec)
      assert(Multimodal.AssetCodec.current eq FancyCodec)
      val swapped = SparkEntry.queries("mm_decode_features")(spark, sf)
        .collect().map(_.toSeq)
      assert(swapped.toSeq == stubOut.toSeq,
        "codec swap must not move the oracle-gated columns")
      // ...while the codec-derived column must CARRY the new codec's
      // signal through the distributed decode (executor-side
      // mapPartitions, not a driver-only dispatch)
      val fancy = Multimodal.decodedAssets(spark, sf)
        .select(col("doc_id"), col("first_frame_checksum"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fancy.keySet == stubChecksums.keySet)
      fancy.foreach { case (id, ck) =>
        assert(ck == (stubChecksums(id) ^ 0x5eedL),
          s"doc $id: installed codec's signal missing from decode output")
      }
    } finally Multimodal.AssetCodec.reset()
    assert(Multimodal.AssetCodec.current eq Multimodal.AssetCodec.Stub)
  }

  test("mm_decode_features agrees with mm_binary_metadata on sizes") {
    val meta = SparkEntry.queries("mm_binary_metadata")(spark, sf)
      .select("doc_id", "n_bytes", "n_frames")
    val feat = SparkEntry.queries("mm_decode_features")(spark, sf)
      .select(col("doc_id"), col("n_bytes").as("fb"), col("n_frames").as("ff"))
    val joined = meta.join(feat, "doc_id")
      .filter(col("n_bytes") =!= col("fb") || col("n_frames") =!= col("ff"))
    assert(joined.count() == 0, "metadata path and decode path disagree")
  }

  test("sessionize state accrues across triggers (sessions spanning batches count once)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventsStream
    import graft.streaming.EventsStream.{Ev, SessionSummary}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val minute = 60L * 1000000L

    val src = MemoryStream[Ev]
    val summarized = src.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        EventsStream.sessionFn _)
    val name = "graft_sess_multibatch"
    val q = summarized.toDF().writeStream
      .outputMode(OutputMode.Update()).format("memory").queryName(name).start()
    try {
      // batch 1: two events 10 min apart — one session of 2 events
      src.addData(Ev(1L, 0L, 0.0), Ev(1L, 10 * minute, 0.0))
      q.processAllAvailable()
      val afterB1 = spark.table(name).as[SessionSummary].collect()
      assert(afterB1.toSeq == Seq(SessionSummary(1L, 1L, 2L, 2L)), s"got ${afterB1.toSeq}")
      // batch 2: one event 20 min after the last (same session
      // continues across the trigger boundary), one 120 min later
      // (new session). A stateless re-run of batch 2 alone would
      // miscount this as 2 sessions of 1 event.
      src.addData(Ev(1L, 30 * minute, 0.0), Ev(1L, 150 * minute, 0.0))
      q.processAllAvailable()
      val rows = spark.table(name).as[SessionSummary].collect()
      val finalRow = rows.last // memory sink appends per-trigger updates in order
      assert(finalRow == SessionSummary(1L, 2L, 4L, 3L),
        s"cross-trigger state must merge the spanning session: got $finalRow (all: ${rows.toSeq})")
    } finally q.stop()
  }

  test("event-time sessionize merges out-of-order events across triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.streaming.EventsStream
    import graft.streaming.EventsStream.{Ev, SessionSummary}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val minute = 60L * 1000000L
    val base = 1700000000L * 1000000L // real epoch so watermarks behave

    val src = MemoryStream[Ev]
    val summarized = src.toDS()
      .withColumn("eventTime", timestamp_micros(col("tsMicros")))
      .withWatermark("eventTime", "120 minutes")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout)(EventsStream.sessionFnEventTime _)
    val name = "graft_sess_ooo"
    val q = summarized.toDF().writeStream
      .outputMode(OutputMode.Update()).format("memory").queryName(name).start()
    try {
      // batch 1: user 1 at minutes 100, 101
      src.addData(Ev(1L, base + 100 * minute, 0.0), Ev(1L, base + 101 * minute, 0.0))
      q.processAllAvailable()
      // batch 2: minute 20 arrives AFTER minutes 100/101 — out of
      // order across the trigger boundary — plus minute 150.
      // Arrival-order processing would fold 20 into the {100,101}
      // session (2 sessions, max 3); event-time order gives
      // {20} {100,101} {150} = 3 sessions, max 2.
      src.addData(Ev(1L, base + 20 * minute, 0.0), Ev(1L, base + 150 * minute, 0.0))
      q.processAllAvailable()
      // batch 3: sentinel user pushes the watermark past every user-1
      // event so all buffered events finalize; also a genuinely-late
      // user-1 event (minute 25 < the frontier by then) must be
      // dropped, not rewound into the summary
      src.addData(Ev(99L, base + 400 * minute, 0.0))
      q.processAllAvailable()
      src.addData(Ev(1L, base + 25 * minute, 0.0))
      q.processAllAvailable()
      val rows = spark.table(name).as[SessionSummary].collect()
        .filter(_.user_id == 1L)
      assert(rows.nonEmpty, "no user-1 summaries emitted")
      assert(rows.last == SessionSummary(1L, 3L, 4L, 2L),
        s"event-time order must yield 3 sessions of {20} {100,101} {150}: " +
        s"got ${rows.last} (all: ${rows.toSeq})")
    } finally q.stop()
  }

  test("randomized out-of-order replay matches the batch sessionization oracle") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.streaming.EventsStream
    import graft.streaming.EventsStream.{Ev, SessionSummary}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val minute = 60L * 1000000L
    val base = 1700000000L * 1000000L

    for (seed <- Seq(17, 23)) {
      val rnd = new scala.util.Random(seed)
      // 5 users x ~30 events over 10 hours: 30-min-gap sessions form
      // naturally; arrival disorder bounded at 90 min < the 120-min
      // watermark delay, so no event is ever late-beyond-watermark
      val events = for {
        u <- 1L to 5L
        _ <- 0 until (20 + rnd.nextInt(20))
      } yield Ev(u, base + rnd.nextInt(600).toLong * minute, 0.0)
      val arrival = events
        .map(e => (e, e.tsMicros + rnd.nextInt(90).toLong * minute))
        .sortBy(_._2).map(_._1)
      val batches = {
        var rest = arrival
        val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Ev]]
        while (rest.nonEmpty) {
          val n = math.min(rest.length, 1 + rnd.nextInt(15))
          out += rest.take(n); rest = rest.drop(n)
        }
        out.toSeq
      }
      val src = MemoryStream[Ev]
      val summarized = src.toDS()
        .withColumn("eventTime", timestamp_micros(col("tsMicros")))
        .withWatermark("eventTime", "120 minutes")
        .as[Ev]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Update(),
          GroupStateTimeout.EventTimeTimeout)(EventsStream.sessionFnEventTime _)
      val name = s"graft_sess_fuzz_$seed"
      val q = summarized.toDF().writeStream
        .outputMode(OutputMode.Update()).format("memory").queryName(name).start()
      try {
        batches.foreach { b => src.addData(b); q.processAllAvailable() }
        // two sentinel batches: the first advances the watermark past
        // every real event, the second runs with that watermark so
        // the event-time timeouts flush all reorder buffers
        val flushTs = events.map(_.tsMicros).max + 400 * minute
        src.addData(Ev(99L, flushTs, 0.0)); q.processAllAvailable()
        src.addData(Ev(99L, flushTs + minute, 0.0)); q.processAllAvailable()
        val got = spark.table(name).as[SessionSummary].collect()
          .filter(_.user_id <= 5L)
          .groupBy(_.user_id).map { case (u, rows) => u -> rows.last }
        // batch oracle: fold each user's fully time-sorted events
        // through the same session kernel via the arrival-ordered fn
        val expected = events.groupBy(_.user_id).map { case (u, evs) =>
          // sessionFn on a single all-events trigger IS the batch fold
          val out = EventsStream.sessionFn(u, evs.sortBy(_.tsMicros).iterator,
            org.apache.spark.sql.streaming.TestGroupState.create(
              org.apache.spark.api.java.Optional.empty[graft.streaming.EventsStream.SessState](),
              GroupStateTimeout.NoTimeout, 0L,
              org.apache.spark.api.java.Optional.empty[Long](), false))
          u -> out.next()
        }
        assert(got.keySet == expected.keySet, s"seed=$seed users differ")
        expected.foreach { case (u, exp) =>
          assert(got(u) == exp,
            s"seed=$seed user $u: stream ${got(u)} != batch $exp")
        }
      } finally q.stop()
    }
  }

  test("streaming hourly agg equals the batch aggregation") {
    val streamed = SparkEntry.queries("stream_hourly_agg")(spark, sf)
    val batch = SparkEntry.queries("q18_events_hourly")(spark, sf)
      .withColumnRenamed("hour_start", "hs")
    val j = streamed.join(batch,
      streamed("hour_start") === batch("hs") &&
        streamed("event_type") === batch("event_type"), "full_outer")
    val bad = j.filter(
      streamed("n").isNull || batch("n").isNull ||
      streamed("n") =!= batch("n") ||
      streamed("sum_value") =!= batch("sum_value")).count()
    assert(bad == 0, s"streaming/batch divergence in $bad window rows")
  }

  test("sessionize: hand-checked session splits") {
    import spark.implicits._
    // one user: 3 events close together, 45-min gap, 2 more events.
    // ts is written as raw INT64 nanos, matching the real
    // events.parquet physical layout the stream reader expects.
    val baseNanos = 1700000000000000000L
    val df = Seq(0L, 60L, 120L, 45 * 60L + 120L, 45 * 60L + 180L)
      .zipWithIndex
      .map { case (sec, i) =>
        (i.toLong, baseNanos + sec * 1000000000L, 1L, "click", 1.0, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sess").toFile
    try {
      // match the real layout: events.parquet is a single FILE
      df.coalesce(1).write.mode("overwrite").parquet(tmp + "/staging")
      val part = new java.io.File(tmp, "staging").listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(tmp.toString, "events.parquet"))
      val out = SparkEntry.queries("stream_sessionize")(spark, tmp.toString).collect()
      assert(out.length == 1)
      val r = out.head
      assert(r.getAs[Long]("n_sessions") == 2L, s"expected 2 sessions: $r")
      assert(r.getAs[Long]("n_events") == 5L)
      assert(r.getAs[Long]("max_session_events") == 3L)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(tmp)
    }
  }

  test("corpus is ASCII — tripwire for the byte-arithmetic oracles") {
    // mm_decode_features' DuckDB oracle sums per-char ascii() codes and
    // equates them with payload bytes; that identity holds only for an
    // ASCII corpus. If a testdata refresh introduces multi-byte text,
    // fail HERE with a pointer instead of as an opaque hash mismatch.
    val t = graft.sources.Tables(spark, sf)
    val nonAscii = t.documents
      .filter(length(encode(col("text"), "UTF-8")) =!= length(col("text"))).count()
    assert(nonAscii == 0,
      "documents contain multi-byte text: rewrite the mm_decode_features " +
      "mean_byte oracle (ascii-per-char == byte identity no longer holds)")
  }

  test("streaming dedup keeps exactly the batch-distinct hash set") {
    val streamed = SparkEntry.queries("stream_dedup_exact")(spark, sf)
      .collect().map(_.getString(0)).toSet
    val batch = SparkEntry.queries("dedup_exact")(spark, sf)
      .select("content_hash").collect().map(_.getString(0)).toSet
    assert(streamed == batch,
      s"streaming first-seen dedup must equal batch distinct: ${streamed.size} vs ${batch.size}")
  }

  test("multimodal + streaming queries run and return rows at sf0.001") {
    Seq("mm_binary_metadata", "mm_decode_features", "mm_frame_sample",
      "stream_hourly_agg", "stream_sessionize", "stream_dedup_exact")
      .foreach { q =>
        assert(SparkEntry.queries(q)(spark, sf).count() > 0, s"$q empty")
      }
  }

  test("stream_theta_distinct: estimate is exact below k and gates hold") {
    val rows = SparkEntry.queries("stream_theta_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2), s"sketch_ok false for ${r.getString(0)}"))
    // below-k regime on the test corpus: the sketch IS exact, so the
    // estimate must equal the batch distinct (not merely within 5%)
    val t = graft.sources.Tables(spark, sf)
    val exact = t.events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)),
        s"${r.getString(0)}: summary exact_distinct drifted from batch")
    }
  }

  test("CEP pattern: automaton state carries matches across triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventsStream
    import graft.streaming.EventsStream.{TypedEv, PatternSummary}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hour = 3600L * 1000000L

    val src = MemoryStream[TypedEv]
    val out = src.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        EventsStream.patternFn _)
    val name = "graft_cep_multibatch"
    val q = out.toDF().writeStream
      .outputMode(OutputMode.Update()).format("memory").queryName(name).start()
    try {
      // trigger 1: view then click — no purchase yet, nothing matches
      src.addData(TypedEv(1L, 1L, 0L, "view"), TypedEv(1L, 2L, 1 * hour, "click"))
      q.processAllAvailable()
      assert(spark.table(name).as[PatternSummary].collect().last ==
        PatternSummary(1L, 0L, 0L, None, 2L))
      // trigger 2: purchase 2h after the view — completes the funnel
      // ONLY because the (view, click) frontier survived the trigger
      // boundary; then a second purchase 30h later (window expired)
      src.addData(TypedEv(1L, 3L, 2 * hour, "purchase"),
        TypedEv(1L, 4L, 32 * hour, "purchase"))
      q.processAllAvailable()
      val fin = spark.table(name).as[PatternSummary]
        .collect().maxBy(_.n_events)
      assert(fin == PatternSummary(1L, 2L, 1L, Some(2 * hour), 4L),
        s"cross-trigger CEP state: got $fin")
    } finally q.stop()
  }

  test("CEP pattern: hand-checked policies (last-click binding, stale view)") {
    import graft.streaming.EventsStream
    import graft.streaming.EventsStream.{PatternState, PatternSummary, TypedEv}
    import org.apache.spark.sql.streaming.TestGroupState
    val hour = 3600L * 1000000L
    def run(evs: Seq[TypedEv]): PatternSummary = {
      val state = TestGroupState.create[PatternState](
        optionalState = org.apache.spark.api.java.Optional.empty(),
        timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
        batchProcessingTimeMs = 0L,
        eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
        hasTimedOut = false)
      EventsStream.patternFn(1L, evs.iterator, state).toSeq.last
    }
    def ev(id: Long, us: Long, tp: String) = TypedEv(1L, id, us, tp)
    // last-click binding: view@0, click@1h, view@26h, click@27h,
    // purchase@28h — the LAST click's view (26h) is in-window even
    // though the first (view, click) pair is stale: must match
    assert(run(Seq(ev(1, 0, "view"), ev(2, 1 * hour, "click"),
      ev(3, 26 * hour, "view"), ev(4, 27 * hour, "click"),
      ev(5, 28 * hour, "purchase"))) ==
      PatternSummary(1L, 1L, 1L, Some(28 * hour), 5L))
    // stale view under the last click: view@0, click@27h, purchase@28h
    // — the click exists but its view predates the 24h window: no match
    assert(run(Seq(ev(1, 0, "view"), ev(2, 27 * hour, "click"),
      ev(3, 28 * hour, "purchase"))) ==
      PatternSummary(1L, 1L, 0L, None, 3L))
    // order matters: click before view never forms a pair
    assert(run(Seq(ev(1, 0, "click"), ev(2, 1 * hour, "view"),
      ev(3, 2 * hour, "purchase"))) ==
      PatternSummary(1L, 1L, 0L, None, 3L))
    // purchase without any click
    assert(run(Seq(ev(1, 0, "view"), ev(2, 1 * hour, "purchase"))) ==
      PatternSummary(1L, 1L, 0L, None, 2L))
  }

  test("CEP pattern query equals a batch recompute at sf0.001") {
    import org.apache.spark.sql.functions._
    val t = graft.sources.Tables(spark, sf)
    val evs = t.events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val w = EventsStream_PatternWindow
    val want = evs.groupBy(_._1).map { case (u, rs) =>
      var lastView, pairTv, pairTc = Long.MinValue
      var nP, nM = 0L
      var first = Long.MinValue
      rs.sortBy(e => (e._3, e._2)).foreach { e =>
        e._4 match {
          case "view" => lastView = e._3
          case "click" => pairTv = lastView; pairTc = e._3
          case "purchase" =>
            nP += 1
            if (pairTc != Long.MinValue && pairTv != Long.MinValue &&
              pairTv >= e._3 - w) {
              nM += 1
              if (first == Long.MinValue) first = e._3
            }
          case _ =>
        }
      }
      u -> ((nP, nM, first))
    }
    val got = SparkEntry.queries("stream_pattern_match")(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (np, nm, first) = want(r.getLong(0))
      assert(r.getLong(1) == np && r.getLong(2) == nm, s"user ${r.getLong(0)}")
      if (first == Long.MinValue) assert(r.isNullAt(3))
      else assert(!r.isNullAt(3), s"user ${r.getLong(0)} first match")
    }
  }

  private val EventsStream_PatternWindow =
    graft.streaming.EventsStream.PatternWindowMicros

  test("streaming KLL: sketch state accumulates across triggers within rank error") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.plans.KLLSketch
    import graft.streaming.EventsStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(String, Double)]
    val q = src.toDS().groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (et: String, rows: Iterator[(String, Double)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Array[Byte])]) =>
          val (seen0, bytes) = state.getOption.getOrElse((0L, null))
          val sk = if (bytes == null) new KLLSketch(EventsStream.StreamKllK)
                   else KLLSketch.deserialize(bytes)
          var seen = seen0
          rows.foreach { r => sk.update(r._2); seen += 1 }
          state.update((seen, sk.serialize()))
          (et, seen, sk.quantile(0.5))
      }.toDF("k", "n", "p50")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("graft_kll_stream").start()
    try {
      // values 1..4000 split across two triggers, shuffled so neither
      // trigger is an ordered prefix of the distribution
      val all = new scala.util.Random(7).shuffle((1 to 4000).toVector)
      src.addData(all.take(2000).map(v => ("lat", v.toDouble)): _*)
      q.processAllAvailable()
      src.addData(all.drop(2000).map(v => ("lat", v.toDouble)): _*)
      q.processAllAvailable()
      val fin = spark.table("graft_kll_stream")
        .orderBy(col("n").desc).collect().head
      assert(fin.getLong(1) == 4000L, "sketch must have absorbed both triggers")
      val p50 = fin.getDouble(2)
      // realized rank of the estimate within the k=200 error budget
      assert(math.abs(p50 / 4000.0 - 0.5) <= EventsStream.StreamKllRankEps,
        s"p50 estimate $p50 outside rank budget")
    } finally q.stop()
  }

  test("perceptual hash groups equal a byte-level recompute") {
    import graft.operators.Multimodal.{PhashBlockLen, PhashBlocks}
    val docs = graft.sources.Tables(spark, sf).documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def phash(text: String): Long = {
      val codes = text.take(PhashBlocks * PhashBlockLen).map(_.toInt)
      val fsum = codes.map(_.toLong).sum
      val flen = codes.length.toLong
      (0 until PhashBlocks).map { i =>
        val block = codes.slice(i * PhashBlockLen, i * PhashBlockLen + PhashBlockLen)
        val bsum = block.map(_.toLong).sum
        if (bsum * flen > fsum * block.length) 1L << i else 0L
      }.sum
    }
    val groups = docs.groupBy(d => phash(d._2)).view
      .mapValues(_.map(_._1)).filter(_._2.length > 1).toMap
    val rows = SparkEntry.queries("mm_phash_dupes")(spark, sf).collect()
    assert(rows.length == groups.size, "candidate group count")
    rows.foreach { r =>
      val ids = groups(r.getLong(0))
      assert(r.getLong(1) == ids.length, s"group size of ${r.getLong(0)}")
      assert(r.getLong(2) == ids.min && r.getLong(3) == ids.max)
    }
    assert(groups.nonEmpty, "corpus should contain phash collisions")
  }

  test("mm_audio_energy: frame energies match a per-byte dense recompute") {
    import graft.operators.Multimodal.FrameSize
    val docs = graft.sources.Tables(spark, sf).documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val want = docs.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      bytes.grouped(FrameSize).zipWithIndex.map { case (frame, fi) =>
        val energy = frame.map(b => { val d = (b & 0xff) - 128L; d * d }).sum
        (id, fi.toLong) -> ((frame.length.toLong, energy,
          math.sqrt(energy.toDouble / frame.length)))
      }
    }.toMap
    val got = SparkEntry.queries("mm_audio_energy")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == want, "frame energy table differs from dense recompute")
    // all-lowercase-ascii corpus: no frame is pure silence (e=0 means
    // every byte equals 128, impossible for ascii text)
    got.values.foreach { case (_, e, _) => assert(e > 0L) }
  }

  test("scene cuts: per-asset cut counts match dense per-byte recompute") {
    import graft.operators.Multimodal.{FrameSize, SceneCutPct}
    val t = graft.sources.Tables(spark, TestSession.sf)
    val docs = t.documents.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val want = docs.collect { case (id, bytes) if bytes.nonEmpty =>
      val frames = bytes.grouped(FrameSize).toSeq
        .map(f => (f.length.toLong, f.map(b => (b & 0xff).toLong).sum))
      var cuts = 0L
      var first = Option.empty[Long]
      frames.sliding(2).zipWithIndex.foreach {
        case (Seq((plen, psum), (flen, fsum)), i) =>
          if (math.abs(fsum * plen - psum * flen) * 100L >
            SceneCutPct * psum * flen) {
            cuts += 1L
            if (first.isEmpty) first = Some(i + 1L)
          }
        case _ => ()
      }
      id -> (frames.length.toLong, cuts, first)
    }.toMap
    val rows = SparkEntry.queries("mm_scene_cuts")(spark, TestSession.sf)
      .collect()
    assert(rows.map(_.getLong(0)).toSet == want.keySet, "asset set")
    rows.foreach { r =>
      val (nf, nc, fc) = want(r.getLong(0))
      assert(r.getLong(1) == nf && r.getLong(2) == nc,
        s"cuts doc ${r.getLong(0)}")
      assert((if (r.isNullAt(3)) None else Some(r.getLong(3))) == fc,
        s"first cut doc ${r.getLong(0)}")
    }
    // the 3% threshold must actually fire somewhere at this SF
    assert(want.values.map(_._2).sum > 0L, "no cuts — threshold dead")
  }
}
