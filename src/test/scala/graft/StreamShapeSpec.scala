package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventsStream, KafkaShape}

class StreamShapeSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("weighted reservoir: multi-trigger shuffled arrival matches batch top-R") {
    implicit val sqlCtx = spark.sqlContext
    // 60 docs across 2 sources with varied weights, delivered over 3
    // triggers in an order unrelated to doc id
    val docs = (1L to 60L).map(d =>
      (if (d % 2 == 0) "a" else "b", d, 10.0 + (d % 7) * 25.0))
    val df = docs.toDF("source", "doc_id", "w")
      .select(col("source"), col("doc_id"),
        (log((shiftrightunsigned(xxhash64(col("doc_id")), 11) + 1).cast("double")
          / lit((1L << 53).toDouble)) / col("w")).as("akey"))
    val all = df.as[EventsStream.DocKey].collect()
    val shuffled = new scala.util.Random(5).shuffle(all.toSeq)
    val stream = MemoryStream[EventsStream.DocKey]
    val q = stream.toDS()
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        EventsStream.weightedSampleFn _)
      .toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("wsample_test").start()
    try {
      shuffled.grouped(20).foreach { batch =>
        stream.addData(batch); q.processAllAvailable()
      }
    } finally q.stop()
    val finalRows = spark.table("wsample_test")
      .groupBy(col("source"))
      .agg(max(struct(col("n_seen"), col("sample_ids"))).as("m"))
      .select(col("source"), col("m.n_seen"), col("m.sample_ids"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    // batch reference: top-R by (akey desc, id) per source
    val batch = all.groupBy(_.source).view.mapValues { rows =>
      rows.sortBy(r => (-r.akey, r.doc_id)).take(EventsStream.SampleR)
        .map(_.doc_id).sorted.toSeq
    }.toMap
    assert(finalRows.keySet == batch.keySet)
    batch.foreach { case (src, want) =>
      val (n, got) = finalRows(src)
      assert(n == all.count(_.source == src))
      assert(got == want, s"source $src: $got vs $want")
    }
  }

  test("weighted reservoir: heavier docs are sampled more often") {
    // two weight classes; across many independent id-universes the
    // heavy class must win proportionally more slots
    val heavyIds = (1L to 50L); val lightIds = (51L to 100L)
    val df = (heavyIds.map((_, 1000.0)) ++ lightIds.map((_, 1.0)))
      .toDF("doc_id", "w")
      .select(col("doc_id"),
        (log((shiftrightunsigned(xxhash64(col("doc_id")), 11) + 1).cast("double")
          / lit((1L << 53).toDouble)) / col("w")).as("akey"))
    val top = df.orderBy(col("akey").desc, col("doc_id"))
      .limit(10).select(col("doc_id")).as[Long].collect()
    val heavy = top.count(_ <= 50L)
    assert(heavy >= 8, s"heavy class won only $heavy of 10 slots")
  }

  test("changelog latest: out-of-order delivery across triggers still converges") {
    implicit val sqlCtx = spark.sqlContext
    // 3 users × 10 events in REVERSE event-time order across triggers:
    // the materialized latest must still be the max-(ts, id) event
    val evs = for { u <- 1L to 3L; i <- 1L to 10L } yield
      EventsStream.KeyedEv(u, 1000000L * i, u * 100 + i, i * 1.5)
    val reversed = evs.sortBy(e => -e.tsMicros)
    val stream = MemoryStream[EventsStream.KeyedEv]
    val q = stream.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        EventsStream.latestFn _)
      .toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("latest_test").start()
    try {
      reversed.grouped(10).foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("latest_test")
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("last_event_id"), col("last_value"))).as("m"))
      .select(col("user_id"), col("m.n_events"), col("m.last_event_id"), col("m.last_value"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    (1L to 3L).foreach { u =>
      assert(got(u) == ((10L, u * 100 + 10, 15.0)), s"user $u: ${got(u)}")
    }
  }

  test("zorder layout: z-clustering prunes the box, natural layout does not") {
    val r = SparkEntry.queries("q53_zorder_layout")(spark, sf).head()
    val (nz, pz, nn, pn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(r.getBoolean(5), "zorder_wins must hold")
    // the box spans 2 of 8 px blocks × 2 of 8 sx blocks = at most 4
    // of the (up to) 64 z-files survive
    assert(nz - pz <= 4, s"z-layout left ${nz - pz} unpruned files")
    assert(pn == 0L, s"natural layout should prune nothing, pruned $pn of $nn")
  }

  test("incremental aggregate merge is exact") {
    val rows = SparkEntry.queries("q54_incremental_agg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(4), s"${r.getString(0)}: merge drifted"))
  }

  test("item recs: scores normalized, ranked, self-free") {
    val rows = SparkEntry.queries("graph_item_recs")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (part, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.zipWithIndex.forall { case (rk, i) => rk == i + 1 },
        s"part $part: ranks not 1..k")
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"part $part: scores not non-increasing")
      rs.foreach { r =>
        assert(r.getLong(2) != part, "self-recommendation")
        assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      }
    }
  }

  test("passage dedup: identical docs are fully duplicated passages") {
    val rows = SparkEntry.queries("text_passage_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "dup passages bounded by total")
      assert(r.getBoolean(3) == (r.getLong(2) * 2 < r.getLong(1)))
    }
    // the corpus has exact duplicate docs (dedup_exact finds them):
    // every passage of a duplicated doc is duplicated ⇒ keep = false
    val t = graft.sources.Tables(spark, sf)
    val dupDocs = t.documents
      .groupBy(lower(col("text")).as("k"))
      .agg(count(lit(1)).as("c"), min(col("doc_id")).as("d0"))
      .filter(col("c") > 1).count()
    if (dupDocs > 0) {
      assert(rows.exists(!_.getBoolean(3)), "no doc crossed the 50% drop rule")
    }
  }

  test("kafka shape: staged topic has contiguous offsets and key-stable partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_kafka_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    try {
      val df = (1L to 200L).map(i => (i % 17, i, s"payload-$i",
        new java.sql.Timestamp(1700000000000L + i * 1000)))
        .toDF("k", "event_id", "payload", "ts")
      KafkaShape.stageTopic(df, "k", "payload", "ts", "event_id",
        topic = "t", nPartitions = 4, path = tmp.toString)
      val staged = spark.read.schema(KafkaShape.kafkaSchema).parquet(tmp.toString)
      assert(staged.count() == 200)
      // per-partition offsets are 0..n-1 with no gaps
      staged.groupBy(col("partition"))
        .agg(count(lit(1)).as("n"), min(col("offset")).as("lo"),
          max(col("offset")).as("hi"),
          countDistinct(col("offset")).as("nd"))
        .collect().foreach { r =>
          val (n, lo, hi, nd) =
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
          assert(lo == 0L, "offsets start at 0")
          assert(hi == n - 1, "offsets contiguous")
          assert(nd == n, "offsets distinct")
        }
      // all messages of one key land in one partition
      val spread = staged
        .select(col("key").cast("string").as("k"), col("partition"))
        .groupBy(col("k")).agg(countDistinct(col("partition")).as("np"))
        .agg(max(col("np"))).head.getLong(0)
      assert(spread == 1L, "a key spread across partitions")
      // payload round-trips through the binary value column
      val back = staged.select(col("value").cast("string").as("p"))
        .orderBy(col("p")).as[String].collect().toSet
      assert(back == (1L to 200L).map(i => s"payload-$i").toSet)
    } finally rm(tmp.toFile)
  }

  test("stream heavy hitters: hot item leads every type; MG coverage gate holds") {
    val rows = SparkEntry.queries("stream_heavy_hitters")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(4), "MG candidate set missed a heavy item"))
    // the derived key concentrates ~25% of each type's arrivals on
    // 'hot_user' — with the next-heaviest single user at ~1/150 it must
    // be rank 1 everywhere; counts descend within each type
    rows.groupBy(_.getString(0)).foreach { case (et, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.head.getString(2) == "hot_user", s"$et: rank-1 not the hot item")
      val cnts = sorted.map(_.getLong(3))
      assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
        s"$et: counts not descending")
    }
  }

  test("stream-stream left outer: matched side equals the inner join; " +
      "unmatched side obeys the watermark cutoff") {
    val outer = SparkEntry.queries("stream_stream_left_outer")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val inner = SparkEntry.queries("stream_stream_join")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every inner-join user appears with the same attributed count
    inner.foreach { case (u, n) =>
      assert(outer.contains(u), s"user $u missing from outer result")
      assert(outer(u)._1 == n, s"user $u attributed count differs")
    }
    // outer-only users carry only unattributed clicks
    (outer.keySet -- inner.keySet).foreach { u =>
      assert(outer(u)._1 == 0L && outer(u)._2 > 0L, s"user $u")
    }
    // the watermark cutoff actually emitted something at sf0.001
    assert(outer.values.map(_._2).sum > 0L, "no unmatched clicks emitted")
  }

  test("stream-stream full outer: agrees with left outer on the click side; " +
      "organic purchases emitted") {
    val full = SparkEntry.queries("stream_stream_full_outer")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val left = SparkEntry.queries("stream_stream_left_outer")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the click-side story must be IDENTICAL to the left outer join
    left.foreach { case (u, (att, unm)) =>
      assert(full.contains(u), s"user $u missing from full outer")
      assert(full(u)._1 == att, s"user $u: attributed differs from left outer")
      assert(full(u)._2 == unm, s"user $u: unmatched clicks differ")
    }
    (full.keySet -- left.keySet).foreach { u =>
      assert(full(u)._1 == 0L && full(u)._2 == 0L && full(u)._3 > 0L,
        s"user $u: full-outer-only row must be organic-purchase-only")
    }
    assert(full.values.map(_._3).sum > 0L, "no organic purchases emitted")
  }

  test("stream-stream semi: once per converting click, bounded by the inner join") {
    val semi = SparkEntry.queries("stream_stream_semi")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inner = SparkEntry.queries("stream_stream_join")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(semi.nonEmpty)
    // semi emits each click at most once, so per user:
    // 0 < converting clicks <= attributed (click, purchase) pairs,
    // and semi's user set is exactly the inner join's
    assert(semi.keySet == inner.keySet, "semi and inner user sets differ")
    semi.foreach { case (u, n) =>
      assert(n >= 1L && n <= inner(u),
        s"user $u: semi count $n outside [1, inner ${inner(u)}]")
    }
  }

  test("hopping windows: every purchase lands in exactly six windows") {
    val t = graft.sources.Tables(spark, sf)
    val purchases = t.events.filter(col("event_type") === "purchase")
    val nP = purchases.count()
    val cents = purchases
      .agg(sum(round(col("value") * 100).cast("long"))).head().getLong(0)
    val rows = SparkEntry.queries("stream_hopping_agg")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == 6L * nP, "6x event mass")
    assert(rows.map(_.getLong(2)).sum == 6L * cents, "6x cents mass")
    // window starts sit on the hour grid and are distinct
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    rows.foreach(r => assert(r.getString(0).endsWith(":00:00"),
      s"off-grid start ${r.getString(0)}"))
  }

  test("cdc tombstones: delete suppresses, late upsert stays dead, resurrect works") {
    import graft.streaming.EventsStream.{CdcEv, CdcState, cdcFn}
    import org.apache.spark.sql.streaming.TestGroupState
    def mkState(prior: Option[CdcState]) = TestGroupState.create[CdcState](
      optionalState = prior.map(org.apache.spark.api.java.Optional.of(_))
        .getOrElse(org.apache.spark.api.java.Optional.empty()),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    // trigger 1: upsert t=10, delete t=20 → dead
    val gs1 = mkState(None)
    val o1 = cdcFn(1L, Iterator(
      CdcEv(1L, 10L, 100L, 5.0, isDelete = false),
      CdcEv(1L, 20L, 101L, 0.0, isDelete = true)), gs1).toSeq
    assert(o1.head.is_deleted && o1.head.n_ops == 2L, "delete wins")
    // trigger 2: LATE upsert t=15 (older than the tombstone) → stays dead
    val gs2 = mkState(Some(gs1.get))
    val o2 = cdcFn(1L, Iterator(
      CdcEv(1L, 15L, 102L, 7.0, isDelete = false)), gs2).toSeq
    assert(o2.head.is_deleted && o2.head.n_ops == 3L, "late upsert suppressed")
    // trigger 3: upsert t=30 → resurrected with the new value
    val gs3 = mkState(Some(gs2.get))
    val o3 = cdcFn(1L, Iterator(
      CdcEv(1L, 30L, 103L, 9.0, isDelete = false)), gs3).toSeq
    assert(!o3.head.is_deleted && o3.head.last_event_id == 103L &&
      o3.head.last_value == 9.0, "resurrect")
    // same-ts tie: higher event_id wins
    val gs4 = mkState(Some(gs3.get))
    val o4 = cdcFn(1L, Iterator(
      CdcEv(1L, 30L, 104L, 0.0, isDelete = true)), gs4).toSeq
    assert(o4.head.is_deleted, "same-ts id tie-break lets the delete win")
  }

  test("session top-k state fn: splits, modal tie rule, cross-trigger growth") {
    import graft.streaming.EventsStream.{EvT, SessTop, TopState, sessionTopFn}
    import org.apache.spark.sql.streaming.TestGroupState
    def mkState(prior: Option[TopState]) = TestGroupState.create[TopState](
      optionalState = prior.map(org.apache.spark.api.java.Optional.of(_))
        .getOrElse(org.apache.spark.api.java.Optional.empty()),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    val gap = 30L * 60L * 1000000L
    val t0 = 1000000L
    // trigger 1: one session [t0, t0+2] with a,b,a -> top a(2); a
    // second session opens gap+ later with a single b
    val gs1 = mkState(None)
    val out1 = sessionTopFn(7L, Iterator(
      EvT(7L, t0, "a"), EvT(7L, t0 + 1, "b"), EvT(7L, t0 + 2, "a"),
      EvT(7L, t0 + gap + 10, "b")), gs1).toSeq
    assert(out1.map(s => (s.session_start_us, s.n_events, s.top_type, s.top_n)) ==
      Seq((t0, 3L, "a", 2L), (t0 + gap + 10, 1L, "b", 1L)))
    // trigger 2: the open session grows by c then b -> counts b:2, c:1
    val gs2 = mkState(Some(gs1.get))
    val out2 = sessionTopFn(7L, Iterator(
      EvT(7L, t0 + gap + 11, "c"), EvT(7L, t0 + gap + 12, "b")), gs2).toSeq
    assert(out2 == Seq(SessTop(7L, t0 + gap + 10, 3L, "b", 2L)))
    // dedup rule: the final answer per session is its max-n snapshot
    val fin = (out1 ++ out2).groupBy(_.session_start_us).view
      .mapValues(_.maxBy(_.n_events)).toMap
    assert(fin(t0 + gap + 10).n_events == 3L)
    // pure modal tie: a and b once each -> lexicographically 'a'
    val out3 = sessionTopFn(9L, Iterator(
      EvT(9L, t0, "b"), EvT(9L, t0 + 1, "a")), mkState(None)).toSeq
    assert(out3.head.top_type == "a" && out3.head.top_n == 1L)
  }

  test("kafka wire-schema contract: exact column names, types and order") {
    // the one-line production swap (readStream.format("kafka")) is
    // type-checked by THIS pin: Spark's Kafka source emits exactly
    // these columns in exactly this order (spark-sql-kafka contract);
    // any consumer drift or a schema edit here must fail loudly,
    // never at the broker
    import org.apache.spark.sql.types._
    import graft.streaming.KafkaShape
    val expect = Seq(
      ("key", BinaryType), ("value", BinaryType), ("topic", StringType),
      ("partition", IntegerType), ("offset", LongType),
      ("timestamp", TimestampType), ("timestampType", IntegerType))
    assert(KafkaShape.kafkaSchema.fields.toSeq.map(f => (f.name, f.dataType))
      == expect,
      "KafkaShape.kafkaSchema must match the spark-sql-kafka source " +
      "contract exactly (names, types, order)")
    // a staged topic read back through readTopicStream carries the
    // contract verbatim — the seam consumers are written against
    val tmp = java.nio.file.Files.createTempDirectory("kafka_contract")
    try {
      import spark.implicits._
      val df = Seq((1L, 10L, "view", 1.5, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
        .toDF("user_id", "event_id", "event_type", "value", "ts")
        .select(col("user_id"), col("event_id"),
          to_json(struct(col("event_id"), col("event_type"), col("value")))
            .as("payload"), col("ts"))
      KafkaShape.stageTopic(df, "user_id", "payload", "ts", "event_id",
        "t", 2, tmp.toString)
      val got = KafkaShape.readTopicStream(spark, tmp.toString).schema
      assert(got.fields.toSeq.map(f => (f.name, f.dataType)) == expect)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(tmp.toFile)
    }
  }
}
