package graft

import org.scalatest.funsuite.AnyFunSuite

/** 100 TB streaming posture: the default HDFS-backed state store keeps
  * all keys in executor memory — fine at sf0.1, a cliff at billions of
  * session/join keys. RocksDB is the provider that survives; this spec
  * pins that every stateful machinery family (windowed agg, session
  * windows, flatMapGroupsWithState, streaming dedup, stream-stream
  * joins, CDC upsert, custom heavy-hitter state) produces IDENTICAL
  * results under both providers, so flipping
  * `-Dgraft.stateStore=rocksdb` (GraftSession) is a pure capacity
  * decision, never a semantics change.
  *
  * providerClass is a session-level SQLConf read at stream start, so
  * the same session replays each query under both settings.
  */
class RocksDbStateStoreSpec extends AnyFunSuite {
  import TestSession._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  // one query per stateful-machinery family
  private val stateful = Seq(
    "stream_hourly_agg",      // watermarked tumbling-window aggregation
    "stream_session_window",  // session_window native sessionization
    "stream_sessionize",      // flatMapGroupsWithState custom sessions
    "stream_dedup_exact",     // dropDuplicates state
    "stream_stream_join",     // inner stream-stream join state
    "stream_stream_left_outer", // outer join with watermark eviction
    "stream_cdc_tombstones",  // upsert/delete state machine
    "stream_heavy_hitters"    // custom Misra-Gries state
  )

  private def run(name: String): Set[Seq[Any]] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSet

  for (q <- stateful) {
    test(s"$q: RocksDB provider matches the default provider row-for-row") {
      val default = run(q)
      spark.conf.set(ProviderKey, GraftSession.RocksDbProvider)
      try {
        val rocks = run(q)
        assert(rocks == default,
          s"provider changed results: only-default=${(default -- rocks).take(3)} " +
            s"only-rocks=${(rocks -- default).take(3)}")
      } finally spark.conf.unset(ProviderKey)
    }
  }

  test("GraftSession opts into RocksDB via system property") {
    System.setProperty("graft.stateStore", "rocksdb")
    try assert(GraftSession.defaultStateStore == "rocksdb")
    finally System.clearProperty("graft.stateStore")
    assert(GraftSession.defaultStateStore == "hdfs")
  }
}
