package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Eviction semantics of the shared-build memo: an entry must die
  * once its session is dead, without losing the explicit clear()
  * path. The liveness predicate is injected because the suite-shared
  * local context can't be stopped mid-run; the production default
  * (`sparkContext.isStopped`) is a one-line passthrough.
  */
class SessionMemoSpec extends AnyFunSuite {
  import TestSession._

  test("a dead session's entry is evicted at the next memo access") {
    val dead = scala.collection.mutable.Set.empty[SparkSession]
    val memo = new SessionMemo[String, org.apache.spark.sql.DataFrame](
      Seq(_), isDead = dead.contains)
    import spark.implicits._
    val s2 = spark.newSession()
    val df2 = Seq(1, 2).toDF("x")
    memo.getOrBuild(s2, "k")(df2)
    memo.getOrBuild(spark, "k")(Seq(3).toDF("x"))
    assert(memo.entryCount == 2)
    assert(memo.live.exists(_ eq df2))

    dead += s2 // "stop" s2: the next access must prune its entry
    assert(memo.entryCount == 1)
    assert(!memo.live.exists(_ eq df2),
      "dead session's frames must leave the live set")
    // the surviving session's entry is untouched and still memoized
    val again = memo.getOrBuild(spark, "k")(
      fail("must hit the memo, not rebuild"))
    assert(again.collect().map(_.getInt(0)).toSeq == Seq(3))
  }

  test("clear() drops live entries explicitly (Bench repeat-mode path)") {
    val memo = SessionMemo.ofFrame[String]
    import spark.implicits._
    val df = Seq(1).toDF("x").persist()
    memo.getOrBuild(spark, "k")(df)
    assert(memo.entryCount == 1)
    memo.clear()
    assert(memo.entryCount == 0)
    val rebuilt = memo.getOrBuild(spark, "k")(Seq(2).toDF("x"))
    assert(rebuilt.collect().map(_.getInt(0)).toSeq == Seq(2),
      "cleared memo must rebuild")
  }
}
