package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.SaltedJoin
import graft.sources.Tables

/** Library-boundary sample: consume the public SaltedJoin API the way
  * a downstream user would and print observable evidence (row counts,
  * partition spread of a hot key).
  */
object SaltedJoinSample {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 8, appName = "salted-join-sample")
    val t = Tables(spark, "/root/testdata/sf0.01")
    val plain = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey")).count()
    val salted = SaltedJoin
      .saltedEquiJoin(t.lineitem, t.orders, "l_orderkey", "o_orderkey", 8).count()
    println(s"[sample] plain=$plain salted=$salted equal=${plain == salted}")
    // skewed input: all left rows share one key; salting must spread them
    import spark.implicits._
    val skewL = (0 until 10000).map(i => (1L, i)).toDF("k", "payload")
    val skewR = Seq((1L, "hot")).toDF("k2", "tag")
    val spread = SaltedJoin.saltedEquiJoin(skewL, skewR, "k", "k2", 8)
      .groupBy(spark_partition_id()).count().count()
    println(s"[sample] hot-key output spread over $spread partitions")
    spark.stop()
  }
}
