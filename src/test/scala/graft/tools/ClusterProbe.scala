package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Phase-timing probe for dedup_clusters at a given sf dir. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val t = Tables(spark, dir)
    timed("warmup: count docs") { t.documents.count() }
    val sets = timed("shingle sets cache") {
      val x = Dedup.docShingleSets(t.documents).cache(); x.count(); x
    }
    timed("shingle sets recompute (warm, uncached)") {
      Dedup.docShingleSets(t.documents).write.format("noop").mode("overwrite").save()
    }
    println(s"[probe] exploded shingles = " +
      sets.select(explode(col("sh"))).count())
    val pairs = timed("jaccard pairs") {
      Dedup.ngramJaccardPairs(sets, Dedup.MaxShingleDf)
    }
    println(s"[probe] pairs = ${pairs.count()}")
    val cc = timed("connected components") {
      val c = Dedup.connectedComponents(pairs, "ia", "ib"); c.count(); c
    }
    println(s"[probe] nodes = ${cc.count()}")
    spark.stop()
  }
}
