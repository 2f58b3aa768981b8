package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Tables
import graft.operators.Dedup

/** Dev probe: stage-by-stage timing + cardinalities of the MinHash
  * LSH pipeline, to find where wall-clock goes at a given SF.
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 16, appName = "minhash-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t = Tables(spark, dir)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }

    val docSets = Dedup.docShingleSets(t.documents).cache()
    timed("docSets materialize")(docSets.count())
    val ds = docSets.select(col("doc_id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("shingle"))
    timed("shingle rows")(println("  rows=" + ds.count()))
    val p = 2147483647L
    val perms = (0 until Dedup.MinHashK).map { i =>
      val a = 1L + 2L * i
      val b = 7919L * (i + 1)
      min(pmod(hash(col("shingle")).cast("long") * a + b, lit(p))).as(s"mh_$i")
    }
    val sig = ds.groupBy(col("doc_id")).agg(perms.head, perms.tail: _*)
    timed("signature agg")(sig.count())
    val bandStructs = (0 until Dedup.MinHashBands).map { b =>
      val slots = (0 until Dedup.MinHashK / Dedup.MinHashBands)
        .map(i => col(s"mh_${b * Dedup.MinHashBands + i}"))
      struct(lit(b).as("band"), hash(slots: _*).as("band_key"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
      .cache()
    timed("bands materialize")(bands.count())
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib")).distinct()
    timed("candidates")(println("  cand=" + cand.count()))
    val sa = docSets.select(col("doc_id").as("ia"), col("sh").as("sha"))
    val sb = docSets.select(col("doc_id").as("ib"), col("sh").as("shb"))
    val out = cand.join(sa, Seq("ia")).join(sb, Seq("ib"))
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("jaccard", col("common") / (size(col("sha")) + size(col("shb")) - col("common")))
      .filter(col("jaccard") >= 0.5)
    timed("verified output")(println("  out=" + out.count()))
    spark.stop()
  }
}
