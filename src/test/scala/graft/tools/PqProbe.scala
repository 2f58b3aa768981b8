package graft.tools

import graft.GraftSession
import graft.operators.Similarity

/** Dev probe: measured recall of the quantized ANN paths vs exact,
  * used to calibrate the registered recall gates. Not library surface.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 32, appName = "graft-pq-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val base = Similarity.corpusOf(spark, dir).cache()
    val exact = Similarity.exactTopK(base)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val got = df.select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"RECALL $name%-12s ${got.intersect(exact).size.toDouble / exact.size}%.3f")
    }
    recall("pq", Similarity.pqTopK(base))
    recall("ivfpq", Similarity.ivfPqTopK(base))
    spark.stop()
  }
}
