package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: dump formatted physical plans for plan-hygiene review
  * (PushedFilters reaching the scan, broadcast joins on dims,
  * WholeStageCodegen coverage). Not part of the library surface.
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 4, appName = "graft-explain")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q02_revenue_by_nation", "q06_revenue_filter",
      "q20_part_revenue", "dedup_ngram_jaccard", "sim_topk_bruteforce",
      "q29_grouping_sets", "q31_unpivot", "text_training_set",
      "text_pack_sequences", "dedup_clusters", "q34_bucketed_join",
      "text_repetition", "sample_mixture", "text_source_overlap")
    names.foreach { n =>
      println(s"\n================ $n ================")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
