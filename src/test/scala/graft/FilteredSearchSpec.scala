package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, TextAnalysis}
import graft.sources.Tables

/** Round-5 additions: filtered vector search, hard-negative mining,
  * CCNet-style perplexity buckets. The DuckDB oracle hashes the full
  * outputs; these specs pin the semantic invariants the hash alone
  * doesn't name.
  */
class FilteredSearchSpec extends AnyFunSuite {
  import TestSession._

  test("sim_ann_filtered: every neighbor satisfies the metadata predicate") {
    val out = SparkEntry.queries("sim_ann_filtered")(spark, sf)
    val labels = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label"))
    val offSlice = out.join(labels, Seq("vec_id"))
      .filter(col("label") =!= Similarity.FilterLabel).count()
    assert(offSlice == 0, s"$offSlice neighbors violate label=${Similarity.FilterLabel}")
    // dense ranks 1..k per query
    val byQ = out.groupBy(col("qid"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("maxr"))
      .collect()
    assert(byQ.nonEmpty)
    byQ.foreach { r =>
      assert(r.getLong(1) <= Similarity.TopK && r.getLong(1) == r.getLong(2),
        s"qid ${r.get(0)}: ranks not dense 1..k")
    }
  }

  test("retrieval_hard_negatives: no neighbor shares the anchor's label") {
    val out = SparkEntry.queries("retrieval_hard_negatives")(spark, sf)
    val anchors = Tables(spark, sf).embeddings
      .filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("qid"), col("label").cast("long").as("q_label"))
    val clashes = out.join(anchors, Seq("qid"))
      .filter(col("neg_label") === col("q_label")).count()
    assert(clashes == 0, s"$clashes hard negatives share the anchor label")
  }

  test("text_ccnet_buckets: per-language tertiles are balanced and ordered") {
    val rows = SparkEntry.queries("text_ccnet_buckets")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, bs) =>
      assert(bs.length == TextAnalysis.CcnetBuckets, s"$lang: ${bs.length} buckets")
      val ns = bs.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"$lang: bucket sizes differ >1: ${ns.toSeq}")
      // bucket 1 is the head (highest avg log-prob): means must be
      // non-increasing with bucket id
      val means = bs.sortBy(_.getLong(1)).map(_.getDouble(3))
      means.sliding(2).foreach { case Array(a, b) =>
        assert(a >= b, s"$lang: head/tail means out of order: ${means.toSeq}")
      }
    }
  }
}
