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

  test("sim_two_stage_mrl: dense ranks, non-increasing cosine, quality bit present") {
    val rows = SparkEntry.queries("sim_two_stage_mrl")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq,
        s"qid $qid: ranks not dense")
      sorted.map(_.getDouble(3)).sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"qid $qid: cos not non-increasing")
        case _ => ()
      }
      // the bit is per-query constant
      assert(rs.map(_.getBoolean(4)).distinct.length == 1)
    }
  }

  test("q84_markov_transitions: rows normalize to 1 and pair mass equals transitions") {
    val out = SparkEntry.queries("q84_markov_transitions")(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$from: probabilities sum to $pSum")
    }
    val ev = Tables(spark, sf).events
    val nTransitions = ev.count() -
      ev.select(col("user_id")).distinct().count()
    assert(out.map(_.getLong(2)).sum == nTransitions,
      "pair mass != events - users (one lead per user stream)")
  }

  test("text_bpe_merges: 2-char pairs, non-increasing counts") {
    val rows = SparkEntry.queries("text_bpe_merges")(spark, sf).collect()
    assert(rows.length == TextAnalysis.BpeTopPairs)
    rows.foreach(r => assert(r.getString(1).length == 2, s"bad pair '${r.getString(1)}'"))
    rows.sortBy(_.getLong(0)).map(_.getLong(2)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "counts not non-increasing by rank")
      case _ => ()
    }
  }

  test("dedup_incremental: one verdict per increment doc, exact beats near") {
    import graft.operators.Dedup
    val out = SparkEntry.queries("dedup_incremental")(spark, sf)
    val docs = Tables(spark, sf).documents
    val nInc = docs.filter(col("doc_id") % Dedup.IncrMod === Dedup.IncrRem).count()
    assert(out.count() == nInc, "not exactly one verdict per increment doc")
    val statuses = out.select(col("status")).distinct().collect().map(_.getString(0)).toSet
    assert(statuses.subsetOf(Set("exact_dup", "near_dup", "new")))
    // every exact_dup has a byte-identical (normalized) corpus twin
    val norm = trim(regexp_replace(lower(col("text")), lit("\\s+"), lit(" ")))
    val hashed = docs.select(col("doc_id"), md5(norm.cast("binary")).as("h"))
    val corpus = hashed.filter(col("doc_id") % Dedup.IncrMod =!= Dedup.IncrRem)
      .select(col("h")).distinct()
    val exacts = out.filter(col("status") === "exact_dup").select(col("doc_id"))
    val unmatched = exacts.join(hashed, Seq("doc_id"))
      .join(corpus, Seq("h"), "left_anti").count()
    assert(unmatched == 0, s"$unmatched exact_dup rows lack a corpus twin")
  }

  test("sample_epoch_allocation: integer proration under-fills, epochs are exact ceils") {
    val rows = SparkEntry.queries("sample_epoch_allocation")(spark, sf).collect()
    assert(rows.nonEmpty)
    val targetSum = rows.map(_.getLong(3)).sum
    assert(targetSum <= TextAnalysis.EpochBudgetTokens,
      s"flooring proration must never over-allocate ($targetSum)")
    rows.foreach { r =>
      val (avail, target, epochs) = (r.getLong(1), r.getLong(3), r.getLong(4))
      val ceil = (target + avail - 1) / avail
      assert(epochs == ceil, s"${r.getString(0)}: epochs $epochs != ceil $ceil")
      assert(r.getDouble(5) > 0 && r.getDouble(5) <= epochs)
    }
  }

  test("stream_incremental_dedup verdicts equal dedup_incremental's exact leg") {
    val streamed = SparkEntry.queries("stream_incremental_dedup")(spark, sf)
      .select(col("doc_id"), col("exact_dup"))
    val batch = SparkEntry.queries("dedup_incremental")(spark, sf)
      .select(col("doc_id"), (col("status") === "exact_dup").as("exact_dup"))
    assert(streamed.count() == batch.count())
    val disagree = streamed.join(batch.withColumnRenamed("exact_dup", "b"), Seq("doc_id"))
      .filter(col("exact_dup") =!= col("b")).count()
    assert(disagree == 0, s"$disagree stream≠batch exact verdicts")
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

  test("range search equals a dense cosine sweep at the radius") {
    val vecs = Similarity.corpusOf(spark, sf)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (for {
      q <- vecs.keys.filter(_ < Similarity.NumQueries)
      c <- vecs.keys if c != q
      s = cos(vecs(q), vecs(c)) if s >= Similarity.RangeTau
    } yield (q, c) -> s).toMap
    val got = SparkEntry.queries("sim_range_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // guard the only approximation: no pair may sit so close to the
    // radius that engine-order float differences could flip it
    want.values.foreach(s => assert(math.abs(s - Similarity.RangeTau) > 1e-9))
    assert(got.keySet == want.keySet, "neighbor set differs from dense sweep")
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-6, s"cos of $k drifted")
    }
  }
}
