package graft

import org.apache.spark.sql.SparkSession

/** The session-memoized frames several query families share: the
  * dedup pair graphs (shingle Jaccard, its connected components, the
  * blocked-cosine pairs) and the co-purchase graphs (unweighted +
  * weighted). Bench builds them under ONE explicitly-timed
  * `_shared_build` row so the sweep's per-query numbers measure each
  * query on top of the shared frames instead of charging the build to
  * whichever family member runs first alphabetically.
  */
object SharedBuilds {

  /** Force every memoized shared frame for (session, dir). Safe to
    * call repeatedly — memo hits are no-ops.
    */
  def buildAll(s: SparkSession, dir: String): Unit = {
    operators.Dedup.jaccardPairsShared(s, dir, operators.Dedup.MaxShingleDf)
    operators.Dedup.jaccardClustersShared(s, dir, operators.Dedup.MaxShingleDf)
    operators.Dedup.cosinePairsShared(s, dir, operators.Dedup.CosineThreshold)
    operators.Graph.copurchaseGraphShared(s, dir)
    operators.Graph.copurchaseWeightedShared(s, dir)
    operators.TextAnalysis.bm25RankedShared(s, dir)
    operators.TextAnalysis.scoredDocsShared(s, dir)
    operators.TextAnalysis.perSourceExcessKlShared(s, dir)
  }

  /** Drop every memoized shared frame (unpersisting live entries) so
    * the next buildAll runs cold.
    */
  def clearAll(): Unit = {
    operators.Dedup.clearSharedCaches()
    operators.Graph.clearSharedCaches()
    operators.TextAnalysis.clearSharedCaches()
  }

  /** Is `df` one of the LIVE memoized shared frames? Queries may
    * return a shared frame directly (dedup_ngram_jaccard,
    * dedup_embedding_cosine); the harness's output-pin unpersist must
    * skip those or sibling queries silently rebuild the shared work.
    * Reference equality suffices — the memo hands out one instance.
    */
  def isShared(df: org.apache.spark.sql.DataFrame): Boolean =
    (operators.Dedup.liveSharedFrames ++ operators.Graph.liveSharedFrames ++
      operators.TextAnalysis.liveSharedFrames)
      .exists(_ eq df)
}
