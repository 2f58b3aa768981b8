package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.GraftQuery
import graft.sources.Tables
import graft.functions.GraftFunctions._

import scala.util.Random

/** Similarity search over the embedding column (64-dim float
  * vectors).
  *
  * Two paths, per the builder brief:
  *  - brute-force cosine top-k: exact baseline. The query set is tiny
  *    and broadcast, so the "product" is a broadcast nested loop over
  *    one scan of the corpus — no shuffle of the corpus at all. This
  *    is also the oracle-checkable path.
  *  - hyperplane-LSH ANN: sign bits of r·v for a fixed seeded set of
  *    random hyperplanes form a bucket key; search only within the
  *    query's bucket. At 100 TB the corpus is pre-bucketed (one
  *    shuffle at index build), queries probe single buckets, and
  *    recall is tunable via planes/probes. Recall vs. the exact
  *    baseline is pinned in TextDedupSpec.
  */
object Similarity {

  val Dim = 64
  /** Multi-table LSH: L independent tables of `BitsPerTable` sign
    * bits. More tables raise recall (union of collisions), more bits
    * shrink buckets; L×(n/2^bits) candidates per query. Tuned here
    * for an isotropic random corpus (the hardest ANN case); a real
    * clustered embedding space needs fewer tables.
    */
  val NumTables = 8
  val BitsPerTable = 7
  val TopK = 5
  val NumQueries = 10

  /** Fixed, seeded hyperplanes per table (deterministic across runs). */
  lazy val planes: Array[Array[Array[Double]]] = {
    val rnd = new Random(42)
    Array.fill(NumTables, BitsPerTable, Dim)(rnd.nextGaussian())
  }

  /** LSH bucket id for one table: packed sign bits of projections. */
  def bucketOf(v: Column, table: Int): Column = {
    val bits = planes(table).zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dotProduct(v, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** (vec_id, v) corpus projection — the shared input of every path. */
  private def corpus(t: Tables): DataFrame =
    t.embeddings.select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))

  /** Spec convenience: the corpus projection from a table dir. */
  def corpusOf(s: SparkSession, dir: String): DataFrame = corpus(Tables(s, dir))

  /** Exact cosine top-k for the first NumQueries vectors: broadcast
    * nested-loop over one corpus scan + per-query window rank.
    */
  def exactTopK(e: DataFrame): DataFrame = {
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    e.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("cos", cosineSim(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Exact top-k neighbors for the first NumQueries vectors by
    * cosine, via broadcast nested-loop + per-query window rank.
    */
  val simTopkBruteforce = GraftQuery(
    "sim_topk_bruteforce",
    (s, dir) => exactTopK(corpus(Tables(s, dir))),
    Some(s"""
      WITH pairs AS (
        SELECT q.vec_id AS qid, e.vec_id,
               list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) AS cos
        FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < $NumQueries),
      ranked AS (
        SELECT qid, vec_id, cos,
               CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
        FROM pairs)
      SELECT qid, rank, vec_id, round(cos, 6) AS cos
      FROM ranked WHERE rank <= $TopK
      ORDER BY qid, rank
    """)
  )

  /** ANN top-k via hyperplane-LSH bucketing: candidates share the
    * query's bucket; rank within candidates only. `base` must be the
    * cached (vec_id, v) corpus frame.
    */
  def annLshTopK(base: DataFrame): DataFrame = {
    // one (table, bucket) row per vector per table — the "index"
    // carries only (vec_id, tbl, bucket): vectors never ride the
    // bucket join or the candidate-dedup shuffle
    val indexed = (0 until NumTables).map { tb =>
      base.select(col("vec_id"), lit(tb).as("tbl"),
        bucketOf(col("v"), tb).as("bucket"))
    }.reduce(_ unionByName _)
    val qvecs = base.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val qIndexed = (0 until NumTables).map { tb =>
      qvecs.select(col("qid"), lit(tb).as("tbl"),
        bucketOf(col("qv"), tb).as("bucket"))
    }.reduce(_ unionByName _)
    // candidate dedup on two longs, THEN re-attach vectors: corpus
    // vector via one id join, query vector via broadcast
    val cand = indexed.join(broadcast(qIndexed), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id")).distinct()
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    cand
      .join(base, Seq("vec_id"))
      .join(broadcast(qvecs), Seq("qid"))
      .withColumn("cos", cosineSim(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Recall floor for the harness gate. On this isotropic random
    * corpus (the ANN worst case) both index structures sit near their
    * recall floor; the registered queries gate at the same 0.2 the
    * spec pins — a plumbing/regression tripwire, deterministic across
    * corpus refreshes, while TextDedupSpec tracks the measured value.
    */
  val AnnRecallGate = 0.2

  /** Oracle-checkable ANN summary: exact columns DuckDB can compute
    * (n_queries from the data, k) + a Spark-computed recall boolean
    * vs the in-query exact top-k. The neighbor lists themselves are
    * engine-specific (index-dependent), so they stay the operator
    * output (`annLshTopK`/`annIvfTopK`) while the harness hashes this
    * summary.
    */
  private def recallSummary(
      base: DataFrame, ann: DataFrame,
      gate: Double = AnnRecallGate): DataFrame = {
    val exact = exactTopK(base).select(col("qid"), col("vec_id"))
    val hits = ann.select(col("qid"), col("vec_id"))
      .join(exact, Seq("qid", "vec_id"))
      .agg(count(lit(1)).as("hits"))
    val nq = base.filter(col("vec_id") < NumQueries)
      .agg(count(lit(1)).as("n_queries"))
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    nq.crossJoin(nExact).crossJoin(hits)
      .select(col("n_queries"),
        lit(TopK).cast("long").as("k"),
        (col("hits") >= col("n_exact") * gate).as("recall_ok"))
  }

  private val annOracleSql = s"""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
             CAST($TopK AS BIGINT) AS k,
             TRUE AS recall_ok
      FROM embeddings WHERE vec_id < $NumQueries
    """

  val simAnnLsh = GraftQuery(
    "sim_ann_lsh",
    (s, dir) => {
      val base = corpus(Tables(s, dir)).cache()
      val out = recallSummary(base, annLshTopK(base))
      out.persist().count()
      base.unpersist(false)
      out
    },
    Some(annOracleSql)
  )

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    * vector to its nearest centroid; queries probe only the
    * `NProbe` nearest cells. At 100 TB the index build is one KMeans
    * fit + one partitioned write clustered by cell id; each query
    * scans NProbe/NCells of the corpus. On clustered embedding
    * spaces this beats hyperplane LSH recall at equal scan fraction
    * (on this isotropic random corpus both are near their floor —
    * the spec pins plumbing + recall lower bound).
    */
  val NCells = 16
  val NProbe = 4

  /** IVF ANN top-k. `base` must be the cached (vec_id, v) corpus. */
  def annIvfTopK(base: DataFrame): DataFrame = {
    val centroids = coarseCentroids(base)
    val indexed = withCell(base, centroids)
    // probe cells per query: distance of the query vector to every
    // centroid, keep the NProbe nearest cell ids
    val queries = base.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .withColumn("cells", {
        val dists = centroids.zipWithIndex.map { case (c, i) =>
          val cCol = array(c.map(lit): _*)
          struct(
            aggregate(zip_with(col("qv"), cCol, (x, y) => (x - y) * (x - y)),
              lit(0.0), (acc, x) => acc + x).as("d"),
            lit(i).as("cell"))
        }
        slice(array_sort(array(dists: _*)), 1, NProbe)
      })
      .select(col("qid"), col("qv"), explode(col("cells.cell")).as("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    indexed.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosineSim(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  val simAnnIvf = GraftQuery(
    "sim_ann_ivf",
    (s, dir) => {
      val base = corpus(Tables(s, dir)).cache()
      val out = recallSummary(base, annIvfTopK(base))
      out.persist().count()
      base.unpersist(false)
      out
    },
    Some(annOracleSql)
  )

  /** Vector norms + global norm stats — exercises the higher-order
    * array math on the embedding column end-to-end with an exact
    * oracle (sequential fold order ⇒ bit-identical sums).
    */
  val simNormStats = GraftQuery(
    "sim_norm_stats",
    (s, dir) => {
      val t = Tables(s, dir)
      t.embeddings
        .select(col("vec_id"), col("label"),
          round(l2Norm(toDoubleArray(col("embedding"))), 6).as("norm"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n"),
          round(min(col("norm")), 6).as("min_norm"),
          round(max(col("norm")), 6).as("max_norm")
        )
        .orderBy(col("label"))
    },
    Some("""
      WITH norms AS (
        SELECT vec_id, label,
               round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS norm
        FROM embeddings)
      SELECT label, COUNT(*) AS n,
             round(MIN(norm), 6) AS min_norm,
             round(MAX(norm), 6) AS max_norm
      FROM norms
      GROUP BY label
      ORDER BY label
    """)
  )

  /** Semantic-dedup clustering: a KMeans coarse quantizer partitions
    * the corpus, then near-dup pairs (cosine ≥ threshold) are found
    * WITHIN cells only — the composition that turns O(n²) all-pairs
    * semantic dedup into Σ n_c² work, the standard scale path for
    * embedding dedup at 100 TB (cluster → shuffle once on cell id →
    * per-cell pairwise; a cell that outgrows memory recursively feeds
    * the blocked kernel dedup_embedding_cosine uses). Each vector is
    * soft-assigned to its `SoftAssign` nearest cells so pairs
    * straddling a cell boundary still meet; candidate pairs dedup on
    * ids before counting.
    */
  val DedupK = 16
  val SoftAssign = 2
  val DedupCosine = 0.35

  /** Recall gate vs the exact all-pairs baseline. Near-dup pairs at
    * threshold 0.35 include borderline pairs whose members can land
    * in disjoint cells even with soft assignment; the floor is a
    * regression tripwire (measured ≈ 0.68 at sf0.001 — this corpus
    * is isotropic random, the clustering worst case; real embedding
    * spaces cluster, which is the regime the composition exists
    * for), deterministic for a fixed corpus + seed.
    */
  val ClusterRecallGate = 0.5

  /** (cell, secondCell, id, v) soft assignment against fixed
    * centroids, computed with primitive loops (no per-row HOFs).
    */
  private[graft] def softAssign(
      base: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    base.as[(Long, Array[Double])].map { case (id, v) =>
      var best = -1; var bestD = Double.MaxValue
      var second = -1; var secondD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val ct = centroids(c)
        var d = 0.0; var i = 0
        while (i < v.length) { val t = v(i) - ct(i); d += t * t; i += 1 }
        if (d < bestD) { second = best; secondD = bestD; best = c; bestD = d }
        else if (d < secondD) { second = c; secondD = d }
        c += 1
      }
      (best, second, id, v)
    }.toDF("cell", "cell2", "vec_id", "v")
  }

  /** Within-cell near-dup pairs: one shuffle on cell id, then a
    * primitive pairwise kernel per cell (norms precomputed once).
    */
  private[graft] def withinCellPairs(soft: DataFrame, threshold: Double): DataFrame = {
    val s = soft.sparkSession
    import s.implicits._
    val exploded = soft.select(col("vec_id"), col("v"),
        explode(array(col("cell"), col("cell2"))).as("c"))
      .as[(Long, Array[Double], Int)]
    exploded.groupByKey(_._3).flatMapGroups { (_, it) =>
      // the shared upper-triangle kernel (Dedup.cosinePairsUpper) —
      // one implementation of the primitive cosine math
      val arr = it.map { case (id, v, _) => (id, v) }.toArray.sortBy(_._1)
      Dedup.cosinePairsUpper(arr, threshold).map { case (ia, ib, _) => (ia, ib) }
    }.toDF("ia", "ib").distinct()
  }

  /** Oracle-checkable summary: exact corpus/pair counts DuckDB
    * recomputes + two Spark-verified gates — assignment parity
    * (MLlib's transform equals a direct argmin over the centroids)
    * and recall of the within-cell pairs vs the exact all-pairs
    * baseline.
    */
  val clusterSemanticDedup = GraftQuery(
    "cluster_semantic_dedup",
    (s, dir) => {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val base = corpus(Tables(s, dir)).cache()
      val featured = base.withColumn("features", array_to_vector(col("v")))
      val km = new KMeans().setK(DedupK).setSeed(42L).setMaxIter(10)
        .setFeaturesCol("features").setPredictionCol("cell")
      val model = km.fit(featured)
      val centroids = model.clusterCenters.map(_.toArray)
      val soft = softAssign(base, centroids).cache()
      // assignment parity: the quantizer's own transform must agree
      // with the direct argmin (ties are measure-zero on this corpus)
      val mismatches = model.transform(featured)
        .select(col("vec_id"), col("cell").as("ml_cell"))
        .join(soft.select(col("vec_id"), col("cell")), Seq("vec_id"))
        .filter(col("ml_cell") =!= col("cell"))
        .agg(count(lit(1)).as("n_mismatch"))
      val clustered = withinCellPairs(soft, DedupCosine)
      // shared memoized cosine pair graph (same frame as
      // dedup_embedding_cosine / dedup_multisignal)
      val exact = Dedup.cosinePairsShared(s, dir, DedupCosine)
        .select(col("ia"), col("ib"))
      val hits = clustered.join(exact, Seq("ia", "ib"))
        .agg(count(lit(1)).as("n_hit"))
      val out = base.agg(count(lit(1)).as("n_vectors"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact_pairs")))
        .crossJoin(mismatches).crossJoin(hits)
        .select(
          col("n_vectors"), col("n_exact_pairs"),
          (col("n_mismatch") === 0).as("assign_ok"),
          (col("n_hit") >= col("n_exact_pairs") * ClusterRecallGate)
            .as("recall_ok"))
      out.persist().count()
      soft.unpersist(false)
      base.unpersist(false)
      out
    },
    Some(s"""
      SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n_vectors,
             CAST((SELECT COUNT(*)
                   FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                   WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])) >= $DedupCosine)
                  AS BIGINT) AS n_exact_pairs,
             TRUE AS assign_ok,
             TRUE AS recall_ok
    """)
  )

  /** PCA components kept. */
  val PcaK = 16

  /** PCA dimensionality reduction over the embedding corpus — the
    * standard pre-step before IVF/clustering at scale (project 64→16
    * dims, 4× less memory and compute per distance). Data is centered
    * FIRST (MLlib's PCA fits on the covariance but transforms
    * uncentered vectors — the known quirk; centering restores the
    * textbook algebra). Gates are mathematical identities, not
    * tolerances-of-convenience: explained-variance fractions must be
    * non-increasing, and because the component basis is orthonormal,
    * the mean squared residual must equal (1 − Σ explained) · total
    * variance — computable from ‖x‖² − ‖proj‖² without materializing
    * any reconstruction. Oracle hashes the exact corpus counts +
    * identity booleans.
    */
  val simPcaReduce = GraftQuery(
    "sim_pca_reduce",
    (s, dir) => {
      import org.apache.spark.ml.feature.PCA
      import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
      val base = corpus(Tables(s, dir)).cache()
      // center: subtract the per-dimension mean
      val meanArr = base
        .select(posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("i")).agg(avg(col("x")).as("m"))
        .orderBy(col("i")).collect().map(_.getDouble(1))
      val meanCol = array(meanArr.map(lit): _*)
      val centered = base
        .select(col("vec_id"), zip_with(col("v"), meanCol, (x, m) => x - m).as("c"))
        .withColumn("features", array_to_vector(col("c")))
        .cache()
      val model = new PCA().setK(PcaK)
        .setInputCol("features").setOutputCol("proj").fit(centered)
      val explained = model.explainedVariance.toArray
      val ordered = explained.zip(explained.tail).forall { case (a, b) => a >= b + -1e-12 }
      val residualFrac = 1.0 - explained.sum
      val stats = model.transform(centered)
        .select(
          aggregate(col("c"), lit(0.0), (acc, x) => acc + x * x).as("norm2"),
          aggregate(vector_to_array(col("proj")), lit(0.0),
            (acc, x) => acc + x * x).as("proj2"))
        .agg(avg(col("norm2")).as("tv"), avg(col("norm2") - col("proj2")).as("res"))
        .head
      val (tv, res) = (stats.getDouble(0), stats.getDouble(1))
      val identityOk = math.abs(res - residualFrac * tv) <= 0.01 * tv
      val out = base.agg(count(lit(1)).as("n_vectors"))
        .select(col("n_vectors"),
          lit(Dim.toLong).as("dim"), lit(PcaK.toLong).as("k"),
          lit(ordered).as("variance_ordered"),
          lit(identityOk).as("residual_identity_ok"))
      out.persist().count()
      centered.unpersist(false)
      base.unpersist(false)
      out
    },
    Some(s"""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
             CAST($Dim AS BIGINT) AS dim,
             CAST($PcaK AS BIGINT) AS k,
             TRUE AS variance_ordered,
             TRUE AS residual_identity_ok
      FROM embeddings
    """)
  )

  /** Scalar (int8) quantization recall gate: SQ stores each dimension
    * as one byte against per-dimension [min, max] — 8× smaller than
    * the float64 working set (4× vs float32), the memory/IO lever
    * that lets a 100 TB embedding corpus fit a scan budget (and the
    * building block FAISS-style indexes combine with IVF). Distance
    * is computed against the DEQUANTIZED vector (asymmetric distance
    * computation: the query stays full-precision), so the only error
    * is the ≤ (hi−lo)/510 per-dim rounding. On this corpus recall vs
    * exact top-k must clear 0.8 (measured ~1.0; the LSH/IVF queries
    * gate at 0.2 because bucketing, not precision, bounds them).
    *
    * Scale shape: per-dim ranges are one combine-enabled aggregate
    * (64 rows to the driver — model-sized, like imputation stats);
    * quantize + dequantize are one codegen projection each; scoring
    * is the same broadcast-queries single-scan as the exact baseline.
    */
  val SqRecallGate = 0.8

  def sqQuantTopK(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    val ranges = base
      .select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("d"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val losC = array(ranges.map(r => lit(r._1)): _*)
    val hisC = array(ranges.map(r => lit(r._2)): _*)
    // codes: byte per dim; constant dims (hi == lo) pin to code 0 so
    // the 0/0 division can never emit NaN
    val codes = transform(col("v"), (x, i) => {
      val lo = element_at(losC, (i + 1).cast("int"))
      val hi = element_at(hisC, (i + 1).cast("int"))
      when(hi === lo, lit(0))
        .otherwise(round((x - lo) * 255.0 / (hi - lo)).cast("int"))
    })
    val recon = transform(col("codes"), (c, i) => {
      val lo = element_at(losC, (i + 1).cast("int"))
      val hi = element_at(hisC, (i + 1).cast("int"))
      lo + c.cast("double") * (hi - lo) / 255.0
    })
    // the "index at rest" carries only (vec_id, codes); vectors are
    // reconstructed per scan, queries ride a broadcast at full precision
    val index = base.select(col("vec_id"), codes.as("codes"))
      .withColumn("rv", recon)
    val queries = base.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    index.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("cos", cosineSim(col("qv"), col("rv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("vec_id"))
      .orderBy(col("qid"), col("rank"))
  }

  val simSqQuant = GraftQuery(
    "sim_sq_quant",
    (s, dir) => {
      val base = corpus(Tables(s, dir)).cache()
      val out = recallSummary(base, sqQuantTopK(base), SqRecallGate)
      out.persist().count()
      base.unpersist(false)
      out
    },
    Some(annOracleSql)
  )

  /** Embedding-decontamination threshold and benchmark slice size.
    * Complements the n-gram decontamination in TextAnalysis: lexical
    * overlap misses paraphrases; cosine against the benchmark's
    * embeddings is the semantic net (the shape used to scrub eval
    * sets out of pretraining corpora).
    */
  val DecontamThreshold = 0.35
  val BenchmarkSize = 25

  /** Semantic (embedding-level) train/benchmark decontamination: for
    * every corpus vector, its max cosine against ANY benchmark vector
    * and the keep/drop flag. The benchmark set (eval suites — always
    * tiny next to a training corpus) BROADCASTS; the corpus streams
    * through one scan with a map-side-combinable max — no shuffle
    * keyed on the benchmark, no pair materialization. At 100 TB this
    * is scan-bound, the same posture as [[exactTopK]].
    */
  val simEmbedDecontam = GraftQuery(
    "sim_embed_decontam",
    (s, dir) => {
      val e = corpus(Tables(s, dir))
      val bench = e.filter(col("vec_id") < BenchmarkSize)
        .select(col("vec_id").as("bid"), col("v").as("bv"))
      e.filter(col("vec_id") >= BenchmarkSize)
        .crossJoin(broadcast(bench))
        .groupBy(col("vec_id"))
        .agg(max(cosineSim(col("v"), col("bv"))).as("mc"))
        .select(col("vec_id"),
          round(col("mc"), 6).as("max_cos"),
          (col("mc") >= DecontamThreshold).as("contaminated"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH mc AS (
        SELECT c.vec_id,
               MAX(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[]))) AS mc
        FROM embeddings c JOIN embeddings b ON b.vec_id < $BenchmarkSize
        WHERE c.vec_id >= $BenchmarkSize
        GROUP BY c.vec_id)
      SELECT vec_id, round(mc, 6) AS max_cos,
             mc >= $DecontamThreshold AS contaminated
      FROM mc ORDER BY vec_id
    """)
  )

  /** Product quantization: M subspaces × K centroids (4 bits/sub ⇒
    * 8 codes = 4 bytes per 64-dim vector, a 128× compression of the
    * float64 working set — the FAISS-style memory lever that, composed
    * with the IVF coarse quantizer, is how billion-vector indexes
    * fit). Corpus and queries are unit-normalized first so cosine =
    * dot and ADC decomposes into per-subspace table lookups.
    */
  val PqSubspaces = 8
  val PqCodebook = 16

  /** Recall floor vs exact top-k. At 0.5 bits/dim on an ISOTROPIC
    * random corpus (the PQ worst case — nothing clusters, quantization
    * noise is commensurate with the cosine gaps) recall is
    * structurally low; the gate is a deterministic regression
    * tripwire, not a quality claim. Real embedding spaces concentrate
    * on low-dim manifolds where the same code budget gives >0.9 —
    * and the IVF composition restores recall via multi-cell probing.
    */
  val PqRecallGate = 0.2

  /** Training-sample cap for the driver-side codebook fits. 16k ×
    * 64-dim doubles = 8 MB on the driver — model-sized like the PQ
    * LUTs. FAISS trains on ~39×k to 256×k points; 16k covers k ≤ 64
    * comfortably.
    */
  val CodebookTrainSample = 16384

  /** Deterministic driver-side training sample: the CodebookTrainSample
    * hash-smallest vec_ids — a per-partition bounded-heap top-k (no
    * global sort materializes), collected and re-sorted by vec_id so
    * the local fits accumulate in one canonical order regardless of
    * task scheduling.
    */
  private def trainSample(df: DataFrame, vecCol: String): Array[Array[Double]] = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("vec_id"), col(vecCol))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(CodebookTrainSample)
      .as[(Long, Array[Double])].collect()
      .sortBy(_._1).map(_._2)
  }

  /** PQ codebooks: one seeded local k-means per subspace over the
    * sample's unit-normalized sub-slices. The fit runs DRIVER-SIDE on
    * a bounded sample (graft.functions.LocalKMeans — see its scaladoc
    * for why a distributed fit per subspace is the wrong shape:
    * codebooks are model-sized and M sequential MLlib fits are pure
    * scheduler latency, the round-7 drift); encode stays the
    * full-corpus map-side pass.
    */
  private def pqCodebooks(unit: DataFrame): Array[Array[Array[Double]]] = {
    val sample = trainSample(unit, "u")
    val subDim = Dim / PqSubspaces
    (0 until PqSubspaces).map { m =>
      val pts = sample.map(u => java.util.Arrays.copyOfRange(u, m * subDim, (m + 1) * subDim))
      graft.functions.LocalKMeans.fitBest(pts, PqCodebook, 25, 42L + m)
    }.toArray
  }

  /** IVF coarse quantizer: seeded local k-means over a driver-side
    * sample of the RAW (un-normalized) corpus — shared by sim_ann_ivf
    * and sim_ann_ivfpq so the two gates always exercise the same
    * coarse geometry.
    */
  private def coarseCentroids(base: DataFrame): Array[Array[Double]] =
    graft.functions.LocalKMeans.fitBest(trainSample(base, "v"), NCells, 25, 42L)

  /** Full-corpus cell assignment: broadcast centroids + one map-side
    * primitive-loop pass — (vec_id, v, cell). At 100 TB this is the
    * index build's only corpus-scale work (plus the clustered write).
    */
  private def withCell(base: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(centroids)
    base.select(col("vec_id"), col("v")).as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, v) =>
        (id, v, graft.functions.LocalKMeans.nearestIdx(bc.value, v))
      }).toDF("vec_id", "v", "cell")
  }

  /** (vec_id, u) unit-normalized corpus (cosine ⇒ dot). */
  private def unitCorpus(base: DataFrame): DataFrame =
    base.select(col("vec_id"), col("v"), l2Norm(col("v")).as("n"))
      .select(col("vec_id"), transform(col("v"), x => x / col("n")).as("u"))

  /** Nearest-codeword PQ encode of the unit corpus: (vec_id, codes)
    * via broadcast codebooks + primitive loops, map-side. Shared by
    * the PQ and IVF-PQ paths — the encode math must never diverge
    * between the two gated queries.
    */
  private def pqEncode(unit: DataFrame, cbs: Array[Array[Array[Double]]]): DataFrame = {
    val s = unit.sparkSession
    import s.implicits._
    val subDim = Dim / PqSubspaces
    val bc = s.sparkContext.broadcast(cbs)
    unit.as[(Long, Array[Double])].map { case (id, u) =>
      val codes = new Array[Int](PqSubspaces)
      var m = 0
      while (m < PqSubspaces) {
        val cb = bc.value(m)
        var best = 0; var bestD = Double.MaxValue; var k = 0
        while (k < cb.length) {
          var d = 0.0; var i = 0
          while (i < subDim) {
            val t = u(m * subDim + i) - cb(k)(i); d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; best = k }
          k += 1
        }
        codes(m) = best; m += 1
      }
      (id, codes)
    }.toDF("vec_id", "codes")
  }

  /** Per-query ADC lookup tables `lut[m][k] = ⟨q_m, c_mk⟩`, driver-
    * built (query-count × M × K doubles — model-sized, like the
    * imputation stats). Shared by the PQ and IVF-PQ paths.
    */
  private def pqQueryLuts(
      unit: DataFrame, cbs: Array[Array[Array[Double]]]): Array[(Long, Array[Array[Double]])] = {
    val s = unit.sparkSession
    import s.implicits._
    val subDim = Dim / PqSubspaces
    unit.filter(col("vec_id") < NumQueries)
      .as[(Long, Array[Double])].collect().sortBy(_._1)
      .map { case (qid, qu) =>
        val lut = Array.ofDim[Double](PqSubspaces, PqCodebook)
        var m = 0
        while (m < PqSubspaces) {
          var k = 0
          while (k < PqCodebook) {
            var d = 0.0; var i = 0
            while (i < subDim) { d += qu(m * subDim + i) * cbs(m)(k)(i); i += 1 }
            lut(m)(k) = d; k += 1
          }
          m += 1
        }
        (qid, lut)
      }
  }

  /** PQ ANN top-k by asymmetric distance computation: encode the
    * corpus to 4-bit codes (broadcast codebooks + primitive loops,
    * map-side), build per-query LUTs `lut[m][k] = ⟨q_m, c_mk⟩`
    * (query-count × M × K doubles — model-sized, driver-built like
    * the imputation stats), then score every vector in O(M) table
    * adds instead of O(Dim) multiplies. One corpus scan, no shuffle
    * before the per-query top-k window.
    */
  def pqTopK(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    val unit = unitCorpus(base).cache()
    val cbs = pqCodebooks(unit)
    val encoded = pqEncode(unit, cbs)
    val bl = s.sparkContext.broadcast(pqQueryLuts(unit, cbs))
    val scored = encoded.as[(Long, Array[Int])].mapPartitions { it =>
      it.flatMap { case (id, codes) =>
        bl.value.iterator.filter(_._1 != id).map { case (qid, lut) =>
          var sc = 0.0; var m = 0
          while (m < PqSubspaces) { sc += lut(m)(codes(m)); m += 1 }
          (qid, id, sc)
        }
      }
    }.toDF("qid", "vec_id", "score")
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    val out = scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("vec_id"))
      .orderBy(col("qid"), col("rank"))
    out.persist().count()
    unit.unpersist(false)
    out
  }

  /** IVF-PQ recall floor: the probed-cell filter (IVF, ~NProbe/NCells
    * of the corpus scanned) composes with PQ's quantized scoring, so
    * recall ≤ min(IVF, PQ) — on this isotropic corpus both components
    * sit near their structural floor. The gate is the deterministic
    * regression tripwire for the COMPOSITION plumbing.
    */
  val IvfPqRecallGate = 0.15

  /** IVF-PQ: the FAISS-style composition — an IVF coarse quantizer
    * prunes the corpus to the query's NProbe nearest cells, and PQ
    * asymmetric-distance scoring ranks only those candidates from
    * 4-bit codes. At 100 TB this is THE billion-vector serving shape:
    * the index at rest is (cell, codes) = a few bytes/vector
    * partitioned by cell, a query touches NProbe partitions and does
    * O(M) table adds per candidate. Both components are the ones
    * independently gated by sim_ann_ivf and sim_ann_pq; this query
    * pins their composition.
    */
  def ivfPqTopK(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    // coarse quantizer: same seeded fit as the IVF query
    val centroids = coarseCentroids(base)
    val cells = withCell(base, centroids).select(col("vec_id"), col("cell"))
    // fine quantizer: PQ codes over the unit-normalized corpus
    val unit = unitCorpus(base).cache()
    val cbs = pqCodebooks(unit)
    val encoded = pqEncode(unit, cbs).join(cells, Seq("vec_id"))
    // probe cells per query (raw-space centroid distances, as IVF)
    val queryCells = base.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .withColumn("cells", {
        val dists = centroids.zipWithIndex.map { case (c, i) =>
          val cCol = array(c.map(lit): _*)
          struct(
            aggregate(zip_with(col("qv"), cCol, (x, y) => (x - y) * (x - y)),
              lit(0.0), (acc, x) => acc + x).as("d"),
            lit(i).as("cell"))
        }
        slice(array_sort(array(dists: _*)), 1, NProbe)
      })
      .select(col("qid"), explode(col("cells.cell")).as("cell"))
    // per-query ADC lookup tables, driver-built (model-sized)
    val bl = s.sparkContext.broadcast(pqQueryLuts(unit, cbs).toMap)
    val scored = encoded.join(broadcast(queryCells), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("codes"))
      .as[(Long, Long, Seq[Int])]
      .mapPartitions(_.map { case (qid, id, codes) =>
        val lut = bl.value(qid)
        var sc = 0.0; var m = 0
        while (m < PqSubspaces) { sc += lut(m)(codes(m)); m += 1 }
        (qid, id, sc)
      }).toDF("qid", "vec_id", "score")
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    val out = scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("vec_id"))
      .orderBy(col("qid"), col("rank"))
    out.persist().count()
    unit.unpersist(false)
    out
  }

  val simAnnIvfPq = GraftQuery(
    "sim_ann_ivfpq",
    (s, dir) => {
      val base = corpus(Tables(s, dir)).cache()
      val out = recallSummary(base, ivfPqTopK(base), IvfPqRecallGate)
      out.persist().count()
      base.unpersist(false)
      out
    },
    Some(annOracleSql)
  )

  val simAnnPq = GraftQuery(
    "sim_ann_pq",
    (s, dir) => {
      val base = corpus(Tables(s, dir)).cache()
      val out = recallSummary(base, pqTopK(base), PqRecallGate)
      out.persist().count()
      base.unpersist(false)
      out
    },
    Some(annOracleSql)
  )

  /** Corpus-side predicate for the filtered search (serving systems
    * call this "pre-filtering": the metadata constraint applies BEFORE
    * the vector kernel, not to its results).
    */
  val FilterLabel = 1

  /** Filtered vector search: exact cosine top-k restricted to corpus
    * rows satisfying a metadata predicate (`label = FilterLabel`) —
    * the "vector search with filters" serving shape (find similar
    * docs *within a language/license/domain slice*). The predicate is
    * a plain column filter on the scan side, so Catalyst pushes it
    * into the parquet reader (PushedFilters on `label`) and the
    * broadcast nested-loop kernel only ever sees the surviving slice.
    * At 100 TB the same query runs against the IVF index with the
    * filter applied inside probed cells (post-filter per cell, union,
    * re-rank) — selective filters make brute-force-over-the-slice the
    * FASTER plan, which is exactly what this shape is: scan-prune +
    * kernel, no index required.
    */
  val simAnnFiltered = GraftQuery(
    "sim_ann_filtered",
    (s, dir) => {
      val t = Tables(s, dir)
      val e = t.embeddings
      val queries = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), toDoubleArray(col("embedding")).as("qv"))
      val slice = e.filter(col("label") === FilterLabel)
        .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      slice.join(broadcast(queries), col("vec_id") =!= col("qid"))
        .withColumn("cos", cosineSim(col("qv"), col("v")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"""
      WITH pairs AS (
        SELECT q.vec_id AS qid, e.vec_id,
               list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) AS cos
        FROM embeddings q JOIN embeddings e
          ON e.vec_id <> q.vec_id AND e.label = $FilterLabel
        WHERE q.vec_id < $NumQueries),
      ranked AS (
        SELECT qid, vec_id, cos,
               CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
        FROM pairs)
      SELECT qid, rank, vec_id, round(cos, 6) AS cos
      FROM ranked WHERE rank <= $TopK
      ORDER BY qid, rank
    """)
  )

  /** Hard-negative mining for contrastive training: per anchor (the
    * first NumQueries vectors), the k most-similar vectors carrying a
    * DIFFERENT label — the near-miss examples a bi-encoder trains
    * against. Same kernel as the filtered search with the predicate
    * now anchor-relative (`label <> anchor.label`), evaluated inside
    * the broadcast join — still one corpus scan, no shuffle of the
    * corpus. At 100 TB mining runs per anchor-batch against the ANN
    * index (probe → drop same-label → keep top-k), and this exact
    * kernel is both the verify baseline and the fallback for small
    * label slices.
    */
  val retrievalHardNegatives = GraftQuery(
    "retrieval_hard_negatives",
    (s, dir) => {
      val t = Tables(s, dir)
      val e = t.embeddings
      val queries = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("label").as("q_label"),
          toDoubleArray(col("embedding")).as("qv"))
      val cand = e.select(col("vec_id"), col("label"),
        toDoubleArray(col("embedding")).as("v"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      cand.join(broadcast(queries), col("label") =!= col("q_label"))
        .withColumn("cos", cosineSim(col("qv"), col("v")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("rank"), col("vec_id"),
          col("label").cast("long").as("neg_label"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"""
      WITH pairs AS (
        SELECT q.vec_id AS qid, e.vec_id, e.label,
               list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) AS cos
        FROM embeddings q JOIN embeddings e ON e.label <> q.label
        WHERE q.vec_id < $NumQueries),
      ranked AS (
        SELECT qid, vec_id, label, cos,
               CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
        FROM pairs)
      SELECT qid, rank, vec_id, CAST(label AS BIGINT) AS neg_label,
             round(cos, 6) AS cos
      FROM ranked WHERE rank <= $TopK
      ORDER BY qid, rank
    """)
  )

  /** Truncated ("Matryoshka") prefix dimensionality for the first-
    * stage ranking, and the candidate pool the second stage re-ranks.
    */
  val MrlDim = 16
  val MrlCandidates = 50

  /** Two-stage retrieval with dimension truncation (the MRL serving
    * trick): stage 1 ranks by cosine over the first MrlDim of Dim
    * coordinates — 4× less arithmetic and memory traffic per
    * candidate — keeps MrlCandidates per query; stage 2 re-ranks ONLY
    * that pool at full dimension and emits the final top-k, plus a
    * per-query bit for whether the two-stage result equals the exact
    * full-dim top-k. Everything is exact arithmetic over deterministic
    * candidate sets, so the whole output (including the quality bit)
    * is DuckDB-expressible and hashed. At 100 TB stage 1 is where the
    * index lives (IVF/PQ over truncated vectors — a 4× smaller
    * index); stage 2's pool is per-query-bounded, so re-ranking cost
    * is independent of corpus size.
    */
  val simTwoStageMrl = GraftQuery(
    "sim_two_stage_mrl",
    (s, dir) => {
      val t = Tables(s, dir)
      val e = t.embeddings
      val queries = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"),
          toDoubleArray(col("embedding")).as("qv"),
          toDoubleArray(slice(col("embedding"), 1, MrlDim)).as("qv_lo"))
      val corpus = e.select(col("vec_id"),
        toDoubleArray(col("embedding")).as("v"),
        toDoubleArray(slice(col("embedding"), 1, MrlDim)).as("v_lo"))
      val wLo = Window.partitionBy(col("qid")).orderBy(col("cos_lo").desc, col("vec_id"))
      // stage 1: truncated-dim ranking over the full corpus
      val pool = corpus.join(broadcast(queries), col("vec_id") =!= col("qid"))
        .withColumn("cos_lo", cosineSim(col("qv_lo"), col("v_lo")))
        .withColumn("rk_lo", row_number().over(wLo))
        .filter(col("rk_lo") <= MrlCandidates)
      // stage 2: full-dim re-rank of the bounded pool
      val wHi = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      val twoStage = pool
        .withColumn("cos", cosineSim(col("qv"), col("v")))
        .withColumn("rank", row_number().over(wHi).cast("long"))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("rank"), col("vec_id"), round(col("cos"), 6).as("cos"))
      // quality bit: does the two-stage top-k set equal the exact one?
      val exact = exactTopK(corpus.select(col("vec_id"), col("v")))
        .select(col("qid"), col("vec_id"))
      val misses = twoStage.join(exact, Seq("qid", "vec_id"), "left_anti")
        .groupBy(col("qid")).agg(count(lit(1)).as("n_miss"))
      twoStage.join(broadcast(misses), Seq("qid"), "left")
        .select(col("qid"), col("rank"), col("vec_id"), col("cos"),
          (coalesce(col("n_miss"), lit(0L)) === 0).as("matches_exact"))
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
               CAST(embedding[1:$MrlDim] AS DOUBLE[]) AS qv_lo
        FROM embeddings WHERE vec_id < $NumQueries),
      c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               CAST(embedding[1:$MrlDim] AS DOUBLE[]) AS v_lo
        FROM embeddings),
      lo AS (
        SELECT q.qid, c.vec_id, c.v, q.qv,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY list_cosine_similarity(q.qv_lo, c.v_lo) DESC, c.vec_id) AS rk_lo
        FROM q JOIN c ON c.vec_id <> q.qid),
      pool AS (SELECT * FROM lo WHERE rk_lo <= $MrlCandidates),
      two AS (
        SELECT qid, vec_id,
               round(list_cosine_similarity(qv, v), 6) AS cos,
               CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY list_cosine_similarity(qv, v) DESC, vec_id) AS BIGINT) AS rank
        FROM pool),
      two_k AS (SELECT * FROM two WHERE rank <= $TopK),
      exact AS (
        SELECT q.qid, c.vec_id,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY list_cosine_similarity(q.qv, c.v) DESC, c.vec_id) AS rk
        FROM q JOIN c ON c.vec_id <> q.qid),
      exact_k AS (SELECT qid, vec_id FROM exact WHERE rk <= $TopK),
      miss AS (
        SELECT t.qid, COUNT(*) AS n_miss
        FROM two_k t LEFT JOIN exact_k e
          ON e.qid = t.qid AND e.vec_id = t.vec_id
        WHERE e.vec_id IS NULL GROUP BY t.qid)
      SELECT t.qid, t.rank, t.vec_id, t.cos,
             (COALESCE(m.n_miss, 0) = 0) AS matches_exact
      FROM two_k t LEFT JOIN miss m ON m.qid = t.qid
      ORDER BY t.qid, t.rank
    """)
  )

  /** Cosine radius for the range search: on this isotropic corpus
    * (cos ~ N(0, 1/√64)) 0.25 sits ≈ 2σ out — ~10 neighbors per
    * query, non-empty at every SF.
    */
  val RangeTau = 0.25

  /** Range (radius) search: ALL corpus vectors within cosine ≥
    * [[RangeTau]] of each query — the fixed-threshold companion to
    * top-k that near-duplicate sweeps and dense-retrieval recall
    * audits use (FAISS `range_search`). Same serving shape as the
    * exact top-k: the query set broadcasts, the corpus scans ONCE
    * through the codegen'd cosine kernel, and the threshold filter
    * replaces the rank window — no shuffle of the corpus at all. At
    * 100 TB the IVF cell prune (sim_ann_ivf) bounds the scanned
    * fraction; the result-size asymmetry vs top-k (unbounded per
    * query) is the caller's contract, not a shuffle concern.
    */
  val simRangeSearch = GraftQuery(
    "sim_range_search",
    (s, dir) => {
      val e = corpus(Tables(s, dir))
      val queries = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      e.join(broadcast(queries), col("vec_id") =!= col("qid"))
        .withColumn("cos", cosineSim(col("qv"), col("v")))
        .filter(col("cos") >= RangeTau)
        .select(col("qid"), col("vec_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("qid"), col("vec_id"))
    },
    Some(s"""
      SELECT q.vec_id AS qid, e.vec_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                   CAST(e.embedding AS DOUBLE[])), 6) AS cos
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < $NumQueries
        AND list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
              CAST(e.embedding AS DOUBLE[])) >= $RangeTau
      ORDER BY qid, e.vec_id
    """)
  )

  /** Per-label centroid separation audit: the mean vector of every
    * label and the cosine between every centroid pair — the embedding
    * drift / class-collapse monitor a retrieval pipeline tracks
    * across re-embeddings (two sources whose centroids drift toward
    * cosine 1 have stopped being distinguishable). Exactness: per-dim
    * means go through the decimal-sum rule (exact sums, ONE division
    * per dim → bit-identical doubles), centroids assemble with an
    * explicit dim sort, and the pair cosine is rounded 6 like every
    * cosine oracle in this repo (absorbing fold-order ulps). Scale:
    * the explode+aggregate is one shuffle of |rows|·dim value pairs
    * with map-side combine; everything after is |labels|²-sized.
    */
  val simCentroidDrift = GraftQuery(
    "sim_centroid_drift",
    (s, dir) => {
      val t = Tables(s, dir)
      val dims = t.embeddings
        .select(col("label").cast("long").as("label"),
          posexplode(toDoubleArray(col("embedding"))).as(Seq("d", "x")))
        .groupBy(col("label"), col("d"))
        .agg((sumDec(col("x")) / count(lit(1))).as("m"),
          count(lit(1)).as("n"))
      // cache the |labels|-sized frame: without it the self-join
      // re-runs the whole explode+aggregate pipeline (two corpus
      // scans, two |rows|·dim shuffles) — with it the docstring's
      // "one shuffle" claim is the executed plan
      val centroids = dims
        .groupBy(col("label"))
        .agg(
          transform(sort_array(collect_list(struct(col("d"), col("m")))),
            e => e.getField("m")).as("c"),
          max(col("n")).as("n"))
        .cache()
      val a = centroids.select(col("label").as("la"), col("c").as("ca"),
        col("n").as("n_a"))
      val b = centroids.select(col("label").as("lb"), col("c").as("cb"),
        col("n").as("n_b"))
      a.join(b, col("la") < col("lb"))
        .select(col("la"), col("lb"), col("n_a"), col("n_b"),
          round(cosineSim(col("ca"), col("cb")), 6).as("centroid_cos"))
        .orderBy(col("la"), col("lb"))
    },
    Some("""
      WITH ex AS (
        SELECT CAST(label AS BIGINT) AS label,
               unnest(range(1, len(embedding) + 1)) AS i,
               CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings),
      dims AS (
        SELECT label, i - 1 AS d,
               CAST(SUM(CAST(e[i] AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS m,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ex
        GROUP BY 1, 2),
      cent AS (
        SELECT label, list(m ORDER BY d) AS c, MAX(n) AS n
        FROM dims GROUP BY 1)
      SELECT a.label AS la, b.label AS lb, a.n AS n_a, b.n AS n_b,
             round(list_cosine_similarity(a.c, b.c), 6) AS centroid_cos
      FROM cent a JOIN cent b ON a.label < b.label
      ORDER BY la, lb
    """)
  )

  /** Rows folded into the primitive long accumulators between
    * flushes of the Gram kernel — sized so a partial cell stays
    * ≤ 2048·(5·10⁶)² ≈ 5·10¹⁶, wrap-free by construction.
    */
  val GramFlushRows = 2048

  /** Gram / scatter matrix X^T X of the embedding corpus — the
    * dask.array building block behind covariance, PCA and linear
    * models, computed the way a 100 TB deployment must: a PRIMITIVE
    * per-partition kernel (mapPartitions over scaled-long components,
    * d·(d+1)/2 local accumulators, zero allocation in the row loop)
    * emitting partial triangles, then a d²-sized merge — the classic
    * local-Gram + tree-combine, NOT an O(|rows|·d²) explode join.
    * Exactness AND overflow discipline: components quantize to 1e-6
    * (the repo dec6 rule) and become LONGS; a per-cell product is
    * ≤ 2.5e13 at the |x| ≤ 5 component bound, so the primitive long
    * accumulators are flushed every [[GramFlushRows]] rows (partial
    * ≤ 2048·2.5e13 ≈ 5e16 ≪ 2⁶³ — guaranteed wrap-free, not
    * probabilistic), and the flushed partials merge in DECIMAL(38,0)
    * (exact to ~10²⁴ rows). The BIGINT render of the merged cell is
    * the gate artifact (exact while the total fits int64 — ~9e6 rows
    * per unit E[x²], far above every verify SF); the double render
    * divides that exact integer by 1e12 — correctly rounded in both
    * engines.
    */
  /** Exact upper-triangle Gram cells (i, j, s) with s the scaled-long
    * Σ qᵢ·qⱼ — the shared kernel behind sim_gram_matrix and
    * sim_top_eigen (see the scaladoc above for the overflow
    * discipline).
    */
  private[graft] def gramCells(s: SparkSession, dir: String): DataFrame = {
    val d = Dim
    val flushEvery = GramFlushRows
    val scaled = corpus(Tables(s, dir)).select(
      transform(col("v"),
        x => (x.cast(DecimalType(14, 6)) * lit(1000000L)).cast("long"))
        .as("q"))
    val partials = scaled.rdd.mapPartitions { it =>
      val acc = new Array[Long](d * (d + 1) / 2)
      val out = Array.newBuilder[(Int, Int, Long)]
      var pending = 0
      def flush(): Unit = {
        if (pending > 0) {
          var i = 0
          var k = 0
          while (i < d) {
            var j = i
            while (j < d) {
              if (acc(k) != 0L) out += ((i, j, acc(k)))
              acc(k) = 0L
              j += 1; k += 1
            }
            i += 1
          }
          pending = 0
        }
      }
      while (it.hasNext) {
        val a = it.next().getSeq[Long](0)
        var i = 0
        var k = 0
        while (i < d) {
          val ai = a(i)
          var j = i
          while (j < d) { acc(k) += ai * a(j); j += 1; k += 1 }
          i += 1
        }
        pending += 1
        if (pending >= flushEvery) flush()
      }
      flush()
      out.result().iterator
    }
    import s.implicits._
    partials.toDF("i", "j", "p")
      .groupBy(col("i"), col("j"))
      .agg(sum(col("p").cast(DecimalType(38, 0))).as("sdec"))
      .select(col("i"), col("j"), col("sdec").cast("long").as("s"))
  }

  val simGramMatrix = GraftQuery(
    "sim_gram_matrix",
    (s, dir) =>
      gramCells(s, dir)
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          col("s"),
          (col("s").cast(DoubleType) / lit(1.0e12)).as("g"))
        .orderBy(col("i"), col("j")),
    Some("""
      WITH ex AS (
        SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i,
               CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings),
      comp AS (
        SELECT vec_id, i - 1 AS d,
               CAST(CAST(e[i] AS DECIMAL(14,6)) * 1000000 AS BIGINT) AS x
        FROM ex),
      cells AS (
        SELECT a.d AS i, b.d AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS s
        FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.d <= b.d
        GROUP BY 1, 2)
      SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, s,
             CAST(s AS DOUBLE) / 1000000000000.0 AS g
      FROM cells
      ORDER BY i, j
    """)
  )

  /** Power-iteration rounds for the dominant eigenpair. The synthetic
    * corpus has a NEAR-DEGENERATE top spectrum (λ₂/λ₁ ≈ 0.98 by the
    * residual-decay probe: rel residual 1.4e-2 @30 → 1.3e-4 @240 →
    * 2.4e-6 @480 rounds), so the eigenVECTOR converges slowly; the
    * eigenVALUE is quadratically accurate in that residual (Rayleigh)
    * and is stable to 7 digits from 240 rounds on. 240 rounds of a
    * 64×64 driver multiply is microseconds.
    */
  val EigenIters = 240

  /** Dominant eigenpair of the (symmetric PSD) Gram from its exact
    * scaled-long cells: fixed-order power iteration in plain double
    * arrays — deterministic bit-for-bit because the input integers and
    * the operation order are fixed. Returns (λ via the final Rayleigh
    * quotient, unit eigenvector).
    */
  private[graft] def topEigen(
      cells: Seq[(Int, Int, Long)], d: Int, iters: Int)
      : (Double, Array[Double], Double) = {
    val g = Array.ofDim[Double](d, d)
    cells.foreach { case (i, j, sL) =>
      val v = sL.toDouble / 1.0e12
      g(i)(j) = v
      g(j)(i) = v
    }
    def mul(v: Array[Double]): Array[Double] = {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += g(i)(j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      w
    }
    def norm(v: Array[Double]): Double = {
      var n = 0.0
      var i = 0
      while (i < d) { n += v(i) * v(i); i += 1 }
      math.sqrt(n)
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var it = 0
    while (it < iters) {
      val w = mul(v)
      val n = norm(w)
      var i = 0
      while (i < d) { v(i) = w(i) / n; i += 1 }
      it += 1
    }
    val gv = mul(v)
    var lambda = 0.0
    var i = 0
    while (i < d) { lambda += v(i) * gv(i); i += 1 }
    // Rayleigh residual ||Gv − λv||₂ from the SAME gv — callers need
    // it for the convergence gate (review finding: the query body
    // re-densified the matrix to recompute it)
    var r2 = 0.0
    i = 0
    while (i < d) { val r = gv(i) - lambda * v(i); r2 += r * r; i += 1 }
    (lambda, v, math.sqrt(r2))
  }

  /** Dominant principal-component energy of the embedding corpus —
    * the dask.array.linalg story completed: the distributed EXACT Gram
    * kernel (sim_gram_matrix) feeds a model-sized (d·(d+1)/2 longs)
    * driver-side power iteration, the same shape as the PQ/IVF
    * codebook builds — the data-scale pass stays distributed and
    * exact, the d²-sized eigen solve is driver arithmetic with a
    * fixed operation order, so the eigenpair is run-to-run
    * bit-stable. Oracle-hashed artifacts are the EXACT trace (Σ x²
    * in scaled-long units, SQL-restatable) and corpus shape; the
    * eigenpair itself rides as Spark-verified gates (λ within
    * [trace/d, trace], Rayleigh residual ≤ 1e-3·λ — see EigenIters on
    * the near-degenerate spectrum, explained share in
    * (0, 1]) and its VALUES are pinned by the spec against an
    * independent dense recompute — the pagerank/HITS discipline,
    * since no SQL engine can restate an eigen fixpoint.
    */
  /** Number of greedy k-center picks for sim_kcenter_diversity. */
  val KCenters = 6

  /** Greedy k-center (farthest-point / Gonzalez) diversity selection
    * over the embedding corpus — the coreset primitive behind diverse
    * training-subset curation: pick the min-id seed, then repeatedly
    * the point FARTHEST from everything selected so far (euclidean,
    * id tie-break). The emitted radius sequence is non-increasing and
    * is exactly the 2-approximation certificate for the k-center
    * cost. Deterministic, so the DuckDB oracle replays the whole
    * selection with [[KCenters]] unrolled argmax CTEs over
    * `list_distance`; radii compare at 6 dp (the sim-family float
    * discipline — selection itself is robust because random corpus
    * distances are well-separated relative to cross-engine summation
    * error).
    *
    * Scale: k scans of the corpus, each a map-side distance kernel
    * against a BROADCAST center set (k·dim doubles — model-sized)
    * followed by a top-1 TakeOrdered; nothing data-scale touches the
    * driver. The k passes are the textbook distributed Gonzalez; at
    * 10⁹ vectors each pass is embarrassingly parallel.
    */
  val simKcenterDiversity = GraftQuery(
    "sim_kcenter_diversity",
    (s, dir) => {
      import s.implicits._
      val base = corpus(Tables(s, dir)).cache()
      val seed = base.orderBy(col("vec_id")).limit(1)
        .select(col("vec_id"), col("v")).head()
      var centers = Vector(
        (seed.getLong(0), seed.getSeq[Double](1).toArray, Option.empty[Double]))
      for (_ <- 2 to KCenters) {
        val cs = centers.map(_._2).toArray
        val bc = s.sparkContext.broadcast(cs)
        val mindU = udf((v: Seq[Double]) => {
          val arr = v.toArray
          var best = Double.MaxValue
          var c = 0
          while (c < bc.value.length) {
            val cv = bc.value(c)
            var d = 0.0
            var i = 0
            while (i < arr.length) { val t = arr(i) - cv(i); d += t * t; i += 1 }
            if (d < best) best = d
            c += 1
          }
          math.sqrt(best)
        })
        val next = base.withColumn("mind", mindU(col("v")))
          .orderBy(col("mind").desc, col("vec_id")).limit(1)
          .select(col("vec_id"), col("v"), col("mind")).head()
        centers = centers :+
          ((next.getLong(0), next.getSeq[Double](1).toArray,
            Some(next.getDouble(2))))
      }
      base.unpersist(false)
      centers.zipWithIndex
        .map { case ((id, _, r), i) => ((i + 1).toLong, id, r) }
        .toDF("step", "vec_id", "radius")
        .select(col("step"), col("vec_id"), round(col("radius"), 6).as("radius"))
        .orderBy(col("step"))
    },
    Some("""
      WITH pts AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      c1 AS (SELECT vec_id, v FROM pts ORDER BY vec_id LIMIT 1),
      d1 AS (SELECT p.vec_id, p.v, list_distance(p.v, c1.v) AS mind
             FROM pts p CROSS JOIN c1),
      c2 AS (SELECT vec_id, v, mind FROM d1 ORDER BY mind DESC, vec_id LIMIT 1),
      d2 AS (SELECT d.vec_id, d.v, LEAST(d.mind, list_distance(d.v, c2.v)) AS mind
             FROM d1 d CROSS JOIN c2),
      c3 AS (SELECT vec_id, v, mind FROM d2 ORDER BY mind DESC, vec_id LIMIT 1),
      d3 AS (SELECT d.vec_id, d.v, LEAST(d.mind, list_distance(d.v, c3.v)) AS mind
             FROM d2 d CROSS JOIN c3),
      c4 AS (SELECT vec_id, v, mind FROM d3 ORDER BY mind DESC, vec_id LIMIT 1),
      d4 AS (SELECT d.vec_id, d.v, LEAST(d.mind, list_distance(d.v, c4.v)) AS mind
             FROM d3 d CROSS JOIN c4),
      c5 AS (SELECT vec_id, v, mind FROM d4 ORDER BY mind DESC, vec_id LIMIT 1),
      d5 AS (SELECT d.vec_id, d.v, LEAST(d.mind, list_distance(d.v, c5.v)) AS mind
             FROM d4 d CROSS JOIN c5),
      c6 AS (SELECT vec_id, v, mind FROM d5 ORDER BY mind DESC, vec_id LIMIT 1)
      SELECT CAST(1 AS BIGINT) AS step,
             (SELECT vec_id FROM c1) AS vec_id,
             CAST(NULL AS DOUBLE) AS radius
      UNION ALL SELECT 2, vec_id, round(mind, 6) FROM c2
      UNION ALL SELECT 3, vec_id, round(mind, 6) FROM c3
      UNION ALL SELECT 4, vec_id, round(mind, 6) FROM c4
      UNION ALL SELECT 5, vec_id, round(mind, 6) FROM c5
      UNION ALL SELECT 6, vec_id, round(mind, 6) FROM c6
      ORDER BY step
    """)
  )

  val simTopEigen = GraftQuery(
    "sim_top_eigen",
    (s, dir) => {
      val cells = gramCells(s, dir).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
      val (lambda, _, resid) = topEigen(cells, Dim, EigenIters)
      val traceS = cells.collect { case (i, j, sL) if i == j => sL }.sum
      val trace = traceS.toDouble / 1.0e12
      val share = lambda / trace
      val nVecs = corpus(Tables(s, dir)).count()
      import s.implicits._
      Seq((Dim.toLong, nVecs, traceS,
        lambda >= trace / Dim && lambda <= trace,
        // vector residual gate at 1e-3·λ — the top of this spectrum is
        // near-degenerate (see EigenIters); λ itself is accurate to
        // O(resid²/gap), far tighter than this gate
        resid <= 1e-3 * lambda,
        share > 0.0 && share <= 1.0))
        .toDF("dim", "n_vecs", "trace_s", "eig_in_range_ok",
          "rayleigh_ok", "share_ok")
    },
    Some(s"""
      WITH ex AS (
        SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i,
               CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings),
      comp AS (
        SELECT vec_id, CAST(CAST(e[i] AS DECIMAL(14,6)) * 1000000 AS BIGINT)
                 AS x
        FROM ex)
      SELECT CAST($Dim AS BIGINT) AS dim,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_vecs,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS BIGINT) AS trace_s,
             TRUE AS eig_in_range_ok, TRUE AS rayleigh_ok, TRUE AS share_ok
      FROM comp
    """)
  )

  def all: Seq[GraftQuery] =
    Seq(simTopkBruteforce, simAnnLsh, simAnnIvf, simNormStats,
      clusterSemanticDedup, simPcaReduce, simSqQuant, simEmbedDecontam,
      simAnnPq, simAnnIvfPq, simAnnFiltered, retrievalHardNegatives,
      simTwoStageMrl, simRangeSearch, simCentroidDrift, simGramMatrix,
      simTopEigen, simKcenterDiversity)
}
