package graft.ml

import org.apache.spark.ml.Model
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.regression.DecisionTreeRegressionModel
import org.apache.spark.ml.tree.{ContinuousSplit, GraftTreeBridge, InternalNode, LeafNode, Node}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import SparseBoost.{ImportanceAcc, SparseTree}

/** Native multiclass softprob forest — the array-flattened
  * ([[SparseBoost.SparseTree]]) representation of a `multi:softprob`
  * model: `trees(i)` contributes its leaf value to class
  * `treeInfo(i)`'s margin, exactly the XGBoost gbtree layout where
  * `tree_info` carries each tree's class id (round-major: round r owns
  * trees [r·K, (r+1)·K) for a plain K-class fit).
  *
  * This is the scoring form behind multiclass [[XgbJson]] interchange
  * (reference `core.py:580-590` rewrites binary objectives to
  * `multi:softprob`; its tests `test_core.py:72-101` exercise the
  * multiclass lifecycle): a stock XGBoost multiclass document ingests
  * into this model and scores with serving semantics (NaN routed along
  * each split's `default_left`), and the engine's own
  * [[SoftprobBoost.SoftprobModel]] forests convert losslessly via
  * [[MultiSparse.fromMLlibTree]] for export. Scoring broadcasts the
  * model-sized tree arrays once — one map-side pass, no shuffle, no
  * driver data path.
  */
object MultiSparse {

  final class MultiSparseModel(
      override val uid: String,
      val trees: Array[SparseTree],
      /** Class id each tree's output accumulates into (XGBoost's
        * `tree_info`) — same length as `trees`.
        */
      val treeInfo: Array[Int],
      val numClasses: Int,
      /** Shared per-class margin base (stock `base_score` passes
        * through the softmax objective's identity link, so one scalar
        * rides every class margin — a uniform shift that cancels in
        * softmax/argmax but keeps `margins` faithful to XGBoost's
        * `output_margin=True`).
        */
      val base: Double,
      val objective: String,
      /** Raw per-feature split statistics (the `get_score` inputs) —
        * recomputed at ingest from the document's `loss_changes` /
        * `sum_hessian` when available; empty = stats unavailable.
        */
      val stats: ImportanceAcc = ImportanceAcc.empty,
      /** True when this forest came through a dart document (drop
        * weights folded into the leaf values at ingest): re-export
        * must go back through the dart slot, not relabel the forest
        * as plain gbtree.
        */
      val dartFolded: Boolean = false
  ) extends Model[MultiSparseModel] {
    require(trees.length == treeInfo.length,
      s"tree_info length ${treeInfo.length} != num_trees ${trees.length}")
    require(treeInfo.forall(k => k >= 0 && k < numClasses),
      s"tree_info class ids must be in [0, $numClasses)")

    override def copy(extra: ParamMap): MultiSparseModel =
      new MultiSparseModel(uid, trees, treeInfo, numClasses, base,
        objective, stats, dartFolded)

    /** Accumulated per-class margins for one feature vector — tree
      * order, so a forest converted from [[SoftprobBoost]] sums each
      * class's rounds in the exact order the original model does
      * (bit-identical margins).
      */
    def marginsOf(v: Vector): Array[Double] = {
      val m = Array.fill(numClasses)(base)
      var i = 0
      while (i < trees.length) {
        m(treeInfo(i)) += trees(i).valueOf(v); i += 1
      }
      m
    }

    /** Softmax probabilities (max-shifted) for one feature vector. */
    def probaOf(v: Vector): Array[Double] =
      SoftprobBoost.softmaxInPlace(marginsOf(v))

    /** XGBoost `get_score` parity over recomputed split statistics —
      * one shared dispatch ([[ImportanceAcc.byType]]) with the same
      * loud refusal contract as the single-target model when the
      * source document carried no usable statistics.
      */
    def importanceByType(importanceType: String): Array[Double] = {
      require(stats.gain.nonEmpty,
        "importance statistics unavailable: the source document " +
        "carried no loss_changes (or was exported from a pre-gain " +
        "artifact with the stats-absent marker)")
      stats.byType(importanceType)
    }

    override def transformSchema(schema: StructType): StructType =
      schema
        .add(StructField("margins", ArrayType(DoubleType, containsNull = false)))
        .add(StructField("prediction", DoubleType))

    override def transform(ds: Dataset[_]): DataFrame =
      argmaxTransform(ds, this)((m, v) => m.marginsOf(v))

    /** Truncated copy keeping the first `rounds` boosting rounds —
      * XGBoost's `iteration_range` on a multiclass document. Needs
      * the plain round-major layout (tree i → class i mod K; an
      * irregular tree_info has no round structure to cut at) and
      * refuses dart-folded forests, the same `ntree_limit`
      * restriction XGBoost and [[SparseBoost.SparseModel.truncate]]
      * apply. Importance statistics are recomputed EXACTLY for the
      * kept prefix from its per-node gains/covers when available.
      */
    def truncate(rounds: Int): MultiSparseModel = {
      require(!dartFolded,
        "cannot truncate a dart-folded forest: drop-weight rescales " +
        "mean no tree prefix reproduces a training-time round margin " +
        "(XGBoost likewise forbids ntree_limit with booster='dart')")
      val roundMajor = trees.length % numClasses == 0 &&
        treeInfo.indices.forall(i => treeInfo(i) == i % numClasses)
      require(roundMajor,
        "truncation needs the round-major tree layout (tree i -> " +
        "class i mod K); this document's tree_info is irregular")
      val numRounds = trees.length / numClasses
      require(rounds >= 1 && rounds <= numRounds,
        s"rounds must be in [1, $numRounds], got $rounds")
      val kept = trees.take(rounds * numClasses)
      val newStats =
        if (stats.gain.isEmpty || kept.exists(t => t.gain.length != t.feature.length))
          ImportanceAcc.empty
        else {
          val acc = ImportanceAcc(stats.gain.length)
          kept.foreach { t =>
            var i = 0
            while (i < t.feature.length) {
              if (t.feature(i) >= 0) acc.record(t.feature(i), t.gain(i), t.cover(i))
              i += 1
            }
          }
          acc
        }
      new MultiSparseModel(uid, kept, treeInfo.take(rounds * numClasses),
        numClasses, base, objective, newStats)
    }
  }

  /** THE multiclass scoring transform, shared by both margin scorers
    * ([[MultiSparseModel]] and [[SoftprobBoost.SoftprobModel]]):
    * broadcast the model once, append `margins` (array of K doubles)
    * and `prediction` — the argmax class id with ties breaking to the
    * LOWEST class (array_position finds the first maximum). One
    * definition so the tie-break contract can never drift between the
    * trained and the ingested scorer.
    */
  private[ml] def argmaxTransform[M <: java.io.Serializable : scala.reflect.ClassTag](
      ds: Dataset[_], model: M)(
      marginsOf: (M, Vector) => Array[Double]): DataFrame = {
    val bc = ds.sparkSession.sparkContext.broadcast(model)
    val mU = udf((v: Vector) => marginsOf(bc.value, v))
    ds.withColumn("margins", mU(col("features")))
      .withColumn("prediction",
        (array_position(col("margins"), array_max(col("margins"))) - 1L)
          .cast(DoubleType))
  }

  /** Lossless array-form view of a trained softprob forest: round-
    * major flatten (round r's K class trees in class order) with
    * `tree_info` class ids — the exact layout [[XgbJson]] exports and
    * the per-class sum order that keeps margins bit-identical to
    * [[SoftprobBoost.SoftprobModel.marginsOf]]. Base margin is 0 (the
    * softprob loop starts every class at F = 0).
    */
  def fromSoftprob(sp: SoftprobBoost.SoftprobModel): MultiSparseModel = {
    val K = sp.numClasses
    val flat = sp.trees.flatMap(_.map(fromMLlibTree(_, sp.eta)))
    new MultiSparseModel(sp.uid + "_arr", flat,
      Array.tabulate(flat.length)(_ % K), K, 0.0, "multi:softprob")
  }

  /** Flatten one MLlib regression tree into the array form, scaling
    * every node value by `scale` (the learning rate — XGBoost
    * documents store η-scaled leaf values; internal `base_weights`
    * then stay the cover-weighted subtree means of the scaled leaf
    * outputs, because an MLlib variance-impurity node prediction IS
    * the weight-weighted mean of its subtree's targets — the Saabas
    * expectation holds by construction).
    *
    * Nodes are laid out breadth-first (root = 0). MLlib trees carry
    * no missing-value routing (`VectorAssembler` rejects NaN on these
    * paths), so `default_left` is uniformly false — a document
    * consumer only sees it for rows with missing values, which the
    * source model could never score anyway.
    */
  def fromMLlibTree(m: DecisionTreeRegressionModel, scale: Double): SparseTree = {
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
    val leftIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    val rightIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    nodes += m.rootNode; leftIdx += -1; rightIdx += -1
    var i = 0
    while (i < nodes.length) {
      nodes(i) match {
        case in: InternalNode =>
          leftIdx(i) = nodes.length
          nodes += in.leftChild; leftIdx += -1; rightIdx += -1
          rightIdx(i) = nodes.length
          nodes += in.rightChild; leftIdx += -1; rightIdx += -1
        case _: LeafNode => ()
      }
      i += 1
    }
    val n = nodes.length
    val feature = new Array[Int](n)
    val thresh = new Array[Double](n)
    val value = new Array[Double](n)
    val cover = new Array[Double](n)
    val gain = new Array[Double](n)
    i = 0
    while (i < n) {
      cover(i) = GraftTreeBridge.nodeWeight(nodes(i))
      value(i) = scale * nodes(i).prediction
      nodes(i) match {
        case in: InternalNode =>
          val cs = in.split match {
            case c: ContinuousSplit => c
            case other => throw new IllegalArgumentException(
              "only continuous splits convert to the XGBoost document " +
              s"format; got ${other.getClass.getSimpleName} — categorical " +
              "MLlib splits have no num-feature slot here")
          }
          feature(i) = cs.featureIndex
          thresh(i) = cs.threshold
          // MLlib variance gain (hessian-weighted impurity decrease)
          // — a genuine loss change, though not XGBoost's regularized
          // Newton gain formula (divergence stamped by the exporter)
          gain(i) = in.gain
        case _: LeafNode =>
          feature(i) = -1
      }
      i += 1
    }
    SparseTree(feature, thresh, leftIdx.toArray, rightIdx.toArray,
      Array.fill(n)(false), value, cover, gain)
  }
}
