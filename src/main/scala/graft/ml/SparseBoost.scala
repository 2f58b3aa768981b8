package graft.ml

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.ml.Model
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sparsity-aware gradient boosting — XGBoost's learned default
  * direction for missing values (Chen & Guestrin 2016 §3.3, the
  * `missing=` semantics the reference forwards at `core.py:370-377`
  * and pins in `test_core.py:365-382`). MLlib rejects NaN features
  * outright, so the impute/sentinel strategies of [[GraftBoost]] were
  * approximations; this is the real mechanism, as a from-scratch
  * histogram tree learner in the [[SoftprobBoost]]/[[QuantileBoost]]
  * custom-loop family:
  *
  *  1. per feature, split candidates are the exact (maxBins−1)
  *     quantiles of the NON-missing values — XGBoost's global
  *     approximate proposal (§3.2); missing rows never enter the
  *     candidate sketch, exactly as in the paper,
  *  2. trees grow breadth-first; each level is ONE distributed pass
  *     aggregating per (frontier-node, feature, bin) gradient/hessian
  *     histograms plus a dedicated per-feature MISSING bin — the
  *     histograms are model-sized (nodes × features × bins), only
  *     they cross the network,
  *  3. split search runs on the driver over the aggregated
  *     histograms: each feature is scanned left-to-right with the
  *     missing mass on the right, and again with it on the left —
  *     the enumerate-both-directions loop of §3.3 — maximizing
  *     gain = ½[G_L²/(H_L+λ) + G_R²/(H_R+λ) − G²/(H+λ)], and the
  *     winning direction is stored on the node as its default branch,
  *  4. leaf weights are Newton steps −G/(H+λ) (η-scaled), and
  *     `min_child_weight` bounds the child HESSIAN sums — XGBoost's
  *     actual semantics, where the MLlib-backed paths could only
  *     approximate it with minInstancesPerNode.
  *
  * Objectives: `binary:logistic` (g = p − y, h = p(1−p)) and
  * `reg:squarederror` (g = f − y, h = 1), selected by
  * `BoostParams.objective` under `missingStrategy = "native"`.
  *
  * Determinism: histogram partials are folded on the driver in
  * partition-index order (float addition order is fixed), split ties
  * break by (feature, bin, missing-right-first) enumeration order,
  * and the `subsample` path reuses the content-hash Bernoulli filter
  * ([[GraftBoost.roundSample]]) — two trains on the same frame are
  * bit-identical. At cluster scale the fold would move to
  * `treeAggregate` (documented trade: log-depth aggregation vs.
  * bit-stable addition order); histogram sizes are unchanged.
  */
object SparseBoost {

  /** Array-flattened tree with per-split default directions. Node i
    * is a leaf iff `feature(i) < 0` (then `value(i)` is its η-scaled
    * Newton weight); otherwise x(feature) ≤ thresh goes left, and a
    * MISSING x(feature) follows `defaultLeft(i)` — the learned
    * default branch of Chen & Guestrin §3.3.
    */
  final case class SparseTree(
      feature: Array[Int],
      thresh: Array[Double],
      left: Array[Int],
      right: Array[Int],
      defaultLeft: Array[Boolean],
      value: Array[Double]
  ) extends Serializable {
    def leafOf(v: Vector): Int = {
      var i = 0
      while (feature(i) >= 0) {
        val x = v(feature(i))
        i = if (java.lang.Double.isNaN(x)) { if (defaultLeft(i)) left(i) else right(i) }
          else if (x <= thresh(i)) left(i) else right(i)
      }
      i
    }
    def valueOf(v: Vector): Double = value(leafOf(v))
  }

  /** The trained booster: margin(x) = base + Σ_r value_r(x) (leaf
    * values are already η-scaled, XGBoost's stored-weight convention).
    * `transform` appends `prediction` (class id for binary:logistic —
    * margin > 0 ⇔ p > ½ — or the margin itself for regression).
    * Scoring broadcasts the model-sized tree arrays once — one
    * map-side pass, no shuffle.
    */
  final class SparseModel(
      override val uid: String,
      val trees: Array[SparseTree],
      val base: Double,
      val objective: String,
      /** Per-feature total split gain, normalized to sum 1 — XGBoost's
        * `total_gain` importance, accumulated during training.
        */
      val importances: Array[Double]
  ) extends Model[SparseModel] {

    override def copy(extra: ParamMap): SparseModel =
      new SparseModel(uid, trees, base, objective, importances)

    override def transformSchema(schema: StructType): StructType =
      schema.add(StructField("prediction", DoubleType))

    def marginOf(v: Vector): Double = {
      var f = base
      var r = 0
      while (r < trees.length) { f += trees(r).valueOf(v); r += 1 }
      f
    }

    def probOf(v: Vector): Double = 1.0 / (1.0 + math.exp(-marginOf(v)))

    def predictOne(v: Vector): Double =
      if (objective == "binary:logistic") { if (marginOf(v) > 0.0) 1.0 else 0.0 }
      else marginOf(v)

    override def transform(ds: Dataset[_]): DataFrame = {
      val bc = ds.sparkSession.sparkContext.broadcast(this)
      val pU = udf((v: Vector) => bc.value.predictOne(v))
      ds.withColumn("prediction", pU(col("features")))
    }

    /** Truncated copy keeping the first `rounds` boosting rounds
      * (importances are kept as-trained — they describe the full fit).
      */
    def truncate(rounds: Int): SparseModel = {
      require(rounds >= 1 && rounds <= trees.length,
        s"rounds must be in [1, ${trees.length}], got $rounds")
      new SparseModel(uid, trees.take(rounds), base, objective, importances)
    }
  }

  /** Region index of x among sorted candidate edges: the count of
    * edges strictly below x, so region(x) ≤ b ⇔ x ≤ edges(b).
    */
  private def regionOf(x: Double, edges: Array[Double]): Int = {
    var lo = 0
    var hi = edges.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (edges(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Exact per-feature quantile split candidates over NON-missing
    * values (maxBins−1 interior quantiles, deduplicated). Exact
    * `percentile` keeps the proposal deterministic; at 100 TB this is
    * the one aggregate to swap for a mergeable KLL/GK sketch — the
    * histogram passes are already sketch-free.
    */
  private[ml] def proposeEdges(
      data: DataFrame,
      numFeat: Int,
      maxBins: Int
  ): Array[Array[Double]] = {
    import org.apache.spark.ml.functions.vector_to_array
    val probs = (1 until maxBins).map(_.toDouble / maxBins).toArray
    val arr = vector_to_array(col("features"))
    val aggs = (0 until numFeat).map { j =>
      val x = element_at(arr, j + 1)
      percentile(when(!isnan(x), x), lit(probs)).as(s"f$j")
    }
    val row = data.select(aggs: _*).head()
    (0 until numFeat).map { j =>
      if (row.isNullAt(j)) Array.empty[Double]
      else row.getSeq[Double](j).distinct.sorted.toArray
    }.toArray
  }

  private final case class Split(
      feature: Int, bin: Int, defaultLeft: Boolean, gain: Double,
      gl: Double, hl: Double, cl: Double, gr: Double, hr: Double, cr: Double)

  /** Grow one tree on (features, g, h) rows. One distributed
    * histogram pass per level; all split math on the driver over
    * model-sized aggregates. Returns the tree plus its per-feature
    * gain totals (importance accumulation).
    */
  private[ml] def growTree(
      fit: DataFrame,
      edges: Array[Array[Double]],
      params: GraftBoost.BoostParams,
      gainOut: Array[Double]
  ): SparseTree = {
    val numFeat = edges.length
    val lambda = params.lambdaL2
    val minH = params.minChildWeight.toDouble

    // per-node histogram block layout: feature j occupies
    // edges(j).length + 2 slots (regions 0..m_j plus one MISSING bin)
    val featOff = new Array[Int](numFeat + 1)
    var j = 0
    while (j < numFeat) { featOff(j + 1) = featOff(j) + edges(j).length + 2; j += 1 }
    val perNode = featOff(numFeat)

    // growable tree arrays; children appended as they are created
    val feature = ArrayBuffer(-1)
    val thresh = ArrayBuffer(0.0)
    val left = ArrayBuffer(-1)
    val right = ArrayBuffer(-1)
    val defLeft = ArrayBuffer(false)
    val value = ArrayBuffer(0.0)

    val rows = fit.select(col("features"), col("g").cast("double"),
      col("h").cast("double"))

    val totals = rows.select(sum(col("g")), sum(col("h")), count(lit(1))).head()
    // (G, H, count) per live frontier node, tracked exactly from the
    // parent's chosen split — no extra pass at finalization
    var frontier: Vector1 = scala.Vector(
      (0, totals.getDouble(0), totals.getDouble(1), totals.getLong(2).toDouble))

    def leafValue(g: Double, h: Double): Double =
      params.eta * (-g / (h + lambda))

    var depth = 0
    while (depth < params.maxDepth && frontier.nonEmpty) {
      val slotOf = frontier.map(_._1).zipWithIndex.toMap
      // immutable snapshots for the task closure (small, model-sized)
      val fSnap = feature.toArray
      val tSnap = thresh.toArray
      val lSnap = left.toArray
      val rSnap = right.toArray
      val dSnap = defLeft.toArray
      val edgesL = edges
      val featOffL = featOff
      val perNodeL = perNode
      val slotL = slotOf
      val size = frontier.length * perNode * 3

      // one histogram pass for the whole level; partials folded on
      // the driver in partition-index order (deterministic float sum)
      val partials = rows.rdd.mapPartitions { it =>
        val acc = new Array[Double](size)
        it.foreach { row =>
          val v = row.getAs[Vector](0)
          val g = row.getDouble(1)
          val h = row.getDouble(2)
          var i = 0
          while (fSnap(i) >= 0) {
            val x = v(fSnap(i))
            i = if (java.lang.Double.isNaN(x)) { if (dSnap(i)) lSnap(i) else rSnap(i) }
              else if (x <= tSnap(i)) lSnap(i) else rSnap(i)
          }
          slotL.get(i) match {
            case Some(s) =>
              val base = s * perNodeL
              var jj = 0
              while (jj < edgesL.length) {
                val x = v(jj)
                val bin =
                  if (java.lang.Double.isNaN(x)) edgesL(jj).length + 1
                  else regionOf(x, edgesL(jj))
                val idx = (base + featOffL(jj) + bin) * 3
                acc(idx) += g
                acc(idx + 1) += h
                acc(idx + 2) += 1.0
                jj += 1
              }
            case None => // routed to an already-finalized leaf
          }
        }
        Iterator.single(acc)
      }.collect()
      val hist = new Array[Double](size)
      partials.foreach { p =>
        var i = 0
        while (i < size) { hist(i) += p(i); i += 1 }
      }

      val next = scala.Vector.newBuilder[(Int, Double, Double, Double)]
      frontier.foreach { case (node, gTot, hTot, cTot) =>
        val base = slotOf(node) * perNode
        val parentScore = gTot * gTot / (hTot + lambda)
        var best: Option[Split] = None
        var jj = 0
        while (jj < numFeat) {
          val m = edges(jj).length
          if (m > 0) {
            val off = (base + featOff(jj)) * 3
            val missIdx = off + (m + 1) * 3
            val gMiss = hist(missIdx)
            val hMiss = hist(missIdx + 1)
            val cMiss = hist(missIdx + 2)
            var gl = 0.0; var hl = 0.0; var cl = 0.0
            var b = 0
            while (b < m) {
              gl += hist(off + b * 3)
              hl += hist(off + b * 3 + 1)
              cl += hist(off + b * 3 + 2)
              // missing → right (enumerated first; ties keep it)
              var glx = gl; var hlx = hl; var clx = cl
              var grx = gTot - glx; var hrx = hTot - hlx; var crx = cTot - clx
              if (hlx >= minH && hrx >= minH && clx >= 1 && crx >= 1) {
                val gain = 0.5 * (glx * glx / (hlx + lambda) +
                  grx * grx / (hrx + lambda) - parentScore)
                if (gain > best.map(_.gain).getOrElse(1e-12))
                  best = Some(Split(jj, b, defaultLeft = false, gain,
                    glx, hlx, clx, grx, hrx, crx))
              }
              // missing → left
              glx = gl + gMiss; hlx = hl + hMiss; clx = cl + cMiss
              grx = gTot - glx; hrx = hTot - hlx; crx = cTot - clx
              if (cMiss > 0 && hlx >= minH && hrx >= minH && clx >= 1 && crx >= 1) {
                val gain = 0.5 * (glx * glx / (hlx + lambda) +
                  grx * grx / (hrx + lambda) - parentScore)
                if (gain > best.map(_.gain).getOrElse(1e-12))
                  best = Some(Split(jj, b, defaultLeft = true, gain,
                    glx, hlx, clx, grx, hrx, crx))
              }
              b += 1
            }
          }
          jj += 1
        }
        best match {
          case Some(s) =>
            gainOut(s.feature) += s.gain
            val li = feature.length
            feature += -1; thresh += 0.0; left += -1; right += -1
            defLeft += false; value += 0.0
            val ri = feature.length
            feature += -1; thresh += 0.0; left += -1; right += -1
            defLeft += false; value += 0.0
            feature(node) = s.feature
            thresh(node) = edges(s.feature)(s.bin)
            left(node) = li
            right(node) = ri
            defLeft(node) = s.defaultLeft
            next += ((li, s.gl, s.hl, s.cl))
            next += ((ri, s.gr, s.hr, s.cr))
          case None =>
            value(node) = leafValue(gTot, hTot)
        }
      }
      frontier = next.result()
      depth += 1
    }
    // depth budget exhausted: finalize the remaining frontier
    frontier.foreach { case (node, gTot, hTot, _) =>
      value(node) = leafValue(gTot, hTot)
    }
    SparseTree(feature.toArray, thresh.toArray, left.toArray, right.toArray,
      defLeft.toArray, value.toArray)
  }
  private type Vector1 = scala.Vector[(Int, Double, Double, Double)]

  /** Mean loss of margin column `f` for the round history. */
  private def lossOf(df: DataFrame, objective: String): Double =
    if (objective == "binary:logistic") {
      // logloss with the standard 1e-15 clip
      val p = lit(1.0) / (lit(1.0) + exp(-col("f")))
      val pc = least(greatest(p, lit(1e-15)), lit(1.0 - 1e-15))
      df.select(avg(-(col("label") * log(pc) +
        (lit(1.0) - col("label")) * log(lit(1.0) - pc)))).head().getDouble(0)
    } else
      df.select(sqrt(avg(pow(col("label") - col("f"), 2)))).head().getDouble(0)

  /** Train the sparsity-aware booster. `data` must carry `features`
    * (vector; NaN marks missing) and `label`; an optional weight
    * column scales each row's (g, h) — XGBoost's instance weights.
    *
    * @return the model plus the per-round TRAIN loss history
    *         (logloss for binary:logistic, rmse for reg:squarederror)
    */
  def train(
      data: DataFrame,
      params: GraftBoost.BoostParams,
      weightCol: Option[String] = None
  ): (SparseModel, Array[Double]) = {
    require(params.objective == "binary:logistic" ||
      params.objective == "reg:squarederror",
      s"native sparse boosting supports binary:logistic and " +
      s"reg:squarederror, got ${params.objective}")
    val binary = params.objective == "binary:logistic"
    val keep = Seq(col("features"), col("label")) ++ weightCol.map(col)
    val src = data.select(keep: _*)

    val numFeat = src.select(col("features")).head().getAs[Vector](0).size
    val edges = proposeEdges(src, numFeat, params.maxBins)

    // XGBoost base_score = 0.5: margin 0 for logistic, 0.5 for reg
    val base = if (binary) 0.0 else 0.5
    var cur = src.withColumn("f", lit(base)).localCheckpoint()

    val gains = new Array[Double](numFeat)
    val hist = new ArrayBuffer[Double](params.numRound)
    val forest = new ArrayBuffer[SparseTree](params.numRound)
    for (r <- 1 to params.numRound) {
      val sampled = GraftBoost.roundSample(cur, params.subsample,
        params.seed + 197L * r)
      val (g: Column, h: Column) =
        if (binary) {
          val p = lit(1.0) / (lit(1.0) + exp(-col("f")))
          (p - col("label"), greatest(p * (lit(1.0) - p), lit(1e-16)))
        } else (col("f") - col("label"), lit(1.0))
      val (gw, hw) = weightCol match {
        case Some(w) => (g * col(w), h * col(w))
        case None => (g, h)
      }
      val tree = growTree(
        sampled.withColumn("g", gw).withColumn("h", hw), edges, params, gains)
      forest += tree

      val bc = data.sparkSession.sparkContext.broadcast(tree)
      val upd = udf((v: Vector, f: Double) => f + bc.value.valueOf(v))
      cur = cur.withColumn("f", upd(col("features"), col("f"))).localCheckpoint()
      hist += lossOf(cur, params.objective)
    }
    val gSum = gains.sum
    val imp = if (gSum > 0) gains.map(_ / gSum) else gains
    (new SparseModel(s"sparse_${params.seed}", forest.toArray, base,
      params.objective, imp), hist.toArray)
  }
}
