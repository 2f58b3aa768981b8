package graft.ml

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.ml.Model
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.regression.{DecisionTreeRegressor, DecisionTreeRegressionModel}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-model multiclass boosting with the TRUE `multi:softprob`
  * mechanism (reference `core.py:580-590`): one forest whose round r
  * fits K trees on the multinomial softmax gradients of the shared
  * margin state — not a one-vs-rest ensemble of independent binary
  * models. Closes the last mechanism divergence listed in VERDICT r5
  * ("single-model multiclass softprob boosting").
  *
  * Each round:
  *  1. p = softmax(F) from the carried per-row margin array F
  *     (max-shifted for overflow safety),
  *  2. per class k a [[DecisionTreeRegressor]] fits the NEWTON target
  *     z_k = (y_k − p_k)/h_k with instance weight h_k = p_k(1−p_k):
  *     weighted least squares puts Σg/Σh in each leaf — the same
  *     second-order leaf value XGBoost's softmax objective computes —
  *     and drives splits by h-weighted variance (the LogitBoost
  *     formulation; z is clipped to ±[[ZClip]] and h floored at
  *     [[HessFloor]], the standard stability guards),
  *  3. F_k += η · tree_k(x), margins re-materialized via
  *     localCheckpoint so the lineage never deepens.
  *
  * Training cost is K·R distributed tree fits over one carried
  * DataFrame — no driver-side data path; the margin state is a
  * K-double array per row, exactly the O(n·K) state XGBoost keeps.
  * Per-round train mlogloss falls out of the SAME pass that computes
  * the gradients (the `evals_result` history, reference
  * `core.py:259-260`).
  */
object SoftprobBoost {

  /** LogitBoost working-response clip (|z| ≤ 4, Friedman et al. 2000). */
  val ZClip = 4.0
  /** Hessian floor — keeps weights strictly positive on saturated rows. */
  val HessFloor = 1e-6

  /** The trained forest: `trees(r)(k)` is round r's tree for class k.
    * An MLlib [[Model]] so it slots into [[GraftBoost.GraftBoostModel]]
    * unchanged; transform appends `margins` (array of K doubles) and
    * `prediction` (argmax class id). Scoring broadcasts the forest
    * once and walks the trees with the public single-instance
    * `predict`, so the transform is one map-side pass.
    */
  final class SoftprobModel(
      override val uid: String,
      val trees: Array[Array[DecisionTreeRegressionModel]],
      val eta: Double,
      val numClasses: Int
  ) extends Model[SoftprobModel] {

    override def copy(extra: ParamMap): SoftprobModel =
      new SoftprobModel(uid, trees, eta, numClasses)

    override def transformSchema(schema: StructType): StructType =
      schema
        .add(StructField("margins", ArrayType(DoubleType, containsNull = false)))
        .add(StructField("prediction", DoubleType))

    /** Accumulated per-class margins for one feature vector. */
    def marginsOf(v: Vector): Array[Double] = {
      val m = new Array[Double](numClasses)
      var r = 0
      while (r < trees.length) {
        var k = 0
        while (k < numClasses) { m(k) += eta * trees(r)(k).predict(v); k += 1 }
        r += 1
      }
      m
    }

    /** Softmax probabilities for one feature vector (max-shifted). */
    def probaOf(v: Vector): Array[Double] = softmaxInPlace(marginsOf(v))

    override def transform(ds: Dataset[_]): DataFrame =
      // shared with the ingested-document scorer so the argmax
      // tie-break contract can never drift between the two
      MultiSparse.argmaxTransform(ds, this)((m, v) => m.marginsOf(v))

    /** Truncated copy keeping the first `rounds` boosting rounds —
      * the multiclass analog of GraftModelBridge's GBT truncation.
      */
    def truncate(rounds: Int): SoftprobModel = {
      require(rounds >= 1 && rounds <= trees.length,
        s"rounds must be in [1, ${trees.length}], got $rounds")
      new SoftprobModel(uid, trees.take(rounds), eta, numClasses)
    }
  }

  private[ml] def softmaxInPlace(m: Array[Double]): Array[Double] = {
    var mx = m(0); var k = 1
    while (k < m.length) { if (m(k) > mx) mx = m(k); k += 1 }
    var s = 0.0; k = 0
    while (k < m.length) { m(k) = math.exp(m(k) - mx); s += m(k); k += 1 }
    k = 0
    while (k < m.length) { m(k) /= s; k += 1 }
    m
  }

  /** Per-round eval history on a frame in ONE pass (the multiclass
    * analog of StagedEval's staged margins): each row walks the
    * forest once, accumulating margins round by round and emitting
    * that round's (logloss, error) contribution; the per-round
    * averages are one weighted aggregation. `df` must carry
    * `features` and `label`; optional weight column weights both
    * metrics (`sample_weight_eval_set`).
    *
    * @return ("mlogloss" → per-round, "merror" → per-round)
    */
  def stagedEval(
      model: SoftprobModel,
      df: DataFrame,
      weightCol: Option[String] = None
  ): Map[String, Array[Double]] = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val K = model.numClasses
    val perRound = udf((v: Vector, label: Double) => {
      val m = bc.value
      val f = new Array[Double](K)
      val li = label.toInt
      m.trees.map { round =>
        var k = 0
        while (k < K) { f(k) += m.eta * round(k).predict(v); k += 1 }
        val p = softmaxInPlace(f.clone())
        var am = 0; k = 1
        while (k < K) { if (f(k) > f(am)) am = k; k += 1 }
        (-math.log(math.max(p(li), 1e-15)), if (am == li) 0.0 else 1.0)
      }
    })
    val w = weightCol.map(col).getOrElse(lit(1.0))
    val staged = df
      .select(perRound(col("features"), col("label").cast(DoubleType)).as("s"),
        w.as("w"))
    val rounds = model.trees.length
    val aggs = (0 until rounds).flatMap { r =>
      Seq(sum(element_at(col("s"), r + 1)("_1") * col("w")).as(s"l$r"),
        sum(element_at(col("s"), r + 1)("_2") * col("w")).as(s"e$r"))
    } :+ sum(col("w")).as("wt")
    val row = staged.agg(aggs.head, aggs.tail: _*).head()
    val wt = row.getDouble(2 * rounds)
    val lo = Array.tabulate(rounds)(r => row.getDouble(2 * r) / wt)
    val er = Array.tabulate(rounds)(r => row.getDouble(2 * r + 1) / wt)
    Map("mlogloss" -> lo, "merror" -> er)
  }

  /** Train the softprob forest. `data` must carry `features` (vector)
    * and `label` (double class ids 0..K−1); an optional weight column
    * multiplies the per-row hessian (sample weights scale the Newton
    * normal equations uniformly, the standard weighted-boosting
    * treatment).
    *
    * @return the model plus the per-round TRAIN mlogloss history
    *         (entry r = loss after r rounds, XGBoost's convention)
    */
  def train(
      data: DataFrame,
      params: GraftBoost.BoostParams,
      numClasses: Int,
      weightCol: Option[String] = None
  ): (SoftprobModel, Array[Double]) = {
    require(numClasses >= 2, s"numClasses must be >= 2, got $numClasses")
    val spark = data.sparkSession
    val K = numClasses
    val keep = Seq(col("features"), col("label")) ++ weightCol.map(col)
    var cur = data.select(keep: _*)
      .withColumn("f", array_repeat(lit(0.0), K))
      .localCheckpoint()

    // softmax(F) as columns: max-shifted exp, normalized. The exp
    // array and its sum are materialized in their own projections
    // before the normalizing lambda references them (CLAUDE.md HOF
    // rule — inlining re-evaluates them per element).
    def withProbs(df: DataFrame): DataFrame = {
      val mx = array_max(col("f"))
      df.withColumn("ex", transform(col("f"), x => exp(x - mx)))
        .withColumn("exs", aggregate(col("ex"), lit(0.0), (a, y) => a + y))
        .withColumn("p", transform(col("ex"), x => x / col("exs")))
        .drop("ex", "exs")
    }
    def mlogloss(df: DataFrame): Double =
      df.select(avg(-log(greatest(
          element_at(col("p"), col("label").cast("int") + 1), lit(1e-15)))))
        .head().getDouble(0)

    val hist = new ArrayBuffer[Double](params.numRound)
    val forest = new ArrayBuffer[Array[DecisionTreeRegressionModel]](params.numRound)
    // the scored (softmax'd) frame is computed ONCE per round and
    // serves both that round's history entry and the NEXT round's
    // gradients — no duplicate softmax scan
    var scored = withProbs(cur).cache()
    for (r <- 1 to params.numRound) {
      // XGBoost's `subsample`: one deterministic content-hash
      // Bernoulli sample per round ([[GraftBoost.roundSample]]),
      // shared by all K class trees
      val fitBase = GraftBoost.roundSample(scored, params.subsample,
        params.seed + 31L * r)
      // The K class fits of a round are INDEPENDENT given the round's
      // margins (each reads only its own gradient columns), so they
      // run overlapped from a small thread pool (optimization guide
      // §2.6 "overlap independent jobs"): each MLlib tree fit is a
      // chain of short driver-bound jobs whose stage tails otherwise
      // leave the cores idle K times per round. Each fit is a
      // deterministic function of (data, seed) alone — results are
      // identical to the sequential loop, collected by class index.
      val fitOne = (k: Int) => {
        val pk = element_at(col("p"), k + 1)
        val yk = when(col("label") === k.toDouble, lit(1.0)).otherwise(lit(0.0))
        val h0 = greatest(pk * (lit(1.0) - pk), lit(HessFloor))
        val h = weightCol.map(w => h0 * col(w)).getOrElse(h0)
        val z = least(greatest((yk - pk) / h0, lit(-ZClip)), lit(ZClip))
        new DecisionTreeRegressor()
          .setFeaturesCol("features").setLabelCol("z").setWeightCol("h")
          .setMaxDepth(params.maxDepth).setMaxBins(params.maxBins)
          .setMinInstancesPerNode(params.minChildWeight)
          .setSeed(params.seed + 31L * r + k)
          .fit(fitBase.withColumn("z", z).withColumn("h", h))
      }
      val pool = java.util.concurrent.Executors.newFixedThreadPool(K)
      val roundTrees =
        try {
          val futures = (0 until K).map { k =>
            pool.submit(new java.util.concurrent.Callable[
                org.apache.spark.ml.regression.DecisionTreeRegressionModel] {
              def call() = {
                spark.sparkContext.setJobDescription(s"boost: r$r class-$k grow")
                fitOne(k)
              }
            })
          }
          futures.map { f =>
            try f.get()
            catch {
              case e: java.util.concurrent.ExecutionException =>
                throw Option(e.getCause).getOrElse(e)
            }
          }.toArray
        } finally pool.shutdown()
      forest += roundTrees
      val bc = spark.sparkContext.broadcast(roundTrees)
      val eta = params.eta
      val upd = udf((v: Vector, f: Seq[Double]) => {
        val out = f.toArray
        var k = 0
        while (k < K) { out(k) += eta * bc.value(k).predict(v); k += 1 }
        out
      })
      val next = cur.withColumn("f", upd(col("features"), col("f")))
        .localCheckpoint()
      scored.unpersist(false)
      scored = withProbs(next).cache()
      hist += mlogloss(scored)
      cur = next
    }
    scored.unpersist(false)
    (new SoftprobModel(s"softprob_${params.seed}", forest.toArray, params.eta, K),
      hist.toArray)
  }
}
