package graft.ml

import org.apache.spark.ml.classification.{
  GBTClassificationModel, GBTClassifier, OneVsRest, OneVsRestModel,
  ProbabilisticClassificationModel, RandomForestClassifier, RandomForestClassificationModel
}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.ml.Model
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed gradient-boosted training/scoring — the Spark-native
  * restatement of the reference's `train`/`predict` dataflow
  * (reference `core.py:268-321` train facade, `core.py:324-382`
  * predict dispatch).
  *
  * The reference's entire distribution machinery — partition triads,
  * locality pinning, the Rabit allreduce tracker (`core.py:183-253`,
  * `tracker.py`) — is structurally subsumed here: one DataFrame
  * co-locates features/label/weight, Spark's scheduler places tasks
  * data-local, and MLlib's boosting aggregates split statistics with
  * `treeAggregate` instead of an external allreduce ring. `fit` is a
  * sequence of distributed jobs; the model returns to the driver like
  * the reference's rank-0 booster (`core.py:126-131, 255-257`).
  *
  * Scale posture: training data should be cached by the caller for
  * iterative boosting; scoring broadcasts the model once into a
  * codegen'd `transform` (vs. the reference's per-task closure
  * serialization, `core.py:367`).
  */
object GraftBoost {

  /** Minimum rows per task for the train-entry fan-out: below this a
    * histogram/stats pass's per-task compute (µs/row primitive loops)
    * drops under the task-launch overhead, and splitting wider makes
    * round loops SLOWER. ~20k rows ≈ 2-20 ms of kernel per task.
    *
    * Overridable via `-Dgraft.train.rowsPerTask` so the partition-
    * invariance sweep (GateInvarianceSpec) can force DIFFERENT
    * training layouts on the same data and assert every fitted-model
    * gate boolean is layout-independent — the round-8 flake class.
    */
  def TrainRowsPerTask: Long =
    sys.props.get("graft.train.rowsPerTask").map(_.toLong).getOrElse(20000L)

  /** Training parameters, mirroring the reference's canonical param
    * dict (`test_core.py:31-36`: max_depth, eta, objective) plus the
    * sklearn-wrapper knobs (`core.py:388-480`).
    *
    * @param objective        "binary:logistic", "multi:softprob", or
    *                         "reg:squarederror" (reference
    *                         `core.py:580-590` objective semantics)
    * @param numRound         boosting rounds (`num_boost_round`)
    * @param maxDepth         tree depth
    * @param eta              learning rate / step size
    * @param minChildWeight   approximated by minInstancesPerNode
    * @param subsample        row subsampling per tree
    * @param missing          value to treat as missing. MLlib has no
    *                         sparse-skip missing handling
    *                         (`SURVEY.md` §7.6d): occurrences are
    *                         replaced per `missingStrategy` before
    *                         assembly — a documented divergence from
    *                         XGBoost.
    * @param multiclassStrategy "ovr" = OneVsRest over binary GBT
    *                         (closest to multi:softprob boosting);
    *                         "rf" = RandomForest (single model,
    *                         native probabilities; faster at scale)
    * @param seed             determinism anchor
    */
  final case class BoostParams(
      objective: String = "binary:logistic",
      numRound: Int = 10,
      maxDepth: Int = 3,
      eta: Double = 0.3,
      minChildWeight: Int = 1,
      subsample: Double = 1.0,
      missing: Option[Double] = None,
      multiclassStrategy: String = "ovr",
      seed: Long = 42L,
      /** How the `missing` marker is handled (reference sparse-skip
        * semantics, `core.py:370-377`):
        *  - "impute": marker → training-time column mean (default;
        *    smooth but diverges from XGBoost on sparse data)
        *  - "sentinel": marker → a training-time out-of-range value
        *    (beyond the feature's observed max). MLlib rejects NaN in
        *    feature vectors outright (checkNonNanVectors), so true
        *    NaN-routing is unavailable; the sentinel instead gives
        *    missing rows their own separable region, letting each
        *    split isolate them — the closest expressible analog of
        *    XGBoost's learned default direction, and like XGBoost the
        *    marker never blends into real-value statistics.
        *  - "native": marker → NaN, trained by the from-scratch
        *    sparsity-aware loop ([[SparseBoost]]) that LEARNS a
        *    default direction per split — the actual XGBoost
        *    mechanism (Chen & Guestrin §3.3). binary:logistic and
        *    reg:squarederror only.
        */
      missingStrategy: String = "impute",
      /** Histogram bins per feature (MLlib maxBins). 32 is MLlib's
        * default; 16 measurably cuts fit time on low-cardinality
        * numeric features with no accuracy change (MaxBinsProbe).
        */
      maxBins: Int = 32,
      /** Target quantile for `reg:quantileerror` (XGBoost's
        * `quantile_alpha`); ignored by other objectives.
        */
      quantileAlpha: Double = 0.5,
      /** L2 leaf regularization (XGBoost's `lambda`, default 1).
        * Used by the native sparse loop ([[SparseBoost]]); the
        * MLlib-backed paths have no leaf shrinkage knob.
        */
      lambdaL2: Double = 1.0,
      /** Minimum loss reduction to make a split (XGBoost's `gamma` /
        * `min_split_loss`, default 0). Native loop only.
        */
      gammaMinSplitLoss: Double = 0.0,
      /** Fraction of features considered per tree (XGBoost's
        * `colsample_bytree`). The subset is a deterministic hash
        * ranking per round — reproducible with no RNG state. Native
        * loop only.
        */
      colsampleBytree: Double = 1.0,
      /** Fraction of the tree's feature subset re-sampled at each
        * DEPTH (XGBoost's `colsample_bylevel`) and at each NODE
        * (`colsample_bynode`). Cumulative, exactly as in XGBoost:
        * bynode samples from bylevel's subset, which samples from
        * bytree's. Deterministic hash draws. Native loop only.
        */
      colsampleBylevel: Double = 1.0,
      colsampleBynode: Double = 1.0,
      /** Hard cap on the magnitude of each leaf's Newton step BEFORE
        * η (XGBoost's `max_delta_step`, default 0 = no cap) — the
        * stabilizer XGBoost recommends for extremely imbalanced
        * logistic fits. Native loop only.
        */
      maxDeltaStep: Double = 0.0,
      /** Global bias on the margin scale (XGBoost's `base_score` is a
        * PROBABILITY for binary:logistic, default 0.5 → margin 0; here
        * the value is taken on the margin/link scale directly so one
        * knob serves every objective; NaN = objective default). Native
        * loop + gblinear.
        */
      baseScore: Double = Double.NaN,
      /** Gradient/hessian multiplier on positive-class rows
        * (XGBoost's `scale_pos_weight`) — class-imbalance control for
        * binary:logistic. Native loop only.
        */
      scalePosWeight: Double = 1.0,
      /** Per-feature monotone constraints (XGBoost's
        * `monotone_constraints`): +1 non-decreasing, −1
        * non-increasing, 0 free. Empty = unconstrained. Native loop
        * only; enforced by split rejection + child value-bound
        * propagation, so the FINAL model is monotone, not just each
        * split.
        */
      monotoneConstraints: Seq[Int] = Nil,
      /** Feature interaction constraints (XGBoost's
        * `interaction_constraints`): each inner list is a group of
        * feature indices allowed to interact. A node may split on
        * feature j only if some group contains j TOGETHER WITH every
        * feature already used on the root path — XGBoost's exact
        * rule, under which features in no group become unusable once
        * any constraint is given. Empty = unconstrained. Native loop
        * only.
        */
      interactionConstraints: Seq[Seq[Int]] = Nil,
      /** Variance power ρ ∈ (1, 2) for `reg:tweedie` (XGBoost's
        * `tweedie_variance_power`, default 1.5): compound
        * Poisson-gamma — point mass at zero plus positive skew, the
        * insurance-severity shape. Ignored by other objectives.
        */
      tweedieVariancePower: Double = 1.5,
      /** Split-candidate proposal for the native loop (XGBoost's
        * `tree_method` axis): "exact" computes true quantiles of each
        * feature (deterministic; one sort-based aggregate per
        * feature), "approx" uses Spark's mergeable Greenwald-Khanna
        * sketch (`percentile_approx`) — the O(1)-memory-per-partition
        * form that survives 100 TB scans. Candidate sets differ
        * within sketch error; tree quality is equivalent (pinned in
        * SparseBoostSpec). XGBoost additionally hessian-weights its
        * approx sketch per iteration; this proposal is one-shot and
        * unweighted (documented divergence).
        */
      splitProposal: String = "exact",
      /** Tree growth policy for the native loop (XGBoost's
        * `grow_policy`): "depthwise" (default; one histogram pass per
        * level) or "lossguide" (best-first — always expand the
        * highest-gain leaf, LightGBM-style; one histogram pass per
        * expansion). Split semantics are shared, only the expansion
        * ORDER and shape budget differ.
        */
      growPolicy: String = "depthwise",
      /** Leaf budget for `grow_policy = "lossguide"` (XGBoost's
        * `max_leaves`; 0 = unbounded — growth then stops on gain /
        * min_child_weight / maxDepth alone).
        */
      maxLeaves: Int = 0,
      /** L1 leaf/weight regularization (XGBoost's `alpha`, default
        * 0). Used by the gblinear coordinate updates (soft threshold
        * — drives small weights exactly to zero).
        */
      alphaL1: Double = 0.0,
      /** Booster variant (XGBoost's `booster`): "gbtree" (default),
        * "gblinear" — elastic-net coordinate-descent linear boosting
        * ([[LinearBoost]]) — or "dart" — per-round dropout of earlier
        * trees (Vinayak & Gilad-Bachrach 2015) with the paper's
        * "tree" normalization: the round trains against the margins
        * of the NON-dropped trees, the new tree enters at weight
        * 1/(k+1) and the k dropped trees are permanently rescaled by
        * k/(k+1). With `rateDrop = 0` every round degenerates to
        * plain gbtree (bit-identical — pinned in spec). Divergence
        * note: XGBoost entangles the learning rate into its
        * normalization constants (lr/(k+lr)); here η is already
        * folded into stored leaf values, so the paper's constants
        * apply to the η-scaled trees.
        */
      booster: String = "gbtree",
      /** DART dropout rate: each earlier tree independently drops for
        * the round with this probability (deterministic fmix64 of
        * (seed, round, tree) — no RNG state).
        */
      rateDrop: Double = 0.0,
      /** DART: probability a round skips dropout entirely (XGBoost's
        * `skip_drop`); a skipped round is a plain gbtree round.
        */
      skipDrop: Double = 0.0,
      /** Trees trained per boosting round (XGBoost's
        * `num_parallel_tree`): each of the T trees sees the SAME
        * round gradients through its own deterministic subsample and
        * colsample draws, and the round's update is their AVERAGE
        * (leaf values stored pre-scaled by 1/T, so the model stays a
        * plain tree sum). numRound = 1 with T > 1 and eta = 1 is a
        * random forest with native NaN routing. Divergence note:
        * XGBoost SUMS its parallel trees unscaled and leaves the
        * 1/T to the caller's learning-rate choice; averaging here
        * makes T a pure variance knob with no step-size coupling —
        * set [[parallelTreeUpdate]] = "sum" for XGBoost's semantics.
        * Native tree loop only; incompatible with DART (XGBoost
        * shares that restriction).
        */
      numParallelTree: Int = 1,
      /** How a round's T parallel trees enter the margin update:
        *  - "average" (default): leaf values pre-scaled by 1/T, the
        *    round's step is the ensemble MEAN — T is a pure variance
        *    knob decoupled from step size;
        *  - "sum": XGBoost compatibility — member trees summed
        *    UNSCALED (xgboost's num_parallel_tree semantics), the
        *    effective step grows with T exactly as there.
        * T = 1 is bit-identical under both modes (no scaling either
        * way). Round-indexed machinery (truncate, staged eval) is
        * mode-agnostic: it walks whole T-tree round groups.
        */
      parallelTreeUpdate: String = "average",
      /** gblinear coordinate-selection rule per round (XGBoost's
        * `feature_selector`; reference params passthrough
        * core.py:118-124):
        *  - "shotgun" (default): every coordinate moves each round
        *    via the damped simultaneous Jacobi step;
        *  - "greedy": only the [[topK]] coordinates with the largest
        *    bias-adjusted gradient magnitude move (XGBoost: "select
        *    coordinate with the greatest gradient magnitude");
        *  - "thrifty": only the [[topK]] coordinates with the
        *    largest proposed univariate weight-change magnitude move
        *    (XGBoost: "reorders features in descending magnitude of
        *    their univariate weight changes"). Caveat XGBoost shares:
        *    weight-change ranking is scale-sensitive — a small-scale
        *    feature's large weight can monopolize the budget;
        *  - "cyclic": a deterministic round-robin window of [[topK]]
        *    coordinates moves each round;
        *  - "shuffle": cyclic over a per-round hash permutation of
        *    the features (XGBoost's shuffled-cyclic, deterministic
        *    here — no RNG state);
        *  - "random": [[topK]] with-replacement hash draws per round
        *    (deduplicated before applying — a coordinate moves once).
        * Divergence note: XGBoost's greedy re-evaluates gradients
        * after every single coordinate update (O(numFeat²) passes);
        * here selection is within the one distributed stats pass per
        * round — same ranking signal, Jacobi application. gblinear
        * only.
        */
      featureSelector: String = "shotgun",
      /** Coordinates moved per round under greedy/thrifty/cyclic
        * selection (XGBoost's `top_k`); 0 = all features (XGBoost's
        * own 0 default). gblinear only.
        */
      topK: Int = 0
  ) {
    require(parallelTreeUpdate == "average" || parallelTreeUpdate == "sum",
      s"parallelTreeUpdate must be \"average\" or \"sum\", got $parallelTreeUpdate")
    require(Set("shotgun", "cyclic", "greedy", "thrifty", "shuffle", "random")
        .contains(featureSelector),
      s"featureSelector must be shotgun, cyclic, shuffle, random, " +
      s"greedy or thrifty, got $featureSelector")
    require(topK >= 0, s"topK must be >= 0, got $topK")
    require(splitProposal == "exact" || splitProposal == "approx",
      s"splitProposal must be \"exact\" or \"approx\", got $splitProposal")
    require(growPolicy == "depthwise" || growPolicy == "lossguide",
      s"growPolicy must be \"depthwise\" or \"lossguide\", got $growPolicy")
    require(maxLeaves >= 0, s"maxLeaves must be >= 0, got $maxLeaves")
    require(booster == "gbtree" || booster == "dart" || booster == "gblinear",
      s"booster must be \"gbtree\", \"gblinear\" or \"dart\", got $booster")
    require(alphaL1 >= 0.0, s"alphaL1 must be >= 0, got $alphaL1")
    require(colsampleBylevel > 0.0 && colsampleBylevel <= 1.0,
      s"colsampleBylevel must be in (0, 1], got $colsampleBylevel")
    require(colsampleBynode > 0.0 && colsampleBynode <= 1.0,
      s"colsampleBynode must be in (0, 1], got $colsampleBynode")
    require(maxDeltaStep >= 0.0, s"maxDeltaStep must be >= 0, got $maxDeltaStep")
    require(rateDrop >= 0.0 && rateDrop < 1.0,
      s"rateDrop must be in [0, 1), got $rateDrop")
    require(skipDrop >= 0.0 && skipDrop <= 1.0,
      s"skipDrop must be in [0, 1], got $skipDrop")
    require(numParallelTree >= 1,
      s"numParallelTree must be >= 1, got $numParallelTree")
    require(numParallelTree == 1 || booster == "gbtree",
      "num_parallel_tree > 1 needs the tree booster (DART dropout and " +
      "gblinear have no parallel-tree path)")
    GraftBoost.validateMissingStrategy(missingStrategy)
  }

  /** Deterministic hash-Bernoulli row filter for stochastic-boosting
    * rounds (XGBoost's `subsample`, Friedman 2002): keyed by the
    * CONTENT of (features, label) mixed with the round seed, so the
    * sample is reproducible across runs with no RNG state, reshuffles
    * per round, and stays well-mixed even when labels take only a few
    * distinct values (class ids, small counts — a label-only key
    * would sample whole classes in or out). `df` must carry
    * `features` (vector) and `label`.
    */
  /** murmur3's 64-bit finalizer — the avalanche mix behind every
    * deterministic no-RNG-state draw in the boosting loops (round
    * subsampling keys, colsample masks, DART dropout). One definition
    * so the constants can never drift between call sites.
    */
  private[ml] def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  private[ml] def roundSample(df: DataFrame, subsample: Double, seed: Long): DataFrame =
    if (subsample >= 1.0) df
    else {
      val keep = math.round(subsample * 1000)
      val hU = udf((v: Vector, label: Double) => {
        var h = seed ^ 0x9e3779b97f4a7c15L
        val a = v.toArray
        var i = 0
        while (i < a.length) {
          h ^= java.lang.Double.doubleToLongBits(a(i))
          h *= 0x100000001b3L
          h ^= h >>> 33
          i += 1
        }
        h ^= java.lang.Double.doubleToLongBits(label)
        h *= 0x100000001b3L
        h ^= h >>> 33
        ((h % 1000) + 1000) % 1000
      })
      val out = df.filter(hU(col("features"), col("label").cast("double")) < lit(keep))
      // content-identical rows sample together, so a tiny frame with
      // few distinct rows can sample EMPTY — fall back to the full
      // frame (deterministically) rather than hand MLlib an empty fit
      if (out.isEmpty) df else out
    }

  /** Train-history metric name for the native sparse loop's
    * objectives (XGBoost's default eval metric per objective).
    */
  private[ml] def sparseMetricName(objective: String): String = objective match {
    case "binary:logistic" => "logloss"
    case "reg:gamma"       => "gamma-deviance"
    case "reg:tweedie"     => "tweedie-nloglik"
    case _                 => "rmse"
  }

  /** Single validator shared by BoostParams and the estimator setter
    * — one place to extend when a new strategy is added.
    */
  def validateMissingStrategy(s: String): Unit =
    require(s == "impute" || s == "sentinel" || s == "native",
      s"unknown missingStrategy '$s' (use \"impute\", \"sentinel\" or \"native\")")

  /** Trained model + training metadata. `numClasses` mirrors the
    * reference's `num_class` model attribute (`core.py:262-264`);
    * `evalsResult` mirrors the per-eval-set history dict
    * (`core.py:120, 259-260`), filled by [[evalHistory]].
    */
  final case class GraftBoostModel(
      model: Model[_],
      featureCols: Seq[String],
      objective: String,
      numClasses: Int,
      evalsResult: Map[String, Map[String, Array[Double]]],
      /** Missing-marker substitution learned at training time
        * (marker value, per-feature replacement values — column means
        * under "impute", out-of-range sentinels under "sentinel") —
        * applied at scoring so train and serve see identical
        * preprocessing.
        */
      imputation: Option[(Double, Map[String, Double])] = None,
      /** "impute" or "sentinel" — see [[BoostParams.missingStrategy]]. */
      missingStrategy: String = "impute",
      /** Per-class Platt scaling (A, B) fitted by [[calibrate]]:
        * OvR class probability = sigmoid(A·margin + B), renormalized.
        * None → predictProba falls back to softmax-of-margins.
        */
      calibration: Option[Array[(Double, Double)]] = None
  )

  /** Assemble named feature columns into a `features` vector —
    * the `xgb.DMatrix` featurizer equivalence (`core.py:108`;
    * feature-name capture `core.py:107` becomes ML attribute
    * metadata on the vector column). Applies the missing-marker
    * imputation if configured.
    */
  /** Learn per-feature means over non-marker values (the imputation
    * statistics stored on the model for serve-time parity).
    */
  def learnImputation(
      df: DataFrame,
      featureCols: Seq[String],
      marker: Double
  ): Map[String, Double] = {
    val means = df
      .select(featureCols.map(c =>
        avg(when(col(c) =!= marker, col(c))).as(c)): _*)
      .first()
    featureCols.zipWithIndex.map { case (c, i) =>
      c -> Option(means.get(i)).map(_.toString.toDouble).getOrElse(0.0)
    }.toMap
  }

  /** Learn per-feature out-of-range sentinels (missingStrategy =
    * "sentinel"): a value strictly beyond the observed non-marker max,
    * so tree splits can isolate missing rows as their own group.
    */
  def learnSentinels(
      df: DataFrame,
      featureCols: Seq[String],
      marker: Double
  ): Map[String, Double] = {
    val maxes = df
      .select(featureCols.map(c =>
        max(when(col(c) =!= marker, col(c))).as(c)): _*)
      .first()
    featureCols.zipWithIndex.map { case (c, i) =>
      val mx = Option(maxes.get(i)).map(_.toString.toDouble).getOrElse(0.0)
      c -> (mx + 1.0 + math.abs(mx))
    }.toMap
  }

  /** `base_margin` column with a loud null/NaN guard: the margin
    * scoring UDFs take a primitive Double, so Spark's null handling
    * would otherwise short-circuit to silent null predictions (and a
    * null margin in TRAINING would silently null the gradient chain).
    */
  private[ml] def marginColumn(mc: String): Column = {
    val c = col(mc).cast("double")
    when(c.isNull || isnan(c),
      raise_error(lit(s"base_margin column '$mc' contains null/NaN — " +
        "every row needs a finite margin")))
      .otherwise(c)
  }

  def assemble(
      df: DataFrame,
      featureCols: Seq[String],
      imputation: Option[(Double, Map[String, Double])],
      keepNaN: Boolean = false
  ): DataFrame = {
    // Pre-assembled vector column (e.g. embeddings via
    // array_to_vector) passes straight through.
    if (featureCols == Seq("features") &&
        df.schema("features").dataType.typeName == "vector")
      return df
    val cleaned = imputation match {
      case None => df
      case Some((marker, repl)) =>
        // Replace the marker with the TRAINING-time replacement value
        // (column mean, out-of-range sentinel, or NaN for the native
        // sparse path — learned/fixed at fit time and carried on the
        // model for serve parity). A NaN marker (ingested-gblinear
        // stock serving: missing entry = zero contribution) needs the
        // explicit isnan test — equality on NaN is Spark-special-cased
        // but isnan states the intent.
        featureCols.foldLeft(df) { case (d, c) =>
          val isMissing = if (marker.isNaN) isnan(col(c)) else col(c) === marker
          d.withColumn(c, when(isMissing, repl(c)).otherwise(col(c)))
        }
    }
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      // "keep" lets NaN ride into the vector for the native
      // sparse-skip path; MLlib-backed paths keep the erroring
      // default so a stray NaN fails loudly instead of mistraining
      .setHandleInvalid(if (keepNaN) "keep" else "error")
      .transform(cleaned)
  }

  /** Distributed training — `train(client, params, data, labels, …)`
    * parity (`core.py:268-321`). The label/weight alignment checks of
    * the reference (`core.py:201-206`) are structurally unnecessary:
    * all columns ride one DataFrame.
    *
    * @param df          training frame holding `featureCols`,
    *                    `labelCol`, optionally `weightCol` and an
    *                    `isVal` boolean validation indicator
    * @param validationCol when set, names a boolean column marking
    *                    held-out rows — early stopping stops when the
    *                    validation loss stops improving (reference
    *                    early-stopping semantics, `core.py:435-449`)
    */
  def train(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      params: BoostParams = BoostParams(),
      weightCol: Option[String] = None,
      validationCol: Option[String] = None,
      /** Query/group id column for ranking objectives — the
        * reference's DMatrix group vector.
        */
      groupCol: Option[String] = None,
      /** Per-row `base_margin` column (the reference's
        * `dmatrix_kwargs` surface, `core.py:143-147`): the boosting
        * recursion starts from this row's margin INSTEAD of the
        * scalar base — stock semantics (base_score unused when
        * base_margin is supplied). Native sparse loop only.
        */
      marginCol: Option[String] = None
  ): GraftBoostModel = {
    val native = params.missingStrategy == "native"
    if (marginCol.isDefined)
      require((native || params.objective == "reg:gamma" ||
        params.objective == "reg:tweedie") &&
        !params.objective.startsWith("rank:") &&
        params.booster != "gblinear",
        "per-row base_margin runs in the native sparse loop — set " +
        "missingStrategy=\"native\" (or a gamma/tweedie objective); " +
        "the MLlib-backed, linear, ranking and multiclass paths have " +
        "no margin-initialization hook")
    val imputation = params.missing.map { m =>
      params.missingStrategy match {
        case "sentinel" => (m, learnSentinels(df, featureCols, m))
        // native: the marker becomes NaN and the sparse loop routes
        // it along the learned default branch — nothing to learn here
        case "native" => (m, featureCols.map(_ -> Double.NaN).toMap)
        case _ => (m, learnImputation(df, featureCols, m))
      }
    }
    // Fan the training frame out BY NUMBER before the fit: a
    // single-row-group parquet source leaves every row in ONE task
    // regardless of split count (splits below row-group size are
    // empty), which serializes every per-round stats/histogram pass —
    // and MLlib's own iterations — onto one core. One shuffle of the
    // slim assembled rows, amortized over numRound × levels passes;
    // XGBoost4J-Spark likewise repartitions to its worker count at
    // train entry. SIZE-AWARE: the partition count is
    // n / TrainRowsPerTask capped at defaultParallelism — a tiny
    // frame (softprob's 1.6k-row per-class loops) must NOT be split
    // 32 ways, or task-launch overhead × (rounds × levels × classes)
    // passes dominates (measured: 9.5s → 15s on ml_multiclass_softprob
    // with an unconditional fan-out). The count() is one cheap scan —
    // training then reads the frame rounds × levels times. Partition
    // contents stay deterministic (sortBeforeRepartition), so the
    // partition-index partial folds keep their bit-stability contract.
    // Project to EXACTLY the columns training reads before anything is
    // shuffled or stored: VectorAssembler keeps its raw inputs (and
    // whatever else rides the frame — text payloads on the text
    // queries), so an unprojected fan-out shuffles and materializes
    // the feature bytes twice plus dead columns on every pre-round
    // pass (guide §2.3 "project before the exchange").
    val trainCols: Seq[Column] =
      (Seq("features", "label") ++
        (weightCol ++ validationCol ++ groupCol ++ marginCol))
        .distinct.map(col)
    val assembled = assemble(df, featureCols, imputation, keepNaN = native)
      .withColumn("label", col(labelCol).cast("double"))
      .select(trainCols: _*)
    val trainParts = {
      df.sparkSession.sparkContext.setJobDescription("boost: input count")
      val n = assembled.count()
      math.min(df.sparkSession.sparkContext.defaultParallelism.toLong,
        math.max(1L, n / TrainRowsPerTask)).toInt
    }
    // Materialize the (repartitioned, slim) training frame ONCE before
    // the fit. Without this every pre-round action — the numFeat
    // head(), the proposeEdges quantile pass, the base-score mean, the
    // round-0 margin checkpoint, MLlib's own input cache fill —
    // re-executes the assemble pipeline AND the fan-out shuffle from
    // the source (3-4 redundant executions per fit; worse when the
    // source is a single-row-group parquet whose scan is one serial
    // task). localCheckpoint is eager and freezes the layout one
    // repartition execution produces, so the partition-index partial
    // folds see one consistent layout; at cluster scale caching the
    // training frame across rounds×levels passes is the standard
    // distributed-boosting posture (XGBoost4J-Spark caches its
    // converted input the same way).
    df.sparkSession.sparkContext.setJobDescription("boost: train materialize")
    val data =
      (if (trainParts > 1) assembled.repartition(trainParts) else assembled)
        .localCheckpoint()
    df.sparkSession.sparkContext.setJobDescription(null)

    if (params.booster == "gblinear") {
      require(!native,
        "gblinear has no sparse-skip routing — use missingStrategy " +
        "\"impute\" or \"sentinel\" with the linear booster")
      require(validationCol.isEmpty,
        "gblinear records its train history itself; use StagedEval-style " +
        "post-hoc evaluation for validation metrics")
      val (m, histL) = LinearBoost.train(data, params, weightCol)
      return GraftBoostModel(m, featureCols, params.objective,
        if (params.objective == "binary:logistic") 2 else 0,
        Map("train" -> Map(sparseMetricName(params.objective) -> histL)),
        imputation, params.missingStrategy)
    }
    // DART dropout lives in the native sparse TRAIN loop only —
    // ignoring it silently on an MLlib path (or in the RankBoost
    // loop, which manages its own forest without dropout) would fake
    // the mechanism
    if (params.booster == "dart")
      require((native || params.objective == "reg:gamma" ||
        params.objective == "reg:tweedie") &&
        !params.objective.startsWith("rank:"),
        "booster=\"dart\" runs in the native loop — set " +
        "missingStrategy=\"native\" (or a gamma/tweedie objective); " +
        "ranking objectives have no DART path")
    if (params.growPolicy == "lossguide")
      require(native || params.objective == "reg:gamma" ||
        params.objective == "reg:tweedie" ||
        params.objective.startsWith("rank:"),
        "grow_policy=\"lossguide\" runs in the native tree loop — set " +
        "missingStrategy=\"native\" (or a gamma/tweedie/rank objective)")
    if (params.numParallelTree > 1)
      require((native || params.objective == "reg:gamma" ||
        params.objective == "reg:tweedie") &&
        !params.objective.startsWith("rank:"),
        "num_parallel_tree > 1 runs in the native tree loop — set " +
        "missingStrategy=\"native\" (or a gamma/tweedie objective); " +
        "the ranking loop has no parallel-tree path")

    if (params.objective == "rank:pairwise" || params.objective == "rank:ndcg") {
      // pairwise learning-to-rank (plain RankNet pairs or ΔNDCG-
      // weighted LambdaMART) — a custom loop (RankBoost) whose tree
      // learner is the shared sparse histogram grower, so the native
      // NaN routing above applies to ranking too
      require(groupCol.isDefined,
        "ranking objectives need groupCol (the DMatrix group vector)")
      require(validationCol.isEmpty,
        "ranking records its NDCG train history itself")
      val (m, histR) = RankBoost.train(
        data.withColumn("group", col(groupCol.get)), params)
      return GraftBoostModel(m, featureCols, params.objective, 0,
        Map("train" -> Map("ndcg@10" -> histR)), imputation,
        params.missingStrategy)
    }

    if (native) {
      // XGBoost's sparsity-aware mechanism — a custom histogram loop
      // (SparseBoost) since MLlib rejects NaN features outright
      require(validationCol.isEmpty,
        "native sparse boosting records its train history itself; " +
        "use StagedEval on the returned model for validation metrics")
      val (m, histN) = SparseBoost.train(data, params, weightCol, marginCol)
      return GraftBoostModel(m, featureCols, params.objective,
        if (params.objective == "binary:logistic") 2 else 0,
        Map("train" -> Map(sparseMetricName(params.objective) -> histN)),
        imputation, "native")
    }

    params.objective match {
      case "reg:squarederror" =>
        val gbt = new GBTRegressor()
          .setFeaturesCol("features").setLabelCol("label")
          .setMaxIter(params.numRound).setMaxDepth(params.maxDepth)
          .setStepSize(params.eta).setSubsamplingRate(params.subsample)
          .setMinInstancesPerNode(params.minChildWeight)
          .setMaxBins(params.maxBins)
          .setSeed(params.seed)
        weightCol.foreach(gbt.setWeightCol)
        validationCol.foreach(gbt.setValidationIndicatorCol)
        val model = gbt.fit(data)
        GraftBoostModel(model, featureCols, params.objective, 0, Map.empty, imputation, params.missingStrategy)

      case "reg:absoluteerror" =>
        // XGBoost's L1 objective → MLlib's native absolute (LAD) GBT
        // loss: median-seeking regression with the same lifecycle.
        val gbt = new GBTRegressor()
          .setFeaturesCol("features").setLabelCol("label")
          .setLossType("absolute")
          .setMaxIter(params.numRound).setMaxDepth(params.maxDepth)
          .setStepSize(params.eta).setSubsamplingRate(params.subsample)
          .setMinInstancesPerNode(params.minChildWeight)
          .setMaxBins(params.maxBins)
          .setSeed(params.seed)
        weightCol.foreach(gbt.setWeightCol)
        validationCol.foreach(gbt.setValidationIndicatorCol)
        val model = gbt.fit(data)
        GraftBoostModel(model, featureCols, params.objective, 0, Map.empty, imputation, params.missingStrategy)

      case "reg:quantileerror" =>
        // pinball-loss boosting with exact leaf-quantile line search —
        // a custom loop (QuantileBoost), MLlib GBT has no quantile loss
        require(validationCol.isEmpty,
          "quantile boosting records its train history itself; " +
          "validation-indicator early stopping is unavailable")
        val (m, histQ) = QuantileBoost.train(data, params,
          params.quantileAlpha, weightCol)
        GraftBoostModel(m, featureCols, params.objective, 0,
          Map("train" -> Map("pinball" -> histQ)), imputation,
          params.missingStrategy)

      case "reg:gamma" | "reg:tweedie" =>
        // log-link deviance objectives — always the native histogram
        // loop (SparseBoost); MLlib GBT has neither loss family
        require(validationCol.isEmpty,
          "gamma/tweedie boosting records its train history itself")
        val (m, histG) = SparseBoost.train(data, params, weightCol, marginCol)
        GraftBoostModel(m, featureCols, params.objective, 0,
          Map("train" -> Map(sparseMetricName(params.objective) -> histG)),
          imputation, params.missingStrategy)

      case "count:poisson" =>
        // log-link Newton boosting — a custom loop (PoissonBoost),
        // MLlib GBT has neither Poisson loss nor link functions
        require(validationCol.isEmpty,
          "poisson boosting records its train history itself; " +
          "validation-indicator early stopping is unavailable")
        val (m, histP) = PoissonBoost.train(data, params, weightCol)
        GraftBoostModel(m, featureCols, params.objective, 0,
          Map("train" -> Map("poisson-deviance" -> histP)), imputation,
          params.missingStrategy)

      case "binary:logistic" =>
        val gbt = new GBTClassifier()
          .setFeaturesCol("features").setLabelCol("label")
          .setMaxIter(params.numRound).setMaxDepth(params.maxDepth)
          .setStepSize(params.eta).setSubsamplingRate(params.subsample)
          .setMinInstancesPerNode(params.minChildWeight)
          .setMaxBins(params.maxBins)
          .setSeed(params.seed)
        weightCol.foreach(gbt.setWeightCol)
        validationCol.foreach(gbt.setValidationIndicatorCol)
        val model = gbt.fit(data)
        GraftBoostModel(model, featureCols, params.objective, 2, Map.empty, imputation, params.missingStrategy)

      case "multi:softprob" | "multi:softmax" =>
        // Class inference = the reference's eager distributed
        // distinct (`core.py:561-566`).
        val numClasses = data.select(max(col("label"))).first().getDouble(0).toInt + 1
        if (params.multiclassStrategy == "softprob") {
          // the TRUE single-model mechanism (core.py:580-590): K trees
          // per round on shared multinomial softmax gradients
          require(validationCol.isEmpty,
            "softprob multiclass records its train history itself; " +
            "use multiclassStrategy=ovr for validation columns")
          val (m, hist) = SoftprobBoost.train(data, params, numClasses, weightCol)
          GraftBoostModel(m, featureCols, params.objective, numClasses,
            Map("train" -> Map("mlogloss" -> hist)), imputation,
            params.missingStrategy)
        } else {
          val model: Model[_] = params.multiclassStrategy match {
            case "rf" =>
              require(validationCol.isEmpty,
                "RandomForest multiclass has no validation-based early stopping; " +
                "use multiclassStrategy=ovr for validation columns")
              val rf = new RandomForestClassifier()
                .setFeaturesCol("features").setLabelCol("label")
                .setNumTrees(params.numRound).setMaxDepth(params.maxDepth)
                .setSubsamplingRate(params.subsample)
                .setMinInstancesPerNode(params.minChildWeight)
                .setMaxBins(params.maxBins)
                .setSeed(params.seed)
              weightCol.foreach(rf.setWeightCol)
              rf.fit(data)
            case _ =>
              val base = new GBTClassifier()
                .setFeaturesCol("features").setLabelCol("label")
                .setMaxIter(params.numRound).setMaxDepth(params.maxDepth)
                .setStepSize(params.eta).setSubsamplingRate(params.subsample)
                .setMaxBins(params.maxBins)
                .setSeed(params.seed)
              weightCol.foreach(base.setWeightCol)
              validationCol.foreach(base.setValidationIndicatorCol)
              val ovr = new OneVsRest().setClassifier(base)
                .setFeaturesCol("features").setLabelCol("label")
              weightCol.foreach(ovr.setWeightCol)
              ovr.fit(data)
          }
          GraftBoostModel(model, featureCols, params.objective, numClasses,
            Map.empty, imputation, params.missingStrategy)
        }

      case other =>
        throw new IllegalArgumentException(s"unsupported objective: $other")
    }
  }

  /** Distributed lazy scoring — `predict(client, model, data)` parity
    * (`core.py:366-377`). Returns the input columns plus `prediction`
    * (double; class id or regression value). The multiclass shape
    * bookkeeping of the reference (`core.py:369-377`) is subsumed by
    * the probability vector column; see [[predictProba]].
    */
  def predict(
      model: GraftBoostModel,
      df: DataFrame,
      /** Per-row `base_margin` column — replaces the model's scalar
        * base at scoring, stock `DMatrix(base_margin=...)` semantics.
        * Native sparse forests only.
        */
      marginCol: Option[String] = None
  ): DataFrame = {
    val data = assemble(df, model.featureCols, model.imputation,
      keepNaN = model.missingStrategy == "native")
    marginCol.foreach { mc =>
      val m = model.model match {
        case sm: SparseBoost.SparseModel => sm
        case other => throw new IllegalArgumentException(
          "per-row base_margin scoring is supported on native sparse " +
          s"forests only, not ${other.getClass.getSimpleName}")
      }
      val bc = data.sparkSession.sparkContext.broadcast(m)
      val pU = udf((v: Vector, bm: Double) => bc.value.predictOne(v, bm))
      return data
        .withColumn("prediction", pU(col("features"), marginColumn(mc)))
        .drop("features")
    }
    val scored = model.model match {
      case m: SparseBoost.SparseModel     => m.transform(data)
      case m: LinearBoost.LinearModel     => m.transform(data)
      case m: GBTRegressionModel         => m.transform(data)
      case m: GBTClassificationModel     => m.transform(data)
      case m: RandomForestClassificationModel => m.transform(data)
      case m: OneVsRestModel             => m.transform(data)
      case m: SoftprobBoost.SoftprobModel => m.transform(data).drop("margins")
      case m: MultiSparse.MultiSparseModel => m.transform(data).drop("margins")
      case m: QuantileBoost.QuantileModel => m.transform(data)
      case m: PoissonBoost.PoissonModel   => m.transform(data)
      case m => throw new IllegalStateException(s"unknown model ${m.getClass}")
    }
    scored.drop("features", "rawPrediction", "probability")
  }

  /** Class-probability scoring — `predict_proba` parity
    * (`core.py:626-631`): emits `proba` as array<double> of length
    * numClasses (the reference's (n, num_class) matrix,
    * `core.py:374`).
    */
  def predictProba(
      model: GraftBoostModel,
      df: DataFrame,
      /** Per-row `base_margin` column — see [[predict]]. Binary
        * native sparse forests only.
        */
      marginCol: Option[String] = None
  ): DataFrame = {
    val data = assemble(df, model.featureCols, model.imputation,
      keepNaN = model.missingStrategy == "native")
    marginCol.foreach { mc =>
      val m = model.model match {
        case sm: SparseBoost.SparseModel if sm.objective == "binary:logistic" => sm
        case other => throw new IllegalArgumentException(
          "per-row base_margin probabilities are supported on binary " +
          s"native sparse forests only, not ${other.getClass.getSimpleName}")
      }
      val bc = data.sparkSession.sparkContext.broadcast(m)
      val pU = udf((v: Vector, bm: Double) => {
        val p = 1.0 / (1.0 + math.exp(-bc.value.marginWithBase(v, bm)))
        Array(1.0 - p, p)
      })
      return data
        .withColumn("proba", pU(col("features"), marginColumn(mc)))
        .drop("features")
    }
    model.model match {
      case m: SparseBoost.SparseModel if m.objective == "binary:logistic" =>
        // sigmoid of the boosted margin — the XGBoost binary proba
        val bc = data.sparkSession.sparkContext.broadcast(m)
        val pU = udf((v: Vector) => {
          val p = bc.value.probOf(v)
          Array(1.0 - p, p)
        })
        data.withColumn("proba", pU(col("features"))).drop("features")
      case m: LinearBoost.LinearModel if m.objective == "binary:logistic" =>
        val bc = data.sparkSession.sparkContext.broadcast(m)
        val pU = udf((v: Vector) => {
          val p = bc.value.probOf(v)
          Array(1.0 - p, p)
        })
        data.withColumn("proba", pU(col("features"))).drop("features")
      case m: SoftprobBoost.SoftprobModel => softmaxProba(m.transform(data))
      case m: MultiSparse.MultiSparseModel =>
        // the ingested-document scorer shares the softprob path —
        // its margins column has the same contract
        softmaxProba(m.transform(data))
      case m: ProbabilisticClassificationModel[_, _] =>
        m.transform(data)
          .withColumn("proba", vector_to_array(col("probability")))
          .drop("features", "rawPrediction", "probability")
      case m: OneVsRestModel =>
        // per-class margins → probabilities. With [[calibrate]]d
        // Platt parameters, each class gets sigmoid(A·margin + B)
        // renormalized — real calibrated probabilities (reference
        // multi:softprob contract). Uncalibrated fallback is softmax
        // of margins: shape-correct, values are normalized margins
        // (documented divergence). Work on a copy: mutating the
        // shared model's output column would change later predict()
        // calls' schema.
        val scorer = m.copy(org.apache.spark.ml.param.ParamMap.empty)
          .asInstanceOf[OneVsRestModel].setRawPredictionCol("rawAll")
        val raw = scorer.transform(data)
        val margins = vector_to_array(col("rawAll"))
        val scores = model.calibration match {
          case Some(ab) =>
            array(ab.zipWithIndex.map { case ((a, b), i) =>
              lit(1.0) / (lit(1.0) +
                exp(-(lit(a) * element_at(margins, i + 1) + lit(b))))
            }: _*)
          case None => transform(margins, x => exp(x))
        }
        raw
          .withColumn("sc", scores)
          .withColumn("proba", {
            val denom = aggregate(col("sc"), lit(0.0), (acc, x) => acc + x)
            transform(col("sc"), x => x / denom)
          })
          .drop("features", "rawAll", "sc")
      case m =>
        throw new IllegalStateException(s"model has no probabilities: ${m.getClass}")
    }
  }

  /** TRUE multi:softprob probabilities: softmax of the jointly
    * boosted margins — not an OvR renormalization. exp array and
    * sum materialized before the normalizing lambda (HOF rule).
    */
  private def softmaxProba(withMargins: DataFrame): DataFrame =
    withMargins
      .withColumn("ex", transform(col("margins"),
        x => exp(x - array_max(col("margins")))))
      .withColumn("exs", aggregate(col("ex"), lit(0.0), (a, y) => a + y))
      .withColumn("proba", transform(col("ex"), x => x / col("exs")))
      .drop("features", "margins", "ex", "exs")

  /** Deterministic (train, calibration) split for [[calibrate]]:
    * rows are bucketed by a content hash over every column, so the
    * split is reproducible regardless of partitioning or row order —
    * no shuffle, no sampling state, identical on re-read. Returns
    * (trainDf, calDf) with ≈ calFraction of rows in the calibration
    * side. Calibrating on training rows reuses margins the trees
    * partially memorized and yields overconfident probabilities on
    * fresh data — always calibrate on the held-out side.
    */
  def calibrationSplit(
      df: DataFrame,
      calFraction: Double = 0.2,
      seed: Long = 42L
  ): (DataFrame, DataFrame) = {
    require(calFraction > 0 && calFraction < 1,
      s"calFraction must be in (0, 1), got $calFraction")
    val bucket = pmod(
      xxhash64(struct(df.columns.map(col).toIndexedSeq: _*), lit(seed)), lit(1000L))
    val cut = math.max(1L, math.round(calFraction * 1000))
    (df.filter(bucket >= cut), df.filter(bucket < cut))
  }

  /** Platt-scale an OvR multiclass model's per-class margins on a
    * calibration frame (ideally held out): per class c, fit
    * p(y = c | margin_c) = sigmoid(A·margin_c + B) with a
    * single-feature logistic regression, store (A, B) on the model.
    * predictProba then renormalizes the calibrated per-class
    * sigmoids — real probabilities in place of softmax-of-margins
    * (reference `multi:softprob` semantics, `core.py:580-590`).
    * One scoring pass + numClasses tiny single-feature LR fits.
    *
    * The per-class fit uses Platt's OUT-OF-SAMPLE TARGET SMOOTHING
    * (Platt 1999 §2.2): instead of hard 0/1 labels, the sigmoid is
    * fit against t₊ = (N₊+1)/(N₊+2) and t₋ = 1/(N₋+2) — expressed
    * here as two weighted soft-label copies per calibration row.
    * Without it, a class whose margins separate the calibration
    * frame drives the slope A toward ∞ and every later
    * misclassification of that class to a ~0 probability (unbounded
    * log-loss on one wrong row); with it the reachable probability
    * range is bounded by the calibration counts, exactly as Platt
    * prescribes for separable calibration sets.
    */
  def calibrate(
      model: GraftBoostModel,
      df: DataFrame,
      labelCol: String
  ): GraftBoostModel = model.model match {
    case m: OneVsRestModel =>
      import org.apache.spark.ml.classification.LogisticRegression
      import org.apache.spark.ml.functions.array_to_vector
      val data = assemble(df, model.featureCols, model.imputation)
        .withColumn("label", col(labelCol).cast("double"))
      val scorer = m.copy(org.apache.spark.ml.param.ParamMap.empty)
        .asInstanceOf[OneVsRestModel].setRawPredictionCol("rawAll")
      val raw = scorer.transform(data)
        .select(vector_to_array(col("rawAll")).as("m"), col("label"))
        .cache()
      // per-class positive counts for Platt's smoothed targets —
      // numClasses rows, model-sized by construction
      val classCounts = raw.groupBy(col("label")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      val nTotal = classCounts.values.sum
      val params = (0 until model.numClasses).map { c =>
        val nPos = classCounts.getOrElse(c.toDouble, 0L)
        val nNeg = nTotal - nPos
        val tPos = (nPos + 1.0) / (nPos + 2.0)
        val tNeg = 1.0 / (nNeg + 2.0)
        // soft target t per row, expressed as two weighted hard-label
        // copies: (label=1, w=t) + (label=0, w=1−t) — the weighted
        // log-likelihood is identical to the soft-label fit
        val t = when(col("label") === c, lit(tPos)).otherwise(lit(tNeg))
        val d = raw.select(
          array_to_vector(array(element_at(col("m"), c + 1))).as("features"), t.as("t"))
        val soft = d.select(col("features"), lit(1.0).as("label"), col("t").as("w"))
          .unionAll(d.select(col("features"), lit(0.0).as("label"),
            (lit(1.0) - col("t")).as("w")))
        val fit = new LogisticRegression().setMaxIter(50).setWeightCol("w").fit(soft)
        (fit.coefficients(0), fit.intercept)
      }.toArray
      raw.unpersist(false)
      model.copy(calibration = Some(params))
    case m => throw new UnsupportedOperationException(
      s"Platt calibration targets OvR multiclass models, got ${m.getClass}")
  }

  /** Local eager scoring of a single feature vector — the reference's
    * local predict path (`core.py:378-382`): no cluster round-trip,
    * the driver-resident model scores directly.
    */
  def predictLocal(model: GraftBoostModel, features: Vector): Double = {
    // Apply the model's missing-marker preprocessing exactly as the
    // distributed path does (assemble) — otherwise the local path has
    // train/serve skew whenever BoostParams.missing is set.
    val f = model.imputation match {
      case None => features
      case Some((marker, repl)) =>
        val arr = features.toArray.clone()
        var i = 0
        while (i < arr.length) {
          if (arr(i) == marker) arr(i) = repl(model.featureCols(i))
          i += 1
        }
        org.apache.spark.ml.linalg.Vectors.dense(arr)
    }
    model.model match {
      case m: GBTRegressionModel              => m.predict(f)
      case m: GBTClassificationModel          => m.predict(f)
      case m: RandomForestClassificationModel => m.predict(f)
      case m: OneVsRestModel =>
        // same decision as the distributed OvR transform: argmax of
        // each class model's positive raw score
        val scores = m.models.map {
          case g: GBTClassificationModel => g.predictRaw(f)(1)
          case other => throw new UnsupportedOperationException(
            s"local OvR predict needs GBT per class, got ${other.getClass}")
        }
        scores.indices.maxBy(scores(_)).toDouble
      case m: SoftprobBoost.SoftprobModel =>
        val margins = m.marginsOf(f)
        margins.indices.maxBy(margins(_)).toDouble
      case m: MultiSparse.MultiSparseModel =>
        val margins = m.marginsOf(f)
        margins.indices.maxBy(margins(_)).toDouble
      case m: QuantileBoost.QuantileModel => m.predictOne(f)
      case m: PoissonBoost.PoissonModel   => m.predictOne(f)
      case m: SparseBoost.SparseModel     => m.predictOne(f)
      case m: LinearBoost.LinearModel     => m.predictOne(f)
      case m => throw new UnsupportedOperationException(
        s"local predict unavailable for ${m.getClass}")
    }
  }

  /** Per-feature importances — `feature_importances_` parity
    * (reference `test_core.py:57` asserts distributed ≡ local
    * importances). MLlib exposes impurity-based importances natively;
    * for OneVsRest the per-class GBT importances are averaged and
    * renormalized to sum to 1. Keys are the training feature columns
    * (or `f0..fn` for a pre-assembled vector).
    */
  def featureImportances(model: GraftBoostModel): Map[String, Double] = {
    // equal-weight average over an ensemble's member importances,
    // renormalized to sum 1 (shared by the OvR and softprob branches)
    def avgNormalized(per: Seq[Array[Double]]): Array[Double] = {
      val avg = per.head.indices.map(i => per.map(_(i)).sum / per.length).toArray
      val total = avg.sum
      if (total > 0) avg.map(_ / total) else avg
    }
    def ofModel(m: Model[_]): Array[Double] = m match {
      case g: GBTRegressionModel              => g.featureImportances.toArray
      case g: GBTClassificationModel          => g.featureImportances.toArray
      case g: RandomForestClassificationModel => g.featureImportances.toArray
      case o: OneVsRestModel => avgNormalized(o.models.map(ofModel))
      case sp: SoftprobBoost.SoftprobModel =>
        // average the h-weighted-variance importances over the whole
        // joint forest, renormalized — every (round, class) tree
        // contributes equally, matching XGBoost's gain averaging
        avgNormalized(sp.trees.flatten.map(_.featureImportances.toArray))
      case sb: SparseBoost.SparseModel =>
        // per-feature total split gain accumulated during training —
        // XGBoost's `total_gain` importance, already normalized
        sb.importances
      case mm: MultiSparse.MultiSparseModel =>
        // ingested multiclass document: normalized total_gain over
        // the statistics rebuilt from loss_changes at ingest
        val g = mm.importanceByType("total_gain")
        val tot = g.sum
        if (tot > 0) g.map(_ / tot) else g
      case lm: LinearBoost.LinearModel =>
        // gblinear "importance" is the weight vector; normalize its
        // magnitudes so the contract (sums to 1) matches tree models
        val mag = lm.weights.map(math.abs)
        val tot = mag.sum
        if (tot > 0) mag.map(_ / tot) else mag
      case m => throw new UnsupportedOperationException(
        s"feature importances unavailable for ${m.getClass}")
    }
    val imp = ofModel(model.model)
    val names =
      if (model.featureCols == Seq("features")) imp.indices.map(i => s"f$i")
      else model.featureCols
    names.zip(imp).toMap
  }

  /** Per-round validation history — `evals_result` parity
    * (`core.py:120, 259-260`). MLlib exposes it post-hoc via
    * `evaluateEachIteration`; metric is logloss-family for
    * classification, squared error for regression.
    */
  def evalHistory(
      model: GraftBoostModel,
      evalSets: Map[String, DataFrame],
      labelCol: String
  ): Map[String, Map[String, Array[Double]]] =
    evalSets.map { case (name, df) =>
      val data = assemble(df, model.featureCols, model.imputation)
        .withColumn("label", col(labelCol).cast("double"))
      val (metric, values) = model.model match {
        case m: GBTClassificationModel => ("logloss", m.evaluateEachIteration(data))
        case m: GBTRegressionModel     => ("squarederror", m.evaluateEachIteration(data, "squared"))
        case m => throw new UnsupportedOperationException(
          s"per-iteration history unavailable for ${m.getClass}")
      }
      name -> Map(metric -> values)
    }
}
