package graft.ml

import org.json4s.{DefaultFormats, JArray, JBool, JDecimal, JDouble, JInt, JLong, JObject, JString, JValue}
import org.json4s.jackson.JsonMethods

import GraftBoost.GraftBoostModel
import SparseBoost.{SparseModel, SparseTree}

/** XGBoost-format model interchange for the native-loop forests
  * ([[SparseBoost.SparseModel]]): emit and ingest the PUBLIC XGBoost
  * JSON model schema (xgboost doc/model.schema, the `save_model
  * ("model.json")` format), so models trained here are portable to
  * stock XGBoost tooling and vice versa.
  *
  * Documented divergences (also stamped into the artifact under
  * `learner.attributes.graft.divergences`):
  *
  *  - SPLIT COMPARISON. XGBoost routes `x < split_condition` left;
  *    this engine routes `x <= thresh` left. Export writes
  *    `nextUp(thresh)` so XGBoost's strict `<` accepts exactly the
  *    same values; import converts back with `nextDown` — an exact
  *    double-level inverse, so a round trip preserves thresholds
  *    bit-for-bit and either engine scores the file identically.
  *  - PRECISION. XGBoost stores float32 model fields; this engine is
  *    float64 end-to-end and writes float64 JSON numbers (legal JSON
  *    against the schema). Stock XGBoost ingesting the file truncates
  *    to f32 (ulp-level score differences); ingest HERE keeps f64.
  *  - BASE SCORE. `learner_model_param.base_score` carries the
  *    XGBoost-faithful ORIGINAL-space value (probability / rate);
  *    the exact margin-space base also rides in
  *    `learner.attributes.graft.base_margin` and wins on ingest when
  *    present (link-function round trips lose ulps otherwise). Files
  *    from stock XGBoost (no attribute) take the inverse-link path.
  *  - IMPORTANCE STATS. `loss_changes` carries the real per-node
  *    split gains for freshly-trained forests (zeros only for models
  *    loaded from pre-gain ModelIO artifacts), but ingested models
  *    carry empty aggregate `get_score` statistics — those queries
  *    are unavailable on an ingested model.
  *  - INTERNAL NODE VALUES. Scoring and TreeSHAP are exact on any
  *    ingested file (they need only structure, leaf outputs and
  *    `sum_hessian`). Saabas contributions additionally walk internal
  *    node values: own exports round-trip them exactly via
  *    `base_weights`; STOCK files store base_weights WITHOUT the
  *    learning rate there, so ingest recomputes internal values as
  *    cover-weighted subtree means of the leaf outputs — the Saabas
  *    expectation, restoring the additivity identity by construction
  *    (attributions then reflect the recomputed expectations, not
  *    XGBoost's raw unscaled weights).
  *  - `evals_result` history, calibration, and the missing-marker
  *    imputation statistics are engine-side training artifacts with
  *    no schema slot; [[ModelIO]] remains the lossless sink. Ingested
  *    models score with `missingStrategy = "native"` (NaN follows the
  *    file's `default_left`), matching XGBoost serving semantics.
  */
object XgbJson {

  private implicit val fmt: DefaultFormats.type = DefaultFormats

  /** margin -> original-space base_score per objective link. */
  private def toBaseScore(objective: String, margin: Double): Double =
    objective match {
      case "binary:logistic" => 1.0 / (1.0 + math.exp(-margin))
      case o if o.startsWith("count:") || o == "reg:tweedie" ||
        o == "reg:gamma" => math.exp(margin)
      case _ => margin
    }

  private def fromBaseScore(objective: String, score: Double): Double =
    objective match {
      case "binary:logistic" => math.log(score / (1.0 - score))
      case o if o.startsWith("count:") || o == "reg:tweedie" ||
        o == "reg:gamma" => math.log(score)
      case _ => score
    }

  /** Serialize a native-loop model to the XGBoost JSON model format.
    * Refuses wrapped-MLlib / linear / quantile / softprob models —
    * their forests don't have the gbtree shape the schema describes;
    * [[ModelIO]] persists those.
    */
  def export(model: GraftBoostModel): String = {
    val sm = model.model match {
      case m: SparseModel => m
      case other => throw new IllegalArgumentException(
        "XGBoost JSON interchange covers the native-loop SparseModel " +
        s"forests only; got ${other.getClass.getSimpleName} — use " +
        "ModelIO for engine-native persistence")
    }
    val numFeature = model.featureCols.length
    // a forest trained through the vector pass-through (featureCols =
    // one vector column) has split indices spanning the vector's
    // dimension, not the column list — emitting num_feature=1 with
    // those indices would be a silently corrupt document
    val maxIdx = sm.trees.iterator.flatMap(_.feature.iterator)
      .filter(_ >= 0).maxOption.getOrElse(-1)
    require(maxIdx < numFeature,
      s"forest splits on feature slot $maxIdx but only $numFeature named " +
      "feature column(s) exist — the model was trained on a pre-assembled " +
      "vector column; train on named feature columns for JSON interchange")
    val trees = sm.trees.map { t =>
      val n = t.feature.length
      val parents = Array.fill(n)(2147483647) // root convention
      var i = 0
      while (i < n) {
        if (t.feature(i) >= 0) { parents(t.left(i)) = i; parents(t.right(i)) = i }
        i += 1
      }
      def leaf(i: Int) = t.feature(i) < 0
      JObject(
        "base_weights" -> JArray(t.value.map(JDouble(_): JValue).toList),
        "categories" -> JArray(Nil),
        "categories_nodes" -> JArray(Nil),
        "categories_segments" -> JArray(Nil),
        "categories_sizes" -> JArray(Nil),
        "default_left" -> JArray(
          t.defaultLeft.map(b => JInt(if (b) 1 else 0): JValue).toList),
        "id" -> JInt(0),
        "left_children" -> JArray(
          (0 until n).map(i => JInt(if (leaf(i)) -1 else t.left(i)): JValue).toList),
        "right_children" -> JArray(
          (0 until n).map(i => JInt(if (leaf(i)) -1 else t.right(i)): JValue).toList),
        "loss_changes" -> JArray(
          (if (t.gain.length == n) t.gain.toSeq else Seq.fill(n)(0.0))
            .map(JDouble(_): JValue).toList),
        "parents" -> JArray(parents.map(JInt(_): JValue).toList),
        // leaves carry their value in split_conditions (the schema's
        // convention); internal nodes the <-compatible threshold
        "split_conditions" -> JArray((0 until n).map(i =>
          JDouble(if (leaf(i)) t.value(i) else math.nextUp(t.thresh(i)))
            : JValue).toList),
        "split_indices" -> JArray((0 until n).map(i =>
          JInt(if (leaf(i)) 0 else t.feature(i)): JValue).toList),
        "split_type" -> JArray(List.fill(n)(JInt(0): JValue)),
        "sum_hessian" -> JArray(t.cover.map(JDouble(_): JValue).toList),
        "tree_param" -> JObject(
          "num_deleted" -> JString("0"),
          "num_feature" -> JString(numFeature.toString),
          "num_nodes" -> JString(n.toString),
          "size_leaf_vector" -> JString("1"))
      )
    }
    val nRounds = sm.numRounds
    val indptr = (0 to nRounds).map(r => r * sm.treesPerRound)
    val doc = JObject(
      "learner" -> JObject(
        "attributes" -> JObject(
          "graft.base_margin" -> JString(sm.base.toString),
          "graft.divergences" -> JString(
            "float64 fields; thresholds pre-shifted with nextUp for " +
            "strict-< routing; see graft.ml.XgbJson scaladoc")),
        "feature_names" -> JArray(
          model.featureCols.map(JString(_): JValue).toList),
        "feature_types" -> JArray(
          model.featureCols.map(_ => JString("float"): JValue).toList),
        "gradient_booster" -> JObject(
          "model" -> JObject(
            "gbtree_model_param" -> JObject(
              "num_trees" -> JString(sm.trees.length.toString),
              "num_parallel_tree" -> JString(sm.treesPerRound.toString)),
            "iteration_indptr" -> JArray(indptr.map(JInt(_): JValue).toList),
            "tree_info" -> JArray(
              List.fill(sm.trees.length)(JInt(0): JValue)),
            "trees" -> JArray(trees.toList)),
          "name" -> JString("gbtree")),
        "learner_model_param" -> JObject(
          "base_score" -> JString(toBaseScore(sm.objective, sm.base).toString),
          "boost_from_average" -> JString("1"),
          "num_class" -> JString("0"),
          "num_feature" -> JString(numFeature.toString),
          "num_target" -> JString("1")),
        "objective" -> JObject("name" -> JString(sm.objective))),
      "version" -> JArray(List(JInt(2), JInt(0), JInt(0))))
    JsonMethods.compact(JsonMethods.render(doc))
  }

  private def doubles(v: JValue): Array[Double] = v match {
    case JArray(xs) => xs.map {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JDecimal(d) => d.toDouble
      case other => throw new IllegalArgumentException(s"not a number: $other")
    }.toArray
    case other => throw new IllegalArgumentException(s"not an array: $other")
  }

  private def ints(v: JValue): Array[Int] = doubles(v).map(_.toInt)

  /** default_left appears as 0/1 ints (current xgboost) or booleans
    * (older 1.x serializers; xgboost's own loader accepts both).
    */
  private def bools(v: JValue): Array[Boolean] = v match {
    case JArray(xs) => xs.map {
      case JBool(b) => b
      case JInt(i) => i != 0
      case JLong(l) => l != 0
      case JDouble(d) => d != 0.0
      case other => throw new IllegalArgumentException(s"not a flag: $other")
    }.toArray
    case other => throw new IllegalArgumentException(s"not an array: $other")
  }

  /** Ingest an XGBoost JSON model document into a scoreable
    * [[GraftBoostModel]] (native SparseModel forest). Single-target
    * gbtree only (`num_class` 0/1, no multi-target vector leaves);
    * categorical splits (`split_type` 1) are refused loudly.
    */
  def importModel(json: String): GraftBoostModel = {
    val root = JsonMethods.parse(json)
    val learner = root \ "learner"
    val boosterName = (learner \ "gradient_booster" \ "name").extract[String]
    require(boosterName == "gbtree",
      s"only gbtree models ingest; got '$boosterName'")
    val lmp = learner \ "learner_model_param"
    val numClass = (lmp \ "num_class").extract[String].toInt
    require(numClass <= 1,
      s"multi-class interchange not supported (num_class=$numClass)")
    val objective = (learner \ "objective" \ "name").extract[String]
    val featureNames = (learner \ "feature_names") match {
      case JArray(xs) if xs.nonEmpty => xs.map(_.extract[String])
      case _ =>
        val m = (lmp \ "num_feature").extract[String].toInt
        (0 until m).map(i => s"f$i")
    }
    val modelObj = learner \ "gradient_booster" \ "model"
    val treesPerRound =
      (modelObj \ "gbtree_model_param" \ "num_parallel_tree")
        .extractOpt[String].map(_.toInt).getOrElse(1)
    // the presence of this attribute marks an own-engine export:
    // exact margin base AND base_weights already in serving scale
    val ownBase =
      (learner \ "attributes" \ "graft.base_margin").extractOpt[String]
    val trees = (modelObj \ "trees") match {
      case JArray(ts) => ts.map { tj =>
        (tj \ "split_type") match {
          case JArray(st) if st.exists {
            case JInt(x) => x != 0; case _ => false
          } => throw new IllegalArgumentException(
            "categorical splits (split_type=1) are not supported")
          case _ => ()
        }
        val left = ints(tj \ "left_children")
        val right = ints(tj \ "right_children")
        val cond = doubles(tj \ "split_conditions")
        val idx = ints(tj \ "split_indices")
        val dl = bools(tj \ "default_left")
        val hess = (tj \ "sum_hessian") match {
          case JArray(_) => doubles(tj \ "sum_hessian")
          case _ => Array.fill(left.length)(0.0)
        }
        val n = left.length
        val feature = new Array[Int](n)
        val thresh = new Array[Double](n)
        // INTERNAL node values come from base_weights — the Saabas
        // path decomposition walks them; exports here write the full
        // value array there, so own-file round trips are exact. Leaf
        // OUTPUTS override from split_conditions (the schema's slot
        // for the eta-scaled leaf value).
        val value = (tj \ "base_weights") match {
          case JArray(_) => doubles(tj \ "base_weights")
          case _ => new Array[Double](n)
        }
        var i = 0
        while (i < n) {
          if (left(i) < 0) { // leaf: value rides in split_conditions
            feature(i) = -1
            value(i) = cond(i)
          } else {
            feature(i) = idx(i)
            // XGBoost's strict `x < c` left == our `x <= nextDown(c)`
            thresh(i) = math.nextDown(cond(i))
          }
          i += 1
        }
        val lossChanges = (tj \ "loss_changes") match {
          case JArray(_) => doubles(tj \ "loss_changes")
          case _ => Array.emptyDoubleArray
        }
        // STOCK files: base_weights are raw Newton weights WITHOUT the
        // learning rate, while leaf outputs (split_conditions) carry
        // it — mixing the two breaks the Saabas additivity identity.
        // Recompute internal values as cover-weighted subtree means of
        // the actual leaf outputs (the Saabas expectation), restoring
        // additivity by construction. Own exports (attribute present)
        // keep their base_weights untouched — bit-exact round trips.
        if (ownBase.isEmpty) {
          def fill(i: Int): Double =
            if (feature(i) < 0) value(i)
            else {
              val lv = fill(left(i)); val rv = fill(right(i))
              val cl = hess(left(i)); val cr = hess(right(i))
              value(i) =
                if (cl + cr > 0) (cl * lv + cr * rv) / (cl + cr)
                else 0.5 * (lv + rv)
              value(i)
            }
          fill(0)
        }
        // leaf children stay -1 — both the schema's and the grower's
        // convention (leafOf never dereferences children at a leaf)
        SparseTree(feature, thresh, left, right, dl, value, hess,
          lossChanges)
      }.toArray
      case _ => throw new IllegalArgumentException("no trees in document")
    }
    val base = ownBase.map(_.toDouble).getOrElse(
      fromBaseScore(objective, (lmp \ "base_score").extract[String].toDouble))
    val sm = new SparseModel(
      org.apache.spark.ml.util.Identifiable.randomUID("xgbjson"),
      trees, base, objective,
      Array.fill(featureNames.length)(0.0),
      treesPerRound = treesPerRound)
    GraftBoostModel(sm, featureNames, objective,
      if (objective == "binary:logistic") 2 else 0,
      Map.empty, imputation = None, missingStrategy = "native")
  }
}
