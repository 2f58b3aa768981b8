package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import GraftBoost.GraftBoostModel
import SparseBoost.SparseModel

/** XGBoost `Booster.trees_to_dataframe()` parity for the native-loop
  * forests: one row per node with the reference's exact column set —
  * Tree, Node, ID ("tree-node"), Feature (name, "Leaf" for leaves),
  * Split, Yes / No / Missing (child IDs; Missing is the learned
  * default branch), Gain (split loss reduction; the LEAF VALUE on
  * leaf rows — the reference's convention), Cover (hessian mass).
  * Model-sized driver data (trees × nodes), emitted as a DataFrame so
  * it joins/aggregates like any other table.
  */
object TreeDump {

  val schema: StructType = StructType(Seq(
    StructField("Tree", IntegerType, nullable = false),
    StructField("Node", IntegerType, nullable = false),
    StructField("ID", StringType, nullable = false),
    StructField("Feature", StringType, nullable = false),
    StructField("Split", DoubleType, nullable = true),
    StructField("Yes", StringType, nullable = true),
    StructField("No", StringType, nullable = true),
    StructField("Missing", StringType, nullable = true),
    StructField("Gain", DoubleType, nullable = true),
    StructField("Cover", DoubleType, nullable = false)))

  def treesToDataFrame(s: SparkSession, model: GraftBoostModel): DataFrame = {
    val trees = model.model match {
      case m: SparseModel => m.trees
      case m: MultiSparse.MultiSparseModel => m.trees
      case other => throw new IllegalArgumentException(
        "trees_to_dataframe covers the native-loop SparseModel / " +
        s"MultiSparseModel forests; got ${other.getClass.getSimpleName}")
    }
    val names = model.featureCols
    // pass-through detection is STRUCTURAL (featureCols is the
    // assembled vector itself — GraftBoost.assemble's signal), with
    // the max split index as a corruption backstop: a pass-through
    // forest splitting only slot 0 must still be refused, it has no
    // per-slot names to dump
    require(names != Seq("features"),
      "the model was trained on a pre-assembled vector column — " +
      "vector-pass-through models have no per-slot names to dump; " +
      "train on named feature columns")
    require(!trees.exists(_.hasCategorical),
      "trees_to_dataframe renders numeric thresholds in its Split " +
      "column; categorical (set-membership) nodes have none — dump " +
      "refused rather than emitting NaN splits")
    val maxIdx = trees.iterator.flatMap(_.feature.iterator)
      .filter(_ >= 0).maxOption.getOrElse(-1)
    require(maxIdx < names.length,
      s"forest splits on feature slot $maxIdx but only ${names.length} " +
      "named feature column(s) exist — corrupt or mislabeled model")
    val rows = trees.zipWithIndex.flatMap { case (t, ti) =>
      def id(i: Int) = s"$ti-$i"
      t.feature.indices.map { n =>
        val leaf = t.feature(n) < 0
        Row(ti, n, id(n),
          if (leaf) "Leaf" else names(t.feature(n)),
          if (leaf) null else java.lang.Double.valueOf(t.thresh(n)),
          if (leaf) null else id(t.left(n)),
          if (leaf) null else id(t.right(n)),
          if (leaf) null
          else id(if (t.defaultLeft(n)) t.left(n) else t.right(n)),
          if (leaf) java.lang.Double.valueOf(t.value(n))
          else if (t.gain.nonEmpty) java.lang.Double.valueOf(t.gain(n))
          else null, // pre-gain artifact: split gain unknown, not 0
          java.lang.Double.valueOf(t.cover(n)))
      }
    }
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.toSeq.asJava, schema)
  }
}
