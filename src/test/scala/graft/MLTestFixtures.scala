package graft

import org.apache.spark.sql.DataFrame

/** Shared multiclass test fixture + metric helpers, used by both the
  * MLSpec quality pin (OvR+Platt vs RF) and SoftprobSpec — one
  * definition so the two suites can never silently diverge on the
  * data or the metric.
  */
object MLTestFixtures {
  import TestSession._
  import spark.implicits._

  /** Noisy 3-class toy with class overlap and a deterministic
    * held-out split (`isTest` = every 4th row).
    */
  lazy val multiclassRows: DataFrame = (0 until 600).map { i =>
    val c = i % 3
    val noise = ((i * 7) % 11) - 5
    (c * 10.0 + (i % 5) + noise * 0.8, ((i * 13) % 7).toDouble,
      c.toDouble, i % 4 == 0)
  }.toDF("x1", "x2", "label", "isTest").cache()

  lazy val multiclassTrain: DataFrame = multiclassRows.filter(!$"isTest")
  lazy val multiclassHeldOut: DataFrame = multiclassRows.filter($"isTest")

  /** Mean negative log-likelihood of the true class (clipped at
    * 1e-15, the standard mlogloss convention) over a frame with
    * `label` and `proba` columns.
    */
  def mlogloss(proba: DataFrame): Double = {
    val rs = proba.select("label", "proba").collect()
    rs.map { r =>
      val p = r.getSeq[Double](1)(r.getDouble(0).toInt)
      -math.log(math.max(p, 1e-15))
    }.sum / rs.length
  }

  /** Fraction of rows where `prediction` equals `label` (both read
    * as doubles).
    */
  def accuracy(pred: DataFrame): Double = {
    val rs = pred.select("label", "prediction").collect()
    rs.count(r => r.getDouble(0) == r.getDouble(1)).toDouble / rs.length
  }
}
