package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (left) side's key
  * deterministically and replicate the right side across the salt
  * domain, so one hot key spreads over `saltBuckets` reducers instead
  * of one. AQE's skew-join handles moderate skew automatically; this
  * is the explicit tool for pathological keys (e.g. a null-ish
  * sentinel holding 10% of 100 TB).
  *
  * Salt is derived from a per-row fingerprint (xxhash64 over all left
  * columns), not rand(), so results are deterministic and retries are
  * safe.
  */
object SaltedJoin {

  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      saltBuckets: Int = 16
  ): DataFrame = {
    val saltedLeft = left.withColumn(
      "__salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(saltBuckets)).cast("int"))
    val saltedRight = right
      .withColumn("__salt", explode(array((0 until saltBuckets).map(lit): _*)))
    saltedLeft
      .join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }
}
