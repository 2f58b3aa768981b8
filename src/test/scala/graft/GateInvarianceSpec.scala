package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout invariance sweep for every fitted-model gate.
  *
  * Three incidents in two rounds (ml_permutation_importance r7, the
  * ml_gblinear greedy gate r7, ml_feature_contributions r8) were the
  * SAME defect class: a gate boolean derived from a fitted model that
  * is stable at one partition layout and flips at another — invisible
  * to a single-layout oracle gate, red only when the driver grades at
  * a different parallelism. This spec runs each model-gated query
  * TWICE on the same data under two deliberately different layouts —
  * train fan-out 1 vs defaultParallelism partitions, 4 vs 32 shuffle
  * partitions, coarse vs byte-level scan splits — and asserts the
  * FULL result rows identical. Any layout-sensitive column (gate
  * boolean or data aggregate) fails here before the driver ever sees
  * it.
  */
class GateInvarianceSpec extends AnyFunSuite {
  import TestSession.spark

  /** Default sf0.001 keeps the sweep inside the sbt-test budget;
    * `GRAFT_GATESPEC_SF=/root/testdata/sf0.01 sbt "testOnly
    * graft.GateInvarianceSpec"` re-runs it at the driver's grading
    * scale (where the r8 near-tie actually flipped). Env var, not a
    * sysprop — sbt's forked test JVM inherits the environment but not
    * `-D` flags.
    */
  private val sf: String =
    sys.env.getOrElse("GRAFT_GATESPEC_SF", TestSession.sf)

  /** Every query whose output depends on a fitted/estimated model:
    * the ML lifecycle gates plus the similarity family (its recall /
    * assignment / identity booleans derive from sample-trained
    * codebooks and estimated centroids — the same
    * "fitted-artifact gate" class, guarded here against layout
    * sensitivity creeping into the sampling or training paths).
    */
  private val gateQueries: Seq[String] =
    (ml.MLQueries.all ++ operators.Similarity.all).map(_.name)

  private case class Layout(shuffle: String, openCost: String,
      maxPart: String, rowsPerTask: Option[String])

  /** Layout A ≈ the builder's historical 4-CPU gate: single-partition
    * training frames (rows/task floor never met at sf0.001), few
    * shuffle partitions, the session's default scan splitting.
    */
  private val layoutA = Layout("4", (64 * 1024).toString,
    (128L * 1024 * 1024).toString, rowsPerTask = None)

  /** Layout B ≈ the driver's 32-thread grading: training frames
    * fanned to every core (rows/task forced down so trainParts =
    * defaultParallelism), many shuffle partitions, byte-level scan
    * splits.
    */
  private val layoutB = Layout("32", "1", (64 * 1024).toString,
    rowsPerTask = Some("200"))

  private def withLayout[T](l: Layout)(f: => T): T = {
    val conf = spark.conf
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.files.openCostInBytes",
      "spark.sql.files.maxPartitionBytes")
    val saved = keys.map(k => k -> conf.getOption(k))
    val savedProp = sys.props.get("graft.train.rowsPerTask")
    conf.set(keys(0), l.shuffle)
    conf.set(keys(1), l.openCost)
    conf.set(keys(2), l.maxPart)
    l.rowsPerTask match {
      case Some(v) => sys.props("graft.train.rowsPerTask") = v
      case None => sys.props -= "graft.train.rowsPerTask"
    }
    try f
    finally {
      saved.foreach { case (k, ov) =>
        ov match { case Some(v) => conf.set(k, v); case None => conf.unset(k) }
      }
      savedProp match {
        case Some(v) => sys.props("graft.train.rowsPerTask") = v
        case None => sys.props -= "graft.train.rowsPerTask"
      }
    }
  }

  private def run(name: String, l: Layout): Seq[String] = withLayout(l) {
    // drop any memoized shared build FIRST: a query consuming e.g.
    // Dedup.cosinePairsShared must rebuild the shared frame under
    // THIS layout — reusing the other layout's memoized pair graph
    // would make the invariance assertion vacuous for exactly the
    // sampling/shared-build path the sweep exists to cover
    SharedBuilds.clearAll()
    val df = SparkEntry.queries(name)(spark, sf)
    val rows = df.collect().map(_.toString).sorted.toSeq
    // drop the query's output pin so the second layout re-executes
    // instead of reading layout A's cached result back
    if (!SharedBuilds.isShared(df)) df.unpersist(true)
    rows
  }

  gateQueries.foreach { name =>
    test(s"$name is partition-layout invariant") {
      val a = run(name, layoutA)
      val b = run(name, layoutB)
      assert(a == b,
        s"$name gate output depends on partition layout:\n  A=$a\n  B=$b")
    }
  }
}
