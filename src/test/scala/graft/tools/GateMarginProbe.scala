package graft.tools

import graft.ml.MLQueries

/** Margin probe for the strict fitted-vs-constant gate comparisons
  * (round-9 VERDICT task 5): prints the two compared quantities and
  * their ratio for each gate so near-ties can be told apart from
  * structurally-wide gaps. Reads the SAME `*Detail` builders the
  * registered queries derive their gate booleans from — a fixture
  * change cannot silently diverge from what this tool measures.
  *
  * Run: `sbt "Test/runMain graft.tools.GateMarginProbe /root/testdata/sf0.01"`
  */
object GateMarginProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val s = graft.GraftSession.local(cores = 32, appName = "gate-margins")

    // ml_regression_train_predict gate: sse_model < sse_mean * 0.5
    locally {
      val r = MLQueries.regressionDetail(s, dir).head()
      val (sm, sx) = (r.getDouble(3), r.getDouble(4))
      println(f"ml_regression: sse_model=$sm%.4g sse_mean=$sx%.4g " +
        f"ratio=${sm / sx}%.4f (gate < 0.5)")
    }

    // ml_quantile_regression gates: |cov-α| < 0.1, pinball ratio < 0.8
    locally {
      val r = MLQueries.quantileDetail(s, dir).head()
      val (cov, pm, pc) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      println(f"ml_quantile: pin_model=$pm%.4f pin_const=$pc%.4f " +
        f"ratio=${pm / pc}%.4f (gate < 0.8) cov=$cov%.4f (gate |cov-0.9| < 0.1)")
    }

    // ml_tweedie_severity gates: mae ratio < 0.5, nloglik falls
    locally {
      val (d, hist) = MLQueries.tweedieDetail(s, dir)
      val r = d.head()
      val (mm, mc) = (r.getDouble(3), r.getDouble(4))
      println(f"ml_tweedie: mae_model=$mm%.4f mae_const=$mc%.4f " +
        f"ratio=${mm / mc}%.4f (gate < 0.5) " +
        f"nloglik ${hist.head}%.4f -> ${hist.last}%.4f")
    }

    s.stop()
  }
}
