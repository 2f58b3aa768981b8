package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** The encoding screen's detection behavior, pinned on SYNTHETIC
  * corrupted documents — the fixture corpus is ASCII-only by tripwire
  * (TestdataSchemaSpec), so text_encoding_screen's oracle hashes a
  * degenerate all-clean rollup; the non-trivial column logic is proven
  * here through the same [[TextAnalysis.encodingScreen]] projection
  * the query uses.
  */
class EncodingScreenSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def screen(rows: (Long, String)*) =
    TextAnalysis.encodingScreen(rows.toSeq.toDF("doc_id", "text"), "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("clean ASCII text reports zero on every damage counter") {
    val m = screen((1L, "a plain ascii document, with punctuation."))
    val r = m(1L)
    assert(r.getAs[Long]("n_non_ascii") == 0 && r.getAs[Long]("n_ctrl") == 0 &&
      r.getAs[Long]("n_replacement") == 0 && r.getAs[Long]("n_mojibake") == 0)
    assert(r.getAs[Boolean]("is_clean"))
  }

  test("replacement chars, control bytes, and mojibake are each counted") {
    val m = screen(
      (1L, "lost � bytes � here"),          // two U+FFFD
      (2L, "bell \u0007 and null \u0000 but tab\t ok"), // two C0 ctrls, tab exempt
      (3L, "cafÃ© talk â€s wreck"), // Ã + â€ digraph
      (4L, "naïve café — em dash"))                   // plain non-ASCII
    assert(m(1L).getAs[Long]("n_replacement") == 2)
    assert(!m(1L).getAs[Boolean]("is_clean"))
    assert(m(2L).getAs[Long]("n_ctrl") == 2,
      "tab/newline/CR must not count as control damage")
    assert(m(3L).getAs[Long]("n_mojibake") == 2, "one Ã marker + one â€ digraph")
    assert(m(4L).getAs[Long]("n_mojibake") == 0, "clean accents are not mojibake")
    assert(m(4L).getAs[Long]("n_non_ascii") == 3L, "ï, é, — are non-ASCII")
    assert(!m(4L).getAs[Boolean]("is_clean"))
  }

  test("fixture corpus is all-clean end to end (matches the ASCII tripwire)") {
    val out = SparkEntry.queries("text_encoding_screen")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_clean") == r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("clean_ratio") == 1.0)
    }
  }
}
