package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite


import graft.operators.Dedup
import graft.plans.{AsOf, VecMath, WordShingles}

/** Property-based equivalence oracles for the custom Catalyst
  * expressions and operators: each custom kernel must agree with the
  * built-in (slower) Spark formulation it replaced, on arbitrary
  * generated inputs — not just the corpus the gates exercise.
  */
class PropertySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  // magnitudes bounded away from 0 so no generated vector has zero
  // norm (cosine is undefined there; ANSI divide would throw in the
  // reference formulation while the kernel yields NaN)
  private val smallDouble =
    Gen.oneOf(Gen.chooseNum(0.1, 100.0), Gen.chooseNum(-100.0, -0.1))

  test("DistributedRank ≡ global sort rank on arbitrary unique keys") {
    val keySets = Gen.chooseNum(1, 400).flatMap { n =>
      Gen.containerOfN[Set, Long](n, Gen.chooseNum(-1000000L, 1000000L))
    }
    (1 to 12).foreach { trial =>
      val keys = keySets.sample.getOrElse(Set(1L, 2L, 3L)).toSeq
      val parts = 1 + (trial % 7)
      val df = keys.zipWithIndex.toDF("k", "i").repartition(5)
      val (ranked, release) = graft.functions.DistributedRank
        .withContiguousRank(df, "k", "rn", parts)
      val got = ranked.select(col("k"), col("rn")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).map(_._1)
      release()
      val want = keys.sorted
      assert(got.sameElements(want),
        s"trial $trial (n=${keys.size}, parts=$parts): rank order diverged")
    }
  }

  test("withPartitionedCumsum ≡ global window cumsum on arbitrary data") {
    val gen = Gen.chooseNum(1, 300).flatMap { n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(-500L, 500L), Gen.chooseNum(0L, 999L)))
    }
    (1 to 8).foreach { trial =>
      // unique sort key (v desc, id asc) via the index
      val rows = gen.sample.getOrElse(List((1L, 2L))).zipWithIndex
        .map { case ((v, x), i) => (v, i.toLong, x) }
      val df = rows.toDF("v", "id", "x").repartition(4)
      val (cum, release) = graft.functions.DistributedRank
        .withPartitionedCumsum(df,
          Seq(col("v").desc, col("id")), "x", "cum", 1 + trial % 5)
      val got = cum.select(col("id"), col("cum")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      release()
      var acc = 0L
      val want = rows.sortBy { case (v, id, _) => (-v, id) }
        .map { case (_, id, x) => acc += x; id -> acc }.toMap
      assert(got == want, s"trial $trial: cumsum diverged")
    }
  }

  test("withNtile ≡ Spark ntile window on arbitrary data and k") {
    import org.apache.spark.sql.expressions.Window
    val gen = Gen.chooseNum(1, 200).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(-500L, 500L))
    }
    (1 to 8).foreach { trial =>
      val k = 1 + trial % 7
      val rows = gen.sample.getOrElse(List(3L)).zipWithIndex
        .map { case (v, i) => (v, i.toLong) }
      val df = rows.toDF("v", "id").repartition(4)
      val (tiled, release) = graft.functions.DistributedRank
        .withNtile(df, Seq(col("v").desc, col("id")), k, "tile",
          1 + trial % 5)
      val got = tiled.select(col("id"), col("tile")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      release()
      val want = df.withColumn("tile",
          ntile(k).over(Window.orderBy(col("v").desc, col("id")))
            .cast("long"))
        .select(col("id"), col("tile")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial (k=$k, n=${rows.size}): ntile diverged")
    }
  }

  test("VecMath dot/cosine/l2 ≡ HOF fold formulations on arbitrary vectors") {
    val vecPair = for {
      n <- Gen.chooseNum(1, 16)
      a <- Gen.listOfN(n, smallDouble)
      b <- Gen.listOfN(n, smallDouble)
    } yield (a.toArray, b.toArray)
    val cases = Gen.listOfN(30, vecPair).sample.get
    val df = cases.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b").cache()
    val hofDot = aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val hofNa = sqrt(aggregate($"a", lit(0.0), (s, x) => s + x * x))
    val hofNb = sqrt(aggregate($"b", lit(0.0), (s, x) => s + x * x))
    val rows = df.select(
      VecMath.dot($"a", $"b").as("d1"), hofDot.as("d2"),
      VecMath.cosine($"a", $"b").as("c1"), (hofDot / (hofNa * hofNb)).as("c2"),
      VecMath.l2($"a").as("l1"), hofNa.as("l2")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot must be bit-identical")
      assert(r.getDouble(2) == r.getDouble(3), "cosine must be bit-identical")
      assert(r.getDouble(4) == r.getDouble(5), "l2 must be bit-identical")
    }
    df.unpersist()
  }

  test("WordShingles ≡ transform/sequence HOF formulation on arbitrary token lists") {
    val token = Gen.oneOf("a", "b", "cd", "efg", "x1", "zz")
    val doc = for {
      n <- Gen.chooseNum(0, 12)
      ts <- Gen.listOfN(n, token)
    } yield ts
    val cases = Gen.listOfN(40, doc).sample.get
    val df = cases.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      .toDF("id", "toks").cache()
    val hof = {
      val grams = transform(
        sequence(lit(1), size($"toks") - 2),
        i => concat_ws(" ",
          element_at($"toks", i), element_at($"toks", i + 1), element_at($"toks", i + 2)))
      array_distinct(
        when(size($"toks") < 3, array().cast("array<string>")).otherwise(grams))
    }
    val rows = df.select(
      WordShingles.wordShingles($"toks", 3).as("fast"), hof.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"shingles diverge: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
    df.unpersist()
  }

  test("AsOfJoin ≡ groupBy-max driver reference on arbitrary key/time data") {
    val gen = for {
      np <- Gen.chooseNum(1, 40)
      nr <- Gen.chooseNum(0, 40)
      probes <- Gen.listOfN(np, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 100L)))
      refs <- Gen.listOfN(nr, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 100L)))
    } yield (probes, refs)
    // a handful of generated datasets (each exercises the full
    // sort-merge path end-to-end; Spark jobs are too slow for 100s)
    for (seed <- 1 to 4) {
      val (probes, refs) = gen.pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed.toLong))
      val probeDf = probes.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("pid", "k", "t")
      // unique (rk, rt) per row so the expected "latest" is well-defined
      val refsU = refs.zipWithIndex.map { case ((k, t), i) => (k, t * 100L + i, i.toDouble) }
      val refDf = refsU.toDF("rk", "rt", "v")
      val got = AsOf.join(probeDf, refDf, Seq("k"), Seq("rk"), "t", "rt")
        .select($"pid", $"rt").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      probes.zipWithIndex.foreach { case ((k, t), i) =>
        val expected = refsU.filter(r => r._1 == k && r._2 <= t).map(_._2).maxOption.getOrElse(-1L)
        assert(got(i.toLong) == expected,
          s"seed=$seed probe($k,$t): got ${got(i.toLong)}, want $expected")
      }
    }
  }

  test("AsOfJoin inner/tolerance variants ≡ driver reference on arbitrary data") {
    val gen = for {
      np <- Gen.chooseNum(1, 40)
      nr <- Gen.chooseNum(0, 40)
      probes <- Gen.listOfN(np, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 100L)))
      refs <- Gen.listOfN(nr, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 100L)))
    } yield (probes, refs)
    for {
      seed <- 1 to 3
      tol <- Seq(None, Some(7.0), Some(0.0))
      joinType <- Seq("left", "inner")
    } {
      val (probes, refs) = gen.pureApply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong * 31L))
      val probeDf = probes.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("pid", "k", "t")
      // unique (rk, rt) per row so the expected "latest" is well-defined
      val refsU = refs.zipWithIndex.map { case ((k, t), i) => (k, t * 100L + i, i.toDouble) }
      val refDf = refsU.toDF("rk", "rt", "v")
      val got = AsOf.join(probeDf, refDf, Seq("k"), Seq("rk"), "t", "rt",
          joinType = joinType, tolerance = tol)
        .select($"pid", $"rt").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      probes.zipWithIndex.foreach { case ((k, t), i) =>
        val matched = refsU
          .filter(r => r._1 == k && r._2 <= t)
          .filter(r => tol.forall(d => (t - r._2).toDouble <= d))
          .map(_._2).maxOption
        (joinType, matched) match {
          case ("left", None) =>
            assert(got(i.toLong) == -1L,
              s"seed=$seed tol=$tol left probe($k,$t): want null, got ${got(i.toLong)}")
          case ("inner", None) =>
            assert(!got.contains(i.toLong),
              s"seed=$seed tol=$tol inner probe($k,$t): row should be dropped")
          case (_, Some(rt)) =>
            assert(got(i.toLong) == rt,
              s"seed=$seed tol=$tol $joinType probe($k,$t): got ${got(i.toLong)}, want $rt")
        }
      }
    }
  }

  test("connected components ≡ driver union-find on random graphs") {
    for (seed <- Seq(41, 43, 47)) {
      val rnd = new java.util.Random(seed)
      val nNodes = 30 + rnd.nextInt(50)
      val nEdges = rnd.nextInt(60)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // driver reference: plain union-find with min-label roots
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        def union(a: Long, b: Long): Unit = {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        edges.foreach { case (a, b) => union(a, b) }
        val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(n => n -> find(n)).toMap
        val got = Dedup.connectedComponents(
            edges.toDF("ia", "ib"), "ia", "ib")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"seed=$seed: labels diverge from union-find")
      }
    }
  }

  test("blocked cosine ≡ brute force for arbitrary block sizes and corpora") {
    val gen = for {
      n <- Gen.chooseNum(2, 20)
      vecs <- Gen.listOfN(n, Gen.listOfN(4, smallDouble))
    } yield vecs
    val vecs = gen.pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(99L))
      .zipWithIndex.map { case (v, i) => (i.toLong * 7L + 3L, v.toArray) } // sparse ids
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      if cos(vecs(i)._2, vecs(j)._2) >= 0.2
    } yield (vecs(i)._1, vecs(j)._1)).toSet
    val df = vecs.toDF("vec_id", "v")
    val got = Dedup.blockedCosinePairs(spark, df, 0.2, blockRows = 5)
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    got.unpersist()
  }

  test("weighted theta ≡ exact distinct-weighted sum across regimes and k") {
    for (seed <- Seq(3, 5); k <- Seq(64, 512)) {
      val rnd = new java.util.Random(seed)
      // distinct count sweeps below/around/above k; weights from a
      // skewed law; every key repeated up to 3 times
      for (nDistinct <- Seq(k / 2, k, k * 8)) {
        val sk = new graft.plans.WeightedThetaSketch(k)
        var exact = 0.0
        (0 until nDistinct).foreach { _ =>
          val key = rnd.nextLong()
          val w = math.exp(rnd.nextGaussian()) // lognormal skew
          exact += w
          val reps = 1 + rnd.nextInt(3)
          (0 until reps).foreach(_ => sk.update(key, w))
        }
        val est = sk.estimateSum()
        val tol = if (nDistinct < k) 1e-9 else 4.0 / math.sqrt(k) * exact
        assert(math.abs(est - exact) <= tol,
          s"seed=$seed k=$k n=$nDistinct: est $est vs exact $exact")
      }
    }
  }

  test("morton z-order round-trips: bit de-interleave recovers both dims") {
    // the same spreading algebra q53 uses, checked against direct bit
    // interleaving for every 8-bit pair on a sampled grid
    def spread(x: Long): Long = {
      val x1 = (x | (x << 4)) & 0x0F0FL
      val x2 = (x1 | (x1 << 2)) & 0x3333L
      (x2 | (x2 << 1)) & 0x5555L
    }
    def reference(px: Long, sx: Long): Long = {
      var z = 0L
      (0 until 8).foreach { i =>
        z |= ((px >> i) & 1L) << (2 * i)
        z |= ((sx >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    for (px <- 0L until 256L by 7L; sx <- 0L until 256L by 11L) {
      val z = (spread(sx) << 1) | spread(px)
      assert(z == reference(px, sx), s"($px, $sx)")
      // locality: the top 6 bits (q53's file id) fix both
      // coordinates' top 3 bits — de-interleave and compare
      val fileOf = z >> 10
      val pxBlock = px >> 5; val sxBlock = sx >> 5
      // reconstruct blocks from the file id by de-interleaving 6 bits
      var rp = 0L; var rs = 0L
      (0 until 3).foreach { i =>
        rp |= ((fileOf >> (2 * i)) & 1L) << i
        rs |= ((fileOf >> (2 * i + 1)) & 1L) << i
      }
      assert(rp == pxBlock && rs == sxBlock, s"block mismatch at ($px, $sx)")
    }
  }

  test("categorical SparseTree routing ≡ independent reference interpreter") {
    // randomized mixed numeric/categorical trees, scored by leafOf and
    // by a from-scratch interpreter of the STOCK rules (NaN -> default
    // branch; categorical: negative/invalid -> left, in right-set ->
    // right; numeric: x <= thresh -> left). Catches polarity or
    // precedence drift the hand-built-document spec can't enumerate.
    import graft.ml.SparseBoost.SparseTree
    val rnd = new scala.util.Random(20260816L)
    def refWalk(t: SparseTree, x: Array[Double]): Int = {
      var i = 0
      while (t.feature(i) >= 0) {
        val v = x(t.feature(i))
        i =
          if (v.isNaN) { if (t.defaultLeft(i)) t.left(i) else t.right(i) }
          else if (t.cats != null && t.cats(i) != null) {
            if (v >= 0.0 && t.cats(i).contains(v.toInt)) t.right(i)
            else t.left(i)
          }
          else if (v <= t.thresh(i)) t.left(i) else t.right(i)
      }
      i
    }
    (1 to 40).foreach { _ =>
      // full binary tree of depth 3: nodes 0..6 internal, 7..14 leaves
      val n = 15
      val feature = new Array[Int](n)
      val thresh = new Array[Double](n)
      val left = new Array[Int](n)
      val right = new Array[Int](n)
      val dl = new Array[Boolean](n)
      val value = new Array[Double](n)
      val cats = new Array[Array[Int]](n)
      var anyCat = false
      (0 until 7).foreach { i =>
        feature(i) = rnd.nextInt(3)
        left(i) = 2 * i + 1; right(i) = 2 * i + 2
        dl(i) = rnd.nextBoolean()
        if (rnd.nextBoolean()) {
          anyCat = true
          cats(i) = (0 to 5).filter(_ => rnd.nextBoolean()).toArray match {
            case a if a.isEmpty => Array(rnd.nextInt(6))
            case a => a
          }
          thresh(i) = Double.NaN
        } else thresh(i) = rnd.nextInt(7) - 0.5
      }
      (7 until 15).foreach { i =>
        feature(i) = -1; left(i) = -1; right(i) = -1
        value(i) = rnd.nextDouble()
      }
      val t = SparseTree(feature, thresh, left, right, dl, value,
        Array.fill(n)(1.0), Array.emptyDoubleArray,
        if (anyCat) cats else null)
      (1 to 60).foreach { _ =>
        val x = Array.fill(3)(rnd.nextInt(10) match {
          case 0 => Double.NaN
          case 1 => -1.0 - rnd.nextInt(3)
          case k => (k - 2).toDouble
        })
        val got = t.leafOf(org.apache.spark.ml.linalg.Vectors.dense(x))
        val want = refWalk(t, x)
        assert(got == want,
          s"routing mismatch at x=${x.toSeq}: leafOf=$got ref=$want " +
          s"cats=${Option(t.cats).map(_.map(c => Option(c).map(_.toSeq)).toSeq)}")
      }
    }
  }
}
