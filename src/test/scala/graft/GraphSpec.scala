package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** Dense in-memory PageRank reference: same recurrence as the
    * distributed operator, computed with plain arrays.
    */
  private def densePageRank(
      edges: Seq[(Long, Long)], iters: Int, damping: Double): Map[Long, Double] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val nodes = sym.map(_._1).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n = nodes.size
    var r = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iters) {
      val next = Array.fill(n)((1.0 - damping) / n)
      sym.foreach { case (u, v) =>
        next(idx(v)) += damping * r(idx(u)) / deg(u)
      }
      r = next
    }
    nodes.map(nd => nd -> r(idx(nd))).toMap
  }

  /** Dense in-memory personalized-PageRank reference: restart mass
    * returns to the seed distribution each round (sparse frame in the
    * operator ≡ zero entries here).
    */
  private def densePpr(
      edges: Seq[(Long, Long)], restart: Map[Long, Double],
      iters: Int, damping: Double): Map[Long, Double] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val nodes = sym.map(_._1).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(nd => restart.getOrElse(nd, 0.0)).toArray
    for (_ <- 1 to iters) {
      val next = nodes.map(nd => (1.0 - damping) * restart.getOrElse(nd, 0.0)).toArray
      sym.foreach { case (u, v) =>
        next(idx(v)) += damping * r(idx(u)) / deg(u)
      }
      r = next
    }
    nodes.map(nd => nd -> r(idx(nd))).toMap
  }

  private def runPpr(
      edges: Seq[(Long, Long)], seeds: Map[Long, Double],
      iters: Int = 5): Map[Long, Double] = {
    val e = edges.toDF("pa", "pb")
    val sym = e.select($"pa".as("u"), $"pb".as("v"))
      .union(e.select($"pb".as("u"), $"pa".as("v")))
    val seedDf = seeds.toSeq.toDF("node", "restart")
    Graph.personalizedPageRank(spark, sym, seedDf, iters, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("personalized pagerank matches dense reference on a star graph") {
    val edges = (1L to 6L).map(i => (0L, i))
    val got = runPpr(edges, Map(0L -> 1.0))
    val want = densePpr(edges, Map(0L -> 1.0), 5, 0.85)
    want.foreach { case (k, v) =>
      assert(math.abs(got.getOrElse(k, 0.0) - v) < 1e-9, s"node $k: ${got.get(k)} vs $v")
    }
    assert(got(0L) >= 0.15, "seed keeps its restart floor")
    assert(got(0L) == got.values.max, "single seed dominates")
  }

  test("personalized pagerank matches dense reference on a random graph with 2 seeds") {
    val rnd = new scala.util.Random(7)
    // canonicalize (min,max) so the operator's two-direction union and
    // the dense reference's distinct see the SAME simple graph
    val edges = ((0 until 40).map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))) :+ (1L, 5L)).distinct
    val seeds = Map(1L -> 0.5, 5L -> 0.5)
    val got = runPpr(edges, seeds)
    val want = densePpr(edges, seeds, 5, 0.85)
    want.filter(_._2 > 0).foreach { case (k, v) =>
      assert(math.abs(got.getOrElse(k, 0.0) - v) < 1e-9, s"node $k: ${got.get(k)} vs $v")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "rank mass conserved")
  }

  test("personalized pagerank reach is the k-hop ball (sparse frame)") {
    // path 0-1-2-...-10, seed at 0, 3 iterations → nodes 0..3 only
    val edges = (0L until 10L).map(i => (i, i + 1))
    val got = runPpr(edges, Map(0L -> 1.0), iters = 3)
    assert(got.keySet == Set(0L, 1L, 2L, 3L),
      s"3 rounds from node 0 must reach exactly 0..3, got ${got.keySet}")
  }

  private def runPageRank(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Double] = {
    val e = edges.toDF("pa", "pb")
    val sym = e.select($"pa".as("u"), $"pb".as("v"))
      .union(e.select($"pb".as("u"), $"pa".as("v")))
    val out = Graph.pageRank(spark, sym, iters, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out
  }

  test("pagerank matches dense reference on a star graph") {
    // star: hub 0, leaves 1..6 — hub must dominate
    val edges = (1L to 6L).map(i => (0L, i))
    val got = runPageRank(edges)
    val want = densePageRank(edges, 5, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-9, s"node $k: $v vs ${want(k)}")
    }
    assert(got(0L) > got(1L) * 3, "hub rank should dominate leaf rank")
  }

  test("pagerank on a cycle is uniform") {
    val edges = (0L until 8L).map(i => (i, (i + 1) % 8))
    val got = runPageRank(edges)
    got.values.foreach(v => assert(math.abs(v - 1.0 / 8) < 1e-12))
  }

  test("pagerank matches dense reference on a random graph") {
    val rnd = new scala.util.Random(42)
    // canonical (min < max) distinct edges — the operator contract
    // (copurchaseEdges emits pa < pb distinct)
    val edges = (0 until 60)
      .map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val got = runPageRank(edges)
    val want = densePageRank(edges, 5, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-9, s"node $k: $v vs ${want(k)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "total rank must be conserved")
  }

  test("triangle query gates hold and counts are consistent at sf0.001") {
    val r = SparkEntry.queries("graph_triangles")(spark, sf).head()
    val (nodes, edges, wedges, tris) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nodes > 0 && edges > 0)
    assert(tris <= wedges, "every triangle closes a wedge")
    // each triangle contributes 3 closed wedges among the wedge count
    assert(3 * tris <= wedges)
  }

  test("triangles: known graphs (triangle, square, K4)") {
    def countTris(edges: Seq[(Long, Long)]): Long = {
      val e = edges.toDF("pa", "pb").distinct()
      val sym = e.select($"pa".as("u"), $"pb".as("v"))
        .union(e.select($"pb".as("u"), $"pa".as("v")))
      val deg = sym.groupBy($"u").agg(count(lit(1)).as("d"))
      val withDeg = e
        .join(deg.select($"u".as("pa"), $"d".as("da")), Seq("pa"))
        .join(deg.select($"u".as("pb"), $"d".as("db")), Seq("pb"))
      val oriented = withDeg.select(
        when($"da" < $"db" || ($"da" === $"db" && $"pa" < $"pb"),
          struct($"pa".as("s"), $"pb".as("t"), $"db".as("dt")))
          .otherwise(struct($"pb".as("s"), $"pa".as("t"), $"da".as("dt")))
          .as("e"))
        .select($"e.s".as("s"), $"e.t".as("t"), $"e.dt".as("dt"))
      val e1 = oriented.select($"s", $"t".as("v"), $"dt".as("dv"))
      val e2 = oriented.select($"s", $"t".as("w"), $"dt".as("dw"))
      e1.join(e2, Seq("s"))
        .filter($"dv" < $"dw" || ($"dv" === $"dw" && $"v" < $"w"))
        .select($"v".as("s"), $"w".as("t"))
        .join(oriented.select($"s", $"t"), Seq("s", "t"))
        .count()
    }
    assert(countTris(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == 1L)
    assert(countTris(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == 0L)
    // K4 has 4 triangles
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(countTris(k4) == 4L)
  }

  test("pagerank query gates hold at sf0.001") {
    val r = SparkEntry.queries("graph_pagerank")(spark, sf).head()
    assert(r.getBoolean(4), "rank_sum_ok must hold")
    assert(r.getBoolean(5), "rank_positive_ok must hold")
    assert(r.getLong(3) > 0, "hub degree positive")
  }

  /** Dense in-memory label propagation: same recurrence as the
    * distributed operator (sync updates, max label count over
    * neighbors + self-vote, min label on ties), plain maps.
    */
  private def denseLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val nbrs = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = nbrs.map { case (n, ns) =>
        val counts = (n +: ns).groupBy(labels).view.mapValues(_.size).toMap
        val maxCnt = counts.values.max
        n -> counts.filter(_._2 == maxCnt).keys.min
      }
    }
    labels
  }

  test("label propagation ≡ dense reference; two cliques stay two communities") {
    def runLpa(edges: Seq[(Long, Long)], rounds: Int = 5): Map[Long, Long] = {
      val e = edges.toDF("pa", "pb")
      val sym = e.select($"pa".as("u"), $"pb".as("v"))
        .union(e.select($"pb".as("u"), $"pa".as("v")))
      Graph.labelPropagation(sym, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // two 4-cliques bridged by one edge (4-8)
    val cliqueA = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val cliqueB = for { a <- 5L to 8L; b <- (a + 1) to 8L } yield (a, b)
    val g = cliqueA ++ cliqueB :+ ((4L, 8L))
    val got = runLpa(g)
    assert(got == denseLpa(g, 5), "distributed LPA diverged from dense reference")
    val comms = got.groupBy(_._2).values.map(_.keys.toSet).toSet
    assert(comms == Set((1L to 4L).toSet, (5L to 8L).toSet),
      s"expected the two cliques as communities, got $comms")
    // a path graph also agrees with the reference
    val path = (1L until 6L).map(i => (i, i + 1))
    assert(runLpa(path) == denseLpa(path, 5))
  }

  test("communities query gates hold at sf0.001") {
    val r = SparkEntry.queries("graph_communities")(spark, sf).head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4))
  }

  test("bipartite projection: hand-computed Jaccard on a tiny purchase graph") {
    // cust 1 buys parts {1,2,3}; cust 2 {2,3}; cust 3 {3,4}
    // jaccard(1,2) = 2/3, jaccard(1,3) = 1/4, jaccard(2,3) = 1/3
    val tmp = java.nio.file.Files.createTempDirectory("graft_bip").toString
    Seq((10L, 1L), (11L, 1L), (20L, 2L), (30L, 3L))
      .toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$tmp/orders.parquet")
    Seq(
      (10L, 1L), (10L, 2L), (11L, 3L), (11L, 2L), // cust 1 (part 2 twice)
      (20L, 2L), (20L, 3L),                       // cust 2
      (30L, 3L), (30L, 4L)                        // cust 3
    ).toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$tmp/lineitem.parquet")
    val rows = SparkEntry.queries("graph_customer_similarity")(spark, tmp)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows.size == 6, "each of 3 customers has 2 neighbors")
    assert(rows((1L, 1L)) == ((2L, 2L, 2.0 / 3.0)))
    assert(rows((1L, 2L)) == ((3L, 1L, 1.0 / 4.0)))
    assert(rows((2L, 1L)) == ((1L, 2L, 2.0 / 3.0)))
    assert(rows((2L, 2L)) == ((3L, 1L, 1.0 / 3.0)))
    assert(rows((3L, 1L)) == ((2L, 1L, 1.0 / 3.0)))
    assert(rows((3L, 2L)) == ((1L, 1L, 1.0 / 4.0)))
  }

  /** Dense weighted PageRank reference (rank flows ∝ edge weight). */
  private def densePageRankWeighted(
      edges: Seq[(Long, Long, Long)], iters: Int, damping: Double): Map[Long, Double] = {
    val sym = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val nodes = sym.map(_._1).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val wdeg = sym.groupBy(_._1).view.mapValues(_.map(_._3).sum.toDouble).toMap
    val n = nodes.size
    var r = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iters) {
      val next = Array.fill(n)((1.0 - damping) / n)
      sym.foreach { case (u, v, w) =>
        next(idx(v)) += damping * r(idx(u)) * w / wdeg(u)
      }
      r = next
    }
    nodes.map(nd => nd -> r(idx(nd))).toMap
  }

  private def runPageRankWeighted(
      edges: Seq[(Long, Long, Long)], iters: Int = 5): Map[Long, Double] = {
    val e = edges.toDF("pa", "pb", "w")
    val sym = e.select($"pa".as("u"), $"pb".as("v"), $"w")
      .union(e.select($"pb".as("u"), $"pa".as("v"), $"w"))
    Graph.pageRankWeighted(spark, sym, iters, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("weighted pagerank: unit weights reproduce plain pagerank") {
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L))
    val plain = runPageRank(edges)
    val unit = runPageRankWeighted(edges.map { case (a, b) => (a, b, 1L) })
    assert(plain.keySet == unit.keySet)
    plain.foreach { case (k, v) => assert(math.abs(v - unit(k)) < 1e-12) }
  }

  test("weighted pagerank matches dense reference on a skewed-weight graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 60)
      .map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
      .map { case (a, b) => (a, b, 1L + rnd.nextInt(50).toLong) }
    val got = runPageRankWeighted(edges)
    val want = densePageRankWeighted(edges, 5, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-9, s"node $k: $v vs ${want(k)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "total rank conserved")
  }

  test("weighted pagerank: heavy edge pulls rank toward its endpoint") {
    // path 0-1-2 where edge (1,2) is 50x heavier than (0,1)
    val got = runPageRankWeighted(Seq((0L, 1L, 1L), (1L, 2L, 50L)))
    assert(got(2L) > got(0L), "heavy-edge endpoint must outrank light one")
  }

  test("weighted pagerank query gates hold at sf0.001") {
    val r = SparkEntry.queries("graph_pagerank_weighted")(spark, sf).head()
    assert(r.getBoolean(5), "rank_sum_ok must hold")
    assert(r.getBoolean(6), "rank_positive_ok must hold")
    assert(r.getLong(4) > 0, "hub weighted degree positive")
    assert(r.getLong(2) >= r.getLong(1), "total weight >= edge count")
  }

  test("BFS levels equal a dense breadth-first recompute") {
    import graft.operators.Graph
    val (_, sym) = Graph.copurchaseGraphShared(spark, sf)
    val edges = sym.select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    val src = nodes.min
    var dist = Map(src -> 0L)
    var frontier = Set(src)
    var d = 0L
    while (frontier.nonEmpty && d < Graph.MaxBfsDepth) {
      d += 1
      frontier = frontier.flatMap(adj(_)).diff(dist.keySet)
      dist ++= frontier.map(_ -> d)
    }
    val want = dist.groupBy(_._2).view.mapValues(_.keys).toMap
    val rows = SparkEntry.queries("graph_bfs_levels")(spark, sf).collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val ids = want(r.getLong(0))
      assert(r.getLong(1) == ids.size, s"level ${r.getLong(0)} size")
      assert(r.getLong(2) == ids.min && r.getLong(3) == ids.max)
      assert(r.getLong(4) == nodes.size - dist.size, "unreached count")
    }
  }

  test("hierarchy rollup equals a dense recursive recompute") {
    val sup = graft.sources.Tables(spark, sf).supplier
      .select(col("s_suppkey").cast("long"), col("s_acctbal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def parent(s: Long): Long = (s - 1) / 2
    def depth(s: Long): Long =
      if (s == 0) 0L else 1L + depth(parent(s))
    // descendants of a: nodes whose ancestor chain passes through a
    def isUnder(d: Long, a: Long): Boolean =
      d == a || (d > 0 && isUnder(parent(d), a))
    val rows = SparkEntry.queries("graph_hierarchy_rollup")(spark, sf).collect()
    assert(rows.length == sup.size, "one row per node")
    rows.foreach { r =>
      val node = r.getLong(0)
      assert(r.getLong(1) == depth(node), s"depth of $node")
      assert(r.getLong(2) == 0L, s"root of $node")
      val subtree = sup.keys.filter(isUnder(_, node)).toSeq
      assert(r.getLong(3) == subtree.size, s"subtree_n of $node")
      val want = subtree.map(d => BigDecimal(sup(d)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      assert(r.getDouble(4) == want, s"subtree_acctbal of $node")
    }
  }

  test("k-core peel: planted graph peels the cascade, keeps the clique") {
    import spark.implicits._
    // 4-clique {1,2,3,4} plus a chain 4-5-6: for k=2 the chain must
    // peel in TWO rounds (6 first, then 5 — degree only drops after
    // 6 leaves), proving the iteration; the clique survives with
    // within-core degree 3
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val sym = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("u", "v")
    val core = graft.operators.Graph.kcorePeel(sym, 2L, 8)
      .groupBy($"u").agg(count(lit(1)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // non-convergence is loud: a long cycle with k above its degree
    // peels everything in round one and converges; but an impossible
    // round cap trips the guard
    val cyc = (1L to 5L).map(i => (i, i % 5 + 1))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("u", "v")
    intercept[IllegalArgumentException] {
      graft.operators.Graph.kcorePeel(cyc, 3L, 0)
    }
  }

  test("assortativity equals a dense moment recompute") {
    val edges = graft.operators.Graph
      .copurchaseGraphShared(spark, sf)._2
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val (n, sx, sxy, sxx) = edges.foldLeft((0L, 0L, 0L, 0L)) {
      case ((cn, csx, csxy, csxx), (u, v)) =>
        (cn + 1, csx + deg(u), csxy + deg(u) * deg(v), csxx + deg(u) * deg(u))
    }
    // symmetric frame: x and y moments coincide
    val num = n.toDouble * sxy.toDouble - sx.toDouble * sx.toDouble
    val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
    val want = BigDecimal(num / (math.sqrt(den) * math.sqrt(den)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = SparkEntry.queries("graph_assortativity")(spark, sf)
      .collect().head
    assert(row.getLong(0) == n, "directed edge count")
    assert(math.abs(row.getDouble(1) - want) < 1e-6,
      s"assortativity ${row.getDouble(1)} != dense $want")
    assert(row.getDouble(1) >= -1.0 && row.getDouble(1) <= 1.0)
  }

  test("graph_kcore query: every survivor meets the threshold in-core") {
    val rows = SparkEntry.queries("graph_kcore")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.values.foreach(d =>
      assert(d >= graft.operators.Graph.KcoreK, "survivor below k in core"))
  }

  test("k-truss peel matches an in-memory fixpoint on a cascading strip") {
    import spark.implicits._
    // triangle strip on 1..6 (edges (i,i+1), (i,i+2)) plus a K4 on
    // 7..10. For k=4 (support >= 2) the strip unravels over multiple
    // rounds — ends first, then the surviving path — while every K4
    // edge sits in exactly 2 triangles and must survive: a real
    // cascade with a non-empty fixpoint, verified densely
    val und = (1L to 5L).map(i => (i, i + 1)) ++
      (1L to 4L).map(i => (i, i + 2)) ++
      (for (a <- 7L to 10L; b <- (a + 1) to 10L) yield (a, b))
    def fixpoint(edges: Set[(Long, Long)], k: Long): Set[(Long, Long)] = {
      val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val keep = edges.filter { case (a, b) =>
        (nbrs.getOrElse(a, Set.empty) & nbrs.getOrElse(b, Set.empty)).size >= k - 2
      }
      if (keep == edges) edges else fixpoint(keep, k)
    }
    val want = fixpoint(und.toSet, 4L)
    val k4 = (for (a <- 7L to 10L; b <- (a + 1) to 10L) yield (a, b)).toSet
    assert(want == k4, "dense fixpoint should be exactly the K4 clique")
    val sym = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("u", "v")
    val got = graft.operators.Graph.kTrussPeel(sym, 4L, 8)
      .filter($"u" < $"v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"truss edges $got != dense fixpoint $want")
    intercept[IllegalArgumentException] {
      graft.operators.Graph.kTrussPeel(sym, 4L, 0)
    }
  }

  test("graph_ktruss query: supports meet the threshold, edges undirected") {
    val rows = SparkEntry.queries("graph_ktruss")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, v, s) =>
      assert(u < v, "edges must be emitted once, canonical direction")
      assert(s >= graft.operators.Graph.TrussK - 2L, "support below k-2")
    }
  }

  test("global link prediction: hub-capped wedge recompute, top-k discipline") {
    val t = graft.sources.Tables(spark, sf)
    val items = t.lineitem.select(col("l_orderkey"), col("l_partkey"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = items.groupBy(_._1).values.flatMap { os =>
      val ps = os.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val sym = edges.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val centers = deg.filter(_._2 <= Graph.LinkHubCap).keySet
    val wedge = scala.collection.mutable.Map.empty[(Long, Long), Long]
    sym.groupBy(_._1).foreach { case (z, nbrs) =>
      if (centers(z)) {
        val ns = nbrs.map(_._2).distinct.sorted
        for (i <- ns.indices; j <- (i + 1) until ns.length)
          wedge((ns(i), ns(j))) = wedge.getOrElse((ns(i), ns(j)), 0L) + 1L
      }
    }
    val want = wedge.toSeq.collect {
      case ((a, b), cn) if !edges((a, b)) => (a, b, cn)
    }.sortBy { case (a, b, cn) => (-cn, a, b) }
      .take(Graph.LinkTopPairs)
    val got = SparkEntry.queries("graph_link_prediction_global")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, "capped common-neighbor top pairs")
    assert(centers.nonEmpty, "hub cap must admit some centers at this SF")
  }

  test("clustering coefficient: per-node triangles match dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val items = t.lineitem.select(col("l_orderkey"), col("l_partkey"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = items.groupBy(_._1).values.flatMap { os =>
      val ps = os.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val want = adj.map { case (v, ns) =>
      val nbrs = ns.toSeq.sorted
      var tri = 0L
      for (i <- nbrs.indices; j <- (i + 1) until nbrs.length)
        if (adj(nbrs(i))(nbrs(j))) tri += 1L
      val d = ns.size.toLong
      val cc = if (d < 2) 0.0 else (2L * tri).toDouble / (d * (d - 1)).toDouble
      v -> (d, tri, cc)
    }.toMap
    val rows = SparkEntry.queries("graph_clustering_coeff")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == want.keySet, "node set")
    rows.foreach { r =>
      val (d, tri, cc) = want(r.getLong(0))
      assert(r.getLong(1) == d, s"degree node ${r.getLong(0)}")
      assert(r.getLong(2) == tri, s"triangles node ${r.getLong(0)}")
      assert(r.getDouble(3) == cc, s"local_cc node ${r.getLong(0)}")
    }
    // triangle-sum identity vs the global count: Σ_v T_v = 3·triangles
    val totalTri = want.values.map(_._2).sum
    assert(totalTri % 3 == 0, "corner counts come in threes")
  }

  test("HITS: star case analytic; corpus scores match dense iteration") {
    // one customer buying 4 parts: hub = 1, each auth = 1/4, stable
    val star = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L)).toDF("c", "p")
    val (hubS, authS) = Graph.hits(spark, star, Graph.HitsIters)
    val hs = hubS.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val as0 = authS.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hs.keySet == Set(1L) && math.abs(hs(1L) - 1.0) < 1e-12, "star hub")
    assert(as0.size == 4 && as0.values.forall(v => math.abs(v - 0.25) < 1e-12),
      "star auths")

    val t = graft.sources.Tables(spark, sf)
    val edges = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .join(t.lineitem.select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val custs = edges.map(_._1).distinct
    var hub = custs.map(_ -> 1.0 / custs.length).toMap
    var auth = Map.empty[Long, Double]
    for (_ <- 1 to Graph.HitsIters) {
      val araw = edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => hub(e._1)).sum }
      val at = araw.values.sum
      auth = araw.map { case (p, v) => p -> v / at }
      val hraw = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => auth(e._2)).sum }
      val ht = hraw.values.sum
      hub = hraw.map { case (c, v) => c -> v / ht }
    }
    val df = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .join(t.lineitem.select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
    val (hubG, authG) = Graph.hits(spark, df, Graph.HitsIters)
    val gh = hubG.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ga = authG.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gh.keySet == hub.keySet && ga.keySet == auth.keySet, "node sets")
    hub.foreach { case (c, v) =>
      assert(math.abs(gh(c) - v) < 1e-9, s"hub $c") }
    auth.foreach { case (p, v) =>
      assert(math.abs(ga(p) - v) < 1e-9, s"auth $p") }
    // L1 invariants after the final normalization
    assert(math.abs(gh.values.sum - 1.0) < 1e-9, "hub L1")
    assert(math.abs(ga.values.sum - 1.0) < 1e-9, "auth L1")
  }

  test("closeness: bounded BFS distances match dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val items = t.lineitem.select(col("l_orderkey"), col("l_partkey"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = items.groupBy(_._1).values.flatMap { os =>
      val ps = os.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val lms = adj.toSeq.map { case (u, ns) => (u, ns.size) }
      .sortBy { case (u, d) => (-d, u) }.take(Graph.ClosenessLandmarks)
      .map(_._1)
    val want = lms.map { lm =>
      var dist = Map(lm -> 0L)
      var frontier = Set(lm)
      var d = 0L
      while (frontier.nonEmpty && d < Graph.ClosenessHorizon) {
        d += 1
        frontier = frontier.flatMap(adj(_)).diff(dist.keySet)
        dist ++= frontier.map(_ -> d)
      }
      val sumD = dist.values.sum
      lm -> (dist.size.toLong, sumD,
        if (sumD == 0L) 0.0 else (dist.size - 1).toDouble / sumD.toDouble)
    }.toMap
    val rows = SparkEntry.queries("graph_closeness")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == want.keySet, "landmark set")
    rows.foreach { r =>
      val (nr, sd, cl) = want(r.getLong(0))
      assert(r.getLong(1) == nr, s"n_reached lm ${r.getLong(0)}")
      assert(r.getLong(2) == sd, s"sum_dist lm ${r.getLong(0)}")
      assert(r.getDouble(3) == cl, s"closeness lm ${r.getLong(0)}")
    }
  }

  test("sampled Brandes: path and diamond dependencies match hand math") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)], src: Long) = {
      val sym = (edges ++ edges.map(_.swap)).toDF("u", "v")
      Graph.brandesSampled(sym, Seq(src).toDF("lm"), 3)
        .collect()
        .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
        .toMap
    }
    // path 1-2-3 from 1: δ(3)=0, δ(2)=1, δ(1)=2 (flow identity 0+1+2=Σdist)
    val path = run(Seq((1L, 2L), (2L, 3L)), 1L)
    assert(path(3L) == ((2L, 1L, 0.0)))
    assert(path(2L) == ((1L, 1L, 1.0)))
    assert(path(1L) == ((0L, 1L, 2.0)))
    // diamond 1-2, 1-3, 2-4, 3-4 from 1: σ(4)=2, δ(2)=δ(3)=0.5, δ(1)=3
    val dia = run(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), 1L)
    assert(dia(4L) == ((2L, 2L, 0.0)), "two shortest paths reach the sink")
    assert(dia(2L) == ((1L, 1L, 0.5)) && dia(3L) == ((1L, 1L, 0.5)),
      "the sink's unit splits evenly across the two middles")
    assert(dia(1L)._3 == 3.0)
  }

  test("betweenness query gates hold at sf0.001") {
    val rows = SparkEntry.queries("graph_betweenness_sampled")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == Graph.BetweennessSources)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"delta_nonneg_ok lm ${r.getLong(0)}")
      assert(r.getBoolean(5), s"brandes_identity_ok lm ${r.getLong(0)}")
    }
  }
}
