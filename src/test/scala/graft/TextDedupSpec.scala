package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, TextAnalysis}

class TextDedupSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("langid identifies synthetic multilingual docs") {
    val docs = Seq(
      (1L, "the cat and the dog is in that house with it"),
      (2L, "el perro y la casa de los gatos que se ven"),
      (3L, "le chat et les maisons de la ville est une belle"),
      (4L, "der hund und die katze ist ein tier nicht zu sehen"),
      (5L, "这是 一个 中文 句子"),
      (6L, "qwerty zxcvb asdfgh")
    ).toDF("doc_id", "text")
    val got = docs.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en"); assert(got(2L) == "es"); assert(got(3L) == "fr")
    assert(got(4L) == "de"); assert(got(5L) == "zh"); assert(got(6L) == "unknown")
  }

  test("exact dedup groups identical normalized content") {
    val docs = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "other doc entirely")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ignore")
    val normalized = trim(regexp_replace(lower($"text"), "\\s+", " "))
    val groups = docs.select(md5(normalized.cast("binary")).as("h"), $"doc_id")
      .groupBy("h").agg(count(lit(1)).as("n"), min("doc_id").as("canon"))
      .collect()
    assert(groups.length == 2)
    assert(groups.find(_.getLong(1) == 2L).get.getLong(2) == 1L)
  }

  test("shingles produce word trigrams; short docs give empty") {
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val sh = df.select($"doc_id", Dedup.shingles($"text").as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L).isEmpty)
  }

  test("minhash LSH finds planted near-duplicates on the real corpus") {
    // dedup_ngram_jaccard is the exact ground truth (oracle-checked);
    // the LSH path must recover every pair at jaccard >= 0.5.
    val docSets = Dedup.docShingleSets(
      graft.sources.Tables(spark, sf).documents).cache()
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docSets)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    docSets.unpersist(false)
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} true pairs")
    // verification step guarantees no false positives
    assert((lsh -- exact).isEmpty)
    // registered (oracle-checkable) summary: exact pair count + recall gate
    val summary = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).collect()
    assert(summary.length == 1 && summary.head.getLong(0) == exact.size
      && summary.head.getBoolean(1))
  }

  test("simhash: identical docs distance 0, near-dups small, unrelated large") {
    import graft.plans.SimHash64.simhash64
    val df = Seq(
      (1L, "spark makes big data processing fast and easy to scale"),
      (2L, "spark makes big data processing fast and easy to scale"),
      (3L, "spark makes big data processing quick and easy to scale"),
      (4L, "completely different words about gardening tomatoes roses soil")
    ).toDF("doc_id", "text")
    val sh = df.select($"doc_id", simhash64(split(lower($"text"), "\\s+")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) == 0)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)),
      s"near-dup ${ham(sh(1L), sh(3L))} should be closer than unrelated ${ham(sh(1L), sh(4L))}")
  }

  test("simhash multi-probe banding finds pairs exact banding provably misses") {
    // hamming 4 spread as one flipped bit PER band: no band matches
    // exactly, so plain 4x16 banding cannot surface the pair; the
    // single-bit-flip probes must (guarantee holds through hamming 7)
    val shA = 0x0123456789ABCDEFL
    val oneBitPerBand = 0x0001000100010001L
    val shB = shA ^ oneBitPerBand
    val far = shA ^ 0x0003000300030007L // hamming 9: must stay out
    val sigs = Seq((1L, shA), (2L, shB), (3L, far)).toDF("doc_id", "sh")
    val pairs = Dedup.simhashCandidates(sigs, maxHamming = 8)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"multi-probe must catch the 1-bit-per-band pair: $pairs")
    assert(!pairs.contains((1L, 3L)), s"hamming-9 pair must be filtered: $pairs")
  }

  test("ANN LSH recovers a meaningful share of exact top-5 on the real corpus") {
    val base = Similarity.corpusOf(spark, sf).cache()
    val exact = Similarity.exactTopK(base)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLshTopK(base)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    base.unpersist(false)
    val recall = ann.intersect(exact).size.toDouble / exact.size
    // single-probe LSH on near-orthogonal random vectors is a weak
    // signal by construction; the assertion pins the plumbing (same
    // ranking math, bucket join) rather than a strong recall target.
    assert(recall >= 0.2, s"ANN recall $recall")
    assert(ann.nonEmpty)
    // registered (oracle-checkable) summary agrees
    val summary = SparkEntry.queries("sim_ann_lsh")(spark, sf).collect()
    assert(summary.length == 1 && summary.head.getBoolean(2))
  }

  test("SQ int8 quantization: near-perfect recall, bounded recon error") {
    import org.apache.spark.sql.functions._
    val base = Similarity.corpusOf(spark, sf).cache()
    val exact = Similarity.exactTopK(base)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = Similarity.sqQuantTopK(base)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = sq.intersect(exact).size.toDouble / exact.size
    // 8-bit scalar quantization error is tiny relative to cosine gaps
    // between random vectors — recall must clear the registered gate
    // comfortably, unlike the bucketing-bound LSH/IVF paths
    assert(recall >= Similarity.SqRecallGate, s"SQ recall $recall")
    // per-dim reconstruction error is bounded by half a quantization
    // step: |x − recon(x)| ≤ (hi−lo)/510 for every dim of every vector
    val ranges = base.select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("d").agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    base.collect().foreach { r =>
      val v = r.getSeq[Double](1)
      v.indices.foreach { d =>
        val (lo, hi) = ranges(d)
        val code = math.round((v(d) - lo) * 255.0 / (hi - lo))
        val recon = lo + code * (hi - lo) / 255.0
        assert(math.abs(v(d) - recon) <= (hi - lo) / 510.0 + 1e-12,
          s"dim $d of vec ${r.getLong(0)}")
      }
    }
    base.unpersist(false)
    val summary = SparkEntry.queries("sim_sq_quant")(spark, sf).collect()
    assert(summary.length == 1 && summary.head.getBoolean(2), "gate row")
  }

  test("IVF ANN scans a fraction of the corpus yet finds true neighbors") {
    val base = Similarity.corpusOf(spark, sf).cache()
    val exact = Similarity.exactTopK(base)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvfTopK(base)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    base.unpersist(false)
    assert(ivf.nonEmpty)
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    // NProbe/NCells = 1/4 of the corpus scanned; random isotropic
    // vectors are ANN's worst case — pin a floor, not a target
    assert(recall >= 0.2, s"IVF recall $recall")
    val summary = SparkEntry.queries("sim_ann_ivf")(spark, sf).collect()
    assert(summary.length == 1 && summary.head.getBoolean(2))
  }

  test("ngram jaccard df-cap prunes hot-shingle candidates but keeps true near-dups") {
    // every doc shares the hot trigram "of the and"; docs 1/2 are true
    // near-dups sharing rare shingles too. With dfCap below the corpus
    // size the hot shingle is excluded from candidate generation, so
    // unrelated docs (which share ONLY the hot shingle) never pair up,
    // while the near-dup pair still surfaces via its rare shingles.
    val hot = "of the and"
    val shared = "alpha beta gamma delta epsilon kappa lambda mu nu xi"
    val docs = Seq(
      (1L, s"$shared omega $hot"),
      (2L, s"$shared sigma $hot"),
      (3L, s"totally unrelated words here one $hot"),
      (4L, s"another different document body two $hot"),
      (5L, s"yet more unique content three four $hot")
    ).toDF("doc_id", "text")
    val sets = Dedup.docShingleSets(docs).cache()
    val capped = Dedup.ngramJaccardPairs(sets, dfCap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)), s"got $capped")
    // uncapped candidate generation pairs everything that shares the
    // hot shingle — the cap is what bounds the join
    val uncapped = Dedup.ngramJaccardPairs(sets, dfCap = 1000)
    assert(capped == uncapped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      "cap must be lossless at jaccard >= 0.5 on this corpus")
    sets.unpersist()
  }

  test("blocked cosine kernel is exact across block counts and never collects") {
    // force many blocks (blockRows=3 over 10 vectors) and compare to a
    // locally computed brute force; each unordered pair must appear
    // exactly once regardless of which blocks its vectors land in
    val rnd = new scala.util.Random(7)
    val base = Array.fill(4)(rnd.nextDouble())
    val rows = (0L until 10L).map { i =>
      val v = if (i % 2 == 0) base.map(_ + rnd.nextDouble() * 0.05)
              else Array.fill(4)(rnd.nextGaussian())
      (i, v)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = (for {
      i <- rows.indices; j <- (i + 1) until rows.length
      c = cos(rows(i)._2, rows(j)._2) if c >= 0.35
    } yield (rows(i)._1, rows(j)._1)).toSet
    val df = rows.toDF("vec_id", "v")
    for (blockRows <- Seq(3, 4, 100)) {
      val got = Dedup.blockedCosinePairs(spark, df, 0.35, blockRows)
      val pairs = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == expected, s"blockRows=$blockRows: $pairs vs $expected")
      got.unpersist()
    }
  }

  test("connected components: chains, stars, disjoint clusters, min labels") {
    // a 7-node path (needs multiple propagation rounds), a star, and
    // an isolated pair — every node must end with its component's min
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), // path 1..7
      (10L, 11L), (10L, 12L), (10L, 13L),                          // star at 10
      (20L, 21L)                                                   // pair
    ).toDF("src", "dst")
    val got = Dedup.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 7L).foreach(n => assert(got(n) == 1L, s"node $n: ${got(n)}"))
    (10L to 13L).foreach(n => assert(got(n) == 10L))
    assert(got(20L) == 20L && got(21L) == 20L)
  }

  test("connected components: 64-node chain converges in O(log) rounds") {
    // pure path graph of diameter 63 — min-propagation alone needs
    // ~63 rounds; pointer jumping must land it within ~2*log2(64)+2
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds, converged) =
      Dedup.connectedComponentsWithStats(edges, "src", "dst", maxIter = 16)
    assert(converged)
    assert(rounds <= 14, s"chain of 64 took $rounds rounds (expected ~log2)")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 64L).foreach(n => assert(got(n) == 1L, s"node $n: ${got(n)}"))
  }

  test("connected components fails loudly when maxIter is exhausted") {
    val edges = (1L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Dedup.connectedComponentsWithStats(edges, "src", "dst", maxIter = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("dedup_clusters groups transitively (A~B, B~C => one cluster)") {
    val hot = "alpha beta gamma delta epsilon kappa lambda mu nu xi"
    // doc1~doc2 and doc2~doc3 overlap pairwise; 1 and 3 share less —
    // clustering must still put all three together
    val docs = Seq(
      (1L, s"$hot one two three"),
      (2L, s"$hot one two four"),
      (3L, s"$hot one five four"),
      (9L, "completely different content about gardens and tomatoes growing")
    ).toDF("doc_id", "text")
    val sets = Dedup.docShingleSets(docs).cache()
    val pairs = Dedup.ngramJaccardPairs(sets, 1000)
    val clusters = Dedup.connectedComponents(pairs, "ia", "ib")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.keySet == Set(1L, 2L, 3L), s"got $clusters")
    assert(clusters.values.toSet == Set(1L), "all three near-dups share cluster 1")
    sets.unpersist()
  }

  test("chunking covers every token exactly once with bounded chunks") {
    val chunks = SparkEntry.queries("text_chunk")(spark, sf)
    val t = graft.sources.Tables(spark, sf)
    val totalTokens = t.documents
      .select(sum(size(split(lower($"text"), "\\s+")))).first().getLong(0)
    val stats = chunks.agg(
      sum($"chunk_tokens"), max($"chunk_tokens"), min($"chunk_tokens")).first()
    assert(stats.getLong(0) == totalTokens, "chunk tokens must cover all tokens once")
    assert(stats.getLong(1) <= TextAnalysis.ChunkTokens)
    assert(stats.getLong(2) >= 1)
    chunks.unpersist()
  }

  test("decontamination flags exactly the docs sharing an 8-gram with the benchmark") {
    val span = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"benchmark question text $span end of prompt"),   // benchmark (id < 20)
      (25L, s"training document that copied $span verbatim"), // contaminated
      (26L, "clean training document with entirely different words here"),
      (27L, s"another copy $span also leaked into training")  // contaminated
    ).toDF("doc_id", "text")
    import graft.plans.WordShingles.wordShingles
    val grams = docs.select($"doc_id",
      wordShingles(split(lower($"text"), "\\s+"), TextAnalysis.DecontaminateN).as("g"))
    val bench = grams.filter($"doc_id" < TextAnalysis.BenchmarkIdBound)
      .select(explode($"g").as("gram")).distinct()
    val hits = grams.filter($"doc_id" >= TextAnalysis.BenchmarkIdBound)
      .select($"doc_id", explode($"g").as("gram"))
      .join(broadcast(bench), Seq("gram"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(25L, 27L), s"got $hits")
    assert(hits.values.forall(_ >= 1))
  }

  test("stratified sample is deterministic and bounded per stratum") {
    val s1 = SparkEntry.queries("sample_stratified")(spark, sf).collect()
    val s2 = SparkEntry.queries("sample_stratified")(spark, sf).collect()
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq, "sampling must be reproducible")
    val perSource = s1.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perSource.values.forall(_ <= TextAnalysis.SamplePerSource))
  }

  test("sequence packing: packs are contiguous, ordered, and start within budget") {
    val rows = SparkEntry.queries("text_pack_sequences")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, docs) =>
      val sorted = docs.sortBy(_._2)
      // pack ids are non-decreasing in doc order and start at 0
      assert(sorted.head._4 == 0L, s"$src first pack")
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(b._4 >= a._4, s"$src pack ids must be non-decreasing")
      }
      // each doc STARTS in the pack holding its first token: the sum
      // of tokens before it, divided by the budget
      var cum = 0L
      sorted.foreach { case (_, id, n, pack) =>
        assert(pack == cum / TextAnalysis.PackBudget, s"$src doc $id pack $pack cum $cum")
        cum += n
      }
    }
  }

  test("repetition metrics: repetitive doc dropped, diverse doc kept") {
    val df = Seq(
      (1L, "a a a a b"), // top_word 4/5, dup2 = 1 - 2/4
      (2L, "one two three four five six")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 5L)
    assert(m(1L).getDouble(2) == 0.8 && m(1L).getDouble(3) == 0.5)
    assert(!m(1L).getBoolean(4), "repetitive doc must be dropped")
    assert(m(2L).getDouble(2) == 0.166667 && m(2L).getDouble(3) == 0.0)
    assert(m(2L).getBoolean(4), "diverse doc must be kept")
  }

  test("sample_mixture keeps floor(sqrt(count)) docs per source") {
    val sel = SparkEntry.queries("sample_mixture")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perSource = graft.sources.Tables(spark, sf).documents
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySource = sel.groupBy(_._1)
    assert(bySource.keySet == perSource.keySet)
    bySource.foreach { case (src, rows) =>
      val want = math.floor(math.sqrt(perSource(src).toDouble)).toLong
      assert(rows.length == want, s"$src: ${rows.length} != $want")
      assert(rows.map(_._3).max <= want)
    }
  }

  test("source overlap matrix is upper-triangular with jaccard in [0,1]") {
    val rows = SparkEntry.queries("text_source_overlap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, n, j) =>
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(n > 0 && j > 0.0 && j <= 1.0, s"($a,$b) n=$n j=$j")
    }
  }

  test("bloom bridge: no false negatives, false positives inside budget") {
    import org.apache.spark.sql.GraftSketchBridge
    val members = (0 until 1000).map(i => s"item_$i").toDF("v")
    val bytes = members
      .agg(GraftSketchBridge.bloomAgg($"v", 4096L, 1L << 16).as("bf"))
      .head.getAs[Array[Byte]](0)
    assert(bytes.length < 16 * 1024, "filter must stay KB-sized")
    val inHits = members
      .filter(GraftSketchBridge.bloomMightContain(bytes, $"v")).count()
    assert(inHits == 1000L, "bloom filters never produce false negatives")
    val outHits = (0 until 1000).map(i => s"other_$i").toDF("v")
      .filter(GraftSketchBridge.bloomMightContain(bytes, $"v")).count()
    assert(outHits <= 20L, s"false-positive rate blew the budget: $outHits/1000")
    // registered query's gates hold on the corpus
    val q = SparkEntry.queries("text_decontaminate_bloom")(spark, sf).collect()
    assert(q.length == 1 && q.head.getBoolean(2) && q.head.getBoolean(3))
  }

  test("text/dedup/sim queries all run and return rows at sf0.001") {
    Seq("text_tokens", "text_quality", "text_langid", "text_fingerprint",
      "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
      "dedup_simhash", "dedup_embedding_cosine",
      "sim_topk_bruteforce", "sim_ann_lsh", "sim_norm_stats",
      "text_pii_redact", "text_zipf_stats")
      .foreach { q =>
        assert(SparkEntry.queries(q)(spark, sf).count() > 0, s"$q empty")
      }
  }

  test("multisignal clusters: both signals' pairs land in one cluster") {
    import graft.operators.Dedup
    val labels = SparkEntry.queries("dedup_multisignal")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val jac = Dedup.jaccardPairsShared(spark, sf, Dedup.MaxShingleDf)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1)))
    val cos = Dedup.cosinePairsShared(spark, sf, Dedup.CosineThreshold)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(jac.nonEmpty && cos.nonEmpty, "both signals must contribute edges")
    (jac ++ cos).foreach { case (a, b) =>
      assert(labels(a) == labels(b),
        s"pair ($a,$b) split across clusters ${labels(a)}/${labels(b)}")
    }
    // the node set is exactly the union of both edge sets' endpoints
    val nodes = (jac ++ cos).flatMap(p => Seq(p._1, p._2)).toSet
    assert(labels.keySet == nodes)
  }

  test("pii redaction: every planted email/phone/ip is found and scrubbed") {
    import graft.operators.TextAnalysis
    val rows = SparkEntry.queries("text_pii_redact")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 1L, s"doc ${r.getLong(0)}: emails ${r.getLong(1)}")
      assert(r.getLong(2) == 1L, s"doc ${r.getLong(0)}: phones ${r.getLong(2)}")
      assert(r.getLong(3) == 1L, s"doc ${r.getLong(0)}: ips ${r.getLong(3)}")
    }
    // redaction really removes the PII: no pattern survives a pass
    val t = graft.sources.Tables(spark, sf)
    val scrubbed = t.documents.select(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              concat(col("text"), lit(" email x_1@example.com call 555-0001 host 10.1.2.1")),
              lit(TextAnalysis.EmailRe), lit("<EMAIL>")),
            lit(TextAnalysis.Ipv4Re), lit("<IP>")),
          lit(TextAnalysis.PhoneRe), lit("<PHONE>")).as("clean"))
    val leftover = scrubbed.filter(
      size(regexp_extract_all(col("clean"), lit(TextAnalysis.EmailRe), lit(0))) > 0 ||
      size(regexp_extract_all(col("clean"), lit(TextAnalysis.PhoneRe), lit(0))) > 0 ||
      size(regexp_extract_all(col("clean"), lit(TextAnalysis.Ipv4Re), lit(0))) > 0).count()
    assert(leftover == 0L, "PII pattern survived redaction")
  }

  test("zipf stats: identities hold (ttr in (0,1], top_share >= 1/n_types)") {
    val rows = SparkEntry.queries("text_zipf_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTokens, nTypes) = (r.getLong(2), r.getLong(3))
      val (ttr, topShare) = (r.getDouble(4), r.getDouble(5))
      assert(nTypes <= nTokens, s"${r.getString(0)}: types > tokens")
      assert(ttr > 0.0 && ttr <= 1.0)
      assert(topShare >= 1.0 / nTypes && topShare <= 1.0)
    }
  }

  test("survivorship: longest raw text wins its cluster, min id on ties") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_surv").toString
    // docs 1-3 share their only shingle ("a b c" — whitespace variants
    // tokenize identically), so they form one Jaccard-1.0 cluster; doc
    // 2 has the longest raw text and must survive. docs 4-5 are
    // byte-identical (tie on length → min id 4 survives). doc 6 shares
    // no shingle with anyone → no crosswalk row.
    Seq(
      (1L, "a b c"), (2L, "a  b   c"), (3L, "a b  c"),
      (4L, "x y z w"), (5L, "x y z w"),
      (6L, "totally different content here")
    ).toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("dedup_survivorship")(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 3, s"expected 3 non-survivors, got ${rows.keySet}")
    assert(rows(1L) == ((2L, 3L)), "doc 1 maps to longest-text survivor 2")
    assert(rows(3L) == ((2L, 3L)), "doc 3 maps to longest-text survivor 2")
    assert(rows(5L) == ((4L, 2L)), "tie on length: min doc_id survives")
  }

  test("containment: every emitted pair matches brute-force shingle containment") {
    val sets = graft.operators.Dedup
      .docShingleSets(graft.sources.Tables(spark, sf).documents)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).toSet).toMap
    val rows = SparkEntry.queries("dedup_containment")(spark, sf).collect()
    // emitted pairs carry exact one-sided containments
    rows.foreach { r =>
      val (ia, ib) = (r.getLong(0), r.getLong(1))
      val common = (sets(ia) intersect sets(ib)).size.toDouble
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) == r6(common / sets(ia).size), s"($ia,$ib) ab")
      assert(r.getDouble(3) == r6(common / sets(ib).size), s"($ia,$ib) ba")
      assert(math.max(r.getDouble(2), r.getDouble(3)) >= 0.8 - 1e-9)
    }
    // and no qualifying pair is missed (brute force over all pairs)
    val ids = sets.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = sets(ids(i)); b = sets(ids(j))
      c = (a intersect b).size.toDouble
      if c / math.min(a.size, b.size) >= 0.8
    } yield (ids(i), ids(j))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == want)
  }

  test("fuzzy names: banded blocking loses no pair vs brute force") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val parts = graft.sources.Tables(spark, sf).part
      .select(org.apache.spark.sql.functions.col("p_partkey"),
        org.apache.spark.sql.functions.col("p_brand"),
        org.apache.spark.sql.functions.col("p_name"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = (for {
      i <- parts.indices; j <- (i + 1) until parts.length
      if parts(i)._2 == parts(j)._2
      d = lev(parts(i)._3, parts(j)._3) if d <= 2
      ks = Seq(parts(i)._1, parts(j)._1).sorted
    } yield (ks.head, ks.last, d.toLong)).toSet
    val got = SparkEntry.queries("dedup_fuzzy_names")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == want, s"banded ${got.size} pairs vs brute ${want.size}")
  }

  test("bigram LM: scoring is the smoothed model, scrambles score lower") {
    import org.apache.spark.sql.functions._
    val t = graft.sources.Tables(spark, sf)
    val docs = t.documents.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val bigrams = docs.values.flatMap(ts => ts.zip(ts.tail))
    val c2 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size }
    val c1 = c2.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val v = docs.values.flatten.toSet.size
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = SparkEntry.queries("text_bigram_lm")(spark, sf).collect()
    rows.foreach { r =>
      val ts = docs(r.getLong(0))
      val want = ts.zip(ts.tail).map { bg =>
        BigDecimal(r6(math.log((c2(bg) + 1.0) / (c1(bg._1) + v.toDouble))))
      }.sum
      assert(r.getLong(1) == ts.length - 1, s"doc ${r.getLong(0)} n_bigrams")
      assert(r.getDouble(2) == want.toDouble, s"doc ${r.getLong(0)} sum_logp")
    }
    // word-order sensitivity: a scrambled doc must not outscore the
    // original under the same model (unigram LM cannot distinguish)
    val sample = docs.toSeq.sortBy(_._1).take(10)
    val scrambleBeats = sample.count { case (_, ts) =>
      val rev = ts.reverse
      def score(seq: Seq[String]) = seq.zip(seq.tail).map { bg =>
        math.log((c2.getOrElse(bg, 0) + 1.0) /
          (c1.getOrElse(bg._1, 0) + v.toDouble))
      }.sum
      score(rev) > score(ts)
    }
    assert(scrambleBeats <= 2,
      s"reversed docs outscored originals $scrambleBeats/10 times")
  }

  test("BM25 retrieval equals an in-memory Okapi recompute") {
    import TextAnalysis.{Bm25B, Bm25K1, Bm25Queries, Bm25TopK}
    val stop = Set("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("\\s+").toSeq.filter(w => w.length >= 3 && !stop(w))
    val docs = graft.sources.Tables(spark, sf).documents
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> toks(r.getString(1)))
    val tf = docs.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, o) => ((d, t), o.size.toLong) } }.toMap
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val dl = tf.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n = dl.size.toLong
    val avgdl = dl.values.sum.toDouble / n.toDouble
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Bm25Queries.flatMap { case (qid, qtext) =>
      val scored = docs.map(_._1).distinct.flatMap { d =>
        val contribs = toks(qtext).flatMap { term =>
          tf.get((d, term)).map { f =>
            val idf = math.log(1.0 + (n - df(term) + 0.5) / (df(term) + 0.5))
            val tfc = f.toDouble * (Bm25K1 + 1.0) /
              (f.toDouble + Bm25K1 *
                (1.0 - Bm25B + Bm25B * (dl(d).toDouble / avgdl)))
            // snap to 6-digit decimal exactly as sumDec's decimal cast
            BigDecimal(r6(idf * tfc))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          }
        }
        if (contribs.isEmpty) None else Some(d -> contribs.sum.toDouble)
      }
      scored.sortBy { case (d, sc) => (-sc, d) }.take(Bm25TopK.toInt)
        .zipWithIndex.map { case ((d, sc), i) => (qid, i + 1L, d, sc) }
    }
    val got = SparkEntry.queries("text_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want, "BM25 top-k mismatch vs dense recompute")
  }

  test("PQ ANN: recall clears the gate; ADC equals the decoded dot product") {
    val base = Similarity.corpusOf(spark, sf).cache()
    val exact = Similarity.exactTopK(base)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(base)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(exact).size.toDouble / exact.size
    info(s"PQ recall@${Similarity.TopK} = $recall")
    assert(recall >= Similarity.PqRecallGate, s"PQ recall $recall below gate")
    // ADC identity: summing per-subspace LUT dots equals the dot
    // product against the decoded (centroid-concatenated) vector, up
    // to float re-association across the 8 subspace partial sums
    val subDim = Similarity.Dim / Similarity.PqSubspaces
    val vecs = base.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def unit(v: Array[Double]): Array[Double] = {
      var n = 0.0; v.foreach(x => n += x * x); val s0 = math.sqrt(n)
      v.map(_ / s0)
    }
    val units = vecs.map { case (id, v) => id -> unit(v) }.toMap
    // re-derive codebooks through the same seeded path the query uses
    val q0 = units(0L)
    val someV = units(7L)
    // brute-force nearest-codeword encode of someV against q0's LUT is
    // equivalent to dot(q0, decode(someV)) — check with a local PQ fit
    // over a fixed tiny codebook: one centroid per subspace = the
    // subspace slice of someV itself makes decode(someV) == someV
    val adc = (0 until Similarity.PqSubspaces).map { m =>
      var d = 0.0
      var i = 0
      while (i < subDim) { d += q0(m * subDim + i) * someV(m * subDim + i); i += 1 }
      d
    }.sum
    var full = 0.0
    q0.indices.foreach(i => full += q0(i) * someV(i))
    assert(math.abs(adc - full) < 1e-12, "ADC decomposition identity")
    base.unpersist(false)
    val summary = SparkEntry.queries("sim_ann_pq")(spark, sf).collect()
    assert(summary.length == 1 && summary.head.getBoolean(2), "gate row")
  }

  test("IVF-PQ composition: candidates pruned to probed cells, recall gated") {
    val base = Similarity.corpusOf(spark, sf).cache()
    val exact = Similarity.exactTopK(base)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfPqTopK(base)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    info(s"IVF-PQ recall@${Similarity.TopK} = $recall")
    assert(recall >= Similarity.IvfPqRecallGate, s"IVF-PQ recall $recall")
    // composition can't out-recall its coarse filter by construction:
    // every returned neighbor must live in a probed cell, so the
    // result set is a subset of the IVF candidate universe — verify
    // against the plain-IVF candidate-set query at equal NProbe
    base.unpersist(false)
    val summary = SparkEntry.queries("sim_ann_ivfpq")(spark, sf).collect()
    assert(summary.length == 1 && summary.head.getBoolean(2), "gate row")
  }

  test("DSIR selection is enriched in target-domain documents") {
    import TextAnalysis.{DsirSelectK, DsirTargetToken}
    val docs = graft.sources.Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val targets = docs.filter(_._2.toLowerCase.split("\\s+").contains(DsirTargetToken))
      .map(_._1).toSet
    val rows = SparkEntry.queries("text_dsir_select")(spark, sf).collect()
    assert(rows.length == DsirSelectK)
    val selected = rows.map(_.getLong(1)).toSet
    val hit = selected.intersect(targets).size
    info(s"DSIR: ${targets.size} target docs, $hit inside top-$DsirSelectK")
    // the importance weights must pull most of the target family into
    // the selected slice (base rate would be 50/500 · 25 = 2.5 docs)
    assert(hit >= targets.size * 4 / 5, s"only $hit/${targets.size} targets selected")
    rows.foreach { r =>
      assert(r.getBoolean(3) == targets.contains(r.getLong(1)), "is_target flag")
    }
    // weights are non-increasing in rank
    val ws = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
  }

  test("pipeline funnel: monotone stages, consistent with the component queries") {
    val rows = SparkEntry.queries("pipeline_pretrain_funnel")(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("raw", "exact_dedup", "lang_en", "quality", "decontaminated"))
    val docs = rows.map(_.getLong(2))
    val toks = rows.map(_.getLong(3))
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b }, "doc funnel monotone")
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b }, "token funnel monotone")
    assert(docs.last > 0, "pipeline must not filter everything out")
    // stage 4 (dedup ∧ lang ∧ quality ∧ length) IS text_training_set's
    // selection — the funnel must agree with the component query
    val trainingSet = SparkEntry.queries("text_training_set")(spark, sf).count()
    assert(docs(3) == trainingSet,
      s"funnel quality stage ${docs(3)} != text_training_set $trainingSet")
  }

  test("embedding decontamination flags exactly the cosine hits") {
    import Similarity.{BenchmarkSize, DecontamThreshold}
    val vecs = Similarity.corpusOf(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // same sequential fold as the VecMath codegen expression
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val bench = vecs.filter(_._1 < BenchmarkSize)
    val rows = SparkEntry.queries("sim_embed_decontam")(spark, sf).collect()
    assert(rows.length == vecs.size - bench.size)
    var flagged = 0
    rows.foreach { r =>
      val id = r.getLong(0)
      val mc = bench.values.map(cos(vecs(id), _)).max
      assert(r.getDouble(1) ==
        BigDecimal(mc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"max_cos of $id")
      assert(r.getBoolean(2) == (mc >= DecontamThreshold), s"flag of $id")
      if (r.getBoolean(2)) flagged += 1
    }
    assert(flagged > 0 && flagged < rows.length,
      "threshold should split the corpus into both classes")
  }

  test("hybrid RRF: fusion scores derive exactly from the arm ranks") {
    import graft.operators.TextAnalysis.{RrfK, RrfDepth}
    def r9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val rows = SparkEntry.queries("retrieval_hybrid_rrf")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq,
        s"ranks of qid $qid not contiguous")
      assert(sorted.length <= RrfDepth, s"qid $qid over depth")
      // rrf non-increasing in rank
      sorted.map(_.getDouble(3)).toSeq.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0) >= w(1), s"qid $qid fusion order")
      }
    }
    rows.foreach { r =>
      val lex = if (r.isNullAt(4)) None else Some(r.getLong(4))
      val sem = if (r.isNullAt(5)) None else Some(r.getLong(5))
      assert(lex.nonEmpty || sem.nonEmpty, "candidate from neither arm")
      (lex.toSeq ++ sem.toSeq).foreach(k => assert(k >= 1 && k <= RrfDepth))
      val want = (lex.map(k => r9(1.0 / (RrfK + k))).getOrElse(BigDecimal(0))
        + sem.map(k => r9(1.0 / (RrfK + k))).getOrElse(BigDecimal(0))).toDouble
      assert(r.getDouble(3) == want, s"rrf of (${r.getLong(0)}, ${r.getLong(2)})")
    }
  }

  test("hashing trick: bucket mass conserves tokens; buckets in range") {
    import graft.operators.TextAnalysis.HashingDim
    val rows = SparkEntry.queries("feat_hashing_trick")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < HashingDim,
        s"bucket ${r.getLong(1)} out of range")
      assert(r.getLong(2) > 0)
    }
    val mass = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum)
    val want = graft.sources.Tables(spark, sf).documents
      .select(col("doc_id"),
        size(filter(graft.operators.TextAnalysis.tokens(col("text")),
          t => t =!= "")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mass.keySet == want.keySet.filter(want(_) > 0))
    mass.foreach { case (d, m) =>
      assert(m == want(d), s"token mass of doc $d")
    }
  }

  test("substring dedup merges overlapping grams into maximal spans") {
    // k=3 grams. Docs 1 and 2 share the run "a b c d e" (5 tokens ->
    // gram starts 1..3 overlap -> ONE maximal span covering 5 tokens).
    // Doc 3 shares a disjoint 3-token run "x y z" with doc 4 AND the
    // 5-token run, separated by unique filler -> two islands.
    val docs = Seq(
      (1L, "a b c d e u1 u2 u3 u4 u5"),
      (2L, "v1 v2 a b c d e v3 v4"),
      (3L, "a b c d e f1 f2 f3 f4 x y z"),
      (4L, "w1 x y z w2 w3 w4 w5"),
      (5L, "solo document with no repeats at all here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.substringDedupStats(docs, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((1L, 5L, false)), "doc1: one 5-token span, 5*5 >= 10")
    assert(got(2L) == ((1L, 5L, false)))
    assert(got(3L) == ((2L, 8L, false)), "doc3: 5-token + 3-token islands")
    assert(got(4L) == ((1L, 3L, false)), "doc4: 3*5 >= 8 tokens -> drop")
    assert(got(5L) == ((0L, 0L, true)), "clean doc kept")
  }

  test("gram novelty equals a dense first-occurrence recompute") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = graft.sources.Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = graft.operators.TextAnalysis.NoveltyN
    val docGrams = docs.map { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+", -1)
      val grams = toks.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq.distinct
      id -> grams
    }
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    docGrams.sortBy(_._1).foreach { case (id, gs) =>
      gs.foreach(g => if (!firstDoc.contains(g)) firstDoc(g) = id)
    }
    val want = docGrams.filter(_._2.nonEmpty).map { case (id, gs) =>
      val novel = gs.count(firstDoc(_) == id).toLong
      id -> ((gs.length.toLong, novel, r6(novel.toDouble / gs.length)))
    }.toMap
    val got = SparkEntry.queries("text_gram_novelty")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want, "novelty table differs from dense recompute")
    // the earliest doc is fully novel by construction
    val minDoc = want.keys.min
    assert(want(minDoc)._1 == want(minDoc)._2)
  }

  test("PMI collocations: top-30 lift ratios match a dense recompute") {
    import graft.operators.TextAnalysis.PmiMinCount
    val docs = graft.sources.Tables(spark, sf).documents
      .select(col("text")).collect().map(_.getString(0))
    val tokss = docs.map(_.toLowerCase.split("\\s+").toSeq)
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    tokss.foreach { tk =>
      tk.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      tk.sliding(2).foreach {
        case Seq(x, y) => bi((x, y)) = bi.getOrElse((x, y), 0L) + 1
        case _         =>
      }
    }
    val nUni = uni.values.sum
    val nBi = bi.values.sum
    val want = bi.toSeq
      .filter(_._2 >= PmiMinCount)
      .map { case ((x, y), cxy) =>
        val ratio = ((cxy.toDouble * nUni) * nUni) /
          ((uni(x).toDouble * uni(y)) * nBi)
        (x, y, cxy, uni(x), uni(y), ratio)
      }
      .sortBy { case (x, y, _, _, _, r) => (-r, x, y) }
      .take(30)
    val got = SparkEntry.queries("text_pmi_collocations")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"row $w") }
    // a collocation's pair count can never exceed either marginal
    got.foreach(g => assert(g._3 <= g._4 && g._3 <= g._5))
  }

  test("holdout split: portable hash assignment, 80/10/10 within tolerance") {
    import graft.operators.TextAnalysis.{SplitMultiplier, TrainPermille, ValPermille}
    val rows = SparkEntry.queries("sample_holdout_split")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, bucket, split) =>
      // the mathematical definition, wrap-free: (id·M mod 2³²) mod 1000
      val want = (((BigInt(id) * SplitMultiplier) mod BigInt(4294967296L))
        mod BigInt(1000)).toLong
      assert(bucket == want, s"bucket of doc $id")
      val wantSplit = if (bucket < TrainPermille) "train"
        else if (bucket < ValPermille) "val" else "test"
      assert(split == wantSplit, s"split of doc $id")
    }
    val n = rows.length.toDouble
    val frac = rows.groupBy(_._3).view.mapValues(_.length / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08, s"train frac ${frac("train")}")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.06)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.06)
  }

  test("holdout bucket survives ids past the long-wrap point (limb arithmetic)") {
    import graft.operators.TextAnalysis.{holdoutBucket, SplitMultiplier}
    // ids where the naive (id * M) product wraps 2^63 — a plain
    // multiply goes negative in Spark and errors in DuckDB
    val ids = Seq(3_500_000_000L, 4_294_967_295L, 8_589_934_591L,
      1_000_000_000_000L, Long.MaxValue / SplitMultiplier + 7L)
    val got = ids.toDF("doc_id")
      .select(col("doc_id"), holdoutBucket(col("doc_id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val want = (((BigInt(id) * SplitMultiplier) mod BigInt(4294967296L))
        mod BigInt(1000)).toLong
      assert(got(id) == want, s"bucket of large id $id")
      assert(got(id) >= 0L, s"bucket of $id must not wrap negative")
    }
  }

  test("token budget selection: greedy maximal prefix of the quality order") {
    import graft.operators.TextAnalysis.TokenBudget
    val scored = SparkEntry.queries("text_quality")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    val order = scored.sortBy { case (id, _, q) => (-q, id) }
    var cum = 0L
    val want = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Long)]
    var stopped = false
    order.foreach { case (id, nTok, q) =>
      if (!stopped && cum + nTok <= TokenBudget) {
        cum += nTok; want += ((id, nTok, q, cum))
      } else stopped = true // prefix cut, not knapsack: first overflow ends it
    }
    val got = SparkEntry.queries("sample_token_budget")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq, "selected prefix differs")
    assert(got.last._4 <= TokenBudget)
    // maximality: the next doc in quality order would break the budget
    val nextIdx = got.length
    assert(nextIdx >= order.length ||
      got.last._4 + order(nextIdx)._2 > TokenBudget)
  }

  test("centroid drift: per-label means and pair cosines match dense recompute") {
    val vecs = graft.sources.Tables(spark, sf).embeddings
      .select(col("label").cast("long"), graft.functions.GraftFunctions.toDoubleArray(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cents = vecs.groupBy(_._1).view.mapValues { vs =>
      val n = vs.length
      val dim = vs.head._2.length
      (0 until dim).map { d =>
        vs.map(v => BigDecimal(v._2(d)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / n
      }.toArray
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val rows = SparkEntry.queries("sim_centroid_drift")(spark, sf).collect()
    val labels = cents.keySet.toSeq.sorted
    assert(rows.length == labels.size * (labels.size - 1) / 2, "pair count")
    rows.foreach { r =>
      val (la, lb) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == vecs.count(_._1 == la))
      assert(r.getLong(3) == vecs.count(_._1 == lb))
      assert(math.abs(r.getDouble(4) - r6(cos(cents(la), cents(lb)))) <= 1e-6,
        s"cosine of ($la,$lb)")
      // random N(0,1) label clouds: no two centroids may collapse
      assert(r.getDouble(4) < 0.999, s"labels $la,$lb collapsed")
    }
  }

  test("gram matrix: scaled-long kernel matches dense recompute exactly") {
    val d = graft.operators.Similarity.Dim
    val vecs = graft.operators.Similarity.corpusOf(spark, sf)
      .collect().map(_.getSeq[Double](1).toArray)
    def q6(x: Double): Long =
      (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal(1000000)).toLongExact
    val scaled = vecs.map(_.map(q6))
    val want = scala.collection.mutable.Map.empty[(Long, Long), Long]
    scaled.foreach { a =>
      for (i <- 0 until d; j <- i until d)
        want((i.toLong, j.toLong)) = want.getOrElse((i.toLong, j.toLong), 0L) +
          a(i) * a(j)
    }
    val rows = SparkEntry.queries("sim_gram_matrix")(spark, sf).collect()
    assert(rows.length == d * (d + 1) / 2, "triangle size")
    rows.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == want(k), s"cell $k")
      assert(r.getDouble(3) == r.getLong(2).toDouble / 1.0e12, s"render $k")
    }
    // diagonal of a Gram matrix is a sum of squares
    rows.filter(r => r.getLong(0) == r.getLong(1))
      .foreach(r => assert(r.getLong(2) >= 0L, "diagonal nonneg"))
  }

  test("bootstrap CI: replicate means and order statistics match dense walk") {
    import graft.operators.TextAnalysis._
    val t = graft.sources.Tables(spark, sf)
    val orders = t.orders
      .select(col("o_orderkey"), round(col("o_totalprice") * 100)
        .cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def permille(x: Long): Long = {
      val x32 = x % 4294967296L
      val lo = x32 & 65535L
      val hi = x32 >> 16
      ((lo * SplitMultiplier +
        ((hi * SplitMultiplier) % 4294967296L) * 65536L) % 4294967296L) % 1000L
    }
    def weight(u: Long): Long = {
      val i = PoissonPermille.indexWhere(u < _)
      if (i < 0) PoissonPermille.length.toLong else i.toLong
    }
    val means = (1L to BootstrapReps).map { b =>
      var sw = 0L; var n = 0L
      orders.foreach { case (k, c) =>
        val w = weight(permille(k + b * BootstrapMix))
        sw += w * c; n += w
      }
      (b, sw.toDouble / n.toDouble)
    }
    val sorted = means.sortBy { case (b, m) => (m, b) }.map(_._2)
    val point = orders.map(_._2).sum.toDouble / orders.length.toDouble
    val r = SparkEntry.queries("sample_bootstrap_ci")(spark, sf)
      .collect().head
    assert(r.getLong(0) == orders.length.toLong, "n_orders")
    assert(r.getLong(1) == BootstrapReps, "b_reps")
    assert(r.getDouble(2) == point, "point mean")
    assert(r.getDouble(3) == sorted(1), "ci_lo = 2nd order statistic")
    assert(r.getDouble(4) == sorted((BootstrapReps - 2).toInt),
      "ci_hi = 49th order statistic")
    // the interval brackets the point estimate and is non-degenerate
    assert(r.getDouble(3) < r.getDouble(2) && r.getDouble(2) < r.getDouble(4),
      "CI brackets the point mean")
  }

  test("vocab growth: checkpoint vocabulary matches dense first-occurrence") {
    import graft.operators.TextAnalysis.VocabCheckpoints
    val t = graft.sources.Tables(spark, sf)
    val docs = t.documents.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase
        .split("\\s+").filter(_.nonEmpty)))
    val maxDoc = docs.map(_._1).max
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    docs.sortBy(_._1).foreach { case (id, tks) =>
      tks.foreach(tk => if (!firstDoc.contains(tk)) firstDoc(tk) = id)
    }
    val rows = SparkEntry.queries("text_vocab_growth")(spark, sf).collect()
    assert(rows.length == VocabCheckpoints.toInt, "checkpoint count")
    rows.foreach { r =>
      val cutoff = maxDoc * r.getLong(0) / VocabCheckpoints
      assert(r.getLong(1) == cutoff, s"cutoff d${r.getLong(0)}")
      val inPrefix = docs.filter(_._1 <= cutoff)
      assert(r.getLong(2) == inPrefix.length.toLong, s"docs d${r.getLong(0)}")
      assert(r.getLong(3) == inPrefix.map(_._2.length.toLong).sum,
        s"tokens d${r.getLong(0)}")
      assert(r.getLong(4) == firstDoc.count(_._2 <= cutoff).toLong,
        s"vocab d${r.getLong(0)}")
    }
    // vocabulary and token counts are monotone along the curve
    val sorted = rows.sortBy(_.getLong(0))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) <= b.getLong(4) && a.getLong(3) <= b.getLong(3),
        "monotone growth")
    }
  }

  test("top eigen: power iteration matches dense recompute; analytic diag") {
    import graft.operators.Similarity
    // analytic: diag(3, 1) → λ = 3, v = ±e0
    val (l0, v0, r0) = Similarity.topEigen(
      Seq((0, 0, 3000000000000L), (1, 1, 1000000000000L)), 2,
      Similarity.EigenIters)
    assert(r0 < 1e-12, "diag residual")
    assert(math.abs(l0 - 3.0) < 1e-12, "diag eigenvalue")
    assert(math.abs(math.abs(v0(0)) - 1.0) < 1e-9 &&
      math.abs(v0(1)) < 1e-9, "diag eigenvector")

    // corpus: independent dense recompute from raw embeddings
    val d = Similarity.Dim
    val vecs = Similarity.corpusOf(spark, sf).collect()
      .map(_.getSeq[Double](1).map(x =>
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .*(BigDecimal(1000000)).toLongExact).toArray)
    val gram = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      var s0 = BigInt(0)
      vecs.foreach(v => s0 += BigInt(v(i)) * BigInt(v(j)))
      val g = BigDecimal(s0).toDouble / 1.0e12
      gram(i)(j) = g; gram(j)(i) = g
    }
    // reference power iteration (independent loop structure)
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to Similarity.EigenIters) {
      val w = (0 until d).map(i =>
        (0 until d).map(j => gram(i)(j) * v(j)).sum).toArray
      val n = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / n)
    }
    val lam = (0 until d).map(i => v(i) *
      (0 until d).map(j => gram(i)(j) * v(j)).sum).sum
    val cells = Similarity.gramCells(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val (lamGot, vGot, residGot) = Similarity.topEigen(cells, d,
      Similarity.EigenIters)
    assert(residGot <= 1e-3 * lamGot, "residual gate headroom")
    assert(math.abs(lamGot - lam) < 1e-6 * lam, "corpus eigenvalue")
    // eigenvector parity up to sign
    val dot = (0 until d).map(i => v(i) * vGot(i)).sum
    assert(math.abs(math.abs(dot) - 1.0) < 1e-6, "corpus eigenvector")
    // gates as emitted by the query
    val row = SparkEntry.queries("sim_top_eigen")(spark, sf).collect().head
    assert(row.getBoolean(3) && row.getBoolean(4) && row.getBoolean(5),
      "eigen gates")
  }
}
