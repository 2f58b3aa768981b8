package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables
import graft.functions.GraftFunctions._
import graft.plans.SimHash64.simhash64

/** Deduplication operators for training-data pipelines: exact,
  * MinHash-LSH, SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup.
  *
  * Scale design: every strategy is expressed as (1) a per-row column
  * computation (hashes/signatures — embarrassingly parallel, stays in
  * codegen except the simhash expression), then (2) a relational
  * candidate-pairing step that joins on a short key (hash, band
  * signature, LSH bucket) so the shuffle carries keys, not documents,
  * and no all-pairs product ever materializes. At 100 TB the band/
  * bucket join is the only shuffle and it is uniform by construction
  * (hash keys); verification joins fetch only candidate pairs.
  */
object Dedup {

  /** Distinct word-trigram shingles of a token-array column — the
    * custom codegen'd expression (graft.plans.WordShingles): one
    * primitive-loop eval per row, replacing the HOF lambda pipeline
    * whose per-element interpreted evaluation dominated the dedup
    * family's runtime.
    */
  def shinglesFromTokens(toks: Column): Column =
    graft.plans.WordShingles.wordShingles(toks, 3)

  /** doc_id + distinct shingle set per document. */
  def docShingleSets(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        shinglesFromTokens(split(lower(col("text")), "\\s+")).as("sh"))

  /** Convenience for specs: shingles of a raw text column. */
  def shingles(text: Column): Column = shinglesFromTokens(split(lower(text), "\\s+"))

  /** doc_id + exploded distinct shingles (the inverted-index input). */
  private def docShingles(docs: DataFrame): DataFrame =
    docShingleSets(docs)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))

  /** Exact dedup: group on the normalized-content hash, keep the
    * smallest doc_id as canonical. One shuffle on a 128-bit key.
    */
  val dedupExact = GraftQuery(
    "dedup_exact",
    (s, dir) => {
      val t = Tables(s, dir)
      val normalized = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      t.documents
        .select(md5(normalized.cast("binary")).as("content_hash"), col("doc_id"))
        .groupBy(col("content_hash"))
        .agg(min(col("doc_id")).as("canonical_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("canonical_doc_id"))
    },
    Some("""
      SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash,
             MIN(doc_id) AS canonical_doc_id,
             COUNT(*) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY canonical_doc_id
    """)
  )

  /** Max document frequency for a shingle to participate in candidate
    * generation. A shingle appearing in d documents contributes
    * O(d²) join pairs; without a cap one hot trigram ("of the and")
    * makes the inverted-index self-join quadratic on a single skewed
    * shuffle key. With the cap, candidate generation touches only
    * discriminative shingles; the exact-Jaccard arithmetic is then
    * RESTORED over the full sets (hot-array correction in
    * ngramJaccardPairs), so results are exact for every pair sharing
    * ≥ 1 sub-cap shingle.
    *
    * Known recall boundary, stated precisely: a pair ALL of whose
    * shared shingles are hot (each in > MaxShingleDf docs) never
    * surfaces. Such docs are pure boilerplate — every shared trigram
    * appears in >1000 documents — and their identical-copy subcase is
    * what dedup_exact (content-hash) catches upstream; the MinHash-LSH
    * path is also cap-free. On the gated corpora the cap never binds
    * (max shingle df at sf0.1 is ~25), so the oracle equivalence holds
    * trivially there; TextDedupSpec plants a hot shingle with a low
    * cap to exercise the capped path and its exact correction.
    */
  val MaxShingleDf = 1000

  /** Candidate pairing + exact Jaccard for n-gram shingle sets, with
    * the inverted-index self-join restricted to shingles whose
    * document frequency is ≤ dfCap. Common-shingle counts over the
    * rare index come from the join's own groupBy (one pass, map-side
    * combined); when hot shingles exist, the exact common count is
    * restored by intersecting the per-doc hot-shingle arrays (each
    * bounded by the number of globally hot shingles — tiny), applied
    * only to pairs whose upper-bound Jaccard clears the threshold.
    * `sets` must be the cached output of docShingleSets.
    */
  private[graft] def ngramJaccardPairs(sets: DataFrame, dfCap: Int): DataFrame = {
    val ds = sets.select(col("doc_id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("shingle"))
    // hot-shingle list (df > dfCap) is tiny by construction → broadcast
    val hot = ds.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select(col("shingle")).cache()
    val nHot = hot.count()
    if (nHot > 0)
      // loud diagnostic: when the df cap binds, the recall boundary in
      // the MaxShingleDf scaladoc is live — a pair ALL of whose shared
      // shingles are hot never surfaces, so an all-pairs oracle can
      // hash-mismatch here. Surface the cause by name instead of
      // letting it show up as an opaque t2 failure.
      System.err.println(
        s"[dedup] WARNING: $nHot shingle(s) exceed MaxShingleDf=$dfCap; " +
        "pairs whose shared shingles are ALL hot will not surface " +
        "(see Dedup.MaxShingleDf scaladoc). If this is an oracle-gated " +
        "corpus, expect divergence from the all-pairs oracle.")
    // cache the rare postings once: both self-join sides read them,
    // and without the pin each side re-runs the explode + anti-join
    val rare = ds.join(broadcast(hot), Seq("shingle"), "left_anti").cache()
    val a = rare.select(col("doc_id").as("ia"), col("n_sh").as("na"), col("shingle"))
    val b = rare.select(col("doc_id").as("ib"), col("n_sh").as("nb"), col("shingle"))
    val counted = a.join(b, Seq("shingle"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib"), col("na"), col("nb"))
      .agg(count(lit(1)).as("common_rare"))
    val scored =
      if (nHot == 0L) {
        counted.withColumn("common", col("common_rare").cast("double"))
      } else {
        // common ≤ min(common_rare + nHot, min(na, nb)) — prefilter on
        // that bound, then correct exactly with the hot arrays
        val cmax = least(col("common_rare") + lit(nHot.toDouble),
          least(col("na"), col("nb")).cast("double"))
        val docHot = ds.join(broadcast(hot), Seq("shingle"))
          .groupBy(col("doc_id")).agg(collect_list(col("shingle")).as("hot_sh"))
        val ha = docHot.select(col("doc_id").as("ia"), col("hot_sh").as("hot_a"))
        val hb = docHot.select(col("doc_id").as("ib"), col("hot_sh").as("hot_b"))
        counted
          .filter(cmax / (col("na") + col("nb") - cmax) >= 0.5)
          .join(ha, Seq("ia"), "left")
          .join(hb, Seq("ib"), "left")
          .withColumn("common", col("common_rare").cast("double") +
            size(array_intersect(
              coalesce(col("hot_a"), array().cast("array<string>")),
              coalesce(col("hot_b"), array().cast("array<string>")))))
      }
    val out = scored
      .withColumn("jaccard", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= 0.5)
      .select(col("ia"), col("ib"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("ia"), col("ib"))
    out.persist().count()
    hot.unpersist(false)
    rare.unpersist(false)
    out
  }

  /** Memoized Jaccard pair graph per (session, table dir, df cap):
    * the pair computation is the shared upstream of BOTH
    * dedup_ngram_jaccard (which emits the pairs) and dedup_clusters
    * (which closes them transitively). Computing it once and reusing
    * the persisted result is the composition a real pipeline runs —
    * "find the near-dup pairs, then cluster them" is one scan of the
    * pair graph, not two scans of the corpus. The cached frame is
    * persisted KB-sized pair output, never corpus data; if something
    * unpersists it, reuse degrades to recompute (correctness
    * unaffected).
    */
  // weak-session-keyed memos (shared [[graft.SessionMemo]] machinery)
  private val pairCache = graft.SessionMemo.ofFrame[(String, Int)]

  // CC labels over the shared Jaccard pair graph, memoized like the
  // pair graph itself: dedup_clusters and dedup_survivorship consume
  // the SAME fixpoint — one iterative computation per (session, dir)
  private val ccCache = graft.SessionMemo.ofFrame[(String, Int)]

  /** Memoized connected components of the shared ≥0.5-Jaccard pair
    * graph. The returned frame is cached for the session's life —
    * callers must NOT unpersist it.
    */
  private[graft] def jaccardClustersShared(
      s: org.apache.spark.sql.SparkSession, dir: String, dfCap: Int): DataFrame =
    ccCache.getOrBuild(s, (dir, dfCap)) {
      connectedComponents(jaccardPairsShared(s, dir, dfCap), "ia", "ib")
    }

  private[graft] def jaccardPairsShared(
      s: org.apache.spark.sql.SparkSession, dir: String, dfCap: Int): DataFrame =
    pairCache.getOrBuild(s, (dir, dfCap)) {
      // cache the SETS (pre-explode): exploding off the raw
      // projection would re-inline the tokenizer per generated row;
      // fanOut first or the tokenize+shingle kernel runs single-task
      val sets = docShingleSets(
        graft.functions.GraftFunctions.fanOut(Tables(s, dir).documents))
        .cache()
      // ngramJaccardPairs pins its (small) pair result; release the
      // big shingle cache once it has materialized
      val out = ngramJaccardPairs(sets, dfCap)
      sets.unpersist(false)
      out
    }

  /** N-gram Jaccard near-dup via shingle inverted index: explode
    * shingles, self-join on a document-frequency-capped shingle key
    * (see MaxShingleDf) to surface candidate pairs, then verify each
    * candidate with exact Jaccard over the full shingle sets. Never
    * builds an all-pairs product, and no single hot shingle can blow
    * up the join; the oracle (all-pairs formulation) proves the
    * pruning lossless at sf0.01.
    */
  val dedupNgramJaccard = GraftQuery(
    "dedup_ngram_jaccard",
    (s, dir) => jaccardPairsShared(s, dir, MaxShingleDf),
    Some("""
      WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(text), '\s+')) - 1, 1)),
                 i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                      string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
                      string_split_regex(lower(text), '\s+')[i+2])) AS s
        FROM documents)
      SELECT a.doc_id AS ia, b.doc_id AS ib,
             round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
      ORDER BY ia, ib
    """)
  )

  /** Number of MinHash permutations and LSH bands (4 rows of 4). */
  val MinHashK = 16
  val MinHashBands = 4

  /** MinHash signature columns: perm_i(doc) = min over shingles of
    * (a_i * h(shingle) + b_i mod p), h = murmur3 via Spark's hash().
    */
  private def minhashSignature(ds: DataFrame): DataFrame = {
    val p = 2147483647L // 2^31 - 1, Mersenne prime
    val perms = (0 until MinHashK).map { i =>
      val a = 1L + 2L * i // odd multipliers
      val b = 7919L * (i + 1)
      min(pmod(hash(col("shingle")).cast("long") * a + b, lit(p))).as(s"mh_$i")
    }
    ds.groupBy(col("doc_id")).agg(perms.head, perms.tail: _*)
  }

  /** MinHash + LSH banding: band key = struct of 4 consecutive
    * signature slots; docs sharing any band key become candidates;
    * candidates are verified with exact Jaccard over the full shingle
    * sets. `docSets` must be the cached output of docShingleSets; the
    * (small) pair result is pinned before returning.
    */
  def minhashLshPairs(docSets: DataFrame): DataFrame = {
    val ds = docSets.select(col("doc_id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("shingle"))
    val sig = minhashSignature(ds)
    // one aggregation pass; bands explode out of the signature row
    // (a 4-way union would re-aggregate the signature per branch)
    val rowsPerBand = MinHashK / MinHashBands
    val bandStructs = (0 until MinHashBands).map { b =>
      val slots = (0 until rowsPerBand).map(i => col(s"mh_${b * rowsPerBand + i}"))
      struct(lit(b).as("band"), hash(slots: _*).as("band_key"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
      .cache()
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib"))
      .distinct()
    // verify ONLY the candidates: join their shingle sets back and
    // compute exact jaccard with array intersection — the work is
    // O(|candidates|), not O(|pairs sharing a shingle|)
    val sa = docSets.select(col("doc_id").as("ia"), col("sh").as("sha"))
    val sb = docSets.select(col("doc_id").as("ib"), col("sh").as("shb"))
    val out = cand.join(sa, Seq("ia")).join(sb, Seq("ib"))
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("jaccard",
        col("common") / (size(col("sha")) + size(col("shb")) - col("common")))
      .filter(col("jaccard") >= 0.5)
      .select(col("ia"), col("ib"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("ia"), col("ib"))
    out.persist().count()
    bands.unpersist(false)
    out
  }

  /** Recall gate for the harness form — same 0.9 the spec pins. */
  val MinHashRecallGate = 0.9

  /** Oracle-checkable MinHash-LSH summary: the exact ≥ 0.5-Jaccard
    * pair count (SQL-expressible — the same all-pairs formulation as
    * dedup_ngram_jaccard's oracle) next to a Spark-computed recall
    * boolean of the LSH path against that exact set. The verified
    * pair list itself stays the operator output (`minhashLshPairs`);
    * the harness hashes this summary because LSH candidate
    * generation is engine-specific.
    */
  val dedupMinhashLsh = GraftQuery(
    "dedup_minhash_lsh",
    (s, dir) => {
      val t = Tables(s, dir)
      val docSets = docShingleSets(t.documents).cache()
      val found = minhashLshPairs(docSets)
      // truth comes from the SHARED memoized pair graph (also feeding
      // dedup_ngram_jaccard / dedup_clusters). Do not unpersist it —
      // Spark's cache manager is plan-based, so unpersisting an
      // equivalent plan would evict the shared entry under the
      // sibling queries
      val truth = jaccardPairsShared(s, dir, MaxShingleDf)
      docSets.unpersist(false)
      // verification filters found to jaccard ≥ 0.5 over the SAME
      // shingle sets, so found ⊆ truth; recall = |found| / |truth|
      val hits = found.select(col("ia"), col("ib"))
        .join(truth.select(col("ia"), col("ib")), Seq("ia", "ib"))
        .agg(count(lit(1)).as("hits"))
      val nTrue = truth.agg(count(lit(1)).as("n_true_pairs"))
      val out = nTrue.crossJoin(hits)
        .select(col("n_true_pairs"),
          (col("hits") >= col("n_true_pairs") * MinHashRecallGate).as("recall_ok"))
      out.persist().count()
      found.unpersist(false)
      out
    },
    Some("""
      WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(text), '\s+')) - 1, 1)),
                 i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                      string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
                      string_split_regex(lower(text), '\s+')[i+2])) AS s
        FROM documents),
      pairs AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs, TRUE AS recall_ok
      FROM pairs
    """)
  )

  /** Exact 16-bit band keys of a (doc_id, sh) signature frame. */
  private def simhashBands(docs: DataFrame): DataFrame =
    (0 until 4).map { b =>
      docs.select(col("doc_id"), col("sh"), lit(b).as("band"),
        shiftright(col("sh"), b * 16).bitwiseAND(0xffffL).as("band_key"))
    }.reduce(_ unionByName _)

  /** Candidate pairs within `maxHamming` of each other, via
    * MULTI-PROBE banding: one side indexes exact 16-bit band keys,
    * the probe side additionally emits every single-bit flip of each
    * band key (17 keys per band). A pair whose 64-bit signatures
    * differ by ≤ 1 bit inside ANY band then collides — by pigeonhole
    * over 4 bands, every pair with Hamming distance ≤ 7 is GUARANTEED
    * to surface (exact banding alone only guarantees ≤ 3); distance 8
    * can split 2+2+2+2 and needs luck. Candidates are verified with
    * the exact popcount. Probe fan-out is a fixed 17× on uniform hash
    * keys — no skew, linear cost. `sigs` should be cached by the
    * caller: both join sides derive from it (like ngramJaccardPairs'
    * `sets` contract).
    */
  private[graft] def simhashCandidates(
      sigs: DataFrame, maxHamming: Int): DataFrame = {
    val bands = simhashBands(sigs)
    val exact = bands
    val probeKeys = array(
      (col("band_key") +:
        (0 until 16).map(i => col("band_key").bitwiseXOR(lit(1L << i)))): _*)
    val probes = bands
      .select(col("doc_id"), col("sh"), col("band"),
        explode(probeKeys).as("band_key"))
    exact.as("x").join(probes.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash signatures of the documents table — the operator's
    * per-row column computation, shared by the query and specs.
    */
  def simhashSignatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), simhash64(split(lower(col("text")), "\\s+")).as("sh"))

  /** SimHash near-dup: 64-bit signature per doc via the custom
    * Catalyst expression, multi-probe banded (see simhashCandidates —
    * guaranteed recall through Hamming 7), verified by exact Hamming
    * distance. The harness form checks that structural guarantee
    * EXHAUSTIVELY: an all-pairs Hamming pass (the O(n²) oracle
    * baseline, same posture as embedding cosine's exact kernel — the
    * scale path is the banded join) must find no ≤ 7 pair the bands
    * missed, and the result is hashed against the corpus row count.
    * Signature semantics themselves are engine-specific →
    * TextDedupSpec pins planted near-dups + hamming bounds.
    */
  val dedupSimhash = GraftQuery(
    "dedup_simhash",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = simhashSignatures(t.documents).cache()
      val found = simhashCandidates(docs, maxHamming = 8)
      found.persist().count()
      val a = docs.select(col("doc_id").as("ia"), col("sh").as("ha"))
      val b = docs.select(col("doc_id").as("ib"), col("sh").as("hb"))
      val truth7 = a.join(broadcast(b), col("ia") < col("ib"))
        .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 7)
        .select(col("ia"), col("ib"))
      val missed = truth7
        .join(found.select(col("ia"), col("ib")), Seq("ia", "ib"), "left_anti")
        .agg(count(lit(1)).as("n_missed"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val out = nDocs.crossJoin(missed)
        .select(col("n_docs"), (col("n_missed") === 0).as("recall7_ok"))
      out.persist().count()
      docs.unpersist(false)
      found.unpersist(false)
      out
    },
    Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, TRUE AS recall7_ok
      FROM documents
    """)
  )

  /** Rows per block for the block-partitioned all-pairs kernel. A
    * task holds at most two blocks (~BlockRows × dim × 8 B ≈ 4 MB
    * each at dim 64) — per-task memory is constant in corpus size.
    */
  val BlockRows = 8192

  /** The ONE primitive upper-triangle cosine kernel: all (ida, idb,
    * cos) with cos ≥ threshold over an id-sorted array (so ida < idb
    * holds structurally). Shared by the same-block branch of the
    * blocked all-pairs kernel and Similarity's within-cell dedup —
    * any change to the arithmetic (zero-norm handling, accumulation
    * order, which matters for oracle parity) lands in both.
    */
  private[graft] def cosinePairsUpper(
      arr: Array[(Long, Array[Double])], threshold: Double
  ): scala.collection.mutable.ArrayBuffer[(Long, Long, Double)] = {
    val norms = arr.map { case (_, v) =>
      var s2 = 0.0; var i = 0
      while (i < v.length) { s2 += v(i) * v(i); i += 1 }
      math.sqrt(s2)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var i = 0
    while (i < arr.length) {
      val (ida, va) = arr(i)
      var j = i + 1
      while (j < arr.length) {
        val (idb, vb) = arr(j)
        var dot = 0.0; var k = 0
        while (k < va.length) { dot += va(k) * vb(k); k += 1 }
        val cos = dot / (norms(i) * norms(j))
        if (cos >= threshold) out += ((ida, idb, cos))
        j += 1
      }
      i += 1
    }
    out
  }

  /** Block-partitioned exact all-pairs cosine: assign vectors to
    * ceil(n/BlockRows) blocks, pack each block into one row, join a
    * driver-built (bx ≤ by) block-pair frame against the packed
    * blocks on block id, and run the O(|bx|·|by|) arithmetic as a
    * tight primitive loop per block pair. NOTHING is collected to or
    * broadcast from the driver — the corpus is shuffled once (to
    * pack blocks) and replicated B times across block pairs, which
    * is the information-theoretic minimum for exact all-pairs (every
    * vector must meet every other). Per-task memory stays ~2 blocks
    * regardless of corpus size. The shuffle-hash hints keep the
    * block frame out of a whole-corpus broadcast.
    */
  private[graft] def blockedCosinePairs(
      s: SparkSession, vecs: DataFrame, threshold: Double, blockRows: Int): DataFrame = {
    import s.implicits._
    val n = vecs.count()
    val nBlocks = math.max(1L, (n + blockRows - 1) / blockRows).toInt
    // splitmix64-style finalizer: block assignment must be uniform for
    // ARBITRARY id distributions (sparse/patterned ids under plain
    // modulo could pile many times blockRows rows into one residue
    // class, breaking the constant-per-task-memory guarantee)
    def blockOf(id: Long): Int = {
      var z = id + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      (((z % nBlocks) + nBlocks) % nBlocks).toInt
    }
    val packed = vecs.as[(Long, Array[Double])]
      .groupByKey { case (id, _) => blockOf(id) }
      .mapGroups { (bid, it) => (bid, it.toArray.sortBy(_._1)) }
      .toDF("bid", "rows")
      .cache()
    // B(B+1)/2 (bx, by) int pairs — block IDS on the driver, never data
    val blockPairs = (for { a <- 0 until nBlocks; b <- a until nBlocks } yield (a, b))
      .toDF("bx", "by")
    val joined = blockPairs
      .join(packed.select(col("bid").as("bx"), col("rows").as("rx")).hint("shuffle_hash"), Seq("bx"))
      .join(packed.select(col("bid").as("by"), col("rows").as("ry")).hint("shuffle_hash"), Seq("by"))
      .select(col("bx"), col("by"), col("rx"), col("ry"))
      .as[(Int, Int, Array[(Long, Array[Double])], Array[(Long, Array[Double])])]
    val pairs = joined.flatMap { case (bx, by, rx, ry) =>
      // same block: the shared upper-triangle kernel; cross block:
      // all pairs (each unordered vector pair lives in exactly one
      // bx≤by cell)
      if (bx == by) cosinePairsUpper(rx, threshold)
      else {
        val normsY = ry.map { case (_, v) =>
          var s2 = 0.0; var i = 0
          while (i < v.length) { s2 += v(i) * v(i); i += 1 }
          math.sqrt(s2)
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < rx.length) {
          val (ida, va) = rx(i)
          var na = 0.0
          var k = 0
          while (k < va.length) { na += va(k) * va(k); k += 1 }
          na = math.sqrt(na)
          var j = 0
          while (j < ry.length) {
            val (idb, vb) = ry(j)
            var dot = 0.0
            var k2 = 0
            while (k2 < va.length) { dot += va(k2) * vb(k2); k2 += 1 }
            val cos = dot / (na * normsY(j))
            if (cos >= threshold) {
              if (ida < idb) out += ((ida, idb, cos)) else out += ((idb, ida, cos))
            }
            j += 1
          }
          i += 1
        }
        out
      }
    }.toDF("ia", "ib", "cos")
    val res = pairs
      .select(col("ia"), col("ib"), round(col("cos"), 6).as("cos"))
      .orderBy(col("ia"), col("ib"))
    res.persist().count()
    packed.unpersist(false)
    res
  }

  /** Embedding-cosine near-dup candidates — exact all-pairs (the
    * oracle-checkable baseline; the sublinear scale path is
    * Similarity.simAnnLsh / simAnnIvf). Implemented with the
    * block-partitioned kernel above: no driver collect, no
    * whole-corpus broadcast, constant per-task memory. Threshold
    * 0.35 sits above the corpus' 99.9th-percentile background
    * similarity (calibrated on sf0.01).
    */
  /** Cosine threshold of the semantic near-dup edge set. */
  val CosineThreshold = 0.35

  /** Memoized semantic (embedding-cosine) pair graph per (session,
    * dir, threshold) — shared by dedup_embedding_cosine and
    * dedup_multisignal the same way [[jaccardPairsShared]] is shared
    * by the lexical queries.
    */
  // same weak identity keying as pairCache
  private val cosCache = graft.SessionMemo.ofFrame[(String, Double)]
  private[graft] def cosinePairsShared(
      s: org.apache.spark.sql.SparkSession, dir: String, threshold: Double): DataFrame =
    cosCache.getOrBuild(s, (dir, threshold)) {
      val vecs = Tables(s, dir).embeddings
        .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      blockedCosinePairs(s, vecs, threshold, BlockRows)
    }

  /** Live memoized frames (for the harness's is-this-shared check —
    * dedup_ngram_jaccard / dedup_embedding_cosine RETURN these frames
    * directly, and the harness must not unpersist them as output pins).
    */
  private[graft] def liveSharedFrames: Seq[org.apache.spark.sql.DataFrame] =
    pairCache.live ++ cosCache.live ++ ccCache.live

  /** Drop every memoized pair graph (unpersisting live entries).
    * Bench repeat mode calls this between timed runs so each run
    * measures the query cold instead of the memo hit. Session death
    * itself is handled by the weak keys. cc frames are
    * localCheckpoint'd (unpersist is a no-op) but the memo entry must
    * go too, or a rebuild would reuse labels derived from the dropped
    * pair graph's timing run.
    */
  def clearSharedCaches(): Unit = {
    pairCache.clear()
    cosCache.clear()
    ccCache.clear()
  }

  val dedupEmbeddingCosine = GraftQuery(
    "dedup_embedding_cosine",
    (s, dir) => cosinePairsShared(s, dir, CosineThreshold),
    Some("""
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 6) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])) >= 0.35
      ORDER BY ia, ib
    """)
  )

  /** Distributed connected components: minimum-label propagation with
    * POINTER JUMPING. Labels start as node ids; each round (1) flows
    * the min label along edges (one equi-join + one map-side-combined
    * min aggregation on uniform keys), then (2) shortcuts every label
    * through its own label (`label(x) ← label(label(x))` — one more
    * equi-join). Propagation alone needs diameter rounds; the jump
    * doubles the distance a min has travelled each round, so chains
    * converge in O(log diameter) rounds — the shape that holds when a
    * boilerplate-linked dup chain spans thousands of docs. Labels are
    * monotonically non-increasing (a node's label is always ≤ its id,
    * so the shortcut can only decrease), hence the strictly-decreasing
    * label sum detects the fixpoint with no second join.
    */
  private[graft] def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 50
  ): DataFrame = connectedComponentsWithStats(edges, srcCol, dstCol, maxIter)._1

  /** As [[connectedComponents]], returning (labels, rounds, converged)
    * so callers and specs can observe the round count. Exhausting
    * `maxIter` without convergence would silently emit wrong
    * (unconverged) labels — fail loudly instead.
    */
  private[graft] def connectedComponentsWithStats(
      edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 50
  ): (DataFrame, Int, Boolean) = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .distinct().cache()
    // seed with min(self, neighbors) — the first propagation round as
    // one aggregation, no join (identity labels make the join a no-op)
    var labels = sym.groupBy(col("a")).agg(min(col("b")).as("nb"))
      .select(col("a").as("node"), least(col("a"), col("nb")).as("label"))
      .cache()
    // empty graph: sum(label) below would be null — return the empty
    // (node, label) frame directly
    if (labels.isEmpty) { sym.unpersist(false); return (labels, 0, true) }
    // one action per round (the label-sum aggregate materializes the
    // cache as a side effect); labels only ever decrease, so an
    // unchanged sum IS the fixpoint. AQE right-sizes each round's
    // shuffles — dedup pair graphs are tiny next to the corpus.
    var prevSum = -1L
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val cur = labels.toDF("node", "label")
      val msgs = sym.join(cur, sym("a") === cur("node"))
        .select(col("b").as("node"), col("label"))
      // eager localCheckpoint, twice a round, instead of cache:
      // (1) the jump self-join references `prop` twice, so without
      // lineage truncation the logical plan QUADRUPLES per round —
      // O(4^rounds) plan nodes OOM the driver on plan stringification
      // alone; (2) checkpointing `prop` first makes the self-joined
      // subtree a flat LogicalRDD, keeping the unions out of it
      // (Catalyst's union constraint rewrite trips on the duplicate
      // attribute ids a self-joined union subtree produces).
      val prop = msgs.union(cur.select(col("node"), col("label")))
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      // pointer jump: label(x) ← label(label(x)). Every label IS a
      // node id present in `prop` (labels only ever hold node ids and
      // every node has a row), so the lookup always hits; left join +
      // coalesce keeps the frame total regardless.
      val p2 = prop.toDF("jn", "jl")
      val next = prop
        .join(p2, col("label") === col("jn"), "left")
        .select(col("node"), coalesce(col("jl"), col("label")).as("label"))
        .localCheckpoint(true)
      val nextSum = next.agg(sum(col("label"))).first().getLong(0)
      labels.unpersist(false)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    sym.unpersist(false)
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
      "labels would be silently wrong; raise maxIter (rounds grow " +
      "~log2(component diameter) with pointer jumping)")
    (labels, iter, converged)
  }

  /** Near-dup cluster assignment: connected components over the
    * n-gram-Jaccard pair graph — the step that turns pairwise dedup
    * verdicts into canonical-document groups (transitive closure:
    * A≈B and B≈C cluster A,B,C together even when A,C were never
    * compared). Oracle: DuckDB recursive CTE over the same pair
    * graph.
    */
  val dedupClusters = GraftQuery(
    "dedup_clusters",
    (s, dir) => {
      // shared upstream with dedup_ngram_jaccard/dedup_survivorship:
      // pair graph AND its CC labels are computed once per (session,
      // dir) and reused persisted — do NOT unpersist either
      val cc = jaccardClustersShared(s, dir, MaxShingleDf)
      val out = cc
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
        .orderBy(col("doc_id"))
      out.persist().count()
      out
    },
    Some("""
      WITH RECURSIVE sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(text), '\s+')) - 1, 1)),
                 i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                      string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
                      string_split_regex(lower(text), '\s+')[i+2])) AS s
        FROM documents),
      p AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
      e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
      reach(node, label) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM e) t
        UNION
        SELECT e.b, r.label FROM reach r JOIN e ON e.a = r.node)
      SELECT node AS doc_id, MIN(label) AS cluster_id
      FROM reach GROUP BY node ORDER BY doc_id
    """)
  )

  /** Multi-signal dedup: a document pair is near-dup if EITHER the
    * lexical signal (n-gram Jaccard ≥ 0.5) OR the semantic signal
    * (embedding cosine ≥ 0.35, vec_id ≡ doc_id) fires — the
    * production composition, since boilerplate rewrites dodge lexical
    * matching and translated/templated text dodges embedding
    * matching. The union graph is transitively closed with the same
    * pointer-jumping components; BOTH edge sets come from the shared
    * memoized pair graphs, so composed with their base queries this
    * adds one union + one CC, not two more corpus scans. Oracle:
    * DuckDB recursive CTE over the union of both pair predicates.
    */
  val dedupMultisignal = GraftQuery(
    "dedup_multisignal",
    (s, dir) => {
      val jac = jaccardPairsShared(s, dir, MaxShingleDf)
        .select(col("ia"), col("ib"))
      val cos = cosinePairsShared(s, dir, CosineThreshold)
        .select(col("ia"), col("ib"))
      val edges = jac.union(cos).distinct()
      val cc = connectedComponents(edges, "ia", "ib")
      val out = cc
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
        .orderBy(col("doc_id"))
      out.persist().count()
      cc.unpersist(false)
      out
    },
    Some("""
      WITH RECURSIVE sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(text), '\s+')) - 1, 1)),
                 i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                      string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
                      string_split_regex(lower(text), '\s+')[i+2])) AS s
        FROM documents),
      jp AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
      cp AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.35),
      p AS (SELECT ia, ib FROM jp UNION SELECT ia, ib FROM cp),
      e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
      reach(node, label) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM e) t
        UNION
        SELECT e.b, r.label FROM reach r JOIN e ON e.a = r.node)
      SELECT node AS doc_id, MIN(label) AS cluster_id
      FROM reach GROUP BY node ORDER BY doc_id
    """)
  )

  /** Survivorship (canonical record selection): within each NEAR-DUP
    * cluster (connected components over the ≥0.5-Jaccard shingle pair
    * graph — dedup_clusters' groups), keep the record the survivorship
    * RULE picks rather than blindly the min id: longest raw text wins,
    * doc_id ascending breaks ties. The output is the master-data
    * crosswalk — one row per NON-surviving duplicate mapping it to its
    * canonical survivor — which is what a downstream pipeline joins
    * against to rewrite references. (Keyed on the cluster graph, not
    * the exact-content hash: the test corpora contain near-dups but
    * zero byte-identical ones, and the exact case is this one with a
    * degenerate pair graph.)
    *
    * Scale shape: the pair graph and CC labels are the shared frames
    * the sibling dedup queries already materialize; on top of them the
    * rule is a per-cluster max_by over (length, −doc_id) — one
    * struct-max aggregation, no window — and the crosswalk join back
    * reuses the cluster-id partitioning.
    */
  val dedupSurvivorship = GraftQuery(
    "dedup_survivorship",
    (s, dir) => {
      val t = Tables(s, dir)
      val cc = jaccardClustersShared(s, dir, MaxShingleDf)
      val lens = t.documents
        .select(col("doc_id"), length(col("text")).cast("long").as("n_len"))
      val labeled = cc
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
        .join(lens, Seq("doc_id"))
      // survivor per cluster: max over (n_len asc, doc_id desc) ⇒ the
      // longest text, smallest doc_id on ties — one struct-max agg
      val survivors = labeled
        .groupBy(col("cluster_id"))
        .agg(
          max(struct(col("n_len"), (-col("doc_id")).as("neg_id"))).as("best"),
          count(lit(1)).as("n_members"))
        .select(col("cluster_id"), (-col("best.neg_id")).as("survivor_id"),
          col("n_members"))
      val out = labeled.join(survivors, Seq("cluster_id"))
        .filter(col("doc_id") =!= col("survivor_id"))
        .select(col("doc_id").as("duplicate_id"), col("survivor_id"),
          col("n_members"))
        .orderBy(col("duplicate_id"))
      out.persist().count()
      out
    },
    Some("""
      WITH RECURSIVE sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(text), '\s+')) - 1, 1)),
                 i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                      string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
                      string_split_regex(lower(text), '\s+')[i+2])) AS s
        FROM documents),
      p AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
      e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
      reach(node, label) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM e) t
        UNION
        SELECT e.b, r.label FROM reach r JOIN e ON e.a = r.node),
      clusters AS (
        SELECT node AS doc_id, MIN(label) AS cluster_id
        FROM reach GROUP BY node),
      labeled AS (
        SELECT c.doc_id, c.cluster_id, CAST(length(d.text) AS BIGINT) AS n_len
        FROM clusters c JOIN documents d ON c.doc_id = d.doc_id),
      survivors AS (
        SELECT cluster_id,
               (array_agg(doc_id ORDER BY n_len DESC, doc_id))[1] AS survivor_id,
               COUNT(*) AS n_members
        FROM labeled GROUP BY cluster_id)
      SELECT lb.doc_id AS duplicate_id, s.survivor_id, s.n_members
      FROM labeled lb JOIN survivors s ON lb.cluster_id = s.cluster_id
      WHERE lb.doc_id <> s.survivor_id
      ORDER BY duplicate_id
    """)
  )

  /** Containment threshold for dedup_containment. */
  val ContainmentMin = 0.8

  /** Shingle-containment near-dup: pairs where one document's shingle
    * set is ≥80% inside the other's — the SUPERSET/quote/expansion
    * relation a symmetric Jaccard threshold structurally misses (a
    * 100-shingle doc embedded in a 10000-shingle doc has Jaccard
    * ≈ 0.01 but containment 1.0). This is the dedup rule that
    * catches boilerplate-wrapped reposts and doc-in-doc quoting in a
    * training corpus.
    *
    * Same inverted-index shape as [[ngramJaccardPairs]]: explode
    * shingles, df-cap the join key (one hot shingle cannot create a
    * quadratic product — same warning when the cap binds), count
    * shared shingles per candidate pair, keep pairs whose
    * common/min(n_a, n_b) clears the threshold. The hot-shingle
    * prefilter bound uses min-side containment — valid for both
    * directions — and the exact hot-array correction restores
    * losslessness, mirroring the Jaccard path.
    */
  val dedupContainment = GraftQuery(
    "dedup_containment",
    (s, dir) => {
      val sets = docShingleSets(Tables(s, dir).documents).cache()
      val ds = sets.select(col("doc_id"), size(col("sh")).as("n_sh"),
        explode(col("sh")).as("shingle"))
      val dfCap = MaxShingleDf
      val hot = ds.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") > dfCap).select(col("shingle")).cache()
      val nHot = hot.count()
      if (nHot > 0)
        System.err.println(
          s"[dedup] WARNING: $nHot shingle(s) exceed MaxShingleDf=$dfCap; " +
          "containment pairs whose shared shingles are ALL hot will not " +
          "surface (see Dedup.MaxShingleDf scaladoc).")
      val rare = ds.join(broadcast(hot), Seq("shingle"), "left_anti")
      val a = rare.select(col("doc_id").as("ia"), col("n_sh").as("na"), col("shingle"))
      val b = rare.select(col("doc_id").as("ib"), col("n_sh").as("nb"), col("shingle"))
      val counted = a.join(b, Seq("shingle"))
        .filter(col("ia") < col("ib"))
        .groupBy(col("ia"), col("ib"), col("na"), col("nb"))
        .agg(count(lit(1)).as("common_rare"))
      val scored =
        if (nHot == 0L) counted.withColumn("common", col("common_rare").cast("double"))
        else {
          val cmax = least(col("common_rare") + lit(nHot.toDouble),
            least(col("na"), col("nb")).cast("double"))
          val docHot = ds.join(broadcast(hot), Seq("shingle"))
            .groupBy(col("doc_id")).agg(collect_list(col("shingle")).as("hot_sh"))
          counted
            .filter(cmax / least(col("na"), col("nb")) >= ContainmentMin)
            .join(docHot.select(col("doc_id").as("ia"), col("hot_sh").as("hot_a")),
              Seq("ia"), "left")
            .join(docHot.select(col("doc_id").as("ib"), col("hot_sh").as("hot_b")),
              Seq("ib"), "left")
            .withColumn("common", col("common_rare").cast("double") +
              size(array_intersect(
                coalesce(col("hot_a"), array().cast("array<string>")),
                coalesce(col("hot_b"), array().cast("array<string>")))))
        }
      val out = scored
        .withColumn("containment",
          col("common") / least(col("na"), col("nb")).cast("double"))
        .filter(col("containment") >= ContainmentMin)
        .select(col("ia"), col("ib"),
          round(col("common") / col("na"), 6).as("containment_ab"),
          round(col("common") / col("nb"), 6).as("containment_ba"))
        .orderBy(col("ia"), col("ib"))
      out.persist().count()
      sets.unpersist(false)
      hot.unpersist(false)
      out
    },
    Some("""
      WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(text), '\s+')) - 1, 1)),
                 i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                      string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
                      string_split_regex(lower(text), '\s+')[i+2])) AS s
        FROM documents)
      SELECT a.doc_id AS ia, b.doc_id AS ib,
             round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s), 6)
               AS containment_ab,
             round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(b.s), 6)
               AS containment_ba
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / least(len(a.s), len(b.s)) >= 0.8
      ORDER BY ia, ib
    """)
  )

  /** Fuzzy record linkage: part names within edit distance ≤ 2 of each
    * other inside the same brand — the entity-resolution primitive
    * (typo'd product feeds, OCR'd catalogs) that token-set dedup
    * misses because ONE character edit changes the whole token.
    *
    * Scale design — compound blocking, no all-pairs product: the join
    * key is (brand, ⌊len/3⌋), with the right side exploded to its
    * three neighbor length bands. Lossless: dist ≤ 2 ⇒ |len_a−len_b|
    * ≤ 2 < 3 ⇒ bands differ by ≤ 1, and each qualifying pair meets on
    * exactly ONE key (a's own band), so no dedup pass is needed. The
    * cheap |len diff| ≤ 2 guard runs before the O(len²) levenshtein
    * (both codegen'd built-ins). Blocking on brand alone would give
    * |brands| reducers at 100 TB; the length band multiplies the key
    * domain, and any higher-cardinality trusted attribute composes
    * the same way. The DuckDB oracle is the plain quadratic
    * within-brand join — proving the banded plan loses no pair.
    */
  val dedupFuzzyNames = GraftQuery(
    "dedup_fuzzy_names",
    (s, dir) => {
      val t = Tables(s, dir)
      val base = t.part.select(col("p_partkey"), col("p_brand"), col("p_name"))
        .withColumn("len", length(col("p_name")))
      // fan the probe side out across the cluster (fanOut: at sf0.1
      // `part` is ONE parquet split, so without this the entire
      // blocks' cross-product — 6.9M candidate pairs, every
      // levenshtein — runs in a single task; measured 3.7s vs 0.5s
      // for the join+kernel stage)
      val a = graft.functions.GraftFunctions.fanOut(base)
        .select(col("p_partkey").as("ia"), col("p_brand"),
        col("p_name").as("na"), col("len").as("la"),
        (col("len") / 3).cast("long").as("band"))
      val b = base.select(col("p_partkey").as("ib"), col("p_brand"),
        col("p_name").as("nb"), col("len").as("lb"))
        .withColumn("band", explode(array(
          (col("lb") / 3).cast("long") - 1,
          (col("lb") / 3).cast("long"),
          (col("lb") / 3).cast("long") + 1)))
      // thresholded levenshtein (banded DP, O(len·k) with early
      // abandon, -1 when above the bound) computed ONCE in its own
      // projection — the candidate volume is the blocks' cross
      // product, so the per-pair kernel cost is the whole query.
      // MaterializeOnce fences the kernel: without it Catalyst pushes
      // the `dist >= 0` predicate into the join condition and the
      // kernel runs TWICE per candidate pair (the round-7 regression).
      // broadcast(b) PINS the build side: the fan-out above only helps
      // while `a` is the streamed side, and with both sides under the
      // auto threshold an estimator flip would silently re-serialize
      // the kernel onto b's single split.
      a.join(broadcast(b), Seq("p_brand", "band"))
        .filter(col("ia") < col("ib") && abs(col("la") - col("lb")) <= 2)
        .select(col("ia"), col("ib"), col("p_brand"),
          graft.plans.MaterializeOnce(
            levenshtein(col("na"), col("nb"), 2).cast("long")).as("dist"))
        .filter(col("dist") >= 0)
        .orderBy(col("ia"), col("ib"))
    },
    Some("""
      SELECT a.p_partkey AS ia, b.p_partkey AS ib, a.p_brand,
             CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 2
      ORDER BY ia, ib
    """)
  )

  /** Modulo split standing in for the arrival boundary: docs with
    * `doc_id % IncrMod == IncrRem` are "today's crawl increment", the
    * rest are the existing corpus.
    */
  val IncrMod = 5
  val IncrRem = 4

  /** Incremental dedup — the shape a DAILY ingest actually runs: a
    * small increment screened against the standing corpus, never
    * corpus-vs-corpus. Each increment doc gets a verdict with
    * precedence exact > near > new:
    *   - `exact_dup`: normalized-content hash already in the corpus
    *     (semi-join on a 128-bit key; at scale the increment's hash
    *     set is the BROADCAST side — the corpus is never shuffled);
    *   - `near_dup`: shares a ≥ 0.5-Jaccard shingle pair with a
    *     corpus doc. Here the pair frame is the memoized shared
    *     Jaccard graph (same frame dedup_ngram_jaccard/clusters
    *     consume — compose-don't-recompute), filtered to cross-split
    *     pairs; at 100 TB the same semantics run DIRECTIONALLY —
    *     increment shingles probe the standing inverted index, so
    *     per-day cost is O(increment), not O(corpus);
    *   - `new`: neither — admitted to the corpus.
    */
  val dedupIncremental = GraftQuery(
    "dedup_incremental",
    (s, dir) => {
      val t = Tables(s, dir)
      val isInc = col("doc_id") % IncrMod === IncrRem
      val normalized = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      val hashed = t.documents
        .select(col("doc_id"), md5(normalized.cast("binary")).as("h"))
      val corpusHashes = hashed.filter(!isInc).select(col("h")).distinct()
      val exactDup = hashed.filter(isInc)
        .join(corpusHashes, Seq("h"), "left_semi")
        .select(col("doc_id"))
      val pairs = jaccardPairsShared(s, dir, MaxShingleDf)
      val nearIds = pairs
        .select(col("ia"), col("ib"),
          (col("ia") % IncrMod === IncrRem).as("a_inc"),
          (col("ib") % IncrMod === IncrRem).as("b_inc"))
        .filter(col("a_inc") =!= col("b_inc"))
        .select(when(col("a_inc"), col("ia")).otherwise(col("ib")).as("doc_id"))
        .distinct()
      t.documents.filter(isInc)
        .select(col("doc_id"))
        .join(exactDup.withColumn("is_exact", lit(true)), Seq("doc_id"), "left")
        .join(nearIds.withColumn("is_near", lit(true)), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("is_exact"), lit("exact_dup"))
            .when(col("is_near"), lit("near_dup"))
            .otherwise(lit("new")).as("status"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH h AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
        FROM documents),
      corpus_h AS (
        SELECT DISTINCT h FROM h WHERE doc_id % $IncrMod <> $IncrRem),
      sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(text), '\\s+')) - 1, 1)),
                 i -> string_split_regex(lower(text), '\\s+')[i] || ' ' ||
                      string_split_regex(lower(text), '\\s+')[i+1] || ' ' ||
                      string_split_regex(lower(text), '\\s+')[i+2])) AS s
        FROM documents),
      near AS (
        SELECT DISTINCT i.doc_id
        FROM sh i JOIN sh c
          ON i.doc_id % $IncrMod = $IncrRem
         AND c.doc_id % $IncrMod <> $IncrRem
         AND CAST(len(list_intersect(i.s, c.s)) AS DOUBLE)
               / (len(i.s) + len(c.s) - len(list_intersect(i.s, c.s))) >= 0.5)
      SELECT d.doc_id,
             CASE WHEN eh.h IS NOT NULL THEN 'exact_dup'
                  WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
                  ELSE 'new' END AS status
      FROM documents d
      JOIN h ON h.doc_id = d.doc_id
      LEFT JOIN corpus_h eh ON eh.h = h.h
      LEFT JOIN near nr ON nr.doc_id = d.doc_id
      WHERE d.doc_id % $IncrMod = $IncrRem
      ORDER BY d.doc_id
    """)
  )

  /** Absolute distinct-token overlap threshold for the prefix-filter
    * set-similarity join. The fixture corpus is degenerately similar
    * (docs hold ~25-31 distinct tokens of a tiny pool, so at
    * overlap ≥ 28 HALF A MILLION pairs qualify at sf0.1 — the output
    * itself is the cost, not the algorithm); 30 selects the
    * near-identical tail (~35k pairs at sf0.1, 437 at sf0.01, all
    * sitting exactly at the threshold — which pins the prefix-length
    * off-by-one). The ALGORITHM is threshold-agnostic.
    */
  val SetSimOverlap = 30

  /** Set-similarity self-join by PREFIX FILTERING (the ppjoin/AllPairs
    * candidate rule, Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08):
    * pairs of documents whose DISTINCT-token sets share at least
    * [[SetSimOverlap]] tokens. Tokens get a global total order by
    * ascending document frequency (rarest first); a document of set
    * size s only indexes its first `s − O + 1` tokens in that order —
    * the prefix — because two sets with |x∩y| ≥ O MUST share a token
    * inside both prefixes (pigeonhole on the sorted tails). The
    * inverted index therefore carries a few tokens per document
    * instead of all of them, candidate generation joins on the RARE
    * end of the vocabulary (small postings by construction), and the
    * exact overlap is verified only for candidates via one
    * array_intersect over the paired token sets. This is the third
    * candidate-pruning family in the dedup module, orthogonal to
    * LSH banding (probabilistic) and the df-capped shingle index
    * (frequency cutoff): prefix filtering is EXACT — no recall gate
    * needed, the oracle is the full all-pairs co-occurrence count.
    * The pigeonhole argument needs only that every document sorts
    * its tokens by the SAME total order — the (df, tok) tuple itself
    * is that order, so no global rank is ever materialized: the
    * per-token df broadcasts and each document's per-doc window
    * sorts by it locally (no vocabulary-wide ordered window).
    */
  val dedupSetsimPrefix = GraftQuery(
    "dedup_setsim_prefix",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val O = SetSimOverlap
      val t = Tables(s, dir)
      val tset = array_distinct(
        filter(split(lower(col("text")), "\\s+"), x => x =!= ""))
      val docs = t.documents
        .select(col("doc_id"), tset.as("tset"))
        .select(col("doc_id"), col("tset"),
          size(col("tset")).cast("long").as("sz"))
        .where(col("sz") >= O)
        .cache()
      val tokDf = docs.select(explode(col("tset")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val wDoc = Window.partitionBy(col("doc_id"))
        .orderBy(col("df"), col("tok"))
      val prefix = docs
        .select(col("doc_id"), col("sz"), explode(col("tset")).as("tok"))
        .join(broadcast(tokDf), Seq("tok"))
        .withColumn("pos", row_number().over(wDoc))
        .where(col("pos") <= col("sz") - (O - 1))
        .select(col("doc_id"), col("tok"))
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
        .distinct()
      val out = cand
        .join(docs.select(col("doc_id").as("ia"), col("tset").as("ta")), Seq("ia"))
        .join(docs.select(col("doc_id").as("ib"), col("tset").as("tb")), Seq("ib"))
        .select(col("ia"), col("ib"),
          size(array_intersect(col("ta"), col("tb"))).cast("long").as("overlap"))
        .where(col("overlap") >= O)
        .orderBy(col("ia"), col("ib"))
      out.persist().count()
      docs.unpersist(false)
      out
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id,
               unnest(list_filter(
                 list_distinct(string_split_regex(lower(text), '\\s+')),
                 x -> x <> '')) AS tok
        FROM documents),
      p AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS overlap
        FROM d a JOIN d b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT ia, ib, overlap FROM p
      WHERE overlap >= $SetSimOverlap
      ORDER BY ia, ib
    """)
  )

  def all: Seq[GraftQuery] = Seq(
    dedupExact, dedupNgramJaccard, dedupMinhashLsh, dedupSimhash,
    dedupEmbeddingCosine, dedupClusters, dedupMultisignal, dedupSurvivorship,
    dedupContainment, dedupFuzzyNames, dedupIncremental, dedupSetsimPrefix
  )
}
