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

  /** Distinct word-trigram shingles from a MATERIALIZED token-array
    * column (empty for docs under 3 tokens — Spark's sequence() would
    * run descending). Callers must project the tokens first: inlining
    * `split()` here would re-run it inside every lambda element_at,
    * turning shingling O(tokens²) per row (measured 11s → 0.3s at
    * sf0.1).
    */
  def shinglesFromTokens(toks: Column): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - 2),
      i => concat_ws(" ",
        element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))
    array_distinct(
      when(size(toks) < 3, array().cast("array<string>")).otherwise(grams))
  }

  /** doc_id + distinct shingle set per document (tokens materialized
    * in a separate projection step — see shinglesFromTokens).
    */
  def docShingleSets(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), shinglesFromTokens(col("toks")).as("sh"))

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

  /** N-gram Jaccard near-dup via shingle inverted index: explode
    * shingles, self-join on the shingle key, count common shingles
    * per pair, compute exact Jaccard. Never builds an all-pairs
    * product — only pairs sharing ≥1 shingle surface, and the oracle
    * (all-pairs formulation) proves the pruning is lossless.
    */
  val dedupNgramJaccard = GraftQuery(
    "dedup_ngram_jaccard",
    (s, dir) => {
      val t = Tables(s, dir)
      // cache the SETS (pre-explode): exploding off the raw projection
      // would re-inline the tokenizer per generated row
      val sets = docShingleSets(t.documents).cache()
      val ds = sets.select(col("doc_id"), size(col("sh")).as("n_sh"),
        explode(col("sh")).as("shingle"))
      val a = ds.select(col("doc_id").as("ia"), col("n_sh").as("na"), col("shingle"))
      val b = ds.select(col("doc_id").as("ib"), col("n_sh").as("nb"), col("shingle"))
      val out = a.join(b, Seq("shingle"))
        .filter(col("ia") < col("ib"))
        .groupBy(col("ia"), col("ib"), col("na"), col("nb"))
        .agg(count(lit(1)).as("common"))
        .withColumn("jaccard",
          col("common").cast("double") / (col("na") + col("nb") - col("common")))
        .filter(col("jaccard") >= 0.5)
        .select(col("ia"), col("ib"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("ia"), col("ib"))
      // pin the (small) pair result, release the big shingle cache
      out.persist().count()
      sets.unpersist(false)
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
    * candidates are verified with exact Jaccard. Estimated Jaccard =
    * fraction of agreeing signature slots.
    */
  val dedupMinhashLsh = GraftQuery(
    "dedup_minhash_lsh",
    (s, dir) => {
      val t = Tables(s, dir)
      val docSets = docShingleSets(t.documents).cache()
      val ds = docSets.select(col("doc_id"), size(col("sh")).as("n_sh"),
        explode(col("sh")).as("shingle"))
      val sig = minhashSignature(ds)
      // one aggregation pass; bands explode out of the signature row
      // (a 4-way union would re-aggregate the signature per branch)
      val bandStructs = (0 until MinHashBands).map { b =>
        val slots = (0 until MinHashK / MinHashBands).map(i => col(s"mh_${b * MinHashBands + i}"))
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
      docSets.unpersist(false)
      bands.unpersist(false)
      out
    },
    None // LSH candidate generation isn't SQL-expressible concisely;
         // TextDedupSpec proves recall against dedup_ngram_jaccard
  )

  /** SimHash near-dup: 64-bit signature per doc via the custom
    * Catalyst expression, banded into 4×16-bit keys (two signatures
    * within Hamming distance 3 share a band with high probability);
    * candidates verified by exact Hamming distance.
    */
  val dedupSimhash = GraftQuery(
    "dedup_simhash",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents
        .select(col("doc_id"), simhash64(split(lower(col("text")), "\\s+")).as("sh"))
        .cache()
      val bands = (0 until 4).map { b =>
        docs.select(col("doc_id"), col("sh"), lit(b).as("band"),
          shiftright(col("sh"), b * 16).bitwiseAND(0xffffL).as("band_key"))
      }.reduce(_ unionByName _)
      val out = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("ia"), col("y.doc_id").as("ib"),
          bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 8)
        .orderBy(col("ia"), col("ib"))
      out.persist().count()
      docs.unpersist(false)
      out
    },
    None // signature semantics live in the custom expression;
         // TextDedupSpec pins planted near-dups + hamming bounds
  )

  /** Embedding-cosine near-dup candidates — exact all-pairs (the
    * oracle-checkable baseline; the sublinear scale path is
    * Similarity.simAnnLsh). Implemented as a broadcast block
    * nested-loop with a primitive-array kernel in mapPartitions: the
    * corpus streams once, the (small) comparison side is broadcast,
    * and the O(n²) arithmetic runs in tight JIT'd loops rather than
    * per-pair Catalyst lambda evaluation (~50× faster at sf0.1).
    * Threshold 0.35 sits above the corpus' 99.9th-percentile
    * background similarity (calibrated on sf0.01).
    */
  val dedupEmbeddingCosine = GraftQuery(
    "dedup_embedding_cosine",
    (s, dir) => {
      import s.implicits._
      val t = Tables(s, dir)
      val vecs = t.embeddings
        .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
        .as[(Long, Array[Double])]
      val all = vecs.collect().sortBy(_._1)
      val norms = all.map { case (_, v) =>
        var s2 = 0.0; var i = 0
        while (i < v.length) { s2 += v(i) * v(i); i += 1 }
        math.sqrt(s2)
      }
      val bAll = s.sparkContext.broadcast((all, norms))
      val pairs = vecs.mapPartitions { it =>
        val (rows, ns) = bAll.value
        it.flatMap { case (ia, va) =>
          var na = 0.0
          var i = 0
          while (i < va.length) { na += va(i) * va(i); i += 1 }
          na = math.sqrt(na)
          rows.iterator.zipWithIndex
            .filter { case ((ib, _), _) => ia < ib }
            .flatMap { case ((ib, vb), k) =>
              var dot = 0.0
              var j = 0
              while (j < va.length) { dot += va(j) * vb(j); j += 1 }
              val cos = dot / (na * ns(k))
              if (cos >= 0.35) Some((ia, ib, cos)) else None
            }
        }
      }.toDF("ia", "ib", "cos")
      pairs
        .select(col("ia"), col("ib"), round(col("cos"), 6).as("cos"))
        .orderBy(col("ia"), col("ib"))
    },
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

  def all: Seq[GraftQuery] = Seq(
    dedupExact, dedupNgramJaccard, dedupMinhashLsh, dedupSimhash,
    dedupEmbeddingCosine
  )
}
