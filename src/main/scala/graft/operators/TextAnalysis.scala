package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.GraftQuery
import graft.sources.Tables

/** Text-analysis operators for large-scale training-data pipelines
  * (builder brief: language-ID, quality scoring, token counting,
  * fingerprinting). All per-row work is codegen'd built-in functions —
  * no UDFs — so the hot path stays inside whole-stage codegen and
  * scales linearly with document count; nothing here shuffles except
  * the final small aggregates.
  */
object TextAnalysis {

  // ---- Session-memoized shared builds (see [[graft.SharedBuilds]],
  // [[graft.SessionMemo]]). Three frames are consumed by more than
  // one registered query: the BM25 ranked lists (text_bm25 +
  // retrieval_hybrid_rrf), the per-document scoring projection
  // (text_training_set + pipeline_pretrain_funnel), and the
  // per-source excess-KL rollup (text_kl_source_drift +
  // sample_doremi_mixture). Memoizing them per (session, dir) moves
  // the build cost into Bench's one `_shared_build` row instead of
  // re-running the corpus-scale scan per consumer.
  private val shareMemo = graft.SessionMemo.ofFrame[(String, String)]

  private def sharedFrame(s: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame =
    shareMemo.getOrBuild(s, (dir, key))(build)

  private[graft] def liveSharedFrames: Seq[DataFrame] = shareMemo.live

  /** Drop every memoized shared text frame (unpersisting live
    * entries) — Bench repeat mode + spec isolation.
    */
  def clearSharedCaches(): Unit = shareMemo.clear()

  /** [[graft.functions.GraftFunctions.fanOut]], locally named. */
  private def fanned(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.functions.GraftFunctions.fanOut(df)

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** BPE-ish subword segmentation estimate: alpha runs, single
    * digits, and punctuation marks each count as one token (a cheap
    * stand-in for a byte-pair tokenizer's piece count).
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  private val stopwords =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")

  /** Stopword membership as a Column set test. */
  private def isStopword(t: Column): Column =
    t.isInCollection(stopwords)

  /** Token counting: whitespace tokens + BPE-ish pieces per document. */
  val textTokens = GraftQuery(
    "text_tokens",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(
          col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
          size(regexp_extract_all(col("text"), lit(bpeishPattern), lit(0)))
            .cast("long").as("n_bpeish_tokens"),
          length(col("text")).cast("long").as("n_chars_computed"),
          col("n_chars")
        )
        .orderBy(col("doc_id"))
    },
    Some(s"""
      SELECT doc_id,
             CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '$bpeishPattern')) AS BIGINT) AS n_bpeish_tokens,
             CAST(length(text) AS BIGINT) AS n_chars_computed,
             n_chars
      FROM documents
      ORDER BY doc_id
    """)
  )

  /** Quality scoring: length/punctuation/stopword signals combined
    * into a [0,1] score. All ratios are divisions of exact integer
    * counts, so they are bit-identical across engines.
    */
  val textQuality = GraftQuery(
    "text_quality",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("double")
      val nStop = size(filter(toks, isStopword _)).cast("double")
      val nPunct = length(regexp_replace(col("text"), "[^.,;:!?'\"]", "")).cast("double")
      val nChars = length(col("text")).cast("double")
      t.documents
        .select(
          col("doc_id"),
          nTok.cast("long").as("n_words"),
          (nChars / nTok).as("avg_word_len"),
          (nStop / nTok).as("stopword_ratio"),
          (nPunct / nChars).as("punct_ratio"),
          // monotone quality heuristic: long-enough docs with a sane
          // stopword rate and little punctuation noise score high
          (least(nTok / lit(100.0), lit(1.0)) * lit(0.5)
            + least(nStop / nTok * lit(5.0), lit(1.0)) * lit(0.3)
            + (lit(1.0) - least(nPunct / nChars * lit(10.0), lit(1.0))) * lit(0.2)
          ).as("quality_score")
        )
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH q AS (
        SELECT doc_id,
               CAST(len(string_split_regex(lower(text), '\s+')) AS DOUBLE) AS n_tok,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                    t -> list_contains(['the','a','of','to','and','in','is','it','that','for'], t))) AS DOUBLE) AS n_stop,
               CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) AS n_punct,
               CAST(length(text) AS DOUBLE) AS n_chars
        FROM documents)
      SELECT doc_id,
             CAST(n_tok AS BIGINT) AS n_words,
             n_chars / n_tok AS avg_word_len,
             n_stop / n_tok AS stopword_ratio,
             n_punct / n_chars AS punct_ratio,
             least(n_tok / 100.0, 1.0) * 0.5
               + least(n_stop / n_tok * 5.0, 1.0) * 0.3
               + (1.0 - least(n_punct / n_chars * 10.0, 1.0)) * 0.2 AS quality_score
      FROM q
      ORDER BY doc_id
    """)
  )

  /** Encoding-damage metrics for one text column: counts of non-ASCII
    * codepoints, C0 control characters (tab/newline/CR excluded),
    * U+FFFD replacement characters, and the two classic
    * UTF-8-read-as-Latin-1 mojibake markers ("Ã" prefix bytes, "â€"
    * smart-punctuation wrecks). All counts are length differences
    * after removal — exact integer arithmetic. Astral (non-BMP)
    * codepoints count as 2 on the Spark side (UTF-16 `length`); the
    * fixture corpus is BMP-ASCII (TestdataSchemaSpec tripwire) so the
    * oracle never sees the divergence, and EncodingScreenSpec pins the
    * corrupted-input behavior Spark-side.
    */
  def encodingScreen(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    def cntPat(pat: String): Column =
      (length(c) - length(regexp_replace(c, lit(pat), lit("")))).cast("long")
    def cntStr(s: String): Column =
      ((length(c) - length(replace(c, lit(s), lit("")))) / s.length)
        .cast("long")
    // appends metric columns (keeps every input column — callers
    // aggregate by whatever dimension they carry, no join-back)
    df.withColumns(Map(
        "n_chars" -> length(c).cast("long"),
        "n_non_ascii" -> cntPat("[^\\x00-\\x7F]"),
        "n_ctrl" -> cntPat("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"),
        "n_replacement" -> cntStr("�"),
        "n_mojibake" -> (cntStr("Ã") + cntStr("â€"))))
      .withColumn("is_clean",
        col("n_non_ascii") === 0L && col("n_ctrl") === 0L &&
          col("n_replacement") === 0L && col("n_mojibake") === 0L)
  }

  /** Corpus encoding screen — the pre-training hygiene pass that
    * quarantines mis-decoded documents before they poison a tokenizer
    * (mojibake digraphs inflate vocab; control bytes break exporters).
    * Degenerate-by-construction on the ASCII fixture corpus (every
    * doc clean — exactly what the tripwire guarantees), so the oracle
    * hashes the per-source clean-rate rollup while the non-trivial
    * detection behavior is pinned by EncodingScreenSpec on synthetic
    * corrupted docs through the SAME [[encodingScreen]] column logic.
    * Map-side only: one projection + one small per-source aggregate.
    */
  val textEncodingScreen = GraftQuery(
    "text_encoding_screen",
    (s, dir) => {
      val t = Tables(s, dir)
      encodingScreen(t.documents, "text")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("n_non_ascii")).as("total_non_ascii"),
          sum(col("n_ctrl")).as("total_ctrl"),
          sum(col("n_replacement")).as("total_replacement"),
          sum(col("n_mojibake")).as("total_mojibake"),
          sum(when(col("is_clean"), 1L).otherwise(0L)).as("n_clean"))
        .withColumn("clean_ratio",
          col("n_clean").cast(DoubleType) / col("n_docs").cast(DoubleType))
        .orderBy(col("source"))
    },
    Some("""
      WITH m AS (
        SELECT source,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(text) - length(regexp_replace(text, '[^\x00-\x7f]', '', 'g')) AS BIGINT) AS n_non_ascii,
               CAST(length(text) - length(regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS BIGINT) AS n_ctrl,
               CAST(length(text) - length(replace(text, chr(65533), '')) AS BIGINT) AS n_replacement,
               CAST((length(text) - length(replace(text, chr(195), ''))) AS BIGINT)
                 + CAST((length(text) - length(replace(text, chr(226) || chr(8364), ''))) // 2 AS BIGINT) AS n_mojibake
        FROM documents)
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(SUM(n_non_ascii) AS BIGINT) AS total_non_ascii,
             CAST(SUM(n_ctrl) AS BIGINT) AS total_ctrl,
             CAST(SUM(n_replacement) AS BIGINT) AS total_replacement,
             CAST(SUM(n_mojibake) AS BIGINT) AS total_mojibake,
             CAST(SUM(CASE WHEN n_non_ascii = 0 AND n_ctrl = 0
                            AND n_replacement = 0 AND n_mojibake = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
             CAST(SUM(CASE WHEN n_non_ascii = 0 AND n_ctrl = 0
                            AND n_replacement = 0 AND n_mojibake = 0
                       THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS clean_ratio
      FROM m
      GROUP BY source
      ORDER BY source
    """)
  )

  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "in", "to", "it", "that", "with", "as"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est", "que", "une", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "zu", "den", "mit")
  )

  /** Language-ID scores for one text column: marker-token hits per
    * language plus a CJK-codepoint override for zh. Returns the
    * predicted language code.
    */
  def langId(text: Column): Column = langIdFromTokens(text, tokens(text))

  /** (score, lang) struct of the best-scoring marker language — kept
    * separate so callers can materialize it in its own projection
    * (the decision CASE references it twice; inlined, the whole
    * marker scan would run twice per row).
    */
  def langBest(toks: Column): Column = {
    def score(lang: String): Column =
      size(filter(toks, t => t.isInCollection(markers(lang))))
    array_max(array(
      markers.keys.toSeq.sorted.map(l => struct(score(l).as("s"), lit(l).as("l"))): _*))
  }

  /** langId over a MATERIALIZED token array — callers doing more
    * token work should project the tokens once and use this form so
    * the tokenizer isn't re-inlined per lambda reference.
    */
  def langIdFromTokens(text: Column, toks: Column): Column = {
    val zh = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")) > 0
    val best = langBest(toks)
    when(zh, lit("zh"))
      .when(best.getField("s") === 0, lit("unknown"))
      .otherwise(best.getField("l"))
  }

  /** Language-ID distribution over the corpus. The marker heuristic
    * is pure list/struct arithmetic, so it is fully oracle-checked in
    * DuckDB (same marker lists, same struct-max tie-break on
    * (score, lang)); synthetic multilingual fixtures in TextDedupSpec
    * additionally pin per-language behavior.
    */
  val textLangid = GraftQuery(
    "text_langid",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .withColumn("predicted_lang", langId(col("text")))
        .groupBy(col("predicted_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("predicted_lang"))
    },
    Some(raw"""
      WITH t AS (
        SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks
        FROM documents),
      s AS (
        SELECT doc_id, text,
          {s: len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein','nicht','zu','den','mit'], x))), l: 'de'} AS de,
          {s: len(list_filter(toks, x -> list_contains(['the','and','of','is','in','to','it','that','with','as'], x))), l: 'en'} AS en,
          {s: len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','los','se','del','las'], x))), l: 'es'} AS es,
          {s: len(list_filter(toks, x -> list_contains(['le','la','les','de','et','un','est','que','une','dans'], x))), l: 'fr'} AS fr
        FROM t),
      b AS (
        SELECT doc_id, text, list_aggregate([de, en, es, fr], 'max') AS best FROM s)
      SELECT CASE WHEN length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) > 0 THEN 'zh'
                  WHEN best.s = 0 THEN 'unknown'
                  ELSE best.l END AS predicted_lang,
             COUNT(*) AS n
      FROM b GROUP BY 1 ORDER BY 1
    """)
  )

  /** Content fingerprinting: md5 over whitespace-normalized text —
    * the canonical exact-dedup key. (A rolling-hash variant backs
    * the SimHash dedup path in Dedup.scala.)
    */
  val textFingerprint = GraftQuery(
    "text_fingerprint",
    (s, dir) => {
      val t = Tables(s, dir)
      val normalized = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      t.documents
        .select(col("doc_id"), md5(normalized.cast("binary")).as("fingerprint"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
      FROM documents
      ORDER BY doc_id
    """)
  )

  /** Corpus n-gram analysis: top-20 word trigrams by document
    * frequency (distinct per doc). Inverted-index explode + count +
    * top-k — the same shape at 100 TB with a combiner-friendly
    * two-level aggregation.
    */
  val textTopNgrams = GraftQuery(
    "text_top_ngrams",
    (s, dir) => {
      val t = Tables(s, dir)
      // cache the shingle sets: exploding straight off the projection
      // lets generator pushdown re-inline the tokenizer per output row
      val sets = Dedup.docShingleSets(t.documents).cache()
      val out = sets
        .select(explode(col("sh")).as("trigram"))
        .groupBy(col("trigram"))
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("trigram"))
        .limit(20)
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
      SELECT trigram, COUNT(*) AS doc_freq
      FROM (SELECT unnest(s) AS trigram FROM sh)
      GROUP BY 1
      ORDER BY doc_freq DESC, trigram
      LIMIT 20
    """)
  )

  /** End-to-end training-set selection — the composition a real
    * LLM-data pipeline runs: keep documents that are (a) canonical
    * under exact dedup (min doc_id of their content-hash group),
    * (b) language-ID'd as English, (c) above the quality floor, and
    * (d) long enough. One scan, one hash-partitioned window for
    * canonicalization, all filters codegen'd — at 100 TB this is a
    * single shuffle on a uniform 128-bit key.
    */
  /** The shared per-document scoring projection — normalized-text
    * md5, whitespace token count, quality score, language — used by
    * BOTH text_training_set and pipeline_pretrain_funnel so the
    * funnel's stage predicates can never diverge from the component
    * query's. Also emits the decontamination n-gram set (`g`);
    * callers that don't reference it get it pruned by Catalyst.
    * Tokens and the langid struct are materialized in their own
    * projections: every lambda reference would otherwise re-inline
    * the tokenizer (round-1 lesson).
    */
  private def scoredDocs(t: Tables): DataFrame = {
    val toks = col("toks")
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, isStopword _)).cast("double")
    val nPunct = length(regexp_replace(col("text"), "[^.,;:!?'\"]", "")).cast("double")
    val nChars = length(col("text")).cast("double")
    val quality = least(nTok / lit(100.0), lit(1.0)) * lit(0.5) +
      least(nStop / nTok * lit(5.0), lit(1.0)) * lit(0.3) +
      (lit(1.0) - least(nPunct / nChars * lit(10.0), lit(1.0))) * lit(0.2)
    val normalized = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val zh = length(regexp_replace(col("text"), "[^\\u4e00-\\u9fff]", "")) > 0
    fanned(t.documents)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("text"), col("toks"),
        langBest(toks).as("best"))
      .select(
        col("doc_id"),
        md5(normalized.cast("binary")).as("h"),
        nTok.cast("long").as("n_tokens"),
        quality.as("quality"),
        when(zh, lit("zh"))
          .when(col("best.s") === 0, lit("unknown"))
          .otherwise(col("best.l")).as("lang"),
        graft.plans.WordShingles.wordShingles(
          split(lower(col("text")), "\\s+"), DecontaminateN).as("g"))
  }

  /** Session-memoized, materialized [[scoredDocs]] — built once under
    * `_shared_build`, read by text_training_set AND
    * pipeline_pretrain_funnel. The cache holds the decontamination
    * gram sets too (the funnel needs them; the training-set read
    * scans past them — cheaper than a second corpus tokenize).
    */
  private[graft] def scoredDocsShared(
      s: SparkSession, dir: String): DataFrame =
    sharedFrame(s, dir, "scored_docs") {
      val df = scoredDocs(Tables(s, dir)).cache()
      df.count()
      df
    }

  /** DuckDB restatement of [[scoredDocs]] (t/lang/q/scored CTEs) plus
    * the exact-dedup canon CTE — interpolated into every oracle that
    * consumes the shared projection.
    */
  private val ScoredSqlCtes = raw"""t AS (
        SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h
        FROM documents),
      lang AS (
        SELECT doc_id,
          list_aggregate([
            {s: len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein','nicht','zu','den','mit'], x))), l: 'de'},
            {s: len(list_filter(toks, x -> list_contains(['the','and','of','is','in','to','it','that','with','as'], x))), l: 'en'},
            {s: len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','los','se','del','las'], x))), l: 'es'},
            {s: len(list_filter(toks, x -> list_contains(['le','la','les','de','et','un','est','que','une','dans'], x))), l: 'fr'}
          ], 'max') AS best,
          length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) > 0 AS zh
        FROM t),
      q AS (
        SELECT doc_id, h,
               CAST(len(toks) AS DOUBLE) AS n_tok,
               CAST(len(list_filter(toks, x -> list_contains(['the','a','of','to','and','in','is','it','that','for'], x))) AS DOUBLE) AS n_stop,
               CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) AS n_punct,
               CAST(length(text) AS DOUBLE) AS n_chars
        FROM t),
      scored AS (
        SELECT q.doc_id, q.h, CAST(q.n_tok AS BIGINT) AS n_tokens,
               least(q.n_tok / 100.0, 1.0) * 0.5
                 + least(q.n_stop / q.n_tok * 5.0, 1.0) * 0.3
                 + (1.0 - least(q.n_punct / q.n_chars * 10.0, 1.0)) * 0.2 AS quality,
               CASE WHEN lang.zh THEN 'zh'
                    WHEN lang.best.s = 0 THEN 'unknown'
                    ELSE lang.best.l END AS lang
        FROM q JOIN lang ON q.doc_id = lang.doc_id),
      canon AS (SELECT h AS ch, MIN(doc_id) AS canon_id FROM t GROUP BY h)"""

  val textTrainingSet = GraftQuery(
    "text_training_set",
    (s, dir) => {
      val w = Window.partitionBy(col("h"))
      scoredDocsShared(s, dir)
        .withColumn("canon", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("canon") &&
          col("lang") === "en" && col("quality") >= 0.5 && col("n_tokens") >= 30)
        .select(col("doc_id"), col("n_tokens"), round(col("quality"), 6).as("quality"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $ScoredSqlCtes
      SELECT s.doc_id, s.n_tokens, round(s.quality, 6) AS quality
      FROM scored s JOIN canon c ON s.h = c.ch AND s.doc_id = c.canon_id
      WHERE s.lang = 'en' AND s.quality >= 0.5 AND s.n_tokens >= 30
      ORDER BY s.doc_id
    """)
  )

  /** Tokens per training chunk. */
  val ChunkTokens = 64

  /** Document chunking: split each document into fixed-size token
    * windows (the pre-tokenization step of every LLM training
    * pipeline). Emits (doc_id, chunk_idx, chunk content hash, token
    * count) — relational explode, no UDFs; chunk text itself stays
    * hashed so the output is narrow.
    */
  val textChunk = GraftQuery(
    "text_chunk",
    (s, dir) => {
      val t = Tables(s, dir)
      // cache the token projection: the generator child and the
      // per-chunk slice would otherwise each re-inline split()
      val toks = t.documents
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .cache()
      val out = toks
        .withColumn("n", size(col("toks")).cast("long"))
        .withColumn("chunk_idx",
          explode(sequence(lit(0L), floor((col("n") - 1) / ChunkTokens).cast("long"))))
        .select(
          col("doc_id"), col("chunk_idx"),
          md5(concat_ws(" ",
            slice(col("toks"), (col("chunk_idx") * ChunkTokens + 1).cast("int"),
              lit(ChunkTokens))).cast("binary")).as("chunk_hash"),
          least(col("n") - col("chunk_idx") * ChunkTokens, lit(ChunkTokens.toLong))
            .as("chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx"))
      out.persist().count()
      toks.unpersist(false)
      out
    },
    Some(raw"""
      WITH t AS (
        SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks,
               CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n
        FROM documents),
      c AS (
        SELECT doc_id, toks, n,
               CAST(unnest(range(0, (n - 1) // $ChunkTokens + 1)) AS BIGINT) AS chunk_idx
        FROM t)
      SELECT doc_id, chunk_idx,
             md5(array_to_string(
               list_slice(toks, chunk_idx * $ChunkTokens + 1,
                 least((chunk_idx + 1) * $ChunkTokens, n)), ' ')) AS chunk_hash,
             least(n - chunk_idx * $ChunkTokens, $ChunkTokens) AS chunk_tokens
      FROM c
      ORDER BY doc_id, chunk_idx
    """)
  )

  /** N-gram size for decontamination overlap (8-token spans — long
    * enough that shared spans indicate copied text, not common
    * phrases; the classic 13-gram check at reduced n for the
    * synthetic corpus' shorter documents).
    */
  val DecontaminateN = 8
  /** Documents whose ids are below this bound act as the held-out
    * benchmark set for the decontamination check.
    */
  val BenchmarkIdBound = 20

  /** Decontamination: find corpus documents sharing at least one
    * 8-token span with the "benchmark" set — the train/test overlap
    * scrub every LLM pipeline runs before training. The benchmark
    * n-gram set is small by construction → broadcast inverted join;
    * the corpus side streams map-side.
    */
  val textDecontaminate = GraftQuery(
    "text_decontaminate",
    (s, dir) => {
      val t = Tables(s, dir)
      val grams = t.documents
        .select(col("doc_id"),
          graft.plans.WordShingles.wordShingles(
            split(lower(col("text")), "\\s+"), DecontaminateN).as("g"))
        .cache()
      val bench = grams.filter(col("doc_id") < BenchmarkIdBound)
        .select(explode(col("g")).as("gram")).distinct()
      val out = grams.filter(col("doc_id") >= BenchmarkIdBound)
        .select(col("doc_id"), explode(col("g")).as("gram"))
        .join(broadcast(bench), Seq("gram"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared_ngrams"))
        .orderBy(col("doc_id"))
      out.persist().count()
      grams.unpersist(false)
      out
    },
    Some(raw"""
      WITH g AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(text), '\s+')) - ${DecontaminateN - 2}, 1)),
                 i -> ${(0 until DecontaminateN).map(j => s"string_split_regex(lower(text), '\\s+')[i+$j]").mkString(" || ' ' || ")}
               )) AS grams
        FROM documents),
      bench AS (
        SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < $BenchmarkIdBound),
      corpus AS (
        SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= $BenchmarkIdBound)
      SELECT c.doc_id, COUNT(*) AS n_shared_ngrams
      FROM corpus c JOIN bench b ON c.gram = b.gram
      GROUP BY c.doc_id
      ORDER BY c.doc_id
    """)
  )

  /** Bloom sizing for the sketch-based decontamination path: the
    * benchmark n-gram set is claimed at 64k items over 1M bits
    * (~128 KB serialized) — at the gated corpora the real item count
    * is far below the claim, so the realized false-positive rate is
    * effectively zero while the structure is the one that scales: at
    * 100 TB the benchmark suite's n-grams stop being broadcastable as
    * an exact set, but a fixed-size mergeable Bloom build (one
    * aggregation) + a literal probe inside codegen still works.
    */
  val BloomItems = 1L << 16
  val BloomBits = 1L << 20

  /** Sketch-based decontamination: same benchmark/corpus split as
    * text_decontaminate, but membership goes through Spark's internal
    * BloomFilterAggregate / BloomFilterMightContain pair (bridged —
    * the machinery behind runtime row-group filters). The summary is
    * oracle-hashed: exact hit counts DuckDB recomputes, a
    * no-false-negatives bit (structural Bloom guarantee — trips only
    * if the build/probe plumbing breaks), and a false-positive budget
    * gate. The collected filter is KB-sized driver state, the same
    * pattern as df.stat.bloomFilter.
    */
  val textDecontaminateBloom = GraftQuery(
    "text_decontaminate_bloom",
    (s, dir) => {
      val t = Tables(s, dir)
      val grams = t.documents
        .select(col("doc_id"),
          graft.plans.WordShingles.wordShingles(
            split(lower(col("text")), "\\s+"), DecontaminateN).as("g"))
        .cache()
      val benchGrams = grams.filter(col("doc_id") < BenchmarkIdBound)
        .select(explode(col("g")).as("gram")).distinct()
      val bloomBytes = benchGrams
        .agg(org.apache.spark.sql.GraftSketchBridge
          .bloomAgg(col("gram"), BloomItems, BloomBits).as("bf"))
        .head.getAs[Array[Byte]](0)
      val corpus = grams.filter(col("doc_id") >= BenchmarkIdBound)
      // per-doc: any gram in the bloom / any gram in the exact set
      val bloomHits = corpus
        .select(col("doc_id"), explode(col("g")).as("gram"))
        .filter(org.apache.spark.sql.GraftSketchBridge
          .bloomMightContain(bloomBytes, col("gram")))
        .select(col("doc_id")).distinct()
      val exactHits = corpus
        .select(col("doc_id"), explode(col("g")).as("gram"))
        .join(broadcast(benchGrams), Seq("gram"))
        .select(col("doc_id")).distinct()
      val missed = exactHits.join(bloomHits, Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_missed"))
      val counts = corpus.agg(count(lit(1)).as("n_corpus_docs"))
        .crossJoin(exactHits.agg(count(lit(1)).as("n_exact_hit_docs")))
        .crossJoin(bloomHits.agg(count(lit(1)).as("n_bloom")))
        .crossJoin(missed)
      val out = counts.select(
        col("n_corpus_docs"), col("n_exact_hit_docs"),
        (col("n_missed") === 0).as("no_false_negatives"),
        (col("n_bloom") - col("n_exact_hit_docs") <=
          greatest(lit(10L), (col("n_corpus_docs") * 0.02).cast("long")))
          .as("fp_ok"))
      out.persist().count()
      grams.unpersist(false)
      out
    },
    Some(raw"""
      WITH g AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(text), '\s+')) - ${DecontaminateN - 2}, 1)),
                 i -> ${(0 until DecontaminateN).map(j => s"string_split_regex(lower(text), '\\s+')[i+$j]").mkString(" || ' ' || ")}
               )) AS grams
        FROM documents),
      bench AS (
        SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < $BenchmarkIdBound),
      hits AS (
        SELECT DISTINCT c.doc_id
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g
              WHERE doc_id >= $BenchmarkIdBound) c
        JOIN bench b ON c.gram = b.gram)
      SELECT CAST((SELECT COUNT(*) FROM documents WHERE doc_id >= $BenchmarkIdBound) AS BIGINT) AS n_corpus_docs,
             CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS n_exact_hit_docs,
             TRUE AS no_false_negatives,
             TRUE AS fp_ok
    """)
  )

  /** PII redaction patterns — portable between Java regex (Spark) and
    * RE2 (DuckDB): character classes, bounded repetition and \b only.
    */
  val EmailRe = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  /** PII scrubbing: the corpus is synthetic word-salad with no real
    * PII, so the query PLANTS deterministic PII derived from corpus
    * columns (email/phone/IPv4 built from source + doc_id), then
    * redacts it — the full redaction semantics (pattern match,
    * replacement, ordering so an email's dotted domain is gone before
    * the IPv4 pass) run end-to-end and the oracle hashes per-doc
    * match counts AND the redacted text length, which disagrees on
    * any divergence in match boundaries. All per-row regex work in
    * whole-stage codegen — at 100 TB this is a map-only scan, no
    * shuffle. Patterns go through typed functions + lit (CLAUDE.md:
    * the SQL parser path eats backslashes).
    */
  val textPiiRedact = GraftQuery(
    "text_pii_redact",
    (s, dir) => {
      val t = Tables(s, dir)
      val poisoned = t.documents.select(
        col("doc_id"), col("source"),
        concat(
          col("text"), lit(" email "),
          col("source"), lit("_"), col("doc_id"), lit("@example.com"),
          lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" host 10."), (col("doc_id") % 256), lit("."),
          ((col("doc_id") * 7) % 256), lit(".1")).as("ptext"))
      poisoned.select(
          col("doc_id"),
          size(regexp_extract_all(col("ptext"), lit(EmailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("ptext"), lit(PhoneRe), lit(0)))
            .cast("long").as("n_phones"),
          size(regexp_extract_all(col("ptext"), lit(Ipv4Re), lit(0)))
            .cast("long").as("n_ips"),
          length(
            regexp_replace(
              regexp_replace(
                regexp_replace(col("ptext"), lit(EmailRe), lit("<EMAIL>")),
                lit(Ipv4Re), lit("<IP>")),
              lit(PhoneRe), lit("<PHONE>"))).cast("long").as("redacted_len"))
        .orderBy(col("doc_id"))
    },
    Some(raw"""
      WITH p AS (
        SELECT doc_id,
               text || ' email ' || source || '_' || CAST(doc_id AS VARCHAR)
                    || '@example.com'
                    || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                    || CAST((doc_id * 7) % 256 AS VARCHAR) || '.1' AS ptext
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(ptext, '$EmailRe')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(ptext, '$PhoneRe')) AS BIGINT) AS n_phones,
             CAST(len(regexp_extract_all(ptext, '$Ipv4Re')) AS BIGINT) AS n_ips,
             CAST(length(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(ptext, '$EmailRe', '<EMAIL>', 'g'),
                   '$Ipv4Re', '<IP>', 'g'),
                 '$PhoneRe', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
      FROM p
      ORDER BY doc_id
    """)
  )

  /** Per-source vocabulary statistics (the Zipf / type-token-ratio
    * family corpus analyses use to spot low-diversity or boilerplate
    * sources before training): token and type counts, TTR, and the
    * head token's frequency share. Two map-side-combined aggregations
    * — one on (source, term), one on source — so the shuffle carries
    * distinct (source, term) pairs, never token instances.
    */
  val textZipfStats = GraftQuery(
    "text_zipf_stats",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = t.documents
        .select(col("source"), explode(tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
      val byTerm = toks.groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("cnt"))
      val bySource = byTerm.groupBy(col("source"))
        .agg(
          sum(col("cnt")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          max(col("cnt")).as("top_cnt"))
      val docs = t.documents.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
      docs.join(bySource, Seq("source"))
        .select(
          col("source"), col("n_docs"), col("n_tokens"), col("n_types"),
          round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
          round(col("top_cnt").cast("double") / col("n_tokens"), 6).as("top_share"))
        .orderBy(col("source"))
    },
    Some(raw"""
      WITH toks AS (
        SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents),
      by_term AS (
        SELECT source, term, COUNT(*) AS cnt FROM toks
        WHERE term <> '' GROUP BY 1, 2),
      by_source AS (
        SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_types, MAX(cnt) AS top_cnt
        FROM by_term GROUP BY 1),
      docs AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
      SELECT source, n_docs, n_tokens, n_types,
             round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
             round(CAST(top_cnt AS DOUBLE) / n_tokens, 6) AS top_share
      FROM docs JOIN by_source USING (source)
      ORDER BY source
    """)
  )

  /** Misra–Gries capacity and reported head size. */
  val MGCapacity = 64
  val HeavyTopN = 10

  /** Frequent-token screening via the Misra–Gries summary: one
    * map-side pass + KB-sized merges hold a fixed 64-counter summary
    * with the guarantee that every token with true frequency >
    * n/(k+1) is present (undercount ≤ n/(k+1), never a silent drop).
    * At 100 TB this replaces the exact vocabulary shuffle for
    * head-of-distribution screening (stopword discovery, boilerplate
    * tokens). Summary contents below the guarantee line are merge-
    * order dependent, so the oracle hashes the EXACT top-10 (computed
    * alongside) plus a boolean that no guaranteed-heavy token is
    * missing from the sketch.
    */
  val textHeavyHitters = GraftQuery(
    "text_heavy_hitters",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = t.documents
        .select(explode(tokens(col("text"))).as("term"))
        .filter(col("term") =!= "").cache()
      val mg = toks.agg(
        graft.plans.MGSketch.agg(col("term"), MGCapacity).as("summary"))
      val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val total = toks.agg(count(lit(1)).as("n_tokens"))
      val heavy = exact.crossJoin(broadcast(total))
        .filter(col("cnt") * (MGCapacity + 1) > col("n_tokens"))
      val missing = heavy.join(
          mg.select(explode(col("summary")).as("e"))
            .select(col("e.term").as("term")),
          Seq("term"), "left_anti")
        .agg(count(lit(1)).as("n_missing"))
      // global top-N through the bounded-heap string aggregator —
      // map-side combined, so no reducer ever holds the vocabulary
      // (the former window rank sorted ALL distinct terms on one)
      val topk = udaf(new graft.functions.TopKStrAgg(HeavyTopN))
      val out = exact
        .agg(topk(col("cnt").cast(DoubleType), col("term")).as("top"))
        .select(posexplode(col("top")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("col.payload").as("term"),
          col("col.sortKey").cast("long").as("cnt"))
        .crossJoin(broadcast(missing))
        .select(col("rank"), col("term"), col("cnt"),
          (col("n_missing") === 0).as("mg_ok"))
        .orderBy(col("rank"))
      out.persist().count()
      toks.unpersist(false)
      out
    },
    Some(raw"""
      WITH toks AS (
        SELECT unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents),
      ex AS (SELECT term, COUNT(*) AS cnt FROM toks WHERE term <> '' GROUP BY 1),
      ranked AS (
        SELECT term, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rank
        FROM ex)
      SELECT rank, term, cnt, TRUE AS mg_ok
      FROM ranked WHERE rank <= $HeavyTopN
      ORDER BY rank
    """)
  )

  /** Unigram LM scoring — the classic cheap LM-quality filter (docs
    * whose tokens are improbable under the corpus unigram model are
    * noise candidates). Two aggregations: corpus term counts (the
    * "model"), then per-doc exact-decimal sums of per-token log
    * probabilities. Each log-prob is rounded to 6 digits BEFORE the
    * sum and the sum runs in decimal, so the result is independent of
    * Spark's partial-aggregation order — the same exactness policy as
    * GraftFunctions.sumDec (a raw double sum of logs would be
    * add-order-dependent and flake the hash gate). At 100 TB the
    * model is a broadcast vocabulary (or an MG summary for the head +
    * an OOV floor), and scoring stays one map-side join + one
    * combine-enabled aggregation.
    */
  val textUnigramLm = GraftQuery(
    "text_unigram_lm",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = t.documents
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .filter(col("term") =!= "").cache()
      val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      val logp = vocab.crossJoin(broadcast(total))
        .select(col("term"),
          round(log(col("cnt").cast("double") / col("n_total")), 6).as("logp"))
      val out = toks.join(broadcast(logp), Seq("term"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_tokens"),
          graft.functions.GraftFunctions.sumDec(col("logp")).as("sum_logp"))
        .select(col("doc_id"), col("n_tokens"),
          col("sum_logp"),
          round(col("sum_logp") / col("n_tokens"), 6).as("avg_logp"))
        .orderBy(col("doc_id"))
      out.persist().count()
      toks.unpersist(false)
      out
    },
    Some(raw"""
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents),
      tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
      vocab AS (SELECT term, COUNT(*) AS cnt FROM tk GROUP BY 1),
      total AS (SELECT COUNT(*) AS n_total FROM tk),
      logp AS (
        SELECT term, round(ln(CAST(cnt AS DOUBLE) / n_total), 6) AS logp
        FROM vocab CROSS JOIN total)
      SELECT doc_id, COUNT(*) AS n_tokens,
             CAST(SUM(CAST(logp AS DECIMAL(25,6))) AS DOUBLE) AS sum_logp,
             round(CAST(SUM(CAST(logp AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6) AS avg_logp
      FROM tk JOIN logp USING (term)
      GROUP BY doc_id
      ORDER BY doc_id
    """)
  )

  /** Number of perplexity buckets (CCNet's head/middle/tail). */
  val CcnetBuckets = 3

  /** CCNet-style perplexity bucketing: score every document under a
    * PER-LANGUAGE unigram LM, then split each language into
    * equal-count buckets by score (head = most probable). This is the
    * canonical web-corpus triage step (CCNet: per-language LM +
    * perplexity tertiles decide keep/review/drop). Shapes: the LM is
    * two aggregations (per-(lang,term) counts joined to per-lang
    * totals); scoring is one broadcast join + one combine-enabled
    * aggregation — identical cost class to text_unigram_lm; the
    * bucket split is ntile over a per-language window (one shuffle on
    * lang; at 100 TB the ntile becomes the quantile-sketch cutpoints
    * + a map-side bucket assignment, same outputs). Per-token log
    * probs are rounded to 6 digits before a decimal sum (add-order
    * independent), and ntile ties break on doc_id, so the bucket
    * assignment is bit-stable across engines.
    */
  val textCcnetBuckets = GraftQuery(
    "text_ccnet_buckets",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = t.documents
        .select(col("lang"), col("doc_id"), explode(tokens(col("text"))).as("term"))
        .filter(col("term") =!= "").cache()
      val vocab = toks.groupBy(col("lang"), col("term")).agg(count(lit(1)).as("cnt"))
      val total = toks.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
      val logp = vocab.join(broadcast(total), Seq("lang"))
        .select(col("lang"), col("term"),
          round(log(col("cnt").cast("double") / col("n_total")), 6).as("logp"))
      val scored = toks.join(broadcast(logp), Seq("lang", "term"))
        .groupBy(col("lang"), col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          graft.functions.GraftFunctions.sumDec(col("logp")).as("sum_logp"))
        .select(col("lang"), col("doc_id"),
          round(col("sum_logp") / col("n_tokens"), 6).as("avg_logp"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("avg_logp").desc, col("doc_id"))
      val out = scored
        .withColumn("bucket", ntile(CcnetBuckets).over(w).cast("long"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          round(graft.functions.GraftFunctions.sumDec(col("avg_logp"))
            / count(lit(1)), 6).as("mean_avg_logp"),
          min(col("avg_logp")).as("worst_logp"),
          max(col("avg_logp")).as("best_logp"))
        .orderBy(col("lang"), col("bucket"))
      out.persist().count()
      toks.unpersist(false)
      out
    },
    Some(raw"""
      WITH toks AS (
        SELECT lang, doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents),
      tk AS (SELECT lang, doc_id, term FROM toks WHERE term <> ''),
      vocab AS (SELECT lang, term, COUNT(*) AS cnt FROM tk GROUP BY 1, 2),
      total AS (SELECT lang, COUNT(*) AS n_total FROM tk GROUP BY 1),
      logp AS (
        SELECT lang, term, round(ln(CAST(cnt AS DOUBLE) / n_total), 6) AS logp
        FROM vocab JOIN total USING (lang)),
      scored AS (
        SELECT lang, doc_id,
               round(CAST(SUM(CAST(logp AS DECIMAL(25,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_logp
        FROM tk JOIN logp USING (lang, term)
        GROUP BY lang, doc_id),
      bucketed AS (
        SELECT lang, avg_logp,
               CAST(ntile($CcnetBuckets) OVER (PARTITION BY lang
                 ORDER BY avg_logp DESC, doc_id) AS BIGINT) AS bucket
        FROM scored)
      SELECT lang, bucket, COUNT(*) AS n_docs,
             round(CAST(SUM(CAST(avg_logp AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(*), 6) AS mean_avg_logp,
             MIN(avg_logp) AS worst_logp,
             MAX(avg_logp) AS best_logp
      FROM bucketed
      GROUP BY lang, bucket
      ORDER BY lang, bucket
    """)
  )

  /** Merge-candidate pairs to emit. */
  val BpeTopPairs = 30L

  /** BPE vocabulary induction, step one: count adjacent symbol pairs
    * (here: character bigrams inside whitespace tokens — every 2-char
    * substring) and rank merge candidates by frequency. This is the
    * inner loop of byte-pair-encoding training; one iteration is
    * representative of the shape (the full trainer repeats it on the
    * merged corpus — same plan each round). One explode over
    * in-token positions + one map-side-combined count: positions per
    * token = len−1, so the fan-out is bounded by corpus characters,
    * and nothing shuffles except (pair, count) partials. At 100 TB
    * this is exactly how distributed BPE/WordPiece trainers compute
    * their merge tables.
    */
  val textBpeMerges = GraftQuery(
    "text_bpe_merges",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = t.documents
        .select(explode(tokens(col("text"))).as("term"))
        .filter(length(col("term")) >= 2)
        .select(col("term"),
          explode(sequence(lit(1), length(col("term")) - 1)).as("pos"))
        .select(col("term").substr(col("pos"), lit(2)).as("pair"))
      // pair-vocabulary top-N via the bounded-heap string aggregator
      // (map-side combined; the window rank sorted every distinct
      // pair through one reducer)
      val topk = udaf(new graft.functions.TopKStrAgg(BpeTopPairs.toInt))
      pairs.groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .agg(topk(col("cnt").cast(DoubleType), col("pair")).as("top"))
        .select(posexplode(col("top")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("col.payload").as("pair"),
          col("col.sortKey").cast("long").as("cnt"))
        .orderBy(col("rank"))
    },
    Some(raw"""
      WITH toks AS (
        SELECT unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents),
      pairs AS (
        SELECT substr(term, CAST(i AS INTEGER), 2) AS pair
        FROM toks, LATERAL unnest(range(1, CAST(length(term) AS BIGINT))) AS t(i)
        WHERE length(term) >= 2),
      c AS (SELECT pair, COUNT(*) AS cnt FROM pairs GROUP BY 1),
      ranked AS (
        SELECT pair, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank
        FROM c)
      SELECT rank, pair, cnt FROM ranked
      WHERE rank <= $BpeTopPairs
      ORDER BY rank
    """)
  )

  /** Tokenizer fertility audit: per-source pieces-per-word and
    * chars-per-piece under the BPE-ish segmentation — the statistic
    * that drives tokenizer/vocab choice (high fertility = the
    * tokenizer fragments this domain; budget-per-document shrinks).
    * Exact integer sums, one map-side-combined aggregation; ratios
    * are a single division of exact longs, so the output is
    * bit-stable. At 100 TB this is one scan next to the other
    * per-source profiles.
    */
  val textTokenizerFertility = GraftQuery(
    "text_tokenizer_fertility",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(col("source"),
          size(tokens(col("text"))).cast("long").as("words"),
          size(regexp_extract_all(col("text"), lit(bpeishPattern), lit(0)))
            .cast("long").as("pieces"),
          length(col("text")).cast("long").as("chars"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("words")).as("n_words"),
          sum(col("pieces")).as("n_pieces"),
          sum(col("chars")).as("n_chars"))
        .select(col("source"), col("n_docs"), col("n_words"), col("n_pieces"),
          round(col("n_pieces").cast("double") / col("n_words"), 6).as("fertility"),
          round(col("n_chars").cast("double") / col("n_pieces"), 6).as("chars_per_piece"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH d AS (
        SELECT source,
               CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS words,
               CAST(len(regexp_extract_all(text, '$bpeishPattern')) AS BIGINT) AS pieces,
               CAST(length(text) AS BIGINT) AS chars
        FROM documents)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(words) AS BIGINT) AS n_words,
             CAST(SUM(pieces) AS BIGINT) AS n_pieces,
             round(CAST(SUM(pieces) AS DOUBLE) / CAST(SUM(words) AS BIGINT), 6) AS fertility,
             round(CAST(SUM(chars) AS DOUBLE) / CAST(SUM(pieces) AS BIGINT), 6) AS chars_per_piece
      FROM d
      GROUP BY source
      ORDER BY source
    """)
  )

  /** Global token budget the epoch allocator fills. */
  val EpochBudgetTokens = 500000L

  /** Epoch allocation under a token budget (the data-constrained
    * mixing computation): each source's share of the budget is
    * proportional to an integer sqrt-temperature weight
    * (w = floor(sqrt(available_tokens)) — same damping convention as
    * sample_mixture), target tokens follow by INTEGER proration
    * (budget·w div Σw — no cross-source float sum anywhere, the
    * samplePps discipline), and epochs = ceil(target/available) says
    * how many times the source must repeat to fill its share. This is
    * the planning step for "how many epochs of each domain do we
    * train on" when data, not compute, binds. Two tiny aggregations;
    * everything after the per-source token count is arithmetic on a
    * sources-sized frame.
    */
  val sampleEpochAllocation = GraftQuery(
    "sample_epoch_allocation",
    (s, dir) => {
      val t = Tables(s, dir)
      val avail = t.documents
        .select(col("source"), size(tokens(col("text"))).cast("long").as("w"))
        .groupBy(col("source")).agg(sum(col("w")).as("avail_tokens"))
        .withColumn("weight", floor(sqrt(col("avail_tokens"))).cast("long"))
      val totalW = avail.agg(sum(col("weight")).as("total_w"))
      avail.crossJoin(broadcast(totalW))
        .select(col("source"), col("avail_tokens"), col("weight"),
          // integer div (the samplePps discipline) — a float divide +
          // floor would lose exactness past 2^53 at real token scales
          expr(s"(weight * $EpochBudgetTokens) div total_w").as("target_tokens"))
        .select(col("source"), col("avail_tokens"), col("weight"), col("target_tokens"),
          expr("(target_tokens + avail_tokens - 1) div avail_tokens").as("epochs"),
          round(col("target_tokens").cast("double") / col("avail_tokens"), 6)
            .as("repeat_frac"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH avail AS (
        SELECT source,
               CAST(SUM(len(string_split_regex(lower(text), '\\s+'))) AS BIGINT)
                 AS avail_tokens
        FROM documents GROUP BY source),
      wt AS (
        SELECT source, avail_tokens,
               CAST(floor(sqrt(avail_tokens)) AS BIGINT) AS weight
        FROM avail),
      tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS total_w FROM wt)
      SELECT source, avail_tokens, weight,
             CAST((weight * $EpochBudgetTokens) // total_w AS BIGINT) AS target_tokens,
             CAST(((weight * $EpochBudgetTokens) // total_w + avail_tokens - 1)
               // avail_tokens AS BIGINT) AS epochs,
             round(CAST((weight * $EpochBudgetTokens) // total_w AS DOUBLE)
               / avail_tokens, 6) AS repeat_frac
      FROM wt CROSS JOIN tot
      ORDER BY source
    """)
  )

  /** Training-shard export: the terminal step of the text pipeline —
    * write the corpus PARTITIONED BY source (the layout trainers and
    * downstream jobs prune on), read it back, and verify per-shard
    * manifest counts against the oracle. The read-back proves the
    * partitioned layout round-trips (partition column reconstructed
    * from directory names, per-partition files readable); ScaleSpec's
    * partition-pruning test proves the layout is actually prunable.
    * Staging is removed after a severed-lineage checkpoint, as in the
    * format roundtrips.
    */
  val textExportShards = GraftQuery(
    "text_export_shards",
    (s, dir) => {
      val t = Tables(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_shards")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      try {
        t.documents
          .select(col("doc_id"), col("text"), col("n_chars"), col("source"))
          .write.mode("overwrite").partitionBy("source").parquet(tmp.toString)
        s.read.parquet(tmp.toString)
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            countDistinct(col("doc_id")).as("n_distinct_docs"))
          .orderBy(col("source"))
          .localCheckpoint()
      } finally rm(tmp.toFile)
    },
    Some("""
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct_docs
      FROM documents
      GROUP BY source
      ORDER BY source
    """)
  )

  /** Docs sampled per stratum. */
  val SamplePerSource = 10

  /** Stratified sampling: a deterministic pseudo-random K documents
    * per `source` stratum (order by md5 of the id — reproducible
    * across engines and runs, unlike rand()). The window shuffles
    * once on the stratum key; at 100 TB the same plan holds with
    * bounded-heap top-k per group.
    */
  val sampleStratified = GraftQuery(
    "sample_stratified",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      t.documents
        .select(col("source"), col("doc_id"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= SamplePerSource)
        .orderBy(col("source"), col("rk"))
    },
    Some(s"""
      WITH ranked AS (
        SELECT source, doc_id,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
        FROM documents)
      SELECT source, doc_id, rk
      FROM ranked WHERE rk <= $SamplePerSource
      ORDER BY source, rk
    """)
  )

  /** Picks per source for the PPS sampler. */
  val PpsK = 5L

  /** Weighted (probability-proportional-to-size) sampling via
    * SYSTEMATIC selection over the exact cumulative weight: per
    * source, doc i is picked ⌊cum_i·K/total⌋ − ⌊cum_{i−1}·K/total⌋
    * times — longer documents proportionally more often, exactly K
    * picks per source, and EVERY quantity is BIGINT arithmetic, so
    * the sample is bit-identical across engines (the float-key A-Res
    * formulation would hinge on cross-engine pow/ln rounding at
    * orderings near ties; integer systematic PPS has no such edge).
    * One shuffle on the stratum key; strata sample in parallel.
    */
  val samplePps = GraftQuery(
    "sample_pps",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(col("source"))
      t.documents
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("cum", sum(col("n_chars")).over(w))
        .withColumn("total", sum(col("n_chars")).over(wAll))
        .withColumn("picks",
          expr(s"((cum * $PpsK) div total) - (((cum - n_chars) * $PpsK) div total)"))
        .filter(col("picks") > 0)
        .select(col("source"), col("doc_id"), col("n_chars"), col("picks"))
        .orderBy(col("source"), col("doc_id"))
    },
    Some(s"""
      WITH c AS (
        SELECT source, doc_id, n_chars,
               CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(SUM(n_chars) OVER (PARTITION BY source) AS BIGINT) AS total
        FROM documents)
      SELECT source, doc_id, n_chars,
             CAST(((cum * $PpsK) // total)
               - (((cum - n_chars) * $PpsK) // total) AS BIGINT) AS picks
      FROM c
      WHERE ((cum * $PpsK) // total) - (((cum - n_chars) * $PpsK) // total) > 0
      ORDER BY source, doc_id
    """)
  )

  /** Token budget of one packed training sequence. */
  val PackBudget = 2048L

  /** Sequence packing: assign documents to fixed-token-budget packs —
    * the step that turns a filtered corpus into training sequences.
    * Contiguous packing per `source` shard: docs in doc_id order,
    * pack = floor(preceding-cumulative-tokens / budget), i.e. each
    * doc joins the pack where its first token lands (docs may span a
    * boundary, as concatenate-and-split training pipelines do). The
    * running sum is a window per shard, so shards pack in parallel —
    * at 100 TB packing is per-shard by construction and this is one
    * shuffle on the shard key.
    */
  val textPackSequences = GraftQuery(
    "text_pack_sequences",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.documents
        .select(col("source"), col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .select(col("source"), col("doc_id"), col("n_tok"),
          floor((col("cum") - col("n_tok")) / PackBudget).cast("long").as("pack_seq"))
        .orderBy(col("source"), col("doc_id"))
    },
    Some(raw"""
      WITH t AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT doc_id, source, n_tok,
               SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM t)
      SELECT source, doc_id, n_tok,
             CAST((cum - n_tok) // $PackBudget AS BIGINT) AS pack_seq
      FROM c
      ORDER BY source, doc_id
    """)
  )

  /** TF-IDF top terms per document: term frequency within each doc ×
    * ln(N/df) over the corpus, top 3 terms per doc. Two shuffles carry
    * the whole thing — (doc_id, term) counts (map-side combined) and
    * the vocabulary-keyed df join — then one per-doc window; the corpus
    * document count joins in as a broadcast single row, never a driver
    * constant baked into the plan. Scores are rounded to 6 digits
    * BEFORE ranking so ordering is identical across engines (ln is the
    * only non-exactly-rounded step; at 6 digits both engines agree).
    */
  val textTfidf = GraftQuery(
    "text_tfidf",
    (s, dir) => {
      val t = Tables(s, dir)
      val terms = fanned(t.documents)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .filter(length(col("term")) >= 3 && !isStopword(col("term")))
      val tf = terms.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = t.documents.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      tf.join(df, Seq("term"))
        .join(broadcast(nDocs))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""
      WITH terms AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents),
      filtered AS (
        SELECT doc_id, term FROM terms
        WHERE length(term) >= 3
          AND NOT list_contains(['the','a','of','to','and','in','is','it','that','for'], term)),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM filtered GROUP BY 1, 2),
      dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        FROM tf JOIN dfq USING (term) CROSS JOIN n),
      ranked AS (
        SELECT doc_id, term, tfidf,
               CAST(row_number() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC, term) AS BIGINT) AS rank
        FROM scored)
      SELECT doc_id, rank, term, tfidf FROM ranked WHERE rank <= 3
      ORDER BY doc_id, rank
    """)
  )

  /** Gopher-style repetition gates. The thresholds are engine
    * parameters; both engines compute the identical exact ratios, so
    * the keep bit hashes regardless of where the bar sits.
    */
  val TopWordFracMax = 0.2
  val Dup2gramFracMax = 0.6

  /** Repetition-based quality filtering (the Gopher/C4 rules family):
    * most-frequent-word fraction and duplicate-2-gram fraction per
    * document, plus the keep/drop decision. Everything is per-row
    * array math inside whole-stage codegen — the most-frequent-word
    * count is a fold over the SORTED token array (longest equal run),
    * so no (doc, word) explode/shuffle exists at any scale; distinct
    * 2-grams come from the WordShingles codegen expression.
    */
  /** Per-doc repetition metrics over a (doc_id, text) frame. */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    // tokens materialized once; referencing split() inside the HOF
    // lambdas would re-tokenize per array element (CLAUDE.md rule)
    val toksDf = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    val maxRun = aggregate(
      array_sort(col("toks")),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") === x, acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    toksDf
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        maxRun.as("max_word_n"),
        size(graft.plans.WordShingles.wordShingles(col("toks"), 2))
          .cast("long").as("n_distinct_2grams"))
      .select(col("doc_id"), col("n_words"),
        round(col("max_word_n").cast("double") / col("n_words"), 6)
          .as("top_word_frac"),
        when(col("n_words") >= 2,
          round(lit(1.0) - col("n_distinct_2grams").cast("double")
            / (col("n_words") - 1), 6)).otherwise(0.0).as("dup_2gram_frac"))
      .withColumn("keep",
        col("top_word_frac") <= TopWordFracMax &&
        col("dup_2gram_frac") <= Dup2gramFracMax)
      .orderBy(col("doc_id"))
  }

  val textRepetition = GraftQuery(
    "text_repetition",
    (s, dir) => repetitionMetrics(Tables(s, dir).documents),
    Some(s"""
      WITH t AS (
        SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
        FROM documents),
      w AS (
        SELECT doc_id, unnest(toks) AS tok, len(toks) AS n FROM t),
      tw AS (
        SELECT doc_id, MAX(c) AS max_c, ANY_VALUE(n) AS n_words FROM (
          SELECT doc_id, tok, COUNT(*) AS c, ANY_VALUE(n) AS n
          FROM w GROUP BY doc_id, tok)
        GROUP BY doc_id),
      g AS (
        SELECT doc_id,
               CASE WHEN len(toks) >= 2 THEN
                 round(1.0 - CAST(len(list_distinct(list_transform(
                   range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
                   / (len(toks) - 1), 6)
               ELSE 0.0 END AS dup_2gram_frac
        FROM t)
      SELECT tw.doc_id,
             CAST(tw.n_words AS BIGINT) AS n_words,
             round(CAST(tw.max_c AS DOUBLE) / tw.n_words, 6) AS top_word_frac,
             g.dup_2gram_frac,
             round(CAST(tw.max_c AS DOUBLE) / tw.n_words, 6) <= $TopWordFracMax
               AND g.dup_2gram_frac <= $Dup2gramFracMax AS keep
      FROM tw JOIN g ON g.doc_id = tw.doc_id
      ORDER BY tw.doc_id
    """)
  )

  /** Temperature-weighted domain mixture (alpha = 0.5): keep
    * floor(sqrt(count_d)) documents of each source — the sqrt
    * tempering that flattens domain skew in training mixtures
    * (heavy domains are down-sampled hardest). Selection is the same
    * deterministic md5 order as sample_stratified. The per-source
    * target deliberately avoids a global weight NORMALIZATION sum:
    * sqrt is correctly rounded in every IEEE engine so the allocation
    * hashes bit-identically, while a cross-source float sum would be
    * addition-order-dependent. One count pass + one stratum shuffle.
    */
  val sampleMixture = GraftQuery(
    "sample_mixture",
    (s, dir) => {
      val t = Tables(s, dir)
      val counts = t.documents.groupBy(col("source"))
        .agg(count(lit(1)).as("c"))
        .select(col("source"), floor(sqrt(col("c"))).cast("long").as("n_take"))
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      t.documents
        .select(col("source"), col("doc_id"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .join(broadcast(counts), Seq("source"))
        .filter(col("rk") <= col("n_take"))
        .select(col("source"), col("doc_id"), col("rk"))
        .orderBy(col("source"), col("rk"))
    },
    Some("""
      WITH cnt AS (
        SELECT source, CAST(floor(sqrt(COUNT(*))) AS BIGINT) AS n_take
        FROM documents GROUP BY source),
      ranked AS (
        SELECT source, doc_id,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
        FROM documents)
      SELECT r.source, r.doc_id, r.rk
      FROM ranked r JOIN cnt ON cnt.source = r.source
      WHERE r.rk <= cnt.n_take
      ORDER BY r.source, r.rk
    """)
  )

  /** Cross-source contamination matrix: for every source pair, the
    * number of distinct word-trigram shingles they share and the
    * shingle-set Jaccard — the corpus-level view of decontamination
    * (text_decontaminate is the doc-level form). The inverted-index
    * shape scales: one distinct on (source, shingle), one self-join
    * keyed on the shingle, pair fan-out bounded by sources² per
    * shingle — never documents².
    */
  val textSourceOverlap = GraftQuery(
    "text_source_overlap",
    (s, dir) => {
      val t = Tables(s, dir)
      val sh = t.documents
        .select(col("source"),
          explode(graft.plans.WordShingles.wordShingles(tokens(col("text")), 3))
            .as("shingle"))
        .distinct()
        .cache()
      val cnt = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val ov = sh.as("a").join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
      val out = ov
        .join(broadcast(cnt.select(col("source").as("src_a"), col("n").as("na"))), Seq("src_a"))
        .join(broadcast(cnt.select(col("source").as("src_b"), col("n").as("nb"))), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("n_shared"),
          round(col("n_shared").cast("double")
            / (col("na") + col("nb") - col("n_shared")), 6).as("jaccard"))
        .orderBy(col("src_a"), col("src_b"))
      out.persist().count()
      sh.unpersist(false)
      out
    },
    Some("""
      WITH sh AS (
        SELECT DISTINCT source, shingle FROM (
          SELECT source,
                 unnest(list_distinct(list_transform(
                   range(1, greatest(len(toks) - 1, 1)),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
          FROM (SELECT source, string_split_regex(lower(text), '\s+') AS toks
                FROM documents))),
      cnt AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
      ov AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared,
             round(CAST(n_shared AS DOUBLE) / (ca.n + cb.n - n_shared), 6) AS jaccard
      FROM ov
      JOIN cnt ca ON ca.source = src_a
      JOIN cnt cb ON cb.source = src_b
      ORDER BY src_a, src_b
    """)
  )

  /** Token window for passage-level dedup (finer than ChunkTokens —
    * boilerplate spans are shorter than training chunks).
    */
  val PassageTokens = 20

  /** Passage-level dedup (CCNet/RefinedWeb "remove duplicated spans"):
    * split every document into fixed token windows, hash each window,
    * and measure per document what fraction of its passages also occur
    * elsewhere in the corpus; documents above 50 % duplicated passage
    * mass are dropped. Catches partial-overlap duplication that
    * document-level hashing (dedup_exact) misses and page-level
    * Jaccard underweights. One explode + one hash-key aggregation —
    * the shuffle carries 16-byte hashes, never text.
    */
  val textPassageDedup = GraftQuery(
    "text_passage_dedup",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = t.documents
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .cache()
      val passages = toks
        .withColumn("n", size(col("toks")).cast("long"))
        .withColumn("p_idx",
          explode(sequence(lit(0L), floor((col("n") - 1) / PassageTokens).cast("long"))))
        .select(col("doc_id"),
          md5(concat_ws(" ",
            slice(col("toks"), (col("p_idx") * PassageTokens + 1).cast("int"),
              lit(PassageTokens))).cast("binary")).as("p_hash"))
      val df = passages.groupBy(col("p_hash"))
        .agg(count(lit(1)).as("occurrences"))
      val out = passages.join(df, Seq("p_hash"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_passages"),
          sum(when(col("occurrences") > 1, 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_passages"), col("n_dup"),
          (col("n_dup") * 2 < col("n_passages")).as("keep"))
        .orderBy(col("doc_id"))
      out.persist().count()
      toks.unpersist(false)
      out
    },
    Some(raw"""
      WITH t AS (
        SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks,
               CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n
        FROM documents),
      p AS (
        SELECT doc_id,
               md5(array_to_string(
                 list_slice(toks, pi * $PassageTokens + 1,
                   least((pi + 1) * $PassageTokens, n)), ' ')) AS p_hash
        FROM (SELECT doc_id, toks, n,
                     CAST(unnest(range(0, (n - 1) // $PassageTokens + 1)) AS BIGINT) AS pi
              FROM t)),
      df AS (SELECT p_hash, COUNT(*) AS occurrences FROM p GROUP BY p_hash)
      SELECT p.doc_id,
             COUNT(*) AS n_passages,
             CAST(SUM(CASE WHEN df.occurrences > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             CAST(SUM(CASE WHEN df.occurrences > 1 THEN 1 ELSE 0 END) AS BIGINT) * 2
               < COUNT(*) AS keep
      FROM p JOIN df ON p.p_hash = df.p_hash
      GROUP BY p.doc_id
      ORDER BY p.doc_id
    """)
  )

  /** Count-min sketch geometry: depth (independent hash rows) and
    * width (buckets per row). ε = e/width ≈ 0.0106, δ = e^−depth ≈
    * 0.018: estimates overshoot the true count by more than ε·N with
    * probability < δ per query.
    */
  val CmsDepth = 4
  val CmsWidth = 256

  /** Count-min sketch of corpus token frequencies, audited against
    * exact counts — the fixed-memory frequency summary that, unlike
    * Misra–Gries (text_heavy_hitters), supports point queries for ANY
    * term, not just the heavy head. The sketch is depth×width = 1024
    * counters regardless of vocabulary size; each token increments
    * one bucket per row (seeded xxhash64), and a point estimate is
    * the MIN of its row buckets.
    *
    * Spark shape: building the sketch is ONE map-side-combined
    * aggregation over (row, bucket) — posexplode of the depth hash
    * array, no UDFs, fully codegen'd. The audit joins the top-20
    * exact counts against the domain-sized sketch frame broadcast.
    * The CMS guarantees ride as Spark-verified booleans: est ≥ exact
    * always (one-sided error, a hard invariant), and est ≤ exact +
    * ε·N per audited term (binding here: no δ slack is consumed at
    * this vocabulary). The oracle hashes the exact counts + ranks —
    * seeded xxhash64 bucketing isn't portable SQL — same gate
    * pattern as graph_pagerank.
    */
  val textCmsFreq = GraftQuery(
    "text_cms_freq",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = t.documents
        .select(explode(tokens(col("text"))).as("term"))
        .filter(col("term") =!= "").cache()
      val hashes = array((0 until CmsDepth).map(r =>
        pmod(xxhash64(lit(r), col("term")), lit(CmsWidth)).cast("int")): _*)
      val sketch = toks
        .select(posexplode(hashes).as(Seq("row", "bucket")))
        .groupBy(col("row"), col("bucket"))
        .agg(count(lit(1)).as("c"))
        .cache()
      val total = toks.count()
      val eps = math.E / CmsWidth
      val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      // exact top-20 via the bounded-heap string aggregator (no
      // vocabulary-wide single-reducer rank)
      val topAgg = udaf(new graft.functions.TopKStrAgg(20))
      val top = exact
        .agg(topAgg(col("cnt").cast(DoubleType), col("term")).as("t"))
        .select(posexplode(col("t")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("col.payload").as("term"),
          col("col.sortKey").cast("long").as("cnt"))
      val probes = top
        .select(col("rank"), col("term"), col("cnt"),
          posexplode(hashes).as(Seq("row", "bucket")))
        .join(broadcast(sketch), Seq("row", "bucket"))
        .groupBy(col("rank"), col("term"), col("cnt"))
        .agg(min(col("c")).as("est"))
      val out = probes
        .select(col("rank"), col("term"), col("cnt"),
          (col("est") >= col("cnt")).as("overcount_ok"),
          (col("est") <= col("cnt") + lit(eps * total)).as("eps_bound_ok"))
        .orderBy(col("rank"))
      out.persist().count()
      toks.unpersist(false)
      sketch.unpersist(false)
      out
    },
    Some(raw"""
      WITH toks AS (
        SELECT unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents),
      ex AS (SELECT term, COUNT(*) AS cnt FROM toks WHERE term <> '' GROUP BY 1),
      ranked AS (
        SELECT term, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rank
        FROM ex)
      SELECT rank, term, cnt, TRUE AS overcount_ok, TRUE AS eps_bound_ok
      FROM ranked WHERE rank <= 20
      ORDER BY rank
    """)
  )

  /** Bigram language-model scoring with add-one smoothing — the
    * context-aware upgrade of text_unigram_lm: per-doc mean
    * log P(wᵢ | wᵢ₋₁) where P = (c(w₁,w₂)+1)/(c(w₁·)+V). Word-order
    * scrambles that unigram perplexity cannot see drop straight out
    * of this score, which is why C4/CCNet-style quality filters run
    * an n-gram LM, not a bag of words.
    *
    * Shapes: ONE doc_id exchange serves both the bigram lag window
    * and the final per-doc aggregation; the model build is two
    * chained combine-enabled aggregations (bigram counts, then prefix
    * counts as a regroup of the bigram frame — the corpus is NOT
    * rescanned for c(w₁·)); scoring joins doc bigrams to the model on
    * the bigram key — a plain shuffle join that scales with corpus
    * size, where a broadcast would cap the model at driver memory.
    * Each logp is rounded to 6dp then summed as DECIMAL(25,6):
    * order-free, so the double at the end is bit-stable.
    */
  val textBigramLm = GraftQuery(
    "text_bigram_lm",
    (s, dir) => {
      val t = Tables(s, dir)
      // doc-local adjacency derived ARRAY-side (zip of shifted
      // slices): the bigram frame explodes straight out of the scan
      // with ZERO exchange before the bigram-key aggregation — the
      // posexplode → per-doc window-lag alternative pays a full
      // per-token (doc_id) shuffle+sort first
      val tl = t.documents
        .select(col("doc_id"), filter(tokens(col("text")), _ =!= "").as("l"))
      val pairLen = greatest(size(col("l")) - 1, lit(0))
      val big = tl
        .select(col("doc_id"),
          explode(zip_with(
            slice(col("l"), lit(1), pairLen),
            slice(col("l"), lit(2), pairLen),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .cache()
      val cnt2 = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val cnt1 = cnt2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
      val vocab = tl.select(explode(col("l")).as("term"))
        .agg(countDistinct(col("term")).as("vsz"))
      val model = cnt2.join(cnt1, Seq("w1")).crossJoin(broadcast(vocab))
        .select(col("w1"), col("w2"),
          round(log((col("c2").cast("double") + lit(1.0)) /
            (col("c1").cast("double") + col("vsz").cast("double"))), 6).as("logp"))
      val out = big.join(model, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_bigrams"),
          graft.functions.GraftFunctions.sumDec(col("logp")).as("sum_logp"))
        .select(col("doc_id"), col("n_bigrams"), col("sum_logp"),
          round(col("sum_logp") / col("n_bigrams"), 6).as("avg_logp"))
        .orderBy(col("doc_id"))
      out.persist().count()
      big.unpersist(false)
      out
    },
    Some(raw"""
      WITH tl AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS l
        FROM documents),
      b0 AS (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM tl),
      big AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2 FROM b0),
      cnt2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
      cnt1 AS (SELECT w1, SUM(c2) AS c1 FROM cnt2 GROUP BY 1),
      v AS (SELECT COUNT(DISTINCT term) AS vsz
            FROM (SELECT unnest(l) AS term FROM tl)),
      model AS (
        SELECT w1, w2,
               round(ln((CAST(c2 AS DOUBLE) + 1.0)
                 / (CAST(c1 AS DOUBLE) + CAST(vsz AS DOUBLE))), 6) AS logp
        FROM cnt2 JOIN cnt1 USING (w1) CROSS JOIN v)
      SELECT doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(CAST(logp AS DECIMAL(25,6))) AS DOUBLE) AS sum_logp,
             round(CAST(SUM(CAST(logp AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(*), 6) AS avg_logp
      FROM big JOIN model USING (w1, w2)
      GROUP BY doc_id
      ORDER BY doc_id
    """)
  )

  /** BM25 parameters (the Robertson/Okapi defaults). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25TopK = 10L

  /** The retrieval query set: fixed multi-term queries over the
    * corpus vocabulary (a search workload is data, not schema — real
    * deployments stream these in; three literals keep the oracle
    * self-contained).
    */
  val Bm25Queries: Seq[(Long, String)] = Seq(
    1L -> "hash join merge",
    2L -> "window agg stream",
    3L -> "vector scan filter sort")

  /** BM25 ranked retrieval: inverted index (postings = the (term,
    * doc, tf) frame) + Okapi BM25 scoring + per-query top-k — the
    * full-text-search shape engines ship as a separate FTS extension,
    * here three relational aggregates. Scale: the postings build is
    * one explode + one (doc,term) shuffle over the corpus; df/avgdl
    * are small rollups; query terms BROADCAST into the postings scan
    * (a 100 TB corpus is scanned once, no shuffle keyed on query);
    * and the per-query top-k is the bounded-heap [[TopKAgg]] —
    * map-side combined, so no reducer ever holds a query's full
    * candidate list. Per-term contributions are rounded then
    * decimal-summed (order-free) for cross-engine hash parity.
    */
  /** The BM25 ranked frame (qid, rank, doc_id, score) — the body of
    * text_bm25, shared with the hybrid-RRF fusion query. Result is
    * persisted (30 rows); the postings intermediate is released.
    */
  private[operators] def bm25RankedFrame(
      s: SparkSession, dir: String): DataFrame = {
      import graft.functions.TopKAgg
      import graft.functions.GraftFunctions.sumDec
      import s.implicits._
      val t = Tables(s, dir)
      val terms = fanned(t.documents)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .filter(length(col("term")) >= 3 && !isStopword(col("term")))
      val tf = terms.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .persist()
      val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val stats = tf.agg(
        count_distinct(col("doc_id")).as("n_docs"),
        (sum(col("tf")).cast("double") /
          count_distinct(col("doc_id")).cast("double")).as("avgdl"))
      val qterms = Bm25Queries.toDF("qid", "qtext")
        .select(col("qid"), explode(tokens(col("qtext"))).as("term"))
      val idf = log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      val tfc = col("tf").cast("double") * lit(Bm25K1 + 1.0) /
        (col("tf").cast("double") + lit(Bm25K1) *
          (lit(1.0) - lit(Bm25B) +
            lit(Bm25B) * (col("dl").cast("double") / col("avgdl"))))
      val contrib = round(idf * tfc, 6)
      val topk = udaf(new TopKAgg(Bm25TopK.toInt))
      val scored = tf
        .join(broadcast(qterms.join(dfq, Seq("term"))), Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .groupBy(col("qid"), col("doc_id"))
        .agg(sumDec(contrib).as("score"))
      val out = scored
        .groupBy(col("qid"))
        .agg(topk(col("score"), col("doc_id"), col("doc_id")).as("top"))
        .select(col("qid"), posexplode(col("top")))
        .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
          col("col.payload").as("doc_id"), col("col.sortKey").as("score"))
        .orderBy(col("qid"), col("rank"))
      out.persist().count()
      tf.unpersist(false)
      out
  }

  /** Session-memoized [[bm25RankedFrame]] — the postings/df/dl build
    * runs once under `_shared_build`; text_bm25 and
    * retrieval_hybrid_rrf both read the 30-row ranked frame.
    */
  private[graft] def bm25RankedShared(
      s: SparkSession, dir: String): DataFrame =
    sharedFrame(s, dir, "bm25_ranked")(bm25RankedFrame(s, dir))

  /** DuckDB restatement of [[bm25RankedFrame]] — CTEs through
    * `ranked` (qid, doc_id, score, rank), interpolated into both the
    * text_bm25 oracle and the hybrid-RRF oracle.
    */
  private val Bm25SqlCtes: String = raw"""terms AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents),
      filtered AS (
        SELECT doc_id, term FROM terms
        WHERE length(term) >= 3
          AND NOT list_contains(['the','a','of','to','and','in','is','it','that','for'], term)),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM filtered GROUP BY 1, 2),
      dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
      stats AS (SELECT COUNT(DISTINCT doc_id) AS n_docs,
                       CAST(SUM(tf) AS DOUBLE)
                         / CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS avgdl
                FROM tf),
      qterms AS (
        SELECT qid, unnest(string_split_regex(lower(qtext), '\s+')) AS term
        FROM (VALUES (1, 'hash join merge'), (2, 'window agg stream'),
                     (3, 'vector scan filter sort')) q(qid, qtext)),
      contribs AS (
        SELECT q.qid, tf.doc_id,
               round(ln(1.0 + (CAST(n_docs AS BIGINT) - df + 0.5) / (df + 0.5))
                 * (CAST(tf AS DOUBLE) * 2.2
                    / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75
                       + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))), 6) AS contrib
        FROM tf
        JOIN qterms q USING (term)
        JOIN dfq USING (term)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats),
      scored AS (
        SELECT qid, doc_id,
               CAST(SUM(CAST(contrib AS DECIMAL(25,6))) AS DOUBLE) AS score
        FROM contribs GROUP BY 1, 2),
      ranked AS (
        SELECT CAST(qid AS BIGINT) AS qid, doc_id, score,
               CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        FROM scored)"""

  val textBm25 = GraftQuery(
    "text_bm25",
    (s, dir) => bm25RankedShared(s, dir),
    Some(s"""
      WITH $Bm25SqlCtes
      SELECT qid, rank, doc_id, score FROM ranked WHERE rank <= $Bm25TopK
      ORDER BY qid, rank
    """)
  )

  /** DSIR selection size and the target-defining token (the planted
    * near-dup family shares content, so its unigram distribution is
    * genuinely distinct from the corpus — the property importance
    * weighting exploits).
    */
  val DsirSelectK = 50L
  val DsirTargetToken = "dup"

  /** Importance-weighted domain selection (the DSIR shape: score
    * corpus documents by the log-likelihood ratio of a target-domain
    * unigram LM vs the corpus LM, keep the top-scoring slice). Target
    * membership here is a token predicate; in production it's "docs
    * from the domain you want more of". Both LMs are add-one
    * smoothed over the CORPUS vocabulary, so every corpus token has a
    * finite ratio; per-doc score = length-normalized mean log-ratio.
    *
    * Scale: two token-level aggregates (corpus and target counts —
    * the target side aggregates only the target slice), a broadcast
    * of the term→ratio map back into one corpus scan, and the global
    * top-k through the bounded-heap [[TopKAgg]] (map-side combined —
    * no global sort, no single reducer holding the corpus).
    */
  val textDsirSelect = GraftQuery(
    "text_dsir_select",
    (s, dir) => {
      import graft.functions.TopKAgg
      import graft.functions.GraftFunctions.sumDec
      val t = Tables(s, dir)
      val toks = t.documents
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .filter(col("term") =!= "").persist()
      val targetIds = toks.filter(col("term") === DsirTargetToken)
        .select(col("doc_id")).distinct()
      val corpusCnt = toks.groupBy(col("term")).agg(count(lit(1)).as("cc"))
      val targetCnt = toks.join(broadcast(targetIds), Seq("doc_id"))
        .groupBy(col("term")).agg(count(lit(1)).as("tc"))
      val totals = corpusCnt.agg(
        sum(col("cc")).as("corpus_total"),
        count(lit(1)).as("vocab"))
      val targetTotal = targetCnt.agg(sum(col("tc")).as("target_total"))
      val pt = (coalesce(col("tc"), lit(0L)) + 1).cast("double") /
        (col("target_total") + col("vocab")).cast("double")
      val pc = (col("cc") + 1).cast("double") /
        (col("corpus_total") + col("vocab")).cast("double")
      val ratios = corpusCnt
        .join(targetCnt, Seq("term"), "left_outer")
        .crossJoin(broadcast(totals)).crossJoin(broadcast(targetTotal))
        .select(col("term"), round(log(pt / pc), 6).as("lr"))
      val weights = toks.join(broadcast(ratios), Seq("term"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sumDec(col("lr")).as("sum_lr"))
        .select(col("doc_id"),
          round(col("sum_lr") / col("n_tokens"), 6).as("w"))
      val topk = udaf(new TopKAgg(DsirSelectK.toInt))
      val out = weights
        .agg(topk(col("w"), col("doc_id"), col("doc_id")).as("top"))
        .select(posexplode(col("top")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("col.payload").as("doc_id"), col("col.sortKey").as("weight"))
        .join(targetIds.withColumn("is_target", lit(true)), Seq("doc_id"), "left_outer")
        .select(col("rank"), col("doc_id"),
          col("weight"), coalesce(col("is_target"), lit(false)).as("is_target"))
        .orderBy(col("rank"))
      out.persist().count()
      toks.unpersist(false)
      out
    },
    Some(raw"""
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents),
      tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
      target_ids AS (
        SELECT DISTINCT doc_id FROM tk WHERE term = '$DsirTargetToken'),
      cc AS (SELECT term, COUNT(*) AS cc FROM tk GROUP BY 1),
      tc AS (SELECT term, COUNT(*) AS tc FROM tk
             WHERE doc_id IN (SELECT doc_id FROM target_ids) GROUP BY 1),
      totals AS (SELECT SUM(cc) AS corpus_total, COUNT(*) AS vocab FROM cc),
      tt AS (SELECT SUM(tc) AS target_total FROM tc),
      ratios AS (
        SELECT cc.term,
               round(ln((CAST(coalesce(tc, 0) + 1 AS DOUBLE)
                           / CAST(target_total + vocab AS DOUBLE))
                        / (CAST(cc + 1 AS DOUBLE)
                           / CAST(corpus_total + vocab AS DOUBLE))), 6) AS lr
        FROM cc LEFT JOIN tc ON cc.term = tc.term
        CROSS JOIN totals CROSS JOIN tt),
      weights AS (
        SELECT doc_id,
               round(CAST(SUM(CAST(lr AS DECIMAL(25,6))) AS DOUBLE)
                 / COUNT(*), 6) AS w
        FROM tk JOIN ratios USING (term)
        GROUP BY doc_id),
      ranked AS (
        SELECT doc_id, w,
               CAST(row_number() OVER (ORDER BY w DESC, doc_id) AS BIGINT)
                 AS rank
        FROM weights)
      SELECT rank, r.doc_id, w AS weight,
             r.doc_id IN (SELECT doc_id FROM target_ids) AS is_target
      FROM ranked r WHERE rank <= $DsirSelectK
      ORDER BY rank
    """)
  )

  /** The pretraining-pipeline FUNNEL — the capstone composition: one
    * scan computes every per-document signal (normalized-text hash,
    * language, quality, token count, benchmark 8-gram overlap), and
    * the registered output is the per-stage survivor counts and token
    * mass of the standard corpus-prep sequence
    * raw → exact-dedup → language → quality → decontamination —
    * exactly the report a data-curation run publishes. Stage
    * predicates are the SAME expressions the component queries
    * register (text_training_set, text_decontaminate), so this query
    * pins their composition, not new semantics.
    *
    * Scale: one corpus scan + one md5-keyed window (uniform keys) +
    * the broadcast benchmark-gram join; the funnel itself is a single
    * aggregate with conditional sums — adding a stage costs one
    * column, not one pass.
    */
  val pipelineFunnel = GraftQuery(
    "pipeline_pretrain_funnel",
    (s, dir) => {
      val base = scoredDocsShared(s, dir)
      val bench = base.filter(col("doc_id") < BenchmarkIdBound)
        .select(explode(col("g")).as("gram")).distinct()
      val contaminated = base.filter(col("doc_id") >= BenchmarkIdBound)
        .select(col("doc_id"), explode(col("g")).as("gram"))
        .join(broadcast(bench), Seq("gram"))
        .select(col("doc_id")).distinct()
        .withColumn("contam", lit(true))
      val w = Window.partitionBy(col("h"))
      val flags = base
        .withColumn("canon", min(col("doc_id")).over(w))
        .join(broadcast(contaminated), Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_tokens"),
          (col("doc_id") === col("canon")).as("k1"),
          (col("lang") === "en").as("k2"),
          (col("quality") >= 0.5 && col("n_tokens") >= 30).as("k3"),
          (col("doc_id") >= BenchmarkIdBound &&
            !coalesce(col("contam"), lit(false))).as("k4"))
      def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
      def tokc(c: Column) = sum(when(c, col("n_tokens")).otherwise(0L))
      val s12 = col("k1")
      val s123 = s12 && col("k2")
      val s1234 = s123 && col("k3")
      val s12345 = s1234 && col("k4")
      val aggd = flags.agg(
        count(lit(1)).as("c1"), sum(col("n_tokens")).as("t1"),
        cnt(s12).as("c2"), tokc(s12).as("t2"),
        cnt(s123).as("c3"), tokc(s123).as("t3"),
        cnt(s1234).as("c4"), tokc(s1234).as("t4"),
        cnt(s12345).as("c5"), tokc(s12345).as("t5"))
      def stageStruct(ord: Long, name: String, c: String, tk: String) =
        struct(lit(ord).as("stage_ord"), lit(name).as("stage"),
          col(c).as("n_docs"), col(tk).as("n_tokens"))
      val out = aggd.select(explode(array(
          stageStruct(1L, "raw", "c1", "t1"),
          stageStruct(2L, "exact_dedup", "c2", "t2"),
          stageStruct(3L, "lang_en", "c3", "t3"),
          stageStruct(4L, "quality", "c4", "t4"),
          stageStruct(5L, "decontaminated", "c5", "t5"))).as("s"))
        .select(col("s.stage_ord").as("stage_ord"), col("s.stage").as("stage"),
          col("s.n_docs").as("n_docs"), col("s.n_tokens").as("n_tokens"))
        .orderBy(col("stage_ord"))
      out.persist().count()
      out
    },
    Some(raw"""
      WITH $ScoredSqlCtes,
      g AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(text), '\s+')) - ${DecontaminateN - 2}, 1)),
                 i -> ${(0 until DecontaminateN).map(j => s"string_split_regex(lower(text), '\\s+')[i+$j]").mkString(" || ' ' || ")}
               )) AS grams
        FROM documents),
      bench AS (
        SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < $BenchmarkIdBound),
      contaminated AS (
        SELECT DISTINCT c.doc_id
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g
              WHERE doc_id >= $BenchmarkIdBound) c
        JOIN bench b ON c.gram = b.gram),
      flags AS (
        SELECT s.doc_id, s.n_tokens,
               (s.doc_id = c.canon_id) AS k1,
               (s.lang = 'en') AS k2,
               (s.quality >= 0.5 AND s.n_tokens >= 30) AS k3,
               (s.doc_id >= $BenchmarkIdBound AND s.doc_id NOT IN
                 (SELECT doc_id FROM contaminated)) AS k4
        FROM scored s JOIN canon c ON s.h = c.ch)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS stage_ord, 'raw' AS stage,
               COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM flags
        UNION ALL
        SELECT 2, 'exact_dedup', COUNT(*) FILTER (WHERE k1),
               CAST(coalesce(SUM(n_tokens) FILTER (WHERE k1), 0) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT 3, 'lang_en', COUNT(*) FILTER (WHERE k1 AND k2),
               CAST(coalesce(SUM(n_tokens) FILTER (WHERE k1 AND k2), 0) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT 4, 'quality', COUNT(*) FILTER (WHERE k1 AND k2 AND k3),
               CAST(coalesce(SUM(n_tokens) FILTER (WHERE k1 AND k2 AND k3), 0) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT 5, 'decontaminated',
               COUNT(*) FILTER (WHERE k1 AND k2 AND k3 AND k4),
               CAST(coalesce(SUM(n_tokens) FILTER (WHERE k1 AND k2 AND k3 AND k4), 0) AS BIGINT)
        FROM flags)
      ORDER BY stage_ord
    """)
  )

  /** RRF constant (Cormack et al.'s k=60) and fusion depth. */
  val RrfK = 60
  val RrfDepth = 10L

  /** Hybrid retrieval via Reciprocal Rank Fusion: the lexical arm is
    * the shared BM25 ranked frame (query text), the semantic arm is
    * exact-cosine ranking treating embedding vec_id = qid as a
    * query-by-example vector, and fusion scores each candidate
    * sum(1/(k + rank)) over the arms that surfaced it — the standard
    * way production search fuses FTS with vector search, rank-only so
    * the arms' incomparable score scales never touch. Each arm's
    * contribution is rounded then the two are added as decimals
    * (exact, order-free); candidates ride a full outer join on
    * (qid, id). Scale: each arm is already top-[[RrfDepth]] per
    * query, so fusion joins two query-count-sized frames — the
    * corpus-sized work lives (once) inside the arms, which at 100 TB
    * are the BM25 postings scan and the ANN index respectively.
    */
  val retrievalHybridRrf = GraftQuery(
    "retrieval_hybrid_rrf",
    (s, dir) => {
      import graft.functions.GraftFunctions.cosineSim
      val lex = bm25RankedShared(s, dir)
        .filter(col("rank") <= RrfDepth)
        .select(col("qid"), col("doc_id").as("id"), col("rank").as("lex_rank"))
      val base = Similarity.corpusOf(s, dir)
      val qv = base.filter(col("vec_id").isin(1L, 2L, 3L))
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))
      val sem = base.join(broadcast(qv), col("vec_id") =!= col("qid"))
        .withColumn("cos", cosineSim(col("qv"), col("v")))
        .withColumn("sem_rank", row_number().over(w).cast("long"))
        .filter(col("sem_rank") <= RrfDepth)
        .select(col("qid"), col("vec_id").as("id"), col("sem_rank"))
      val contrib = (r: Column) =>
        coalesce(round(lit(1.0) / (lit(RrfK.toDouble) + r.cast("double")), 9)
          .cast("decimal(25,9)"), lit(0).cast("decimal(25,9)"))
      val wOut = Window.partitionBy(col("qid"))
        .orderBy(col("rrf").desc, col("id"))
      lex.join(sem, Seq("qid", "id"), "full_outer")
        .withColumn("rrf",
          (contrib(col("lex_rank")) + contrib(col("sem_rank"))).cast("double"))
        .withColumn("rank", row_number().over(wOut).cast("long"))
        .filter(col("rank") <= RrfDepth)
        .select(col("qid"), col("rank"), col("id"), col("rrf"),
          col("lex_rank"), col("sem_rank"))
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"""
      WITH $Bm25SqlCtes,
      lex AS (
        SELECT qid, doc_id AS id, rank AS lex_rank
        FROM ranked WHERE rank <= $RrfDepth),
      sem0 AS (
        SELECT CAST(q.vec_id AS BIGINT) AS qid, e.vec_id AS id,
               CAST(row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                   CAST(q.embedding AS DOUBLE[]),
                   CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id)
                 AS BIGINT) AS sem_rank
        FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
        WHERE q.vec_id IN (1, 2, 3)),
      sem AS (SELECT * FROM sem0 WHERE sem_rank <= $RrfDepth),
      fused AS (
        SELECT coalesce(lex.qid, sem.qid) AS qid,
               coalesce(lex.id, sem.id) AS id,
               lex_rank, sem_rank,
               CAST(coalesce(CAST(round(1.0 / ($RrfK.0 + CAST(lex_rank AS DOUBLE)), 9)
                      AS DECIMAL(25,9)), 0)
                 + coalesce(CAST(round(1.0 / ($RrfK.0 + CAST(sem_rank AS DOUBLE)), 9)
                      AS DECIMAL(25,9)), 0) AS DOUBLE) AS rrf
        FROM lex FULL OUTER JOIN sem
          ON lex.qid = sem.qid AND lex.id = sem.id),
      fin AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY rrf DESC, id) AS BIGINT) AS rank
        FROM fused)
      SELECT qid, rank, id, rrf, lex_rank, sem_rank
      FROM fin WHERE rank <= $RrfDepth
      ORDER BY qid, rank
    """)
  )

  /** Feature-hashing bucket count. */
  val HashingDim = 64

  /** Hashing-trick featurization (the HashingVectorizer /
    * hashingTF shape): token → bucket via the first 8 hex digits of
    * md5 mod [[HashingDim]] — collision-accepting, vocabulary-free,
    * so the featurizer needs NO fitted dictionary and a 100 TB corpus
    * featurizes in one embarrassingly-parallel pass (explode →
    * per-(doc, bucket) count; the aggregate's key space is bounded by
    * docs × [[HashingDim]]). The same md5 spelling backs both
    * engines, so the sparse vectors are bit-identical — the
    * train/serve skew check a real feature platform runs.
    */
  val featHashingTrick = GraftQuery(
    "feat_hashing_trick",
    (s, dir) => {
      val t = Tables(s, dir)
      val term = col("term")
      val bucket = pmod(
        conv(substring(md5(term.cast("binary")), 1, 8), 16, 10).cast("long"),
        lit(HashingDim.toLong))
      t.documents
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .filter(term =!= "")
        .groupBy(col("doc_id"), bucket.as("bucket"))
        .agg(count(lit(1)).as("tf"))
        .orderBy(col("doc_id"), col("bucket"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS term
        FROM documents),
      b AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(term), 1, 8)) AS BIGINT)
                 % $HashingDim AS bucket
        FROM toks WHERE term <> '')
      SELECT doc_id, bucket, COUNT(*) AS tf
      FROM b
      GROUP BY 1, 2
      ORDER BY doc_id, bucket
    """)
  )

  /** Gram length (in tokens) for exact-substring dedup. Real corpus
    * dedup uses ~50-token grams (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better"); the fixtures' documents are
    * short, so a smaller window exercises the same machinery.
    */
  val SubstringGramTokens = 8

  /** Exact-substring duplicated-span stats per document: every
    * overlapping [[SubstringGramTokens]]-token gram is hashed, grams
    * occurring more than once in the corpus mark their start
    * positions as duplicated, and per document the duplicated
    * positions are merged into MAXIMAL spans (two grams merge when
    * their covered token intervals overlap or touch, i.e. start
    * distance <= k). This is the suffix-array exact-substring dedup
    * shape re-expressed as dataflow: instead of a monolithic suffix
    * array over the concatenated corpus, an inverted gram index (one
    * hash-partitioned groupBy) finds repeats, and a per-doc window
    * pass merges them into maximal islands — every stage is a plain
    * shuffle-or-window over linear-in-token data, so it runs at
    * corpus scale where a single suffix array cannot.
    *
    * All arithmetic is integer (positions, counts), so the DuckDB
    * restatement is bit-identical.
    */
  def substringDedupStats(docs: DataFrame, k: Int): DataFrame = {
    // cached: both the gram explode and the final per-doc join read
    // it — without the cache the corpus is scanned and re-tokenized
    // twice
    val toks = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n_tokens"))
      .cache()
    val grams = toks
      .where(col("n_tokens") >= k)
      .select(col("doc_id"),
        explode(sequence(lit(1L), col("n_tokens") - (k - 1))).as("pos"),
        col("toks"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", slice(col("toks"), col("pos").cast("int"), lit(k)))
          .cast("binary")).as("g_hash"))
    // Duplicated grams are typically a small fraction of all grams, so
    // the filter-then-join-back keeps the second shuffle narrow; at
    // 100 TB the duplicated-hash set can additionally seed a Bloom
    // filter pushed into the gram scan (same pattern as
    // textDecontaminateBloom).
    val dupHashes = grams.groupBy(col("g_hash"))
      .agg(count(lit(1)).as("occ"))
      .where(col("occ") > 1)
      .select(col("g_hash"))
    val dupPos = grams.join(dupHashes, Seq("g_hash")).select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val islands = dupPos
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) > k, 1L).otherwise(lit(0L)))
      .withColumn("island", sum(col("brk")).over(w))
    val spans = islands.groupBy(col("doc_id"), col("island"))
      .agg((max(col("pos")) - min(col("pos")) + k).as("covered"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("covered")).as("dup_tokens"))
    val out = toks.select(col("doc_id"), col("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)) * 5 < col("n_tokens")).as("keep"))
      .orderBy(col("doc_id"))
    out.persist().count()
    toks.unpersist(false)
    out
  }

  val textSubstringDedup = GraftQuery(
    "text_substring_dedup",
    (s, dir) => substringDedupStats(Tables(s, dir).documents, SubstringGramTokens),
    Some(raw"""
      WITH t AS (
        SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks,
               CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      g AS (
        SELECT doc_id, CAST(pos AS BIGINT) AS pos,
               md5(array_to_string(
                 list_slice(toks, pos, pos + $SubstringGramTokens - 1), ' ')) AS g_hash
        FROM (SELECT doc_id, toks,
                     unnest(range(1, CAST(n_tokens - ($SubstringGramTokens - 1) AS BIGINT) + 1)) AS pos
              FROM t WHERE n_tokens >= $SubstringGramTokens)),
      dup_hashes AS (SELECT g_hash FROM g GROUP BY g_hash HAVING COUNT(*) > 1),
      dup_pos AS (SELECT doc_id, pos FROM g JOIN dup_hashes USING (g_hash)),
      isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                      > $SubstringGramTokens THEN 1 ELSE 0 END AS brk
        FROM dup_pos),
      isl2 AS (
        SELECT doc_id, pos,
               CAST(SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS island
        FROM isl),
      spans AS (
        SELECT doc_id, island,
               MAX(pos) - MIN(pos) + $SubstringGramTokens AS covered
        FROM isl2 GROUP BY doc_id, island),
      per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(covered) AS BIGINT) AS dup_tokens
        FROM spans GROUP BY doc_id)
      SELECT t.doc_id, t.n_tokens,
             COALESCE(p.n_spans, 0) AS n_spans,
             COALESCE(p.dup_tokens, 0) AS dup_tokens,
             COALESCE(p.dup_tokens, 0) * 5 < t.n_tokens AS keep
      FROM t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
      ORDER BY t.doc_id
    """)
  )

  /** N-gram size for the novelty scorer: 5-token spans — short enough
    * that cross-document phrase reuse registers, long enough that
    * novelty isn't saturated by function-word runs.
    */
  val NoveltyN = 5

  /** Per-document n-gram novelty: the fraction of a document's
    * distinct [[NoveltyN]]-token shingles whose FIRST corpus
    * occurrence (minimum doc_id over every document containing the
    * shingle) is the document itself — the "how much does this doc
    * add" signal curriculum ordering and crawl-increment triage rank
    * by. ONE gram-keyed exchange serves both sides: a window MIN over
    * the gram partition pins first occurrence on the same shuffle
    * that carries membership, then a doc_id aggregation folds the
    * flags; counts stay integral and the score is one division. At
    * 100 TB the gram exchange is the linear-in-tokens cost every
    * inverted-index dedup already pays; no joins, no second scan.
    */
  val textGramNovelty = GraftQuery(
    "text_gram_novelty",
    (s, dir) => {
      val t = Tables(s, dir)
      val grams = t.documents
        .select(col("doc_id"),
          explode(graft.plans.WordShingles.wordShingles(
            tokens(col("text")), NoveltyN)).as("gram"))
      val w = Window.partitionBy(col("gram"))
      grams
        .withColumn("first_doc", min(col("doc_id")).over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          round(col("n_novel").cast("double") / col("n_grams").cast("double"),
            6).as("novelty"))
        .orderBy(col("doc_id"))
    },
    Some(raw"""
      WITH g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(text), '\s+')) - ${NoveltyN - 2}, 1)),
                 i -> ${(0 until NoveltyN).map(j => s"string_split_regex(lower(text), '\\s+')[i+$j]").mkString(" || ' ' || ")}
               ))) AS gram
        FROM documents),
      f AS (
        SELECT doc_id, gram,
               MIN(doc_id) OVER (PARTITION BY gram) AS first_doc
        FROM g)
      SELECT doc_id,
             COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_novel,
             round(CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
      FROM f
      GROUP BY doc_id
      ORDER BY doc_id
    """)
  )

  /** Minimum corpus count for a bigram to be scored as a collocation
    * (standard PMI small-count guard).
    */
  val PmiMinCount = 20L

  /** PMI collocation mining: the token bigrams whose corpus frequency
    * most exceeds what their unigram frequencies predict — the
    * classic phrase-detection signal (word2vec-style phrase merging,
    * tokenizer vocab curation). Ranking is by the LIFT RATIO
    * P(x,y)/(P(x)·P(y)) = (c_xy·N1·N1)/(c_x·c_y·N2), monotone in PMI
    * (log of it) but free of cross-engine log rounding: counts stay
    * exact longs and the ratio is an explicitly-parenthesized double
    * chain both engines state identically. Shapes: tokens
    * materialize in their own projection (the split-re-inline
    * lesson), bigrams explode once, pair counts prune on
    * [[PmiMinCount]] BEFORE the marginal joins, and both marginal
    * joins broadcast the vocab-sized unigram frame. At 100 TB the
    * only data-scale exchanges are the two count aggregations.
    */
  val textPmiCollocations = GraftQuery(
    "text_pmi_collocations",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = t.documents.select(tokens(col("text")).as("toks"))
      val pairs = toks
        .select(slice(col("toks"), lit(1), size(col("toks")) - 1).as("xs"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("ys"))
        .select(explode(arrays_zip(col("xs"), col("ys"))).as("p"))
        .select(col("p.xs").as("x"), col("p.ys").as("y"))
      val uni = toks.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val n1 = uni.agg(sum(col("c")).as("n1"))
      val bc = pairs.groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("cxy"))
        .filter(col("cxy") >= PmiMinCount)
      val n2 = pairs.agg(count(lit(1)).as("n2"))
      bc
        .join(broadcast(uni.select(col("w").as("x"), col("c").as("cx"))), Seq("x"))
        .join(broadcast(uni.select(col("w").as("y"), col("c").as("cy"))), Seq("y"))
        .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
        .select(col("x"), col("y"), col("cxy"), col("cx"), col("cy"),
          (((col("cxy").cast("double") * col("n1")) * col("n1")) /
            ((col("cx").cast("double") * col("cy")) * col("n2")))
            .as("pmi_ratio"))
        .orderBy(col("pmi_ratio").desc, col("x"), col("y"))
        .limit(30)
    },
    Some(s"""
      WITH toks AS (
        SELECT string_split_regex(lower(text), '\\s+') AS tk FROM documents),
      uni AS (SELECT unnest(tk) AS w FROM toks),
      uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY 1),
      bi AS (
        SELECT unnest(list_transform(range(1, greatest(len(tk), 1)),
                 i -> tk[i])) AS x,
               unnest(list_transform(range(1, greatest(len(tk), 1)),
                 i -> tk[i + 1])) AS y
        FROM toks),
      bc AS (
        SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy
        FROM bi GROUP BY 1, 2
        HAVING COUNT(*) >= ${PmiMinCount}),
      n1 AS (SELECT CAST(SUM(c) AS BIGINT) AS n1 FROM uc),
      n2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2 FROM bi)
      SELECT b.x, b.y, b.cxy, ux.c AS cx, uy.c AS cy,
             ((CAST(b.cxy AS DOUBLE) * n1.n1) * n1.n1)
               / ((CAST(ux.c AS DOUBLE) * uy.c) * n2.n2) AS pmi_ratio
      FROM bc b
      JOIN uc ux ON ux.w = b.x
      JOIN uc uy ON uy.w = b.y, n1, n2
      ORDER BY pmi_ratio DESC, b.x, b.y
      LIMIT 30
    """)
  )

  /** Knuth multiplicative-hash constant for the holdout split (public
    * 2^32 golden-ratio multiplier) and permille cutoffs.
    */
  val SplitMultiplier = 2654435761L
  val TrainPermille = 800L
  val ValPermille = 900L

  /** Deterministic train/val/test holdout split — the assignment
    * every training pipeline needs to be REPRODUCIBLE and portable
    * across engines: bucket = (id · 2654435761) mod 2³² mod 1000,
    * split by permille cutoffs (80/10/10). Pure BIGINT arithmetic —
    * no engine-specific hash function — so any system (Spark, DuckDB,
    * a feature store) derives the identical assignment from the key
    * alone; adding documents never reshuffles existing ones
    * (stable splits across corpus refreshes). One codegen projection,
    * no shuffle at all except the presentation sort.
    *
    * The mod-2³² product is computed via 16-bit limbs of the id —
    * `M·id ≡ M·lo + (M·hi mod 2³²)·2¹⁶ (mod 2³²)` — so every
    * intermediate stays ≤ ~6·10¹⁴: a naive `(id·M) % 2³²` silently
    * wraps Long in Spark (negative buckets → everything lands in
    * 'train') and overflow-ERRORS in DuckDB once ids pass ~3.5·10⁹,
    * exactly the corpus sizes the split exists for.
    */
  /** (id·M mod 2³²) mod 1000 in wrap-free 16-bit-limb arithmetic —
    * every intermediate ≤ ~6·10¹⁴. See [[sampleHoldoutSplit]].
    */
  def holdoutBucket(id: Column): Column = {
    val id32 = id % 4294967296L
    val lo = id32.bitwiseAND(lit(65535L))
    val hi = shiftright(id32, 16)
    (((lo * SplitMultiplier) +
      (((hi * SplitMultiplier) % 4294967296L) * 65536L)) %
      4294967296L) % 1000L
  }

  val sampleHoldoutSplit = GraftQuery(
    "sample_holdout_split",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(col("doc_id"), holdoutBucket(col("doc_id")).as("bucket"))
        .withColumn("split",
          when(col("bucket") < TrainPermille, "train")
            .when(col("bucket") < ValPermille, "val")
            .otherwise("test"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH h AS (
        SELECT doc_id,
               ((((doc_id % 4294967296) % 65536) * $SplitMultiplier
                 + ((((doc_id % 4294967296) // 65536) * $SplitMultiplier)
                    % 4294967296) * 65536)
                % 4294967296) % 1000 AS bucket
        FROM documents)
      SELECT doc_id, bucket,
             CASE WHEN bucket < $TrainPermille THEN 'train'
                  WHEN bucket < $ValPermille THEN 'val'
                  ELSE 'test' END AS split
      FROM h
      ORDER BY doc_id
    """)
  )

  /** Bootstrap replicates. */
  val BootstrapReps = 50L

  /** Mixing multiplier separating replicates in the bootstrap hash. */
  val BootstrapMix = 1000003L

  /** Poisson(1) inverse-CDF thresholds at permille resolution:
    * P(≤k) ·1000 rounded — u < 368 → 0, < 736 → 1, < 920 → 2,
    * < 981 → 3, < 996 → 4, < 999 → 5, else 6.
    */
  val PoissonPermille: Seq[Long] = Seq(368L, 736L, 920L, 981L, 996L, 999L)

  /** Poissonized bootstrap confidence interval for the mean order
    * value — THE distributed bootstrap: true with-replacement
    * resampling needs global coordination, but Poisson(1) weights per
    * (row, replicate) are independent and local, converge to the same
    * multinomial resample, and here they are DERIVED from the same
    * wrap-free multiplicative permille hash as sample_holdout_split
    * (u = limbhash(key + replicate·mix)), with the Poisson inverse
    * CDF stated as integer permille thresholds — so every engine
    * derives the identical weights and the whole procedure is
    * reproducible, refresh-stable, and exactly oracle-checkable (NO
    * gates: the CI values themselves hash-match). Each replicate mean
    * is one division of exact longs; the 95% CI takes the 2nd/49th
    * order statistics of the 50 replicate means (replicate-id
    * tie-break). Scale: one broadcast of the 50-row replicate spine,
    * one map-side-combined aggregation over |rows|·B weighted
    * contributions, then 50-row arithmetic.
    */
  val sampleBootstrapCi = GraftQuery(
    "sample_bootstrap_ci",
    (s, dir) => {
      val t = Tables(s, dir)
      import s.implicits._
      val orders = t.orders.select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      val reps = (1L to BootstrapReps).toDF("b")
      val u = holdoutBucket(col("k") + col("b") * lit(BootstrapMix))
      val w = PoissonPermille.zipWithIndex
        .foldRight(lit(PoissonPermille.length.toLong)) {
          case ((thr, k), rest) => when(u < thr, k.toLong).otherwise(rest)
        }
      val repMeans = orders.crossJoin(broadcast(reps))
        .select(col("b"), (w * col("c")).as("wc"), w.as("w"))
        .groupBy(col("b"))
        .agg(sum(col("wc")).as("sw"), sum(col("w")).as("n"))
        .select(col("b"),
          (col("sw").cast(DoubleType) / col("n").cast(DoubleType)).as("m"))
      val ranked = repMeans.withColumn("rn",
        row_number().over(Window.orderBy(col("m"), col("b"))))
      val point = orders.agg(count(lit(1)).as("n_orders"),
        (sum(col("c")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("point_mean_cents"))
      point
        .crossJoin(broadcast(ranked.filter(col("rn") === 2)
          .select(col("m").as("ci_lo"))))
        .crossJoin(broadcast(ranked.filter(col("rn") === BootstrapReps - 1)
          .select(col("m").as("ci_hi"))))
        .select(col("n_orders"), lit(BootstrapReps).as("b_reps"),
          col("point_mean_cents"), col("ci_lo"), col("ci_hi"))
    },
    Some(s"""
      WITH o AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c
        FROM orders),
      reps AS (SELECT unnest(range(1, ${BootstrapReps + 1})) AS b),
      h AS (
        SELECT reps.b, o.c,
               (((((o.k + reps.b * $BootstrapMix) % 4294967296) % 65536)
                   * $SplitMultiplier
                 + (((((o.k + reps.b * $BootstrapMix) % 4294967296) // 65536)
                     * $SplitMultiplier) % 4294967296) * 65536)
                % 4294967296) % 1000 AS u
        FROM o CROSS JOIN reps),
      w AS (
        SELECT b, c,
               CASE WHEN u < 368 THEN 0 WHEN u < 736 THEN 1
                    WHEN u < 920 THEN 2 WHEN u < 981 THEN 3
                    WHEN u < 996 THEN 4 WHEN u < 999 THEN 5
                    ELSE 6 END AS w
        FROM h),
      r AS (
        SELECT b, CAST(SUM(w * c) AS BIGINT) AS sw,
               CAST(SUM(w) AS BIGINT) AS n
        FROM w GROUP BY b),
      m AS (
        SELECT b, CAST(sw AS DOUBLE) / CAST(n AS DOUBLE) AS m
        FROM r),
      rk AS (
        SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM m)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM o) AS n_orders,
             CAST($BootstrapReps AS BIGINT) AS b_reps,
             (SELECT CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
              FROM o) AS point_mean_cents,
             (SELECT m FROM rk WHERE rn = 2) AS ci_lo,
             (SELECT m FROM rk WHERE rn = ${BootstrapReps - 1}) AS ci_hi
    """)
  )

  /** Checkpoints (doc-count deciles) for the vocabulary growth curve. */
  val VocabCheckpoints = 10L

  /** Vocabulary growth curve (Heaps' law readout): distinct-token
    * vocabulary size vs cumulative token count at doc-id decile
    * checkpoints — the corpus diagnostic behind "how much new
    * vocabulary does the next 10% of crawl buy", which sizes
    * tokenizer vocab and dedup aggressiveness. ONE pass computes
    * everything: per token its FIRST document (min doc_id over the
    * explode — the same shuffle carries the frequency), per doc its
    * token count; each checkpoint then counts tokens whose first doc
    * falls inside the prefix — no per-checkpoint rescans. Exact
    * integers throughout. Scale: the explode+min is the one
    * |rows|·tokens exchange; checkpoints are a 10-row broadcast
    * spine joined against vocab-sized and doc-sized aggregates.
    */
  val textVocabGrowth = GraftQuery(
    "text_vocab_growth",
    (s, dir) => {
      val t = Tables(s, dir)
      val maxDoc = t.documents.agg(max(col("doc_id")).as("mx"))
      val spine = s.range(1, VocabCheckpoints + 1).toDF("decile")
        .crossJoin(broadcast(maxDoc))
        .select(col("decile"),
          expr(s"(mx * decile) div $VocabCheckpoints").as("cutoff"))
      val tok = t.documents
        .select(col("doc_id"), explode(tokens(col("text"))).as("tk"))
        .filter(col("tk") =!= "")
      val firstDoc = tok.groupBy(col("tk"))
        .agg(min(col("doc_id")).as("fd"))
      val docTokens = tok.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("ntok"))
      val vocabAt = spine.join(firstDoc, col("fd") <= col("cutoff"))
        .groupBy(col("decile"), col("cutoff"))
        .agg(count(lit(1)).as("vocab"))
      val tokensAt = spine.join(docTokens, col("doc_id") <= col("cutoff"))
        .groupBy(col("decile").as("d2"))
        .agg(sum(col("ntok")).as("total_tokens"),
          count(lit(1)).as("n_docs"))
      vocabAt.join(tokensAt, col("decile") === col("d2"))
        .select(col("decile"), col("cutoff"), col("n_docs"),
          col("total_tokens"), col("vocab"),
          (col("vocab").cast(DoubleType) /
            col("total_tokens").cast(DoubleType)).as("type_token_ratio"))
        .orderBy(col("decile"))
    },
    Some(s"""
      WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
      spine AS (
        SELECT d AS decile, (mx.mx * d) // $VocabCheckpoints AS cutoff
        FROM (SELECT unnest(range(1, ${VocabCheckpoints + 1})) AS d), mx),
      tok AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tk
        FROM documents),
      tokf AS (SELECT doc_id, tk FROM tok WHERE tk <> ''),
      fd AS (SELECT tk, MIN(doc_id) AS fd FROM tokf GROUP BY 1),
      dt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ntok
             FROM tokf GROUP BY 1),
      v AS (
        SELECT s.decile, s.cutoff, CAST(COUNT(*) AS BIGINT) AS vocab
        FROM spine s JOIN fd ON fd.fd <= s.cutoff
        GROUP BY 1, 2),
      tt AS (
        SELECT s.decile, CAST(SUM(dt.ntok) AS BIGINT) AS total_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM spine s JOIN dt ON dt.doc_id <= s.cutoff
        GROUP BY 1)
      SELECT v.decile, CAST(v.cutoff AS BIGINT) AS cutoff, tt.n_docs,
             tt.total_tokens, v.vocab,
             CAST(v.vocab AS DOUBLE) / CAST(tt.total_tokens AS DOUBLE)
               AS type_token_ratio
      FROM v JOIN tt ON tt.decile = v.decile
      ORDER BY v.decile
    """)
  )

  /** Token budget for the greedy curriculum selection. */
  val TokenBudget = 15000L

  /** Quality buckets for the selection drill-down (floor(q·32)). */
  val BudgetBuckets = 32

  /** Token-budget curriculum selection: greedily take the
    * highest-quality documents (the text_quality score, doc_id
    * tie-break) until the running token total would exceed
    * [[TokenBudget]] — the "best N tokens" cut every pretraining data
    * budget ends in. The global quality-ordered cumsum uses the
    * q68/q90/q105 bucket drill-down: per-quality-bucket token totals
    * (≤33 rows) take the only single-partition window; per-document
    * cumsums run bucket-partitioned. Bucketing is order-compatible
    * because floor(q·32) is monotone in q. Output is the selected
    * set — output-sized by definition; counts stay exact longs.
    */
  val sampleTokenBudget = GraftQuery(
    "sample_token_budget",
    (s, dir) => {
      val t = Tables(s, dir)
      val toksDf = t.documents.select(col("doc_id"), tokens(col("text")).as("toks"),
        col("text"))
      val nTok = size(col("toks")).cast("double")
      val nStop = size(filter(col("toks"), isStopword _)).cast("double")
      val nPunct = length(regexp_replace(col("text"), "[^.,;:!?'\"]", "")).cast("double")
      val nChars = length(col("text")).cast("double")
      val scored = toksDf.select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (least(nTok / lit(100.0), lit(1.0)) * lit(0.5)
          + least(nStop / nTok * lit(5.0), lit(1.0)) * lit(0.3)
          + (lit(1.0) - least(nPunct / nChars * lit(10.0), lit(1.0))) * lit(0.2)
        ).as("q"))
        .withColumn("b", floor(col("q") * BudgetBuckets).cast("long"))
      val bucketPrefix = scored.groupBy(col("b"))
        .agg(sum(col("n_tokens")).as("bt"))
        .select(col("b"),
          coalesce(sum(col("bt")).over(Window.orderBy(col("b").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("p"))
      val within = Window.partitionBy(col("b"))
        .orderBy(col("q").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      scored.join(bucketPrefix, Seq("b"))
        .withColumn("cum_tokens", col("p") + sum(col("n_tokens")).over(within))
        .filter(col("cum_tokens") <= TokenBudget)
        .select(col("doc_id"), col("n_tokens"), col("q"), col("cum_tokens"))
        .orderBy(col("cum_tokens"))
    },
    Some(s"""
      WITH q AS (
        SELECT doc_id,
               CAST(len(string_split_regex(lower(text), '\\s+')) AS DOUBLE) AS n_tok,
               CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                    t -> list_contains(['the','a','of','to','and','in','is','it','that','for'], t))) AS DOUBLE) AS n_stop,
               CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) AS n_punct,
               CAST(length(text) AS DOUBLE) AS n_chars
        FROM documents),
      scored AS (
        SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
               least(n_tok / 100.0, 1.0) * 0.5
                 + least(n_stop / n_tok * 5.0, 1.0) * 0.3
                 + (1.0 - least(n_punct / n_chars * 10.0, 1.0)) * 0.2 AS q
        FROM q),
      cum AS (
        SELECT doc_id, n_tokens, q,
               CAST(SUM(n_tokens) OVER (ORDER BY q DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_tokens
        FROM scored)
      SELECT doc_id, n_tokens, q, cum_tokens
      FROM cum
      WHERE cum_tokens <= $TokenBudget
      ORDER BY cum_tokens
    """)
  )

  /** Shannon entropy of each language's unigram distribution — the
    * corpus-diversity readout (low entropy = repetitive/templated
    * text; the number that moves when dedup or source mixing works).
    * Cross-engine log parity follows the CCNet-bucket recipe
    * ([[textCcnetBuckets]]): each term's ln(p) is rounded to 6
    * decimals (identical IEEE doubles in both engines), the weighted
    * sum Σ c·ln(p) runs in exact DECIMAL arithmetic, and the single
    * closing division is one correctly-rounded IEEE op. The decimal
    * sum is routed through VARCHAR on the DuckDB side (direct
    * DECIMAL→DOUBLE double-rounds — CLAUDE.md q116 class). Scale:
    * one explode exchange + vocab-sized joins; output is |langs|.
    */
  val textUnigramEntropy = GraftQuery(
    "text_unigram_entropy",
    (s, dir) => {
      import graft.functions.GraftFunctions.dec6
      val t = Tables(s, dir)
      val toks = t.documents
        .select(col("lang"), explode(tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
      // vocab-sized cache: tot and the weighted sum both read it —
      // without it the corpus is scanned and re-tokenized twice
      val cnt = toks.groupBy(col("lang"), col("term"))
        .agg(count(lit(1)).as("c")).cache()
      val tot = cnt.groupBy(col("lang"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("vocab"))
      val out = cnt.join(broadcast(tot), Seq("lang"))
        .select(col("lang"), col("n"), col("vocab"),
          (dec6(round(log(col("c").cast(DoubleType) / col("n").cast(DoubleType)), 6))
            * col("c")).as("wlp"))
        .groupBy(col("lang"))
        .agg(max(col("n")).as("n_tokens"),
          max(col("vocab")).as("vocab_size"),
          round(-(sum(col("wlp")).cast(DoubleType))
            / max(col("n")).cast(DoubleType), 6).as("entropy"))
        .orderBy(col("lang"))
      out.persist().count()
      cnt.unpersist(false)
      out
    },
    Some(raw"""
      WITH toks AS (
        SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents),
      tk AS (SELECT lang, term FROM toks WHERE term <> ''),
      cnt AS (SELECT lang, term, COUNT(*) AS c FROM tk GROUP BY 1, 2),
      tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n,
                     COUNT(*) AS vocab
              FROM cnt GROUP BY 1)
      SELECT lang, MAX(n) AS n_tokens, MAX(vocab) AS vocab_size,
             round(-CAST(CAST(SUM(
                 CAST(round(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                   AS DECIMAL(25,6)) * c) AS VARCHAR) AS DOUBLE)
               / CAST(MAX(n) AS DOUBLE), 6) AS entropy
      FROM cnt JOIN tot USING (lang)
      GROUP BY lang
      ORDER BY lang
    """)
  )

  /** Per-source excess loss vs the whole-corpus unigram LM —
    * KL(source ‖ corpus) with the 6-dp-rounded-log / DECIMAL-sum
    * discipline. Shared by [[textKlSourceDrift]] and
    * [[sampleDoremiMixture]] so the parity recipe can never diverge
    * between them. Returns (result frame with source / n_tokens /
    * n_terms / excess 6-dp, cleanup thunk releasing the vocab-sized
    * cache once the caller has materialized).
    */
  private def perSourceExcessKl(
      t: Tables, excessCol: String): (org.apache.spark.sql.DataFrame, () => Unit) = {
    import graft.functions.GraftFunctions.dec6
    val toks = fanned(t.documents)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    // ONE corpus pass: the (source, term) counts are cached at
    // vocab scale and every other frame — global counts, totals —
    // derives from them by re-aggregation, never re-scanning text
    val cntS = toks.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("cs")).cache()
    val totS = cntS.groupBy(col("source"))
      .agg(sum(col("cs")).as("ns"), count(lit(1)).as("terms"))
    val cntAll = cntS.groupBy(col("term")).agg(sum(col("cs")).as("c"))
    val totAll = cntAll.agg(sum(col("c")).as("n"))
    val lpS = round(log(col("cs").cast(DoubleType) / col("ns").cast(DoubleType)), 6)
    val lpAll = round(log(col("c").cast(DoubleType) / col("n").cast(DoubleType)), 6)
    val out = cntS.join(cntAll, Seq("term"))
      .join(broadcast(totS), Seq("source"))
      .crossJoin(broadcast(totAll))
      .select(col("source"), col("ns"), col("terms"),
        ((dec6(lpS) - dec6(lpAll)) * col("cs")).as("wkl"))
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_tokens"),
        max(col("terms")).as("n_terms"),
        round(sum(col("wkl")).cast(DoubleType)
          / max(col("ns")).cast(DoubleType), 6).as(excessCol))
    (out, () => cntS.unpersist(false))
  }

  /** Session-memoized [[perSourceExcessKl]] with the canonical column
    * name `excess` — text_kl_source_drift and sample_doremi_mixture
    * rename it to their registered schema on top of the shared
    * |sources|-row persisted rollup; the vocab-sized intermediate is
    * released as soon as the shared frame materializes.
    */
  private[graft] def perSourceExcessKlShared(
      s: SparkSession, dir: String): DataFrame =
    sharedFrame(s, dir, "excess_kl") {
      val (out, cleanup) = perSourceExcessKl(Tables(s, dir), "excess")
      out.persist().count()
      cleanup()
      out
    }

  /** KL divergence of each source's unigram distribution from the
    * whole-corpus distribution — the source-drift score behind
    * mixture rebalancing (a source whose KL spikes is feeding the
    * model a different distribution than the blend it was tuned
    * for). No smoothing is needed: every term a source emits exists
    * in the corpus by construction, so both logs are finite. Each
    * log is rounded to 6 decimals, the difference is taken in exact
    * DECIMAL (two 6-dp doubles may differ in their double
    * subtraction), the weighted sum is decimal-exact, and the one
    * closing division is IEEE. Scale: vocab-sized joins, the
    * per-source totals broadcast; output is |sources|.
    */
  val textKlSourceDrift = GraftQuery(
    "text_kl_source_drift",
    (s, dir) => {
      val out = perSourceExcessKlShared(s, dir)
        .withColumnRenamed("excess", "kl_vs_corpus")
        .orderBy(col("source"))
      out.persist().count()
      out
    },
    Some(raw"""
      WITH toks AS (
        SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents),
      tk AS (SELECT source, term FROM toks WHERE term <> ''),
      cnt_s AS (SELECT source, term, COUNT(*) AS cs FROM tk GROUP BY 1, 2),
      tot_s AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ns,
                       COUNT(*) AS terms
                FROM cnt_s GROUP BY 1),
      cnt_all AS (SELECT term, COUNT(*) AS c FROM tk GROUP BY 1),
      tot_all AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt_all)
      SELECT source, MAX(ns) AS n_tokens, MAX(terms) AS n_terms,
             round(CAST(CAST(SUM(
                 (CAST(round(ln(CAST(cs AS DOUBLE) / CAST(ns AS DOUBLE)), 6)
                    AS DECIMAL(25,6))
                  - CAST(round(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                    AS DECIMAL(25,6))) * cs) AS VARCHAR) AS DOUBLE)
               / CAST(MAX(ns) AS DOUBLE), 6) AS kl_vs_corpus
      FROM cnt_s JOIN cnt_all USING (term)
      JOIN tot_s USING (source) CROSS JOIN tot_all
      GROUP BY source
      ORDER BY source
    """)
  )

  /** Conditional bigram entropy H(w₂|w₁) per language — the
    * predictability-given-context readout (the gap
    * H(unigram) − H(w₂|w₁) is the information carried by one token
    * of context; it collapses on templated/boilerplate corpora
    * before the unigram numbers move). Bigrams are doc-local
    * ([[textBigramLm]]'s adjacency), counts exact; each
    * ln(c₂/c₁) rounds to 6 decimals and the weighted sum is
    * decimal-exact, closing with one IEEE division. Scale: one
    * posexplode + one bigram-vocab exchange; output is |langs|.
    */
  val textBigramCondEntropy = GraftQuery(
    "text_bigram_cond_entropy",
    (s, dir) => {
      import graft.functions.GraftFunctions.dec6
      val t = Tables(s, dir)
      // array-side doc-local adjacency — same zero-exchange shape as
      // [[textBigramLm]]
      val tl = t.documents
        .select(col("lang"),
          filter(tokens(col("text")), _ =!= "").as("l"))
      val pairLen = greatest(size(col("l")) - 1, lit(0))
      val big = tl
        .select(col("lang"),
          explode(zip_with(
            slice(col("l"), lit(1), pairLen),
            slice(col("l"), lit(2), pairLen),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("lang"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      // bigram-vocab cache: cnt1/tot/the weighted sum all read it —
      // without it the tokenize+explode runs once per consumer
      val cnt2 = big.groupBy(col("lang"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("c2")).cache()
      val cnt1 = cnt2.groupBy(col("lang"), col("w1")).agg(sum(col("c2")).as("c1"))
        .cache()
      val tot = cnt2.groupBy(col("lang"))
        .agg(sum(col("c2")).as("nb"), count(lit(1)).as("nbv"))
      val ctx = cnt1.groupBy(col("lang")).agg(count(lit(1)).as("nctx"))
      val out = cnt2.join(cnt1, Seq("lang", "w1"))
        .join(broadcast(tot), Seq("lang"))
        .select(col("lang"), col("nb"),
          (dec6(round(log(col("c2").cast(DoubleType) / col("c1").cast(DoubleType)), 6))
            * col("c2")).as("wlp"))
        .groupBy(col("lang"))
        .agg(max(col("nb")).as("n_bigrams"),
          round(-(sum(col("wlp")).cast(DoubleType))
            / max(col("nb")).cast(DoubleType), 6).as("cond_entropy"))
        .join(broadcast(ctx), Seq("lang"))
        .select(col("lang"), col("n_bigrams"), col("nctx").as("n_contexts"),
          col("cond_entropy"))
        .orderBy(col("lang"))
      out.persist().count()
      cnt2.unpersist(false)
      cnt1.unpersist(false)
      out
    },
    Some(raw"""
      WITH tl AS (
        SELECT lang, doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS l
        FROM documents),
      b0 AS (SELECT lang, doc_id, l, unnest(range(1, len(l))) AS i FROM tl),
      big AS (SELECT lang, l[i] AS w1, l[i+1] AS w2 FROM b0),
      cnt2 AS (SELECT lang, w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2, 3),
      cnt1 AS (SELECT lang, w1, CAST(SUM(c2) AS BIGINT) AS c1
               FROM cnt2 GROUP BY 1, 2),
      tot AS (SELECT lang, CAST(SUM(c2) AS BIGINT) AS nb FROM cnt2 GROUP BY 1),
      ctx AS (SELECT lang, COUNT(*) AS n_contexts FROM cnt1 GROUP BY 1)
      SELECT lang, MAX(nb) AS n_bigrams, MAX(n_contexts) AS n_contexts,
             round(-CAST(CAST(SUM(
                 CAST(round(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)), 6)
                   AS DECIMAL(25,6)) * c2) AS VARCHAR) AS DOUBLE)
               / CAST(MAX(nb) AS DOUBLE), 6) AS cond_entropy
      FROM cnt2 JOIN cnt1 USING (lang, w1) JOIN tot USING (lang)
      JOIN ctx USING (lang)
      GROUP BY lang
      ORDER BY lang
    """)
  )

  /** Total document budget allocated by the temperature mixture. */
  val MixtureBudget = 1000L

  /** Temperature-flattened mixture allocation — the multilingual /
    * multi-source sampling standard (sample group g with probability
    * ∝ n_g^α, α < 1, so head groups are downweighted and tail groups
    * upweighted relative to natural frequency), here at α = 1/2 with
    * a fixed total budget split by the LARGEST-REMAINDER (Hamilton)
    * method. α = 1/2 is deliberate: n^α = sqrt(n) and IEEE-754
    * REQUIRES sqrt to be correctly rounded, so the weight is
    * bit-identical across engines with no log/exp parity caveat
    * (general α would need the exp(α·ln n) route with the rounding
    * discipline of [[textUnigramEntropy]]). Everything after the
    * sqrt is exact integer arithmetic: weights scale to micro-units
    * by floor(·1e6), quotas split as (B·v) div W with the remainder
    * ranked for the leftover seats — Σ alloc = B by construction.
    * Scale: one |groups|-sized aggregate; allocation is
    * driver-free and the output is |groups| rows.
    */
  val sampleTemperatureMixture = GraftQuery(
    "sample_temperature_mixture",
    (s, dir) => {
      val t = Tables(s, dir)
      val counts = t.documents.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("v", floor(sqrt(col("n_docs").cast(DoubleType)) * lit(1e6)).cast("long"))
      val w = counts.agg(sum(col("v")).as("w_total"))
      val quota = counts.crossJoin(broadcast(w))
        .withColumn("num", lit(MixtureBudget) * col("v"))
        .withColumn("rem", pmod(col("num"), col("w_total")))
        // (num − rem) is an exact multiple of w_total and the integer
        // quotient ≤ budget, so the IEEE division is exact
        .withColumn("base",
          ((col("num") - col("rem")) / col("w_total")).cast("long"))
      val leftover = quota.agg((lit(MixtureBudget) - sum(col("base"))).as("r"))
      val rk = Window.orderBy(col("rem").desc, col("lang"))
      quota.crossJoin(broadcast(leftover))
        .withColumn("seat", row_number().over(rk).cast("long"))
        .select(col("lang"), col("n_docs"), col("v").as("weight_micro"),
          (col("base") + when(col("seat") <= col("r"), 1L).otherwise(0L))
            .as("alloc"))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH cnt AS (
        SELECT lang, COUNT(*) AS n_docs,
               CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1e6) AS BIGINT) AS v
        FROM documents GROUP BY lang),
      tot AS (SELECT CAST(SUM(v) AS BIGINT) AS w_total FROM cnt),
      quota AS (
        SELECT lang, n_docs, v,
               ($MixtureBudget * v) // w_total AS base,
               ($MixtureBudget * v) % w_total AS rem
        FROM cnt CROSS JOIN tot),
      leftover AS (SELECT $MixtureBudget - CAST(SUM(base) AS BIGINT) AS r FROM quota),
      seated AS (
        SELECT lang, n_docs, v, base, rem,
               CAST(row_number() OVER (ORDER BY rem DESC, lang) AS BIGINT) AS seat
        FROM quota)
      SELECT lang, n_docs, v AS weight_micro,
             CAST(base + CASE WHEN seat <= r THEN 1 ELSE 0 END AS BIGINT) AS alloc
      FROM seated CROSS JOIN leftover
      ORDER BY lang
    """)
  )

  /** Token budget allocated by the DoReMi-style mixture. */
  val DoremiBudget = 100000L

  /** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    * domain weights rise exponentially in each domain's EXCESS loss —
    * the gap between the generalist model's loss on the domain and a
    * domain-adapted reference. Deterministic analog with exact
    * cross-engine parity: the "generalist" is the whole-corpus
    * unigram LM, the per-domain reference is the domain's own unigram
    * LM, so the excess loss is exactly KL(source ‖ corpus-model) ≥ 0
    * (the [[textKlSourceDrift]] quantity — cross-entropy minus own
    * entropy, nonneg by Gibbs), computed with the 6-dp-rounded-log /
    * DECIMAL-sum discipline. One exponentiated-gradient step from the
    * uniform baseline (η = 1): w_s ∝ exp(excess_s), rounded to 6 dp
    * (same parity class as the logs — both engines' libm agree well
    * inside 5e-7 on [1, e]), scaled to exact integer micro-weights,
    * and a fixed token budget split by the largest-remainder method
    * ([[sampleTemperatureMixture]]'s Hamilton machinery) — Σ alloc =
    * budget by construction. Scale: one corpus tokenize + vocab-sized
    * joins; the allocation is |sources|-sized, driver-free.
    */
  val sampleDoremiMixture = GraftQuery(
    "sample_doremi_mixture",
    (s, dir) => {
      val excess = perSourceExcessKlShared(s, dir)
        .withColumnRenamed("excess", "excess_kl")
        .drop("n_terms")
        // w = exp(η·min(excess, ln 1000)) at η = 1 in integer
        // micro-units. The clip is DoReMi's standard trust region AND
        // the exactness bound: unclipped, a near-disjoint source's
        // exp(KL) is unbounded, budget·v leaves the 2^53-exact range
        // and the quota division truncates one ulp below DuckDB's
        // integer //. Rounding happens ONCE at micro scale — a
        // 6-dp-rounded double times 1e6 can land at N − 1e-10, where
        // Spark's long cast TRUNCATES but DuckDB's CAST rounds
        .withColumn("v",
          round(exp(least(col("excess_kl"), lit(6.907755))) * lit(1e6), 0)
            .cast("long"))
      val w = excess.agg(sum(col("v")).as("w_total"))
      val quota = excess.crossJoin(broadcast(w))
        .withColumn("num", lit(DoremiBudget) * col("v"))
        .withColumn("rem", pmod(col("num"), col("w_total")))
        .withColumn("base",
          ((col("num") - col("rem")) / col("w_total")).cast("long"))
      val leftover = quota.agg((lit(DoremiBudget) - sum(col("base"))).as("r"))
      val rk = Window.orderBy(col("rem").desc, col("source"))
      val out = quota.crossJoin(broadcast(leftover))
        .withColumn("seat", row_number().over(rk).cast("long"))
        .select(col("source"), col("n_tokens").cast("long").as("n_tokens"),
          col("excess_kl"), col("v").as("weight_micro"),
          (col("base") + when(col("seat") <= col("r"), 1L).otherwise(0L))
            .as("alloc"))
        .orderBy(col("source"))
      out.persist().count()
      out
    },
    Some(raw"""
      WITH toks AS (
        SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS term
        FROM documents),
      tk AS (SELECT source, term FROM toks WHERE term <> ''),
      cnt_s AS (SELECT source, term, COUNT(*) AS cs FROM tk GROUP BY 1, 2),
      tot_s AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ns
                FROM cnt_s GROUP BY 1),
      cnt_all AS (SELECT term, COUNT(*) AS c FROM tk GROUP BY 1),
      tot_all AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt_all),
      excess AS (
        SELECT source, MAX(ns) AS n_tokens,
               round(CAST(CAST(SUM(
                   (CAST(round(ln(CAST(cs AS DOUBLE) / CAST(ns AS DOUBLE)), 6)
                      AS DECIMAL(25,6))
                    - CAST(round(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                      AS DECIMAL(25,6))) * cs) AS VARCHAR) AS DOUBLE)
                 / CAST(MAX(ns) AS DOUBLE), 6) AS excess_kl
        FROM cnt_s JOIN cnt_all USING (term)
        JOIN tot_s USING (source) CROSS JOIN tot_all
        GROUP BY source),
      wts AS (
        SELECT source, n_tokens, excess_kl,
               CAST(round(exp(least(excess_kl, 6.907755)) * 1e6, 0) AS BIGINT) AS v
        FROM excess),
      tot AS (SELECT CAST(SUM(v) AS BIGINT) AS w_total FROM wts),
      quota AS (
        SELECT source, n_tokens, excess_kl, v,
               ($DoremiBudget * v) // w_total AS base,
               ($DoremiBudget * v) % w_total AS rem
        FROM wts CROSS JOIN tot),
      leftover AS (SELECT $DoremiBudget - CAST(SUM(base) AS BIGINT) AS r FROM quota),
      seated AS (
        SELECT source, n_tokens, excess_kl, v, base, rem,
               CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT) AS seat
        FROM quota)
      SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, excess_kl,
             v AS weight_micro,
             CAST(base + CASE WHEN seat <= r THEN 1 ELSE 0 END AS BIGINT) AS alloc
      FROM seated CROSS JOIN leftover
      ORDER BY source
    """)
  )

  def all: Seq[GraftQuery] =
    Seq(textTokens, textQuality, textLangid, textFingerprint, textTopNgrams,
      textTrainingSet, textChunk, textDecontaminate, sampleStratified,
      textPackSequences, textTfidf, textRepetition, sampleMixture,
      textSourceOverlap, textDecontaminateBloom, textPiiRedact,
      textZipfStats, textHeavyHitters, textUnigramLm, textExportShards,
      samplePps, textPassageDedup, textCmsFreq, textBigramLm, textBm25,
      textDsirSelect, pipelineFunnel, retrievalHybridRrf, featHashingTrick,
      textCcnetBuckets, textBpeMerges, textTokenizerFertility,
      sampleEpochAllocation, textSubstringDedup, textGramNovelty,
      textPmiCollocations, sampleHoldoutSplit, sampleTokenBudget,
      sampleBootstrapCi, textVocabGrowth, textEncodingScreen,
      textUnigramEntropy, textKlSourceDrift, textBigramCondEntropy,
      sampleTemperatureMixture, sampleDoremiMixture)
}
