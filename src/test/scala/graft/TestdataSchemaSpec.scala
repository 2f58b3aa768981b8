package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** TRIPWIRE for testdata drift (round-4 post-mortem: the driver
  * regenerated /root/testdata and events.ts silently switched from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS), ERRORing 30 queries with no
  * pointer to the cause). This spec pins, BY NAME, everything the
  * engine assumes about the fixture tables, so the next regeneration
  * fails ONE loud test naming the drifted table/column instead of 30
  * opaque hash gates.
  *
  * Deliberately reads every table at every available SF — schema
  * inference only touches footers, so this stays cheap.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  import TestSession._

  private val sfDirs =
    Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(d).isDirectory)

  /** Column name → expected dtype per table, as the ENGINE consumes
    * them (post Tables normalization). Extra columns are drift too:
    * the oracle's SELECT * semantics would silently diverge.
    */
  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    // date-ish columns are physically TIMESTAMP(MICROS) isAdjustedToUTC=false
    // → Spark reads TIMESTAMP_NTZ (inferTimestampNTZ default)
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // ts is pinned POST-normalization: whatever the file carries
    // (nanos-long / micros-NTZ / timestamp), the engine must see LTZ
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  private def loader(t: Tables): Map[String, () => org.apache.spark.sql.DataFrame] = Map(
    "region" -> (() => t.region), "nation" -> (() => t.nation),
    "customer" -> (() => t.customer), "supplier" -> (() => t.supplier),
    "part" -> (() => t.part), "orders" -> (() => t.orders),
    "lineitem" -> (() => t.lineitem), "events" -> (() => t.events),
    "documents" -> (() => t.documents), "embeddings" -> (() => t.embeddings))

  for (dir <- sfDirs) {
    test(s"tripwire: every fixture table at $dir matches the pinned engine schema") {
      val t = Tables(spark, dir)
      val load = loader(t)
      val drift = expected.toSeq.sortBy(_._1).flatMap { case (name, want) =>
        val got =
          try Right(load(name)().schema)
          catch { case e: Throwable => Left(e) }
        got match {
          case Left(e) =>
            Seq(s"$name: UNREADABLE through Tables — ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" / ")}")
          case Right(schema) =>
            val gotMap = schema.fields.map(f => f.name -> f.dataType).toMap
            val missing = (want.keySet -- gotMap.keySet).toSeq.sorted
              .map(c => s"$name.$c: MISSING (engine expects ${want(c)})")
            val extra = (gotMap.keySet -- want.keySet).toSeq.sorted
              .map(c => s"$name.$c: UNEXPECTED new column ${gotMap(c)} (oracle drift risk)")
            val changed = want.toSeq.sortBy(_._1).collect {
              case (c, dt) if gotMap.contains(c) && !sameType(gotMap(c), dt) =>
                s"$name.$c: dtype drift — engine expects $dt, file yields ${gotMap(c)}"
            }
            missing ++ extra ++ changed
        }
      }
      assert(drift.isEmpty,
        s"\nTESTDATA DRIFT at $dir (regeneration changed the fixtures?):\n  " +
          drift.mkString("\n  ") +
          "\n  → update graft.sources.Tables (reader normalization) and this " +
          "spec's pinned schemas together; see round-4 VERDICT for the failure mode.")
    }
  }

  /** Array element nullability is producer-dependent noise; everything
    * else must match exactly.
    */
  private def sameType(got: DataType, want: DataType): Boolean = (got, want) match {
    case (ArrayType(ge, _), ArrayType(we, _)) => sameType(ge, we)
    case _ => got == want
  }

  test("tripwire: documents corpus is ASCII-only (multimodal byte-oracle invariant)") {
    // mm_audio_energy / mm_scene_cuts treat the text's UTF-8 BYTES as
    // fake PCM samples / frame pixels on the Spark side while their
    // DuckDB oracles walk CHARACTERS via ascii(); the two agree iff
    // every codepoint is < 128 (1 byte == 1 char). A regenerated
    // corpus containing any multi-byte character must fail HERE, by
    // name, not as an opaque mm_* hash mismatch.
    import org.apache.spark.sql.functions._
    for (dir <- sfDirs) {
      val bad = Tables(spark, dir).documents
        .filter(length(col("text")) =!= octet_length(col("text")))
        .count()
      assert(bad == 0,
        s"$dir: $bad non-ASCII documents — the multimodal decode stub and its " +
          "character-walking oracle diverge on multi-byte text; either " +
          "regenerate ASCII fixtures or move the oracle to BLOB bytes")
    }
  }

  test("tripwire: events ts physical encodings all normalize to TimestampType") {
    // the three encodings the generator has produced over time; the
    // reader must map any of them onto the same engine-facing type
    import spark.implicits._
    val micros = Seq((1L, java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5)))
      .toDF("event_id", "ts")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts").cast(TimestampNTZType).as("ts"))
    val nanosAsLong = Seq((1L, 1704164645000000000L)).toDF("event_id", "ts")
    val already = Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 03:04:05")))
      .toDF("event_id", "ts")
    for (df <- Seq(micros, nanosAsLong, already)) {
      val out = Tables.normalizeEventsTs(df)
      assert(out.schema("ts").dataType == TimestampType,
        s"input ${df.schema("ts").dataType} did not normalize to TimestampType")
      val s = out.select(org.apache.spark.sql.functions
        .date_format(org.apache.spark.sql.functions.col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .first().getString(0)
      assert(s == "2024-01-02 03:04:05", s"wall clock drifted: $s")
    }
    // an unrecognized encoding must fail loudly, not pass through
    val bogus = Seq((1L, "2024-01-02")).toDF("event_id", "ts")
    val e = intercept[RuntimeException](Tables.normalizeEventsTs(bogus))
    assert(e.getMessage.contains("unsupported ts type"))
  }
}
