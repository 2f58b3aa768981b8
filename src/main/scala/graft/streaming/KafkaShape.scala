package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.GraftQuery
import graft.functions.GraftFunctions._
import graft.sources.Tables

/** Kafka-SHAPED source adapter: a file-backed stream whose rows carry
  * exactly the columns Spark's Kafka source emits (`key`/`value`
  * binary, `topic`, `partition`, `offset`, `timestamp`,
  * `timestampType`). There is no Kafka broker in this environment —
  * the SEAM is the deliverable: every consumer written against
  * [[readTopicStream]] reads the wire schema and nothing else, so
  * pointing it at a real cluster is a one-line swap to
  * `spark.readStream.format("kafka")` with zero changes downstream
  * (same columns, same `CAST(value AS STRING)` + `from_json` parse,
  * same watermark/agg semantics). Partitions and per-partition
  * contiguous offsets are emulated faithfully so offset-based
  * bookkeeping logic is exercised too.
  */
object KafkaShape {

  /** The fixed schema of Spark's Kafka source (spark-sql-kafka). */
  val kafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)
  ))

  /** Stage a batch frame as a Kafka-shaped topic directory: rows
    * become messages with string key/value encoded to bytes, assigned
    * to `nPartitions` partitions by key hash (Kafka's default
    * partitioner shape — all of a key's messages land in one
    * partition, preserving per-key order), with per-partition
    * CONTIGUOUS offsets in `orderCol` order.
    */
  def stageTopic(
      df: DataFrame, keyCol: String, valueCol: String, tsCol: String,
      orderCol: String, topic: String, nPartitions: Int, path: String): Unit = {
    val part = pmod(xxhash64(col(keyCol)), lit(nPartitions)).cast("int")
    val w = Window.partitionBy(col("partition")).orderBy(col(orderCol))
    df.select(
        col(keyCol).cast("string").cast("binary").as("key"),
        col(valueCol).cast("string").cast("binary").as("value"),
        lit(topic).as("topic"),
        part.as("partition"),
        col(tsCol).cast("timestamp").as("timestamp"),
        col(orderCol))
      .withColumn("offset", (row_number().over(w) - 1).cast("long"))
      .select(col("key"), col("value"), col("topic"), col("partition"),
        col("offset"), col("timestamp"), lit(0).as("timestampType"))
      .write.mode("overwrite").parquet(path)
  }

  /** Stream a staged topic directory with the Kafka wire schema. In
    * production this body is `spark.readStream.format("kafka")
    * .option("subscribe", topic).load()` — the only line that changes.
    */
  def readTopicStream(s: SparkSession, path: String): DataFrame =
    s.readStream.schema(kafkaSchema).parquet(path)

  private def runToTable(df: DataFrame, mode: OutputMode): DataFrame = {
    val name = "graft_kafka_sink_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val s = df.sparkSession
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", EventsStream.StatePartitions.toString)
    try {
      val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    s.table(name)
  }

  /** JSON payload schema the consumer parses out of `value`. */
  private val payloadSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)
  ))

  /** End-to-end Kafka-shaped pipeline: the events table staged as a
    * 4-partition topic (JSON payloads, keyed by user so per-user
    * order is preserved), consumed through the wire schema only —
    * binary value → string → `from_json` → aggregate. The result also
    * hashes the partition/offset bookkeeping: per-partition message
    * counts and max offsets must match the key-hash assignment and
    * contiguity the staging promised, which the DuckDB oracle
    * restates independently from the raw events table.
    */
  val streamKafkaShape = GraftQuery(
    "stream_kafka_shape",
    (s, dir) => {
      val t = Tables(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_kafka_topic")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      try {
        val payload = t.events.select(
          col("user_id"),
          col("event_id"),
          to_json(struct(col("event_id"), col("event_type"), col("value")))
            .as("payload"),
          col("ts"))
        stageTopic(payload, keyCol = "user_id", valueCol = "payload",
          tsCol = "ts", orderCol = "event_id", topic = "events",
          nPartitions = 4, path = tmp.toString)
        val parsed = readTopicStream(s, tmp.toString)
          .select(col("partition"), col("offset"),
            from_json(col("value").cast("string"), payloadSchema).as("p"))
        val agg = parsed
          .groupBy(col("p.event_type").as("event_type"))
          .agg(count(lit(1)).as("n"), sum(dec2(col("p.value"))).as("sum_dec"))
        val perType = runToTable(agg, OutputMode.Complete())
          .select(col("event_type"), col("n"),
            col("sum_dec").cast("double").as("sum_value"))
        val offsets = runToTable(
          readTopicStream(s, tmp.toString)
            .groupBy(col("partition"))
            .agg(count(lit(1)).as("n_msgs"), max(col("offset")).as("max_offset")),
          OutputMode.Complete())
        // contiguous offsets: max offset per partition == count − 1
        val offsetsOk = offsets
          .agg((count(lit(1)) === 4 &&
            sum(when(col("max_offset") === col("n_msgs") - 1, 0L).otherwise(1L)) === 0)
            .as("offsets_ok"))
        val out = perType.crossJoin(offsetsOk)
          .orderBy(col("event_type"))
          .localCheckpoint() // sever lineage from the staged files before rm
        out
      } finally rm(tmp.toFile)
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
             TRUE AS offsets_ok
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """)
  )

  def all: Seq[GraftQuery] = Seq(streamKafkaShape)
}
