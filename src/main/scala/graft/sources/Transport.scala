package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row
import graft._

/** Topic transport abstraction — the S1/K1/K2 operator surface of the
  * reference (utils/MyKafkaUtil.java:17-41: consumer by topic+group,
  * fixed-topic producer, dynamic-topic producer).
  *
  * Every pipeline in [[graft.streaming]] consumes/produces frames with a
  * `value: STRING` column (plus optional `topic` for dynamic routing), so
  * the transport is swappable:
  *  - [[FileTransport]]: JSON-lines directories, one per topic — the
  *    hermetic test/fixture transport (used by StreamingDemo).
  *  - [[KafkaTransport]]: the production transport. Requires the
  *    spark-sql-kafka connector on the classpath (not shipped in this
  *    container, so it is exercised only at plan-construction level
  *    here); exactly-once = checkpointed offsets + idempotent producer
  *    per micro-batch, the Spark equivalent of the reference's
  *    transactional EXACTLY_ONCE semantic (MyKafkaUtil.java:29).
  */
trait Transport {
  /** Streaming source of raw string records for a topic. */
  def readStream(spark: SparkSession, topic: String): DataFrame
  /** Batch twin. */
  def read(spark: SparkSession, topic: String): DataFrame
  /** Sink for a frame with a `value` column; `topic=None` means the
    * frame carries its own `topic` column (K2 dynamic routing).
    */
  def writeStream(df: DataFrame, topic: Option[String], checkpoint: String): StreamingQuery
}

/** JSON-lines-per-topic directories under `root`. */
class FileTransport(root: String) extends Transport {
  override def readStream(spark: SparkSession, topic: String): DataFrame =
    spark.readStream.schema("value STRING").text(s"$root/$topic")

  override def read(spark: SparkSession, topic: String): DataFrame =
    spark.read.schema("value STRING").text(s"$root/$topic")

  override def writeStream(df: DataFrame, topic: Option[String],
      checkpoint: String): StreamingQuery = topic match {
    case Some(t) =>
      df.select($"value").writeStream.format("text")
        .option("path", s"$root/$t")
        .option("checkpointLocation", checkpoint).start()
    case None =>
      // dynamic topic: fan out per micro-batch by the topic column
      df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        val topics = batch.select($"topic").distinct()
          .collect().map(_.getString(0))
        val b = batch.persist()
        topics.foreach { t =>
          b.filter($"topic" === t).select($"value")
            .write.mode("append").text(s"$root/$t")
        }
        b.unpersist(); ()
      }.option("checkpointLocation", checkpoint).start()
  }
}

/** Kafka transport (connector jar required at runtime; this container
  * ships neither the connector nor a broker, so only the option
  * contracts — [[Transport.kafkaConsumerOptions]] /
  * [[Transport.kafkaProducerOptions]], unit-tested — and the delivery-
  * semantics helper [[Transport.dedupedByKey]] are exercised here; the
  * `.load()`/`.start()` calls resolve the DataSource only when
  * spark-sql-kafka is on the classpath).
  */
class KafkaTransport(brokers: String, groupId: String = "graft") extends Transport {
  override def readStream(spark: SparkSession, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .options(Transport.kafkaConsumerOptions(brokers, groupId, topic))
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  override def read(spark: SparkSession, topic: String): DataFrame =
    spark.read.format("kafka")
      .options(Transport.kafkaConsumerOptions(brokers, groupId, topic,
        startingOffsets = "earliest", maxOffsetsPerTrigger = None))
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  override def writeStream(df: DataFrame, topic: Option[String],
      checkpoint: String): StreamingQuery = {
    // kafka sink routes by the `topic` column when no fixed topic is set
    val w: DataStreamWriter[Row] = df.writeStream.format("kafka")
      .options(Transport.kafkaProducerOptions(brokers))
      .option("checkpointLocation", checkpoint)
    topic.fold(w)(t => w.option("topic", t)).start()
  }
}

object Transport {
  /** Consumer options for the Spark Kafka source (mirrors the reference
    * consumer config, MyKafkaUtil.java:17-27: brokers + topic + group).
    * Pure so the contract is testable without a broker.
    */
  def kafkaConsumerOptions(brokers: String, groupId: String, topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = Some(1000000L)): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topic,
      "kafka.group.id" -> groupId,
      "startingOffsets" -> startingOffsets) ++
      // bound per-micro-batch reads so one huge backlog cannot OOM a
      // trigger — a STREAMING-only option (the batch source ignores it,
      // so the batch read path below does not pass it)
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** Producer options for the Spark Kafka sink. Delivery is
    * at-least-once per micro-batch (checkpointed offsets + retrying
    * producer); the reference's transactional EXACTLY_ONCE
    * (MyKafkaUtil.java:29) has no Spark-sink equivalent — instead,
    * consumers get effectively-once via [[dedupedByKey]] downstream.
    */
  def kafkaProducerOptions(brokers: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> brokers,
    // idempotent producer: broker-side dedup of in-flight retries
    "kafka.enable.idempotence" -> "true",
    "kafka.acks" -> "all")

  /** The idempotent-consumer half of exactly-once over an at-least-once
    * transport: keyed dedup within a watermark. A replayed micro-batch
    * (sink crash after publish, before checkpoint commit) re-delivers
    * records with the same delivery key; dropping duplicates within the
    * replay horizon makes the downstream view effectively-once. State is
    * bounded: one key per record, evicted when the watermark passes.
    */
  def dedupedByKey(df: DataFrame, keyCol: String, eventTimeCol: String,
      replayHorizon: String): DataFrame =
    df.withWatermark(eventTimeCol, replayHorizon)
      .dropDuplicatesWithinWatermark(keyCol)
}
