package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources (reference S1/S2/S5, SURVEY.md §2.1).
  *
  * The reference consumes two Kafka topics of CSV lines
  * (SparkStreamingService.java:124-132,181-189) and loads a player dimension
  * from a REST endpoint (PlayerRestClient.java:28-68). Kafka/REST are not
  * reachable in this environment, so the Kafka builders are exercised only at
  * plan level in tests; file/memory sources drive the same downstream plan.
  */
object Sources {

  /** Kafka CSV-line stream, identical option surface to the reference
    * (subscribe topic, startingOffsets=latest, failOnDataLoss=false) plus
    * `maxOffsetsPerTrigger` — absent in the reference, required at scale so a
    * backlog cannot blow up a single micro-batch. Output: one string column
    * `value` (the reference's P1 cast, :131-132). */
  def kafkaLines(
      spark: SparkSession,
      brokers: String,
      topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = Some(1000000L)): DataFrame = {
    val r = spark.readStream.format(KafkaFormat)
    kafkaOptions(brokers, topic, startingOffsets, maxOffsetsPerTrigger)
      .foreach { case (k, v) => r.option(k, v) }
    r.load().select(col("value").cast("string").as("value"))
  }

  /** The source format [[kafkaLines]] resolves. */
  val KafkaFormat = "kafka"

  /** True when the Spark Kafka connector is on the classpath — the
    * opportunistic seam that upgrades the plan-level S1/S2 coverage to a
    * live round trip wherever the deployment provides the jar (this
    * sandbox does not ship it; verified per-round against
    * /opt/spark/jars). Tests `assume` on this, so they run as real
    * integration tests in a kafka-equipped environment and cancel — not
    * silently pass — here. */
  def kafkaConnectorAvailable: Boolean =
    scala.util.Try(Class.forName(
      "org.apache.spark.sql.kafka010.KafkaSourceProvider")).isSuccess

  /** True when an embeddable Kafka broker is ALSO on the classpath (the
    * server jar, beyond the connector) — the stronger precondition for a
    * self-contained broker-in-process test. */
  def kafkaBrokerAvailable: Boolean =
    kafkaConnectorAvailable &&
      scala.util.Try(Class.forName("kafka.server.KafkaConfig")).isSuccess

  /** The EXACT reader options [[kafkaLines]] sets, factored out so a test
    * can pin the option surface even where the connector jar is absent
    * (this sandbox): reference SparkStreamingService.java:124-132 sets
    * subscribe + startingOffsets=latest + failOnDataLoss=false;
    * `maxOffsetsPerTrigger` is the scale addition. */
  def kafkaOptions(
      brokers: String,
      topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = Some(1000000L)): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> "false") ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** File-based stream of raw lines with the same shape as `kafkaLines` —
    * lets every test and local run drive the identical downstream plan. */
  def fileLines(spark: SparkSession, path: String): DataFrame =
    spark.readStream.text(path).select(col("value"))

  /** Batch twin of the line sources. */
  def batchLines(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    lines.toDF("value")
  }

  /** Static dimension from already-fetched CSV lines (reference S5 fetches via
    * HTTP on the driver; the parse stays identical). Driver-side fetch of a
    * small dimension is fine at any scale — it is broadcast afterwards. */
  def playersFromLines(spark: SparkSession, lines: Seq[String]): DataFrame =
    graft.core.parse.GameLogParser.parsePlayers(batchLines(spark, lines))
}
