package graft.io

import java.io.ByteArrayOutputStream

import graft.model.ElectronicOrder
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka + Avro edge of the engine, mirroring the reference's source/sink
  * (Application.java:140,147) and serde (StreamsUtils.java:29-33).
  *
  * The Kafka DataFrame wiring compiles against the stable
  * `format("kafka")` string API; running it requires the
  * spark-sql-kafka connector on the cluster classpath (not shipped in
  * this environment, so these paths are exercised by [[AvroCodec]] unit
  * tests + MemoryStream topologies rather than a broker — the same split
  * the reference makes with TopologyTestDriver).
  *
  * The Avro binary codec is implemented on avro-core directly (the
  * payload matches the reference's `electronic_order.avsc` field order).
  * NOTE: Confluent's wire format prefixes `magic byte + 4-byte schema id`;
  * [[AvroCodec.decode]] tolerates both raw and Confluent-framed payloads.
  */
object KafkaAvroIO {

  /** Config keys matching configuration/dev.properties. `confluentFramed`
    * defaults true because the reference produces via Confluent's
    * SpecificAvroSerde (StreamsUtils.java:29-33), whose wire format
    * prefixes magic byte + schema id. `schemaId` is that header's id:
    * registry-assigned ids start at 1, so emitting the 0 default produces
    * frames no Confluent deserializer can resolve — deployments set
    * `schema.id` to the registry's id for `electronic_order.avsc` (this
    * engine never calls the registry itself: `schema.registry.url` is
    * parsed for key parity only).
    */
  final case class KafkaConf(bootstrap: String, inputTopic: String,
      outputTopic: String, checkpoint: String, confluentFramed: Boolean = true,
      schemaId: Int = 0)

  def loadConf(props: Map[String, String]): KafkaConf = KafkaConf(
    bootstrap = props.getOrElse("bootstrap.servers", "localhost:9092"),
    inputTopic = props.getOrElse("input.topic.name", "electronic-orders"),
    outputTopic = props.getOrElse("output.topic.name", "electronic-orders-reordered"),
    checkpoint = props.getOrElse("checkpoint.location", "/tmp/graft-checkpoint"),
    confluentFramed = props.getOrElse("confluent.framed", "true").toBoolean,
    schemaId = props.getOrElse("schema.id", "0").toInt)

  /** Streaming source: Kafka records → typed orders (key ignored per the
    * reference, which re-keys on output anyway — semantics S4).
    *
    * The decode is the native expression [[graft.functions.AvroOrderWire]]
    * — it stays inside whole-stage codegen instead of round-tripping every
    * record through a typed lambda (spark-avro's `from_avro` shape, which
    * isn't on this classpath).
    */
  def source(spark: SparkSession, conf: KafkaConf): Dataset[ElectronicOrder] = {
    import spark.implicits._
    decodeValues(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", conf.bootstrap)
      .option("subscribe", conf.inputTopic)
      .option("startingOffsets", "earliest")
      .load(), conf.confluentFramed)
  }

  /** Kafka wire rows (with a binary `value` column) → typed orders; the
    * Kafka-free half of [[source]] so tests can drive it from MemoryStream
    * or a static DataFrame.
    *
    * Poison policy: a corrupt payload (truncated frame, wrong magic byte,
    * malformed Avro) decodes to null and is FILTERED here rather than
    * killing the query — the `LogAndContinue` analog of Kafka Streams'
    * `DeserializationExceptionHandler` (the strict `LogAndFail` default
    * would turn one bad record into a crash loop on restart, since the
    * offset is re-read from the checkpoint).
    */
  def decodeValues(wire: DataFrame, confluentFramed: Boolean): Dataset[ElectronicOrder] = {
    val spark = wire.sparkSession
    import spark.implicits._
    wire
      .select(graft.functions.AvroOrderWire
        .decode(col("value"), confluentFramed).as("o"))
      .filter(col("o").isNotNull)
      .select(col("o.*"))
      .as[ElectronicOrder]
  }

  /** Reordered rows → Kafka wire frame: key = the synthetic store key
    * column, value = the Avro-encoded order (native expression — no typed
    * lambda), framed with `schemaId` when Confluent framing is on. Split
    * from [[sink]] so the MemoryStream smoke test can run the identical
    * encode stage against a non-Kafka sink.
    *
    * `withTimestamp` adds a `timestamp` column = the flush's punctuation
    * stream time (S5, Application.java:77). Spark's Kafka sink (4.x)
    * recognizes only key/value/topic/partition/headers and lets the
    * broker stamp append time, so over `format("kafka")` the column is
    * carried but not honored — wire it to the producer record in a
    * `foreachBatch` producer when S5 must reach the broker.
    */
  def encodeValues(reordered: Dataset[graft.streaming.StreamingReorder.Reordered],
      confluentFramed: Boolean, schemaId: Int = 0,
      withTimestamp: Boolean = false): DataFrame = {
    val base = reordered.select(col("key"),
      graft.functions.AvroOrderWire.encode(
        struct(col("order_id"), col("electronic_id"), col("user_id"),
          col("price"), col("time")), confluentFramed, schemaId).as("value"),
      col("flush_time"))
    if (withTimestamp)
      base.select(col("key"), col("value"),
        timestamp_millis(col("flush_time")).as("timestamp"))
    else base.select(col("key"), col("value"))
  }

  /** Minimal producer SPI for [[sinkWithTimestamp]]: one instance per
    * partition per micro-batch, opened on the executor, closed after the
    * partition drains. Exists because Spark's `format("kafka")` sink
    * cannot honor a per-record timestamp (see [[encodeValues]]) and
    * because kafka-clients is a cluster-classpath dependency this build
    * does not compile against — the default factory
    * ([[reflectiveKafkaProducer]]) binds to it reflectively at runtime,
    * and tests inject a recording implementation.
    */
  trait RecordProducer {
    def send(topic: String, key: String, value: Array[Byte], timestampMs: Long): Unit
    def close(): Unit
  }

  /** Default [[RecordProducer]] factory: reflective
    * `org.apache.kafka.clients.producer.KafkaProducer` using the 5-arg
    * `ProducerRecord(topic, partition = null, timestamp, key, value)`
    * constructor — the only producer API that stamps an explicit record
    * timestamp (CreateTime) instead of letting the broker use append
    * time. Reflection keeps this module compilable without kafka-clients
    * (same split as the `format("kafka")` paths above); on a real cluster
    * the connector bundles the client and this resolves.
    */
  object reflectiveKafkaProducer extends (KafkaConf => RecordProducer) with Serializable {
    def apply(conf: KafkaConf): RecordProducer = new RecordProducer {
      private val producerCls = Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
      private val recordCls = Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
      private val props = new java.util.Properties()
      props.put("bootstrap.servers", conf.bootstrap)
      props.put("key.serializer", "org.apache.kafka.common.serialization.StringSerializer")
      props.put("value.serializer", "org.apache.kafka.common.serialization.ByteArraySerializer")
      private val producer =
        producerCls.getConstructor(classOf[java.util.Properties]).newInstance(props)
      private val sendM = producerCls.getMethod("send", recordCls)
      private val recordCtor = recordCls.getConstructor(classOf[String],
        classOf[java.lang.Integer], classOf[java.lang.Long],
        classOf[Object], classOf[Object])
      def send(topic: String, key: String, value: Array[Byte], timestampMs: Long): Unit =
        sendM.invoke(producer, recordCtor.newInstance(topic, null,
          Long.box(timestampMs), key, value).asInstanceOf[Object])
      def close(): Unit = producerCls.getMethod("close").invoke(producer)
    }
  }

  /** S5-to-broker sink: like [[sink]] but the produced record's timestamp
    * IS the flush's punctuation stream time, matching the reference's
    * `context.forward(..., To.all().withTimestamp(context.currentStreamTimeMs))`
    * (Application.java:75-78) — consumers of the output topic observe
    * flush time, not event time or broker append time. `format("kafka")`
    * cannot express this (it drops any timestamp column), so each
    * micro-batch is produced explicitly: encode → per-partition producer
    * → send(key, value, flush-time). Exactly-once is NOT claimed — like
    * the reference's at-least-once producer, a retried batch re-sends
    * (idempotence is a broker-side producer config, `enable.idempotence`
    * in dev.properties).
    */
  def sinkWithTimestamp(reordered: Dataset[graft.streaming.StreamingReorder.Reordered],
      conf: KafkaConf,
      producerFactory: KafkaConf => RecordProducer = reflectiveKafkaProducer)
      : org.apache.spark.sql.streaming.DataStreamWriter[graft.streaming.StreamingReorder.Reordered] = {
    val framed = conf.confluentFramed
    val schemaId = conf.schemaId
    val topic = conf.outputTopic
    reordered.writeStream
      .option("checkpointLocation", conf.checkpoint)
      .foreachBatch { (batch: Dataset[graft.streaming.StreamingReorder.Reordered], _: Long) =>
        encodeValues(batch, framed, schemaId, withTimestamp = true)
          .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
            if (rows.nonEmpty) {
              val p = producerFactory(conf)
              try rows.foreach { r =>
                p.send(topic, r.getString(0), r.getAs[Array[Byte]](1),
                  r.getTimestamp(2).getTime)
              } finally p.close()
            }
          }
      }
  }

  /** Streaming sink: reordered rows → Kafka. */
  def sink(reordered: Dataset[graft.streaming.StreamingReorder.Reordered],
      conf: KafkaConf): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    if (conf.confluentFramed && conf.schemaId == 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "Confluent framing is on but schema.id is unset (0): registry ids " +
          "start at 1, so SpecificAvroSerde consumers will fail to resolve " +
          "these frames — set schema.id to the registry's id for " +
          "electronic_order.avsc")
    encodeValues(reordered, conf.confluentFramed, conf.schemaId)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", conf.bootstrap)
      .option("topic", conf.outputTopic)
      .option("checkpointLocation", conf.checkpoint)
  }
}

/** Avro binary serde for `ElectronicOrder` built on avro-core. */
object AvroCodec {

  @transient private lazy val schema: Schema =
    new Schema.Parser().parse(ElectronicOrder.avroSchemaJson)

  def encode(o: ElectronicOrder): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    rec.put("order_id", o.order_id)
    rec.put("electronic_id", o.electronic_id)
    rec.put("user_id", o.user_id)
    rec.put("price", o.price)
    rec.put("time", o.time)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** Decodes Avro binary. Framing is EXPLICIT: sniffing the Confluent
    * magic byte is ambiguous because a raw payload whose first field is an
    * empty string also starts with 0x00 — callers must know their topic's
    * wire format (they always do: it's a producer-side config).
    */
  def decode(bytes: Array[Byte], confluentFramed: Boolean = false): ElectronicOrder = {
    val payload = if (confluentFramed) bytes.drop(5) else bytes
    val dec = DecoderFactory.get().binaryDecoder(payload, null)
    val rec = new GenericDatumReader[GenericRecord](schema).read(null, dec)
    ElectronicOrder(
      rec.get("order_id").toString,
      rec.get("electronic_id").toString,
      rec.get("user_id").toString,
      rec.get("price").asInstanceOf[Double],
      rec.get("time").asInstanceOf[Long])
  }
}
