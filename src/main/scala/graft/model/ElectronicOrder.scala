package graft.model

import org.apache.spark.sql.types._

/** The reference's one record schema, re-expressed as a Spark case class.
  *
  * Mirrors `/root/reference/src/main/avro/electronic_order.avsc:1-12`:
  * order_id/electronic_id/user_id strings, price double (default 0.0),
  * time long epoch-millis (the event-time field read by the reference's
  * `OrderTimestampExtractor`, Application.java:99-108).
  */
final case class ElectronicOrder(
    order_id: String,
    electronic_id: String,
    user_id: String,
    price: Double,
    time: Long)

object ElectronicOrder {

  /** StructType equivalent, for schema-first reads (Kafka/JSON/parquet). */
  val schema: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false),
    StructField("electronic_id", StringType, nullable = false),
    StructField("user_id", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("time", LongType, nullable = false)))

  /** Avro schema JSON for `from_avro`/`to_avro` wire compatibility with the
    * reference's Confluent setup (electronic_order.avsc verbatim semantics).
    */
  val avroSchemaJson: String =
    """{"namespace":"org.example","type":"record","name":"ElectronicOrder",
      |"fields":[
      |  {"name":"order_id","type":"string"},
      |  {"name":"electronic_id","type":"string"},
      |  {"name":"user_id","type":"string"},
      |  {"name":"price","type":"double","default":0.0},
      |  {"name":"time","type":"long"}
      |]}""".stripMargin
}
