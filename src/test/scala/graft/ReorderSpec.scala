package graft

import graft.model.ElectronicOrder
import graft.operators.Reorder

/** Golden tests for the batch reorder+dedup operator, porting the
  * reference's unit-test fixture (ApplicationTest.java:32-59 →
  * FIXTURES.md §B1) and adding the dedup/store-key behaviors the
  * reference leaves untested (SURVEY.md S3/S4).
  */
class ReorderSpec extends SparkTestBase {
  import spark.implicits._

  private def t(iso: String): Long = java.time.Instant.parse(iso).toEpochMilli

  /** FIXTURES.md §B1 input, in the reference test's disorder. */
  private val fixture = Seq(
    ElectronicOrder("1", "one", "vandeley", 5.0, t("2021-11-03T23:00:00Z")),
    ElectronicOrder("2", "one", "penny-packer", 15.0, t("2021-11-04T01:05:00Z")),
    ElectronicOrder("3", "one", "romanov", 25.0, t("2021-11-04T01:10:00Z")),
    ElectronicOrder("4", "one", "david", 35.0, t("2021-11-04T01:40:00Z")),
    ElectronicOrder("5", "one", "jerry", 45.0, t("2021-11-04T02:25:00Z")),
    ElectronicOrder("6", "one", "natalie", 55.0, t("2021-11-04T01:20:00Z")),
    ElectronicOrder("7", "one", "lisa", 65.0, t("2021-11-04T02:45:00Z")),
    ElectronicOrder("8", "one", "gavin", 75.0, t("2021-11-04T02:00:00Z")),
    ElectronicOrder("9", "one", "paul", 85.0, t("2021-11-04T03:00:00Z")),
    ElectronicOrder("10", "one", "martin", 95.0, t("2021-11-04T02:40:00Z")),
    ElectronicOrder("11", "one", "rebecca", 105.0, t("2021-11-04T02:20:00Z")),
    ElectronicOrder("12", "one", "jessica", 115.0, t("2021-11-05T00:00:00Z")))

  /** Expected output order by order_id (ApplicationTest.java:47-59). */
  private val goldenOrder = Seq("1", "2", "3", "6", "4", "8", "11", "5", "10", "7", "9", "12")

  test("reorder emits the reference fixture in event-time order") {
    val in = fixture.toDF().withColumn("arrival",
      org.apache.spark.sql.functions.monotonically_increasing_id())
    val out = Reorder.reorderDedup(in, "time", "arrival")
      .select("order_id").as[String].collect().toSeq
    assert(out == goldenOrder)
  }

  test("first-wins dedup drops the later record with an equal timestamp (S3)") {
    val dup = fixture :+ ElectronicOrder("13", "one", "late-dup", 999.0,
      t("2021-11-04T01:05:00Z")) // same time as order 2
    val in = dup.toDF().withColumn("arrival",
      org.apache.spark.sql.functions.monotonically_increasing_id())
    val out = Reorder.reorderDedup(in, "time", "arrival")
      .select("order_id").as[String].collect().toSeq
    assert(out == goldenOrder, "the duplicate-timestamp record must be dropped, first wins")
  }

  test("store-key projection replicates the reference's output key (S4)") {
    val out = Reorder.withStoreKey(fixture.toDF(), "time")
      .select("key").as[String].collect()
    assert(out.contains(s"key-${t("2021-11-03T23:00:00Z")}"))
    assert(out.forall(_.matches("key-\\d{13}")))
  }
}
