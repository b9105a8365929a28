package graft.tools

import graft.io.AvroCodec
import graft.model.ElectronicOrder
import graft.streaming.StreamingReorder
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Demo main: runs the faithful streaming reorder over the reference's
  * README fixture (README.md:45-56 — key HDTV-2333, epoch-millis times)
  * and prints the emitted sequence, which should match README.md:77-88's
  * expected consumer output. Also round-trips one record through the
  * Avro wire codec.
  */
object ReorderDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // README.md:45-56 input (order of arrival), all key HDTV-2333
    val times = Seq(
      1635980400000L, 1635987600000L, 1635984000000L, 1635998400000L,
      1635991200000L, 1636002000000L, 1635994800000L, 1636005600000L,
      1636009200000L, 1636012800000L, 1636016400000L, 1636070400000L)
    val input = times.zipWithIndex.map { case (t, i) =>
      ElectronicOrder("instore-1", "HDTV-2333", s"10261998-$i", 2000.0 + i, t)
    }

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[ElectronicOrder]
    val q = StreamingReorder.faithful(stream.toDS(), graceMs = 10L * 3600 * 1000)
      .writeStream.format("memory").queryName("demo")
      .outputMode(OutputMode.Append).start()
    stream.addData(input)
    q.processAllAvailable()
    q.processAllAvailable() // let event-time timeouts fire
    q.stop()

    val out = spark.table("demo").as[StreamingReorder.Reordered]
      .collect()
    println("emitted (key, time):")
    out.foreach(r => println(s"  ${r.key} time=${r.time} user=${r.user_id}"))
    val sortedOk = out.map(_.time).toSeq == times.sorted
    println(s"chronological=${sortedOk} n=${out.length}")

    val rt = AvroCodec.decode(AvroCodec.encode(input.head)) == input.head
    println(s"avro_roundtrip=$rt")

    // drive the streaming event aggregates over the same records
    val evStream = MemoryStream[ElectronicOrder]
    val agg = graft.streaming.EventAggregates.tumblingCounts(
      evStream.toDF()
        .selectExpr("time AS event_id", "timestamp_millis(time) AS ts",
          "cast(price as long) AS user_id", "electronic_id AS event_type",
          "price AS value"),
      "ts", "6 hours", "10 hours")
    val q2 = agg.writeStream.format("memory").queryName("demo_agg")
      .outputMode(OutputMode.Complete).start()
    evStream.addData(input)
    q2.processAllAvailable()
    q2.stop()
    println("tumbling 6h windows:")
    spark.table("demo_agg").orderBy("window_start").collect()
      .foreach(r => println(s"  ${r.getAs[java.sql.Timestamp]("window_start")} n=${r.getAs[Long]("n")}"))
    spark.stop()
  }
}
