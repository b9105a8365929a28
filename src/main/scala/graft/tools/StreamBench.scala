package graft.tools

import graft.model.ElectronicOrder
import graft.streaming.StreamingReorder
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming reorder throughput: pushes the events table (as
  * ElectronicOrder records) through the faithful operator via
  * MemoryStream and reports records/second end-to-end (ingest → stateful
  * reorder+dedup → memory sink). The reference publishes no numbers
  * (BASELINE.md), so this records our own single-node figure.
  *
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.tools.StreamBench
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // state partitioning: per-batch overhead is proportional to the number
    // of state stores committed each micro-batch, so size it to the
    // keyspace/throughput, not the core count (150 users here -> 8)
    val statePartitions = sys.env.getOrElse("SPARK_GRAFT_STATE_PARTS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", statePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // events -> ElectronicOrder shape (ts -> epoch millis event time)
    val orders = graft.Tables.events(spark, sfDir)
      .selectExpr("cast(event_id as string) AS order_id",
        "cast(user_id as string) AS electronic_id",
        "event_type AS user_id", "value AS price",
        "unix_micros(ts) div 1000 AS time")
      .as[ElectronicOrder].collect()

    implicit val sqlCtx = spark.sqlContext
    val batchSize = args.headOption.map(_.toInt).getOrElse(20000)

    def run(name: String, mk: org.apache.spark.sql.Dataset[ElectronicOrder] =>
        org.apache.spark.sql.DataFrame): Unit = {
      val input = MemoryStream[ElectronicOrder]
      val q = mk(input.toDS())
        .writeStream.format("memory").queryName(s"sb_$name")
        .outputMode(OutputMode.Append).start()
      val t0 = System.nanoTime()
      orders.grouped(batchSize).foreach { b => input.addData(b); q.processAllAvailable() }
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val emitted = spark.table(s"sb_$name").count()
      q.stop()
      println(f"""{"metric":"stream_reorder_throughput","variant":"$name","batch":$batchSize,""" +
        f""""records_in":${orders.length},"records_out":$emitted,"sec":$secs%.2f,""" +
        f""""records_per_sec":${(orders.length / secs).toLong}}""")
    }

    // grace controls buffer size: at 1 h buffers stay small (per-batch
    // overhead dominates); raise SPARK_GRAFT_GRACE_H to compare the v1
    // whole-buffer-rewrite cost against v2's per-entry puts at depth
    val graceMs = sys.env.getOrElse("SPARK_GRAFT_GRACE_H", "1").toLong * 3600L * 1000
    run("faithful", ds => StreamingReorder.faithful(ds, graceMs).toDF())
    run("idiomatic", ds => StreamingReorder.idiomatic(ds, graceMs))
    // v2 requires the RocksDB provider (transformWithState's native store)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    run("faithful_v2", ds => StreamingReorder.faithfulV2(ds, graceMs).toDF())
    spark.stop()
  }
}
