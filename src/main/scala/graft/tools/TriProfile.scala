package graft.tools

import graft.Tables
import graft.operators.{BloomPrune, Graph}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the graph_triangles first-rep variance
  * (round-8 verdict #3): replays the registered query rep-by-rep with
  * per-phase wall timings so "which phase is slow on rep 1" is a
  * one-command answer. Not part of the driver contract; run with
  * runMain graft.tools.TriProfile [sfDir] [reps].
  */
object TriProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tri] $n: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    (1 to reps).foreach { rep =>
      println(s"[tri] ===== rep $rep =====")
      val edges = Graph.coOccurrenceEdges(
        Tables.lineitem(spark, dir), "l_orderkey", "l_partkey")
      val canon = time("canonical+persist+count") {
        val c = Graph.canonicalEdges(edges)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count()
        c
      }
      val eCnt = canon.count()
      val maxDeg = time("degree agg + max") {
        canon.select(explode(array(col("a"), col("b"))).as("id"))
          .groupBy(col("id")).agg(count(lit(1)).as("deg"))
          .agg(max(col("deg"))).head().getLong(0)
      }
      println(s"[tri] m=$eCnt maxDeg=$maxDeg ratio=" +
        f"${maxDeg / math.sqrt(eCnt.toDouble)}%.2f degreeOrder=${Graph.useDegreeOrder(maxDeg, eCnt)}")
      val sketch = time("bloom sketch build") {
        BloomPrune.bloomOfCols(canon, Seq(col("a"), col("b")),
          math.max(eCnt, 64L))
      }
      println(s"[tri] sketch bytes=${sketch.length}")
      val wedges = canon.join(
        canon.select(col("a").as("b"), col("b").as("c")), "b")
        .select(col("a"), col("b"), col("c"))
      val tri = wedges
        .filter(BloomPrune.mightContainCols(sketch, Seq(col("a"), col("c"))))
        .join(canon.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
      val out = tri.select(explode(array(col("a"), col("b"), col("c"))).as("node_id"))
        .groupBy(col("node_id")).agg(count(lit(1)).as("triangles"))
      time("wedge join + semi + agg (main job)") {
        out.write.format("noop").mode("overwrite").save()
      }
      canon.unpersist(blocking = false)
    }
    spark.stop()
  }
}
