package graft.tools

import graft.Tables
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc A/B timer for the embedding pair-join plans (not part of the
  * driver contract; run with runMain graft.tools.PairBench [sfDir]).
  * Compares the spec-only crossJoin baseline against the registered
  * blocked brute-force plan at the registered tau.
  */
object PairBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    println("n=" + emb.count())
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[pairbench] $n: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (i <- 1 to 3) {
      time(s"crossJoin#$i")(noop(Dedup.embedCosinePairs(emb, "vec_id", "embedding", 0.4)))
      time(s"blocked#$i")(noop(Similarity.blockedCosinePairs(emb, "vec_id", "embedding", 0.4)))
    }
    spark.stop()
  }
}
