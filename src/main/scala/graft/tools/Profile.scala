package graft.tools

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the near-dup pipelines (not part of the
  * driver contract; run with runMain graft.tools.Profile [sfDir]).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $n: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val docs = Tables.documents(spark, dir)
    val sh = docs.select(col("doc_id").as("_id"), Text.tokens(col("text")).as("_toks"))
      .select(col("_id"), explode(Text.shinglesOfTokens(col("_toks"), 3)).as("_sh"))
      .select(col("_id"), xxhash64(col("_sh")).as("_h"))
    time("sh.count")(println("sh=" + sh.count()))
    val sizes = sh.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    val dfreq = sh.groupBy(col("_h")).agg(count(lit(1)).as("_df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_df"), col("_h"))
    val prefix = sh.join(dfreq, "_h")
      .withColumn("_rn", row_number().over(w)).join(sizes, "_id")
      .filter(col("_rn") <= floor(lit(0.3) * col("_n")).cast("long") + 1)
      .select(col("_id"), col("_h"))
    time("prefix.count")(println("prefix=" + prefix.count()))
    val p1 = prefix.select(col("_id").as("_ida"), col("_h"))
    val p2 = prefix.select(col("_id").as("_idb"), col("_h"))
    val cand = p1.join(p2, "_h").filter(col("_ida") < col("_idb"))
      .select(col("_ida"), col("_idb")).distinct()
    time("cands.count")(println("cands=" + cand.count()))
    val full = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
    time("full")(println("pairs=" + full.count()))
    spark.stop()
  }
}
