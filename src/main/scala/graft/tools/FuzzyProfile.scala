package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler for the fuzzy-join candidate pipeline (not part of the
  * driver contract; run with runMain graft.tools.FuzzyProfile [sfDir]).
  */
object FuzzyProfile {
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
      println(f"[fuzzy] $n: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val (q, maxDist) = (3, 1)
    val minLen = q * (maxDist + 1)
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("_id"), col("c_name").as("_s"))
      .filter(length(col("_s")) >= minLen)
    time("base")(println("base=" + base.count()))
    val grams = base.select(col("_id"),
      explode(transform(sequence(lit(1), length(col("_s")) - (q - 1)),
        i => col("_s").substr(i, lit(q)))).as("_g"))
    time("grams")(println("grams=" + grams.count()))
    val freq = grams.groupBy(col("_g")).agg(count(lit(1)).as("_f"))
    time("freq")(println("freq=" + freq.count()))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_f"), col("_g"))
    val prefix = grams.join(freq, "_g")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= q * maxDist + 1)
      .select(col("_id"), col("_g"))
      .persist()
    time("prefix")(println("prefix=" + prefix.count()))
    val raw = prefix.select(col("_id").as("_ida"), col("_g"))
      .join(prefix.select(col("_id").as("_idb"), col("_g")), "_g")
      .filter(col("_ida") < col("_idb"))
    time("rawPairs")(println("rawPairs=" + raw.count()))
    val cands = raw.select(col("_ida"), col("_idb")).distinct()
    time("cands")(println("cands=" + cands.count()))
    val verified = cands
      .join(base.select(col("_id").as("_ida"), col("_s").as("_sa")), "_ida")
      .join(base.select(col("_id").as("_idb"), col("_s").as("_sb")), "_idb")
      .withColumn("dist", levenshtein(col("_sa"), col("_sb")).cast("long"))
      .filter(col("dist") <= maxDist)
    time("verified")(println("verified=" + verified.count()))
    // top posting lists of the prefix index
    prefix.groupBy(col("_g")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(10).collect()
      .foreach(r => println(s"[fuzzy] posting '${r.getString(0)}' -> ${r.getLong(1)}"))
    spark.stop()
  }
}
