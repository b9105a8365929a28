package graft.tools
import graft.Tables
import graft.operators.Similarity

/** Recall probe for the OPQ rotation: raw PQ vs OPQ-rotated PQ vs brute
  * on the registry's query set (vec_id < 10, k = 5), at sf0.01/sf0.1.
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("opqprobe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (sf <- args.toSeq match {
        case Nil => Seq("sf0.001", "sf0.01", "sf0.1")
        case xs => xs
      }) {
      val raw = Tables.embeddings(spark, s"/root/testdata/$sf")
      // OPQ_SCALE=1: make the corpus variance-imbalanced (dims 0-3
      // scaled 8x -> raw PQ's subspace 0 dominates the ADC error)
      val emb = if (sys.env.get("OPQ_SCALE").contains("1"))
        raw.select($"vec_id", org.apache.spark.sql.functions.expr(
          "transform(embedding, (x, i) -> CAST(x * (CASE WHEN i < 4 THEN 8.0 ELSE 1.0 END) AS FLOAT))")
          .as("embedding"))
      else raw
      val nq = sys.env.getOrElse("OPQ_NQ", "10").toLong
      val queries = emb.filter($"vec_id" < nq)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val brute = pairs(Similarity.bruteTopK(queries, emb, "vec_id", "embedding", 5))
      val pq = pairs(Similarity.pqTopK(queries, emb, "vec_id", "embedding", 5, 64))
      val opq = pairs(Similarity.opqTopK(queries, emb, "vec_id", "embedding", 5, 64))
      println(s"RECALL $sf pq ${(brute & pq).size.toDouble / brute.size} " +
        s"opq ${(brute & opq).size.toDouble / brute.size}")
    }
    spark.stop()
  }
}
