package graft.tools
import graft.Tables
import graft.operators.Similarity
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("pqprobe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf")
      val queries = emb.filter($"vec_id" < 10)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val brute = pairs(Similarity.bruteTopK(queries, emb, "vec_id", "embedding", 5))
      val ivfpq = pairs(Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding", 5, 64))
      println(s"RECALL $sf ivfpq ${(brute & ivfpq).size.toDouble / brute.size}")
    }
    spark.stop()
  }
}
