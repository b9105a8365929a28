package graft.tools

import graft.SparkEntry
import graft.plans.Lineage
import org.apache.spark.sql.SparkSession

/** Registry-wide column-lineage artifact (round-8 verdict #7): one TSV
  * row per (query, output column, source table, source column) across
  * EVERY registered query, committed as `LINEAGE.tsv` at the repo root.
  * `LineageDumpSpec` regenerates it on every `sbt test` and asserts
  * byte-identity, so a future round that silently changes which source
  * columns feed a query's output — the regression class `q_lineage_report`
  * can only catch for its one traced query — fails a spec with a diff
  * instead of shipping.
  *
  * Determinism: queries render in sorted-name order; [[Lineage.report]]
  * sorts its rows; source tables are parquet basenames (sf-dir
  * independent); and the relation contains only NAMES, never data values,
  * so driver-side trained literals (k-means centroids, PQ codebooks, BPE
  * merges) cannot wobble the bytes.
  *
  * Run: runMain graft.tools.LineageDump [outFile]  (default LINEAGE.tsv;
  * builds each query's plan against sf0.001 — analysis cost plus the few
  * bounded driver-side training collects, the same work the driver's
  * verify pass at that scale already pays).
  */
object LineageDump {

  /** The full artifact as a string — shared by the main and the spec. */
  def render(spark: SparkSession, dir: String): String = {
    val sb = new StringBuilder("query\toutput_col\tsource_table\tsource_col\n")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, mk) =>
      Lineage.report(mk(spark, dir)).collect().foreach { r =>
        sb.append(name).append('\t').append(r.getString(0)).append('\t')
          .append(r.getString(1)).append('\t').append(r.getString(2))
          .append('\n')
      }
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("LINEAGE.tsv")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      render(spark, dir).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $out")
    spark.stop()
  }
}
