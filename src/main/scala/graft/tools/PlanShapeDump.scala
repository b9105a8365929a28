package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Registry-wide PHYSICAL-plan-shape artifact — the executable
  * complement of `LINEAGE.tsv`: one row per query with its scale-bearing
  * node counts (cartesians, broadcast nested-loop joins, shuffle
  * exchanges, broadcast exchanges) from the pre-AQE physical plan,
  * committed as `PLANSHAPE.tsv` at the repo root. `PlanShapeDumpSpec`
  * regenerates it on every `sbt test` and asserts byte-identity, so a
  * query that silently GAINS A SHUFFLE (a broadcast hint lost, a join
  * reordered past its hint, an accidental repartition) fails a spec with
  * a one-line diff instead of shipping a plan regression the correctness
  * oracles cannot see — at sf0.01 an extra exchange is milliseconds; at
  * 100 TB it is the difference between one pass and two.
  *
  * Determinism: counts come from `queryExecution.sparkPlan` (strategy
  * output, before AQE and runtime re-planning); every broadcast in the
  * registry is an EXPLICIT `broadcast()` hint or a sub-threshold sf0.001
  * table orders of magnitude below the 10 MB auto-broadcast line, so
  * testdata regeneration jitter cannot flip a join strategy. Driver-side
  * trained literals change VALUES, never node counts.
  *
  * Run: runMain graft.tools.PlanShapeDump [outFile]  (default
  * PLANSHAPE.tsv, plans built against sf0.001 like LineageDump).
  */
object PlanShapeDump {

  /** The full artifact as a string — shared by the main and the spec.
    *
    *  - Starts from a CLEARED cache: a cached subtree from an earlier
    *    suite would hide its nodes behind InMemoryTableScan and flip
    *    counts, so both the main (fresh session) and the spec (shared
    *    test session) render from the same cold-cache state; queries
    *    that cache during the sweep do so in the same sorted order both
    *    times.
    *  - Counts come from `executedPlan` with AQE DISABLED for the sweep:
    *    `sparkPlan` predates EnsureRequirements, so the distribution-
    *    required exchanges (groupBy, join, global sort) don't exist in
    *    it yet — only explicit repartitions would be counted — while the
    *    AQE wrapper would hide the tree behind AdaptiveSparkPlanExec.
    *    Non-AQE executedPlan is the deterministic static plan with every
    *    exchange materialized.
    *  - The `eager_leaves` column SELF-DESCRIBES severed plans
    *    (round-12 verdict #2): operators that run eager supersteps or
    *    driver math during CONSTRUCTION register a frame whose scan
    *    leaves are checkpoint-severed RDDs (`rdd` — the graph family's
    *    persisted loops, the leak-safe split's clusterIds, the split
    *    audit) and/or driver-collected LocalRelations (`local` — the
    *    bounded-driver results: trained weights, argmaxes, annLegOnce
    *    recall rows). For those rows the count columns describe the
    *    SERVING plan only; the construction-time shuffle story is
    *    pinned by SCALE.md's plan audits and the operators' own specs.
    *    `-` marks a fully declarative plan whose counts are the whole
    *    story.
    */
  def render(spark: SparkSession, dir: String): String = {
    spark.catalog.clearCache()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val sb = new StringBuilder(
        "query\tcartesian\tbnlj\tshuffle\tbroadcast\teager_leaves\n")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, mk) =>
        val df = mk(spark, dir)
        val (c, b, s, br) =
          PlanAudit.shapeCounts(df.queryExecution.executedPlan)
        val leaves = df.queryExecution.analyzed.collectLeaves()
        // `reg`: a file-scan leaf OUTSIDE the sfDir — a session/registry
        // parquet stage boundary (curatedSplitOnce, fullClustersOnce,
        // the graph family's severed results). Counts describe the
        // SERVING plan; construction ran eagerly at the boundary write.
        val hasRegistryLeaf = leaves.exists {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                !fs.location.rootPaths.forall(_.toString.contains(dir))
              case _ => false
            }
          case _ => false
        }
        val kinds = Seq(
          if (leaves.exists(_.isInstanceOf[
              org.apache.spark.sql.execution.LogicalRDD])) Some("rdd") else None,
          if (leaves.exists(_.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
            Some("local") else None,
          if (hasRegistryLeaf) Some("reg") else None).flatten
        val eager = if (kinds.isEmpty) "-" else kinds.mkString("+")
        sb.append(name).append('\t').append(c).append('\t').append(b)
          .append('\t').append(s).append('\t').append(br)
          .append('\t').append(eager).append('\n')
      }
      sb.toString
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      // leave the session as found: the sweep itself populates caches
      // (queries that persist during construction), and a later suite
      // planning against them would see different join shapes
      spark.catalog.clearCache()
    }
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("PLANSHAPE.tsv")
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
