package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators over edge DataFrames — the crawl-frontier /
  * domain-ranking building blocks of a web-scale training-data pipeline
  * (CommonCrawl ranks hosts by centrality before fetch budgeting; corpus
  * curation ranks domains the same way before mixing).
  *
  * Scale design: the Pregel shape. The edge list is the 100 TB side — it
  * is shuffled ONCE (distinct + degree count) and then persisted; every
  * iteration joins the node-sized rank table TO the edges, so at
  * 1000-executor scale each superstep moves ranks (16-byte rows), never
  * edges. With a node table small enough to broadcast (hosts ~10^8 rows
  * vs edges ~10^11), AQE turns each superstep's join into a broadcast
  * join and the edge table never re-shuffles at all.
  */
object Graph {

  /** PageRank with a FIXED iteration count and per-iteration rounding.
    *
    * Fixed iterations + round(pr, 10) after every superstep make the
    * result a pure deterministic function of the edge list — the
    * double-precision summation-order noise (~1 ulp of 1e-5 per sum) is
    * 5+ orders of magnitude below the rounding grid, so an independent
    * engine (the DuckDB oracle unrolls the same three supersteps in SQL)
    * reproduces every value bit-for-bit. Convergence-threshold variants
    * trade that determinism away; pipelines that want them can loop until
    * `abs(pr - prevPr)` maxes below epsilon with the same superstep body.
    *
    * `edges` must be DIRECTED (src, dst) — pass both directions for an
    * undirected graph. Every node must appear as a src (true for any
    * undirected edge set); rank mass from dangling nodes is therefore
    * structurally absent rather than redistributed.
    *
    * Output: (node_id, pagerank) — one row per node.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    // one shuffle builds degrees; the persisted (src, dst) + (id, deg)
    // pair is the loop-invariant state every superstep re-reads
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = deg.count() // materializes both persists
    val teleport = (1.0 - damping) / n

    var pr = deg.select(col("id"), col("deg"), (lit(1.0) / n).as("pr"))
    for (_ <- 1 to iters) {
      // contributions ride the edge join as one double per edge; the
      // groupBy(dst) aggregation is map-side combined so the superstep
      // shuffle is node-sized, not edge-sized
      val contrib = e
        .join(pr.select(col("id").as("src"), (col("pr") / col("deg")).as("_c")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("_c")).as("_s"))
      pr = deg.join(contrib, "id")
        .select(col("id"), col("deg"),
          round(lit(teleport) + lit(damping) * col("_s"), 10).as("pr"))
    }
    pr.select(col("id").as("node_id"), col("pr").as("pagerank"))
  }

  /** Undirected bipartite edge set (both directions) from two key columns
    * of a relation table, with the two key spaces interleaved into one
    * node-id space (left keys → 2k, right keys → 2k+1).
    */
  def bipartiteEdges(rel: DataFrame, leftKey: String, rightKey: String): DataFrame = {
    val e0 = rel.select((col(leftKey) * 2).as("src"), (col(rightKey) * 2 + 1).as("dst"))
      .distinct()
    e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
  }
}
