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

  /** Eagerly materialize a node-sized result and sever its plan lineage
    * so the edge-sized persisted intermediates can be released before
    * returning. Severing is via a SESSION TEMP PARQUET round trip — the
    * registry-stage-boundary discipline used everywhere else in this
    * repo — NOT `localCheckpoint`: a checkpointed RDD stays pinned in
    * the block store until the context cleaner happens to collect the
    * frame, so every call leaked one node-sized cache entry (and its
    * superstep shuffle files) for an unbounded grace period. Round-14
    * isolated 9-rep evidence: with checkpoint severing the triangle
    * reps CLIMB 6.9 → 10.1 s across one bench invocation's own reps —
    * accumulated block/GC pressure from the query's own history — while
    * the parquet boundary leaves the block manager empty after every
    * call. The written result is node-sized (ranks, per-node counts),
    * so the round trip costs one small local write; at cluster scale
    * the same boundary is a shared-storage artifact, which is what a
    * production rank/community table is anyway. Files live under one
    * JVM-temp root removed by a shutdown hook; a long-lived service
    * calling graph ops unboundedly many times should persist results to
    * its own registry instead (the written frame is returned, so the
    * caller can `.write` it onward without recompute).
    */
  private lazy val severRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_graph_sever")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }))
    p
  }
  private val severSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def materialized(df: DataFrame): DataFrame = {
    // stable "graft_sever_" basename prefix: the per-JVM sequence number
    // depends on call order, and lineage names file sources by basename
    // — Lineage maps this prefix to the order-independent "(severed)"
    val out = severRoot.resolve("graft_sever_" + severSeq.getAndIncrement()).toString
    df.write.mode("overwrite").parquet(out)
    df.sparkSession.read.parquet(out)
  }

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
    val out = materialized(
      pr.select(col("id").as("node_id"), col("pr").as("pagerank")))
    // blocking: the edge-sized frames must be GONE when the call
    // returns — async release let back-to-back calls (bench reps,
    // sweep services) stack edge-sized blocks and climb 1.5× per rep
    e.unpersist(blocking = true)
    deg.unpersist(blocking = true)
    out
  }

  /** Per-node triangle counts via the ordered-edge (node-iterator) join —
    * the standard distributed triangle algorithm: canonicalize each
    * undirected edge to (a < b), build wedges a→b→c under a total order
    * by self-joining on the middle node, then confirm the closing (a, c)
    * edge with a semi join. The ordering means each triangle is generated
    * exactly once, and only low-to-high adjacency is ever joined.
    *
    * ORIENTATION IS AUTO-DISPATCHED on a measured skew statistic
    * (round-9 hardening — the manual choice was the one place a 100 TB
    * user could silently get a quadratic plan): the id order lets a
    * low-id hub pair up ALL its higher-id neighbors (wedges quadratic in
    * hub degree), while the (degree, id) order bounds out-degrees at
    * O(√m) and wedges at O(m^1.5) regardless of skew, at the cost of two
    * extra node-sized orientation joins. The dispatch statistic is
    * max_degree/√m from the node-sized degree aggregation (one map-side-
    * combined scan of the canonical edge set, reused as the orientation
    * input when the degree path is taken):
    *
    *  - every REGULAR graph sits at ratio √(2d/n) ≤ √2 ≈ 1.414, the
    *    complete graph's exact value — there both orders generate the
    *    identical wedge set and the orientation joins are pure overhead
    *    (measured +30% on the round-7 co-supplier graph, which was
    *    complete; the current registered part co-occurrence graph
    *    measures ratio 0.20 at sf0.1 — deep in id-order territory);
    *  - a power-law hub sits far above: a star's ratio is √m, web-graph
    *    hubs typically 10–100×√m̄.
    *
    * Threshold 2.0 cleanly separates the regimes (spec-pinned both ways:
    * the complete/regular fixtures stay id-ordered, a planted hub graph
    * dispatches to degree order and its output matches both manual
    * variants). At ratio 2 the worst hub contributes ≤ 2m wedges under
    * id order — the break-even band where either plan is fine; beyond it
    * the id-order blowup grows as ratio² while the degree path stays
    * O(m^1.5).
    *
    * Output: (node_id, triangles) — one row per node that closes at
    * least one triangle; each triangle credits all three corners.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eCnt = canon.count() // materializes the persist, sizes the sketch
    // node-sized degree table: the dispatch statistic AND (if the degree
    // path is taken) the orientation input — built once, reused
    val deg = canon.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxDeg = deg.agg(max(col("deg"))).head().getLong(0)
    val out =
      if (useDegreeOrder(maxDeg, eCnt)) {
        val e = orientByDegree(canon, deg)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        e.count() // materialize before dropping canon
        canon.unpersist(blocking = true)
        deg.unpersist(blocking = true)
        val r = materialized(trianglesPlan(e, eCnt))
        e.unpersist(blocking = true)
        r
      } else {
        deg.unpersist(blocking = true)
        val r = materialized(trianglesPlan(canon, eCnt))
        canon.unpersist(blocking = true)
        r
      }
    // the parquet sever does not preserve the pre-write sort across
    // files; re-impose the output contract on the node-sized scan
    out.orderBy(col("node_id"))
  }

  /** Canonical undirected edge set: (a < b), direction- and
    * duplicate-collapsed.
    */
  private[graft] def canonicalEdges(edges: DataFrame): DataFrame = edges
    .select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
    .filter(col("a") < col("b"))
    .distinct()

  /** The [[triangles]] dispatch predicate: degree-ordered orientation iff
    * max_degree > 2·√m. Regular graphs max out at √2·√m (complete graph);
    * skewed hubs sit at 10×+ — see the [[triangles]] scaladoc.
    */
  private[graft] def useDegreeOrder(maxDeg: Long, edgeCnt: Long): Boolean =
    maxDeg.toDouble > 2.0 * math.sqrt(math.max(edgeCnt, 1L).toDouble)

  /** Re-orient a canonical edge set low→high in the (degree, id) total
    * order. Two node-sized joins — broadcast at cluster scale where the
    * node table is ~√ of the edge table or smaller.
    */
  private def orientByDegree(canon: DataFrame, deg: DataFrame): DataFrame = {
    val aFirst = col("_da") < col("_db") ||
      (col("_da") === col("_db") && col("a") < col("b"))
    canon
      .join(deg.select(col("id").as("a"), col("deg").as("_da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("_db")), "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("a"),
        when(aFirst, col("b")).otherwise(col("a")).as("b"))
  }

  /** [[triangles]] forced to id-order orientation — the regular-graph
    * fast path, kept callable for specs and for callers that KNOW their
    * degree distribution (the auto-dispatch in [[triangles]] costs one
    * node-sized aggregation to find out).
    */
  def trianglesIdOrdered(edges: DataFrame): DataFrame = {
    val e = canonicalEdges(edges)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eCnt = e.count() // materializes the persist, sizes the sketch
    val out = materialized(trianglesPlan(e, eCnt))
    e.unpersist(blocking = true)
    out.orderBy(col("node_id"))
  }

  /** [[triangles]] forced to degree-ordered orientation — the O(m^1.5)
    * skew-proof variant the auto-dispatch selects on hub graphs. Triangle
    * counts are orientation-invariant, so output is identical to
    * [[trianglesIdOrdered]] (spec-pinned on a planted skewed graph).
    */
  def trianglesDegreeOrdered(edges: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges)
    val deg = canon.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val e = orientByDegree(canon, deg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eCnt = e.count() // materializes the persist, sizes the sketch
    val out = materialized(trianglesPlan(e, eCnt))
    e.unpersist(blocking = true)
    out.orderBy(col("node_id"))
  }

  /** The lazy wedge-join plan over a canonicalized, persisted edge set —
    * split out so the spec can pin the bloom-probe plan shape before
    * [[triangles]] materializes it.
    */
  private[graft] def trianglesPlan(e: DataFrame, eCnt: Long): DataFrame = {
    val wedges = e.join(
      e.select(col("a").as("b"), col("b").as("c")), "b")
      .select(col("a"), col("b"), col("c"))
    // the wedge set is the blow-up (Σ C(outdeg, 2) rows — measured ~40×
    // the edge count on the co-order graph); probing an edge-set bloom
    // sketch MAP-SIDE reduces the closing-edge semi join's shuffle to
    // ~triangles + fpp·wedges, and the exact semi join that follows
    // kills the false positives, so the result is unchanged
    val sketch = BloomPrune.bloomOfCols(e, Seq(col("a"), col("b")),
      math.max(eCnt, 64L))
    val tri = wedges
      .filter(BloomPrune.mightContainCols(sketch, Seq(col("a"), col("c"))))
      .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node_id"))
      .groupBy(col("node_id"))
      .agg(count(lit(1)).as("triangles"))
      .orderBy(col("node_id"))
  }

  /** Community detection via SYNCHRONOUS label propagation (Raghavan et
    * al. 2007, the parallel variant): every node starts as its own label;
    * each iteration every node simultaneously adopts the most frequent
    * label among its neighbors, ties broken toward the SMALLEST label.
    * The synchronous schedule + lowest-label tie-break make the result a
    * pure integer function of the edge list — no randomness, no floats,
    * so the oracle hash is exact by construction (the strongest
    * determinism class in this repo; the k-means/pagerank rounding
    * contracts aren't even needed). The cost of that determinism is the
    * known synchronous-LPA oscillation on bipartite structure — a fixed
    * iteration count takes a defined snapshot instead of spinning.
    *
    * Scale shape (the pageRank loop applied to labels): edges persist
    * once; each iteration joins the node-sized label table to the edges
    * (broadcast at cluster scale), then ONE map-side-combined
    * (node, label) count and ONE node-sized argmax — the superstep
    * shuffle carries (node, label, count) partials, never edges. Labels
    * only ever DECREASE (ties) or follow neighborhood majorities, and
    * communities here are label values, so the output is node-sized.
    *
    * `edges` must contain both directions of each undirected edge and
    * every node as a src (same contract as [[pageRank]]).
    *
    * Output: (node_id, community) — one row per node.
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count()
    var labels = e.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    for (_ <- 1 to iters) {
      val counts = e
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      // argmax by (count desc, label asc) = min of the (-cnt, label)
      // struct under lexicographic struct ordering
      labels = counts.groupBy(col("id"))
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("id"), col("m").getField("l").as("label"))
    }
    val out = materialized(
      labels.select(col("id").as("node_id"), col("label").as("community")))
    e.unpersist(blocking = true)
    out
  }

  /** Co-occurrence edge set: undirected edges between `entityKey` values
    * sharing at least one `groupKey` (e.g. suppliers co-supplying a
    * part). Emitted canonical (src < dst), distinct. The per-group
    * self-join is quadratic in group size — callers with unbounded
    * groups (a part supplied by millions of suppliers does not happen;
    * a token shared by millions of docs does) should cap or drop the
    * hot groups first, exactly like the PPJoin prefix filter does.
    */
  def coOccurrenceEdges(rel: DataFrame, groupKey: String, entityKey: String): DataFrame = {
    val ps = rel.select(col(groupKey).as("_g"), col(entityKey).as("_e")).distinct()
    ps.join(ps.select(col("_g"), col("_e").as("_e2")), "_g")
      .filter(col("_e") < col("_e2"))
      .select(col("_e").as("src"), col("_e2").as("dst"))
      .distinct()
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
