package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's) with a fixed iteration count and
  * deterministic rounding — the semantic-clustering / corpus-mixing
  * building block of an embedding curation pipeline.
  *
  * Determinism contract (the pageRank recipe applied to vectors): seeds
  * are the k lowest-id vectors; every squared-L2 distance is rounded to
  * 4 dp before the argmin (ties → lowest cluster id), every updated
  * centroid coordinate to 6 dp; a cluster that captures no vectors
  * keeps its previous centroid. An independent engine replaying the
  * same unrolled iterations reproduces every assignment (the
  * `emb_kmeans` DuckDB oracle does exactly that).
  *
  * Why the contract is robust, not just empirically green (round-9
  * hardening of the round-8 advice):
  *
  *  - Centroid sums are ORDER-INDEPENDENT: each coordinate is summed as
  *    DECIMAL(30,15) — exact integer arithmetic, so partition order and
  *    engine fold order cannot move the sum by even 1 ulp — then cast to
  *    double and divided by the count in one IEEE op each. A plain
  *    double `avg()` (the round-8 form) was summed in partition order
  *    and could in principle flip a 6 dp rounding between runs/engines.
  *    The per-element double→decimal cast is itself tie-free (below),
  *    so both engines produce the IDENTICAL decimal sum.
  *  - The decimal roundings cannot tie: every intermediate (a float
  *    coordinate, a fold of products of doubles, a double quotient) is a
  *    dyadic rational m/2^k, while a HALF_UP tie at d decimals requires
  *    the value to sit exactly on odd/(2·10^d) — whose reduced
  *    denominator contains 5^d and is therefore NOT dyadic. So
  *    round(·, 4) / round(·, 6) / the decimal cast have no ties, and
  *    round-to-nearest agrees across engines whatever their tie-break
  *    mode. The residual (shared with every rounded query in this repo)
  *    is an engine rounding a double it computed DIFFERENTLY — excluded
  *    here because both sides fix the op order (sequential fold for
  *    distances, exact decimal for sums).
  *
  * Scale shape: centroids are k×d DRIVER state (the bounded-collect
  * discipline of the IVF/PQ trainers — k·d doubles, e.g. 512 for
  * k=8 d=64), broadcast into each pass as literal arrays. Each
  * iteration is ONE codegen'd projection computing k distances per row
  * (no join, no shuffle for assignment) plus ONE map-side-combined
  * (cluster, dim) aggregation for the update — the per-iteration
  * shuffle carries k·d·#tasks partial rows, never vectors. At 100 TB
  * the corpus is scanned iters+1 times and nothing vector-sized ever
  * shuffles.
  */
object KMeans {

  /** Final (id, cluster) assignment after `iters` Lloyd updates; the
    * output is the assignment under the FINAL centroids. `vecCol` is an
    * array<float> column; the k LOWEST-id vectors seed clusters 0..k-1
    * positionally (id-gap tolerant, so subsampled corpora still seed).
    */
  def assign(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): DataFrame = {
    val emb = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    var centroids: Array[Array[Double]] = emb
      .orderBy(col("_id")).limit(k).select(col("_v")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(centroids.length == k, s"need at least $k vectors to seed")

    def assigned(): DataFrame = {
      val dists = centroids.map { c =>
        val cLit = array(c.map(lit): _*)
        round(aggregate(
          zip_with(col("_v"), cLit, (a, b) => {
            val d = a.cast("double") - b
            d * d
          }), lit(0.0), _ + _), 4)
      }
      emb.withColumn("_d", array(dists: _*))
        .withColumn("cluster",
          (array_position(col("_d"), array_min(col("_d"))) - 1).cast("long"))
        .select(col("_id"), col("cluster"), col("_v"))
    }

    for (_ <- 1 to iters) {
      val upd = assigned()
        .select(col("cluster"), posexplode(col("_v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        // exact decimal sum (order-independent) ÷ count as ONE double op,
        // instead of a partition-order-dependent double avg — see the
        // determinism contract above
        .agg(round(
          sum(col("x").cast("double").cast("decimal(30,15)")).cast("double")
            / count(lit(1)), 6).as("c"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cl, rows) =>
          cl.toInt -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
        }
      centroids = Array.tabulate(k)(j => upd.getOrElse(j, centroids(j)))
    }
    assigned().select(col("_id").as(idCol), col("cluster"))
  }
}
