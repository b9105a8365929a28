package graft.operators

import graft.functions.{GramMatrixAgg, VectorOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the dimensionality-reduction pass a
  * vector store runs before ANN indexing or visualization.
  *
  * Scale shape: ONE distributed aggregation computes n, the per-dimension
  * sums, and the d(d+1)/2 Gram buffer ([[GramMatrixAgg]] — map-side
  * partials, one ~16 KB buffer per task); everything after (covariance,
  * eigen decomposition) is d×d DRIVER math, independent of corpus size.
  * Projection is a pure distributed projection against broadcast
  * component literals (native codegen dot products, no shuffle). This is
  * the same two-tier split as IVF training: bounded driver state, one
  * pass over the data.
  *
  * The eigen solve is a fixed-sweep cyclic Jacobi on the symmetric
  * covariance — deterministic (fixed rotation order, IEEE doubles), no
  * library dependency, exact enough that `PcaSpec` pins orthonormality at
  * 1e-9 and full-rank reconstruction at 1e-6. Component sign is
  * normalized (largest-|loading| coordinate made positive) so results
  * are reproducible across runs and partitionings.
  */
object Pca {

  /** mean: per-dimension mean; components: top-k eigenvectors (rows,
    * descending eigenvalue); eigenvalues: matching variances.
    */
  final case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double])

  /** One-pass moment collection + driver-side eigen solve. */
  def fit(df: DataFrame, vecCol: String, d: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= d, s"k must be in [1, $d]")
    val sums = (0 until d).map(i => sum(col(vecCol)(i).cast("double")).as(s"_s$i"))
    val row = df.agg(count(lit(1)).as("_n"),
      (sums :+ GramMatrixAgg.gram(col(vecCol), d).as("_g")): _*).head()
    val n = row.getLong(0).toDouble
    require(n > 0, "PCA on an empty input")
    val mean = Array.tabulate(d)(i => row.getDouble(1 + i) / n)
    val packed = row.getSeq[Double](1 + d)
    // covariance C = E[xx'] - μμ' from the packed upper-triangular Gram
    val c = Array.ofDim[Double](d, d)
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      val v = packed(idx) / n - mean(i) * mean(j)
      c(i)(j) = v; c(j)(i) = v
      idx += 1
    }
    val (vals, vecs) = jacobiEigen(c)
    // order by descending eigenvalue, index tiebreak; normalize sign
    val order = vals.zipWithIndex.sortBy { case (v, i) => (-v, i) }.map(_._2).take(k)
    val components = order.map { j =>
      val comp = Array.tabulate(d)(i => vecs(i)(j))
      val pivot = comp.indices.maxBy(i => (math.abs(comp(i)), -i))
      if (comp(pivot) < 0) comp.map(x => -x) else comp
    }
    PcaModel(mean, components, order.map(vals))
  }

  /** Append `outCol` = array(dot(v − μ, p₁) … dot(v − μ, p_k)): a pure
    * projection — each term is one codegen dot product against a
    * broadcast component literal minus a precomputed scalar.
    */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "pca"): DataFrame = {
    val terms = model.components.map { p =>
      val shift = p.zip(model.mean).map { case (a, b) => a * b }.sum
      VectorOps.dot(typedlit(p.toSeq), col(vecCol)) - lit(shift)
    }
    df.withColumn(outCol, array(terms.toIndexedSeq: _*))
  }

  /** Cyclic Jacobi eigen decomposition of a symmetric matrix: fixed sweep
    * order, fixed sweep count scaled to convergence (off-diagonal norm
    * < 1e-12 · trace-scale or 30 sweeps). Returns (eigenvalues, V) with
    * columns of V the eigenvectors.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm(): Double = {
      var s = 0.0
      for (i <- 0 until d; j <- i + 1 until d) s += a(i)(j) * a(i)(j)
      math.sqrt(s)
    }
    val scale = math.max(1e-300, (0 until d).map(i => math.abs(a(i)(i))).max)
    var sweep = 0
    while (sweep < 30 && offNorm() > 1e-12 * scale) {
      for (p <- 0 until d; q <- p + 1 until d if a(p)(q) != 0.0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
          case x if x == 0.0 && theta == 0.0 => 1.0
          case x => x
        }
        val cth = 1.0 / math.sqrt(t * t + 1.0)
        val sth = t * cth
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = cth * aip - sth * aiq
          a(i)(q) = sth * aip + cth * aiq
        }
        for (i <- 0 until d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = cth * api - sth * aqi
          a(q)(i) = sth * api + cth * aqi
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = cth * vip - sth * viq
          v(i)(q) = sth * vip + cth * viq
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
