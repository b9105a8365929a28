package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the standard 4× storage/bandwidth cut for
  * large embedding stores (100 TB of float32 vectors → 25 TB of int8 +
  * one scale per vector), used by every large-scale ANN deployment before
  * the index ever sees a vector.
  *
  * Scheme: symmetric per-vector absmax. `scale = max(|x_i|)`,
  * `q_i = round(x_i * 127 / scale)` ∈ [-127, 127], dequant
  * `x̂_i = q_i * scale / 127`, worst-case element error `scale/254`.
  *
  * Determinism contract (what makes this oracle-checkable, not just
  * spec-gated): rounding is `floor(v + 0.5)` — floor and IEEE `*`,`/`,`+`
  * are bit-exact in every engine, unlike `round()` whose half-tie
  * behavior differs between Spark (BigDecimal HALF_UP) and DuckDB.
  * The whole quantization is a pure projection: zero shuffles, linear in
  * bytes, codegen'd; all-zero vectors quantize to all-zero (scale 0 is
  * never divided by).
  */
object Quantize {

  private def absMax(vecCol: Column): Column =
    array_max(transform(vecCol, x => abs(x.cast("double"))))

  private def quantElem(x: Column, scale: Column): Column =
    when(scale === 0d, lit(0L))
      .otherwise(floor(x.cast("double") * lit(127.0) / scale + lit(0.5)).cast("long"))

  /** Production form: one row per vector — (idCol, scale, qvec tinyint[]).
    * This is what a 100 TB pipeline writes: int8 parquet + a double scale.
    */
  def int8Packed(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    // scale materialized in a lower projection so the transform lambda
    // reads an attribute, not a re-run of absMax per element (the HOF
    // inlining trap — see TextAnalysis.stats)
    emb.select(col(idCol), absMax(col(vecCol)).as("scale"), col(vecCol).as("_v"))
      .select(col(idCol), col("scale"),
        transform(col("_v"), x => quantElem(x, col("scale")))
          .cast("array<tinyint>").as("qvec"))

  /** Oracle surface: exploded scalars — (idCol, dim_idx, scale, q). Same
    * numbers as [[int8Packed]] (spec-pinned), but every quantized value is
    * an oracle-hashable scalar row instead of an array column.
    */
  def int8Rows(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), absMax(col(vecCol)).as("scale"),
        posexplode(col(vecCol)).as(Seq("dim_idx", "_x")))
      .select(col(idCol), col("dim_idx").cast("long").as("dim_idx"),
        col("scale"), quantElem(col("_x"), col("scale")).as("q"))

  /** Per-dimension EXACT clip bounds for winsorization: the p01/p99 ORDER
    * STATISTICS (actual data values at integer ranks — no interpolation,
    * so no float arithmetic to diverge cross-engine) plus how many values
    * each dimension would clip. Ranks use pure integer arithmetic:
    * k_lo = ⌈n/100⌉, k_hi = ⌈99n/100⌉.
    *
    * The outlier-clipping profile every embedding store computes before
    * int8 quantization ([[int8Packed]]): absmax scaling is destroyed by a
    * single outlier dimension; clip to these bounds first and the int8
    * grid covers the real mass. Shape: one ranking window per dimension
    * (ndims independent sorts) over exploded (dim, x) pairs, then a
    * broadcast-sized bounds join back. At 100 TB swap the exact ranks
    * for [[Percentiles]]-style iterative refinement per dimension; the
    * contract (values AT ranks) stays identical.
    * Output: (dim, n, p01, p99, n_clipped).
    */
  def clipBounds(emb: DataFrame, vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = emb.select(posexplode(col(vecCol)).as(Seq("dim", "_xf")))
      .select(col("dim").cast("long").as("dim"), col("_xf").cast("double").as("x"))
    val w = Window.partitionBy(col("dim")).orderBy(col("x"))
    val ranked = x
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("dim"))))
    val bounds = ranked
      .groupBy(col("dim"))
      .agg(max(col("_n")).as("n"),
        min(when(col("_rn") === expr("(_n + 99) div 100"), col("x"))).as("p01"),
        min(when(col("_rn") === expr("(_n * 99 + 99) div 100"), col("x"))).as("p99"))
    x.join(bounds, "dim")
      .groupBy(col("dim"))
      .agg(max(col("n")).as("n"), max(col("p01")).as("p01"), max(col("p99")).as("p99"),
        sum(when(col("x") < col("p01") || col("x") > col("p99"), 1L)
          .otherwise(0L)).as("n_clipped"))
      .orderBy(col("dim"))
  }
}
