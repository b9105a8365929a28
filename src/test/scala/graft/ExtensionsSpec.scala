package graft

/** SQL surface of the native expressions via GraftExtensions.register. */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("poly_hash / dot_product / topk_by are callable from SQL") {
    GraftExtensions.register(spark)

    val ph = spark.sql("SELECT poly_hash('hello world') AS h").as[Long].head()
    assert(ph == 1835087470L)

    val dp = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .as[Double].head()
    assert(dp == 32.0)

    val mg = spark.sql(
      "SELECT min_gram_md5('hello world', 8) = " +
        "array_min(transform(sequence(1, greatest(length('hello world') - 7, 1)), " +
        "i -> md5(substring('hello world', i, 8)))) AS ok").as[Boolean].head()
    assert(mg, "min_gram_md5 must equal its composable definition")

    Seq((1L, 1.0, 10L), (1L, 3.0, 11L), (1L, 2.0, 12L), (2L, 9.0, 13L))
      .toDF("g", "s", "id").createOrReplaceTempView("tk")
    val top = spark.sql(
      """SELECT g, topk_by(s, id, 2) AS t FROM tk GROUP BY g ORDER BY g""")
      .selectExpr("g", "transform(t, e -> e.id) AS ids")
      .as[(Long, Seq[Long])].collect().toSeq
    assert(top == Seq((1L, Seq(11L, 12L)), (2L, Seq(13L))))
  }
}
