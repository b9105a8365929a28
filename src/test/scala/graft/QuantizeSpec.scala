package graft

import graft.operators.Quantize
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = Seq(
    (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
    (2L, Array(3.0f, 3.0f, -3.0f, 1.5f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // all-zero: scale 0, no division
    (4L, Array(1e-8f, -1e-8f, 5e-9f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("int8Rows: absmax scale, values in [-127,127], known quantizations") {
    val rows = Quantize.int8Rows(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    // vec 1: scale 1.0 -> q = round(x*127): 64 (63.5 rounds up), -127, 32, 0
    assert(rows((1L, 0L)) == ((1.0, 64L)))
    assert(rows((1L, 1L)) == ((1.0, -127L)))
    assert(rows((1L, 2L)) == ((1.0, 32L)))
    assert(rows((1L, 3L)) == ((1.0, 0L)))
    // vec 2: scale 3.0 -> extremes hit exactly ±127, 1.5 -> 63.5 -> 64
    assert(rows((2L, 0L))._2 == 127L && rows((2L, 2L))._2 == -127L)
    assert(rows((2L, 3L))._2 == 64L)
    // vec 3: all-zero vector quantizes to all zero, scale 0 never divided
    (0L to 3L).foreach(i => assert(rows((3L, i)) == ((0.0, 0L))))
    assert(rows.values.forall { case (_, q) => q >= -127L && q <= 127L })
  }

  test("packed tinyint form carries exactly the exploded numbers") {
    val packed = Quantize.int8Packed(emb, "vec_id", "embedding")
      .select(col("vec_id"), col("scale"), col("qvec"))
      .as[(Long, Double, Seq[Byte])].collect()
      .flatMap { case (id, sc, q) =>
        q.zipWithIndex.map { case (v, i) => (id, i.toLong) -> ((sc, v.toLong)) }
      }.toMap
    val rows = Quantize.int8Rows(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    assert(packed == rows)
  }

  test("property: round-trip bound and range hold for generated finite vectors") {
    import org.scalacheck.{Gen, rng}
    val vecGen = Gen.chooseNum(1, 16).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-1e6f, 1e6f)))
    val vecs = (0 until 30).flatMap(i =>
      vecGen.apply(Gen.Parameters.default, rng.Seed(i.toLong)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    val df = vecs.toDF("vec_id", "embedding")
    val byVec = vecs.toMap
    Quantize.int8Rows(df, "vec_id", "embedding").collect().foreach { r =>
      val (id, i, sc, q) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(q >= -127L && q <= 127L)
      val x = byVec(id)(i.toInt).toDouble
      assert(math.abs(x - q * sc / 127.0) <= sc / 254.0 + math.ulp(sc),
        s"vec $id dim $i: x=$x q=$q scale=$sc")
    }
  }

  test("dequantization error is bounded by scale/254 per element") {
    val orig = emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getFloat(2).toDouble).toMap
    Quantize.int8Rows(emb, "vec_id", "embedding").collect().foreach { r =>
      val (id, i, sc, q) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      val err = math.abs(orig((id, i.toInt)) - q * sc / 127.0)
      assert(err <= sc / 254.0 + 1e-12, s"vec $id dim $i err $err vs bound ${sc / 254.0}")
    }
  }

  test("clipBounds returns exact order statistics at ceil-ranks and clip counts") {
    // dim 0: values 1..200 -> n=200, k_lo=2, k_hi=198: p01=2, p99=198,
    // clipped = {1, 199, 200} -> 3. dim 1: constant -> p01=p99, 0 clipped.
    val vecs = (1 to 200).map(i => Seq(i.toFloat, 5f)).toDF("embedding")
    val out = graft.operators.Quantize.clipBounds(vecs, "embedding")
      .as[(Long, Long, Double, Double, Long)].collect().toSeq
    assert(out == Seq((0L, 200L, 2.0, 198.0, 3L), (1L, 200L, 5.0, 5.0, 0L)),
      s"got $out")
  }
}
