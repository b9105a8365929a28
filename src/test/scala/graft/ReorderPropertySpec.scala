package graft

import graft.model.ElectronicOrder
import graft.operators.Reorder
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** SURVEY §5 property: any permutation of timestamp-distinct records
  * reorders to the time-sorted identity, and first-wins dedup keeps
  * exactly one record per duplicated timestamp. Cases are drawn from
  * ScalaCheck generators with fixed seeds so runs are reproducible.
  */
class ReorderPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val timesGen: Gen[List[Long]] =
    Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 1000L)).map(_.distinct))

  private def cases(n: Int): Seq[List[Long]] =
    (0 until n).flatMap(i =>
      timesGen.apply(Gen.Parameters.default, rng.Seed(i.toLong)))
      .filter(_.nonEmpty)

  test("reorder of any permutation equals the sorted list") {
    cases(10).foreach { times =>
      val shuffled = new scala.util.Random(times.hashCode).shuffle(times)
      val in = shuffled.zipWithIndex.map { case (ti, i) =>
        ElectronicOrder(i.toString, "one", s"u$i", i.toDouble, ti)
      }.toDF().withColumn("arrival", monotonically_increasing_id())
      val out = Reorder.reorderDedup(in, "time", "arrival")
        .select("time").as[Long].collect().toList
      assert(out == times.sorted, s"failed for input $shuffled")
    }
  }

  test("duplicated timestamps keep exactly the first-arriving record") {
    cases(10).foreach { times =>
      val base = times.zipWithIndex.map { case (ti, i) =>
        ElectronicOrder(s"a$i", "one", "first", 1.0, ti)
      }
      val dups = times.zipWithIndex.collect { case (ti, i) if i % 3 == 0 =>
        ElectronicOrder(s"b$i", "one", "second", 2.0, ti)
      }
      val in = (base ++ dups).toDF()
        .withColumn("arrival", monotonically_increasing_id())
      val out = Reorder.reorderDedup(in, "time", "arrival")
      assert(out.count() == times.length.toLong)
      assert(out.filter(col("user_id") === "second").count() == 0,
        "every duplicated timestamp must resolve to the first arrival")
    }
  }
}
