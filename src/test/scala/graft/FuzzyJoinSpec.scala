package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("selfJoin finds substitution, insertion, and deletion typos at d=1") {
    val rows = Seq(
      (1L, "jonathan smith"),
      (2L, "jonathan smyth"),  // substitution of 1
      (3L, "jonathan smiths"), // insertion on 1
      (4L, "jonathan simth"),  // transposition = 2 edits: NOT a match at d=1
      (5L, "jonatan smith"),   // deletion on 1
      (6L, "completely other name")).toDF("id", "name")
    val out = FuzzyJoin.selfJoin(rows, "id", "name", maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 5L, 1L)),
      s"got $out")
  }

  test("selfJoin equals the all-pairs answer on customer names at sf0.001") {
    val cust = Tables.customer(spark, "/root/testdata/sf0.001")
    val fast = FuzzyJoin.selfJoin(cust, "c_custkey", "c_name", maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    val a = cust.select(col("c_custkey").as("ka"), col("c_name").as("na"))
    val b = cust.select(col("c_custkey").as("kb"), col("c_name").as("nb"))
    val brute = a.crossJoin(b)
      .filter(col("ka") < col("kb") && levenshtein(col("na"), col("nb")) <= 1)
      .select(col("ka"), col("kb"),
        levenshtein(col("na"), col("nb")).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(fast == brute, s"missing=${(brute -- fast).take(5)} extra=${(fast -- brute).take(5)}")
    assert(fast.nonEmpty, "adjacent customer ids differ by one digit — pairs must exist")
  }

  test("d=2 deletion path and d=3 q-gram path equal brute force on typo'd names") {
    val rows = Seq(
      (1L, "margaret atwood writer"),
      (2L, "margaret atwod writers"),   // 1 del + 1 ins = 2
      (3L, "margret atwood writer"),    // 1 deletion
      (4L, "margarette atwoode writer"),// 3 edits
      (5L, "unrelated entry here")).toDF("id", "name")
    for (d <- Seq(2, 3)) {
      val fast = FuzzyJoin.selfJoin(rows, "id", "name", maxDist = d)
        .as[(Long, Long, Long)].collect().toSet
      val a = rows.select(col("id").as("ka"), col("name").as("na"))
      val b = rows.select(col("id").as("kb"), col("name").as("nb"))
      val brute = a.crossJoin(b)
        .filter(col("ka") < col("kb") &&
          length(col("na")) >= 3 * (d + 1) && length(col("nb")) >= 3 * (d + 1) &&
          levenshtein(col("na"), col("nb")) <= d)
        .select(col("ka"), col("kb"), levenshtein(col("na"), col("nb")).cast("long"))
        .as[(Long, Long, Long)].collect().toSet
      assert(fast == brute, s"d=$d missing=${brute -- fast} extra=${fast -- brute}")
      assert(brute.nonEmpty)
    }
  }

  test("deletion-signature candidates shuffle only longs; strings ride broadcasts") {
    // the candidate join must move (id, xxhash64(variant)) longs — raw
    // variant strings are hashed at the source and the verification
    // strings attach via broadcast for dimension-sized inputs
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.types.StringType
    val cust = Tables.customer(spark, "/root/testdata/sf0.001")
    val df = FuzzyJoin.selfJoin(cust, "c_custkey", "c_name", maxDist = 1)
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: inner.flatMap(flatten)
    }
    val shuffles = flatten(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }.distinct
    assert(shuffles.nonEmpty)
    val stringCarrying = shuffles.filter(_.output.exists(_.dataType == StringType))
    assert(stringCarrying.isEmpty,
      s"strings crossed a shuffle: ${stringCarrying.map(_.output.map(_.name).mkString("(", ",", ")"))}")
  }

  test("strings below the q*(d+1) length floor are excluded by contract") {
    val rows = Seq((1L, "ab"), (2L, "ac"), (3L, "abcdef"), (4L, "abcdeg"))
      .toDF("id", "name")
    val out = FuzzyJoin.selfJoin(rows, "id", "name", maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((3L, 4L, 1L)), "short strings must not appear at all")
  }
}
