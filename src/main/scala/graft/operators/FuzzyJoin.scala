package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) join — the entity-resolution primitive: all pairs
  * of rows whose string column is within Levenshtein distance `maxDist`,
  * computed WITHOUT an all-pairs comparison.
  *
  * Candidate generation is q-gram prefix filtering (Gravano et al.'s
  * count-filter bound + the PPJoin prefix argument, the same machinery as
  * [[Dedup.ngramJaccardPairs]] but over character-gram MULTISETS):
  *  - one edit operation changes at most q of a string's character
  *    q-grams (insertions/deletions shift positions but leave the other
  *    grams' CONTENT intact), so ed(a,b) ≤ d implies the gram multisets
  *    share ≥ max(|a|,|b|) − q + 1 − q·d entries;
  *  - therefore, under a global rarity order, the q·d + 1 RAREST gram
  *    entries of each string must collide for any true pair (pigeonhole,
  *    valid with multiplicity) — only those are indexed, so the self-join
  *    touches tiny posting lists instead of the full inverted index
  *    (a shared common prefix like "Customer#" never generates a single
  *    candidate).
  * Candidates are then verified with the exact codegen'd `levenshtein`.
  *
  * Contract: rows whose string is shorter than q·(d+1) are EXCLUDED (the
  * count bound degenerates — no shared gram is guaranteed at that length;
  * run an exact pass over the short block upstream if needed). Join keys
  * and gram rows are the only shuffled payload besides the (short)
  * strings attached for verification.
  * Output: (id_a, id_b, dist), id_a < id_b, totally ordered.
  */
object FuzzyJoin {

  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    val minLen = q * (maxDist + 1)
    val base = df
      .select(col(idCol).as("_id"), col(strCol).as("_s"))
      .filter(length(col("_s")) >= minLen)
    // gram list WITH duplicates — the count bound is on multisets;
    // deduplicating would break completeness for repetitive strings
    val grams = base
      .select(col("_id"),
        explode(transform(sequence(lit(1), length(col("_s")) - (q - 1)),
          i => col("_s").substr(i, lit(q)))).as("_g"))
    val freq = grams.groupBy(col("_g")).agg(count(lit(1)).as("_f"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_f"), col("_g"))
    val prefix = grams.join(freq, "_g")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= q * maxDist + 1)
      .select(col("_id"), col("_g"))
    val cands = prefix.select(col("_id").as("_ida"), col("_g"))
      .join(prefix.select(col("_id").as("_idb"), col("_g")), "_g")
      .filter(col("_ida") < col("_idb"))
      .select(col("_ida"), col("_idb"))
      .distinct()
    cands
      .join(base.select(col("_id").as("_ida"), col("_s").as("_sa")), "_ida")
      .join(base.select(col("_id").as("_idb"), col("_s").as("_sb")), "_idb")
      .withColumn("dist", levenshtein(col("_sa"), col("_sb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("_ida").as("id_a"), col("_idb").as("id_b"), col("dist"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
