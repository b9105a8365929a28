package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) join — the entity-resolution primitive: all pairs
  * of rows whose string column is within Levenshtein distance `maxDist`,
  * computed WITHOUT an all-pairs comparison, then verified with the exact
  * codegen'd `levenshtein`.
  *
  * Candidate generation dispatches on `maxDist`:
  *
  *  - **d ≤ 2 — deletion-neighborhood signatures** (the FastSS / SymSpell
  *    scheme): each string emits every variant reachable by ≤ d character
  *    deletions (itself included); if ed(a,b) ≤ d, deleting from `a` the
  *    characters an optimal alignment substitutes-or-deletes and from `b`
  *    the ones it substitutes-or-inserts leaves the SAME string with ≤ d
  *    deletions on each side — so true pairs always collide on a
  *    signature, and candidates are the signature-join pairs. Variants
  *    per string: |s|+1 at d=1, O(|s|²) at d=2 — bounded, embarrassingly
  *    parallel, and the postings are radically tighter than q-gram
  *    postings on low-entropy keys: for TPC-H's zero-padded
  *    "Customer#000012345" names, q-gram prefix filtering passed 10M
  *    candidate pairs at sf0.1 (digit trigrams are shared by ~1100 names
  *    each) where deletion signatures collide only on true
  *    one-digit-apart neighborhoods — measured 71 s → ~4 s.
  *
  *  - **d ≥ 3 — q-gram prefix filtering** (Gravano et al.'s count-filter
  *    bound + the PPJoin prefix argument, the same machinery as
  *    [[Dedup.ngramJaccardPairs]] but over character-gram MULTISETS): one
  *    edit changes ≤ q of a string's q-grams, so ed ≤ d pairs share a
  *    gram among the q·d + 1 RAREST (under a global rarity order) — only
  *    those are indexed. Deletion neighborhoods grow as |s|^d and stop
  *    paying for themselves here.
  *
  * Contract (both paths): rows whose string is shorter than q·(d+1) are
  * EXCLUDED (below that length the q-gram count bound degenerates and a
  * d-edit can rewrite most of the string — run an exact pass over the
  * short block upstream if needed). Shuffled payload is 64-bit signature
  * hashes / gram rows plus the (short) strings attached for verification.
  * Output: (id_a, id_b, dist), id_a < id_b, totally ordered.
  */
object FuzzyJoin {

  /** All variants of `s` reachable by exactly one character deletion. */
  private def del1(s: Column): Column =
    transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))

  /** Distinct deletion-neighborhood signatures of `_s` for d ∈ {1, 2}. */
  private def delSignatures(maxDist: Int): Column = {
    val s = col("_s")
    val d1 = array_union(array(s), del1(s))
    if (maxDist == 1) d1
    else array_union(d1,
      array_distinct(flatten(transform(del1(s), v => del1(v)))))
  }

  /** (_ida, _idb) candidate pairs via deletion-signature collisions. */
  private def deletionCandidates(base: DataFrame, maxDist: Int): DataFrame = {
    // one projection+explode over base, persisted because the self-join
    // reads it from both sides; signatures hash to 64 bits at the source
    // so the join shuffles (id, hash) longs, never variant strings
    val sigs = base
      .select(col("_id"), explode(delSignatures(maxDist)).as("_v"))
      .select(col("_id"), xxhash64(col("_v")).as("_h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.select(col("_id").as("_ida"), col("_h"))
      .join(sigs.select(col("_id").as("_idb"), col("_h")), "_h")
      .filter(col("_ida") < col("_idb"))
      .select(col("_ida"), col("_idb"))
      .distinct()
  }

  /** (_ida, _idb) candidate pairs via q-gram rare-prefix collisions. */
  private def qgramCandidates(base: DataFrame, maxDist: Int, q: Int): DataFrame = {
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prefix.select(col("_id").as("_ida"), col("_g"))
      .join(prefix.select(col("_id").as("_idb"), col("_g")), "_g")
      .filter(col("_ida") < col("_idb"))
      .select(col("_ida"), col("_idb"))
      .distinct()
  }

  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    val minLen = q * (maxDist + 1)
    val base = df
      .select(col(idCol).as("_id"), col(strCol).as("_s"))
      .filter(length(col("_s")) >= minLen)
    val cands =
      if (maxDist <= 2) deletionCandidates(base, maxDist)
      else qgramCandidates(base, maxDist, q)
    cands
      .join(base.select(col("_id").as("_ida"), col("_s").as("_sa")), "_ida")
      .join(base.select(col("_id").as("_idb"), col("_s").as("_sb")), "_idb")
      .withColumn("dist", levenshtein(col("_sa"), col("_sb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("_ida").as("id_a"), col("_idb").as("id_b"), col("dist"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
