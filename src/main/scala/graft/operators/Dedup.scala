package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document corpora: exact
  * (content-hash), exact n-gram Jaccard (inverted index), MinHash+LSH,
  * SimHash, and embedding-cosine near-dup.
  *
  * All operators are pure `DataFrame => DataFrame` with deterministic
  * output (fixed seeds, explicit tie-breaks), so results are reproducible
  * and oracle-checkable. Scale design notes are on each method; the common
  * principles: join/shuffle keys are 8-byte hashes (never raw text), every
  * aggregation has a map-side partial, and candidate generation is always
  * sub-quadratic (inverted index or LSH banding) — the only intentionally
  * quadratic operator is [[embedCosinePairs]], a SPEC-ONLY baseline whose
  * production paths live in [[Similarity]]: [[Similarity.blockedCosinePairs]]
  * (exact, bounded memory, any tau) and [[Similarity.lshCosinePairs]]
  * (sub-quadratic, near-dup tau).
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup by content hash: keeps the row with the smallest
    * `tieBreak` per distinct value of `keyCol`'s MD5. Hash-groupBy with
    * map-side partial min_by — shuffles one candidate row per distinct
    * key per map task, never the raw text.
    */
  def exactByHash(df: DataFrame, keyCol: String, tieBreak: String): DataFrame = {
    val cols = df.columns.toIndexedSeq
    df.groupBy(md5(col(keyCol)).as("_k"))
      .agg(min_by(struct(cols.map(col): _*), col(tieBreak)).as("_first"))
      .select(cols.map(c => col(s"_first.$c").as(c)): _*)
  }

  // ------------------------------------------- exact n-gram Jaccard pairs

  /** (doc_id, h) with one row per distinct shingle hash per document.
    * Shingles are hashed to 64-bit (xxhash64) immediately so all
    * downstream shuffles carry longs, not strings.
    */
  private[graft] def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("_id"), Text.tokens(col(textCol)).as("_toks"))
      .select(col("_id"), explode(Text.shinglesOfTokens(col("_toks"), n)).as("_sh"))
      .select(col("_id"), xxhash64(col("_sh")).as("_h"))
      // the pair pipelines reference this subtree 3-4 times (sizes, document
      // frequency, prefix, verification sets) and Spark does not reuse the
      // exchanges (each branch projects differently) — caching the 16-byte
      // (id, hash) rows avoids re-tokenizing the corpus per branch. The
      // CacheManager dedupes by canonical plan, so the exact/MinHash/keep
      // queries over the same docs share ONE materialization. NOTE: the
      // cache is pinned for the session's lifetime (CacheManager holds a
      // strong reference); long-lived sessions sweeping many corpora
      // should call spark.catalog.clearCache() between datasets.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Exact-Jaccard verification of candidate pairs against the per-doc
    * distinct shingle-hash sets; shared by the exact and MinHash paths so
    * both emit identical `(doc_a, doc_b, jaccard)` rows for true pairs.
    */
  private def verifyPairs(cands: DataFrame, sh: DataFrame, tau: Double,
      ordered: Boolean = true): DataFrame = {
    val sets = sh.groupBy(col("_id")).agg(collect_set(col("_h")).as("_set"))
    val pairs = cands
      .join(sets.select(col("_id").as("_ida"), col("_set").as("_seta")), "_ida")
      .join(sets.select(col("_id").as("_idb"), col("_set").as("_setb")), "_idb")
      .withColumn("_inter", size(array_intersect(col("_seta"), col("_setb"))))
      .withColumn("jaccard", round(col("_inter") /
        (size(col("_seta")) + size(col("_setb")) - col("_inter")), 4))
      .filter(col("jaccard") >= tau)
      .select(col("_ida").as("doc_a"), col("_idb").as("doc_b"), col("jaccard"))
    // the global sort exists for deterministic oracle output; consumers
    // that only feed a join/left-anti (near-dedup, clustering) skip it —
    // a range-partition + sort stage for nothing otherwise
    if (ordered) pairs.orderBy(col("doc_a"), col("doc_b")) else pairs
  }

  /** All pairs with word-n-gram Jaccard ≥ tau, computed exactly with
    * PPJoin-style prefix filtering: rank each document's shingles by
    * global rarity (document frequency, then hash) and index only the
    * first ⌊(1−τ)·|doc|⌋+1 — any pair with Jaccard ≥ τ must collide on at
    * least one prefix shingle under a shared global order, so the
    * candidate set stays complete while the self-join touches only the
    * RAREST shingles (small posting lists — this is what kills the d²
    * blow-up of boilerplate shingles that a naive inverted-index join
    * suffers at scale). Candidates are then exact-verified.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double, ordered: Boolean = true): DataFrame = {
    val sh = shingleHashes(docs, idCol, textCol, n)
    val sizes = sh.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    val dfreq = sh.groupBy(col("_h")).agg(count(lit(1)).as("_df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_df"), col("_h"))
    val prefix = sh.join(dfreq, "_h")
      .withColumn("_rn", row_number().over(w))
      .join(sizes, "_id")
      .filter(col("_rn") <= floor((lit(1.0) - tau) * col("_n")).cast("long") + 1)
      .select(col("_id"), col("_h"), col("_rn"), col("_n"))
    // The prefix self-join alone degenerates on low-entropy corpora: with
    // a saturated shingle space (tiny vocabulary), posting lists are dense
    // and prefix collisions approach all-pairs. Two further PPJoin filters
    // — both candidate-complete, applied BEFORE the distinct + exact
    // verification — keep the candidate set near the true-pair set:
    //  - length filter: J(a,b) ≥ τ forces min(|a|,|b|) ≥ τ·max(|a|,|b|)
    //    (|a∩b| ≤ min and ≥ τ·union ≥ τ·max);
    //  - positional filter: for a shared prefix shingle at ranks
    //    (_rna,_rnb) under the global rarity order, the overlap is at most
    //    min(|a|−_rna, |b|−_rnb)+1, which must reach the equivalent
    //    overlap threshold α = ⌈τ/(1+τ)·(|a|+|b|)⌉. A true pair's FIRST
    //    shared prefix shingle always passes, so keeping pairs where ANY
    //    collision passes loses nothing.
    // The 1e-9 slack keeps double rounding from pruning exact-boundary
    // pairs (e.g. J exactly τ); exact verification removes any extras.
    val alpha = ceil(lit(tau / (1.0 + tau)) * (col("_na") + col("_nb")) - lit(1e-9))
    val cands = prefix.select(col("_id").as("_ida"), col("_h"),
        col("_rn").as("_rna"), col("_n").as("_na"))
      .join(prefix.select(col("_id").as("_idb"), col("_h"),
        col("_rn").as("_rnb"), col("_n").as("_nb")), "_h")
      .filter(col("_ida") < col("_idb"))
      .filter(col("_na") >= lit(tau) * col("_nb") - lit(1e-9) &&
        col("_nb") >= lit(tau) * col("_na") - lit(1e-9))
      .filter(least(col("_na") - col("_rna"), col("_nb") - col("_rnb")) + 1 >= alpha)
      .select(col("_ida"), col("_idb"))
      .distinct()
    verifyPairs(cands, sh, tau, ordered)
  }

  // ------------------------------------------------------- MinHash + LSH

  private[graft] val NumPerm = 128
  private[graft] val Bands = 32 // rows per band = 128/32 = 4
  private[graft] val MinHashSeed = 42L

  /** Near-dup pairs via MinHash banding (128 perms, 32 bands × 4 rows)
    * with exact-Jaccard verification of the candidates.
    *
    * Candidate generation shuffles (doc, band) rows — 32 small rows per
    * document regardless of corpus size; docs agreeing on any band land in
    * the same bucket. Verification joins candidate pairs against per-doc
    * distinct-shingle-hash sets and computes exact Jaccard with array
    * intersection, so the final output equals the exact operator's output
    * whenever banding recall is 1. Honest math: a pair at exactly j has
    * per-band collision probability j^4, so P[miss] = (1-j^4)^32 — ~1.5e-4
    * at j = 0.7 (the threshold itself) but < 1e-13 at j ≥ 0.89, where all
    * of this corpus's true pairs sit (verified against the exact oracle at
    * three scale factors). Corpora with mass just above tau should use
    * more, narrower bands (e.g. 64×2) at the cost of more candidates.
    * Output: (doc_a, doc_b, jaccard).
    */
  /** (_id, _band, _bh): 32 constant-size band rows per document from the
    * single-buffer 128-perm MinHash signature (one array column instead
    * of 128 wide agg columns — see [[graft.functions.MinHashAgg]]).
    */
  private[graft] def bandRows(sh: DataFrame): DataFrame = {
    val sigs = sh.groupBy(col("_id"))
      .agg(graft.functions.MinHashAgg.minhash(col("_h"), NumPerm, MinHashSeed).as("_sig"))
    val rowsPerBand = NumPerm / Bands
    val bandCols = (0 until Bands).map { j =>
      xxhash64(concat_ws(",",
        (0 until rowsPerBand).map(r => element_at(col("_sig"), j * rowsPerBand + r + 1)): _*))
    }
    sigs.select(col("_id"), posexplode(array(bandCols: _*)).as(Seq("_band", "_bh")))
  }

  /** Per-ROW (aggregation-free) twin of [[shingleHashes]] +
    * [[bandRows]]: appends `_set` (the doc's distinct shingle-hash
    * array — exactly the [[verifyPairs]] `collect_set` membership) and
    * `_bands` (the 32 LSH band hashes, `element_at(_bands, band+1)` ==
    * [[bandRows]]' `_bh` at `_band = band`) as array columns computed
    * entirely inside one projection — usable on a STREAMING frame,
    * where the groupBy signature aggregation is unavailable without a
    * second stateful stage. Twin fidelity is by construction, not
    * reimplementation: the same `Text.shingles`/`xxhash64` expressions,
    * the same [[graft.functions.MinHashAgg]] coefficient sequence
    * (shared derivation, `MinHashAgg.coefficients`), the same
    * `concat_ws` band hash — and spec-pinned equal to the agg path on
    * real corpus text (`StreamingAdmissionSpec`).
    *
    * Both columns are produced by fused native expressions
    * ([[graft.functions.ShingleHashSet]],
    * [[graft.functions.MinHashBandHashes]]) that reference their input
    * exactly once and run the k·|set| loops in plain JVM code — the
    * first version used `transform`/`array_min` higher-order functions
    * and paid 3.9 ms/doc at interpreter speed (k=128 lambda dispatches
    * per shingle), which dominated streaming-admission throughput; the
    * fused form is the same math at memory-bandwidth speed. The 100 TB
    * corpus side should still use the aggregate path (map-side
    * combine); this is the increment/stream-sized row form.
    */
  private[graft] def withRowBandCols(df: DataFrame, textCol: String,
      n: Int): DataFrame =
    df.withColumn("_set", graft.functions.ShingleHashSet.shingleHashSet(
        Text.tokens(col(textCol)), n))
      .withColumn("_bands", graft.functions.MinHashBandHashes.minhashBandHashes(
        col("_set"), NumPerm, Bands, MinHashSeed))

  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double, ordered: Boolean = true): DataFrame = {
    val sh = shingleHashes(docs, idCol, textCol, n)
    val banded = bandRows(sh)
    val cands = banded.alias("x")
      .join(banded.alias("y"), Seq("_band", "_bh"))
      .filter(col("x._id") < col("y._id"))
      .select(col("x._id").as("_ida"), col("y._id").as("_idb"))
      .distinct()
    verifyPairs(cands, sh, tau, ordered)
  }

  /** Incremental near-dedup: gate a NEW BATCH of documents against an
    * EXISTING corpus — the production shape: pipelines never re-dedup
    * the whole corpus, they filter each incoming increment against what
    * is already kept. A batch doc is dropped iff
    *  (a) its exact content MD5 already exists in the corpus, or
    *  (b) it has word-n-gram Jaccard ≥ tau with ANY corpus doc
    *      (MinHash-banding candidates, exact verification — the same
    *      recall argument as [[minhashLshPairs]]).
    * Batch-INTERNAL duplicates are deliberately kept (run a within-batch
    * [[nearDedupKeepFirst]] pass for those); ids must be disjoint from
    * the corpus's. Output: the surviving batch rows, all columns.
    *
    * Scale shape (corpus = the 100 TB side, batch = an increment, orders
    * of magnitude smaller): the corpus only ever streams hashes — its
    * digest column for (a), 32 (id, band-hash) rows/doc into a join
    * whose OTHER side (the batch's bands) is BROADCAST, and (id,
    * shingle-hash) rows for verification, SEMI-JOINED down to candidate
    * ids before the collect_set aggregation, so set-building touches
    * only docs that banded with the batch, not the whole corpus.
    */
  def nearDedupIncremental(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, n: Int, tau: Double): DataFrame = {
    val (exactLosers, nearLosers) =
      incrementalLosers(corpus, batch, idCol, textCol, n, tau)
    // losers is an ids-only list bounded by the increment's duplicate
    // count — broadcast it so the final anti join never shuffles the
    // batch rows (text included). For pathological increments whose
    // duplicate id list alone exceeds broadcast size, drop the hint and
    // accept one batch-side shuffle.
    batch.join(broadcast(exactLosers.union(nearLosers).distinct()),
      Seq(idCol), "left_anti")
  }

  /** The two loser id relations behind [[nearDedupIncremental]]'s anti
    * join — (exact-twin ids, near-twin ids), both subsets of the batch's
    * id space, shared with [[incrementalFlags]] so the drop decision and
    * the reason attribution cannot drift apart.
    */
  private def incrementalLosers(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, n: Int,
      tau: Double): (DataFrame, DataFrame) = {
    val exactLosers = batch.select(col(idCol), md5(col(textCol)).as("_d"))
      .join(corpus.select(md5(col(textCol)).as("_d")), Seq("_d"), "left_semi")
      .select(col(idCol))
    val shC = shingleHashes(corpus, idCol, textCol, n)
    val shB = shingleHashes(batch, idCol, textCol, n)
    val cands = bandRows(shC).alias("c")
      .join(broadcast(bandRows(shB).alias("b")), Seq("_band", "_bh"))
      .select(col("c._id").as("_ida"), col("b._id").as("_idb"))
      .distinct()
    val setsC = shC
      .join(cands.select(col("_ida").as("_id")).distinct(), Seq("_id"), "left_semi")
      .groupBy(col("_id")).agg(collect_set(col("_h")).as("_set"))
    val setsB = shB.groupBy(col("_id")).agg(collect_set(col("_h")).as("_set"))
    val nearLosers = cands
      .join(setsC.select(col("_id").as("_ida"), col("_set").as("_seta")), "_ida")
      .join(setsB.select(col("_id").as("_idb"), col("_set").as("_setb")), "_idb")
      .withColumn("_inter", size(array_intersect(col("_seta"), col("_setb"))))
      // round(,4) to match verifyPairs / the SQL oracle exactly
      .filter(round(col("_inter") /
        (size(col("_seta")) + size(col("_setb")) - col("_inter")), 4) >= tau)
      .select(col("_idb").as(idCol))
    (exactLosers, nearLosers)
  }

  /** Per-row ADMISSION REASON flags vs an existing corpus: one row per
    * batch doc with `(exact_dup, near_dup)` — drop criteria (a) and (b)
    * of [[nearDedupIncremental]] attributed separately, from the SAME
    * loser relations the drop path anti-joins (a doc is admitted iff
    * both flags are false, by construction). This is the batch twin of
    * the streaming admission verdict columns
    * ([[graft.streaming.StreamingAdmission]] emits the same two flags
    * per gated doc, spec-pinned equal per doc). Ids-only broadcasts,
    * same scale argument as the anti join.
    * Output: (idCol, exact_dup, near_dup).
    */
  def incrementalFlags(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, n: Int, tau: Double): DataFrame = {
    val (exactLosers, nearLosers) =
      incrementalLosers(corpus, batch, idCol, textCol, n, tau)
    batch.select(col(idCol))
      .join(broadcast(exactLosers.distinct().withColumn("_ex", lit(true))),
        Seq(idCol), "left")
      .join(broadcast(nearLosers.distinct().withColumn("_nr", lit(true))),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_ex"), lit(false)).as("exact_dup"),
        coalesce(col("_nr"), lit(false)).as("near_dup"))
  }

  // ------------------------------------------------------------- SimHash

  /** 64-bit SimHash over distinct tokens: bit i of the fingerprint is the
    * sign of Σ_tokens (±1 depending on bit i of xxhash64(token)).
    * One single-buffer aggregate ([[graft.functions.SimHashAgg]]: a
    * long[64] vote array with map-side partials) instead of 64 wide
    * conditional-sum columns. Output: (id, simhash).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // token hash = first 64 bits of md5 (two 32-bit halves combined) —
    // chosen over xxhash64 deliberately: md5 is computable in ANSI-ish
    // SQL, so the whole fingerprint (votes, sign bits, banding) is
    // recomputable by the DuckDB oracle and dedup_simhash is hash-green
    // instead of a pinned rows-only check. Bit i of the combined long is
    // bit i of lo for i < 32, bit i-32 of hi otherwise — the oracle
    // extracts bits from the halves and never needs the (sign-wrapping)
    // 64-bit combine.
    val md = md5(col("_t"))
    val hi = conv(substring(md, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(md, 9, 8), 16, 10).cast("long")
    docs.select(col(idCol).as("_id"),
        explode(array_distinct(Text.tokens(col(textCol)))).as("_t"))
      .select(col("_id"), shiftleft(hi, 32).bitwiseOR(lo).as("_h"))
      .groupBy(col("_id"))
      .agg(graft.functions.SimHashAgg.simhash(col("_h")).as("simhash"))
  }

  /** Pairs with SimHash Hamming distance ≤ maxDist (≤ 3 with the default
    * 4 bands): band the 64-bit fingerprint into 4 × 16-bit chunks and
    * bucket-join — by pigeonhole, any pair within distance 3 agrees on at
    * least one full chunk, so recall is exactly 1 (this is exact, not
    * approximate). Verification is `bit_count(a XOR b)`.
    * Output: (doc_a, doc_b, hamming).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame =
    hammingPairs(simhash(docs, idCol, textCol), "_id", "simhash", maxDist)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))

  /** Pairs within Hamming distance ≤ `maxDist` over an EXISTING 64-bit
    * fingerprint column — the [[simhashPairs]] banding machinery
    * (4 × 16-bit chunks, bucket join, `bit_count` verify) factored out
    * so ANY 64-bit per-item fingerprint can use it: text SimHash,
    * perceptual image aHash (`mm_image_neardup`), audio fingerprints.
    * By pigeonhole a pair within distance 3 agrees on at least one full
    * chunk, so recall is exactly 1 — this is exact, not approximate.
    * Scale shape: only (id, 16-bit chunk, fingerprint) rows shuffle;
    * payloads were reduced to fingerprints before the wide stage.
    * Output: (id_a, id_b, hamming), id_a < id_b, ordered.
    */
  def hammingPairs(fps: DataFrame, idCol: String, fpCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4x16-bit banding guarantees recall only for distance <= 3")
    val chunks = (0 until 4).map { j =>
      shiftrightunsigned(col(fpCol), 16 * j).bitwiseAND(0xFFFFL)
    }
    val banded = fps.select(col(idCol).as("_hpid"), col(fpCol).as("_hpfp"),
      posexplode(array(chunks: _*)).as(Seq("_band", "_chunk")))
    banded.alias("x").join(banded.alias("y"), Seq("_band", "_chunk"))
      .filter(col("x._hpid") < col("y._hpid"))
      .select(col("x._hpid").as("id_a"), col("y._hpid").as("id_b"),
        bit_count(col("x._hpfp").bitwiseXOR(col("y._hpfp"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Asymmetric CONTAINMENT pairs: (inner, outer) with
    * |shingles(inner) ∩ shingles(outer)| / |shingles(inner)| ≥ tau —
    * the dedup relation symmetric Jaccard misses: a short document
    * wholly quoted inside a long one scores near-zero Jaccard (the union
    * is dominated by the long side) but containment 1.0. Corpus curation
    * runs this to strip quote-wrapped / boilerplate-embedded duplicates.
    *
    * Candidates use one-sided prefix filtering (the PPJoin argument
    * applied to the INNER side only): if containment ≥ tau, then among
    * the inner doc's ⌊(1−τ)·|inner|⌋+1 rarest shingles (global
    * document-frequency order) at least one must appear in the outer doc
    * — so the join is inner-PREFIX × outer-FULL-index, never full × full.
    * Exact verification against the per-doc shingle sets follows. All
    * shuffle keys are 64-bit hashes.
    * Output: (doc_inner, doc_outer, containment), inner ≠ outer.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double): DataFrame = {
    val sh = shingleHashes(docs, idCol, textCol, n)
    val sizes = sh.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    val dfreq = sh.groupBy(col("_h")).agg(count(lit(1)).as("_df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_df"), col("_h"))
    val ranked = sh.join(dfreq, "_h")
      .withColumn("_rn", row_number().over(w))
      .join(sizes, "_id")
    val prefix = ranked
      .filter(col("_rn") <= floor((lit(1.0) - tau) * col("_n")).cast("long") + 1)
    // Same round-8 pruning idea as [[ngramJaccardPairs]], restated for
    // the asymmetric relation. Containment ≥ τ needs overlap
    // α = ⌈τ·|inner|⌉, so before the candidate distinct:
    //  - outer-size filter: |outer| ≥ α (it must hold α of inner's
    //    shingles);
    //  - positional filter: at a shared shingle ranked (_rna, _rnb)
    //    under the global rarity order, overlap ≤ min(|inner|−_rna,
    //    |outer|−_rnb)+1, which must reach α. The FIRST shared shingle
    //    of a true pair passes, and pairs survive on ANY passing
    //    collision, so completeness is preserved. The outer side reuses
    //    the already-ranked table (the window ran for the prefix anyway),
    //    so the only new cost is arithmetic in the join — on saturated
    //    shingle spaces the candidate cut is the whole game.
    val alpha = ceil(lit(tau) * col("_na") - lit(1e-9))
    val cands = prefix.select(col("_id").as("_ida"), col("_h"),
        col("_rn").as("_rna"), col("_n").as("_na"))
      .join(ranked.select(col("_id").as("_idb"), col("_h"),
        col("_rn").as("_rnb"), col("_n").as("_nb")), "_h")
      .filter(col("_ida") =!= col("_idb"))
      .filter(col("_nb") >= alpha)
      .filter(least(col("_na") - col("_rna"), col("_nb") - col("_rnb")) + 1 >= alpha)
      .select(col("_ida"), col("_idb"))
      .distinct()
    val sets = sh.groupBy(col("_id")).agg(collect_set(col("_h")).as("_set"))
    cands
      .join(sets.select(col("_id").as("_ida"), col("_set").as("_seta")), "_ida")
      .join(sets.select(col("_id").as("_idb"), col("_set").as("_setb")), "_idb")
      .withColumn("containment", round(
        size(array_intersect(col("_seta"), col("_setb"))) * lit(1.0) /
          size(col("_seta")), 4))
      .filter(col("containment") >= tau)
      .select(col("_ida").as("doc_inner"), col("_idb").as("doc_outer"),
        col("containment"))
      .orderBy(col("doc_inner"), col("doc_outer"))
  }

  /** End-to-end near-dedup: returns the SURVIVING documents — a doc is
    * dropped iff it has a near-duplicate (word-n-gram Jaccard ≥ tau) with
    * a smaller id. This is the standard greedy keep-first policy (not
    * transitive clustering: of a chain a~b~c with a≁c, only b is dropped
    * — b matches a; c survives because its only smaller near-dup, b, is
    * itself judged against c directly). Deterministic and
    * oracle-expressible. Candidates come from the MinHash+LSH path, so
    * the whole operation is sub-quadratic.
    */
  def nearDedupKeepFirst(docs: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double): DataFrame = {
    val losers = minhashLshPairs(docs, idCol, textCol, n, tau, ordered = false)
      .select(col("doc_b").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------- cluster assignment

  /** Release the pinned RDD behind a `localCheckpoint(eager = true)`
    * DataFrame once its successor round is materialized. Without this,
    * every propagation/contraction round leaks one checkpointed RDD into
    * the block store for the session's lifetime; across repeated calls
    * (benchmark reps, long-lived services) the accumulated blocks force
    * eviction storms that showed up as 5-10× run-to-run swings on the
    * iterative cluster queries. Safe because eager checkpointing fully
    * materialized the successor — nothing re-reads the released blocks.
    */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Connected-component cluster ids over a near-duplicate pair graph:
    * every document gets `cluster_id` = the MINIMUM doc id reachable
    * through the pair edges (its component's canonical representative) —
    * the production dedup primitive: pairwise near-dup relations are not
    * transitive, so real pipelines cluster first and then keep one
    * representative per component, rather than greedily dropping pair
    * losers ([[nearDedupKeepFirst]]'s simpler policy).
    *
    * Algorithm: iterative min-label propagation. Each round joins the
    * current labels to the bidirectional edge list, takes
    * `min(own, neighbors)` per node, and stops at the exact fixpoint
    * (labels decrease monotonically, so an unchanged label sum — an
    * O(#nodes) aggregate, no row-level diff — proves convergence).
    * Rounds = component diameter; near-dup components are shallow in
    * practice, `maxIters` bounds adversarial chains. Every shuffle
    * carries (long, long) rows only; edges are cached across rounds;
    * label lineage is truncated per round so plans stay flat.
    *
    * Output: (idCol, cluster_id), one row per input document (isolated
    * documents are their own cluster).
    */
  def clusterIds(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b",
      maxIters: Int = 20): DataFrame =
    clusterIdsCounted(docs, idCol, pairs, aCol, bCol, maxIters)._1

  /** [[clusterIds]] plus the number of label-propagation rounds executed
    * (spec instrumentation for the rounds-vs-diameter claim).
    */
  private[graft] def clusterIdsCounted(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
      maxIters: Int = 20): (DataFrame, Int) = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist()
    var labels = docs.select(col(idCol).cast("long").as("id"),
      col(idCol).cast("long").as("label")).localCheckpoint(true)
    var converged = false
    var iter = 0
    var checksum = labels.agg(sum(col("label"))).head().getLong(0)
    while (!converged && iter < maxIters) {
      iter += 1
      val neighborMin = edges.join(labels, col("src") === col("id"))
        .groupBy(col("dst")).agg(min(col("label")).as("_nl"))
      val next = labels.join(neighborMin, col("id") === col("dst"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("_nl"), col("label"))).as("label"))
        .localCheckpoint(true)
      val nextSum = next.agg(sum(col("label"))).head().getLong(0)
      converged = nextSum == checksum
      checksum = nextSum
      releaseCheckpoint(labels) // next is materialized; free the old round
      labels = next
    }
    edges.unpersist()
    (labels.select(col("id").as(idCol), col("label").as("cluster_id")), iter)
  }

  /** Connected components by alternating large-star/small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — same output contract as [[clusterIds]] (cluster_id = the
    * component's minimum member id, isolated documents their own cluster)
    * but convergence in O(log n) rounds instead of O(diameter):
    *
    *  - large-star: every node's strictly-LARGER neighbors re-point to the
    *    minimum of its closed neighborhood — long chains fold toward local
    *    minima without ever breaking connectivity;
    *  - small-star: edges are oriented large→small and each node's
    *    smaller-or-equal neighbors (plus itself) re-point to that minimum —
    *    flattening the partial trees into stars.
    *
    * At the fixpoint every component is a star rooted at its minimum id
    * and the edge set is exactly (member → root). Each half-round is one
    * groupBy + one join over (long, long) edges, with `distinct` keeping
    * the edge multiset from growing; lineage truncated per round.
    * Convergence detection: the edge set's (count, hash-sum) signature is
    * invariant exactly at the fixpoint (edges only re-point downward, so
    * an unchanged signature proves an unchanged set).
    *
    * [[clusterIds]] (min-label propagation, rounds = diameter) remains as
    * the oracle twin: on the shallow components real near-dup graphs
    * produce, its single shuffle per round is cheaper; prefer this variant
    * when components may be deep (adversarial chains, transitive-text
    * corpora). `DedupSpec` pins the two equal on a planted 50-deep chain.
    */
  def clusterIdsStar(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b",
      maxIters: Int = 25): DataFrame =
    clusterIdsStarCounted(docs, idCol, pairs, aCol, bCol, maxIters)._1

  private[graft] def clusterIdsStarCounted(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
      maxIters: Int = 25): (DataFrame, Int) = {
    // self-loop-free undirected edge set over the paired nodes
    var edges = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)

    // m(u) = min(N(u) ∪ {u}) over the given (u = src, v = dst) adjacency
    def closedMin(nbr: DataFrame): DataFrame =
      nbr.groupBy(col("src")).agg(least(min(col("dst")), col("src")).as("_m"))

    def signature(e: DataFrame): (Long, Long) = {
      // (count, xor-of-hashes): order-independent, overflow-free set
      // signature — e is distinct, so equal signatures ⇔ equal sets up to
      // hash collision
      val r = e.agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    var sig = signature(edges)
    var iter = 0
    var converged = edges.isEmpty
    while (!converged && iter < maxIters) {
      iter += 1
      // large-star: (v, m(u)) for every neighbor v > u
      val nbr = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      val large = nbr.join(closedMin(nbr), "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("_m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      // small-star on large→small orientation: every smaller-or-equal
      // neighbor (and u itself) points to m(u)
      val oriented = large
        .select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
      val m = closedMin(oriented)
      val small = oriented.join(m, "src")
        .select(col("dst").as("src"), col("_m").as("dst"))
        .union(m.select(col("src"), col("_m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint(true)
      val nextSig = signature(small)
      converged = nextSig == sig
      sig = nextSig
      releaseCheckpoint(edges) // small is materialized; free the old round
      edges = small
    }
    // fixpoint edges are (member → component-min root); roots and isolated
    // docs label themselves. The min-aggregate is a no-op at the fixpoint
    // (one dst per src) but REQUIRED if the loop exited via maxIters: a
    // pre-fixpoint edge set can still hold several (src → dst) edges per
    // node, and a bare left join would then emit duplicate rows per
    // document with non-minimal roots.
    if (!converged && iter >= maxIters)
      Console.err.println(
        s"[graft] clusterIdsStar: maxIters=$maxIters exhausted before the " +
        "signature fixpoint; labels below are min-aggregated per doc and " +
        "correct per edge set, but roots may not yet be component minima " +
        "- raise maxIters for adversarially deep graphs")
    val roots = edges.groupBy(col("src").as("id")).agg(min(col("dst")).as("_root"))
    val labels = docs.select(col(idCol).cast("long").as("id"))
      .join(roots, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("_root"), col("id")).as("cluster_id"))
    (labels, iter)
  }

  // ------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-duplicate pairs, exact all-pairs variant.
    * SPEC-ONLY BASELINE — intentionally quadratic via an unconditional
    * crossJoin, so it is NOT registered as a driver query (no registered
    * query may contain an unconditional cartesian); it exists to pin the
    * scale paths bit-equal in `SimilaritySpec`:
    * [[Similarity.blockedCosinePairs]] (exact, bounded memory — the
    * registered tau = 0.4 path) and [[Similarity.lshCosinePairs]]
    * (sub-quadratic near-dup path). The threshold compares ROUNDED cosine
    * so engine-level float summation differences cannot flip membership.
    * Output: (id_a, id_b, cosine).
    */
  def embedCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      tau: Double): DataFrame = {
    import graft.functions.VectorOps
    // norms are computed once per row BEFORE the quadratic join
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("_va"),
      VectorOps.norm(col(vecCol)).as("_na"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("_vb"),
      VectorOps.norm(col(vecCol)).as("_nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(VectorOps.dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")), 6))
      .filter(col("cosine") >= tau)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Contrastive POSITIVE pairs from a (id, cluster) membership relation
    * ([[clusterIds]]/[[clusterIdsStar]] output): documents in one
    * near-dup component are semantically-equivalent rewrites, i.e. free
    * (anchor, positive) supervision for embedding-model training. The
    * pairing is an open CHAIN in id order — member_i with member_{i+1},
    * no wrap-around (last, first) pair — so a
    * component of size k yields exactly k−1 pairs (singletons none),
    * and transitivity still connects every member through the chain.
    * LINEAR where the naive within-cluster self-join is quadratic: a
    * 1M-member boilerplate cluster at 100 TB yields 10^6−1 pairs, not
    * 5·10^11. One lead() window partitioned by cluster over the
    * (long, long) relation — parallel per-cluster sorts, no text moves.
    * Output: (cluster_id, anchor, positive).
    */
  def positivePairs(clusters: DataFrame, idCol: String,
      clusterCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(clusterCol)).orderBy(col(idCol))
    clusters.withColumn("positive", lead(col(idCol), 1).over(w))
      .filter(col("positive").isNotNull)
      .select(col(clusterCol).as("cluster_id"), col(idCol).as("anchor"),
        col("positive"))
  }
}
