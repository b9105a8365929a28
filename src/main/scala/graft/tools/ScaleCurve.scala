package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-vs-n evidence for the dedup/ANN stack's linearity claims
  * (SCALE.md): runs the sub-quadratic candidate-generation queries at
  * n/2, n, and 2n documents derived from one base scale factor, and
  * prints per-query times plus the observed growth exponent
  * log(t_2n / t_n/2) / log 4.
  *
  * Corpus construction keeps the near-dup STRUCTURE linear in n so the
  * exponent measures algorithmic cost, not output blow-up:
  *  - n/2: deterministic subsample (`doc_id % 2 = 0`) — same length and
  *    similarity distribution;
  *  - 2n: originals ∪ copies with every token suffixed (`t → tq`) under
  *    offset ids — the copy's token set and 3-gram shingle set are
  *    disjoint from every original's (same lengths, bijective shingle
  *    map), so no cross-copy candidates appear anywhere — including
  *    SimHash, whose distinct-token fingerprint is order-invariant and
  *    would be IDENTICAL for a merely reversed copy — and true pairs
  *    grow exactly 2× (embeddings: negated copies — cosine relations
  *    preserved within the copy, anti-correlated across).
  *
  * Not part of the driver contract. Run:
  * `runMain graft.tools.ScaleCurve [baseSfDir] [reps]`.
  */
object ScaleCurve {

  private val AllQueries = Seq("dedup_minhash", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_near_keep", "dedup_clusters", "ann_topk_lsh",
    "text_decontaminate", "text_repetition", "chunk_documents",
    "mm_video_decode", "q_skew_join", "q_table_profile",
    "dedup_incremental", "graph_pagerank", "text_dup_spans",
    "text_ngram_lm", "dedup_containment", "q_resample_ffill",
    "mm_image_resize", "mm_frame_sample", "text_knn_jaccard",
    "graph_triangles", "text_lm_score", "chunk_cdc", "ann_topk_pca",
    "ann_topk_pq", "ann_topk_ivfpq",
    // round-7 additions: the seven >1 s queries without measured curves
    "mm_audio_decode", "q_fuzzy_join", "q_mad", "q_group_percentile",
    "q_percentile", "text_pii_redact", "text_stats",
    // round-8 additions: the BPE family (corpus shuffle once, then
    // vocabulary-scale rounds — exponent expected well under 1), and
    // k-means (iters+1 linear scans, k·d driver state)
    "text_bpe_train", "text_bpe_vocab", "text_bpe_encode", "emb_kmeans",
    // round-8 closing sweep: the remaining >1 s queries without curves
    "dedup_clusters_star", "mm_image_decode", "pipeline_curate",
    "text_langid",
    // round-9: the streaming near-dedup's batch twin (simhashPairs
    // banding + anti join — the suffixed-copy construction keeps its
    // fingerprints disjoint from the originals', see the SimHash note
    // above)
    "dedup_simhash_keep",
    // round-9 additions: label-propagation communities (the doubled
    // corpus is a second disjoint graph component — see the lineitem
    // key-offset note below) and the trained quality classifier (10
    // bounded GD passes over the persisted feature projection)
    "graph_communities", "text_quality_model",
    // the error-band audit (multi-table: lineitem percentile/distinct
    // legs + events sketch legs + documents CMS leg — all three families
    // scale by the same ×1/2 / ×2, so the exponent is well-defined)
    "sketch_error_report",
    // leakage-safe split: the dedup_clusters relation + a hash bucket —
    // the mangled 2n copy doubles clusters without cross-copy pairs
    "sample_split_leaksafe",
    // the learned flagship (classifier + dedup + clusters + split)
    "pipeline_curate_learned",
    // round-10: the ANN recall audit (post-restructure it runs each leg
    // pipeline once over a shared severed brute table — cost ≈ sum of
    // the legs, each individually curve-carried above; the doubled
    // corpus uses negated embedding copies, cosine structure preserved)
    "ann_recall_report",
    // round-10 additions: hard-negative mining (brute-shaped BNLJ over
    // the bounded query set + a row-local cut), dataset cartography
    // (training + one 10-sigmoid scan), and DSIR selection (two LM
    // builds + one broadcast-join scoring pass; suffixed copies keep
    // trigram sets disjoint so both LMs stay size-k and hit structure
    // scales linearly)
    "mine_hard_negatives", "text_training_map", "sample_dsir",
    // round-10 closing pair: embedding decontamination (corpus ×
    // broadcast constant-sized eval stand-in — the negated 2n copies
    // keep |eval| growing with n here, so the curve is an upper bound
    // on the constant-eval production shape) and cluster-balanced
    // sampling (the emb_kmeans scans + one id-relation window)
    "emb_decontaminate", "sample_cluster_balanced",
    // token-balanced sharding: tokenizer scan + two bucketed windows
    "pack_shards",
    // round-11 additions: temperature resampling and the UniMax
    // waterfill (one corpus pass each, everything else group-scale),
    // contrastive positive mining (clusterIdsStar + one membership
    // window; suffixed copies double clusters without cross-copy
    // pairs), and the BPE fertility audit (training loop + one
    // broadcast-joined corpus scan)
    "sample_temperature", "sample_unimax", "mine_positive_pairs",
    "text_bpe_fertility",
    // length-grouped batching: the pack_shards two-level rank + one
    // batch-keyed rollup
    "pack_length_batches",
    // two-stage PQ refine: the PQ leg's cost + a corpus-size-independent
    // exact pass over queries×kCand candidate rows
    "ann_topk_pq_refined",
    // UniMax realization: the allocation's corpus pass + one
    // broadcast-joined second scan
    "sample_unimax_apply",
    // curation -> rebalancing composition: the learned pipeline's cost
    // (curve 0.21) + temperature's group-scale tail
    "pipeline_curate_rebalanced",
    // round-12 additions. NOTE on the session caches (curatedSplitOnce /
    // bpeOnce / qualityTrajectoryOnce, keyed per sfDir): the cache for
    // each derived size builds during rep 1 and the curves use reps >= 2,
    // so from round 12 on, the pipeline_curate_* and text_bpe_vocab/
    // encode/fertility rows measure the MARGINAL serving stage — the
    // steady-state per-invocation cost; the full prefix cost keeps its
    // own rows via pipeline_curate (v1), text_quality_model, and
    // text_bpe_train, which stay uncached by design.
    "emb_kcenter",              // k-1 sequential argmax scans: expect ~1
    "text_quality_sweep",       // trained scores x9 thresholds, 9-group agg
    "mine_triplets",            // brute-shaped candidate list + two bounded re-ranks
    "pipeline_curate_unimax",   // cached prefix + group-scale waterfill
    "pipeline_curate_packed",   // cached prefix + two-level bucketed rank
    "pipeline_curate_shuffled", // cached prefix + 16 hash-partitioned sorts
    "sample_doremi",            // one corpus pass + group-scale driver loop
    "emb_centroid_dist",        // centroid broadcast + one corpus scan
    "text_quality_calibration", // trained scores into a 10-bin agg
    "pipeline_train_manifest",  // cached prefix + waterfill + LPT rank (marginal)
    "sample_split_audit",       // banded pairs + star CC + two split-rule joins
    "text_langid_confusion",    // one langid scan into a |langs|^2 agg
    // round-13 additions. The composed flagships (ingest twin, eval
    // decontamination, clean manifest) each re-run their honest full
    // chain or serve from the r12-documented marginal caches. The
    // mangled ×2 copy's id offset (1,000,000 ≡ 0 mod 10) preserves the
    // %10 increment convention exactly; the %97 benchmark class rotates
    // under the offset (10^6 ≡ 27 mod 97) but its FRACTION is preserved
    // and copy shingles are disjoint from originals, so benchmark size
    // grows ∝ n — an upper bound on the constant-benchmark production
    // shape (the emb_decontaminate caveat).
    "pipeline_curate_ingest",        // gate + full SimHash pair stage per call
    "pipeline_curate_decontaminated",// cached prefix + broadcast bench join
    "pipeline_train_manifest_clean", // cached prefix + decon + waterfill + rank
    "pipeline_curate_incremental",   // cached base boundary + increment-sized admission
    "pipeline_curate_curriculum",    // cached prefix + 4-group banded agg
    "mine_preference_pairs",         // fullClustersOnce boundary + 2 cluster windows
    "dedup_keep_best",               // boundary + 1 window + ids-only semi join
    "dedup_keep_policy_audit",       // boundary + 2 windows + 1-row rollup
    "mm_image_dedup",                // real PNG encode+decode per doc + one hash agg
    "pipeline_incremental_manifest", // admission chain + two lang-scale waterfills
    "text_gate_agreement",           // one stats scan, both gates, 4-cell agg
    // round-14 additions. The OPQ leg trains rotation + codebooks per
    // call (build cost, like ann_topk_pq); the perceptual near-dup's
    // suffixed ×2 copies derive fresh md5 patterns (disjoint aHashes in
    // expectation), so pair structure stays ~linear.
    "ann_topk_opq",                  // PCA rotation + PQ train/encode/ADC per call
    "mm_image_neardup",              // real PNG render+decode+aHash + banded pairs
    "pipeline_admission_reasons")    // base boundary + ids-only flag joins + lang agg

  /** SPARK_GRAFT_SCALE_ONLY: comma-separated exact names — run a subset
    * (new-row refresh) without re-measuring the whole table.
    */
  private def Queries: Seq[String] =
    sys.env.get("SPARK_GRAFT_SCALE_ONLY") match {
      case Some(f) =>
        val want = f.split(',').map(_.trim).filter(_.nonEmpty).toSet
        AllQueries.filter(want)
      case None => AllQueries
    }

  /** Queries whose cost is driven by lineitem/orders rather than the
    * document corpus — reported against lineitem's row count. Both table
    * families scale by the same ×1/2 / ×2, so the exponent's size RATIO
    * is identical either way; this only keeps the printed n honest.
    */
  private val LineitemDriven = Set("q_skew_join", "q_table_profile",
    "graph_pagerank", "graph_triangles", "graph_communities", "q_mad",
    "q_group_percentile", "q_percentile")

  /** Queries driven by the events table — labeled by its row count
    * (`sketch_error_report` is multi-table; events carries its heaviest
    * legs and all families scale by the same factor).
    */
  private val EventsDriven = Set("q_resample_ffill", "sketch_error_report")

  /** Queries driven by the customer table — labeled by its row count. */
  private val CustomerDriven = Set("q_fuzzy_join")

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_scale").toString
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    val ord = spark.read.parquet(s"$base/orders.parquet")
    // raw read (no ns->us rewrite): the copies must round-trip the exact
    // on-disk timestamp physical type so Tables.events reads them the
    // same way at every size
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$base/events.parquet")
    val cust = spark.read.parquet(s"$base/customer.parquet")
    val n = docs.count()
    val nLi = li.count()

    def writeDir(dir: String, tables: (String, DataFrame)*): String = {
      tables.foreach { case (name, t) =>
        t.coalesce(4).write.mode("overwrite").parquet(s"$dir/$name.parquet")
      }
      dir
    }

    // half: subsample by key parity — lineitem filtered on ORDER key so
    // referential integrity and per-order fan-out (the skew shape) survive
    // events halved on USER so per-user span/density (the grid shape)
    // survives; doubled under offset user ids -> twice the grid keys
    val half = writeDir(s"$root/half",
      "documents" -> docs.filter(col("doc_id") % 2 === 0),
      "embeddings" -> emb.filter(col("vec_id") % 2 === 0),
      "lineitem" -> li.filter(col("l_orderkey") % 2 === 0),
      "orders" -> ord.filter(col("o_orderkey") % 2 === 0),
      "events" -> ev.filter(col("user_id") % 2 === 0),
      "customer" -> cust.filter(col("c_custkey") % 2 === 0))
    val mangledCopy = docs
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .withColumn("text", array_join(
        transform(split(col("text"), " "), t => concat(t, lit("q"))), " "))
    val negatedCopy = emb
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
      .withColumn("embedding", transform(col("embedding"), x => -x))
    // double: a second disjoint key universe — every order (and its exact
    // lineitem fan-out, hot keys included) appears twice under offset
    // keys, so join selectivity per row and skew are preserved at 2n
    val keyOff = lit(1000000000L)
    val double = writeDir(s"$root/double",
      "documents" -> docs.unionByName(mangledCopy),
      "embeddings" -> emb.unionByName(negatedCopy),
      // the copy offsets part/supp keys too: pagerank's bipartite edge
      // set is distinct (l_partkey, l_suppkey) pairs, which an
      // orderkey-only copy would NOT grow — the doubled corpus must be a
      // second disjoint graph component. Orderkey-joined queries
      // (q_skew_join) and row-driven profiles are unaffected.
      "lineitem" -> li.unionByName(
        li.withColumn("l_orderkey", col("l_orderkey") + keyOff)
          .withColumn("l_partkey", col("l_partkey") + keyOff)
          .withColumn("l_suppkey", col("l_suppkey") + keyOff)),
      "orders" -> ord.unionByName(
        ord.withColumn("o_orderkey", col("o_orderkey") + keyOff)),
      "events" -> ev.unionByName(
        ev.withColumn("user_id", col("user_id") + keyOff)
          .withColumn("event_id", col("event_id") + keyOff)),
      // fuzzy-join copy: "qq"-suffixed names under offset keys — TPC-H
      // customer names share one length, so dist(orig, copy) >= 2 > the
      // query's maxDist (no cross-copy matches), while intra-copy edit
      // distances are exactly the originals' -> true pairs grow 2x
      "customer" -> cust.unionByName(
        cust.withColumn("c_custkey", col("c_custkey") + keyOff)
          .withColumn("c_name", concat(col("c_name"), lit("qq")))))

    val sizes = Seq(n / 2 -> half, n -> base, 2 * n -> double)
    val liSizes = Seq(half, base, double).map { dir =>
      dir -> spark.read.parquet(s"$dir/lineitem.parquet").count()
    }.toMap
    val evSizes = Seq(half, base, double).map { dir =>
      dir -> spark.read.parquet(s"$dir/events.parquet").count()
    }.toMap
    val custSizes = Seq(half, base, double).map { dir =>
      dir -> spark.read.parquet(s"$dir/customer.parquet").count()
    }.toMap

    def runOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    runOnce(Queries.head, half) // warmup: JIT + codegen + parquet footers

    // the shingle cache is keyed by canonical plan, so each corpus gets
    // its own entry; rep 1 of the first query per size pays the build and
    // the median reports the warm steady state — the same discipline as
    // Bench's within-family sharing
    val results = Queries.map { q =>
      q -> sizes.map { case (sz, dir) =>
        val label = if (LineitemDriven(q)) liSizes(dir)
          else if (EventsDriven(q)) evSizes(dir)
          else if (CustomerDriven(q)) custSizes(dir) else sz
        label -> median((0 until reps).map(_ => runOnce(q, dir)))
      }
    }
    results.foreach { case (q, ts) =>
      val t = ts.map(_._2)
      val expo = math.log(t.last / t.head) / math.log(ts.last._1.toDouble / ts.head._1)
      println(f"""{"metric":"scale_curve","query":"$q","sizes":[${ts.map(_._1).mkString(",")}],""" +
        f""""secs":[${t.map(x => f"$x%.2f").mkString(",")}],"observed_exponent":$expo%.2f}""")
    }
    spark.stop()
  }
}
