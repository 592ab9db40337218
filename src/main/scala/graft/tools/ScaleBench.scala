package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}
import graft.sources.Tables

/** Empirical scale-linearity check: replicate the sf0.1 tables N-fold
  * with copy-DISTINCT content (new keys, salted shingles, rotated
  * vectors — so dedup/similarity structure grows linearly instead of
  * exploding across copies), then run the real `SparkEntry.queries`
  * entries at each factor and report seconds + output rows per factor.
  *
  * A linear operator should show sec(f)/sec(1) ~ f (modulo fixed
  * overhead); the exact grid similarity join should show ~f^2 compute
  * with flat per-task memory — that quadratic-but-sharded profile is
  * the honest cost of a complete similarity join.
  *
  * Usage: runMain graft.tools.ScaleBench [outBase] — env
  * SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_FACTORS
  * (default "1,4,16"), SPARK_GRAFT_QUAD_FACTORS (default "1,2,4").
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outBase = args.headOption.getOrElse("/tmp/graft_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factors = sys.env.getOrElse("SPARK_GRAFT_FACTORS", "1,4,16")
      .split(",").map(_.trim.toInt).toSeq
    val quadFactors = sys.env.getOrElse("SPARK_GRAFT_QUAD_FACTORS", "1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val SHIFT = 100000000L // key offset between copies

    /** N copies of a frame, `remap` applied to copy i (fresh keys etc). */
    def replicate(df: DataFrame, n: Int)(remap: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(i => remap(df, i)).reduce(_ unionAll _)

    def materialize(factor: Int): String = {
      val dir = s"$outBase/x$factor"
      if (new java.io.File(s"$dir/_done").exists) return dir
      val docs = Tables.load(spark, base, "documents")
      // salt every word so every shingle differs between copies: text
      // similarity structure within a copy is preserved, across copies
      // nothing matches (no cross-copy near-dup explosion)
      replicate(docs, factor) { (d, i) =>
        d.withColumn("doc_id", col("doc_id") + lit(i * SHIFT))
          .withColumn("text", array_join(
            transform(split(col("text"), " "), w => concat(w, lit(s"_$i"))), " "))
      }.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val emb = Tables.load(spark, base, "embeddings")
      // rotating the vector preserves the norm and pairwise sims within
      // a copy but decorrelates copies (dims are i.i.d. here)
      replicate(emb, factor) { (e, i) =>
        val rot = i % 64
        e.withColumn("vec_id", col("vec_id") + lit(i * SHIFT))
          .withColumn("embedding",
            concat(slice(col("embedding"), rot + 1, 64 - rot),
              slice(col("embedding"), 1, rot)))
      }.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val ev = Tables.load(spark, base, "events")
      replicate(ev, factor) { (e, i) =>
        e.withColumn("event_id", col("event_id") + lit(i * SHIFT))
          .withColumn("user_id", col("user_id") + lit(i * SHIFT))
      }.withColumn("ts", expr("unix_micros(ts) * 1000")) // back to i64 nanos
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val li = Tables.load(spark, base, "lineitem")
      replicate(li, factor) { (l, i) =>
        l.withColumn("l_orderkey", col("l_orderkey") + lit(i * SHIFT))
      }.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      // fact side of the merge/cube queries replicates with fresh keys;
      // nation is a dim — copied as-is
      val cust = Tables.load(spark, base, "customer")
      replicate(cust, factor) { (c, i) =>
        c.withColumn("c_custkey", col("c_custkey") + lit(i * SHIFT))
      }.write.mode("overwrite").parquet(s"$dir/customer.parquet")
      val ord = Tables.load(spark, base, "orders")
      replicate(ord, factor) { (o, i) =>
        o.withColumn("o_orderkey", col("o_orderkey") + lit(i * SHIFT))
      }.write.mode("overwrite").parquet(s"$dir/orders.parquet")
      Tables.load(spark, base, "nation")
        .write.mode("overwrite").parquet(s"$dir/nation.parquet")
      new java.io.File(s"$dir/_done").createNewFile()
      dir
    }

    def time(op: String, dir: String): (Double, Long) = {
      val q = SparkEntry.queries(op)
      q(spark, dir).count() // warmup (codegen, footer reads)
      val t0 = System.nanoTime()
      val rows = q(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val linearOps = Seq("q1_agg", "t1_tumble", "d1_dedup_exact",
      "d2_dedup_minhash", "d4_ngram_jaccard", "d7_decontam",
      "d8_dedup_groups", "d10_components_hashmin", "d9_decontam_bloom", "x3_tokens",
      "x7_repetition", "x8_pii", "x9_sample", "x10_chunk", "x11_pack",
      "a4_quantiles", "s5_quantize", "s6_ann_sq", "s7_ann_ivfsq",
      "s8_ann_pq", "t7_rolling", "m1_multimodal",
      "ref_interval_join", "ref_asof_merge", "ref_asof_join",
      // r5: sketch aggs, weighted sampling, retrieval, SCD2, k-means,
      // and the file-layout family (write+manifest+pruned read each run).
      // x12 is NOT here: word-salting renames its literal query terms,
      // so the SparkEntry entry would measure the empty-result path —
      // the salted-terms case below measures real retrieval instead.
      "a6_heavy_hitters", "a7_weighted_sample", "x13_tfidf",
      "q28_scd2", "s10_kmeans", "f1_manifest_prune", "f2_zorder_skip",
      "f3_compaction", "x14_lm_score", "x15_shuffle", "x16_budget_mix",
      "q30_merge_upsert", "q31_cube", "p3_expectations", "p4_histogram",
      "d11_semantic_dedup", "x17_safe_split", "p6_drift",
      // r6: partitioned-catalog pipeline (write+catalog+two-level read
      // per run, like f1) + farthest-point-seeded k-means (the k
      // seeding rounds re-run per factor — the honest seeding cost)
      "f4_partition_prune", "s11_kmeans_pp", "s12_ann_ivfpq_res",
      // balanced k-means: capacity derives from count, so the cap
      // tightens as copies multiply — rounds stay the measured cost
      "s13_kmeans_balanced",
      // per-cell budgeted IVF-PQ: training state is budget-bounded,
      // so only the scan should scale
      "s14_ann_ivfpq_cell",
      // balanced SemDeDup: k scales with n at fixed capacity, so the
      // pair stage must stay linear-in-n like d11's auto form
      "d12_semantic_dedup_balanced",
      // r7: materialized vector index (train+write per run, x21-style
      // write path; capacity derives from count so cells stay bounded),
      // its PQ/ADC tier, the bucketed range join (equi-join shaped, so
      // linear in points + interval copies), and the other two as-of
      // directions (same one-shuffle windowed plan as ref_asof_join)
      "s16_vector_index", "s17_vector_index_pq",
      "ref_asof_forward", "ref_asof_nearest",
      // d13: salting keeps within-copy duplicate passages and kills
      // cross-copy matches, so gram rows AND dup hits both scale ~f
      // through the same term-frequency-shaped plan
      "d13_substring_dup",
      // d14: same discovery plan + the doc-keyed position agg and
      // filter-by-index rebuild, all ~f
      "d14_substring_rm",
      // s18: the only corpus-scale stage is the candidate retrieval
      // (fixed queries x growing corpus); pool/pairwise/rounds are
      // queries x C rows whatever the corpus size
      "s18_mmr_diversify",
      // f8: layout build + routed CoW merge; changes derive from the
      // replicated orders so affected-file count scales with copies
      "f8_merge_cow",
      // r7 ninth wave: Count-Min build is one bounded-output groupBy
      // (~f scan, fixed shuffle); the n-gram audit is gram rows ~f
      // through a two-stage agg + TakeOrdered; the linear probe is 6
      // fixed-size gradient aggs over an ~f corpus; the JL sketch is
      // a map-only projection + fixed-queries-much-smaller candidate
      // rerank; the snapshot diff is layout + CoW churn + changelog
      // read, all proportional to the churned range (~f)
      "a8_countmin", "x26_ngram_stats", "x27_quality_classifier",
      "s19_ann_rp", "f9_snapshot_diff",
      // r7 tenth wave: HLL registers are one bounded-output max-
      // groupBy (~f scan); patch featurization is a map-only explode
      // (~f patches); windowed PSI is two count-groupBys + a
      // windows×buckets grid (~f scan, fixed-size grid)
      "a9_hll", "m2_patches", "p7_drift_windowed",
      // r7 eleventh wave: cross-set LSH decontam is band equi-joins
      // (salting keeps within-copy matches only, ~f); the mapped read
      // is one merged-schema scan + projection (~f)
      "d15_decontam_neardup", "f10_schema_evolution",
      // s20/x28: build + tombstone delete + pruned probe/query per
      // run — the delete itself is O(deleted ids), so timing tracks
      // the build (x28 is NOT term-salted-sensitive: it deletes by id)
      "s20_vector_index_delete", "x28_index_delete",
      // r7 twelfth wave: BFS rounds join the (bounded) frontier with
      // an ~f-sized edge table — each round ~f; PageRank is a fixed
      // number of join+agg rounds over ~f edges; robust outliers is
      // two sort-windows over ~f rows in a fixed group count; the
      // filtered index query is a build (~f) + a pruned probe whose
      // scan is capacity-bounded, filter pushed to parquet
      "g1_bfs", "g2_pagerank", "g4_ppr", "p8_outliers",
      "s21_vector_index_filtered", "t8_window_topk", "f11_rollback",
      "c1_curation_pipeline", "g5_kcore", "s22_vector_index_sq",
      "x29_sentence_chunk", "f12_orphan_gc", "c2_pit_features",
      "x30_dataset_card", "m3_audio_frames", "g6_sssp",
      "d16_semantic_dedup_index",
      // r8: conserving PageRank adds one global agg per round (~f
      // scan, scalar out); label propagation is one count-agg + one
      // struct-max argmax per round over ~f edges; the gram index is
      // build (~f gram rows, once per factor via the memo) + a
      // term-frequency-shaped serve; MoR delete is layout write +
      // O(keys) sidecar + a broadcast anti-join read (~f); PCA rounds
      // are an ~f map pass + a 64-row shuffle each; ABTT adds a
      // map-only residual projection to the fixed-queries top-k;
      // containment is the PPJoin shape (salting keeps matches
      // within-copy, so candidates ~f); the recursive CTE joins a
      // bounded frontier with ~f edges per level
      "g7_pagerank_conserve", "g8_label_prop", "d17_substring_dup_index",
      "f13_delete_mor", "s23_pca_power", "s24_abtt_topk",
      "d18_containment", "q33_recursive_cte",
      // r9: index-served MIPS is a build (~f, shared-memo) + a
      // cell-pruned probe; gram takedown is build + O(ids) tombstone
      // + the d17-shaped serve; the SQL front door pair is layout
      // write + catalog commit + a manifest-pruned native scan (~f
      // in files written and scanned); frame sampling / resize are
      // map-only explodes over ~f payloads; SCC is a bounded number
      // of pointer-jumped join+agg rounds over ~f edges of the FIXED
      // 512-node graph (denser per copy, like g3's densification —
      // but rounds SHRINK as density rises, so ~f per round holds)
      "s26_mips_index", "d19_gram_delete", "f14_sql_front_door",
      "f15_sql_write", "m4_frame_sample", "m5_resize", "g9_scc",
      // m6: dHash per image is map-only (~f); the banding self-join's
      // candidates track true near-dup pairs (planted dups replicate
      // ~f, so pairs stay ~f under the bucket budget, not n^2)
      "m6_dhash_neardup",
      // g10: wedge work is capped at maxCenterDegree x |E| by the hub
      // exclusion, so it scales ~f x densification, NOT deg^2-free;
      // g11: two cached-partitioned joins per round over ~f edges
      "g10_link_predict", "g11_hits",
      // f16/c5: layout write + catalog commits + ref marker creates —
      // the data IO is ~f, ref operations are O(1) marker files
      "f16_refs", "c5_wap",
      // s27: within-cell pair work is structurally <= capacity x n
      "s27_knn_graph",
      // q34 is one grouped scan; x31 is two grouped scans + pruned
      // joins over surviving bigrams
      "q34_pivot", "x31_collocations",
      // a10: one grouped scan to O(groups x 64) bucket rows + a tiny
      // window finalize
      "a10_ddsketch", "p9_fd_profile", "c6_governed_enrich",
      // x32: graph build ~f bigrams over a frequent vocab; pagerank
      // rounds over the fixed-size word graph
      "x32_textrank", "s28_recall_audit", "q35_grouping_sets",
      "f17_partition_evolution", "c7_changelog_refresh",
      "s29_vector_index_bq", "g12_modularity", "f18_join_file_prune",
      "s30_nn_descent", "s31_graph_serve", "q36_lateral_topn",
      "q37_unpivot", "d20_typo_pairs", "c8_incremental_agg",
      "g13_harmonic", "t9_stream_distinct",
      // r10 second wave: walks/fanouts ride the fixed-node graph's
      // densification (per-step join over ~f edges, walk/seed cohorts
      // fixed; g16's output is fanout-capped by construction); the
      // time-series pair is one grouped scan (+ one window pass per
      // ~f entities for t10); p10 is one grouped scan; f20 is layout
      // write + the executor-side word fold (~f rows into a fixed
      // files x m/64 result) + a residual point read; d21 is the d8
      // component chain + one argmax join; c10/c11 write ~f versions
      // and drain them through the stream (source IO ~f added files)
      "g15_random_walks", "g16_neighbor_sample", "t10_resample",
      "t11_ohlc", "p10_kanon", "f20_bloom_skip", "d21_canonical",
      "c10_stream_read", "c11_medallion",
      // m7: frame explode ~f + a per-doc window pass (docs ~f)
      "m7_vad_segments",
      // t12: the replicated copies' user ids shift out of the fixed
      // cohort, so the stateful stream's input is constant — measures
      // the stream machinery floor, not data scaling
      "t12_asof_stream",
      // g17: cold ladder + warm rounds, each round one shuffle over
      // ~f edges of the fixed-node densifying graph (the g2 profile)
      "g17_pagerank_warm",
      // f21: layout write + footer string-stats (~f files) + a
      // pruned range read over a fixed-width key range
      "f21_string_prune",
      // p11: r11's single-pass form — one (column, key) explode +
      // one map-side-reduced aggregation for all audited columns
      "p11_skew_audit",
      // r11: SQL DML — layout write + prune/touch/rewrite of the
      // matching files (all ~f in files written and touched); the
      // MERGE adds the staged-slice write (~f matched rows) and the
      // insert append (~f new rows)
      "f22_sql_delete", "f23_sql_update", "f24_sql_merge",
      // c12: base + CoW update + append history writes ~f data and
      // drains the I/D diff of exactly the churned files (~f)
      "c12_change_feed",
      // g18: g15's per-step join + the (prev,dst)-keyed bias join,
      // both over ~f edges of the fixed-node densifying graph; the
      // weight expansion widens only the walk frontier (fixed cohort)
      "g18_node2vec_walks",
      // s33: build (~f, shared-memo path) + append of a fixed-size
      // increment + bounded refinement rounds touching only
      // new-endpoint edges — refresh cost tracks the increment
      "s33_graph_refresh",
      // r11 second wave: t13 is the t10 grid + one more window pass;
      // c13 writes the layout (~f) then folds diffs of only the
      // churned files per version (~f churn by construction)
      "t13_interp", "c13_view_maintain",
      // f25/f26: layout write (~f) + bin rewrites (~f small files) /
      // + the expiry-and-sweep listing (~f files)
      "f25_sql_optimize", "f26_sql_vacuum",
      // g19: per round, the g8 neighbor join over ~f edges of the
      // fixed-node densifying graph + one node-keyed tot agg
      "g19_louvain",
      // r11 third wave (SQL read surface): f27 reads two pinned
      // snapshots of one ~f-sized table (two pruned scans); f28 is a
      // layout write + catalog commit + a pruned read (the f15
      // profile); f29 is manifest-only driver work, O(files x
      // versions) entries, after a ~f layout write + CoW delete;
      // c14's sub-range diff reads only the churned files (~f)
      "f27_sql_time_travel", "f28_sql_ctas", "f29_sql_history",
      "c14_table_changes",
      // f30: manifest-copy clone (no data IO) + a CoW delete on the
      // clone (~f touched files) + two pruned reads; c15 drains ~f
      // source versions through the native sink (per batch: layout
      // write + one manifest commit, IO = the batch's own rows)
      "f30_sql_clone", "c15_stream_sink",
      // f31: layout write + CoW delete + a manifest-copy re-commit
      // (no data IO for the restore itself) + two pruned reads
      "f31_sql_restore",
      // f32: the ALTER itself is no-IO (a manifest re-commit with
      // schema meta); the wall is the ~f write + insert + the
      // backfill UPDATE's pinned-read rewrite of touched files
      "f32_sql_add_column",
      // g20: positives = walk-corpus self-join (corpus fixed by the
      // start cohort); the negative lookup is a broadcast-hash probe
      // against the node-sized cumulative table — per-factor cost is
      // the g15 walk replay over ~f edges of the densifying graph
      "g20_skipgram",
      // r12: f33 is a ~f layout write + a no-IO catalog drop + a CoW
      // delete whose ONE distributed rewrite job reads only touched
      // files (~f); f34 is the f32 profile (layout + no-IO evolution)
      // plus the merge's staged rewrite of ~f touched files; g21's
      // level 1 is g19's ~f profile and the coarse levels shrink
      // geometrically, so the recursion adds a near-constant tail
      "f33_sql_drop_column", "f34_merge_evolution",
      "g21_louvain_multilevel",
      // f35: ~f layout write + a no-IO widen commit + the insert's
      // adopt + the UPDATE's one-job pinned-read rewrite (~f touched)
      "f35_sql_widen_column",
      // f36: the count itself is metadata-only (zero data IO at any
      // factor); the measured cost is the ~f layout write + CoW delete
      "f36_metadata_count",
      // r13: f37 is a ~f layout write + a no-IO rename commit + the
      // insert's adopt + the UPDATE's one-job id-matched rewrite of
      // touched files (~f); f38's two stats are metadata-only at any
      // factor (the cost is the write + CoW delete); f39 is the ~f
      // write + the one-job full-table Morton re-layout (~f read+write
      // — the honest ZORDER cost); f40 is the ~f two-level write +
      // CoW delete + per-leaf OPTIMIZE
      "f37_sql_rename_column", "f38_metadata_stats",
      "f39_sql_optimize_zorder", "f40_multi_partition",
      // f41: the grouped stats are metadata-only at any factor — the
      // measured cost is the ~f layout write + CoW delete
      "f41_metadata_partitions")
      // x18/x19 are NOT here for x12's reason (salting renames their
      // literal terms) — the salted cases below measure real phrase/
      // proximity retrieval.
    // q32: points AND intervals both replicate over the FIXED 10k
    // domain, so the match count itself is ~f^2 — the join is
    // equi-join shaped (work tracks matches, not the n x m cross),
    // which is exactly what the quadratic profile should show
    // g3: replication DENSIFIES the fixed 4096-node hash graph (same
    // nodes, ~f× edges), so wedge work grows ~f² by construction —
    // the honest profile for triangle counting under densification
    // s25: exact MIPS is s1's profile (fixed queries × growing corpus
    // map work, two-stage reduction)
    // g14 rides g3's densification (same fixed-node graph, ~f× edges
    // ⇒ wedge work ~f²) at p³ = 1/8 of the closing work on the kept
    // subgraph — the sampled profile should show the same curve shape
    // as g3 at a constant fraction of the cost
    // s32: the unlabeled query cohort is 4/5 of the corpus and the
    // labeled side 1/5 — BOTH grow ~f, so the exact vote stage is
    // honestly f² (s1's profile with growing queries); the scale path
    // swaps the candidate stage for the index probe, vote unchanged
    val quadOps = Seq("d5_embed_neardup", "s1_ann_bruteforce",
      "q32_range_join", "g3_triangles", "g14_triangle_sample", "s25_mips",
      "s32_knn_classify")

    // Candidate-stage scale check for the re-ranking ANN paths: a 10x
    // query batch (100 queries vs the SparkEntry entries' 10) over the
    // replicated corpus. With the two-stage candidate reduction the
    // per-query rank shuffle carries partitions x C rows regardless of
    // corpus size, so sec(f)/sec(1) should track the map-side scan (~f),
    // not the corpus x queries fan-out.
    def bigBatch(dir: String): (DataFrame, DataFrame) = {
      val emb = Tables.load(spark, dir, "embeddings")
      (emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec")),
        emb)
    }
    val annOps: Seq[(String, String => DataFrame)] = Seq(
      "s7_ivfsq_q100" -> { dir: String =>
        val (q, emb) = bigBatch(dir)
        graft.operators.Similarity.ivfSqTopK(q, emb, 5, clusters = 16,
          nprobe = 16, candidates = 20)
      },
      "s8_pq_q100" -> { dir: String =>
        val (q, emb) = bigBatch(dir)
        graft.operators.Similarity.pqTopK(q, emb, 5, subspaces = 8,
          codewords = 16, candidates = 50)
      },
      // copy-0 query terms: fixed queries against the growing corpus —
      // the posting prefilter should keep cost tracking the tf scan
      "x12_bm25_salted" -> { dir: String =>
        graft.operators.TextRank.bm25TopK(
          Tables.load(spark, dir, "documents"),
          Seq(1 -> Seq("hash_0", "join_0"), 2 -> Seq("dup_0", "scan_0")),
          k = 10)
      },
      // copy-0 phrases: positional postings still prefilter to the
      // phrase vocabulary, so cost should track the postings scan
      "x18_phrase_salted" -> { dir: String =>
        graft.operators.TextRank.bm25PhraseTopK(
          Tables.load(spark, dir, "documents"),
          Seq(1 -> Seq("table_0", "table_0"), 2 -> Seq("fast_0", "key_0"),
            3 -> Seq("agg_0", "row_0", "scan_0")),
          k = 10)
      },
      // copy-0 proximity terms: the span self-join stays on the
      // vocabulary-filtered postings, so cost tracks the scan too
      "x19_prox_salted" -> { dir: String =>
        graft.operators.TextRank.bm25ProximityTopK(
          Tables.load(spark, dir, "documents"),
          Seq(1 -> Seq("hash_0", "join_0"), 2 -> Seq("dup_0", "scan_0")),
          window = 8, k = 10)
      },
      // copy-0 ordered-slop terms: chained equi-joins over the same
      // prefiltered postings
      "x20_slop_salted" -> { dir: String =>
        graft.operators.TextRank.bm25SlopTopK(
          Tables.load(spark, dir, "documents"),
          Seq(1 -> Seq("hash_0", "join_0"), 2 -> Seq("dup_0", "scan_0")),
          window = 10, k = 10)
      },
      // materialized index: the measured cost is BUILD (write the full
      // bucketed postings layout) + a partition-pruned query — the
      // honest index-pipeline shape; query-only cost is the pruned
      // scan, independent of corpus size beyond the terms' buckets
      "x21_indexed_salted" -> { dir: String =>
        graft.sources.TextIndex.build(Tables.load(spark, dir, "documents"),
          "doc_id", "text", s"$dir/__tidx", buckets = 32)
        graft.sources.TextIndex.bm25TopK(spark, s"$dir/__tidx",
          Seq(1 -> Seq("hash_0", "join_0"), 2 -> Seq("dup_0", "scan_0")),
          k = 10)
      },
      // copy-0 terms for the lexical side, fixed query vectors for the
      // vector side: both retrieval stages track their corpus scans and
      // the fusion itself is rank-rows only, so ~f overall
      "x25_hybrid_salted" -> { dir: String =>
        val docs = Tables.load(spark, dir, "documents")
        val emb = Tables.load(spark, dir, "embeddings")
        val lex = graft.operators.TextRank.bm25TopK(docs,
          Seq(1 -> Seq("hash_0", "join_0"), 2 -> Seq("dup_0", "scan_0")),
          k = 10)
        val qv = emb.filter(col("vec_id").isin(1, 2))
          .select(col("vec_id").cast("int").as("query_id"),
            col("embedding").as("query_vec"))
        val vec = graft.operators.Similarity.bruteForceTopK(qv, emb, 10)
          .select(col("query_id"), col("rank"),
            col("neighbor_id").as("doc_id"))
        graft.operators.TextRank.rrfFuse(Seq(lex, vec), k = 10)
      })

    // SPARK_GRAFT_SCALE_OPS=s7_ann_ivfsq,s8_pq_q100 narrows a run while
    // iterating on one operator family
    val onlyOps = sys.env.get("SPARK_GRAFT_SCALE_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def keep(op: String): Boolean = onlyOps.forall(_.contains(op))

    for (f <- (factors ++ quadFactors).distinct.sorted) materialize(f)
    val results = (for (op <- linearOps if keep(op); f <- factors) yield (op, f)) ++
      (for (op <- quadOps if keep(op); f <- quadFactors) yield (op, f))
    results.foreach { case (op, f) =>
      val (sec, rows) = time(op, s"$outBase/x$f")
      println(f"""{"op":"$op","factor":$f,"sec":$sec%.3f,"rows":$rows}""")
    }
    annOps.filter(t => keep(t._1)).foreach { case (op, mk) =>
      factors.foreach { f =>
        val dir = s"$outBase/x$f"
        mk(dir).count() // warmup
        val t0 = System.nanoTime(); val rows = mk(dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"op":"$op","factor":$f,"sec":$sec%.3f,"rows":$rows}""")
      }
    }
    spark.stop()
  }
}
