package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps formatted physical plans of headline queries to PLANS.md —
  * the artifact behind SCALE.md's claims (regenerate after plan-shape
  * changes: `sbt "runMain graft.PlanDump"`). */
object PlanDump {
  val Headline = Seq(
    "q01_pricing_summary", "q02_filter_project", "q03_revenue_by_nation",
    "q08_topk_orders", "q24_asof_join", "q35_exists_not_exists",
    "q36_salted_skew_join", "q37_range_frame_window",
    "t03_lsh_near_dup_pairs", "v01_cosine_topk", "v08_ivf_topk",
    "e01_sessionize", "v10_rerank_topk", "e09_funnel", "t17_mixture_sample",
    "t18_vocab", "t20_repetition_signals",
    "t23_source_overlap", "t24_pii_scrub", "v11_kmeans_round",
    "t25_boilerplate_share", "t26_bloom_decontaminate",
    "t27_trigram_familiarity", "v12_pq_adc_topk",
    "e11_cumulative_reach", "t29_length_band_filter",
    "t30_dup_passage_extents", "v14_centroid_distances",
    "m07_chunk_near_dup", "t31_lexical_diversity",
    "q41_scalar_subqueries", "e12_funnel_delays", "t32_leakage_safe_split",
    "t41_contamination_extents", "v17_cell_balanced_sample",
    "t43_curation_v2", "g12_fk_depth_recursive", "t46_source_minhash_sim",
    "v18_pq_train_round", "e13_stickiness",
    "t49_bm25_topk", "e16_rfm_segments", "m09_chunk_simhash_pairs",
    "v20_kcenter_seeds", "q42_bucketed_revenue", "v23_lsh_probe_curve",
    "t52_cc_auto_clusters", "q43_partition_pruned_revenue",
    "q44_scd2_dimension", "e19_last_touch_attribution",
    "v24_ivfpq_topk", "v25_ivfpq_residual_topk",
    // round 7 additions
    "k01_kmv_distinct", "k02_cms_heavy_hitters", "k06_bitmap_window_distinct",
    "k08_column_profile", "p01_pagerank", "p02_triangle_count",
    "p04_label_propagation", "q45_incremental_view", "q46_zorder_box",
    "q47_forget_cascade", "t53_span_dedup_rewrite", "t54_effective_tokens",
    "t55_budget_apportion", "v26_binary_hamming_topk", "e20_survival_gaps",
    "g16_federated_join", "g17_federated_agg_pushdown", "p04_label_propagation",
    "p05_bfs_layers", "q48_typed_topk", "m11_training_manifest",
    "q50_interval_islands", "k09_kmv_window_distinct", "e21_daily_autocorr",
    "v27_ivf_binary_topk",
    // round 8 additions
    "k10_hll_registers", "k11_bloom_fpr_curve", "p06_common_neighbors",
    "q52_fuzzy_blocked_match", "q53_dq_expectations", "q54_snapshot_diff",
    "t56_source_caps", "e22_ewma_smoothing", "e23_user_paths",
    "v29_semdedup_threshold_curve", "v30_matryoshka_recall_curve",
    "e24_robust_spikes", "e25_retention_triangle", "v31_filtered_ann",
    "p07_personalized_pagerank",
    // round 9 additions
    "v32_ivfpq_codebook_curve", "v33_ivfpq_opq_topk", "p08_bfs_delta",
    "q59_compaction_trigger", "q60_asof_native", "p09_hyperball",
    "e26_cuped_lift", "e27_cusum_drift", "v34_ivf_with_deletes",
    "v35_ivf_insert_overlay", "m12_cdc_mask_curve",
    // round 11 additions (q61 needs the GraftExtensions session for the
    // ASOF parser; streaming queries stay out — their fn runs the
    // stream at build time and the drained frame's plan is just a scan)
    "p10_effective_diameter", "v36_ivf_compaction_trigger",
    "v37_ivf_probe_recall_curve", "t59_rag_chunking", "q61_asof_sql",
    "p11_sssp_delta", "g20_partitioned_fed_scan",
    // round 12 additions (v38/p12/s30 stay out — their fns execute the
    // rebuild/loop/stream at build time, so the returned frame's plan
    // is a checkpoint scan; their shape locks live in VectorRebuildSpec
    // / the lpFullRoundProbe PlanSpec row / the s30 oracle)
    "t60_sequence_packing", "v39_cell_pair_recall",
    "t15_multi_signal_dedup",
    // round 13/14 additions (t62/s33/p14 stay out — training/stream/
    // artifact run at build time, so the registered plan is a scan;
    // their shape locks live in the PlanSpec t62 row, T62Spec, and the
    // hyperballRoundProbe PlanSpec row)
    "t63_trained_gate_apply", "v41_sampled_pair_recall",
    // round 15 additions (t22/t58 now memoize their readout, so their
    // registered plans are checkpoint scans; t22's bounded-window lock
    // moved to the tokenBudgetSelectUncached PlanSpec row)
    "m13_cross_modal_decontam",
    // round 16 additions
    "t64_bpe_encode_census", "t65_epoch_shuffle",
    "t66_tokenizer_fertility", "v42_hard_negative_mining",
    // s34 stays out (stream runs at build time; plan = checkpoint scan)
    "m14_frame_reuse",
    // round 17 additions (v43/t67 are memo-served — their UNCACHED
    // serve plans over the persisted artifacts are the evidence; t68
    // stays out: the roll artifact writes at build time, so the
    // registered plan is a 4-row census scan — its shape lock is the
    // rolled ≡ rebuild equality in TextArtifactSpec)
    "v43_ann_persisted_index", "t67_delta_dedup",
    // round 18 additions (v44's registered plan is a census over the
    // rolled artifact written at build time — the load-bearing evidence
    // is the ROLL plan: corpus side artifact-scanned, delta-only fresh
    // encode — dumped via UncachedBuilds; v45's is the rolled-artifact
    // serve plan, also via UncachedBuilds)
    "v44_ann_index_roll", "v45_ann_rolled_serve",
    // round 19 additions (all four are artifact-maintenance queries
    // whose registered plan is a census/readout over an artifact
    // written at build time — the load-bearing evidence is the
    // MAINTENANCE plan, dumped via UncachedBuilds: roll #2 scanning the
    // ROLLED artifact with only shard-B fresh work, and the reaps'
    // anti-join over the rolled scan. t71 stays out: its registered
    // plan is a checkpoint scan over the composed censuses — the
    // composition equality lives in TextArtifactSpec and its oracle)
    "v46_ann_roll_roll", "v47_ann_reap", "t69_band_roll_roll",
    "t70_band_reap",
    // v48/t72 serve FROM the reaped artifacts (deletions immediately
    // invisible to queries) — their evidence is the serve/dedup plan
    // over the reaped scan, dumped via UncachedBuilds
    "v48_ann_reaped_serve", "t72_reaped_delta_dedup")

  /** Registered names whose fn now serves a memo (plan = checkpoint
    * scan) but whose UNCACHED build plan is the load-bearing evidence —
    * dumped under "<name> (uncached build)" via the production build
    * entry points (round 16: p01/p07 memoize their score frames). */
  val UncachedBuilds: Seq[(String, (SparkSession, String) =>
      org.apache.spark.sql.DataFrame)] = Seq(
    "p01_pagerank" -> (graft.queries.GraphOps.pagerankBuild _),
    "p07_personalized_pagerank" -> (graft.queries.GraphOps.pprBuild _),
    "m07_chunk_near_dup" -> (graft.multimodal.Multimodal.chunkNearDupUncached _),
    // round 17: t03's pair frame is a cross-run artifact now — the
    // registered plan is a parquet scan of it; the LSH pipeline is the
    // evidence. v43/t67 dump their artifact-SERVING plans (which is the
    // claim: corpus/index side scans the artifact, fresh work is
    // query/delta-sized).
    "t03_lsh_near_dup_pairs" -> (graft.queries.TextOps.lshNearDupPairsUncached _),
    "v43_ann_persisted_index" -> (graft.queries.VectorOps.annPersistedTopKUncached _),
    "t67_delta_dedup" -> (graft.queries.TextOps.deltaDedupUncached _),
    // round 18: v44's evidence is the roll plan — the corpus_ann
    // artifact scanned, only the delta slice routed + encoded fresh;
    // m09's pair frame became a cross-run artifact (verdict #4), so
    // its banded build pipeline is the evidence now
    "v44_ann_index_roll" -> (graft.queries.VectorOps.rolledAnnUncached _),
    "v45_ann_rolled_serve" -> (graft.queries.VectorOps.annRolledServeUncached _),
    "m09_chunk_simhash_pairs" -> (graft.multimodal.Multimodal.chunkSimhashPairsUncached _),
    // round 19: the two-step rolls' evidence is roll #2's plan (corpus
    // side = the ROLLED artifact, fresh work = one shard); the reaps'
    // is the anti-join over the rolled artifact scan
    "v46_ann_roll_roll" -> (graft.queries.VectorOps.rolledAnnS2Uncached _),
    "v47_ann_reap" -> (graft.queries.VectorOps.reapedAnnUncached _),
    "t69_band_roll_roll" -> (graft.queries.TextOps.rolledBandsS2Uncached _),
    "t70_band_reap" -> (graft.queries.TextOps.reapedBandsUncached _),
    "v48_ann_reaped_serve" -> (graft.queries.VectorOps.annReapedServeUncached _),
    "t72_reaped_delta_dedup" -> (graft.queries.TextOps.reapedDeltaDedupUncached _))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new GraftExtensions) // q61's ASOF syntax
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    // src_hash binds the dumped plans to the tree that produced them —
    // round-17 verdict #2: PLANS.md went one commit stale (pre-bump
    // fold tags in the t67/v43 dumps) because only the bench records
    // were staleness-checked; tools/gate.sh now refuses a mismatch
    val srcHash =
      try scala.sys.process.Process(Seq("bash", "tools/srchash.sh")).!!.trim
      catch { case _: Throwable => "unknown" }
    val md = new StringBuilder(
      "# PLANS — formatted physical plans (sf0.001, pre-AQE)\n\n" +
        s"src_hash: $srcHash\n\n" +
        "Generated by `graft.PlanDump`; plan-shape assertions live in\n" +
        "`src/test/scala/graft/queries/PlanSpec.scala`, reasoning in `SCALE.md`.\n")
    Headline.foreach { name =>
      // memo-served registrations dump their UNCACHED build instead —
      // a checkpoint-scan plan carries no evidence (the t49 vacuity
      // rule). Only the branch taken runs its build: the registered fn
      // of a memoized query eagerly materializes the memo, so invoking
      // it just to discard the plan would do the build work twice.
      UncachedBuilds.find(_._1 == name) match {
        case Some((_, build)) =>
          val bp = build(spark, d)
            .queryExecution.explainString(ExplainMode.fromString("formatted"))
          md.append(s"\n## $name (uncached build; registered plan is a memo scan)\n\n```\n$bp```\n")
        case None =>
          val plan = SparkEntry.all(name).fn(spark, d)
            .queryExecution.explainString(ExplainMode.fromString("formatted"))
          md.append(s"\n## $name\n\n```\n$plan```\n")
      }
    }
    Files.writeString(Paths.get("PLANS.md"), md.toString)
    println(s"[plandump] wrote PLANS.md (${Headline.size} plans)")
    spark.stop()
  }
}
