import graft._
import java.nio.file.{Files, Paths}
val sf = "/root/testdata/sf0.01"
val picks = Seq(
  "v_age_preferences" -> "One fact scan; cube aggregate; stats + rank share one window exchange; dims broadcast.",
  "latest_events" -> "TakeOrderedAndProject: per-partition heaps, no global sort.",
  "filtered_display" -> "IN-list + range predicates pushed into the parquet scan (PushedFilters).",
  "near_dup_pairs" -> "Banded LSH self-join on the band key; shingle frame checkpointed and reused; relational Jaccard verify.",
  "cosine_topk" -> "Broadcast query set against the corpus (the one intended nested-loop); WindowGroupLimit caps per-partition top-k state; dot_q/quantize_q run as native codegen'd expressions.",
  "enriched_orders" -> "All 11 derivations fused into one whole-stage-codegen projection over the scan; the rating JSON parse is hoisted so props is parsed once per row.",
  "anomaly_by_category" -> "Filter on the DERIVED is_anomaly flag collapses to a pushed raw-column OR predicate; ReadSchema pruned to two columns.",
  "ivf_multiprobe_topk" -> "Fit (sample-seeded k-means) -> assignTop replicates each query to its p nearest cells -> cell equi-join prunes the corpus scan.",
  "tpch_q5" -> "6-table star join: orders/customer/lineitem/supplier shuffle on their keys, nation/region broadcast; one aggregate on n_name.",
  "rollup_revenue" -> "ROLLUP as ONE aggregate pass: Expand feeds each row to its grouping sets, partial aggregation still combines map-side.",
  "shard_manifest" -> "Pack + checksum share one (stratum, shard) window pass; the order-sensitive fold is a per-doc polynomial term summed in exact decimal.",
  "dup_chunks" -> "Narrow chunking -> fingerprint hash aggregate -> join back; duplicate-group volume bounded by actual duplication.",
  "zorder_pruned_scan" -> "Both dimensions' range predicates reach the parquet scan as PushedFilters; the Morton-clustered layout keeps row groups narrow in both.",
  "merge_upsert" -> "MERGE without shuffling the snapshot: the change batch's key set broadcasts into a LeftAnti hash join; survivors union under it. The only exchange belongs to the batch's own dedup.",
  "scd2_history" -> "Change-detection lag and validity lead share ONE exchange on the key: both windows declare the same partitioning.",
  "bm25_retrieval" -> "Query terms broadcast into the postings (term hash join); the 1-row corpus stats are the intended nested-loop; nano-quantized DECIMAL sums then WindowGroupLimit top-k.",
  "table_profile" -> "Every per-column statistic is a column of ONE aggregate - one scan regardless of how many columns are profiled; explode melts the single row.",
  "value_regression" -> "Five DECIMAL moment sums in one hash aggregate; r/slope/intercept are scalar projections over the group row.",
  "tpch_q2" -> "Correlated scalar-min as a min-window over the aggregated ps stand-in: lineitem scanned ONCE; the window reuses the aggregate's partitioning; dims broadcast.",
  "tpch_q21" -> "EXISTS/NOT-EXISTS pair collapsed into one per-order aggregate (distinct suppliers vs distinct problem suppliers); lineitem scanned once, not three times.",
  "user_event_features" -> "lag/lead/moving-frame features share ONE window exchange on user_id; the 3-row moving average accumulates exact decimal.",
  "bpe_pair_counts" -> "posexplode -> lead window per doc -> global pair aggregate with map-side partials -> TakeOrderedAndProject top-k.",
  "fuzzy_customer_pairs" -> "FastSS deletion-neighborhood blocking: explode each name into itself + single-deletion variants, equi-join on (block, variant) - candidates LINEAR in rows - then exact levenshtein verify. The per-block brute force this replaces was quadratic (22 s -> 1.6 s at sf0.1).",
  "brand_affinity" -> "Basket-keyed pair self-join: both sides read ONE materialized stage (the pinned repartition on the deduped basket-item frame); global basket/item counts aggregate the raw input so no branch recomputes the join prefix; the 1-row basket count is the intended broadcast cross join.",
  "spend_gini" -> "Distributed prefix sum: quantile-bucketed tie blocks (localCheckpoint pins the block frame against diamond recompute), broadcast triangular bucket offsets, bucket-PARTITIONED running-count window - no unkeyed window, no single-partition sort at any key cardinality.",
  "global_price_quantiles" -> "Global exact nearest-rank selection without a global sort: tie blocks + prefixCounts + ONE final aggregate bracketing each millesimal rank.",
  "tpch_q11" -> "HAVING-vs-global as a broadcast 1-row total crossed back onto the checkpointed per-part aggregate - the heavy join runs once, nothing funnels one partition.",
  "rolling_active_hll_bounds" -> "Per-day mergeable HLL sketches union-merged per 7-day window: the x7 replication lands on the ~30-row day domain, not the fact table; exact side joined in only for the bounds flags.",
  "containment_pairs" -> "k-prefix inverted-index containment join: rarest-first k-prefixes probe the FULL shingle index, candidates need >= min(k, need) matched prefix shingles (prunes the 1-shared-shingle flood: 206k -> ~1k candidates for 512 pairs), relational overlap verify only on survivors.",
  "dpp_scan" -> "Dynamic partition pruning: the day-partitioned fact scan carries a dynamicpruning subquery fed from the broadcast dim (days with a high-value error) - partition directories are listed at execution time, not planning time.",
  "pca_projection" -> "The power-iteration fit is memoized control-plane state; the projection itself is ONE narrow codegen pass - dot_q against the broadcast-literal component, exact integer numerator, one double division.",
  "stream_session_windows" -> "Append-mode session aggregation (batch plan shown): watermark -> session_window merge -> state-evicting emit; the streaming replay drains via the two-sentinel watermark flush.",
  "zorder_dpp_scan" -> "The composed 100 TB scan posture: hive day-partitioning pruned by a dynamicpruning subquery (runtime dim) AND the per-day Z-order layout's two range predicates pushed to parquet - both prunings in ONE plan.",
  "embedding_near_dup_auto" -> "Scale-adaptive near-dup pair search: k-proportional-to-n k-means cells (shared memoized fit) block the within-cell self-join, so candidate volume stays linear on scale-up; exact quantized cosine verifies. Assignment is ONE narrow codegen projection (nearest_cell_q) - no n*k exploded rows, no shuffle.",
  "semantic_dedup_srp_auto" -> "Training-free SemDeDup at scale-adaptive band width: srp_sketch_q computes the whole sketch per row in one codegen pass (no posexplode/sign-join/aggregate), band bits track log2(n) so bucket occupancy - and spurious-candidate volume - stays constant per vector.",
  "embedding_contamination_fixed" -> "Production decontamination shape: the FIXED benchmark set broadcasts into one narrow max-cosine pass over the corpus - linear in the corpus, no quadratic fixture artifact.",
  "semantic_dedup_hier" -> "Two-level hierarchical SemDeDup: assignment chains nearest_cell_q -> nearest_sub_cell_q in ONE narrow projection (n*2*sqrt(k) dots for the same leaf count the flat k-proportional fit reaches at n*k), then the standard leaf-blocked pair verify.",
  "pq_topk" -> "Compressed-domain ANN: the corpus side carries only the M-int code word (encode is one narrow projection; a STORED codes table scans 8 ints, not 64 floats), the broadcast full-precision query set scores via pq_adc_q - exact integer reconstruction distances, WindowGroupLimit top-k.",
  "ivfpq_topk" -> "The faiss serving shape: probe selection replicates each query to its 2 nearest cells (broadcast centroid frame), residual_q re-bases the query against EACH probed cell, and the cell equi-join prunes the coded corpus before pq_adc_q scores it - cell pruning times compressed rows in one plan.",
  "triangle_counts" -> "Degree-ordered triangle enumeration: edges orient toward the (degree,id)-larger endpoint - oriented out-degree bounded O(sqrt m) - so the wedge self-join and closing-edge equi-join stay O(m^1.5) worst case; every triangle lands exactly once, no /3 correction.",
  "copurchase_pagerank" -> "Iterative PageRank as five join+aggregate rounds over the checkpointed edge+degree frame: 2 exchanges per round (rank join on the source, flow aggregate on the destination), rank frame |V| rows, pure int64 floor-div arithmetic - the oracle replays the identical trajectory.",
  "copurchase_components" -> "Alternating large-star/small-star connected components: the edge frame re-hangs onto per-node minima in O(log^2 n) composite rounds (each two join+aggregate passes over the EDGE frame, never the corpus); fixpoint is star-forest-asserted before labels are read off.",
  "association_rules" -> "Basket-keyed pair induction feeds two directional rule rows per edge; antecedent/consequent supports hash-join in, the 1-row basket total is the intended broadcast cross join, and confidence/lift are ppm-scale int64 floor divisions - bit-replayable by the oracle.",
  "orc_source_scan" -> "The ORC vendor-drop read scans like the native layout: explicit schema (no inference pass), value predicate pushed to stripe statistics (PushedFilters), full type fidelity - no string staging.",
  "heavy_hitter_bounds" -> "Misra-Gries heavy hitters through the engine's custom TypedImperativeAggregate (mg_topk): map-side k-1-counter partial summaries, shuffle-side PODS'12 mergeable merge - frequent terms with NO vocabulary shuffle (the token explode aggregates into ONE summary row); exact counts join in only for the provable bound flags. stream_heavy_hitters runs the SAME aggregate complete-mode inside a checkpointed stream (the state store carries the serialized summary).",
  "dup_spans_winnow" -> "Content-defined (winnowed) span dedup: per-position k-gram md5 and the rows-frame minimum both ride the SAME doc-id window sort (one exchange), map-side-deduped distinct means only ~2/(w+1) of positions reach the fingerprint aggregate - the alignment-invariant span tier at sampled shuffle volume.",
  "stream_change_feed" -> "The CDC read side (fold plan shown; the feed itself is published exactly-once by the upsert replay's stage-then-atomic-rename protocol): a file-source readStream tails feed/, and the newest-version-per-key fold is ONE window exchange over the change rows.",
  "embedding_near_dup_tree" -> "Depth-3 tree quantizer: assignment chains nearest_cell_q -> nearest_sub_cell_q -> nearest_sub_cell_q in ONE narrow projection (n*3*f dots at fanout f = k^(1/3) - the log-depth exponent knob over the 2-level form's n*2*sqrt(k)), then the standard leaf-blocked pair verify.",
  "span_decontam" -> "Span-level benchmark decontamination: the corpus side's winnowed fingerprints (sampled ~2/(w+1) of positions, map-side-deduped) probe the distinct-reduced BROADCAST benchmark fingerprint set - one broadcast hash join, never doc x doc - then the gaps-and-islands merge reports WHICH positions quote the eval set.",
  "stream_span_decontam" -> "Span decontam AT INGEST (read-back plan shown; the decontam itself runs inside the checkpointed document replay): each micro-batch winnows its documents and probes the same broadcast benchmark fingerprint set in-flight, so contaminated spans are flagged before the corpus lands - the batch span_decontam SQL is the oracle verbatim.",
  "semantic_dedup_bigmodel" -> "The DataFrame-resident (big-model) assignment path: root codebook broadcast-crosses the corpus (fanout-sized, the intended nested-loop), the leaf level equi-joins on the parent node, and min(struct(score, cid)) reproduces the kernels' exact argmin + tie-break; map-side partial aggregation collapses the n*f scored rows to n before the exchange. Exists for the k-proportional-to-n regime where the leaf table outgrows any broadcast (SCALE.md round-9 envelope note).",
  "semantic_dedup_srp_pre" -> "Two-stage SRP dedup (regime-limited comparator, SCALE.md round 10): the threshold-derived hamming prefilter (srp_sketch_q longs riding the band rows, popcount inside the band join's projection - the pair frame is never exchanged) prunes candidates before full vectors ship to survivors. Width and tau are pure functions of the verify threshold, replayed by the oracle.",
  "semantic_dedup_srp_bucket" -> "The WITHIN-BUCKET verify - the round-10 production dedup shape: vectors ride the band rows (one shuffle of ~corpus volume, independent of pair count) and the exact quantized cosine evaluates INSIDE the band self-join's whole-stage-codegen projection; only passing pairs reach the distinct. Measured 2.6x per 10x data at 200k-2M, no tau, no regime caveat.",
  "semantic_dedup_hybrid" -> "The hybrid assignment (kernel coarse + table leaf): nearest_cell_q scores the fanout-sized coarse level as a narrow codegen projection (no join), and only the LEAF level - the one that grows with the corpus - pays the storage-resident centroid-table equi-join + argmin. The per-level cutover point between the expression-kernel and big-model evaluation strategies, registered.",
  "embedding_near_dup_srp" -> "Training-free near-dup PAIR search: the srp_bucket within-bucket verify emitting the passing (id_a, id_b, cosine) rows themselves - vectors ride the band rows, the exact cosine evaluates inside the band self-join's codegen projection, and output volume scales with the TRUE pair count (the fit-free sibling of the flat/hier/tree pair queries).",
  "pipeline_end_to_end" -> "The integration gate: benchmark carve-out -> curation (exact + near dedup + quality) -> srp_bucket semantic dedup over survivors' vectors -> n-gram decontamination (broadcast benchmark shingles) -> hash split -> running-token packing, in ONE plan. Every inter-stage frame is an id frame; each drop is an anti join against a loser set (dup losers, contaminated docs - both ~leak-sized); text is scanned by curation + decontam only, vectors by the semantic stage only.")
val sb = new StringBuilder
sb.append("# PLANS - formatted physical plans of representative queries\n\n")
sb.append("Generated from the current build at sf0.01 (plan shapes are scale-independent;\n")
sb.append("guardrails enforced by PlanAuditSpec). Regenerate: tools/dump_plans.scala.\n")
for ((name, note) <- picks) {
  sb.append(s"\n## $name\n\n$note\n\n```\n")
  val qe = SparkEntry.queries(name)(spark, sf).queryExecution
  sb.append(qe.executedPlan.toString.take(6000))
  sb.append("\n```\n")
}
Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE " + sb.length)
sys.exit(0)
