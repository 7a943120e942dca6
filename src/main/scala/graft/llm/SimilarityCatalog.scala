package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Tables}

/** Driver-contract registrations for similarity search over `embeddings`
  * (`vec_id, embedding array<float>, label`).
  *
  * `cosine_topk` is the brute-force baseline (broadcast query set); `label`
  * plays the IVF coarse-cell id for the pruned variant and the blocked
  * near-dup pair search. All cosines are 24-bit fixed-point quantized
  * ([[Similarity.QScale]]) so both engines do exact integer arithmetic.
  */
object SimilarityCatalog extends Catalog {

  val K = 10
  val NumQueries = 5       // query set: vec_id < 5
  val Dim = 64             // embedding dimensionality of the fixture table
  val NearDupCos = 0.35    // embeddings are near-orthogonal; pairs over 0.35
                           // within a cell are the "suspiciously close" tier
  val PqM = 8              // PQ subspaces (64-dim → 8×8-dim slices)
  val PqKs = 16            // codes per subspace (4-bit codebooks)
  val IvfPqProbes = 2      // probed coarse cells per IVF-PQ query

  private def corpus(t: Tables) = t.embeddings

  private def queriesDf(t: Tables) = t.embeddings.filter(col("vec_id") < NumQueries)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cosine_topk" -> ((s, d) => {
      val t = Tables(s, d)
      Similarity.cosineTopK(corpus(t), queriesDf(t), "vec_id", "embedding", K)
        .orderBy("query_id", "nn_id")
    }),

    "ivf_topk" -> ((s, d) => {
      val t = Tables(s, d)
      Similarity.ivfTopK(corpus(t), queriesDf(t), "vec_id", "embedding", "label", K)
        .orderBy("query_id", "nn_id")
    }),

    "embedding_near_dup" -> ((s, d) =>
      Similarity.cellNearDupPairs(Tables(s, d).embeddings, "vec_id", "embedding",
          "label", NearDupCos)
        .orderBy("id_a", "id_b")),

    // SemDeDup: per-vector keep/drop verdicts from the cell-blocked pair
    // search — every vector either keeps or names its min-id near neighbor
    "semantic_dedup" -> ((s, d) =>
      Similarity.semanticDedup(Tables(s, d).embeddings, "vec_id", "embedding",
          "label", NearDupCos)
        .orderBy("vec_id")),

    // the scale-adaptive form: cells come from a k ∝ n k-means fit
    // (constant target cell size — the knob the sf1 scaling run showed
    // pinned-k lacks), so candidate volume stays linear on scale-up. The
    // fit is deterministic; its centroids are captured for the oracle
    // like ivf_kmeans_assign's (semanticAutoOracle below). The fit itself
    // is memoized per (JVM, sfDir) — `embedding_near_dup_auto` consumes
    // the SAME fit, the fit-once/consume-many shape (pcaFit's idiom).
    // PINNED COMPARATOR — super-linear past ~10⁵ vectors (the flat k ∝ n
    // assignment is n·k = n²/target dots; measured 56.7→253.7 s at
    // 200k→632k, SCALE.md round 9): use semantic_dedup_hier / _tree /
    // _bigmodel for real corpora.
    "semantic_dedup_auto" -> ((s, d) => {
      val model = autoFit(s, d)
      autoCentroids = Some(model.centroids)
      val df = Tables(s, d).embeddings
      Similarity.semanticDedup(df.join(model.assign(df), Seq("vec_id")),
          "vec_id", "embedding", "cluster", NearDupCos)
        .orderBy("vec_id")
    }),

    // the near-dup PAIR search over the same scale-adaptive cells: the
    // pinned-label `embedding_near_dup` above is a fixture-only shape
    // (10× vectors in the same 10 cells → ~100× within-cell candidates —
    // measured 20.7× at sf1); blocking on the shared k ∝ n fit instead
    // holds per-cell pair volume, and so total candidate volume, linear
    // in n. Same exact quantized cosine; oracle replays the captured
    // centroids (nearDupAutoOracle below).
    // PINNED COMPARATOR — super-linear past ~10⁵ vectors (shares the flat
    // k ∝ n fit's n²/target assignment dots; measured 65.7→185.9 s at
    // 200k→632k, SCALE.md round 9): use embedding_near_dup_hier / _tree
    // for real corpora.
    "embedding_near_dup_auto" -> ((s, d) => {
      val model = autoFit(s, d)
      nearDupAutoCentroids = Some(model.centroids)
      val df = Tables(s, d).embeddings
      Similarity.cellNearDupPairs(df.join(model.assign(df), Seq("vec_id")),
          "vec_id", "embedding", "cluster", NearDupCos)
        .orderBy("id_a", "id_b")
    }),

    // the assignment-cost cure for the auto tier: the flat k ∝ n fit's
    // nearest-cell pass is n·k dots = n²/target flops — measured 12.2× on
    // 10× data at the sf1cr→sf10cr decade (SCALE.md) even with the pair
    // volume held linear. A two-level quantizer (coarse √k cells, then √k
    // sub-cells fitted per coarse cell in one grouped-Lloyd pass) reaches
    // the SAME leaf count and occupancy at n·2√k dots — the faiss-style
    // coarse-quantizer shape a 100 TB SemDeDup build actually runs. Both
    // argmin levels are native codegen'd kernels; the oracle replays the
    // captured two-level centroid tables (hierOracle below).
    "semantic_dedup_hier" -> ((s, d) => {
      val model = hierFit(s, d)
      hierCapture = Some((model.coarse, model.sub))
      val df = Tables(s, d).embeddings
      Similarity.semanticDedup(df.join(model.assign(df), Seq("vec_id")),
          "vec_id", "embedding", "cluster", NearDupCos)
        .orderBy("vec_id")
    }),

    // the BIG-MODEL assignment path under the same two-level fit: the
    // expression kernels carry centroids inside the plan (zero shuffle —
    // right while the model fits a task binary); with k ∝ n leaves the
    // leaf table is O(n/target) and stops fitting (~256 GB at 10^11
    // vectors). This variant assigns via DataFrame-resident centroid
    // tables — per-level equi-join on the parent node + argmin aggregate
    // (Similarity.assignViaCentroidTables) — so the model lives in
    // executors/storage, never on the driver. Same fit, same captured
    // tables, same oracle SQL as semantic_dedup_hier: only the engine's
    // evaluation strategy differs, which is exactly what the gate pins.
    "semantic_dedup_bigmodel" -> ((s, d) => {
      val model = hierFit(s, d)
      bigModelCapture = Some((model.coarse, model.sub))
      val df = Tables(s, d).embeddings
      val assigned = Similarity.assignViaCentroidTables(df, "vec_id", "embedding",
        Similarity.centroidLevelTables(s, model.coarse, Seq(model.sub)))
      Similarity.semanticDedup(df.join(assigned, Seq("vec_id")),
          "vec_id", "embedding", "cluster", NearDupCos)
        .orderBy("vec_id")
    }),

    // the HYBRID assignment between the two evaluation-strategy ends
    // above: coarse level through the broadcast expression kernel (it is
    // fanout-sized, sqrt(k) centroids — fits the envelope at any corpus
    // size), leaf level — the only one that grows with the corpus —
    // through the storage-resident centroid-table join. The per-level
    // cutover keeps kernel speed wherever the model level fits and pays
    // table residency only where it can't: the production shape for
    // 10^11-vector models (SCALE.md). Same fit, same verdicts, same
    // oracle SQL as semantic_dedup_hier/_bigmodel.
    "semantic_dedup_hybrid" -> ((s, d) => {
      val model = hierFit(s, d)
      hybridCapture = Some((model.coarse, model.sub))
      val df = Tables(s, d).embeddings
      val assigned = Similarity.assignHybrid(df, "vec_id", "embedding",
        model.coarse,
        Similarity.centroidLevelTables(s, model.coarse, Seq(model.sub)).last)
      Similarity.semanticDedup(df.join(assigned, Seq("vec_id")),
          "vec_id", "embedding", "cluster", NearDupCos)
        .orderBy("vec_id")
    }),

    // the near-dup PAIR search on the two-level quantizer's leaves: the
    // flat-auto form above still pays the n·k assignment (measured 12.6×
    // on 10× data at the sf1cr→sf10cr decade, SCALE.md) — blocking on the
    // hierarchical fit's leaves keeps the SAME leaf count/occupancy (so
    // pair volume stays linear) at n·2√k assignment dots, the shape the
    // 100 TB run uses. The flat-auto form stays registered as the
    // clustered-fixture precision variant. Oracle replays both captured
    // argmin levels + the within-leaf pair scoring (nearDupHierOracle).
    "embedding_near_dup_hier" -> ((s, d) => {
      val model = hierFit(s, d)
      nearDupHierCapture = Some((model.coarse, model.sub))
      val df = Tables(s, d).embeddings
      Similarity.cellNearDupPairs(df.join(model.assign(df), Seq("vec_id")),
          "vec_id", "embedding", "cluster", NearDupCos)
        .orderBy("id_a", "id_b")
    }),

    // the LOG-DEPTH tree quantizer under the near-dup pair search: the
    // two-level form's n·2√k assignment is itself n^1.5 once the data term
    // binds (k ∝ n keeps occupancy — and pair volume — constant, so the
    // per-vector √k grows); a depth-d tree reaches the same leaf count at
    // n·d·f dots, f = k^(1/d) — per-vector cost ~flat per decade once
    // depth tracks log n. Registered at depth 3 (the exponent step the
    // vec-decade measurement isolates); oracle replays all three captured
    // argmin levels. SCOPE: the tree quantizer blocks near-dup PAIRS only —
    // it does not front an ANN top-k index. A tree-coarse IVF-PQ pipeline
    // would change recall (deeper trees mis-route more boundary queries),
    // so any such registration must first extend the `ann_recall` gate to
    // cover it; dedup blocking is recall-tolerant by construction (a missed
    // boundary pair costs one surviving duplicate, not a wrong answer).
    "embedding_near_dup_tree" -> ((s, d) => {
      val model = treeFit(s, d)
      nearDupTreeCapture = Some((model.root, model.subLevels))
      val df = Tables(s, d).embeddings
      Similarity.cellNearDupPairs(df.join(model.assign(df), Seq("vec_id")),
          "vec_id", "embedding", "cluster", NearDupCos)
        .orderBy("id_a", "id_b")
    }),

    "cell_stats" -> ((s, d) =>
      Similarity.cellStats(Tables(s, d).embeddings, "embedding", "label")
        .orderBy("label", "dim")),

    // distributed power iteration: the ITERATIVE fit itself is oracled —
    // every iteration is exact integer/decimal arithmetic, so the DuckDB
    // side replays all 3 matvec+rescale rounds from scratch (pcaCtes) and
    // must land on the identical component, bit for bit
    "embedding_pca" -> ((s, d) =>
      Similarity.componentFrame(s, pcaFit(s, d)).orderBy("dim")),

    // the fit's distributed consumer: centered per-vector projection over
    // the SAME memoized fit — fit once, consume many (running the 3-scan
    // iteration again here would double the corpus passes per gate run)
    "pca_projection" -> ((s, d) =>
      Similarity.projectionFrame(Tables(s, d).embeddings, "vec_id",
          "embedding", pcaFit(s, d))
        .orderBy("vec_id")),

    // IVF build: deterministic integer k-means. The FIT is iterative (no
    // single-statement oracle), but it is deterministic by construction —
    // so the fitted centroids are captured here and the ASSIGNMENT is
    // oracled as nearest-centroid SQL over a VALUES table of the k×dim
    // centroid longs (kmeansOracle below). Verify dumps oracle_sql.json
    // AFTER running every query, so the capture is always populated.
    "ivf_kmeans_assign" -> ((s, d) => {
      val model = Similarity.kmeansFit(Tables(s, d).embeddings, "vec_id",
        "embedding", k = 8, iters = 3)
      fittedCentroids = Some(model.centroids)
      model.assign(Tables(s, d).embeddings).orderBy("vec_id")
    }),

    // the same brute-force top-k through the pure SQL surface: the native
    // expressions registered by GraftExtensions (dot_q / quantize_q) over
    // registered table names — proving a SQL-only user gets the identical
    // exact-integer similarity semantics
    "sql_cosine_topk" -> ((s, d) => {
      graft.engine.ViewRegistry.registerTables(Tables(s, d))
      s.sql(
        s"""WITH pn AS (
           |  SELECT vec_id, q, dot_q(q, q) AS n2
           |  FROM (SELECT vec_id, quantize_q(embedding) AS q FROM embeddings)),
           |scored AS (
           |  SELECT qv.vec_id AS query_id, cv.vec_id AS nn_id,
           |    CAST(dot_q(qv.q, cv.q) AS DOUBLE) /
           |      (sqrt(CAST(qv.n2 AS DOUBLE)) * sqrt(CAST(cv.n2 AS DOUBLE))) AS cosine
           |  FROM pn qv JOIN pn cv ON cv.vec_id <> qv.vec_id
           |  WHERE qv.vec_id < $NumQueries),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY cosine DESC, nn_id ASC) AS rn
           |  FROM scored)
           |SELECT query_id, nn_id, cosine FROM ranked WHERE rn <= $K
           |ORDER BY query_id, nn_id""".stripMargin)
    }),

    // cluster evaluation: the deterministic fit's cells scored against the
    // known label column (size / diversity / plurality purity per cell).
    // Same capture mechanism as ivf_kmeans_assign: the fitted centroids
    // republish to the oracle, which re-derives the assignment in SQL and
    // aggregates the same purity report
    "kmeans_label_purity" -> ((s, d) => {
      val t = Tables(s, d)
      val model = Similarity.kmeansFit(t.embeddings, "vec_id", "embedding",
        k = 8, iters = 3)
      purityCentroids = Some(model.centroids)
      Similarity.labelPurity(model.assign(t.embeddings),
          t.embeddings.select(col("vec_id"), col("label")), "vec_id", "label")
        .orderBy("cluster")
    }),

    // whitening/PCA prep: exact one-pass covariance moments of the
    // embedding matrix (upper triangle, d(d+1)/2 rows out)
    "embedding_covariance" -> ((s, d) =>
      Similarity.covariance(Tables(s, d).embeddings, "vec_id", "embedding")
        .orderBy("i", "j")),

    // the training-free LSH alternative to the IVF scale path: SRP sketch →
    // band-bucket join → exact re-rank; the oracle replicates the whole
    // pipeline (declared projection table included), so this is hash-exact,
    // not rows-only
    "srp_ann_topk" -> ((s, d) => {
      val t = Tables(s, d)
      Srp.annTopK(corpus(t), queriesDf(t), "vec_id", "embedding", Dim, K)
        .orderBy("query_id", "nn_id")
    }),

    // training-FREE semantic dedup: SRP band buckets replace the learned
    // cells — no k-means build at all, the scale path past the point where
    // even k ∝ n assignment (n·k dots) is too expensive
    "semantic_dedup_srp" -> ((s, d) =>
      Srp.semanticDedupSrp(Tables(s, d).embeddings, "vec_id", "embedding",
          Dim, NearDupCos)
        .orderBy("vec_id")),

    // the same pipeline at a scale-adaptive band width (bucket count
    // tracks n — the fixed 4-bit banding holds 16 buckets per band forever
    // and its spurious-collision verify cost grows quadratically; measured
    // 56 s at sf1-constrate vs ~3 s for this form). The chosen width is
    // captured for the oracle like the auto fits' centroids.
    // PINNED COMPARATOR — super-linear past ~10⁵ vectors (the single-stage
    // verify ships full vectors to every banded candidate; measured 12.8×
    // on 3.16× data at 200k→632k from pair-payload spill, SCALE.md
    // round 9): use semantic_dedup_srp_bucket for real corpora.
    "semantic_dedup_srp_auto" -> ((s, d) => {
      val (rpb, out) = Srp.semanticDedupSrpAuto(Tables(s, d).embeddings,
        "vec_id", "embedding", Dim, NearDupCos)
      srpAutoWidth = Some(rpb)
      out.orderBy("vec_id")
    }),

    // the WITHIN-BUCKET verify over the same banding — the round-10
    // production form. The candidate problem was payload, not compute:
    // instead of materializing the global pair list and joining ~0.5 KB
    // of vector onto each side of every pair (pairs x 1 KB -> spill), the
    // vectors ride the band rows (ONE shuffle of ~corpus volume) and the
    // exact cosine evaluates inside the band self-join's projection; only
    // passing pairs reach the distinct. Verdict-identical to
    // semantic_dedup_srp_auto at the same captured width (spec-pinned),
    // so the oracle is the same band + verify replay. Measured
    // 4.4/5.5/14.0 s at 200k/632k/2M -- sub-linear, the cheapest
    // TRAINING-FREE dedup at every measured point (SCALE.md round 10).
    "semantic_dedup_srp_bucket" -> ((s, d) => {
      val (rpb, out) = Srp.semanticDedupSrpBucketAuto(Tables(s, d).embeddings,
        "vec_id", "embedding", Dim, NearDupCos)
      srpBucketWidth = Some(rpb)
      out.orderBy("vec_id")
    }),

    // the training-free near-dup PAIR search: the within-bucket verify
    // emitting the passing pairs themselves -- the fit-free sibling of
    // embedding_near_dup_auto/_hier/_tree (all of which need a k-means
    // build; this needs one sketch pass). Same declared band + verify
    // semantics as the srp dedups; oracle replays band -> exact cosine
    // at the captured width and emits the scored pairs.
    "embedding_near_dup_srp" -> ((s, d) => {
      val (rpb, out) = Srp.nearDupPairsSrpAuto(Tables(s, d).embeddings,
        "vec_id", "embedding", Dim, NearDupCos)
      nearDupSrpWidth = Some(rpb)
      out.orderBy("id_a", "id_b")
    }),

    // the TWO-STAGE verify over the same banding (the round-9 fix for the
    // measured srp-auto scale negative): stage 1 prunes banded candidates
    // on the hamming distance of an independent prefilter sketch whose
    // width AND tau derive from the verify threshold (Srp.preLongsFor /
    // Srp.hammingTauFor at NearDupCos: 21 longs, tau 591 -- <1e-5
    // true-pair loss AT the threshold; a fixed 2-long/tau-42 sketch sized
    // for cos 0.85 would silently prune true pairs in the 0.35-0.6 band),
    // stage 2 ships the full quantized vectors to SURVIVORS only.
    // REGIME-LIMITED COMPARATOR (SCALE.md round 10): the prune only bites
    // when bucket-mate cosine mass sits below tau's implied cosine (the
    // SemDeDup/high-dim regime); on the d=64 fixtures at 632k+ most
    // candidates survive and stage 2 pays the pair payload anyway (83 s
    // at 632k) -- use semantic_dedup_srp_bucket for real corpora.
    // Oracle replays sketch -> band -> hamming -> exact verify.
    "semantic_dedup_srp_pre" -> ((s, d) => {
      val (rpb, out) = Srp.semanticDedupSrpPrefilter(Tables(s, d).embeddings,
        "vec_id", "embedding", Dim, NearDupCos)
      srpPreWidth = Some(rpb)
      out.orderBy("vec_id")
    }),

    // product quantization (Jégou et al., TPAMI 2011): M per-subspace
    // codebooks fitted by grouped Lloyd, each vector stored as an M-int
    // code word. The codes table IS the 100 TB artifact — a 64-dim float
    // embedding collapses to 8 ints, so every downstream ADC sweep reads
    // ~32× less data. Oracle replays the captured codebooks' per-subspace
    // argmin (list_slice + dense codebook VALUES) exactly.
    // Gate-boundary convention (same as v_location_preferences): the code
    // word leaves the engine as a canonical comma-joined string — the
    // driver's pandas hash harness cannot sort raw array cells. The
    // array-typed API stays spec-tested (PipelineOpsSpec).
    "pq_codes" -> ((s, d) => {
      val model = pqFit(s, d)
      pqCapture = Some(model.codebooks)
      model.encode(Tables(s, d).embeddings)
        .select(col("vec_id"),
          array_join(col("codes").cast("array<string>"), ",").as("codes"))
        .orderBy("vec_id")
    }),

    // ADC top-k over the code words: the corpus scan reads ONLY the codes
    // column (never the embedding), queries stay full-precision — exact
    // integer distances to each neighbor's RECONSTRUCTION, so the ranking
    // is deterministic and the oracle replays it bit-exactly. Recall vs
    // the exact scan is LlmSpec-style spec territory (PipelineOpsSpec).
    "pq_topk" -> ((s, d) => {
      val model = pqFit(s, d)
      pqCapture = Some(model.codebooks)
      val t = Tables(s, d)
      Similarity.pqTopK(model.encode(t.embeddings), queriesDf(t), "vec_id",
          "embedding", model, K)
        .orderBy("query_id", "nn_id")
    }),

    // exact squared-L2 top-k: the ANN ground truth the compressed-domain
    // rankings are judged against (integer-exact, statically oracled)
    "l2_topk" -> ((s, d) => {
      val t = Tables(s, d)
      Similarity.l2TopK(corpus(t), queriesDf(t), "vec_id", "embedding", K)
        .orderBy("query_id", "nn_id")
    }),

    // the index-eval operator: recall@K of BOTH compressed-domain rankings
    // (flat PQ and IVF-PQ) against the exact-L2 ground truth, zero-hit
    // queries preserved — the accept/reject gate a production ANN build
    // runs before swapping an index in. The oracle replays all three
    // pipelines side by side in one statement.
    "ann_recall" -> ((s, d) => {
      val t = Tables(s, d)
      val pqModel = pqFit(s, d)
      pqCapture = Some(pqModel.codebooks)
      val ivf = ivfPqFit(s, d)
      ivfPqCapture = Some((ivf.hier.coarse, ivf.hier.sub, ivf.pq.codebooks))
      val tree = treeIvfPqFit(s, d)
      treeIvfPqCapture = Some((tree.tree.root, tree.tree.subLevels, tree.pq.codebooks))
      // the exact ranking feeds all three recall arms, each of which reads
      // it twice (hit join + query-list distinct) — unpinned, the
      // broadcast-query × corpus L2 sweep re-executed SIX times per run
      // (round-13; guide §5 reuse). The frame is NumQueries·K rows — tiny.
      val exact = Similarity.l2TopK(corpus(t), queriesDf(t), "vec_id", "embedding", K)
        .localCheckpoint(false)
      val pqR = Similarity.recallAtK(
        Similarity.pqTopK(pqModel.encode(corpus(t)), queriesDf(t), "vec_id",
          "embedding", pqModel, K), exact)
        .select(lit("pq").as("method"), col("query_id"), col("n_hits"))
      val ivfR = Similarity.recallAtK(
        ivf.topK(ivf.encode(corpus(t)), queriesDf(t), IvfPqProbes, K), exact)
        .select(lit("ivfpq").as("method"), col("query_id"), col("n_hits"))
      // the tree-coarse pipeline is recall-GATED here (BACKLOG contract:
      // no tree-coarse ANN registration without its recall measured next
      // to the two-level form's — deeper trees mis-route more boundary
      // corpus vectors; the serving tail is identical)
      val treeR = Similarity.recallAtK(
        tree.topK(tree.encode(corpus(t)), queriesDf(t), IvfPqProbes, K), exact)
        .select(lit("tivfpq").as("method"), col("query_id"), col("n_hits"))
      pqR.unionAll(ivfR).unionAll(treeR).orderBy("method", "query_id")
    }),

    // the full faiss serving shape (with the inverted-multi-index twist):
    // the TWO-LEVEL hierarchical quantizer is the coarse quantizer — the
    // flat k ∝ n coarse assignment measured 38× on 10× data at the
    // sf1→sf10 decade because encode pays n·k dots; two-level pays n·2√k
    // for the same leaf count. PQ codebooks are fitted on the RESIDUALS
    // q − c[leaf]; stored artifact = (leaf, M-int code word); a probe-2
    // query touches two leaves' code lists and scores them in the
    // compressed domain — cell pruning × ~32× less bytes per scored row.
    // The oracle replays the two-level argmin, per-subspace residual
    // encoding, leaf-ranked probe selection, and ADC — all exact integers.
    "ivfpq_topk" -> ((s, d) => {
      val model = ivfPqFit(s, d)
      ivfPqCapture = Some((model.hier.coarse, model.hier.sub, model.pq.codebooks))
      val t = Tables(s, d)
      model.topK(model.encode(corpus(t)), queriesDf(t), IvfPqProbes, K)
        .orderBy("query_id", "nn_id")
    }),

    // the LOG-DEPTH coarse quantizer under the full serving shape: same
    // residual-PQ + ADC tail as ivfpq_topk, but corpus-side leaf routing
    // descends the depth-3 tree (n·d·f dots, the only coarse shape still
    // usable once √k is itself large — see TreeKMeansModel). Registered
    // TOGETHER with its recall gate: ann_recall scores this pipeline
    // against exact-L2 next to flat PQ and two-level IVF-PQ, closing the
    // round-9 BACKLOG condition for fronting an ANN index with the tree.
    "tree_ivfpq_topk" -> ((s, d) => {
      val model = treeIvfPqFit(s, d)
      treeIvfPqCapture = Some((model.tree.root, model.tree.subLevels, model.pq.codebooks))
      val t = Tables(s, d)
      model.topK(model.encode(corpus(t)), queriesDf(t), IvfPqProbes, K)
        .orderBy("query_id", "nn_id")
    }),

    // the index's INGEST path: embeddings arrive through a real
    // checkpointed file-source stream and the stored (leaf, code word)
    // artifact is computed in-flight — encode is stateless per-row once
    // the fit exists, which is exactly why an index build separates fit
    // (batch control plane) from encode (stream data plane). Oracled
    // against the same replayed index as the batch encode.
    "stream_ivfpq_encode" -> ((s, d) => {
      val model = ivfPqFit(s, d)
      ivfPqCapture = Some((model.hier.coarse, model.hier.sub, model.pq.codebooks))
      graft.streaming.StreamingCatalog.replayIvfPqEncode(s, d, model)
    }),

    // the SERVING half of the ingest path: encoded rows are merged per
    // micro-batch into a versioned snapshot under the durable `_LATEST`
    // contract (Cdc.mergeNewest keyed on vec_id — idempotent under
    // at-least-once re-delivery), so the ANN index is a stream-maintained
    // artifact a reader can pin a consistent version of. Must equal the
    // batch rebuild — same oracle chain as stream_ivfpq_encode.
    "stream_ivfpq_index" -> ((s, d) => {
      val model = ivfPqFit(s, d)
      ivfPqIndexCapture = Some((model.hier.coarse, model.hier.sub, model.pq.codebooks))
      graft.streaming.StreamingCatalog.replayIvfPqIndex(s, d, model)
    }),

    // multi-probe IVF at full probe width: probing every cell must
    // reproduce the brute-force result EXACTLY, so the entire fit →
    // assignTop → replicate → cell-join → dedup machinery is oracled by
    // the same SQL as cosine_topk (partial-probe recall is LlmSpec-tested)
    "ivf_multiprobe_topk" -> ((s, d) => {
      val t = Tables(s, d)
      Similarity.ivfTopKMultiProbe(corpus(t), queriesDf(t), "vec_id", "embedding",
          K, cells = 8, probes = 8, iters = 2)
        .orderBy("query_id", "nn_id")
    }),
  )

  /** Centroids of the last `ivf_kmeans_assign` fit in this JVM — the
    * deterministic fit output, republished to the oracle side.
    */
  @volatile private var fittedCentroids: Option[Seq[(Int, Seq[Long])]] = None

  /** Centroids of the last `semantic_dedup_auto` fit (captured separately
    * so each capture-oracled query stands alone under a subset run).
    */
  @volatile private var autoCentroids: Option[Seq[(Int, Seq[Long])]] = None

  /** Centroids of the last `embedding_near_dup_auto` fit (separate capture,
    * same subset-run independence; the underlying fit is shared via
    * [[autoFit]]).
    */
  @volatile private var nearDupAutoCentroids: Option[Seq[(Int, Seq[Long])]] = None

  /** Captured band width of the last `semantic_dedup_srp_auto` run (rows
    * per band) — the oracle replays the identical banding at this width.
    */
  @volatile private var srpAutoWidth: Option[Int] = None

  /** Captured band width of the last `semantic_dedup_srp_bucket` run —
    * verdict-identical to the srp-auto pipeline at the same width, so the
    * oracle is the same band + verify replay at this capture.
    */
  @volatile private var srpBucketWidth: Option[Int] = None

  /** Captured band width of the last `embedding_near_dup_srp` run — the
    * oracle replays band → exact cosine at this width and emits the
    * scored pairs.
    */
  @volatile private var nearDupSrpWidth: Option[Int] = None

  /** Captured band width of the last `semantic_dedup_srp_pre` run — the
    * oracle replays banding AND the hamming prefilter at this width
    * (prefilter width and τ are pure functions of the verify threshold:
    * [[Srp.preLongsFor]] / [[Srp.hammingTauFor]] at [[NearDupCos]]).
    */
  @volatile private var srpPreWidth: Option[Int] = None

  /** Once-per-(JVM, sfDir) memo of the scale-adaptive k ∝ n k-means fit
    * consumed by `semantic_dedup_auto` and `embedding_near_dup_auto` —
    * fit once, consume many (bench repetitions measure the consumers).
    */
  private val autoFits =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.KMeansModel]
  private def autoFit(s: SparkSession, d: String): Similarity.KMeansModel =
    autoFits.getOrElseUpdate(d, {
      val df = Tables(s, d).embeddings
      Similarity.kmeansFit(df, "vec_id", "embedding",
        Similarity.cellCountFor(df.count(), 64L), iters = 3)
    })

  /** Captured two-level centroids of the last `semantic_dedup_hier` fit —
    * both argmin levels replay in the oracle (hierOracle).
    */
  @volatile private var hierCapture:
    Option[(Seq[(Int, Seq[Long])], Seq[(Int, Int, Seq[Long])])] = None

  /** Captured two-level centroids of the last `embedding_near_dup_hier`
    * run (separate capture, same subset-run independence; the underlying
    * fit is shared via [[hierFit]]).
    */
  @volatile private var nearDupHierCapture:
    Option[(Seq[(Int, Seq[Long])], Seq[(Int, Int, Seq[Long])])] = None

  /** Captured two-level centroids of the last `semantic_dedup_bigmodel`
    * run (separate capture, same subset-run independence; fit shared via
    * [[hierFit]] — the big-model query differs only in the ASSIGNMENT
    * path, so its oracle is byte-identical to the hier one).
    */
  @volatile private var bigModelCapture:
    Option[(Seq[(Int, Seq[Long])], Seq[(Int, Int, Seq[Long])])] = None

  /** Captured two-level centroids of the last `semantic_dedup_hybrid`
    * run (kernel coarse + table leaf; verdicts identical to hier/bigmodel,
    * so the oracle is the same hierDedupSql replay).
    */
  @volatile private var hybridCapture:
    Option[(Seq[(Int, Seq[Long])], Seq[(Int, Int, Seq[Long])])] = None

  /** Once-per-(JVM, sfDir) memo of the hierarchical fit (same
    * fit-once/consume-many shape as [[autoFit]] — bench repetitions
    * measure assignment + dedup, not a re-fit).
    */
  private val hierFits =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.HierKMeansModel]
  private def hierFit(s: SparkSession, d: String): Similarity.HierKMeansModel =
    hierFits.getOrElseUpdate(d,
      Similarity.hierarchicalFit(Tables(s, d).embeddings, "vec_id", "embedding",
        targetCellSize = 64L, iters = 3))

  /** Captured level tables of the last `embedding_near_dup_tree` run —
    * the oracle replays every argmin level (treeOracle).
    */
  @volatile private var nearDupTreeCapture:
    Option[(Seq[(Int, Seq[Long])], Seq[Seq[(Int, Int, Seq[Long])]])] = None

  /** Once-per-(JVM, sfDir) memo of the depth-3 tree fit (same
    * fit-once/consume-many shape as [[hierFit]]).
    */
  private val treeFits =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.TreeKMeansModel]
  private def treeFit(s: SparkSession, d: String): Similarity.TreeKMeansModel =
    treeFits.getOrElseUpdate(d,
      Similarity.treeFit(Tables(s, d).embeddings, "vec_id", "embedding",
        targetCellSize = 64L, depth = 3, iters = 3))

  /** Captured codebooks of the last PQ fit — the pq_codes/pq_topk oracles
    * replay the per-subspace argmin and ADC scoring from them.
    */
  @volatile private var pqCapture: Option[Seq[(Int, Int, Seq[Long])]] = None

  /** Once-per-(JVM, sfDir) memo of the PQ fit (same fit-once/consume-many
    * shape as [[autoFit]] — bench repetitions measure encode + ADC sweep,
    * not a re-fit). Only the MODEL is memoized: a checkpointed codes frame
    * would not survive the gate harness's between-query unpersist hygiene,
    * and encode is one narrow pass.
    */
  private val pqFits =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.PqModel]
  private def pqFit(s: SparkSession, d: String): Similarity.PqModel =
    pqFits.getOrElseUpdate(d,
      Similarity.pqFit(Tables(s, d).embeddings, "vec_id", "embedding",
        m = PqM, ks = PqKs, iters = 3))

  /** Captured (coarse centroids, leaf sub-table, residual codebooks) of
    * the last IVF-PQ fit — the ivfpq_topk oracle replays the whole index
    * from them.
    */
  @volatile private var ivfPqCapture:
    Option[(Seq[(Int, Seq[Long])], Seq[(Int, Int, Seq[Long])],
            Seq[(Int, Int, Seq[Long])])] = None

  /** Captured index of the last `stream_ivfpq_index` run (separate capture
    * so the query stands alone under a subset run; the fit is shared via
    * [[ivfPqFit]]).
    */
  @volatile private var ivfPqIndexCapture:
    Option[(Seq[(Int, Seq[Long])], Seq[(Int, Int, Seq[Long])],
            Seq[(Int, Int, Seq[Long])])] = None

  /** Once-per-(JVM, sfDir) memo of the IVF-PQ fit (model only — same
    * hygiene rationale as [[pqFit]]). The leaf count is scale-adaptive
    * (k ∝ n at constant target occupancy) but the coarse quantizer is the
    * TWO-LEVEL hierarchy, so corpus-side assignment stays n·2√k dots.
    */
  private val ivfPqFits =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfPqModel]
  private def ivfPqFit(s: SparkSession, d: String): Similarity.IvfPqModel =
    ivfPqFits.getOrElseUpdate(d,
      Similarity.ivfPqFit(Tables(s, d).embeddings, "vec_id", "embedding",
        targetCellSize = 64L, m = PqM, ks = PqKs, iters = 3))

  /** Captured (root, level tables, residual codebooks) of the last
    * tree-coarse IVF-PQ fit — the tree_ivfpq_topk / ann_recall oracles
    * replay the depth-d argmin chain + residual ADC from them.
    */
  @volatile private var treeIvfPqCapture:
    Option[(Seq[(Int, Seq[Long])], Seq[Seq[(Int, Int, Seq[Long])]],
            Seq[(Int, Int, Seq[Long])])] = None

  /** Once-per-(JVM, sfDir) memo of the tree-coarse IVF-PQ fit (model only
    * — same hygiene rationale as [[pqFit]]). Same depth-3 shape as
    * [[treeFit]]: corpus-side assignment is n·d·f dots.
    */
  private val treeIvfPqFits =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.TreeIvfPqModel]
  private def treeIvfPqFit(s: SparkSession, d: String): Similarity.TreeIvfPqModel =
    treeIvfPqFits.getOrElseUpdate(d,
      Similarity.treeIvfPqFit(Tables(s, d).embeddings, "vec_id", "embedding",
        targetCellSize = 64L, depth = 3, m = PqM, ks = PqKs, iters = 3))

  /** Centroids of the last `kmeans_label_purity` fit (captured separately so
    * either query oracles independently under a subset run).
    */
  @volatile private var purityCentroids: Option[Seq[(Int, Seq[Long])]] = None

  /** Assignment CTE chain over a captured centroid set, ending in
    * `a(vec_id, cluster)` — shared by the kmeans-assign and purity oracles.
    */
  private def assignCtes(cs: Seq[(Int, Seq[Long])]): String = {
    val values = cs.map { case (cid, cq) =>
      s"($cid, CAST([${cq.mkString(", ")}] AS BIGINT[]))"
    }.mkString(",\n    ")
    s"""$prepSql,
       |c(cid, cq) AS (VALUES
       |    $values),
       |cn AS (SELECT cid, cq,
       |    CAST((SELECT sum(x * x) FROM (SELECT unnest(cq) AS x)) AS BIGINT) AS cn2
       |  FROM c),
       |scored AS (
       |  SELECT pn.vec_id, cn.cid,
       |    pn.n2 - 2 * (SELECT CAST(sum(x * y) AS BIGINT)
       |                 FROM (SELECT unnest(pn.q) AS x, unnest(cn.cq) AS y))
       |      + cn.cn2 AS dist
       |  FROM pn CROSS JOIN cn),
       |a AS (
       |  SELECT vec_id, cid AS cluster FROM scored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |    ORDER BY dist ASC, cid ASC) = 1)""".stripMargin
  }

  /** Purity oracle over the captured purity-fit centroids: re-derive the
    * assignment, then the same (cluster, label) count → plurality-top →
    * totals report with identical tie-breaks and division order.
    */
  private def purityOracle: Option[(String, String)] = purityCentroids.map { cs =>
    "kmeans_label_purity" ->
      s"""WITH ${assignCtes(cs)},
         |counts AS (
         |  SELECT a.cluster, e.label, count(*) AS n_label
         |  FROM a JOIN embeddings e USING (vec_id)
         |  GROUP BY a.cluster, e.label),
         |top AS (
         |  SELECT cluster, label AS top_label, n_label AS top_n FROM counts
         |  QUALIFY row_number() OVER (PARTITION BY cluster
         |    ORDER BY n_label DESC, label ASC) = 1),
         |tot AS (
         |  SELECT cluster, CAST(sum(n_label) AS BIGINT) AS n_vecs,
         |    count(*) AS n_labels
         |  FROM counts GROUP BY cluster)
         |SELECT cluster, n_vecs, n_labels, top_label, top_n,
         |  CAST(top_n AS DOUBLE) / n_vecs AS purity
         |FROM tot JOIN top USING (cluster)
         |ORDER BY cluster""".stripMargin
  }

  /** Nearest-centroid assignment oracle over the captured centroid table:
    * same exact-integer distance (n2 - 2·dot + cn2), same lower-cid
    * tie-break as [[Similarity.KMeansModel.assign]]. Present only once the
    * assign query has fitted (absent → the driver's rows-only fallback,
    * exactly the pre-capture behavior).
    */
  private def kmeansOracle: Option[(String, String)] = fittedCentroids.map { cs =>
    "ivf_kmeans_assign" ->
      s"""WITH ${assignCtes(cs)}
         |SELECT vec_id, cluster FROM a
         |ORDER BY vec_id""".stripMargin
  }

  /** semantic_dedup_auto oracle: replay the captured-centroid assignment,
    * then the same within-cell pair scoring / min-id dup collapse as the
    * `semantic_dedup` oracle, blocked on the fitted cluster instead of the
    * fixture label.
    */
  private def semanticAutoOracle: Option[(String, String)] = autoCentroids.map { cs =>
    "semantic_dedup_auto" ->
      s"""WITH ${assignCtes(cs)},
         |pc AS (SELECT pn.vec_id, pn.q, pn.n2, a.cluster FROM pn JOIN a USING (vec_id)),
         |sd_scored AS (
         |  SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.n2 AS na, y.n2 AS nb,
         |    (SELECT CAST(sum(xx * yy) AS BIGINT)
         |     FROM (SELECT unnest(x.q) AS xx, unnest(y.q) AS yy)) AS dot
         |  FROM pc x JOIN pc y ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
         |sd_dup AS (
         |  SELECT id_b AS vec_id, min(id_a) AS dup_of FROM sd_scored
         |  WHERE CAST(dot AS DOUBLE) /
         |    (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= $NearDupCos
         |  GROUP BY id_b)
         |SELECT pc.vec_id, pc.cluster, d.dup_of, d.dup_of IS NULL AS is_kept
         |FROM pc LEFT JOIN sd_dup d USING (vec_id)
         |ORDER BY pc.vec_id""".stripMargin
  }

  /** embedding_near_dup_auto oracle: replay the captured-centroid
    * assignment, then the same within-cell pair scoring as the
    * `embedding_near_dup` oracle, blocked on the fitted cluster instead of
    * the fixture label.
    */
  private def nearDupAutoOracle: Option[(String, String)] = nearDupAutoCentroids.map { cs =>
    "embedding_near_dup_auto" ->
      s"""WITH ${assignCtes(cs)},
         |pc AS (SELECT pn.vec_id, pn.q, pn.n2, a.cluster FROM pn JOIN a USING (vec_id)),
         |nd_scored AS (
         |  SELECT x.cluster, x.vec_id AS id_a, y.vec_id AS id_b, x.n2 AS na, y.n2 AS nb,
         |    (SELECT CAST(sum(xx * yy) AS BIGINT)
         |     FROM (SELECT unnest(x.q) AS xx, unnest(y.q) AS yy)) AS dot
         |  FROM pc x JOIN pc y ON x.cluster = y.cluster AND x.vec_id < y.vec_id)
         |SELECT cluster, id_a, id_b,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine
         |FROM nd_scored
         |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= $NearDupCos
         |ORDER BY id_a, id_b""".stripMargin
  }

  val PcaIters = 3
  val PcaScale = 10000L

  /** Once-per-(JVM, sfDir) memo of the power-iteration fit — the
    * embedding_pca and pca_projection gate queries consume ONE fit, the
    * production fit-once/consume-many shape (and bench repetitions
    * measure the consumers, not a re-fit, mirroring FixtureDirs).
    */
  private val pcaFits =
    scala.collection.concurrent.TrieMap.empty[String, (Seq[BigInt], Seq[BigInt], Long)]
  private def pcaFit(s: SparkSession, d: String): (Seq[BigInt], Seq[BigInt], Long) =
    pcaFits.getOrElseUpdate(d, Similarity.powerIterationInts(
      Tables(s, d).embeddings, "vec_id", "embedding", PcaIters, PcaScale))

  /** Full DuckDB replay of [[Similarity.powerIterationInts]]: the
    * unrolled iteration chain ending in `pv{PcaIters}(dim, v)` (the integer
    * component), `pn2(n2)` (its squared norm), plus `pcnt(n)`, `pds(dim,
    * s)`, `psv{k}` — every stage MATERIALIZED because the chain is
    * self-referential (v_k reads v_{k-1}); inlined CTEs would re-derive
    * the whole prefix per reference and blow up exponentially (measured:
    * the 3-round chain stops completing). Arithmetic mirror notes:
    * HUGEINT `//` truncates toward zero exactly like the Scala side's
    * BigInt `/`, and every sum is HUGEINT-exact.
    */
  private def pcaCtes: String = {
    val iters = (1 to PcaIters).map { k =>
      val pv = s"pv${k - 1}"
      s"""pl$k AS MATERIALIZED (SELECT list(v ORDER BY dim) AS lv FROM $pv),
         |psv$k AS MATERIALIZED (SELECT CAST(sum(pds.s * $pv.v) AS HUGEINT) AS sdotv
         |  FROM pds JOIN $pv USING (dim)),
         |pdot$k AS MATERIALIZED (SELECT pp.vec_id, pp.q,
         |  (SELECT n FROM pcnt) * (SELECT CAST(sum(x * y) AS HUGEINT)
         |     FROM (SELECT unnest(pp.q) AS x, unnest((SELECT lv FROM pl$k)) AS y))
         |  - (SELECT sdotv FROM psv$k) AS dt FROM pp),
         |pagg$k AS MATERIALIZED (SELECT dim, CAST(sum(CAST(x AS HUGEINT) * dt) AS HUGEINT) AS a FROM
         |  (SELECT dt, unnest(q) AS x, CAST(unnest(range(0, len(q))) AS INTEGER) AS dim FROM pdot$k)
         |  GROUP BY dim),
         |pdd$k AS MATERIALIZED (SELECT CAST(sum(dt) AS HUGEINT) AS dsum FROM pdot$k),
         |pw$k AS MATERIALIZED (SELECT pagg$k.dim,
         |  (SELECT n FROM pcnt) * pagg$k.a - pds.s * (SELECT dsum FROM pdd$k) AS w
         |  FROM pagg$k JOIN pds USING (dim)),
         |pm$k AS MATERIALIZED (SELECT max(abs(w)) AS m FROM pw$k),
         |pv$k AS MATERIALIZED (SELECT dim, (w * $PcaScale) // (SELECT m FROM pm$k) AS v FROM pw$k)""".stripMargin
    }.mkString(",\n")
    s"""pp AS MATERIALIZED (SELECT vec_id,
       |  list_transform(embedding, x ->
       |    CAST(floor(CAST(x AS DOUBLE) * ${Similarity.QScale}.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |pcnt AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS n FROM pp),
       |pds AS MATERIALIZED (SELECT dim, CAST(sum(x) AS HUGEINT) AS s FROM
       |  (SELECT unnest(q) AS x, CAST(unnest(range(0, len(q))) AS INTEGER) AS dim FROM pp)
       |  GROUP BY dim),
       |pv0 AS MATERIALIZED (SELECT dim, CAST(1 AS HUGEINT) AS v
       |  FROM (SELECT CAST(unnest(range(0, $Dim)) AS INTEGER) AS dim)),
       |$iters,
       |pn2 AS MATERIALIZED (SELECT CAST(sum(v * v) AS HUGEINT) AS n2 FROM pv$PcaIters)""".stripMargin
  }

  /** Quantized vectors + exact integer norms (oracle side; shared with the
    * embedding-contamination oracle in [[CorpusCatalog]]).
    */
  private[llm] val prepSql =
    s"""p AS (SELECT vec_id, label,
       |  list_transform(embedding, x ->
       |    CAST(floor(CAST(x AS DOUBLE) * ${Similarity.QScale}.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |n AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS n2
       |  FROM (SELECT vec_id, unnest(q) AS x FROM p) GROUP BY vec_id),
       |pn AS (SELECT p.vec_id, p.label, p.q, n.n2 FROM p JOIN n USING (vec_id))""".stripMargin

  /** SRP sketch + banding CTE chain in DuckDB (mirror of [[Srp.sketches]] /
    * [[Srp.bandRows]]): the declared projection table as VALUES, the same
    * exact-integer sign sums, the same (band, 4-bit value) bucket keys.
    */
  /** The sketch → band CTE prefix (`proj, ex, sm, sk, bands`), shared by
    * the ANN and SRP-dedup oracles — exact mirror of [[Srp.sketches]] /
    * [[Srp.bandRows]].
    */
  private def srpSketchCtes: String = srpSketchCtesWidth(Srp.RowsPerBand)

  private[llm] def srpSketchCtesWidth(rowsPerBand: Int): String = {
    val nBits = Srp.Bands * rowsPerBand
    val projCols = (0 until nBits).map(j => s"s_$j").mkString(", ")
    val projValues = Srp.signs(Dim, nBits)
      .map { case (d, ss) => s"($d, ${ss.mkString(", ")})" }
      .mkString(",\n    ")
    val sums = (0 until nBits)
      .map(j => s"CAST(sum(x * s_$j) AS BIGINT) AS p_$j").mkString(",\n    ")
    val prefix =
      s"""proj(dim, $projCols) AS (VALUES
         |    $projValues),
         |ex AS (SELECT vec_id, unnest(q) AS x,
         |    CAST(unnest(range(0, len(q))) AS INTEGER) AS dim FROM pn),
         |sm AS (SELECT vec_id,
         |    $sums
         |  FROM ex JOIN proj USING (dim) GROUP BY vec_id)""".stripMargin
    if (rowsPerBand <= 15) {
      // packed layout: all four bands in one sketch long (Srp.sketches /
      // Srp.bandRows)
      val bits = (0 until nBits)
        .map(j => s"(CASE WHEN p_$j > 0 THEN (CAST(1 AS BIGINT) << $j) ELSE CAST(0 AS BIGINT) END)")
        .mkString(" + ")
      s"""$prefix,
         |sk AS (SELECT vec_id, $bits AS sketch FROM sm),
         |bands AS (SELECT vec_id, b,
         |    (sketch >> (CAST(b AS INTEGER) * $rowsPerBand))
         |      & ${(1L << rowsPerBand) - 1} AS bv
         |  FROM sk CROSS JOIN (SELECT unnest(range(0, ${Srp.Bands})) AS b))""".stripMargin
    } else {
      // uncapped layout: one long per band over the SAME hyperplane family
      // j = b·rowsPerBand + i (Srp.bandedRowsWide) — bit-identical band
      // values wherever both layouts are defined
      val bandVals = (0 until Srp.Bands).map { b =>
        (0 until rowsPerBand)
          .map(i => s"(CASE WHEN p_${b * rowsPerBand + i} > 0 " +
            s"THEN (CAST(1 AS BIGINT) << $i) ELSE CAST(0 AS BIGINT) END)")
          .mkString(" + ") + s" AS bv_$b"
      }.mkString(",\n    ")
      val union = (0 until Srp.Bands)
        .map(b => s"SELECT vec_id, $b AS b, bv_$b AS bv FROM sk")
        .mkString("\n  UNION ALL ")
      s"""$prefix,
         |sk AS (SELECT vec_id,
         |    $bandVals
         |  FROM sm),
         |bands AS (
         |  $union)""".stripMargin
    }
  }

  /** semantic_dedup_hier oracle: replay BOTH captured argmin levels —
    * coarse assignment via the shared assignCtes chain (ending in
    * `a(vec_id, cluster)` = the coarse cell), then the sub-cell argmin
    * scoped to each row's coarse cell (`scn.coarse = a.cluster`), with
    * the same exact-integer comparison key and lower-cid tie-break as
    * [[graft.functions.NearestSubCellQ]] — then the standard within-cell
    * pair scoring / min-id dup collapse blocked on the LEAF cell.
    */
  /** The two-level leaf-assignment CTE chain shared by the hier dedup and
    * hier near-dup-pair oracles: coarse argmin (assignCtes → `a`), then
    * the sub-cell argmin scoped to the row's coarse cell — ends in
    * `pc(vec_id, q, n2, cluster)` where cluster is the LEAF cell.
    */
  private def hierAssignCtes(coarse: Seq[(Int, Seq[Long])],
                             sub: Seq[(Int, Int, Seq[Long])]): String = {
    val subValues = sub.map { case (c, cid, cq) =>
      s"($c, $cid, CAST([${cq.mkString(", ")}] AS BIGINT[]))"
    }.mkString(",\n    ")
    s"""${assignCtes(coarse)},
       |sc(coarse, cid, cq) AS (VALUES
       |    $subValues),
       |scn AS (SELECT coarse, cid, cq,
       |    CAST((SELECT sum(x * x) FROM (SELECT unnest(cq) AS x)) AS BIGINT) AS cn2
       |  FROM sc),
       |sub_scored AS (
       |  SELECT pn.vec_id, scn.cid,
       |    pn.n2 - 2 * (SELECT CAST(sum(x * y) AS BIGINT)
       |                 FROM (SELECT unnest(pn.q) AS x, unnest(scn.cq) AS y))
       |      + scn.cn2 AS dist
       |  FROM pn JOIN a ON a.vec_id = pn.vec_id
       |  JOIN scn ON scn.coarse = a.cluster),
       |h AS (
       |  SELECT vec_id, cid AS cluster FROM sub_scored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |    ORDER BY dist ASC, cid ASC) = 1),
       |pc AS (SELECT pn.vec_id, pn.q, pn.n2, h.cluster FROM pn JOIN h USING (vec_id))""".stripMargin
  }

  /** The hier-dedup oracle SQL body, shared verbatim by the expression-path
    * query (`semantic_dedup_hier`) and the big-model table-path query
    * (`semantic_dedup_bigmodel`): the two queries differ ONLY in how the
    * engine evaluates the argmin (native kernel vs join+aggregate), so
    * the truth — replay of the captured centroid tables — is the same SQL.
    */
  private def hierDedupSql(coarse: Seq[(Int, Seq[Long])],
                           sub: Seq[(Int, Int, Seq[Long])]): String =
    s"""WITH ${hierAssignCtes(coarse, sub)},
       |sd_scored AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.n2 AS na, y.n2 AS nb,
       |    (SELECT CAST(sum(xx * yy) AS BIGINT)
       |     FROM (SELECT unnest(x.q) AS xx, unnest(y.q) AS yy)) AS dot
       |  FROM pc x JOIN pc y ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
       |sd_dup AS (
       |  SELECT id_b AS vec_id, min(id_a) AS dup_of FROM sd_scored
       |  WHERE CAST(dot AS DOUBLE) /
       |    (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= $NearDupCos
       |  GROUP BY id_b)
       |SELECT pc.vec_id, pc.cluster, d.dup_of, d.dup_of IS NULL AS is_kept
       |FROM pc LEFT JOIN sd_dup d USING (vec_id)
       |ORDER BY pc.vec_id""".stripMargin

  private def bigModelOracle: Option[(String, String)] =
    bigModelCapture.map { case (coarse, sub) =>
      "semantic_dedup_bigmodel" -> hierDedupSql(coarse, sub)
    }

  private def hybridOracle: Option[(String, String)] =
    hybridCapture.map { case (coarse, sub) =>
      "semantic_dedup_hybrid" -> hierDedupSql(coarse, sub)
    }

  private def hierOracle: Option[(String, String)] = hierCapture.map { case (coarse, sub) =>
    "semantic_dedup_hier" -> hierDedupSql(coarse, sub)
  }

  /** embedding_near_dup_hier oracle: the shared two-level leaf assignment
    * chain, then the same within-cell pair scoring as the
    * `embedding_near_dup_auto` oracle, blocked on the LEAF cell.
    */
  private def nearDupHierOracle: Option[(String, String)] =
    nearDupHierCapture.map { case (coarse, sub) =>
      "embedding_near_dup_hier" ->
        s"""WITH ${hierAssignCtes(coarse, sub)},
           |nd_scored AS (
           |  SELECT x.cluster, x.vec_id AS id_a, y.vec_id AS id_b, x.n2 AS na, y.n2 AS nb,
           |    (SELECT CAST(sum(xx * yy) AS BIGINT)
           |     FROM (SELECT unnest(x.q) AS xx, unnest(y.q) AS yy)) AS dot
           |  FROM pc x JOIN pc y ON x.cluster = y.cluster AND x.vec_id < y.vec_id)
           |SELECT cluster, id_a, id_b,
           |  CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine
           |FROM nd_scored
           |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= $NearDupCos
           |ORDER BY id_a, id_b""".stripMargin
    }

  /** Depth-d leaf-assignment CTE chain: the [[hierAssignCtes]] recipe
    * applied per captured level — root argmin via assignCtes (`a`), then
    * each level's argmin scoped to the previous level's node, identical
    * comparison key and lower-cid tie-break as
    * [[graft.functions.NearestSubCellQ]]. Ends in
    * `pc(vec_id, q, n2, cluster)` with cluster = the LEAF.
    */
  private def treeAssignCtes(root: Seq[(Int, Seq[Long])],
                             subLevels: Seq[Seq[(Int, Int, Seq[Long])]]): String = {
    val chain = new StringBuilder(assignCtes(root))
    var prev = "a"
    subLevels.zipWithIndex.foreach { case (sub, i) =>
      val l = i + 2 // level number, root = 1
      val values = sub.map { case (c, cid, cq) =>
        s"($c, $cid, CAST([${cq.mkString(", ")}] AS BIGINT[]))"
      }.mkString(",\n    ")
      chain.append(s""",
        |sc$l(parent, cid, cq) AS (VALUES
        |    $values),
        |scn$l AS (SELECT parent, cid, cq,
        |    CAST((SELECT sum(x * x) FROM (SELECT unnest(cq) AS x)) AS BIGINT) AS cn2
        |  FROM sc$l),
        |ss$l AS (
        |  SELECT pn.vec_id, scn$l.cid,
        |    pn.n2 - 2 * (SELECT CAST(sum(x * y) AS BIGINT)
        |                 FROM (SELECT unnest(pn.q) AS x, unnest(scn$l.cq) AS y))
        |      + scn$l.cn2 AS dist
        |  FROM pn JOIN $prev ON $prev.vec_id = pn.vec_id
        |  JOIN scn$l ON scn$l.parent = $prev.cluster),
        |a$l AS (
        |  SELECT vec_id, cid AS cluster FROM ss$l
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dist ASC, cid ASC) = 1)""".stripMargin)
      prev = s"a$l"
    }
    chain.append(s""",
      |pc AS (SELECT pn.vec_id, pn.q, pn.n2, $prev.cluster
      |  FROM pn JOIN $prev ON $prev.vec_id = pn.vec_id)""".stripMargin)
    chain.toString
  }

  /** embedding_near_dup_tree oracle: the depth-d leaf assignment chain,
    * then the same within-leaf pair scoring as the hier near-dup oracle.
    */
  private def nearDupTreeOracle: Option[(String, String)] =
    nearDupTreeCapture.map { case (root, subLevels) =>
      "embedding_near_dup_tree" ->
        s"""WITH ${treeAssignCtes(root, subLevels)},
           |nd_scored AS (
           |  SELECT x.cluster, x.vec_id AS id_a, y.vec_id AS id_b, x.n2 AS na, y.n2 AS nb,
           |    (SELECT CAST(sum(xx * yy) AS BIGINT)
           |     FROM (SELECT unnest(x.q) AS xx, unnest(y.q) AS yy)) AS dot
           |  FROM pc x JOIN pc y ON x.cluster = y.cluster AND x.vec_id < y.vec_id)
           |SELECT cluster, id_a, id_b,
           |  CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine
           |FROM nd_scored
           |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= $NearDupCos
           |ORDER BY id_a, id_b""".stripMargin
    }

  /** pq_codes / pq_topk oracles: replay the captured per-subspace
    * codebooks — the same sliced argmin (`list_slice`, exact-integer
    * comparison key, lower-code tie-break) as
    * [[graft.functions.NearestCellQ]] over slices, then for top-k the same
    * ADC reconstruction distance as [[graft.functions.PqAdcQ]] summed over
    * subspaces with the lower-nn_id tie-break.
    */
  /** The PQ encode chain (codebook VALUES → per-subspace sliced argmin),
    * CTE names prefixed with `p` so independently-parameterized chains can
    * share one statement (ann_recall). Depends on prepSql's `pn`; ends in
    * `${p}assigned(vec_id, m, code)`.
    */
  private def pqAssignCtes(codebooks: Seq[(Int, Int, Seq[Long])], p: String): String = {
    val ds = Dim / PqM
    val cbValues = codebooks.map { case (m, code, cq) =>
      s"($m, $code, CAST([${cq.mkString(", ")}] AS BIGINT[]))"
    }.mkString(",\n    ")
    s"""${p}cb(m, code, cq) AS (VALUES
       |    $cbValues),
       |${p}cbn AS (SELECT m, code, cq,
       |    CAST((SELECT sum(x * x) FROM (SELECT unnest(cq) AS x)) AS BIGINT) AS cn2
       |  FROM ${p}cb),
       |${p}sub AS (SELECT vec_id, m, list_slice(q, m * $ds + 1, m * $ds + $ds) AS sq
       |  FROM pn CROSS JOIN (SELECT unnest(range(0, $PqM)) AS m)),
       |${p}sub_scored AS (
       |  SELECT s.vec_id, s.m, cbn.code,
       |    cbn.cn2 - 2 * (SELECT CAST(sum(x * y) AS BIGINT)
       |                   FROM (SELECT unnest(s.sq) AS x, unnest(cbn.cq) AS y)) AS dist
       |  FROM ${p}sub s JOIN ${p}cbn cbn USING (m)),
       |${p}assigned AS (
       |  SELECT vec_id, m, code FROM ${p}sub_scored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
       |    ORDER BY dist ASC, code ASC) = 1)""".stripMargin
  }

  /** The flat-PQ ADC scoring chain over `${p}assigned`: query sub-slices,
    * per-subspace partials, summed distances — ends in
    * `${p}adc(query_id, nn_id, adc_dist)`.
    */
  private def pqAdcCtes(p: String): String = {
    val ds = Dim / PqM
    s"""${p}qsub AS (SELECT vec_id AS query_id, m,
       |    list_slice(q, m * $ds + 1, m * $ds + $ds) AS sq
       |  FROM pn CROSS JOIN (SELECT unnest(range(0, $PqM)) AS m)
       |  WHERE vec_id < $NumQueries),
       |${p}qpart AS (SELECT query_id, m, sq,
       |    CAST((SELECT sum(x * x) FROM (SELECT unnest(sq) AS x)) AS BIGINT) AS qn2m
       |  FROM ${p}qsub),
       |${p}partial AS (
       |  SELECT qp.query_id, a.vec_id AS nn_id,
       |    qp.qn2m - 2 * (SELECT CAST(sum(x * y) AS BIGINT)
       |                   FROM (SELECT unnest(qp.sq) AS x, unnest(cbn.cq) AS y))
       |      + cbn.cn2 AS pd
       |  FROM ${p}qpart qp
       |  JOIN ${p}assigned a USING (m)
       |  JOIN ${p}cbn cbn ON cbn.m = a.m AND cbn.code = a.code
       |  WHERE a.vec_id <> qp.query_id),
       |${p}adc AS (SELECT query_id, nn_id, CAST(sum(pd) AS BIGINT) AS adc_dist
       |  FROM ${p}partial GROUP BY query_id, nn_id)""".stripMargin
  }

  /** pq_codes / pq_topk oracles: replay the captured per-subspace
    * codebooks — the same sliced argmin (`list_slice`, exact-integer
    * comparison key, lower-code tie-break) as
    * [[graft.functions.NearestCellQ]] over slices, then for top-k the same
    * ADC reconstruction distance as [[graft.functions.PqAdcQ]] summed over
    * subspaces with the lower-nn_id tie-break.
    */
  private def pqOracles: Map[String, String] = pqCapture match {
    case None => Map.empty
    case Some(codebooks) =>
      Map(
        "pq_codes" ->
          s"""WITH $prepSql,
             |${pqAssignCtes(codebooks, "")}
             |SELECT vec_id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY m) AS codes
             |FROM assigned GROUP BY vec_id ORDER BY vec_id""".stripMargin,
        "pq_topk" ->
          s"""WITH $prepSql,
             |${pqAssignCtes(codebooks, "")},
             |${pqAdcCtes("")}
             |SELECT query_id, nn_id, adc_dist FROM adc
             |QUALIFY row_number() OVER (PARTITION BY query_id
             |  ORDER BY adc_dist ASC, nn_id ASC) <= $K
             |ORDER BY query_id, nn_id""".stripMargin)
  }

  /** ivfpq_topk oracle: replay the ENTIRE captured index — coarse argmin
    * (exact key, lower-cid ties), per-subspace residual code assignment
    * (the argmin over Σ((x−c)−y)² ≡ the kernel's cn2−2·dot key up to a
    * per-(vec,m) constant), probe-P cell selection per query, and ADC
    * partial sums over the probed cells — every step exact integers.
    */
  /** The complete IVF-PQ chain (two-level leaf assignment → residual
    * encode → leaf-ranked probe selection → ADC partials), CTE names
    * prefixed with `p` — ends in `${p}adc(query_id, nn_id, adc_dist)`.
    * Corpus leaves come from the HIERARCHICAL argmin (coarse, then that
    * cell's sub-table — mirror of NearestCellQ → NearestSubCellQ); query
    * probes rank ALL real leaves flat (the query side is tiny on the
    * engine side too).
    */
  private def ivfPqChainCtes(coarse: Seq[(Int, Seq[Long])],
                             sub: Seq[(Int, Int, Seq[Long])],
                             codebooks: Seq[(Int, Int, Seq[Long])],
                             p: String): String = {
    val ds = Dim / PqM
    val coarseValues = coarse.map { case (cid, cq) =>
      s"($cid, CAST([${cq.mkString(", ")}] AS BIGINT[]))"
    }.mkString(",\n    ")
    val leafValues = sub.map { case (c, leaf, cq) =>
      s"($c, $leaf, CAST([${cq.mkString(", ")}] AS BIGINT[]))"
    }.mkString(",\n    ")
    s"""${p}c(cid, cq) AS (VALUES
       |    $coarseValues),
       |${p}cn AS (SELECT cid, cq,
       |    CAST((SELECT sum(x * x) FROM (SELECT unnest(cq) AS x)) AS BIGINT) AS cn2
       |  FROM ${p}c),
       |${p}cscored AS (
       |  SELECT pn.vec_id, cn.cid,
       |    pn.n2 - 2 * (SELECT CAST(sum(x * y) AS BIGINT)
       |                 FROM (SELECT unnest(pn.q) AS x, unnest(cn.cq) AS y))
       |      + cn.cn2 AS dist
       |  FROM pn CROSS JOIN ${p}cn cn),
       |${p}ca0 AS (
       |  SELECT vec_id, cid AS coarse FROM ${p}cscored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |    ORDER BY dist ASC, cid ASC) = 1),
       |${p}lt(coarse, cid, cq) AS (VALUES
       |    $leafValues),
       |${p}ltn AS (SELECT coarse, cid, cq,
       |    CAST((SELECT sum(x * x) FROM (SELECT unnest(cq) AS x)) AS BIGINT) AS cn2
       |  FROM ${p}lt),
       |${p}lscored AS (
       |  SELECT pn.vec_id, lt.cid,
       |    pn.n2 - 2 * (SELECT CAST(sum(x * y) AS BIGINT)
       |                 FROM (SELECT unnest(pn.q) AS x, unnest(lt.cq) AS y))
       |      + lt.cn2 AS dist
       |  FROM pn JOIN ${p}ca0 ca0 USING (vec_id)
       |  JOIN ${p}ltn lt ON lt.coarse = ca0.coarse),
       |${p}ca AS (
       |  SELECT vec_id, cid AS cell FROM ${p}lscored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |    ORDER BY dist ASC, cid ASC) = 1),
       |${adcTailCtes(codebooks, p)}""".stripMargin
  }

  /** The shared ADC tail of every IVF-style oracle chain (residual encode
    * → flat leaf-ranked probe selection → ADC partials): depends on
    * `${p}ca(vec_id, cell)` (corpus leaf assignment) and
    * `${p}ltn(cid, cq, cn2)` (leaf-centroid table) existing in the WITH
    * scope — the mirror of [[Similarity.ivfAdcTopK]] being shared by the
    * two-level and tree-coarse indexes on the engine side. Ends in
    * `${p}adc(query_id, nn_id, adc_dist)`.
    */
  private def adcTailCtes(codebooks: Seq[(Int, Int, Seq[Long])],
                          p: String): String = {
    val ds = Dim / PqM
    val cbValues = codebooks.map { case (m, code, cq) =>
      s"($m, $code, CAST([${cq.mkString(", ")}] AS BIGINT[]))"
    }.mkString(",\n    ")
    s"""${p}cb(m, code, cq) AS (VALUES
       |    $cbValues),
       |${p}enc_scored AS (
       |  SELECT pn.vec_id, cb.m, cb.code,
       |    (SELECT CAST(sum((x - cc - y) * (x - cc - y)) AS BIGINT)
       |     FROM (SELECT unnest(list_slice(pn.q, cb.m * $ds + 1, cb.m * $ds + $ds)) AS x,
       |                  unnest(list_slice(lt.cq, cb.m * $ds + 1, cb.m * $ds + $ds)) AS cc,
       |                  unnest(cb.cq) AS y)) AS dist
       |  FROM pn JOIN ${p}ca ca USING (vec_id) JOIN ${p}ltn lt ON lt.cid = ca.cell
       |  CROSS JOIN ${p}cb cb),
       |${p}enc AS (
       |  SELECT vec_id, m, code FROM ${p}enc_scored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
       |    ORDER BY dist ASC, code ASC) = 1),
       |${p}qscored AS (
       |  SELECT pn.vec_id, lt.cid,
       |    pn.n2 - 2 * (SELECT CAST(sum(x * y) AS BIGINT)
       |                 FROM (SELECT unnest(pn.q) AS x, unnest(lt.cq) AS y))
       |      + lt.cn2 AS dist
       |  FROM pn CROSS JOIN ${p}ltn lt
       |  WHERE pn.vec_id < $NumQueries),
       |${p}qa AS (
       |  SELECT vec_id AS query_id, cid AS cell FROM ${p}qscored
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |    ORDER BY dist ASC, cid ASC) <= $IvfPqProbes),
       |${p}partial AS (
       |  SELECT qa.query_id, ca.vec_id AS nn_id,
       |    (SELECT CAST(sum((x - cc - y) * (x - cc - y)) AS BIGINT)
       |     FROM (SELECT unnest(list_slice(qp.q, cb.m * $ds + 1, cb.m * $ds + $ds)) AS x,
       |                  unnest(list_slice(lt.cq, cb.m * $ds + 1, cb.m * $ds + $ds)) AS cc,
       |                  unnest(cb.cq) AS y)) AS pd
       |  FROM ${p}qa qa
       |  JOIN pn qp ON qp.vec_id = qa.query_id
       |  JOIN ${p}ltn lt ON lt.cid = qa.cell
       |  JOIN ${p}ca ca ON ca.cell = qa.cell
       |  JOIN ${p}enc e ON e.vec_id = ca.vec_id
       |  JOIN ${p}cb cb ON cb.m = e.m AND cb.code = e.code
       |  WHERE ca.vec_id <> qa.query_id),
       |${p}adc AS (SELECT query_id, nn_id, CAST(sum(pd) AS BIGINT) AS adc_dist
       |  FROM ${p}partial GROUP BY query_id, nn_id)""".stripMargin
  }

  /** The complete TREE-coarse IVF-PQ chain: the depth-d leaf argmin chain
    * (prefixed mirror of [[treeAssignCtes]] — identical comparison key and
    * lower-cid tie-break per level) into `${p}ca`, the last level's table
    * as `${p}ltn`, then the shared [[adcTailCtes]]. Ends in
    * `${p}adc(query_id, nn_id, adc_dist)`.
    */
  private def treeIvfPqChainCtes(root: Seq[(Int, Seq[Long])],
                                 subLevels: Seq[Seq[(Int, Int, Seq[Long])]],
                                 codebooks: Seq[(Int, Int, Seq[Long])],
                                 p: String): String = {
    val rootValues = root.map { case (cid, cq) =>
      s"($cid, CAST([${cq.mkString(", ")}] AS BIGINT[]))"
    }.mkString(",\n    ")
    val chain = new StringBuilder(
      s"""${p}c(cid, cq) AS (VALUES
         |    $rootValues),
         |${p}cn AS (SELECT cid, cq,
         |    CAST((SELECT sum(x * x) FROM (SELECT unnest(cq) AS x)) AS BIGINT) AS cn2
         |  FROM ${p}c),
         |${p}cscored AS (
         |  SELECT pn.vec_id, cn.cid,
         |    pn.n2 - 2 * (SELECT CAST(sum(x * y) AS BIGINT)
         |                 FROM (SELECT unnest(pn.q) AS x, unnest(cn.cq) AS y))
         |      + cn.cn2 AS dist
         |  FROM pn CROSS JOIN ${p}cn cn),
         |${p}a1 AS (
         |  SELECT vec_id, cid AS cluster FROM ${p}cscored
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY dist ASC, cid ASC) = 1)""".stripMargin)
    var prev = s"${p}a1"
    subLevels.zipWithIndex.foreach { case (sub, i) =>
      val l = i + 2
      val values = sub.map { case (c, cid, cq) =>
        s"($c, $cid, CAST([${cq.mkString(", ")}] AS BIGINT[]))"
      }.mkString(",\n    ")
      chain.append(s""",
        |${p}sc$l(parent, cid, cq) AS (VALUES
        |    $values),
        |${p}scn$l AS (SELECT parent, cid, cq,
        |    CAST((SELECT sum(x * x) FROM (SELECT unnest(cq) AS x)) AS BIGINT) AS cn2
        |  FROM ${p}sc$l),
        |${p}ss$l AS (
        |  SELECT pn.vec_id, s.cid,
        |    pn.n2 - 2 * (SELECT CAST(sum(x * y) AS BIGINT)
        |                 FROM (SELECT unnest(pn.q) AS x, unnest(s.cq) AS y))
        |      + s.cn2 AS dist
        |  FROM pn JOIN $prev ON $prev.vec_id = pn.vec_id
        |  JOIN ${p}scn$l s ON s.parent = $prev.cluster),
        |${p}a$l AS (
        |  SELECT vec_id, cid AS cluster FROM ${p}ss$l
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dist ASC, cid ASC) = 1)""".stripMargin)
      prev = s"${p}a$l"
    }
    val lastLevel = subLevels.size + 1
    chain.append(s""",
      |${p}ca AS (SELECT vec_id, cluster AS cell FROM $prev),
      |${p}ltn AS (SELECT cid, cq, cn2 FROM ${p}scn$lastLevel),
      |${adcTailCtes(codebooks, p)}""".stripMargin)
    chain.toString
  }

  private def ivfPqOracle: Map[String, String] =
    ivfPqCapture.toSeq.flatMap { case (coarse, sub, codebooks) =>
      Seq(
        "ivfpq_topk" ->
          s"""WITH $prepSql,
             |${ivfPqChainCtes(coarse, sub, codebooks, "")}
             |SELECT query_id, nn_id, adc_dist FROM adc
             |QUALIFY row_number() OVER (PARTITION BY query_id
             |  ORDER BY adc_dist ASC, nn_id ASC) <= $K
             |ORDER BY query_id, nn_id""".stripMargin,
        // the streamed encode must land the SAME stored artifact as the
        // batch replay: leaf + code word per vector (DuckDB computes only
        // the CTEs this SELECT references — the probe/ADC tail is unused)
        "stream_ivfpq_encode" ->
          s"""WITH $prepSql,
             |${ivfPqChainCtes(coarse, sub, codebooks, "")}
             |SELECT ca.vec_id, ca.cell,
             |  string_agg(CAST(e.code AS VARCHAR), ',' ORDER BY e.m) AS codes
             |FROM ca JOIN enc e USING (vec_id)
             |GROUP BY ca.vec_id, ca.cell
             |ORDER BY ca.vec_id""".stripMargin)
    }.toMap

  /** stream_ivfpq_index oracle: the stream-maintained snapshot must equal
    * the batch rebuild — identical chain to the stream_ivfpq_encode oracle
    * over this query's own capture.
    */
  private def ivfPqIndexOracle: Option[(String, String)] =
    ivfPqIndexCapture.map { case (coarse, sub, codebooks) =>
      "stream_ivfpq_index" ->
        s"""WITH $prepSql,
           |${ivfPqChainCtes(coarse, sub, codebooks, "")}
           |SELECT ca.vec_id, ca.cell,
           |  string_agg(CAST(e.code AS VARCHAR), ',' ORDER BY e.m) AS codes
           |FROM ca JOIN enc e USING (vec_id)
           |GROUP BY ca.vec_id, ca.cell
           |ORDER BY ca.vec_id""".stripMargin
    }

  /** ann_recall oracle: BOTH captured indexes replayed side by side (the
    * flat-PQ chain under `p_`, the IVF-PQ chain under `i_`), the exact-L2
    * ground truth as one scored self-join, hits counted per query with
    * zero-hit queries preserved — the same contract as
    * [[Similarity.recallAtK]].
    */
  private def annRecallOracle: Option[(String, String)] =
    for { codebooks <- pqCapture; (coarse, sub, rcb) <- ivfPqCapture
          (troot, tlevels, tcb) <- treeIvfPqCapture } yield {
      "ann_recall" ->
        s"""WITH $prepSql,
           |${pqAssignCtes(codebooks, "p_")},
           |${pqAdcCtes("p_")},
           |${ivfPqChainCtes(coarse, sub, rcb, "i_")},
           |${treeIvfPqChainCtes(troot, tlevels, tcb, "t_")},
           |ex_scored AS (
           |  SELECT qv.vec_id AS query_id, cv.vec_id AS nn_id,
           |    qv.n2 - 2 * (SELECT CAST(sum(x * y) AS BIGINT)
           |                 FROM (SELECT unnest(qv.q) AS x, unnest(cv.q) AS y))
           |      + cv.n2 AS l2_dist
           |  FROM pn qv JOIN pn cv ON cv.vec_id <> qv.vec_id
           |  WHERE qv.vec_id < $NumQueries),
           |ex_top AS (
           |  SELECT query_id, nn_id FROM ex_scored
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |    ORDER BY l2_dist ASC, nn_id ASC) <= $K),
           |p_top AS (
           |  SELECT query_id, nn_id FROM p_adc
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |    ORDER BY adc_dist ASC, nn_id ASC) <= $K),
           |i_top AS (
           |  SELECT query_id, nn_id FROM i_adc
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |    ORDER BY adc_dist ASC, nn_id ASC) <= $K),
           |t_top AS (
           |  SELECT query_id, nn_id FROM t_adc
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |    ORDER BY adc_dist ASC, nn_id ASC) <= $K),
           |qlist AS (SELECT DISTINCT query_id FROM ex_top),
           |p_hits AS (SELECT query_id, count(*) AS n FROM p_top
           |  JOIN ex_top USING (query_id, nn_id) GROUP BY query_id),
           |i_hits AS (SELECT query_id, count(*) AS n FROM i_top
           |  JOIN ex_top USING (query_id, nn_id) GROUP BY query_id),
           |t_hits AS (SELECT query_id, count(*) AS n FROM t_top
           |  JOIN ex_top USING (query_id, nn_id) GROUP BY query_id)
           |SELECT 'pq' AS method, q.query_id,
           |  CAST(coalesce(p_hits.n, 0) AS BIGINT) AS n_hits
           |FROM qlist q LEFT JOIN p_hits USING (query_id)
           |UNION ALL
           |SELECT 'ivfpq' AS method, q.query_id,
           |  CAST(coalesce(i_hits.n, 0) AS BIGINT) AS n_hits
           |FROM qlist q LEFT JOIN i_hits USING (query_id)
           |UNION ALL
           |SELECT 'tivfpq' AS method, q.query_id,
           |  CAST(coalesce(t_hits.n, 0) AS BIGINT) AS n_hits
           |FROM qlist q LEFT JOIN t_hits USING (query_id)
           |ORDER BY method, query_id""".stripMargin
    }

  /** tree_ivfpq_topk oracle: the ENTIRE captured tree-coarse index
    * replayed — depth-d argmin chain, residual code assignment, flat
    * leaf-ranked probe selection, ADC partials — all exact integers.
    */
  private def treeIvfPqOracle: Option[(String, String)] =
    treeIvfPqCapture.map { case (root, subLevels, cb) =>
      "tree_ivfpq_topk" ->
        s"""WITH $prepSql,
           |${treeIvfPqChainCtes(root, subLevels, cb, "")}
           |SELECT query_id, nn_id, adc_dist FROM adc
           |QUALIFY row_number() OVER (PARTITION BY query_id
           |  ORDER BY adc_dist ASC, nn_id ASC) <= $K
           |ORDER BY query_id, nn_id""".stripMargin
    }

  /** semantic_dedup_srp_auto oracle: the srp-dedup SQL at the CAPTURED
    * band width — same sketch formula, wider band keys.
    */
  /** The srp-dedup SQL at a band width — shared by the srp-auto and
    * srp-bucket oracles (the two queries differ only in WHERE the engine
    * evaluates the verify; the declared band + verify semantics, and so
    * the replay, are identical).
    */
  private def srpDedupSqlAtWidth(rpb: Int): String =
    s"""WITH $prepSql,
       |${srpSketchCtesWidth(rpb)},
       |scand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
       |    AND a.vec_id < b.vec_id),
       |ssc AS (
       |  SELECT scand.id_a, scand.id_b, x.n2 AS na, y.n2 AS nb,
       |    (SELECT CAST(sum(xx * yy) AS BIGINT)
       |     FROM (SELECT unnest(x.q) AS xx, unnest(y.q) AS yy)) AS dot
       |  FROM scand
       |  JOIN pn x ON x.vec_id = scand.id_a
       |  JOIN pn y ON y.vec_id = scand.id_b),
       |sdup AS (SELECT id_b AS vec_id, min(id_a) AS dup_of FROM ssc
       |  WHERE CAST(dot AS DOUBLE) /
       |    (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= $NearDupCos
       |  GROUP BY id_b)
       |SELECT e.vec_id, d.dup_of, d.dup_of IS NULL AS is_kept
       |FROM embeddings e LEFT JOIN sdup d USING (vec_id)
       |ORDER BY e.vec_id""".stripMargin

  private def srpAutoOracle: Option[(String, String)] = srpAutoWidth.map { rpb =>
    "semantic_dedup_srp_auto" -> srpDedupSqlAtWidth(rpb)
  }

  private def srpBucketOracle: Option[(String, String)] = srpBucketWidth.map { rpb =>
    "semantic_dedup_srp_bucket" -> srpDedupSqlAtWidth(rpb)
  }

  private def nearDupSrpOracle: Option[(String, String)] = nearDupSrpWidth.map { rpb =>
    "embedding_near_dup_srp" ->
      s"""WITH $prepSql,
         |${srpSketchCtesWidth(rpb)},
         |scand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
         |    AND a.vec_id < b.vec_id),
         |ssc AS (
         |  SELECT scand.id_a, scand.id_b, x.n2 AS na, y.n2 AS nb,
         |    (SELECT CAST(sum(xx * yy) AS BIGINT)
         |     FROM (SELECT unnest(x.q) AS xx, unnest(y.q) AS yy)) AS dot
         |  FROM scand
         |  JOIN pn x ON x.vec_id = scand.id_a
         |  JOIN pn y ON y.vec_id = scand.id_b)
         |SELECT id_a, id_b,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine
         |FROM ssc
         |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= $NearDupCos
         |ORDER BY id_a, id_b""".stripMargin
  }

  /** The prefilter-sketch CTE (`projp, smp, skp`): [[Srp.preSketches]]'
    * `preLongs` packed longs, exact mirror — hyperplane indices offset
    * [[Srp.PreOffset]], [[Srp.PreBitsPerLong]] bits per long, same sign
    * family and zero-tie rule as the banding sketch. Reuses `ex` from the
    * banding CTE chain.
    * (The wide form — one sum column per prefilter bit — measures ~13×
    * faster in DuckDB than the long unnest-join form at 1 323 bits.)
    */
  private def srpPreCtes(preLongs: Int): String = {
    val nPre = preLongs * Srp.PreBitsPerLong
    val projCols = (0 until nPre).map(j => s"t_$j").mkString(", ")
    val projValues = (0 until Dim).map { d =>
      s"($d, ${(0 until nPre).map(j => Srp.sign(Srp.PreOffset + j, d)).mkString(", ")})"
    }.mkString(",\n    ")
    val sums = (0 until nPre)
      .map(j => s"CAST(sum(x * t_$j) AS BIGINT) AS pp_$j").mkString(",\n    ")
    val packed = (0 until preLongs).map { l =>
      (0 until Srp.PreBitsPerLong)
        .map(i => s"(CASE WHEN pp_${l * Srp.PreBitsPerLong + i} > 0 " +
          s"THEN (CAST(1 AS BIGINT) << $i) ELSE CAST(0 AS BIGINT) END)")
        .mkString(" + ") + s" AS pf_$l"
    }.mkString(",\n    ")
    s"""projp(dim, $projCols) AS (VALUES
       |    $projValues),
       |smp AS (SELECT vec_id,
       |    $sums
       |  FROM ex JOIN projp USING (dim) GROUP BY vec_id),
       |skp AS (SELECT vec_id,
       |    $packed
       |  FROM smp)""".stripMargin
  }

  private def srpPreOracle: Option[(String, String)] = srpPreWidth.map { rpb =>
    // width and tau are pure functions of the registered verify threshold
    // (Srp.preLongsFor / Srp.hammingTauFor) — the oracle replays both
    val preLongs = Srp.preLongsFor(NearDupCos)
    val tau = Srp.hammingTauFor(preLongs * Srp.PreBitsPerLong, NearDupCos)
    // DuckDB bit_count returns TINYINT — 21 popcounts summed overflow 127
    val ham = (0 until preLongs)
      .map(l => s"CAST(bit_count(xor(sa.pf_$l, sb.pf_$l)) AS INTEGER)")
      .mkString(" + ")
    "semantic_dedup_srp_pre" ->
      s"""WITH $prepSql,
         |${srpSketchCtesWidth(rpb)},
         |${srpPreCtes(preLongs)},
         |scand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
         |    AND a.vec_id < b.vec_id),
         |spre AS (SELECT scand.id_a, scand.id_b
         |  FROM scand
         |  JOIN skp sa ON sa.vec_id = scand.id_a
         |  JOIN skp sb ON sb.vec_id = scand.id_b
         |  WHERE $ham <= $tau),
         |ssc AS (
         |  SELECT spre.id_a, spre.id_b, x.n2 AS na, y.n2 AS nb,
         |    (SELECT CAST(sum(xx * yy) AS BIGINT)
         |     FROM (SELECT unnest(x.q) AS xx, unnest(y.q) AS yy)) AS dot
         |  FROM spre
         |  JOIN pn x ON x.vec_id = spre.id_a
         |  JOIN pn y ON y.vec_id = spre.id_b),
         |sdup AS (SELECT id_b AS vec_id, min(id_a) AS dup_of FROM ssc
         |  WHERE CAST(dot AS DOUBLE) /
         |    (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= $NearDupCos
         |  GROUP BY id_b)
         |SELECT e.vec_id, d.dup_of, d.dup_of IS NULL AS is_kept
         |FROM embeddings e LEFT JOIN sdup d USING (vec_id)
         |ORDER BY e.vec_id""".stripMargin
  }

  private def srpOracle: String = {
    s"""$srpSketchCtes,
       |cand AS (SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS nn_id
       |  FROM bands qb JOIN bands cb ON qb.b = cb.b AND qb.bv = cb.bv
       |    AND cb.vec_id <> qb.vec_id
       |  WHERE qb.vec_id < $NumQueries),
       |scored AS (
       |  SELECT cand.query_id, cand.nn_id, qv.n2 AS qn2, cv.n2 AS cn2,
       |    (SELECT CAST(sum(x * y) AS BIGINT)
       |     FROM (SELECT unnest(qv.q) AS x, unnest(cv.q) AS y)) AS dot
       |  FROM cand
       |  JOIN pn qv ON qv.vec_id = cand.query_id
       |  JOIN pn cv ON cv.vec_id = cand.nn_id)""".stripMargin
  }

  def oracleSql: Map[String, String] =
    kmeansOracle.toMap ++ purityOracle.toMap ++ semanticAutoOracle.toMap ++
      nearDupAutoOracle.toMap ++ srpAutoOracle.toMap ++ srpBucketOracle.toMap ++
      nearDupSrpOracle.toMap ++ srpPreOracle.toMap ++
      hierOracle.toMap ++ bigModelOracle.toMap ++ hybridOracle.toMap ++
      nearDupHierOracle.toMap ++ nearDupTreeOracle.toMap ++
      pqOracles ++ ivfPqOracle ++ ivfPqIndexOracle.toMap ++
      treeIvfPqOracle.toMap ++ annRecallOracle.toMap ++ Map(
    "semantic_dedup_srp" ->
      s"""WITH $prepSql,
         |$srpSketchCtes,
         |scand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
         |    AND a.vec_id < b.vec_id),
         |ssc AS (
         |  SELECT scand.id_a, scand.id_b, x.n2 AS na, y.n2 AS nb,
         |    (SELECT CAST(sum(xx * yy) AS BIGINT)
         |     FROM (SELECT unnest(x.q) AS xx, unnest(y.q) AS yy)) AS dot
         |  FROM scand
         |  JOIN pn x ON x.vec_id = scand.id_a
         |  JOIN pn y ON y.vec_id = scand.id_b),
         |sdup AS (SELECT id_b AS vec_id, min(id_a) AS dup_of FROM ssc
         |  WHERE CAST(dot AS DOUBLE) /
         |    (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= $NearDupCos
         |  GROUP BY id_b)
         |SELECT e.vec_id, d.dup_of, d.dup_of IS NULL AS is_kept
         |FROM embeddings e LEFT JOIN sdup d USING (vec_id)
         |ORDER BY e.vec_id""".stripMargin,

    "embedding_pca" ->
      s"""WITH $pcaCtes
         |SELECT dim, CAST(v AS DOUBLE) /
         |  sqrt(CAST((SELECT n2 FROM pn2) AS DOUBLE)) AS component
         |FROM pv$PcaIters ORDER BY dim""".stripMargin,

    "pca_projection" ->
      s"""WITH $pcaCtes,
         |pfl AS MATERIALIZED (SELECT list(v ORDER BY dim) AS lv FROM pv$PcaIters),
         |pfsv AS MATERIALIZED (SELECT CAST(sum(pds.s * pv$PcaIters.v) AS HUGEINT) AS sdotv
         |  FROM pds JOIN pv$PcaIters USING (dim))
         |SELECT pp.vec_id,
         |  CAST((SELECT CAST(sum(x * y) AS HUGEINT)
         |        FROM (SELECT unnest(pp.q) AS x, unnest((SELECT lv FROM pfl)) AS y))
         |      * (SELECT n FROM pcnt)
         |    - (SELECT sdotv FROM pfsv) AS DOUBLE)
         |  / (CAST((SELECT n FROM pcnt) AS DOUBLE) * ${Similarity.QScale}.0
         |     * sqrt(CAST((SELECT n2 FROM pn2) AS DOUBLE))) AS projection
         |FROM pp ORDER BY pp.vec_id""".stripMargin,

    // covariance: same exact integer cross-moments (DuckDB sums in HUGEINT,
    // Spark in DECIMAL(38,0) — both exact), same double derivation order
    "embedding_covariance" ->
      s"""WITH $prepSql,
         |ex AS (SELECT vec_id, unnest(q) AS x,
         |    CAST(unnest(range(0, len(q))) AS INTEGER) AS dim FROM p),
         |m AS (
         |  SELECT a.dim AS i, b.dim AS j, count(*) AS n_vecs,
         |    CAST(sum(CAST(a.x AS HUGEINT) * b.x) AS DOUBLE) AS sxy
         |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.dim >= a.dim
         |  GROUP BY a.dim, b.dim),
         |ds AS (SELECT dim, CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS s
         |  FROM ex GROUP BY dim)
         |SELECT m.i, m.j, m.n_vecs,
         |  (m.sxy / m.n_vecs - (si.s / m.n_vecs) * (sj.s / m.n_vecs))
         |    / (${Similarity.QScale}.0 * ${Similarity.QScale}.0) AS cov
         |FROM m JOIN ds si ON si.dim = m.i JOIN ds sj ON sj.dim = m.j
         |ORDER BY m.i, m.j""".stripMargin,
    "srp_ann_topk" ->
      s"""WITH $prepSql,
         |$srpOracle
         |SELECT query_id, nn_id,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) AS cosine
         |FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY cosine DESC, nn_id ASC) <= $K
         |ORDER BY query_id, nn_id""".stripMargin,
    "cosine_topk" ->
      s"""WITH $prepSql,
         |scored AS (
         |  SELECT qv.vec_id AS query_id, cv.vec_id AS nn_id, qv.n2 AS qn2, cv.n2 AS cn2,
         |    (SELECT CAST(sum(x * y) AS BIGINT)
         |     FROM (SELECT unnest(qv.q) AS x, unnest(cv.q) AS y)) AS dot
         |  FROM pn qv JOIN pn cv ON cv.vec_id <> qv.vec_id
         |  WHERE qv.vec_id < $NumQueries)
         |SELECT query_id, nn_id,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) AS cosine
         |FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY cosine DESC, nn_id ASC) <= $K
         |ORDER BY query_id, nn_id""".stripMargin,

    // exact integer squared-L2 distances — the ANN ground-truth ranking
    "l2_topk" ->
      s"""WITH $prepSql,
         |scored AS (
         |  SELECT qv.vec_id AS query_id, cv.vec_id AS nn_id,
         |    qv.n2 - 2 * (SELECT CAST(sum(x * y) AS BIGINT)
         |                 FROM (SELECT unnest(qv.q) AS x, unnest(cv.q) AS y))
         |      + cv.n2 AS l2_dist
         |  FROM pn qv JOIN pn cv ON cv.vec_id <> qv.vec_id
         |  WHERE qv.vec_id < $NumQueries)
         |SELECT query_id, nn_id, l2_dist FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY l2_dist ASC, nn_id ASC) <= $K
         |ORDER BY query_id, nn_id""".stripMargin,

    // SQL surface ≡ DataFrame surface ≡ oracle: same brute-force SQL
    "sql_cosine_topk" ->
      s"""WITH $prepSql,
         |scored AS (
         |  SELECT qv.vec_id AS query_id, cv.vec_id AS nn_id, qv.n2 AS qn2, cv.n2 AS cn2,
         |    (SELECT CAST(sum(x * y) AS BIGINT)
         |     FROM (SELECT unnest(qv.q) AS x, unnest(cv.q) AS y)) AS dot
         |  FROM pn qv JOIN pn cv ON cv.vec_id <> qv.vec_id
         |  WHERE qv.vec_id < $NumQueries)
         |SELECT query_id, nn_id,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) AS cosine
         |FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY cosine DESC, nn_id ASC) <= $K
         |ORDER BY query_id, nn_id""".stripMargin,

    // full-width multi-probe ≡ brute force: reuse the exact top-k oracle
    "ivf_multiprobe_topk" ->
      s"""WITH $prepSql,
         |scored AS (
         |  SELECT qv.vec_id AS query_id, cv.vec_id AS nn_id, qv.n2 AS qn2, cv.n2 AS cn2,
         |    (SELECT CAST(sum(x * y) AS BIGINT)
         |     FROM (SELECT unnest(qv.q) AS x, unnest(cv.q) AS y)) AS dot
         |  FROM pn qv JOIN pn cv ON cv.vec_id <> qv.vec_id
         |  WHERE qv.vec_id < $NumQueries)
         |SELECT query_id, nn_id,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) AS cosine
         |FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY cosine DESC, nn_id ASC) <= $K
         |ORDER BY query_id, nn_id""".stripMargin,

    "ivf_topk" ->
      s"""WITH $prepSql,
         |scored AS (
         |  SELECT qv.vec_id AS query_id, cv.vec_id AS nn_id, qv.n2 AS qn2, cv.n2 AS cn2,
         |    (SELECT CAST(sum(x * y) AS BIGINT)
         |     FROM (SELECT unnest(qv.q) AS x, unnest(cv.q) AS y)) AS dot
         |  FROM pn qv JOIN pn cv ON cv.label = qv.label AND cv.vec_id <> qv.vec_id
         |  WHERE qv.vec_id < $NumQueries)
         |SELECT query_id, nn_id,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) AS cosine
         |FROM scored
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY cosine DESC, nn_id ASC) <= $K
         |ORDER BY query_id, nn_id""".stripMargin,

    "cell_stats" ->
      s"""WITH $prepSql,
         |e AS (SELECT label, unnest(q) AS x, CAST(unnest(range(0, len(q))) AS INTEGER) AS dim
         |      FROM p)
         |SELECT label, dim, count(*) AS n_vecs,
         |  CAST(sum(x) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * ${Similarity.QScale}.0) AS centroid
         |FROM e GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    "embedding_near_dup" ->
      s"""WITH $prepSql,
         |scored AS (
         |  SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b, a.n2 AS na, b.n2 AS nb,
         |    (SELECT CAST(sum(x * y) AS BIGINT)
         |     FROM (SELECT unnest(a.q) AS x, unnest(b.q) AS y)) AS dot
         |  FROM pn a JOIN pn b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT label, id_a, id_b,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine
         |FROM scored
         |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= $NearDupCos
         |ORDER BY id_a, id_b""".stripMargin,

    "semantic_dedup" ->
      s"""WITH $prepSql,
         |scored AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.n2 AS na, b.n2 AS nb,
         |    (SELECT CAST(sum(x * y) AS BIGINT)
         |     FROM (SELECT unnest(a.q) AS x, unnest(b.q) AS y)) AS dot
         |  FROM pn a JOIN pn b ON a.label = b.label AND a.vec_id < b.vec_id),
         |dup AS (
         |  SELECT id_b AS vec_id, min(id_a) AS dup_of FROM scored
         |  WHERE CAST(dot AS DOUBLE) /
         |    (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= $NearDupCos
         |  GROUP BY id_b)
         |SELECT e.vec_id, e.label, d.dup_of, d.dup_of IS NULL AS is_kept
         |FROM embeddings e LEFT JOIN dup d USING (vec_id)
         |ORDER BY e.vec_id""".stripMargin,
  )
}
