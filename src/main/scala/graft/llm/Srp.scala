package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Signed-random-projection (SimHash-for-vectors) LSH over an embedding
  * column — the bucket-join alternative to the IVF scale path: no training
  * pass at all (the IVF k-means build is replaced by a declared projection
  * table), at the cost of a coarser recall dial (band count instead of
  * probe count). Complements [[Similarity]] the way banded MinHash-LSH
  * complements the exact prefix-filter join in [[Dedup]].
  *
  * Each vector gets a [[Bits]]-bit sketch: bit j is the sign of the dot
  * product with a Rademacher ±1 hyperplane, the classic SRP family where
  * P(bit collision) = 1 - angle/pi. The hyperplane signs are a DECLARED
  * deterministic function of (bit, dimension) (splitmix scramble — the same
  * generator as [[Dedup]]'s MinHash permutations), so sketches are a pure
  * function of the vector: partitioning-invariant, reproducible across
  * runs, and exactly mirrored in the DuckDB oracle.
  *
  * Scale shape: sketches are one narrow pass (explode dims → broadcast
  * 64-row projection join → one wide hash aggregate with [[Bits]] integer
  * sums — all codegen, exact quantized arithmetic). Search joins the
  * corpus's band rows against the (broadcast) query band rows — candidate
  * volume is O(Σ bucket_new × bucket_q), never corpus × queries — then
  * re-ranks candidates with the exact integer cosine. At 100 TB the corpus
  * sketches/bands are computed once at ingest and persisted as the index;
  * a query touches only its colliding buckets.
  */
object Srp {

  /** Sketch width and its banding: 4 bands of 4 bits. A band collides with
    * probability (1 - θ/π)^4; OR-ing 4 bands gives the usual S-curve —
    * near-duplicate vectors (θ ≈ 0) collide almost surely, random
    * directions rarely.
    */
  val Bits = 16
  val Bands = 4
  val RowsPerBand = 4

  /** Scale-adaptive band width: bits per band so that a band's bucket
    * count tracks the corpus (`2^bits ≈ n / targetBucket`), floored at the
    * fixed default. The fixed 4-bit default gives 16 buckets per band
    * FOREVER — bucket occupancy, and therefore spurious-candidate volume,
    * then grows linearly (quadratically in pair terms) with the corpus:
    * the sf1-constrate run measured 56 s of exact-cosine verification on
    * structure-free data, almost all of it refuting random 4-bit
    * collisions. Near-identical vectors (θ → 0, the SemDeDup regime)
    * still collide on a wider band with probability (1 − θ/π)^bits per
    * band, OR'd over [[Bands]] bands — the S-curve keeps its knee at
    * near-duplicate angles while random directions fall off exponentially
    * in the width.
    *
    * UNCAPPED past 15 bits/band (the round-9 backlog ceiling): widths ≤ 15
    * pack all [[Bands]] bands into one sketch long; wider bands get one
    * sketch long each ([[bandedRows]]), so occupancy tracks `targetBucket`
    * up to [[MaxAdaptiveBandBits]] = 62 adaptive bits — the true ceiling,
    * since for any representable corpus (`n ≤ 2⁶³−1` as a `Long`)
    * `(n >> 62) ≤ 1 ≤ targetBucket`, so a 63rd bit can never be justified
    * by occupancy. [[bandedRows]] still accepts an explicit 63-bit width
    * for callers that want the full per-long sketch; the adaptive path
    * simply never needs it (spec-pinned:
    * `rowsPerBandFor(Long.MaxValue, 1) == 62`).
    */
  val MaxAdaptiveBandBits = 62

  def rowsPerBandFor(n: Long, targetBucket: Long, bands: Int = Bands): Int = {
    require(targetBucket >= 1 && bands >= 1)
    var bits = RowsPerBand
    while (bits < MaxAdaptiveBandBits && (n >> bits) > targetBucket) bits += 1
    bits
  }

  /** Rademacher sign of hyperplane bit `j` at dimension `d` (declared,
    * deterministic; 4096 > any real j keeps (j, d) collision-free).
    */
  def sign(j: Int, d: Int): Int =
    if ((Dedup.scramble(j.toLong * 4096L + d.toLong) & 1L) == 1L) 1 else -1

  /** The projection table for a `dim`-dimensional space:
    * `(d, sign_0 … sign_{bits-1})`.
    */
  def signs(dim: Int, bits: Int = Bits): Seq[(Int, Seq[Int])] =
    (0 until dim).map(d => d -> (0 until bits).map(j => sign(j, d)))

  /** `(id, sketch)`: the `bits`-bit SRP sketch of each vector. Bit j is
    * set iff `sum_d q_d · sign(j, d) > 0` (exact integer sums over the
    * 24-bit-quantized components; the zero tie is declared to clear the
    * bit, identically in the oracle). One narrow codegen'd projection
    * ([[graft.functions.SrpSketchQ]] — the former posexplode → broadcast
    * sign join → `bits`-sum aggregate shuffled n·dim rows to compute the
    * same longs).
    */
  def sketches(df: DataFrame, id: String, vec: String, dim: Int,
               bits: Int = Bits): DataFrame = {
    val byBit = (0 until bits).map(j => (0 until dim).map(d => sign(j, d)))
    Similarity.prepare(df, id, vec)
      .select(col(id),
        graft.functions.SrpSketchQ(col("q"), byBit).as("sketch"))
  }

  /** `(id, band)` rows: band b's key packs the band index with its
    * `rowsPerBand` sketch bits; vectors agreeing on any full band share a
    * bucket.
    */
  def bandRows(sk: DataFrame, id: String,
               rowsPerBand: Int = RowsPerBand): DataFrame = {
    val keys = (0 until Bands).map { b =>
      concat_ws(":", lit(b),
        shiftright(col("sketch"), b * rowsPerBand)
          .bitwiseAND(lit((1L << rowsPerBand) - 1L)))
    }
    sk.select(col(id), explode(array(keys: _*)).as("band"))
  }

  /** `(id, band)` rows at ANY band width up to 63 bits/band — the uncapped
    * banding (round-9 backlog item). Widths ≤ 15 pack all [[Bands]] bands
    * into ONE sketch long (the original layout, kept for its single
    * narrow projection); wider bands compute one [[graft.functions
    * .SrpSketchQ]] long PER BAND over the SAME declared hyperplane family
    * `j = b·rowsPerBand + i` the packed layout reads, so the two paths
    * produce IDENTICAL band keys wherever both are defined (spec-pinned)
    * and the wide path is a strict extension, not a second family. The
    * prefilter sketch family starts at [[PreOffset]] = 256, clear of the
    * banding family's maximum index [[Bands]]·63 − 1 = 251, so prefilter
    * bits stay independent of band bits at every width.
    */
  def bandedRows(df: DataFrame, id: String, vec: String, dim: Int,
                 rowsPerBand: Int): DataFrame = {
    require(rowsPerBand >= 1 && rowsPerBand <= PreBitsPerLong,
      s"band width must be in 1..$PreBitsPerLong bits, got $rowsPerBand")
    if (rowsPerBand <= 15)
      bandRows(sketches(df, id, vec, dim, Bands * rowsPerBand), id, rowsPerBand)
    else bandedRowsWide(df, id, vec, dim, rowsPerBand)
  }

  /** The per-band-long path of [[bandedRows]], callable at any width so
    * the spec can pin wide ≡ packed on the shared ≤15-bit domain.
    */
  private[graft] def bandedRowsWide(df: DataFrame, id: String, vec: String,
                                  dim: Int, rowsPerBand: Int): DataFrame = {
    val p = Similarity.prepare(df, id, vec)
    val cols = (0 until Bands).map { b =>
      val byBit = (0 until rowsPerBand).map(i =>
        (0 until dim).map(d => sign(b * rowsPerBand + i, d)))
      graft.functions.SrpSketchQ(col("q"), byBit).as(s"bs_$b")
    }
    val keys = (0 until Bands).map(b => concat_ws(":", lit(b), col(s"bs_$b")))
    p.select(col(id) +: cols: _*)
      .select(col(id), explode(array(keys: _*)).as("band"))
  }

  /** SRP-bucketed approximate top-k: candidates from the band-bucket join
    * (queries broadcast), exact integer-cosine re-rank, k per query with
    * deterministic ties. Same output shape as [[Similarity.cosineTopK]];
    * queries whose buckets hold fewer than k candidates return fewer rows
    * (the recall dial is [[Bands]]).
    */
  /** Training-free semantic dedup: SemDeDup verdicts with the pair search
    * blocked on SRP band buckets instead of learned cells — the shape for
    * when even a k ∝ n k-means fit is too expensive. The adaptive fit's
    * nearest-cell ASSIGNMENT alone costs n·k integer dots, quadratic once
    * k tracks n (measured: `semantic_dedup_auto` 11.4× on 10× data at
    * sf1); sketching is ONE narrow pass with no training, and bucket
    * volume tracks data density. Candidates = vectors sharing any band
    * bucket, verified by exact integer cosine at τ, collapsed to the
    * min-id keeper exactly like [[Similarity.semanticDedup]]. The recall
    * dial is [[Bands]] (near-identical vectors, θ → 0, collide almost
    * surely — the SemDeDup regime); the oracle replays the identical
    * sketch → band → verify pipeline bit-for-bit.
    */
  def semanticDedupSrp(df: DataFrame, id: String, vec: String, dim: Int,
                       threshold: Double): DataFrame =
    semanticDedupSrpWidth(df, id, vec, dim, threshold, RowsPerBand)

  /** [[semanticDedupSrp]] at a scale-adaptive band width
    * ([[rowsPerBandFor]]): bucket count tracks n, so bucket occupancy —
    * and spurious-candidate volume — stays ~constant per vector as the
    * corpus grows. Returns the chosen width with the verdict frame so the
    * gate oracle can replay the identical banding.
    */
  def semanticDedupSrpAuto(df: DataFrame, id: String, vec: String, dim: Int,
                           threshold: Double,
                           targetBucket: Long = 64L): (Int, DataFrame) = {
    val rpb = rowsPerBandFor(df.count(), targetBucket)
    (rpb, semanticDedupSrpWidth(df, id, vec, dim, threshold, rpb))
  }

  def semanticDedupSrpWidth(df: DataFrame, id: String, vec: String, dim: Int,
                            threshold: Double, rowsPerBand: Int): DataFrame = {
    val p = Similarity.prepare(df, id, vec)
      .select(col(id), col("q"), col("n2")).localCheckpoint(false)
    val bands = bandedRows(p, id, vec, dim, rowsPerBand)
    val cand = bands.select(col(id).as("id_a"), col("band"))
      .join(bands.select(col(id).as("id_b"), col("band")), Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val dupOf = cand
      .join(p.select(col(id).as("id_a"), col("q").as("qa"), col("n2").as("na")),
        Seq("id_a"))
      .join(p.select(col(id).as("id_b"), col("q").as("qb"), col("n2").as("nb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosineQ(Similarity.dotQ(col("qa"), col("qb")),
          col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy(col("id_b").as(id)).agg(min(col("id_a")).as("dup_of"))
    df.select(col(id))
      .join(dupOf, Seq(id), "left")
      .select(col(id), col("dup_of"), col("dup_of").isNull.as("is_kept"))
  }

  /** The prefilter sketch: [[preLongsFor]] additional longs of
    * [[PreBitsPerLong]] SRP bits each (hyperplane indices offset past the
    * banding sketch's, same declared [[sign]] family), joined at 8 B
    * apiece where the full quantized vector costs ~0.5 KB. Why a separate
    * sketch at all: the BANDING sketch cannot prefilter — a banded
    * candidate already agrees on rpb of its ≤63 bits, and the conditional
    * hamming mean of a random direction over the remaining bits sits
    * almost exactly at any sane τ (measured: ~45% of spurious candidates
    * survive, and the stage-2 payload stays the bottleneck).
    */
  val PreBitsPerLong = 63

  /** First hyperplane index of the prefilter family — clear of the
    * banding family's maximum possible index ([[Bands]]·63 − 1 = 251 at
    * the uncapped width), so no prefilter bit ever repeats a banding bit
    * at ANY band width.
    */
  val PreOffset = 256

  /** How far (in σ of the RANDOM-pair hamming distribution) τ must sit
    * below the random mean for the prune to bite: 3.7σ ⇒ a spurious
    * banded candidate survives with P ≈ 10⁻⁴ (out of ~80 M banded
    * candidates at 632k vectors, ~10⁴ spurious survivors reach the exact
    * verify instead of ~36 M).
    */
  val PreRandomGapSigmas = 3.7

  /** Per-bit disagreement probability of a pair at exactly cosine
    * `threshold` under the SRP family: p = arccos(threshold)/π — the same
    * collision identity the banding S-curve uses. The TRUE-pair loss
    * bound below is computed at this p, i.e. at the worst admissible pair
    * (any pair above the threshold flips strictly fewer bits in
    * expectation).
    */
  def flipProbFor(threshold: Double): Double = math.acos(threshold) / math.Pi

  /** Hamming prefilter bound over `totalPreBits` independent prefilter
    * bits at a given verify threshold: τ = ⌈mean + 4.5σ⌉ of the TRUE-pair
    * distribution Binomial(totalPreBits, [[flipProbFor]](threshold))
    * (declared, replayed in the oracle) — a true pair AT the threshold is
    * pruned with probability < 10⁻⁵. τ must be derived from the operator's
    * actual threshold: the first cut hardcoded p = arccos(0.85)/π while
    * the catalog verifies at cos 0.35, where a true pair flips bits with
    * p ≈ 0.386 (mean ≈ 48.7 over 126 bits, far above that τ = 42) — true
    * pairs in roughly the cos 0.35–0.6 band were silently pruned, and the
    * gate could not see it because the oracle replays the same τ.
    */
  def hammingTauFor(totalPreBits: Int, threshold: Double): Int = {
    val p = flipProbFor(threshold)
    math.ceil(totalPreBits * p + 4.5 * math.sqrt(totalPreBits * p * (1 - p))).toInt
  }

  /** Prefilter width (in [[PreBitsPerLong]]-bit longs) for a verify
    * threshold: the smallest width whose τ (true-pair mean + 4.5σ) still
    * sits ≥ [[PreRandomGapSigmas]] σ below the random-direction mean —
    * solve 0.5·z·√B ≤ (0.5 − p)·B − 4.5·√(B·p(1−p)) for the bit count B.
    * Lower thresholds need wider sketches (the two binomials are closer):
    * cos 0.85 → 2 longs (126 bits, τ 42 — the original fixed width was
    * exactly this point), cos 0.5 → 10, cos 0.35 → 21 (168 B — still 3×
    * under the full vector, and the prune is what keeps the pair frame
    * off the wire). Safety does NOT depend on the width (τ tracks the
    * true-pair distribution at any B); width only buys prune power.
    */
  def preLongsFor(threshold: Double): Int = {
    val p = flipProbFor(threshold)
    require(threshold > 0 && p < 0.5,
      s"hamming prefilter needs a cosine threshold in (0, 1), got $threshold")
    val s = (4.5 * math.sqrt(p * (1 - p)) + 0.5 * PreRandomGapSigmas) / (0.5 - p)
    math.max(1, math.ceil(s * s / PreBitsPerLong).toInt)
  }

  /** `(id, pf_0 … pf_{preLongs−1})`: the prefilter sketch columns —
    * `preLongs` independent [[graft.functions.SrpSketchQ]] longs whose
    * hyperplane indices start at [[PreOffset]], past the banding family's
    * maximum at any width, so no prefilter bit ever repeats a banding bit.
    */
  def preSketches(prepared: DataFrame, id: String, dim: Int,
                  preLongs: Int): DataFrame = {
    val cols = (0 until preLongs).map { l =>
      val byBit = (0 until PreBitsPerLong).map(i =>
        (0 until dim).map(d => sign(PreOffset + l * PreBitsPerLong + i, d)))
      graft.functions.SrpSketchQ(col("q"), byBit).as(s"pf_$l")
    }
    prepared.select(col(id) +: cols: _*)
  }

  /** [[semanticDedupSrpAuto]] with the verify run WITHIN the band bucket —
    * the round-10 production form, and the measured winner over both the
    * pair-frame verify and the hamming-prefilter two-stage form. The pair
    * problem was never compute (a banded candidate costs one 64-MAC dot,
    * ~2 s of arithmetic for 50 M candidates on this box) — it was
    * PAYLOAD: materializing the global candidate-pair list and then
    * joining a ~0.5 KB quantized vector onto EACH SIDE of every pair
    * ships pairs×1 KB (32+ GB at 632k → spill cascade). Here the vectors
    * ride the BAND rows instead — one n·[[Bands]]-row shuffle of ~corpus
    * volume — and the exact cosine evaluates INSIDE the band self-join's
    * output projection (whole-stage codegen, never exchanged); only
    * PASSING pairs reach the distinct. Verdicts are identical to
    * [[semanticDedupSrpWidth]] bit-for-bit (same banding, same verify,
    * spec-pinned), so the oracle is the same band+verify replay. Measured
    * (SCALE.md round 10): 4.4/5.5/14.0 s at 200k/632k/2M — sub-linear,
    * vs 23/299/— single-stage and 15/83/— prefilter two-stage; the
    * cheapest TRAINING-FREE dedup at every measured point.
    */
  def semanticDedupSrpBucketAuto(df: DataFrame, id: String, vec: String,
                                 dim: Int, threshold: Double,
                                 targetBucket: Long = 64L): (Int, DataFrame) = {
    // ONE count job on the checkpointed prepared frame serves both width
    // selection and the band-join partition sizing (the first cut counted
    // df here and p again inside the pair pipeline — two scans of the
    // corpus for one number).
    val p = Similarity.prepare(df, id, vec)
      .select(col(id), col("q"), col("n2")).localCheckpoint(false)
    val n = p.count()
    val rpb = rowsPerBandFor(n, targetBucket)
    (rpb, bucketDupVerdicts(df, p, id, vec, dim, threshold, rpb, n))
  }

  def semanticDedupSrpBucketWidth(df: DataFrame, id: String, vec: String,
                                  dim: Int, threshold: Double,
                                  rowsPerBand: Int): DataFrame = {
    val p = Similarity.prepare(df, id, vec)
      .select(col(id), col("q"), col("n2")).localCheckpoint(false)
    bucketDupVerdicts(df, p, id, vec, dim, threshold, rowsPerBand, p.count())
  }

  /** Shared tail of the two bucket-dedup entry points: pair pipeline →
    * min-id dup_of → left-join verdict frame. `n` is the prepared frame's
    * row count, already known to both callers.
    */
  private def bucketDupVerdicts(df: DataFrame, p: DataFrame, id: String,
                                vec: String, dim: Int, threshold: Double,
                                rowsPerBand: Int, n: Long): DataFrame = {
    val dupOf = bucketPassingPairs(p, id, vec, dim, threshold, rowsPerBand, n)
      .select("id_a", "id_b").distinct()
      .groupBy(col("id_b").as(id)).agg(min(col("id_a")).as("dup_of"))
    df.select(col(id))
      .join(dupOf, Seq(id), "left")
      .select(col(id), col("dup_of"), col("dup_of").isNull.as("is_kept"))
  }

  /** Training-free near-dup PAIR search — the within-bucket verify
    * emitting the passing pairs themselves (`(id_a, id_b, cosine)`,
    * distinct, id_a < id_b): the SRP-banded, fit-free sibling of
    * [[Similarity.cellNearDupPairs]] over learned cells, completing the
    * pair-tier matrix (flat-auto / hier / tree quantizers all need a
    * k-means build; this needs none). Same declared band + verify
    * semantics as [[semanticDedupSrpWidth]], same scale shape as
    * [[semanticDedupSrpBucketWidth]]. Returns the captured width for the
    * oracle replay.
    */
  def nearDupPairsSrpAuto(df: DataFrame, id: String, vec: String, dim: Int,
                          threshold: Double,
                          targetBucket: Long = 64L): (Int, DataFrame) = {
    val p = Similarity.prepare(df, id, vec)
      .select(col(id), col("q"), col("n2")).localCheckpoint(false)
    val n = p.count()
    val rpb = rowsPerBandFor(n, targetBucket)
    (rpb, bucketPassingPairs(p, id, vec, dim, threshold, rpb, n).distinct())
  }

  /** The shared within-bucket pair pipeline: band the prepared frame,
    * ride the vectors on the band rows, evaluate the exact quantized
    * cosine inside the band self-join's projection, and emit passing
    * `(id_a, id_b, cosine)` rows. NOT distinct: a pair colliding in k
    * bands appears k times (its cosine is functionally determined, so
    * callers' distinct collapses them exactly).
    *
    * The band-join partition count is sized to the frame it actually
    * moves — n·[[Bands]] rows of ~(dim·8 + 72) B each. A fixed session
    * partition count hits the external-sort spill cliff once
    * per-partition volume outgrows task memory (measured at 6.3M vectors
    * on local[32]: 114 s at 32 partitions → 59 s at 128, same plan
    * otherwise); sizing by bytes is what a real cluster's AQE
    * initialPartitionNum does. The explicit hash repartition on the join
    * key also means the band self-join needs no further exchange, and
    * the identical subplan on both sides collapses to one
    * ReusedExchange.
    */
  private def bucketPassingPairs(p: DataFrame, id: String, vec: String,
                                 dim: Int, threshold: Double,
                                 rowsPerBand: Int, n: Long): DataFrame = {
    val parts = math.max(
      p.sparkSession.sessionState.conf.numShufflePartitions,
      (n * Bands * (dim * 8L + 72L) / (128L << 20) + 1L).toInt)
    val bv = bandedRows(p, id, vec, dim, rowsPerBand).join(p, Seq(id))
      .repartition(parts, col("band"))
    bv.select(col("band"), col(id).as("id_a"), col("q").as("qa"), col("n2").as("na"))
      .join(bv.select(col("band"), col(id).as("id_b"), col("q").as("qb"),
        col("n2").as("nb")), Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosineQ(Similarity.dotQ(col("qa"), col("qb")),
          col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** [[semanticDedupSrpAuto]] with a TWO-STAGE candidate verify — the fix
    * for the measured srp-auto scale negative (SCALE.md round 9: the
    * single-stage verify ships both full quantized vectors to every banded
    * candidate, ~50 GB of join payload at 632k vectors → spill cascade,
    * 12.8× wall on 3.16× data). Stage 1 joins the [[preLongsFor]]-long
    * independent prefilter sketch ([[preSketches]]) and prunes on hamming
    * distance ([[hammingTauFor]] — width AND τ derived from the operator's
    * verify threshold, so the true-pair and random-direction distributions
    * are ≥ (4.5 + [[PreRandomGapSigmas]])σ apart at ANY threshold, and
    * survivors ≈ true pairs); stage 2 ships full vectors ONLY to survivors
    * and verifies with the exact integer cosine, identical to the
    * single-stage form. The prefilter is part of the operator's declared
    * semantics (a true pair beyond τ is dropped — probability < 10⁻⁵ AT
    * the dedup threshold, lower above it) and the oracle replays
    * sketch → band → hamming → verify bit-for-bit, so the gate stays
    * hash-exact.
    *
    * REGIME LIMIT, measured (SCALE.md round 10): the prune only bites
    * when the bucket-mate cosine mass sits BELOW τ's implied cosine
    * (≈ 0.17 at threshold 0.35) — the SemDeDup/high-dimension regime. On
    * the d = 64 vec fixtures at n ≥ 632k, bucket-mates are conditioned on
    * agreeing rpb sketch bits and their cosines center ≈ 0.2+, so ~2/3 of
    * candidates survive τ and stage 2 pays the pair payload anyway
    * (83 s at 632k). Use [[semanticDedupSrpBucketWidth]], whose cost does
    * not depend on where the candidate mass sits, as the production form.
    */
  def semanticDedupSrpPrefilter(df: DataFrame, id: String, vec: String,
                                dim: Int, threshold: Double,
                                targetBucket: Long = 64L): (Int, DataFrame) = {
    val rpb = rowsPerBandFor(df.count(), targetBucket)
    (rpb, semanticDedupSrpPrefilterWidth(df, id, vec, dim, threshold, rpb))
  }

  /** The two-stage pipeline at an explicit band width; `tau` < 0 derives
    * [[hammingTauFor]] at the verify threshold (an explicit
    * τ ≥ preLongs·PreBitsPerLong disables pruning — the spec pins that
    * degenerate form ≡ [[semanticDedupSrpWidth]]).
    */
  def semanticDedupSrpPrefilterWidth(df: DataFrame, id: String, vec: String,
                                     dim: Int, threshold: Double,
                                     rowsPerBand: Int, tau: Int = -1): DataFrame = {
    val preLongs = preLongsFor(threshold)
    val t = if (tau < 0) hammingTauFor(preLongs * PreBitsPerLong, threshold) else tau
    val p = Similarity.prepare(df, id, vec)
      .select(col(id), col("q"), col("n2")).localCheckpoint(false)
    val bands0 = bandedRows(p, id, vec, dim, rowsPerBand).localCheckpoint(false)
    // The prefilter sketch (one narrow codegen pass per vector) rides ON
    // the band rows — PreLongs·8 B of extra payload on the n·Bands-row
    // band frame — so the hamming prune evaluates INSIDE the band join's
    // output projection. The candidate pair frame is never exchanged: the
    // only pair-volume work is the in-partition popcount, and the distinct
    // + exact verify see survivors only (≈ true pairs at the declared τ).
    // The first cut of this operator joined the sketches onto the pair
    // frame instead — three full pair-frame shuffles, measured 10.6× on
    // 3.16× data at the 632k→2M step from spill alone.
    val bandsPf = bands0
      .join(preSketches(p, id, dim, preLongs), Seq(id))
      .localCheckpoint(false)
    val hamming = (0 until preLongs)
      .map(l => bit_count(col(s"pa_$l").bitwiseXOR(col(s"pb_$l"))))
      .reduce(_ + _)
    val pre = bandsPf
      .select(col(id).as("id_a") +: col("band") +:
        (0 until preLongs).map(l => col(s"pf_$l").as(s"pa_$l")): _*)
      .join(bandsPf.select(col(id).as("id_b") +: col("band") +:
        (0 until preLongs).map(l => col(s"pf_$l").as(s"pb_$l")): _*),
        Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .filter(hamming <= t)
      .select("id_a", "id_b").distinct()
    // stage 2: full vectors for survivors only, exact integer cosine
    val dupOf = pre
      .join(p.select(col(id).as("id_a"), col("q").as("qa"), col("n2").as("na")),
        Seq("id_a"))
      .join(p.select(col(id).as("id_b"), col("q").as("qb"), col("n2").as("nb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosineQ(Similarity.dotQ(col("qa"), col("qb")),
          col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy(col("id_b").as(id)).agg(min(col("id_a")).as("dup_of"))
    df.select(col(id))
      .join(dupOf, Seq(id), "left")
      .select(col(id), col("dup_of"), col("dup_of").isNull.as("is_kept"))
  }

  def annTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
              dim: Int, k: Int): DataFrame = {
    val pc = Similarity.prepare(corpus, id, vec)
    val pq = Similarity.prepare(queries, id, vec)
    val bc = bandRows(sketches(pc, id, vec, dim), id)
      .select(col(id).as("nn_id"), col("band"))
    val bq = bandRows(sketches(pq, id, vec, dim), id)
      .select(col(id).as("query_id"), col("band"))
    val cand = bc.join(broadcast(bq), Seq("band"))
      .filter(col("nn_id") =!= col("query_id"))
      .select("query_id", "nn_id").distinct()
    val scored = cand
      .join(pc.select(col(id).as("nn_id"), col("q").as("cq"), col("n2").as("cn2")),
        Seq("nn_id"))
      .join(broadcast(pq.select(col(id).as("query_id"), col("q").as("qq"),
        col("n2").as("qn2"))), Seq("query_id"))
      .select(col("query_id"), col("nn_id"),
        Similarity.cosineQ(Similarity.dotQ(col("qq"), col("cq")),
          col("qn2"), col("cn2")).as("cosine"))
    graft.ops.Relational.topKPerGroup(scored, Seq("query_id"),
      Seq(col("cosine").desc, col("nn_id").asc), k)
  }
}
