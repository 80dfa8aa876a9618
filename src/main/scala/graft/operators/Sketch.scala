package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the fixed-size answer to "what are the
  * heavy hitters?" at corpus scales where an exact token histogram's
  * long tail no longer fits anywhere.
  *
  * Count-min (Cormode & Muthukrishnan 2005): `depth` hash rows of
  * `width` counters; every occurrence increments one counter per row;
  * a point estimate is the MIN over its row counters. Estimates never
  * undercount (every counter the key touches holds at least its true
  * count) and overshoot by at most ~2N/width with probability
  * 1 − 2^−depth. The 100 TB properties this file is built around:
  *
  *  - **Fixed state.** The sketch is `depth × width` cells no matter the
  *    corpus — the shuffle after the cell map is map-side-combined down
  *    to at most that many rows per partition, and the result broadcasts.
  *  - **Distributive merge.** Sketches over disjoint shards sum cell-wise
  *    into exactly the whole-corpus sketch ([[cmMerge]]) — sketch each
  *    ingest batch once, never rescan; q193 gates the equality exactly.
  *  - **Portable.** Cells hash with [[TextOps.portableHash]] (md5-derived),
  *    so the DuckDB oracle rebuilds the identical sketch from the raw
  *    rows — the estimates are deterministic, not just probabilistic.
  *
  * The reference has no sketch operators; this extends its exact
  * aggregate family (server.py's MIN/MAX/AVG pushdowns) with the
  * bounded-memory form those aggregates need beyond single-node scale.
  */
object Sketch {

  /** Hash seed for the sketch family (fresh vs every other seeded family:
    * Dedup 1–13, CjkHashSeed 41, PocketSeed 53). */
  val CmSeed = 61

  /** The counter cell a token lands in on hash row `d`:
    * `pmod(portableHash(d || ':' || token, CmSeed), width)`. One md5 per
    * (row, occurrence), codegen'd, identical in DuckDB. `portable =
    * false` swaps in xxhash64 over the same input — the production hash
    * (≈20× the md5 throughput; every CMS guarantee is hash-agnostic),
    * kept out of the gated queries because DuckDB can't replay it. */
  def cmCell(d: Column, token: Column, width: Int,
      portable: Boolean = true): Column = {
    val input = concat(d.cast("string"), lit(":"), token)
    val h = if (portable) TextOps.portableHash(input, CmSeed)
      else xxhash64(lit(CmSeed), input)
    pmod(h, lit(width.toLong))
  }

  /** Build the sketch over a token-occurrence stream (one row per
    * occurrence): explode `depth` hash rows per occurrence, map each to
    * its cell, and count. Output `(d, cell, cnt)` — at most depth×width
    * rows regardless of input size (the partial aggregate bounds every
    * partition's shuffle contribution to the same ceiling). */
  def countMinCells(df: DataFrame, token: String,
      depth: Int, width: Int, portable: Boolean = true): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth,width >= 1; got $depth,$width")
    df.select(explode(sequence(lit(0L), lit((depth - 1).toLong))).as("d"),
        col(token).as("__t"))
      .groupBy(col("d"), cmCell(col("d"), col("__t"), width, portable).as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for the keys in `keys(key)`: re-derive each key's
    * `depth` cells, left-join the sketch (an absent cell counts 0 — only
    * possible for a key the sketch never saw), and take the row MIN.
    * Join build side is the sketch itself (≤ depth×width rows,
    * broadcast), so estimating is map-only over the keys. */
  def cmEstimate(cells: DataFrame, keys: DataFrame, key: String,
      depth: Int, width: Int, portable: Boolean = true): DataFrame = {
    val probes = keys
      .select(col(key),
        explode(sequence(lit(0L), lit((depth - 1).toLong))).as("d"))
      .withColumn("cell", cmCell(col("d"), col(key), width, portable))
    probes
      .join(broadcast(cells), Seq("d", "cell"), "left")
      .groupBy(col(key))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_cm"))
  }

  /** Cell-wise sum of two sketches built with the same (depth, width,
    * seed) — the distributive merge that lets each shard/batch be
    * sketched once and combined at read time. Union + re-aggregate:
    * both inputs are already ≤ depth×width rows, so this is a bounded
    * local operation however large the corpora behind them. */
  def cmMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("d", "cell")
      .agg(sum("cnt").as("cnt"))

  /** Inner-product (equi-JOIN SIZE) estimate from two sketches built
    * with the same (depth, width, seed): est = min over hash rows of
    * Σ_cell a_d[cell]·b_d[cell] (Cormode & Muthukrishnan §4.2). Never
    * undercounts the true Σ_key f_a(key)·f_b(key) — the join
    * cardinality — and overshoots by ≤ 2·N_a·N_b/width in expectation
    * per row, min-reduced across rows. This is the cardinality
    * estimate a join planner wants BEFORE committing to a shuffle at
    * 100 TB, priced at one ≤ depth×width-row join of two already-built
    * sketches — no data touched. */
  def cmInnerProduct(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("d"), col("cell"), col("cnt").as("__a"))
      .join(b.select(col("d"), col("cell"), col("cnt").as("__b")),
        Seq("d", "cell"))
      .groupBy(col("d")).agg(sum(col("__a") * col("__b")).as("__ip"))
      .agg(min("__ip").as("join_size_cm"))

  // --- HyperLogLog (Flajolet et al. 2007): mergeable distinct-count ---
  // Count-min answers "how often"; HLL answers "how many distinct" in the
  // same fixed-state, distributive-merge shape: m registers, register j
  // holding the max rank (leading-zero run + 1) of any hash that landed
  // there. Register-wise MAX of per-shard sketches IS the union's sketch
  // — duplicates are free (max is idempotent), which is the whole trick.

  /** HLL hash seed (fresh vs CmSeed 61 and every other seeded family). */
  val HllSeed = 67

  /** Register count m = 2^6. With the 60-bit portable hash: low 6 bits
    * pick the register, the remaining 54 bits feed the rank. */
  val HllM = 64
  private val HllSuffixBits = 54

  /** Register index of a token: the hash's low 6 bits. */
  def hllIdx(token: Column): Column =
    pmod(TextOps.portableHash(token, HllSeed), lit(HllM.toLong))

  /** Rank of a token: leading zeros of its 54-bit hash suffix + 1,
    * computed as `55 − bitlength(suffix)` where bitlength is the BINARY
    * STRING length (`length(bin(x))` = ⌊log₂x⌋+1) — exact integer
    * arithmetic in both engines, no float log anywhere. An all-zero
    * suffix ranks 55. */
  def hllRank(token: Column): Column = {
    val suffix = shiftright(TextOps.portableHash(token, HllSeed), 6)
    when(suffix === 0L, lit(HllSuffixBits + 1L))
      .otherwise(lit(HllSuffixBits + 1L) - length(bin(suffix)))
  }

  /** Per-`by`-group HLL registers over a token stream: at most m
    * non-empty `(by…, idx, rank)` rows per group however large the
    * stream (absent registers are implicitly rank 0). Map-side combine
    * bounds every partition's shuffle contribution to groups × m rows;
    * duplicate tokens never change a register. */
  def hllRegisters(df: DataFrame, token: String, by: Seq[String]): DataFrame = {
    // the output grows idx/rank next to `by` — a grouping column of
    // either name would emit a duplicate-named frame (fail loud, the
    // requireFresh convention)
    require(!by.contains("idx") && !by.contains("rank"),
      s"grouping columns $by collide with the register columns idx/rank")
    df.groupBy(by.map(col) :+ hllIdx(col(token)).as("idx"): _*)
      .agg(max(hllRank(col(token))).as("rank"))
  }

  /** Register-wise max over any number of stacked register sets — the
    * union's exact sketch (the distributive merge; q196 gates it
    * against a directly-built sketch). Works across shards AND across
    * `by` regroupings: collapsing per-source sketches with `by = Nil`
    * yields the global sketch. */
  def hllMergeAll(stacked: DataFrame, by: Seq[String]): DataFrame =
    stacked
      .groupBy(by.map(col) :+ col("idx"): _*)
      .agg(max("rank").as("rank"))

  /** Binary form of [[hllMergeAll]]. */
  def hllMerge(a: DataFrame, b: DataFrame, by: Seq[String]): DataFrame =
    hllMergeAll(a.unionByName(b), by)

  // --- persisted maintenance (the index-family batch-tag discipline) ---

  /** Append one micro-batch's PARTIAL sketch (count-min cells or HLL
    * registers — any mergeable row shape) to a persisted sketch
    * directory, replay-guarded: `foreachBatch` is at-least-once, and a
    * retried batch would otherwise double-count CMS cells (HLL's max
    * would shrug, but the guard is the family contract). The marker is
    * written AFTER the append, so a crash between them re-runs the
    * batch — and because a replayed deterministic partial is
    * ROW-IDENTICAL, the stored rows carry their batch id and the read
    * side dedupes on `(batch_id, row)`: even the torn-state replay
    * cannot double-count (SketchSpec pins it). Returns false for an
    * already-applied batch id. */
  def sketchAppendBatch(path: String, partial: DataFrame,
      batchId: Long): Boolean = {
    val spark = partial.sparkSession
    require(!partial.columns.contains("batch_id"),
      "partial already has a 'batch_id' column — the append path owns it")
    val last = graft.sources.Markers.readLastBatch(spark, s"$path/lastbatch")
    if (batchId <= last) false
    else {
      partial.withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(s"$path/parts")
      graft.sources.Markers.writeLastBatch(spark, s"$path/lastbatch", batchId)
      true
    }
  }

  /** Every appended partial, torn-state replays collapsed: a batch that
    * was appended twice (crash between append and marker) wrote
    * byte-identical rows, so distinct-by-(batch_id, row) restores
    * exactly-once semantics for the additive merge. Public so sibling
    * families with non-sum merges ([[Stats.statsRead]]'s min/max
    * columns) reuse the same replay discipline. */
  def dedupedParts(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"$path/parts").dropDuplicates()

  private def readParts(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = dedupedParts(spark, path)

  /** The CURRENT additive aggregate under a maintained path, for ANY
    * `(keys…, value)` partial row shape whose merge is a keyed sum —
    * count-min cells, weighted edge lists (q217), any distributive
    * counter family. Exact because per-batch partials partition the
    * underlying rows. */
  def sumRead(spark: org.apache.spark.sql.SparkSession, path: String,
      keys: Seq[String], value: String): DataFrame =
    readParts(spark, path)
      .groupBy(keys.map(col): _*).agg(sum(value).as(value))

  /** The CURRENT count-min sketch under a maintained path: cell-wise sum
    * of every appended per-batch partial — exact by q193's
    * distributivity, over at most batches × depth × width stored rows
    * (compact by rewriting the merged frame if that ever matters). */
  def cmRead(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    sumRead(spark, path, Seq("d", "cell"), "cnt")

  /** The CURRENT HLL registers under a maintained path: register-wise
    * max of every appended partial (q196's merge). */
  def hllRead(spark: org.apache.spark.sql.SparkSession, path: String,
      by: Seq[String]): DataFrame =
    hllMergeAll(readParts(spark, path).drop("batch_id"), by)

  // --- KMV / bottom-k (Bar-Yossef et al. 2002; Beyer et al. 2007) ---
  // The third sketch family closes the one gap the first two leave: SET
  // OPERATIONS. Count-min estimates frequencies, HLL estimates union
  // cardinalities (register-max IS union), but neither can estimate an
  // INTERSECTION — "how much does source A's vocabulary overlap source
  // B's?" is the question a dedup/mixture planner asks before pricing a
  // cross-source dedup pass. KMV can: the sketch is the k smallest
  // distinct hash values of the set, a UNIFORM SAMPLE of the distinct
  // elements below a data-derived threshold θ (the kth minimum). Two
  // sketches' samples are comparable because they hash identically, so
  // |A∩B| ≈ (|S_A ∩ S_B ∩ [0,θ_∪)| / k) · ((k−1)·2^60/θ_∪). Everything
  // except the final division is exact integer arithmetic over at most
  // k rows per set — gated per the q201 integer-core discipline; the
  // float estimate itself is SketchSpec's to audit.

  /** KMV hash seed (fresh vs CmSeed 61, HllSeed 67, and every other
    * seeded family). */
  val KmvSeed = 71

  /** Sketch size k. 16 keeps the gated artifacts small while the
    * testdata vocabulary (~31 words) still exercises the sub-k exact
    * regime AND the thresholded regime across source pairs. */
  val KmvK = 16

  /** Fan-out of the first exact top-k phase ([[kmvSketch]]). */
  private val KmvBuckets = 32L

  /** The element hash a KMV sketch samples by: the 60-bit portable
    * hash, so the DuckDB oracle rebuilds the identical sample. */
  def kmvHash(token: Column): Column = TextOps.portableHash(token, KmvSeed)

  /** Per-`by`-group KMV sketch over a token column: the `k` smallest
    * DISTINCT hash values, positions attached — `(by…, pos, h)`,
    * `pos ∈ [1, k]`, at most k rows per group however large the stream.
    *
    * Exact bottom-k WITHOUT a per-group global sort of the distinct
    * values: phase 1 takes the per-(group, h mod 32) bottom-k — 32
    * independent 1/32-size sorts whose outputs are ≤ 32·k rows per
    * group (any value in the true bottom-k is trivially in its own
    * bucket's bottom-k) — and phase 2 re-ranks those survivors. The
    * unbounded work is the DISTINCT, which is map-side combinable; both
    * windows sort bounded shards. Same result as the one-window form,
    * gated identical in the oracle (which uses the direct form — the
    * equality IS part of what the gate proves). */
  def kmvSketch(df: DataFrame, token: String, by: Seq[String],
      k: Int = KmvK): DataFrame = {
    require(k >= 2, s"need k >= 2 (the estimator uses k-1); got $k")
    require(!by.contains("pos") && !by.contains("h"),
      s"grouping columns $by collide with the sketch columns pos/h")
    val dist = df.select(by.map(col) :+ kmvHash(col(token)).as("h"): _*)
      .distinct()
    kmvMinK(dist, by, k)
  }

  /** Bottom-k of an already-hashed `(by…, h)` frame (dedups `h` within
    * each group first) — the merge primitive: stacking any number of
    * KMV samples and taking [[kmvMinK]] yields exactly the union's
    * sketch, because the union's k minima are all minima of some input
    * (q206 gates the equality against a directly-built sketch). */
  def kmvMinK(hashed: DataFrame, by: Seq[String], k: Int = KmvK): DataFrame = {
    val dist = hashed
      .select(by.map(col) :+ col("h"): _*)
      .distinct()
      .withColumn("__b", pmod(col("h"), lit(KmvBuckets)))
    val grp = if (by.isEmpty) Seq(lit(1)) else by.map(col)
    val w1 = Window.partitionBy(grp :+ col("__b"): _*).orderBy("h")
    val survivors = dist
      .withColumn("__r", row_number().over(w1))
      .where(col("__r") <= k)
      .drop("__r", "__b")
    val w2 = Window.partitionBy(grp: _*).orderBy("h")
    survivors
      .withColumn("pos", row_number().over(w2))
      .where(col("pos") <= k)
      .select(by.map(col) ++ Seq(col("pos"), col("h")): _*)
  }

  /** Pairwise distinct-INTERSECTION integer core from per-group KMV
    * samples: for every group pair (a < b), the union threshold
    * `theta` (the kth minimum of the two samples' union — the union's
    * own max sample value when it has fewer than k distinct hashes) and
    * `n_inter`, the number of hash values in BOTH samples below-or-at
    * theta. The float estimate is `n_inter/k · (k−1)·2^60/theta`
    * (exact-regime `n_inter` when the union is sub-k); this returns the
    * integers it is computed from. Cost: the samples are ≤ k rows per
    * group, so the pair grid is a broadcast-scale self-join — the whole
    * point is pricing cross-source overlap WITHOUT touching the data
    * again. */
  def kmvIntersect(samples: DataFrame, by: String, k: Int = KmvK): DataFrame = {
    val pairs = samples.select(col(by).as("ga")).distinct()
      .crossJoin(broadcast(samples.select(col(by).as("gb")).distinct()))
      .where(col("ga") < col("gb"))
    val a = samples.select(col(by).as("ga"), col("h"))
    val b = samples.select(col(by).as("gb"), col("h"))
    val union = pairs.join(a, "ga").select(col("ga"), col("gb"), col("h"))
      .unionByName(pairs.join(b, "gb").select(col("ga"), col("gb"), col("h")))
      .distinct()
    val w = Window.partitionBy("ga", "gb").orderBy("h")
    val theta = union
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= k)
      .groupBy("ga", "gb")
      .agg(max("h").as("theta"), count(lit(1)).as("k_u"))
    val common = a.join(b, "h").select(col("ga"), col("gb"), col("h"))
    theta
      .join(common, Seq("ga", "gb"), "left")
      .groupBy(col("ga"), col("gb"), col("theta"), col("k_u"))
      .agg(sum(when(col("h").isNotNull && col("h") <= col("theta"), 1L)
        .otherwise(0L)).as("n_inter"))
  }

  /** The CURRENT KMV sample under a maintained path ([[sketchAppendBatch]]
    * appends per-batch `(by…, pos, h)` partials): bottom-k of every
    * appended sample — exact by q206's merge property; duplicates
    * across batches are free (min-k is idempotent), so at-least-once
    * ingest needs no further care beyond the family's batch-tag
    * dedupe. */
  def kmvRead(spark: org.apache.spark.sql.SparkSession, path: String,
      by: Seq[String], k: Int = KmvK): DataFrame =
    kmvMinK(
      graft.operators.Rtbf.dropForgotten(
        readParts(spark, path).drop("batch_id", "pos"), spark, path, "h"),
      by, k)

  /** RTBF for the persisted KMV sample: tombstone HASH values —
    * [[kmvRead]] stops returning them immediately, re-min-k-ing the
    * survivors. KMV rows are value hashes, not documents, so the CALLER
    * derives the forgotten doc's EXCLUSIVE hashes (its token hashes
    * anti-joined against the retained corpus's — one pass; deleting a
    * hash another retained doc still contributes would under-count it,
    * and q238 gates the exclusive-hash flow). Honesty note (the q230
    * count-min contrast): a bottom-k sample cannot REFILL — deleting a
    * sampled hash leaves ≤ k−1 survivors until fresh ingest or a
    * rebuild supplies new minima, so post-delete estimates are
    * conservative (valid on the surviving subset). [[kmvPurge]] drops
    * the tombstoned hashes physically. */
  def kmvForgetHashes(spark: org.apache.spark.sql.SparkSession,
      path: String, hashes: DataFrame, h: String = "h"): Unit =
    graft.operators.Rtbf.forget(hashes, path, h)

  /** PURGE the KMV sample's tombstoned hashes: atomic rewrite of
    * `<path>/parts` as the current LIVE per-group sample (min-k is
    * idempotent, so one compact part replaces every appended partial —
    * small-files compaction for free), then the tombstones clear. The
    * `lastbatch` marker stays valid: purge is maintenance, not a
    * rebuild, and later appends keep their replay guard. */
  def kmvPurge(spark: org.apache.spark.sql.SparkSession, path: String,
      by: Seq[String], k: Int = KmvK): Unit = {
    import graft.operators.Rtbf
    if (Rtbf.hasTombstones(spark, path)) {
      val live = graft.engine.Checkpoints.mark(
        kmvRead(spark, path, by, k).withColumn("batch_id", lit(-1L)))
      try Rtbf.swapRewrite(spark, path, "parts", live)
      finally graft.engine.Checkpoints.release(live)
      Rtbf.clearTombstones(spark, path)
    }
  }

  /** The HLL cardinality estimate per `by` group. The harmonic sum is
    * kept EXACT in integers scaled by 2⁵⁵ (absent registers contribute
    * 2⁵⁵ each; max rank 55 contributes 1 — a BIGINT sum bounded by
    * m·2⁵⁵ ≈ 2.3e18), so the only float ops are the final division and
    * the small-range linear-counting branch (m·ln(m/V) when the raw
    * estimate ≤ 2.5m and empty registers remain — Flajolet's standard
    * correction, without which small cardinalities bias high). */
  def hllEstimate(regs: DataFrame, by: Seq[String]): DataFrame = {
    val m = HllM.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val keys = if (by.isEmpty) Seq(lit(1).as("__g")) else by.map(col)
    val g = regs
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("nonzero"),
        sum(expr("shiftleft(cast(1 as bigint), cast(55 - rank as int))"))
          .as("present_sum"))
      .withColumn("v", lit(HllM.toLong) - col("nonzero"))
      .withColumn("harmonic_scaled",
        col("present_sum") + col("v") * lit(1L << HllSuffixBits << 1))
    val raw = lit(alpha * m * m * math.pow(2.0, 55)) / col("harmonic_scaled")
    val est = when(raw <= 2.5 * m && col("v") > 0,
      lit(m) * log(lit(m) / col("v"))).otherwise(raw)
    g.select((if (by.isEmpty) Seq.empty[Column] else by.map(col)) ++
      Seq(col("v"), col("harmonic_scaled"), est.as("estimate")): _*)
  }
}
