package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * exactly-once semantics for the additive merge. */
  private def readParts(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"$path/parts").dropDuplicates()

  /** The CURRENT count-min sketch under a maintained path: cell-wise sum
    * of every appended per-batch partial — exact by q193's
    * distributivity, over at most batches × depth × width stored rows
    * (compact by rewriting the merged frame if that ever matters). */
  def cmRead(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    readParts(spark, path)
      .groupBy("d", "cell").agg(sum("cnt").as("cnt"))

  /** The CURRENT HLL registers under a maintained path: register-wise
    * max of every appended partial (q196's merge). */
  def hllRead(spark: org.apache.spark.sql.SparkSession, path: String,
      by: Seq[String]): DataFrame =
    hllMergeAll(readParts(spark, path).drop("batch_id"), by)

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
