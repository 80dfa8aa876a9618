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
    * (row, occurrence), codegen'd, identical in DuckDB. */
  def cmCell(d: Column, token: Column, width: Int): Column =
    pmod(TextOps.portableHash(
      concat(d.cast("string"), lit(":"), token), CmSeed), lit(width.toLong))

  /** Build the sketch over a token-occurrence stream (one row per
    * occurrence): explode `depth` hash rows per occurrence, map each to
    * its cell, and count. Output `(d, cell, cnt)` — at most depth×width
    * rows regardless of input size (the partial aggregate bounds every
    * partition's shuffle contribution to the same ceiling). */
  def countMinCells(df: DataFrame, token: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth,width >= 1; got $depth,$width")
    df.select(explode(sequence(lit(0L), lit((depth - 1).toLong))).as("d"),
        col(token).as("__t"))
      .groupBy(col("d"), cmCell(col("d"), col("__t"), width).as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for the keys in `keys(key)`: re-derive each key's
    * `depth` cells, left-join the sketch (an absent cell counts 0 — only
    * possible for a key the sketch never saw), and take the row MIN.
    * Join build side is the sketch itself (≤ depth×width rows,
    * broadcast), so estimating is map-only over the keys. */
  def cmEstimate(cells: DataFrame, keys: DataFrame, key: String,
      depth: Int, width: Int): DataFrame = {
    val probes = keys
      .select(col(key),
        explode(sequence(lit(0L), lit((depth - 1).toLong))).as("d"))
      .withColumn("cell", cmCell(col("d"), col(key), width))
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
}
