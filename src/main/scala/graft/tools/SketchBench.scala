package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-N evidence run for the sketch family (`operators.Sketch` —
  * q192/q193/q195/q196): a deterministic synthetic token stream with
  * planted heavy hitters, at occurrence counts the sf testdata can't
  * reach.
  *
  * Stream: `n` token occurrences. Every 10th occurrence is one of 10
  * planted hot tokens (each ≈ n/100 occurrences, 1000× any tail
  * token); the rest spread uniformly over a 1M-term tail vocabulary.
  *
  * Claims under test:
  *  - CMS state is depth × width rows NO MATTER n (the map-side
  *    combine bounds every partition's shuffle contribution the same
  *    way) — require-gated on the materialized cell count;
  *  - every planted hot token's estimate ≥ its exact count
  *    (overestimate-only), and the hot 10 are exactly the top 10 by
  *    estimate among hot ∪ sampled-tail candidates — the heavy-hitter
  *    job done in fixed memory;
  *  - half-stream sketches MERGE to the whole-stream sketch cell-for-
  *    cell at this n (the q193 gate's property, at scale);
  *  - the portable-md5 cell hash (the oracle-replayable gated path) vs
  *    xxhash64 (the production path) is a measured constant, not a
  *    guess;
  *  - HLL: 64 exact register rows estimate ~1M distinct within the
  *    m = 64 error regime (σ ≈ 13%), require-gated at 3σ.
  *
  * Usage: `sbt "runMain graft.tools.SketchBench [n]"` (default
  * 100_000_000). Results recorded in BASELINE.md and
  * `bench/large_sketch.txt`.
  */
object SketchBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-52s $s%9.2f s"); (r, s)
    }
    import graft.operators.Sketch

    val depth = 4; val width = 65536
    val toks = spark.range(n).select(
      when(pmod(col("id"), lit(10)) === 0,
          concat(lit("hot"), pmod(xxhash64(col("id")), lit(10L))))
        .otherwise(concat(lit("t"), pmod(xxhash64(col("id") * 7), lit(1000000L))))
        .as("w"))
    println(s"n = $n occurrences; 10 planted hot tokens (~${n / 100} each), " +
      "1M-term uniform tail")

    // --- CMS: fixed state, overestimate-only, heavy hitters recovered ---
    val (cellsAndN, tXx) = time(s"countMinCells xxhash64 (production hash), ${depth}x$width") {
      val c = Sketch.countMinCells(toks, "w", depth, width, portable = false).cache()
      (c, c.count())
    }
    val (cells, nCells) = cellsAndN
    require(nCells <= depth.toLong * width,
      s"state must stay bounded: $nCells > ${depth * width}")
    println(f"  materialized state: $nCells cells (bound ${depth * width})")
    val (_, tMd5) = time("countMinCells md5 (oracle-portable gated path)")(
      Sketch.countMinCells(toks, "w", depth, width).count())
    println(f"  hash-portability cost: md5/xxhash64 wall = ${tMd5 / tXx}%.1f x")

    val hot = toks.where(col("w").startsWith("hot"))
      .groupBy("w").agg(count(lit(1)).as("n_true"))
    val tailSample = spark.range(200).select(
      concat(lit("t"), pmod(xxhash64(col("id") * 13), lit(1000000L))).as("w"))
      .distinct()
    val candidates = hot.select("w").unionByName(tailSample)
    val (est, _) = time("cmEstimate over hot + 200 sampled tail candidates") {
      val e = Sketch.cmEstimate(cells, candidates, "w", depth, width,
        portable = false).join(hot, Seq("w"), "left").cache()
      e.count(); e
    }
    val hotRows = est.where(col("n_true").isNotNull).collect()
    require(hotRows.length == 10, s"expected 10 hot tokens, got ${hotRows.length}")
    hotRows.foreach { r =>
      require(r.getLong(1) >= r.getLong(2),
        s"${r.getString(0)} undercounted: ${r.getLong(1)} < ${r.getLong(2)}")
    }
    val top10 = est.orderBy(desc("n_cm"), col("w")).limit(10)
      .collect().map(_.getString(0)).toSet
    require(top10.forall(_.startsWith("hot")),
      s"top-10 by estimate must be the planted hot set: $top10")
    val maxOver = hotRows.map(r => r.getLong(1) - r.getLong(2)).max
    println(f"  hot-token recovery exact; max overcount $maxOver " +
      f"(bound 2n/width = ${2.0 * n / width}%.0f)")

    // --- merge distributivity at scale ---
    val (mergedEq, _) = time("half-stream sketches merged == whole (cell-for-cell)") {
      def half(p: Int) = Sketch.countMinCells(
        spark.range(n).where(pmod(col("id"), lit(2)) === p).select(
          when(pmod(col("id"), lit(10)) === 0,
              concat(lit("hot"), pmod(xxhash64(col("id")), lit(10L))))
            .otherwise(concat(lit("t"),
              pmod(xxhash64(col("id") * 7), lit(1000000L)))).as("w")),
        "w", depth, width, portable = false)
      val merged = Sketch.cmMerge(half(0), half(1)).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val whole = cells.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      merged == whole
    }
    require(mergedEq, "merge must equal the whole-stream sketch")

    // --- HLL: 64 rows estimating ~1M distinct ---
    val (regsAndN, _) = time("hllRegisters (portable md5, 1 hash/occurrence)") {
      val r = Sketch.hllRegisters(toks, "w", Nil).cache()
      (r, r.count())
    }
    val (regs, nRegs) = regsAndN
    require(nRegs <= Sketch.HllM, s"$nRegs registers > ${Sketch.HllM}")
    val (truth, _) = time("exact distinct (the pass HLL exists to avoid)")(
      toks.distinct().count())
    val e = Sketch.hllEstimate(regs, Nil).collect().head.getDouble(2)
    val relErr = math.abs(e - truth) / truth
    println(f"  HLL estimate $e%.0f vs exact $truth (rel err $relErr%.3f, " +
      f"state $nRegs rows)")
    require(relErr < 0.39, f"HLL must land within 3 sigma (39%%): $relErr%.3f")

    spark.stop()
  }
}
