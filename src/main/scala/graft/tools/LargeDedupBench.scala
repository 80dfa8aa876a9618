package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-N evidence run for the transitive-dedup pipeline (q54 shape):
  * MinHash signatures → LSH bands → per-bucket star edges → connected
  * components, over a deterministic synthetic corpus orders of magnitude
  * beyond any testdata scale factor. The claims under test: signature and
  * banding are map-only; edge generation is linear in bucket size (star,
  * not clique); the label-propagation loop runs O(log diameter) rounds of
  * pure shuffles over a once-materialized edge set.
  *
  * Corpus shape: `n` docs in clusters of ~5 (doc i belongs to cluster
  * i/5); within a cluster, even docs share the exact template and odd docs
  * vary one token — so every cluster is one expected component joined
  * through near-dup collisions. Deterministic (no RNG): reruns comparable.
  *
  * Usage: `SPARK_DRIVER_MEM=32g sbt "runMain graft.tools.LargeDedupBench [n]"`
  * Default n = 5,000,000 docs. Results recorded in BASELINE.md
  * ("Large-N dedup evidence").
  *
  * `runMain graft.tools.LargeDedupBench chain [n]` runs the DIAMETER
  * stress instead: a path graph of n nodes (diameter n−1 — the
  * worst-case shape for label propagation, which LSH-derived graphs
  * never exhibit because bucket stars are depth-2). The claim under
  * test is the O(log diameter) convergence of the pointer-jumping loop:
  * plain min-label propagation would need ~n rounds on a path; the
  * jump halves label-chain depth per round, so iterations ≈ log₂(n)
  * (plus the fixpoint-detection round) and per-round cost stays flat —
  * each round is the same bounded pair of shuffles over n labels.
  */
object LargeDedupBench {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("chain")) return chainMain(args.drop(1))
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
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
      println(f"$name%-34s $s%9.2f s"); (r, s)
    }
    import graft.operators.Dedup
    import graft.queries.LlmQueries.{NumHashes, Bands}

    println(s"corpus n = $n docs (clusters of 5, one-token variants)")
    // cluster-specific vocabulary (position-prefixed pseudo-tokens) so
    // cross-cluster Jaccard is ~0 while within-cluster docs share 8 of 9
    // tokens (odd docs vary the last token -> near-dup, J = 0.8)
    val c = expr("id div 5")
    val docs = spark.range(0L, n).select(
      col("id").as("doc_id"),
      format_string(
        "t%d a%d b%d c%d d%d e%d f%d g%d %s",
        c * 8L, c * 8L + 1L, c * 8L + 2L, c * 8L + 3L,
        c * 8L + 4L, c * 8L + 5L, c * 8L + 6L, c * 8L + 7L,
        when(col("id") % 2L === 0L, lit("even")).otherwise(
          concat(lit("odd"), (col("id") % 5L).cast("string")))).as("text"))

    val sig = docs.select(col("doc_id"),
      graft.functions.MinHashSig.minhash_sig(col("text"), NumHashes).as("__sig"))
      .select(col("doc_id") +:
        (0 until NumHashes).map(i => element_at(col("__sig"), i + 1).as(s"m$i")): _*)
    val (_, sigS) = time("minhash signatures (map-only)")(sig.count())
    val banded = Dedup.lshBands(sig, "doc_id", NumHashes, Bands)
    val star = Dedup.lshStarEdges(banded, "doc_id", Bands)
    val (nEdges, edgeS) = time("star edges")(star.count())
    println(s"  edges = $nEdges (linear bound: <= ${n * Bands})")
    val ((r, comps), ccS) = time("connected components") {
      val r = Dedup.connectedComponentsStats(docs.select("doc_id"), star, "doc_id")
      val comps = r.labels.select(countDistinct("component")).head().getLong(0)
      (r, comps)
    }
    println(s"  iterations = ${r.iterations}, converged = ${r.converged}, " +
      s"components = $comps (expected ~${n / 5})")
    graft.engine.Checkpoints.release(r.labels)
    println(f"RESULT n=$n sig=$sigS%.1f s edges=$edgeS%.1f s cc=$ccS%.1f s " +
      f"docs_per_s=${n / (sigS + edgeS + ccS)}%.0f")
    spark.stop()
  }

  /** Path-graph diameter stress (see object scaladoc). */
  private def chainMain(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    println(s"path graph: n = $n nodes, diameter = ${n - 1}")
    val nodes = spark.range(0L, n).toDF("doc_id")
    val edges = spark.range(0L, n - 1)
      .select(col("id").as("a"), (col("id") + 1L).as("b"))
    val t0 = System.nanoTime()
    val r = Dedup.connectedComponentsStats(nodes, edges, "doc_id", maxIter = 40)
    val comps = r.labels.select(countDistinct("component")).head().getLong(0)
    val s = (System.nanoTime() - t0) / 1e9
    graft.engine.Checkpoints.release(r.labels)
    val log2d = math.ceil(math.log((n - 1).toDouble) / math.log(2)).toInt
    println(f"RESULT chain n=$n iterations=${r.iterations} " +
      f"(log2(d)=$log2d) converged=${r.converged} components=$comps " +
      f"wall=$s%.1f s per_round=${s / math.max(1, r.iterations)}%.2f s")
    spark.stop()
  }
}
