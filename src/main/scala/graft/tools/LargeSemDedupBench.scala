package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-N evidence run for SemDeDup ([[graft.operators.Similarity
  * .semDedup]]): planted paraphrase trios in a clustered corpus — the
  * regime the algorithm is built for (tight semantic duplicates inside a
  * clustered embedding space; the sf testdata embeddings are
  * near-random, which is why q113 measures low recall there).
  *
  * Corpus: `n` base 64-d vectors in 64 planted clusters (md5-derived,
  * no RNG — reruns identical), plus 2 near-copies (0.02 × noise,
  * cosine ≈ 0.999) of each of the first `g` base vectors. At
  * tau = 0.99 the base same-cluster cosines (≈ 0.94) stay below
  * threshold, so the edge set is exactly the planted trios plus
  * whatever noise the geometry produces — the expensive stage is the
  * within-cell pairwise cosine scan, which is the algorithm's actual
  * cost: Σ|cell|² pairs, reported against the measured candidate count
  * (the published cost model, checked not assumed).
  *
  * Claims under test: every planted trio collapses into one component
  * (recovery = g); dropped rows ≈ 2g (2 per trio); wall time is
  * dominated by the pair scan and scales with Σ|cell|², not n².
  *
  * Usage: `sbt "runMain graft.tools.LargeSemDedupBench [n] [g]"`
  * (default 100000 base + 1000 trios). Results recorded in BASELINE.md
  * ("Large-N SemDeDup evidence") and bench/large_semdedup.txt.
  */
object LargeSemDedupBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val g = args.lift(1).map(_.toLong).getOrElse(1000L)
    require(g <= n, s"cannot plant $g trios in $n base vectors")
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
    import graft.operators.Similarity

    val dims = 64
    val clusters = 64
    // base vector i = center(i % 64) + 0.25 * noise(i); copy rows (ids
    // >= n) re-derive their BASE id's vector and add 0.02 * copy noise
    def baseId = when(col("id") < n, col("id"))
      .otherwise(((col("id") - n) / 2).cast("long"))
    val cell = pmod(baseId, lit(clusters))
    val vec = transform(sequence(lit(0), lit(dims - 1)), d =>
      (Similarity.planeCoef(cell, d) +
        lit(0.25) * Similarity.planeCoef(baseId + lit(1000000), d) +
        when(col("id") < n, lit(0.0)).otherwise(
          lit(0.02) * Similarity.planeCoef(col("id") + lit(3000000), d)))
        .cast("float"))
    val vecs = spark.range(n + 2 * g)
      .select(col("id").as("vec_id"), vec.as("embedding"))
      .cache()
    println(s"n = $n base + ${2 * g} planted copies, $dims-d, " +
      s"$clusters clusters, tau = 0.99")
    time("corpus materialize")(vecs.count())

    // the analytic cluster centers ARE the quantizer (production often
    // assigns against a pretrained one); k = clusters keeps the literal
    // assignment form honest
    val cents = (0L until clusters.toLong).map(c =>
      c -> (0 until dims).map(d => Similarity.planeCoefJvm(c.toInt, d)))

    // the published cost model: candidate pairs = Σ|cell| choose 2
    val asg = Similarity.assignCellsLit(vecs, "vec_id", "embedding", cents)
    val (cellSizes, _) = time("assignment (map-only scan)")(
      asg.groupBy("cell").count().collect().map(_.getLong(1)))
    val predictedPairs = cellSizes.map(c => c * (c - 1) / 2).sum
    println(f"cells = ${cellSizes.length}, max cell = ${cellSizes.max}, " +
      f"predicted pairs = $predictedPairs%,d")

    val (out, total) = time("semDedup end-to-end")(
      graft.engine.Checkpoints.mark(
        Similarity.semDedup(vecs, "vec_id", "embedding", cents, tau = 0.99)))
    val (kept, _) = time("keep count")(
      out.where(col("keep")).count())
    val dropped = (n + 2 * g) - kept
    // a trio is recovered when base j and both copies share a component
    val trios = out.select(col("vec_id"),
        when(col("vec_id") < n, col("vec_id"))
          .otherwise(((col("vec_id") - n) / 2).cast("long")).as("base"),
        col("component"))
      .where(col("base") < g)
      .groupBy("base").agg(countDistinct("component").as("nc"),
        count(lit(1)).as("members"))
    val recovered = trios.where(col("nc") === 1 && col("members") === 3).count()
    println(f"dropped = $dropped%,d (expect >= ${2 * g}%,d), " +
      f"recovered trios = $recovered%,d / $g%,d")
    println(f"total semDedup wall = $total%.2f s for ${n + 2 * g}%,d rows, " +
      f"$predictedPairs%,d candidate pairs")
    graft.engine.Checkpoints.release(out)
    require(recovered == g, s"planted trio recovery failed: $recovered / $g")
    spark.stop()
  }
}
