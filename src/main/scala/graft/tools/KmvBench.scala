package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-N evidence run for the KMV bottom-k family (`operators.Sketch`
  * — q205–q208): a deterministic synthetic token stream with a known
  * distinct count and a planted cross-group overlap, at cardinalities
  * the sf testdata can't reach.
  *
  * Stream: `n` occurrences per group, two groups. Group A draws from
  * tokens 0..d−1, group B from tokens d/2..3d/2−1 (both ~d distinct,
  * overlap exactly d/2 by construction — every token in the range
  * appears: the draw cycles `id mod d`, so coverage is total, not
  * probabilistic).
  *
  * Claims under test:
  *  - the sketch is EXACTLY k rows per group no matter n (require);
  *  - the (k−1)·2^60/θ cardinality estimate lands within 4σ
  *    (σ ≈ 1/√(k−2)) of the true distinct count per group (require);
  *  - the KMV intersection estimate recovers the planted 50% overlap
  *    within the same band (require);
  *  - two-shard build + [[graft.operators.Sketch.kmvMinK]] merge equals
  *    the direct whole-stream sketch row-for-row at this n (require) —
  *    the q206 gate's property, at scale;
  *  - wall time is the DISTINCT's, not the windows': the two-phase
  *    bottom-k never globally sorts the distinct set.
  *
  * Usage: `sbt "runMain graft.tools.KmvBench [nPerGroup] [distinct]"`
  * (default 10_000_000 / 2_000_000). Results recorded in BASELINE.md
  * and `bench/large_kmv.txt`.
  */
object KmvBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val d = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    val k = 1024
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

    println(s"n = $n occurrences x 2 groups, ~$d distinct each, " +
      s"overlap ${d / 2}, k = $k")
    def stream(g: String, lo: Long) = spark.range(n).select(
      lit(g).as("g"),
      concat(lit("tok"), (pmod(col("id"), lit(d)) + lo)).as("w"))
    val both = stream("A", 0L).unionByName(stream("B", d / 2))

    val (smp, tBuild) = time(s"kmvSketch: 2x$n occurrences -> 2x$k rows") {
      val s = Sketch.kmvSketch(both, "w", Seq("g"), k = k)
      s.persist(); s.count(); s
    }
    val counts = smp.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts("A") == k && counts("B") == k,
      s"sketch must be exactly k rows per group: $counts")

    val sigma = 1.0 / math.sqrt(k - 2.0)
    val thetas = smp.groupBy("g").agg(max("h").as("theta")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (g <- Seq("A", "B")) {
      val est = (k - 1).toDouble * math.pow(2.0, 60) / thetas(g)
      val rel = math.abs(est - d) / d
      println(f"group $g: distinct est $est%.0f vs true $d (rel $rel%.4f)")
      require(rel < 4 * sigma, s"estimate off by more than 4 sigma: $rel")
    }

    val (inter, tInter) = time("kmvIntersect over the two samples") {
      Sketch.kmvIntersect(smp, "g", k = k).collect().head
    }
    val unionEst = (inter.getAs[Long]("k_u") - 1).toDouble *
      math.pow(2.0, 60) / inter.getAs[Long]("theta")
    val interEst =
      inter.getAs[Long]("n_inter").toDouble / inter.getAs[Long]("k_u") * unionEst
    val relI = math.abs(interEst - d / 2.0) / (d / 2.0)
    println(f"intersection est $interEst%.0f vs true ${d / 2} (rel $relI%.4f)")
    require(relI < 8 * sigma, s"overlap estimate off: $relI")

    val (mergedEq, tMerge) = time("two-shard merge == direct (row equality)") {
      def shard(p: Int) = Sketch.kmvSketch(
        both.where(pmod(xxhash64(col("w")), lit(2)) === p), "w", Seq("g"), k = k)
      val merged = Sketch.kmvMinK(
        shard(0).unionByName(shard(1)).select("g", "h"), Seq("g"), k = k)
      merged.join(smp, Seq("g", "pos", "h")).count() == 2L * k
    }
    require(mergedEq, "merged sample must equal the direct sample")

    println(f"TOTAL build $tBuild%.2f s, intersect $tInter%.2f s, " +
      f"merge-check $tMerge%.2f s at n=$n d=$d k=$k")
    smp.unpersist()
    spark.stop()
  }
}
