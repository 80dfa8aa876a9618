package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q54 transitive-dedup pipeline — the
  * diagnostic that attributes its wall-time to signature computation, band
  * bucketing, candidate-pair generation, and the label-propagation loop.
  * Usage: runMain graft.tools.Diag54 [sfDir]
  */
object Diag54 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    import graft.operators.Dedup
    import graft.queries.LlmQueries.{NumHashes, Bands}
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .where(col("text").isNotNull)
    val sig = docs.select(col("doc_id"),
      graft.functions.MinHashSig.minhash_sig(col("text"), NumHashes).as("__sig"))
      .select(col("doc_id") +:
        (0 until NumHashes).map(i => element_at(col("__sig"), i + 1).as(s"m$i")): _*)
    time("minhash signatures")(sig.count())
    val banded = Dedup.lshBands(sig, "doc_id", NumHashes, Bands)
    time("banded")(banded.count())
    val clique = Dedup.lshCandidatePairs(banded, "doc_id", Bands)
    val nClique = time("clique candidate pairs")(clique.count())
    println(s"  clique pairs = $nClique")
    val pairs = Dedup.lshStarEdges(banded, "doc_id", Bands)
    val nPairs = time("star edges (q54 path)")(pairs.count())
    println(s"  star edges = $nPairs")
    // bucket skew: the largest (band, key) buckets drive the self-join cost
    time("bucket histogram") {
      val stacked = banded.select(col("doc_id"),
        posexplode(array((0 until Bands).map(b => col(s"band$b")): _*))
          .as(Seq("bi", "k")))
      stacked.groupBy("bi", "k").count()
        .orderBy(col("count").desc).limit(10).collect()
        .foreach(r => println(s"  band=${r.get(0)} key=${r.get(1)} n=${r.get(2)}"))
    }
    val r = time("connected components") {
      Dedup.connectedComponentsStats(
        spark.read.parquet(s"$d/documents.parquet").select("doc_id"), pairs, "doc_id")
    }
    println(s"  iterations = ${r.iterations}, converged = ${r.converged}")
    time("labels count")(println(s"  components rows = ${r.labels.count()}"))
    spark.stop()
  }
}
