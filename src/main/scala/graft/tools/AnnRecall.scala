package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall@k measurement for the approximate ANN paths against the exact
  * brute-force baseline, over the real `embeddings` table: the quality
  * half of the speed/recall tradeoff the approximate operators buy.
  * For each of `nq` query vectors (evenly spaced ids), compares the
  * brute-force top-k id set against (a) LSH same-bucket search at 16 and
  * 8 planes and (b) the Lloyd-trained IVF index at nprobe 1, 2, 4.
  * Deterministic (fixed query ids, seeded/trained structures only).
  *
  * Usage: `sbt "runMain graft.tools.AnnRecall [sfDir] [k] [nq]"`
  * Results recorded in BASELINE.md ("ANN recall").
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nq = args.lift(2).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity

    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).cache()
    val n = vecs.count()
    // step >= 1 or all ids collapse to 0 when nq > n; distinct because a
    // small n still folds ids together — recall is then reported over
    // queries.size, not the requested nq
    val step = math.max(1L, n / nq)
    val queryIds = (0 until nq).map(i => i.toLong * step).filter(_ < n).distinct
    val queries = vecs.where(col("vec_id").isin(queryIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

    val ivfPath = s"${sys.props("java.io.tmpdir")}/graft_ann_recall_ivf"
    graft.cli.Cleanup.deleteOnExit(ivfPath)
    val idx = Similarity.ivfBuild(spark, vecs, "vec_id", "embedding", k = 8,
      path = ivfPath)

    def ids(df: DataFrame): Set[Long] = df.collect().map(_.getLong(0)).toSet
    def recallOf(name: String)(approx: (Long, Array[Float]) => DataFrame): Unit = {
      var hit = 0; var tot = 0
      queries.foreach { case (qid, qv) =>
        val exact = ids(Similarity.bruteForceTopK(vecs, "vec_id", "embedding", qv, k))
        val got = ids(approx(qid, qv))
        hit += (exact intersect got).size; tot += exact.size
      }
      println(f"$name%-28s recall@$k = ${hit.toDouble / tot}%.3f over ${queries.size} queries")
    }

    recallOf("lsh 16 planes") { (_, qv) =>
      Similarity.annLsh(spark, vecs, "vec_id", "embedding", qv, k, planes = 16) }
    recallOf("lsh 8 planes") { (_, qv) =>
      Similarity.annLsh(spark, vecs, "vec_id", "embedding", qv, k, planes = 8) }
    Seq(1, 2).foreach { h =>
      recallOf(s"lsh 16 planes multiprobe h=$h") { (_, qv) =>
        Similarity.annLshMultiProbe(spark, vecs, "vec_id", "embedding", qv, k,
          planes = 16, hamming = h) }
    }
    Seq(1, 2, 4).foreach { np =>
      recallOf(s"ivf k=8 nprobe=$np") { (_, qv) =>
        Similarity.ivfSearchIndexed(idx, qv.map(_.toDouble), nprobe = np, topK = k) }
    }
    spark.stop()
  }
}
