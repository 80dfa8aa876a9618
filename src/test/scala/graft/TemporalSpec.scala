package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, Temporal}

/** Library-level tests for the temporal operators (as-of join,
  * sessionization) and the IVF ANN path: the union-trick as-of is checked
  * against a naive per-row reference computed in plain Scala.
  */
class TemporalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (key, t) left probes; (key, t, v) right states
  val leftRows = Seq((1L, 5L), (1L, 10L), (1L, 3L), (2L, 7L), (3L, 1L))
  val rightRows = Seq((1L, 3L, 30.0), (1L, 8L, 80.0), (2L, 7L, 77.0), (2L, 9L, 99.0))

  test("asofBackward matches the naive latest-at-or-before lookup") {
    val left = leftRows.toDF("user_id", "ts")
    val right = rightRows.toDF("user_id", "ts", "value")
    val got = Temporal.asofBackward(left, right, Seq("user_id"), "ts", "ts",
        rightCols = Seq("ts", "value"))
      .select("user_id", "ts", "asof_ts", "asof_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSet
    val expected = leftRows.map { case (k, t) =>
      val m = rightRows.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption
      (k, t, m.map(_._2), m.map(_._3))
    }.toSet
    assert(got == expected)
    // exact-time tie matches (1,3)->(3,30); no-earlier-row probe is null
    assert(expected.contains((1L, 3L, Some(3L), Some(30.0))))
    assert(expected.contains((3L, 1L, None, None)))
  }

  test("sessionize splits on gaps > threshold per key") {
    val df = Seq(
      (1L, 0L), (1L, 10L), (1L, 100L), (1L, 105L), // gap 90 splits
      (2L, 0L), (2L, 200L), (2L, 205L)             // gap 200 splits
    ).toDF("user_id", "ts")
    val got = Temporal.sessionize(df, Seq("user_id"), "ts", gap = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 0L, 0L), (1L, 10L, 0L), (1L, 100L, 1L), (1L, 105L, 1L),
      (2L, 0L, 0L), (2L, 200L, 1L), (2L, 205L, 1L)))
  }

  test("IVF: query vector lands in its own cell and ranks first at cos 1.0") {
    // 16 vectors in 4 dims; ids 0..3 double as centroids
    val vecs = (0 until 16).map { i =>
      val base = Array.fill(4)(0.1f)
      base(i % 4) = 1.0f + (i / 4) * 0.05f
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every centroid is its own nearest centroid
    (0L until 4L).foreach(c => assert(assigned(c) == c, s"centroid $c -> ${assigned(c)}"))
    // vectors dominated by dimension d land in centroid d's cell
    assert(assigned(5L) == 1L && assigned(10L) == 2L)

    val hits = Similarity.ivfSearch(vecs, "vec_id", "embedding",
        queryId = 6, k = 4, nprobe = 1, topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // nprobe=1 restricts the scan to the query's own cell (ids = 2 mod 4);
    // the query itself scores cos 1.0 (near-parallel cellmates may tie at
    // 4-decimal rounding, id ascending breaks the tie)
    assert(hits.forall(_._1 % 4 == 2), s"probe must stay in cell 2: ${hits.toSeq}")
    assert(hits.exists(h => h._1 == 6L && h._2 == 1.0),
      s"query must be found at cos 1.0: ${hits.toSeq}")

    // the materialized bucketed index returns exactly what the inline
    // formulation returns — same probe, same re-rank, zero reassignment
    // (seeded centroids pin the build to the inline spec's quantizer;
    // trained centroids are exercised in the Lloyd test below and q55)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_test").toString
    graft.cli.Cleanup.deleteOnExit(tmp)
    val idx = Similarity.ivfBuild(spark, vecs, "vec_id", "embedding", 4, tmp,
      centroids = Some(Similarity.seedCentroids(vecs, "vec_id", "embedding", 4)))
    val qv = vecs.where(col("vec_id") === 6)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val hits2 = Similarity.ivfSearchIndexed(idx, qv, nprobe = 1, topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(hits2.toSeq == hits.toSeq, s"indexed ${hits2.toSeq} vs inline ${hits.toSeq}")

    // incremental ingest: a new vector appends through the STORED
    // quantizer (no retrain, no corpus rescan) and is immediately
    // searchable — an exact duplicate of the query must join cell 2 and
    // take rank 1 alongside it
    val newVec = Seq((100L, qv.map(_.toFloat))).toDF("vec_id", "embedding")
    Similarity.ivfAppend(idx, newVec)
    // topK=5: the cellmates tie at 1.0 after 4-dp rounding and the
    // id-ascending tiebreak ranks the appended id 100 after 2/6/10/14
    val hits3 = Similarity.ivfSearchIndexed(idx, qv, nprobe = 1, topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(hits3.contains((100L, 1.0)) && hits3.contains((6L, 1.0)),
      s"appended dup must be found at cos 1.0: ${hits3.toSeq}")
    assert(hits3.forall(h => h._1 % 4 == 2 || h._1 == 100L),
      s"append must not disturb cell routing: ${hits3.toSeq}")

    // batched search over the appended index agrees with per-query search
    val batch = Similarity.ivfSearchIndexedBatch(idx,
        vecs.where(col("vec_id") === 6), nprobe = 1, topK = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(batch.toSeq == hits3.toSeq,
      s"batched ${batch.toSeq} vs single ${hits3.toSeq}")
  }

  test("IVF maintenance: replay-guarded append, compaction invariance, drift gauge") {
    val vecs = (0 until 16).map { i =>
      val base = Array.fill(4)(0.1f)
      base(i % 4) = 1.0f + (i / 4) * 0.05f
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_maint").toString
    graft.cli.Cleanup.deleteOnExit(tmp)
    val idx = Similarity.ivfBuild(spark, vecs, "vec_id", "embedding", 4, tmp,
      centroids = Some(Similarity.seedCentroids(vecs, "vec_id", "embedding", 4)))
    val qv = vecs.where(col("vec_id") === 6)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray

    // replay guard: batch 0 applies, a RETRY of batch 0 appends nothing,
    // batch 1 applies again
    def corpusCount = idx.corpus.count()
    val b0 = Seq((100L, qv.map(_.toFloat))).toDF("vec_id", "embedding")
    assert(Similarity.ivfAppendBatch(idx, b0, 0L))
    val afterB0 = corpusCount
    assert(!Similarity.ivfAppendBatch(idx, b0, 0L), "retried batch must no-op")
    assert(corpusCount == afterB0, "retried batch must append nothing")
    val b1 = Seq((101L, qv.map(_.toFloat))).toDF("vec_id", "embedding")
    assert(Similarity.ivfAppendBatch(idx, b1, 1L))
    assert(corpusCount == afterB0 + 1)
    // a rebuild clears the marker: batch ids restart at 0 and still apply
    Similarity.ivfBuild(spark, vecs, "vec_id", "embedding", 4, tmp,
      centroids = Some(Similarity.seedCentroids(vecs, "vec_id", "embedding", 4)))
    assert(Similarity.ivfAppendBatch(idx, b0, 0L),
      "rebuild must invalidate the lastbatch marker")

    // fragmentation: per-batch appends accumulate files in the hot cell;
    // compaction bounds files per cell and search results are IDENTICAL
    (1L to 6L).foreach { b =>
      Similarity.ivfAppendBatch(idx,
        Seq((200L + b, qv.map(_.toFloat))).toDF("vec_id", "embedding"), b)
    }
    val hotBefore = Similarity.ivfCellFiles(idx).values.foldLeft(0)(math.max)
    assert(hotBefore >= 7, s"7 appends must fragment the hot cell: $hotBefore")
    val before = Similarity.ivfSearchIndexed(idx, qv, nprobe = 1, topK = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val maxFiles = Similarity.ivfCompact(idx, targetRecordsPerFile = 100L)
    assert(maxFiles <= 2, s"compaction must bound files per cell: $maxFiles")
    val after = Similarity.ivfSearchIndexed(idx, qv, nprobe = 1, topK = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before, s"search must be identical: $after vs $before")

    // drift gauge: the cell members are all variants on the centroid's
    // axis, so every stored centroid sits close to its current cell mean
    val drift = Similarity.ivfDrift(idx, sampleFraction = 1.0)
      .collect().map(_.getDouble(2))
    assert(drift.length == 4 && drift.forall(_ < 0.05),
      s"un-drifted corpus must gauge ~0: ${drift.toSeq}")
  }

  test("Lloyd training improves the quantizer over the seeded init on a clustered corpus") {
    // 3 tight clusters around orthogonal axes; ids 0..2 ALL land in cluster
    // 0 (ids are assigned round-robin-free), so the lowest-id seeded init
    // picks three near-duplicate centroids — the degenerate case training
    // must fix
    val dims = 6
    val vecs = (0 until 60).map { i =>
      val cluster = if (i < 3) 0 else i % 3
      val v = Array.tabulate(dims)(d =>
        (if (d == cluster * 2) 1.0 else 0.0) + 0.05 * math.sin(i * dims + d))
      (i.toLong, v.map(_.toFloat))
    }.toDF("vec_id", "embedding")
    def meanBestCos(cents: Array[Array[Double]]): Double = {
      val rows = vecs.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val dot = a.indices.map(i => a(i) * b(i)).sum
        dot / math.sqrt(a.map(x => x * x).sum) / math.sqrt(b.map(x => x * x).sum)
      }
      rows.map(v => cents.map(c => cos(v, c)).max).sum / rows.length
    }
    def centArr(df: org.apache.spark.sql.DataFrame): Array[Array[Double]] =
      df.collect().map(_.getSeq[Double](1).toArray)
    val seed = centArr(
      Similarity.seedCentroids(vecs, "vec_id", "embedding", 3).select("cell", "ce"))
    val trainedDf = Similarity.kmeansCentroids(vecs, "vec_id", "embedding", 3, iters = 2)
    val trained = centArr(trainedDf.select("cell", "ce"))
    graft.engine.Checkpoints.release(trainedDf)
    val (before, after) = (meanBestCos(seed), meanBestCos(trained))
    assert(after > before + 0.1,
      s"training must spread the degenerate seeds: before=$before after=$after")
  }
}
