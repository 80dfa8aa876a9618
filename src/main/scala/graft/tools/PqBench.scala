package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Large-N evidence run for the PQ family: codebook training on a
  * sample, full-corpus encode, ADC search, shortlist re-rank, and the
  * IVF-PQ composition — over the same planted-cluster synthetic corpus
  * as [[LargeAnnBench]] (md5-derived, no RNG, reruns identical).
  *
  * Claims under test:
  *  - training cost is bounded by the SAMPLE, not the corpus;
  *  - the code table is ~an order of magnitude smaller on disk than the
  *    float table (the 100 TB point: ADC scans read code bytes only);
  *  - ADC search beats the brute-force float scan per query while
  *    keeping usable recall, and re-rank recovers exact-metric ranking
  *    on the shortlist;
  *  - IVF-PQ probes read only nprobe/k of the code table.
  *
  * Usage: `sbt "runMain graft.tools.PqBench [n]"` (default 1_000_000).
  * Results recorded in BASELINE.md ("Large-N PQ evidence") and
  * `bench/large_pq_1e6.txt`.
  */
object PqBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
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
      println(f"$name%-40s $s%9.2f s"); (r, s)
    }
    import graft.operators.Similarity

    val dims = 64
    val clusters = 64
    val cell = pmod(col("id"), lit(clusters))
    val vec = transform(sequence(lit(0), lit(dims - 1)), d =>
      (Similarity.planeCoef(cell, d) +
        lit(0.25) * Similarity.planeCoef(col("id") + lit(10000), d))
        .cast("float"))
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"), vec.as("embedding"))
      .cache()
    println(s"n = $n vectors, $dims-d, $clusters planted clusters")
    time("corpus materialize")(vecs.count())

    // ---- training on a fixed-size sample: cost must not grow with n ----
    val sampleN = 20000L
    val sample = vecs.where(col("vec_id") < sampleN)
    val (cb, _) = time(s"pqTrain m=8 ksub=16, 2 rounds, $sampleN sample")(
      Similarity.pqCollect(
        Similarity.pqTrain(sample, "vec_id", "embedding",
          m = 8, dsub = 8, ksub = 16, iters = 2),
        m = 8, dsub = 8, ksub = 16))

    // ---- full-corpus encode + on-disk size vs the float corpus ----
    val base = s"${sys.props("java.io.tmpdir")}/graft_pq_bench"
    graft.cli.Cleanup.deleteOnExit(base)
    time("pqEncode full corpus -> parquet")(
      Similarity.pqEncode(vecs, "vec_id", "embedding", cb)
        .write.mode("overwrite").parquet(s"$base/codes"))
    time("float corpus -> parquet")(
      vecs.write.mode("overwrite").parquet(s"$base/floats"))
    def dirBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(path).getLength
    }
    val cBytes = dirBytes(s"$base/codes")
    val fBytes = dirBytes(s"$base/floats")
    println(f"code table  ${cBytes / 1e6}%10.1f MB")
    println(f"float table ${fBytes / 1e6}%10.1f MB  (${fBytes.toDouble / cBytes}%.1fx larger)")
    val codes = spark.read.parquet(s"$base/codes").cache()
    codes.count()

    // ---- search: ADC scan vs brute-force float scan ----
    val k = 10
    val nq = 20
    val step = math.max(1L, n / nq)
    val queries = vecs.where(pmod(col("vec_id"), lit(step)) === 0)
      .collect().map(r =>
        r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).take(nq)
    def ids(df: DataFrame): Seq[Long] = df.collect().map(_.getLong(0)).toSeq

    // exact squared-L2 ranking (the metric ADC approximates)
    val exact = queries.map { case (qid, qv) =>
      qid -> ids(vecs.select(col("vec_id"),
          Similarity.l2sq(col("embedding").cast("array<double>"),
            array(qv.toIndexedSeq.map(lit): _*)).as("d2"))
        .orderBy(col("d2").asc, col("vec_id").asc).limit(k)).toSet
    }.toMap
    val (_, tBrute) = time(s"exact L2 float scan, $nq queries")(
      queries.foreach { case (_, qv) =>
        vecs.select(col("vec_id"),
            Similarity.l2sq(col("embedding").cast("array<double>"),
              array(qv.toIndexedSeq.map(lit): _*)).as("d2"))
          .orderBy(col("d2").asc, col("vec_id").asc).limit(k).collect() })

    var adcHit = 0
    val (_, tAdc) = time(s"ADC code scan, $nq queries")(
      queries.foreach { case (qid, qv) =>
        val got = ids(Similarity.pqSearchAdc(codes, "vec_id", cb, qv, k))
        adcHit += got.count(exact(qid).contains)
      })
    println(f"ADC recall@$k = ${adcHit.toDouble / (nq * k)}%.3f, " +
      f"per-query ${tAdc / nq}%.2f s vs brute ${tBrute / nq}%.2f s")

    var rrHit = 0
    val (_, tRr) = time(s"ADC shortlist=100 + exact re-rank, $nq queries")(
      queries.foreach { case (qid, qv) =>
        val got = ids(Similarity.pqSearchRerank(vecs, "vec_id", "embedding",
          cb, qv, shortlist = 100, topK = k))
        rrHit += got.count(exact(qid).contains)
      })
    println(f"re-rank recall@$k = ${rrHit.toDouble / (nq * k)}%.3f, " +
      f"per-query ${tRr / nq}%.2f s")

    // ---- IVF-PQ: pruned ADC ----
    val (ivfpq, _) = time("ivfPqBuild k=32")(
      Similarity.ivfPqBuild(spark, vecs, "vec_id", "embedding", k = 32,
        cb = cb, path = s"$base/ivfpq"))
    // cosine-family exact baseline for the IVF-PQ metric
    val exactCos = queries.map { case (qid, qv) =>
      qid -> ids(Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        qv.map(_.toFloat), k)).toSet
    }.toMap
    Seq(2, 4, 8).foreach { np =>
      var hit = 0
      val (_, t) = time(s"ivfPqSearch nprobe=$np, $nq queries")(
        queries.foreach { case (qid, qv) =>
          val got = ids(Similarity.ivfPqSearch(ivfpq, cb, qv, np, k))
          hit += got.count(exactCos(qid).contains)
        })
      println(f"  recall@$k vs exact cosine = ${hit.toDouble / (nq * k)}%.3f, " +
        f"per-query ${t / nq}%.2f s")
    }
    spark.stop()
  }
}
