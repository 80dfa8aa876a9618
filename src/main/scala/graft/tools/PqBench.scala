package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Large-N evidence run for the PQ family over a planted-cluster
  * synthetic corpus (md5-derived like [[LargeAnnBench]] — no RNG,
  * reruns identical).
  *
  * What PQ can and cannot do is measured honestly: with m×ksub code
  * budgets, ADC resolves the corpus to roughly QUANTIZATION-CELL
  * granularity — inside a dense planted cluster the codes collapse and
  * sub-cluster ranking is noise, so the meaningful ADC metric is
  * CLUSTER recall (did the top-k land in the true nearest cluster?),
  * and exact-metric recall@k is recovered by the re-rank stage once the
  * shortlist is sized to the degenerate set (here: the planted cluster
  * population). That is exactly how production PQ deployments tune
  * shortlists, and the curve (recall vs shortlist) is the evidence.
  *
  * Claims under test:
  *  - training cost is bounded by the SAMPLE, not the corpus;
  *  - the code table is ~20× smaller on disk than the float table
  *    (the 100 TB point: ADC scans read code bytes only);
  *  - encode is one map-only pass (paid once — searches then scan codes);
  *  - ADC top-k lands in the true cluster; re-rank recall@10 climbs to
  *    ~1 as the shortlist covers the cluster population;
  *  - IVF-PQ probes read only nprobe/k of the code table.
  *
  * Usage: `sbt "runMain graft.tools.PqBench [n] [clusters]"`
  * (default 1_000_000 / 1024). Results in BASELINE.md ("Large-N PQ
  * evidence") and `bench/large_pq_1e6.txt`.
  */
object PqBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val clusters = args.lift(1).map(_.toInt).getOrElse(1024)
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
      println(f"$name%-44s $s%9.2f s"); (r, s)
    }
    import graft.operators.Similarity

    val dims = 64
    val perCluster = (n / clusters).toInt
    val cell = pmod(col("id"), lit(clusters))
    val vec = transform(sequence(lit(0), lit(dims - 1)), d =>
      (Similarity.planeCoef(cell, d) +
        lit(0.25) * Similarity.planeCoef(col("id") + lit(10000), d))
        .cast("float"))
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"), vec.as("embedding"))
      .cache()
    println(s"n = $n vectors, $dims-d, $clusters planted clusters " +
      s"(~$perCluster members each)")
    time("corpus materialize")(vecs.count())

    // ---- training on a fixed-size sample: cost must not grow with n ----
    val sampleN = 40000L
    val m = 8; val dsub = 8; val ksub = 64
    val sample = vecs.where(col("vec_id") < sampleN)
    val (cb, _) = time(s"pqTrain m=$m ksub=$ksub, 2 rounds, $sampleN sample")(
      Similarity.pqCollect(
        Similarity.pqTrain(sample, "vec_id", "embedding",
          m = m, dsub = dsub, ksub = ksub, iters = 2),
        m = m, dsub = dsub, ksub = ksub))

    // ---- encode ONCE + on-disk size vs the float corpus ----
    val base = s"${sys.props("java.io.tmpdir")}/graft_pq_bench"
    graft.cli.Cleanup.deleteOnExit(base)
    time("pqEncode full corpus -> parquet (paid once)")(
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

    // ---- search ----
    val k = 10
    val nq = 20
    val step = math.max(1L, n / nq)
    val queries = vecs.where(pmod(col("vec_id"), lit(step)) === 0)
      .collect().map(r =>
        r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).take(nq)
    def ids(df: DataFrame): Seq[Long] = df.collect().map(_.getLong(0)).toSeq
    def clusterOf(id: Long): Long = id % clusters

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

    // ADC alone: cluster recall (code budget resolves to cell granularity)
    var adcHit = 0; var adcCluster = 0
    val (_, tAdc) = time(s"ADC code scan, $nq queries")(
      queries.foreach { case (qid, qv) =>
        val got = ids(Similarity.pqSearchAdc(codes, "vec_id", cb, qv, k))
        adcHit += got.count(exact(qid).contains)
        adcCluster += got.count(clusterOf(_) == clusterOf(qid))
      })
    println(f"ADC exact-recall@$k = ${adcHit.toDouble / (nq * k)}%.3f, " +
      f"cluster-recall@$k = ${adcCluster.toDouble / (nq * k)}%.3f, " +
      f"per-query ${tAdc / nq}%.2f s vs brute ${tBrute / nq}%.2f s")

    // re-rank: recall climbs as the shortlist covers the degenerate set
    Seq(100, 1000, 2 * perCluster).foreach { sl =>
      var hit = 0
      val (_, t) = time(s"re-rank shortlist=$sl, $nq queries")(
        queries.foreach { case (qid, qv) =>
          val got = ids(Similarity.pqSearchRerankIndexed(vecs, codes,
            "vec_id", "embedding", cb, qv, shortlist = sl, topK = k))
          hit += got.count(exact(qid).contains)
        })
      println(f"  exact-recall@$k = ${hit.toDouble / (nq * k)}%.3f, " +
        f"per-query ${t / nq}%.2f s")
    }

    // ---- IVF-PQ: pruned ADC (cluster recall per nprobe) ----
    val kc = 64
    val (ivfpq, _) = time(s"ivfPqBuild k=$kc")(
      Similarity.ivfPqBuild(spark, vecs, "vec_id", "embedding", k = kc,
        cb = cb, path = s"$base/ivfpq"))
    Seq(2, 4, 8).foreach { np =>
      var cl = 0
      val (_, t) = time(s"ivfPqSearch nprobe=$np, $nq queries")(
        queries.foreach { case (qid, qv) =>
          val got = ids(Similarity.ivfPqSearch(ivfpq, cb, qv, np, k))
          cl += got.count(clusterOf(_) == clusterOf(qid))
        })
      println(f"  cluster-recall@$k = ${cl.toDouble / (nq * k)}%.3f, " +
        f"per-query ${t / nq}%.2f s")
    }
    spark.stop()
  }
}
