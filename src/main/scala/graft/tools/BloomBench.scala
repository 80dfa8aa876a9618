package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-N evidence run for the Bloom-filter decontamination path
  * ([[graft.operators.Dedup.shingleBloom]] / `bloomHits`): the claims
  * under test are (1) the filter is a small multiple of a megabyte where
  * the raw distinct-hash relation is 8 B/item — i.e. it stays shippable
  * as a broadcast variable long after the exact relation has blown the
  * broadcast-join threshold; (2) the corpus-side probe is map-only and
  * fast; (3) the measured false-positive rate lands at the requested
  * fpp. The probe corpus is id-disjoint from the eval set, so EVERY hit
  * is a false positive — the measured rate is exact.
  *
  * Usage: `sbt "runMain graft.tools.BloomBench [nEval] [nProbe]"`
  * Defaults 10^7 eval hashes, 10^7 probes. Results in BASELINE.md
  * ("Bloom decontamination evidence").
  */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val nEval = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nProbe = args.lift(1).map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-38s $s%9.2f s"); (r, s)
    }
    import graft.operators.Dedup
    println(s"eval hashes n = $nEval, probes n = $nProbe (disjoint ids)")
    val eval = spark.range(0L, nEval).select(col("id").as("sh_h"))
    for (fpp <- Seq(1e-3, 1e-6)) {
      val ((bf, stats), buildS) = time(f"shingleBloom build (fpp $fpp%.0e)") {
        Dedup.shingleBloom(eval, "sh_h", fpp)
      }
      val bloomMb = stats.bitSize / 8.0 / 1024 / 1024
      val rawMb = nEval * 8.0 / 1024 / 1024
      println(f"  filter ${bloomMb}%.1f MiB vs raw 8 B/hash relation " +
        f"${rawMb}%.1f MiB (${rawMb / bloomMb}%.1f x)")
      // every probe id is outside [0, nEval): every hit is a false positive
      val probes = spark.range(nEval, nEval + nProbe)
        .select(col("id").as("doc_id"), col("id").as("sh_h"))
      val (fps, probeS) = time("  map-only probe (bloomHits)") {
        Dedup.bloomHits(probes, "doc_id", bf).count()
      }
      println(f"  measured fp rate ${fps.toDouble / nProbe}%.2e " +
        f"(requested $fpp%.0e), ${nProbe / probeS / 1e6}%.1f M probes/s " +
        f"[build $buildS%.1f s]")
    }
    spark.stop()
  }
}
