package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data curation, each designed for the
  * shuffle-parallel path at 100 TB:
  *
  *  - exact: hash-groupBy on content (one shuffle on the content hash);
  *  - MinHash + LSH: shingle -> seeded min-hash signature -> banded bucket
  *    keys -> candidate pairs via equi-join on (band, key) — never an O(n^2)
  *    comparison;
  *  - SimHash: 32-bit sign-aggregated token-hash fingerprint, near-dups =
  *    small Hamming distance;
  *  - n-gram Jaccard: exploded distinct shingles, pairwise overlap by
  *    equi-join on the shingle.
  *
  * Hashes are portable md5-derived (see [[TextOps.portableHash]]) so every
  * signature is reproducible in the DuckDB oracle.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical content. */
  def exact(df: DataFrame, text: String, id: String): DataFrame =
    df.groupBy(col(text))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("copies"))
      .select("keep_id", "copies")

  /** Word shingles (n-grams of tokens) as exploded rows (id, shingle),
    * distinct. n=1 -> token set. */
  def shingles(df: DataFrame, text: String, id: String, n: Int): DataFrame = {
    val toks = TextOps.tokens(col(text))
    if (n == 1)
      df.select(col(id), explode(toks).as("shingle")).distinct()
    else {
      // slide over the token array: shingle i = tokens[i..i+n-1] joined
      val idxs = sequence(lit(0), size(toks) - n)
      df.where(size(toks) >= n)
        .select(col(id), toks.as("toks"), explode(idxs).as("i"))
        .select(col(id),
          concat_ws(" ", slice(col("toks"), col("i") + 1, lit(n))).as("shingle"))
        .distinct()
    }
  }

  /** MinHash signatures: numHashes seeded portable hashes, min per doc.
    * Output: (id, m0..m{k-1}). One explode + one groupBy — map-side
    * combinable, no driver state. */
  def minHash(sh: DataFrame, id: String, numHashes: Int): DataFrame =
    sh.groupBy(col(id))
      .agg(
        min(TextOps.portableHash(col("shingle"), 0)).as("m0"),
        (1 until numHashes).map(i =>
          min(TextOps.portableHash(col("shingle"), i)).as(s"m$i")): _*)

  /** LSH band keys over a MinHash signature: band b = portable hash of the
    * concatenated rows in that band. Docs sharing any (band, key) are
    * candidate near-dups. */
  def lshBands(sig: DataFrame, id: String, numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      TextOps.portableHash(concat_ws("_", parts: _*), 100 + b).as(s"band$b")
    }
    sig.select(col(id) +: (0 until numHashes).map(i => col(s"m$i")) ++: bandCols: _*)
  }

  /** Candidate near-dup pairs from LSH buckets (a < b, distinct). */
  def lshCandidatePairs(banded: DataFrame, id: String, bands: Int): DataFrame = {
    val pairs = (0 until bands).map { b =>
      val l = banded.select(col(id).as("a"), col(s"band$b").as("k"))
      val r = banded.select(col(id).as("b"), col(s"band$b").as("k"))
      l.join(r, "k").where(col("a") < col("b")).select("a", "b")
    }
    pairs.reduce(_ unionByName _).distinct()
  }

  /** 32-bit SimHash from token hashes: bit b of the fingerprint is the sign
    * of the sum over tokens of (2*bit_b(hash) - 1). Near-dups differ in few
    * bits (Hamming). Pure aggregate — one shuffle. */
  def simHash(sh: DataFrame, id: String): DataFrame = {
    val h = TextOps.portableHash(col("shingle"), 3)
    val bitSums = (0 until 32).map { b =>
      sum(shiftright(h, b).bitwiseAND(lit(1L)) * 2 - 1).as(s"s$b")
    }
    sh.groupBy(col(id))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(id),
        (0 until 32).map(b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
        ).reduce(_ + _).as("simhash"))
  }

  /** Hamming distance between two SimHash codes. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** n-gram Jaccard similarity for given candidate pairs (a, b): computed by
    * equi-joining exploded distinct shingle sets — |A ∩ B| / |A ∪ B|.
    * Pairs come from LSH buckets (never all-pairs), so the join stays
    * candidate-bounded at scale. */
  def jaccardPairs(sh: DataFrame, pairs: DataFrame, id: String): DataFrame = {
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.select(col(id).as("a"), col("shingle")), "a")
      .join(sh.select(col(id).as("b"), col("shingle")), Seq("b", "shingle"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_inter"))
    pairs
      .join(sizes.select(col(id).as("a"), col("n").as("na")), "a")
      .join(sizes.select(col(id).as("b"), col("n").as("nb")), "b")
      .join(inter, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        round(coalesce(col("n_inter"), lit(0)).cast("double") /
          (col("na") + col("nb") - coalesce(col("n_inter"), lit(0))), 6)
          .as("jaccard"))
  }

  /** Transitive near-dup clustering: connected components over candidate
    * pairs, so (a,b),(b,c) collapse to ONE keeper — the step every
    * production dedup needs after LSH pair generation. Output:
    * `(id, component)` for EVERY node, where `component` is the smallest id
    * in the node's component (so `component` IS the canonical keeper and
    * `id != component` marks the rows to drop).
    *
    * Min-id label propagation with pointer jumping (path halving), all in
    * DataFrame ops — no GraphX, no driver-side union-find. Per iteration:
    *
    *   1. neighbor-min: every node takes the min label across itself and
    *      its neighbors (edge-join + map-side-combinable min groupBy);
    *   2. pointer jump: `l(u) := l(l(u))` (a labels self-join) — labels are
    *      always ids of nodes in the same component, so jumping stays inside
    *      the component while halving label-chain depth.
    *
    * Labels only decrease and the component minimum keeps its own id, so the
    * fixpoint assigns every node the component-min (neighbor-min fixpoint
    * forces labels constant across every edge). Jumping makes convergence
    * O(log diameter) rather than O(diameter) — `maxIter` = 25 covers any
    * graph that fits on disk. Each iteration is a localCheckpoint (lineage
    * would otherwise grow by 3 joins per round) and costs a bounded 1-row
    * sum action for the convergence test; all real work is per-iteration
    * shuffles that scale out.
    */
  def connectedComponents(
      nodes: DataFrame, pairs: DataFrame, id: String,
      maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col("a").cast("long").as("u"), col("b").cast("long").as("v"))
      .where(col("u") =!= col("v"))
    val bi = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    var labels = nodes.select(col(id).cast("long").as("u")).distinct()
      .withColumn("l", col("u"))
      .localCheckpoint(true)
    // sum(l) strictly decreases until the fixpoint (labels only decrease)
    def labelSum(df: DataFrame): Long =
      df.agg(sum("l")).head().getLong(0)
    var prevSum = labelSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val msgs = bi.join(labels, "u").select(col("v").as("u"), col("l"))
      val nm = labels.union(msgs).groupBy("u").agg(min("l").as("l"))
      val next = nm.join(
          nm.select(col("u").as("l"), col("l").as("l2")), Seq("l"))
        .select(col("u"), col("l2").as("l"))
        .localCheckpoint(true)
      val curSum = labelSum(next)
      converged = curSum == prevSum
      prevSum = curSum
      labels = next
      it += 1
    }
    labels.select(col("u").as(id), col("l").as("component"))
  }

  /** Jaccard over consecutive-id pairs — the deterministic demo/benchmark
    * shape: pair (id, id+1), similarity on distinct token sets. */
  def jaccardAdjacent(df: DataFrame, text: String, id: String): DataFrame = {
    val sh = shingles(df, text, id, 1)
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("n"))
    val a = sh.select(col(id).as("a"), col("shingle"))
    val b = sh.select((col(id) - 1).as("a"), col("shingle"))
    val inter = a.join(b, Seq("a", "shingle")).groupBy("a")
      .agg(count(lit(1)).as("n_inter"))
    sizes.select(col(id).as("a"), col("n").as("na"))
      .join(sizes.select((col(id) - 1).as("a"), col("n").as("nb")), "a")
      .join(inter, Seq("a"), "left")
      .select(col("a"), col("a") + 1 as "b",
        round(coalesce(col("n_inter"), lit(0)).cast("double") /
          (col("na") + col("nb") - coalesce(col("n_inter"), lit(0))), 6)
          .as("jaccard"))
  }
}
