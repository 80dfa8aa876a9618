package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planner statistics — the ANALYZE pass a cost-based optimizer feeds
  * on, and the third leg of the engine's cardinality-estimation story:
  * q202 estimates join sizes from count-min sketches (frequency-aware,
  * sketch-sized state), q214 prices shuffle salting from the same
  * sketches, and this module supplies the CLASSIC System-R statistics
  * (row count, null count, NDV, min/max per column) plus the
  * uniformity-assumption join estimate they imply — including the
  * audit of where that assumption breaks, which is exactly what the
  * sketch tier exists to fix.
  *
  * Scale shape: [[columnStats]] is ONE scan producing one row (a
  * multi-distinct aggregate — Catalyst plans it as an Expand, each
  * distinct map-side partially aggregated), exploded to long form
  * driver-side-free; nothing is ever wider than the statistics
  * themselves. The reference keeps no statistics (psycopg2 ad-hoc
  * scans); this is the piece its planner would need first at any
  * scale.
  */
object Stats {

  /** One-scan column statistics in LONG form — one row per column:
    * `(col_name, n, n_null, n_distinct, min_s, max_s)`. Min/max are
    * CAST to string so heterogeneous columns share a schema; restrict
    * callers to integer/date/string columns, whose casts agree
    * byte-for-byte across engines (float formatting does not — round
    * into a decimal first if a float column must be profiled). */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__n").as("n"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_s"),
        col(s"__mx_$c").as("max_s"))
    }
    row.select(explode(array(entries: _*)).as("s")).select("s.*")
  }

  private def idiv(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = Graph.idiv(a, b)

  /** The MERGEABLE partial of [[columnStats]] — one WIDE typed row per
    * call: total count, per-column non-null counts and typed min/max.
    * NDV is deliberately absent (distinct does not merge additively —
    * the HLL registers are the maintained answer to NDV; q195/q199).
    * Min/max stay TYPED here, not cast to string: partial-merging
    * lexicographic strings would mis-order integers of different digit
    * widths — the cast happens once, after the merge, in
    * [[statsRead]]. */
  def columnStatsPartial(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        min(col(c)).as(s"__mn_$c"),
        max(col(c)).as(s"__mx_$c"))
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
  }

  /** The CURRENT statistics under a maintained path
    * ([[Sketch.sketchAppendBatch]] appends [[columnStatsPartial]] rows):
    * counts sum, typed mins min, typed maxes max across every appended
    * batch — exact because batches partition the rows — then the same
    * long-form explode as [[columnStats]] (minus NDV). The planner's
    * row counts and bounds stay current under ingest from one stored
    * row per batch.
    *
    * Deletion honesty (the family contract, stated per tier): the
    * count columns are LINEAR and would admit the q230
    * negative-partial discipline, but min/max are NOT — a deleted
    * extremum cannot be un-maxed from partials, so deletion from
    * maintained column stats is a REBUILD (re-run
    * [[columnStatsPartial]] over the kept corpus), exactly like HLL
    * registers and the KMV sample. The maintained HISTOGRAM is the
    * deletion-capable range tier ([[histogramForget]]); planner
    * bounds after a deletion are conservative until the rebuild —
    * stale min/max only widens estimates, never corrupts them. */
  def statsRead(spark: org.apache.spark.sql.SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val merged = Sketch.dedupedParts(spark, path).agg(
      sum("__n").as("__n"),
      cols.flatMap { c =>
        Seq(sum(s"__nn_$c").as(s"__nn_$c"),
          min(s"__mn_$c").as(s"__mn_$c"),
          max(s"__mx_$c").as(s"__mx_$c"))
      }: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__n").as("n"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__mn_$c").cast("string").as("min_s"),
        col(s"__mx_$c").cast("string").as("max_s"))
    }
    merged.select(explode(array(entries: _*)).as("s")).select("s.*")
  }

  /** EQUI-WIDTH histogram of an integer column, `nBuckets` buckets over
    * the data-derived [min, max] span: one row per non-empty bucket —
    * `(bucket, b_lo, b_hi, cnt)` with the exact integer bounds the
    * bucket covers (`bucket(v) = (v−min)·B div span`, so bucket k is
    * `[min + ceil(k·span/B), min + ceil((k+1)·span/B) − 1]`). No global
    * sort anywhere: min/max is a 1-row broadcast aggregate and the
    * bucket map is a map-side-combinable groupBy — the same shape at
    * any scale (equi-DEPTH would need a quantile pass; equi-width is
    * what the selectivity use case needs and stays integer-exact). */
  def histogram(df: DataFrame, c: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"need nBuckets >= 1, got $nBuckets")
    val b = lit(nBuckets.toLong)
    // (v − min)·B must stay inside BIGINT: for a column spanning most of
    // the 64-bit range (hash-valued keys) it overflows — faulting under
    // ANSI, silently wrapping otherwise. Fail loud instead: the span check
    // runs once on the 1-row bounds frame in decimal(38,0) (exact, cannot
    // itself overflow), and lives INSIDE the __span column every
    // downstream expression uses, so column pruning cannot elide it.
    val maxSpan = Long.MaxValue / nBuckets
    val decSpan = col("__hi").cast("decimal(38,0)") -
      col("__lo").cast("decimal(38,0)") + lit(1)
    val bounds = df.agg(min(col(c)).as("__lo"), max(col(c)).as("__hi"))
      .select(col("__lo"),
        when(decSpan > lit(maxSpan),
          raise_error(concat(lit(s"histogram: span "), decSpan.cast("string"),
            lit(s" of column '$c' overflows BIGINT bucket arithmetic at " +
              s"nBuckets=$nBuckets (max ${maxSpan})"))))
          .otherwise(col("__hi") - col("__lo") + lit(1L)).as("__span"))
    val span = col("__span")
    df.select(col(c).as("__v")).crossJoin(broadcast(bounds))
      .select(idiv((col("__v") - col("__lo")) * b, span).as("bucket"),
        col("__lo"), span.as("__span"))
      .groupBy("bucket", "__lo", "__span")
      .agg(count(lit(1)).as("cnt"))
      .select(col("bucket"),
        (col("__lo") + idiv(col("bucket") * col("__span") + b - 1, b))
          .as("b_lo"),
        (col("__lo") +
          idiv((col("bucket") + 1) * col("__span") + b - 1, b) - 1)
          .as("b_hi"),
        col("cnt"))
  }

  /** The MERGEABLE partial of [[histogram]] under FROZEN bounds — the
    * maintained-stats protocol (q227) applied to the range tier: with
    * bucket bounds fixed at `[lo, hi]` (the one-time ANALYZE decision),
    * per-bucket counts are ADDITIVE per ingest batch, so
    * [[graft.operators.Sketch.sketchAppendBatch]] + [[histogramRead]]
    * keep range-selectivity estimates current without a rebuild.
    * Returns `(bucket, cnt)` for the batch's non-empty buckets, with
    * the IDENTICAL bucket arithmetic as [[histogram]] (so when
    * `[lo, hi]` equals the corpus min/max the merged result matches the
    * direct build bit for bit — the q233 gate). A batch value outside
    * the frozen span fails loud (the module's convention): silently
    * clamping would corrupt the edge buckets, and out-of-span ingest is
    * exactly the signal to re-freeze bounds and rebuild. NULLs count
    * into the null bucket row, matching [[histogram]]. */
  def histogramPartial(df: DataFrame, c: String, nBuckets: Int,
      lo: Long, hi: Long): DataFrame = {
    require(nBuckets >= 1, s"need nBuckets >= 1, got $nBuckets")
    require(hi >= lo, s"need hi >= lo, got [$lo, $hi]")
    require(BigInt(hi) - BigInt(lo) + 1 <= BigInt(Long.MaxValue / nBuckets),
      s"span [$lo, $hi] overflows BIGINT bucket arithmetic at " +
        s"nBuckets=$nBuckets")
    val b = lit(nBuckets.toLong)
    val span = lit(hi - lo + 1)
    val v = col(c)
    val guarded = when(v < lo || v > hi,
      raise_error(concat(lit(s"histogramPartial: value "), v.cast("string"),
        lit(s" of column '$c' outside the frozen span [$lo, $hi] — " +
          "re-freeze bounds and rebuild")))).otherwise(v)
    df.select(idiv((guarded - lit(lo)) * b, span).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** The CURRENT equi-width histogram under a maintained path
    * ([[Sketch.sketchAppendBatch]] appends [[histogramPartial]] rows):
    * bucket-wise SUM of every appended partial — exact because batches
    * partition the rows and the bounds are frozen — then the same
    * integer bound reconstruction as [[histogram]]. `nBuckets`/`lo`/`hi`
    * must be the frozen ANALYZE values every partial was built with.
    *
    * Deletion-aware (the q230 negative-partial discipline applied to
    * the range tier — bucket counts are LINEAR, so subtraction IS
    * deletion, exactly): a bucket whose partials sum to ZERO is
    * absence and drops from the result (matching [[histogram]], which
    * never emits empty buckets); a NEGATIVE sum means more rows were
    * deleted than ingested — over-deletion — and fails loud. */
  def histogramRead(spark: org.apache.spark.sql.SparkSession, path: String,
      nBuckets: Int, lo: Long, hi: Long): DataFrame = {
    require(nBuckets >= 1, s"need nBuckets >= 1, got $nBuckets")
    val b = lit(nBuckets.toLong)
    val span = lit(hi - lo + 1)
    val guarded = when(col("cnt") < 0,
      raise_error(concat(lit("histogramRead: bucket "),
        col("bucket").cast("string"),
        lit(" sums negative — a delete partial removed rows that were " +
          "never ingested")))).otherwise(col("cnt"))
    Sketch.sumRead(spark, path, Seq("bucket"), "cnt")
      .select(col("bucket"), guarded.as("cnt"))
      .where(col("cnt") =!= 0)
      .select(col("bucket"),
        (lit(lo) + idiv(col("bucket") * span + b - 1, b)).as("b_lo"),
        (lit(lo) + idiv((col("bucket") + 1) * span + b - 1, b) - 1)
          .as("b_hi"),
        col("cnt"))
  }

  /** The DELETE partial for a maintained histogram: the negated
    * [[histogramPartial]] of the rows to forget — appended through the
    * same replay-guarded [[Sketch.sketchAppendBatch]] protocol as
    * ingest (a replayed delete would subtract twice; the batch tag
    * stops it), it removes the rows from every future
    * [[histogramRead]] without rescanning history. Exact by linearity
    * (the q230 count-min precedent applied to the range tier). The
    * caller passes the SAME rows that were ingested; deleting rows
    * that never arrived surfaces as [[histogramRead]]'s negative-sum
    * raise. Contrast [[statsRead]]: its count/sum columns would admit
    * the same discipline, but its min/max columns are NOT linear — a
    * deleted extremum cannot be un-maxed, so maintained column-stats
    * deletion is a REBUILD, documented there. */
  def histogramForget(df: DataFrame, c: String, nBuckets: Int,
      lo: Long, hi: Long, path: String, batchId: Long): Boolean =
    Sketch.sketchAppendBatch(path,
      histogramPartial(df, c, nBuckets, lo, hi)
        .withColumn("cnt", -col("cnt")),
      batchId)

  /** PURGE a maintained histogram's delete history: atomic rewrite of
    * `<path>/parts` as the current live nonzero bucket sums (one
    * summed batch, tagged `-1`) — the forgotten rows' negative
    * partials (and the positives they cancelled) leave storage
    * physically, and the parts directory compacts to ≤ nBuckets rows
    * regardless of batch count. `lastbatch` stays valid (purge is
    * maintenance; later appends keep their replay guard) — the
    * [[graft.operators.Sketch.kmvPurge]] discipline. */
  def histogramPurge(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val live = graft.engine.Checkpoints.mark(
      Sketch.sumRead(spark, path, Seq("bucket"), "cnt")
        .where(col("cnt") =!= 0)
        .withColumn("batch_id", lit(-1L)))
    try graft.operators.Rtbf.swapRewrite(spark, path, "parts", live)
    finally graft.engine.Checkpoints.release(live)
  }

  /** RE-FREEZE the bounds of a maintained histogram (the recovery
    * [[histogramPartial]]'s out-of-span raise demands, as ONE operator
    * instead of a by-hand procedure): rewrite the persisted partials
    * into the `[newLo, newHi]` bucket grid via the atomic
    * [[graft.operators.Rtbf.swapRewrite]] discipline. Widening only —
    * shrinking would orphan counted rows.
    *
    * Two tiers, chosen by exact integer analysis of the two grids:
    *  - **Exact remap** (returns true): when every OLD bucket's value
    *    range lands inside ONE new bucket (checked for all `nBuckets`
    *    old buckets on the driver — pure integer arithmetic, no data
    *    read), the stored partials rewrite by bucket-id relabel,
    *    summed per (batch_id, new bucket) so the replay-dedupe
    *    invariant (distinct rows per batch) survives buckets merging.
    *    No fact-table scan; history (including delete partials) is
    *    preserved exactly.
    *  - **Rebuild** (returns false): when the grids don't nest, bucket
    *    counts cannot be redistributed without the raw values — the
    *    caller must supply the CURRENT fact rows (`fact`, with column
    *    `c`), which rebuild as one batch-tagged `-1` partial. One
    *    corpus scan, the documented price of an unaligned re-freeze.
    *
    * The `lastbatch` marker is untouched in both tiers (re-freezing is
    * maintenance, not a rebuild of the ingest protocol — later appends
    * keep their replay guard), so new batches MUST be built against
    * the new `[newLo, newHi]` from here on. */
  def histogramRefreeze(spark: org.apache.spark.sql.SparkSession,
      path: String, nBuckets: Int, oldLo: Long, oldHi: Long,
      newLo: Long, newHi: Long,
      fact: Option[(DataFrame, String)] = None): Boolean = {
    require(nBuckets >= 1, s"need nBuckets >= 1, got $nBuckets")
    require(newLo <= oldLo && newHi >= oldHi,
      s"histogramRefreeze widens only: [$newLo, $newHi] does not cover " +
        s"[$oldLo, $oldHi]")
    require(BigInt(newHi) - BigInt(newLo) + 1 <=
      BigInt(Long.MaxValue / nBuckets),
      s"new span [$newLo, $newHi] overflows BIGINT bucket arithmetic at " +
        s"nBuckets=$nBuckets")
    val b = nBuckets.toLong
    val oldSpan = oldHi - oldLo + 1
    val newSpan = newHi - newLo + 1
    def oldBLo(k: Long) = oldLo + (k * oldSpan + b - 1) / b
    def oldBHi(k: Long) = oldLo + ((k + 1) * oldSpan + b - 1) / b - 1
    def newBucket(v: Long) = (v - newLo) * b / newSpan
    // empty old buckets (bHi < bLo under narrow spans) hold no rows and
    // cannot block the exact tier
    val nested = (0L until b).forall { k =>
      oldBHi(k) < oldBLo(k) || newBucket(oldBLo(k)) == newBucket(oldBHi(k))
    }
    import graft.operators.Rtbf
    if (nested) {
      val badBucket: org.apache.spark.sql.Column = raise_error(concat(
        lit("histogramRefreeze: stored bucket "),
        col("bucket").cast("string"),
        lit(s" outside [0, ${b - 1}]"))).cast("long")
      val mapped = (0L until b).foldLeft(badBucket) { (acc, k) =>
        when(col("bucket") === k, lit(newBucket(oldBLo(k)))).otherwise(acc)
      }
      val live = graft.engine.Checkpoints.mark(
        Sketch.dedupedParts(spark, path)
          .select(mapped.as("bucket"), col("cnt"), col("batch_id"))
          .groupBy("bucket", "batch_id").agg(sum("cnt").as("cnt"))
          .select("bucket", "cnt", "batch_id"))
      try Rtbf.swapRewrite(spark, path, "parts", live)
      finally graft.engine.Checkpoints.release(live)
      true
    } else {
      val (df, c) = fact.getOrElse(throw new IllegalArgumentException(
        s"histogramRefreeze: grids [$oldLo,$oldHi] -> [$newLo,$newHi] at " +
          s"nBuckets=$nBuckets do not nest — pass the current fact rows " +
          "to rebuild"))
      val live = graft.engine.Checkpoints.mark(
        histogramPartial(df, c, nBuckets, newLo, newHi)
          .withColumn("batch_id", lit(-1L)))
      try Rtbf.swapRewrite(spark, path, "parts", live)
      finally graft.engine.Checkpoints.release(live)
      false
    }
  }

  /** Range-COUNT estimate from an equi-width [[histogram]], under the
    * uniform-within-bucket assumption: each bucket contributes
    * `cnt · overlap div width` for its overlap with `[lo, hi]` —
    * integer arithmetic end to end, so the estimate (and its signed
    * error vs truth, the caller's audit) replays exactly. This is the
    * range-predicate tier of the planner story: stats (q221) price
    * equi-joins, sketches (q202) see frequency skew, histograms price
    * RANGE predicates — within-bucket skew is exactly what the
    * estimate's gated error measures. */
  def histogramRangeEstimate(hist: DataFrame,
      lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column): DataFrame = {
    val ovLo = greatest(col("b_lo"), lo)
    val ovHi = least(col("b_hi"), hi)
    hist.select(
        when(ovHi >= ovLo,
          idiv(col("cnt") * (ovHi - ovLo + 1),
            col("b_hi") - col("b_lo") + 1)).otherwise(lit(0L)).as("__c"))
      .agg(sum("__c").as("est_count"))
  }

  /** K-ANONYMOUS rollup — release hygiene for aggregate exports: group
    * counts where every group smaller than `k` is SUPPRESSED into one
    * `<other>` bucket (its keys erased), so no published row ever
    * isolates fewer than k records — INCLUDING the `<other>` row itself:
    * a suppression bucket totalling < k (e.g. one lone group of size 1)
    * isolates those records just as a named row would, so it is withheld
    * entirely (global suppression — the release then sums to the corpus
    * minus the withheld tail). A legitimate key VALUE equal to the
    * sentinel would silently merge into the suppression bucket and
    * misattribute its count; that fails loud at execution
    * (`raise_error`), the module's convention. Two bounded aggregations
    * (the second over |groups| rows). */
  def suppressSmallGroups(df: DataFrame, keys: Seq[String],
      k: Long): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val grouped = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val relabeled = keys.foldLeft(grouped) { (g, c) =>
      g.withColumn(c,
        when(col("n") >= k,
          when(col(c) === "<other>",
            raise_error(lit(s"suppressSmallGroups: key '$c' carries the " +
              "reserved value '<other>'"))).otherwise(col(c)))
          .otherwise(lit("<other>")))
    }
    // named rows satisfy n >= k by construction; the filter can only drop
    // an under-k suppression bucket
    relabeled.groupBy(keys.map(col): _*).agg(sum("n").as("n"))
      .where(col("n") >= k)
  }
}
