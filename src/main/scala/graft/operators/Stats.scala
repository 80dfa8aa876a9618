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
}
