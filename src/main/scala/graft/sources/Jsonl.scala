package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) source/sink — the de-facto interchange
  * format for LLM training corpora (every public corpus release and every
  * tokenizer-ingest tool speaks it). Parquet stays the internal format
  * (columnar, footer stats, 5-10x smaller); JSONL is the boundary where
  * corpora enter and leave the pipeline.
  *
  * The one rule that matters at 100 TB: NEVER read JSONL without an
  * explicit schema. `spark.read.json(path)` schema inference is a full
  * extra pass over every byte of the data before the real job starts —
  * a corpus-sized read that produces nothing but a StructType. [[read]]
  * therefore REQUIRES the schema; there is deliberately no inferring
  * overload. (Same reasoning as the reference's fixed-header CSV loads —
  * db_preparation.py:21-45 — where the schema is declared, not sniffed.)
  */
object Jsonl {

  /** Write `df` as JSONL. Nulls are omitted per line (the JSONL
    * convention); a schema-bearing [[read]] restores them as SQL NULL, so
    * a write/read round-trip is value-identical (gated by the q94 oracle
    * and the OperatorSpec null round-trip test). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSONL with an explicit schema (no inference pass). Rows that
    * fail to parse surface in the default PERMISSIVE mode as all-null
    * rows; pass `failFast = true` to abort the job on the first corrupt
    * line instead (the right default for pipeline inputs you own). */
  def read(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)
}
