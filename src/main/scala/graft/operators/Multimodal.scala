package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side shape (schema, partitioning, per-partition batch
  * iteration) is real and tested; the actual media decode is a STUB —
  * the image/audio codecs are not in this container — replaced by a
  * deterministic fake that derives metadata from the byte payload. Swap
  * [[decodeStub]] for a real codec (e.g. javax.imageio / ffmpeg bindings)
  * without touching the dataflow.
  */
object Multimodal {

  /** Decoded-media metadata (the stub derives all fields from the bytes). */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Int, height: Int, frames: Int)

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false)))

  /** STUB decode: deterministic fake metadata from payload length. A real
    * implementation would parse the container/codec headers here. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(id, n,
      width = (64 + n % 512).toInt,
      height = (64 + (n * 7) % 512).toInt,
      frames = (1 + n % 30).toInt)
  }

  /** Attach an opaque binary payload column (here: utf-8 bytes of a text
    * column stand in for a real media blob). */
  def withBinaryPayload(df: DataFrame, src: String, as: String = "payload"): DataFrame =
    df.withColumn(as, encode(col(src), "UTF-8"))

  /** Per-partition batched decode over the binary column — the mapPartitions
    * shape a Pandas-UDF/mapInPandas pipeline uses: one iterator per
    * partition, no per-row task overhead, executor-local codec state.
    */
  def decodeMeta(spark: SparkSession, df: DataFrame, id: String,
      payload: String = "payload"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[MediaMeta]
    df.select(col(id).cast("long"), col(payload))
      .mapPartitions { rows =>
        // per-partition init (a real codec would open its context here)
        rows.map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(enc)
      .toDF()
  }

  /** Declarative equivalent of the stub metadata (pure column arithmetic) —
    * used by the oracle-checked query so the driver can reproduce it in SQL;
    * must stay in lockstep with [[decodeStub]]. */
  def stubMetaColumns(df: DataFrame, id: String, payload: String): DataFrame =
    df.select(
      col(id).cast("long").as("doc_id"),
      octet_length(col(payload)).cast("long").as("n_bytes"))
      .select(col("doc_id"), col("n_bytes"),
        (lit(64) + col("n_bytes") % 512).cast("int").as("width"),
        (lit(64) + (col("n_bytes") * 7) % 512).cast("int").as("height"),
        (lit(1) + col("n_bytes") % 30).cast("int").as("frames"))

  /** Frame sampling over a video-like payload: the stub treats the blob as
    * `frames` equal chunks (the same frame count [[decodeStub]] derives;
    * the trailing remainder stays undecoded, as a keyframe sampler would
    * skip partial GOPs) and emits every `step`-th chunk with its index.
    * Pure partition-local column arithmetic — at 100 TB this is the
    * map-only stage that runs before frames ship to a GPU decoder (which
    * replaces the substring slice, not the dataflow). Output:
    * (doc_id, frame_idx, frame_bytes, frame_hash) — the hash makes the
    * frame content oracle-comparable without moving blobs around.
    */
  def frameSample(df: DataFrame, id: String, payload: String, step: Int): DataFrame = {
    val nb = octet_length(col(payload)).cast("long")
    val frames = (lit(1) + nb % 30)
    val chunk = greatest(lit(1L), (nb / frames).cast("long"))
    df.select(col(id).cast("long").as("doc_id"), col(payload).as("__p"),
        frames.as("n_frames"), chunk.as("chunk"))
      .select(col("doc_id"), col("__p"), col("chunk"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(step.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        // nominal frame size (== actual slice except for a sub-chunk blob)
        col("chunk").as("frame_bytes"),
        expr("substring(__p, frame_idx * chunk + 1, chunk)").as("frame"))
      .select(col("doc_id"), col("frame_idx"), col("frame_bytes"),
        // hex form for the oracle compare (DuckDB cannot slice/hash BLOBs;
        // it slices the hex text instead — byte-exact either way)
        hex(col("frame")).as("frame_hex"))
  }

  /** Feature-extraction stub: a deterministic 16-dim float feature vector
    * per payload (normalized 16-bucket byte histogram — the stand-in for a
    * real image/audio embedding model). The plumbing is the production
    * shape: per-partition batched iteration (one model context per
    * partition, as a GPU encoder needs), typed `(id, array<float>)` output
    * that feeds straight into [[Similarity]]'s ANN/near-dup operators. */
  final case class MediaFeatures(doc_id: Long, features: Array[Float])

  def featureExtract(spark: SparkSession, df: DataFrame, id: String,
      payload: String = "payload"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    // null payloads drop like the SQL operators' null propagation does
    df.select(col(id).cast("long"), col(payload))
      .where(col(payload).isNotNull)
      .mapPartitions { rows =>
        // per-partition init (a real encoder would load its weights here)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val hist = new Array[Float](16)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xf0) >> 4) += 1f; i += 1 }
          val n = math.max(1, bytes.length).toFloat
          var b = 0
          while (b < 16) { hist(b) /= n; b += 1 }
          MediaFeatures(r.getLong(0), hist)
        }
      }(enc)
      .toDF()
  }

  /** Resize stub: a deterministic fake that crops the payload to the
    * target pixel budget (`min(n_bytes, tw*th)` leading bytes) and emits
    * the resized dimensions + content hash. The plumbing — per-row binary
    * transform, typed output schema — is what a real scaler plugs into. */
  def resizeStub(df: DataFrame, id: String, payload: String,
      tw: Int, th: Int): DataFrame = {
    val nb = octet_length(col(payload)).cast("long")
    df.select(col(id).cast("long").as("doc_id"), col(payload).as("__p"), nb.as("nb"))
      .select(col("doc_id"),
        lit(tw).as("width"), lit(th).as("height"),
        least(col("nb"), lit(tw.toLong * th)).as("out_bytes"),
        hex(expr(s"substring(__p, 1, ${tw.toLong * th})")).as("out_hex"))
  }
}
