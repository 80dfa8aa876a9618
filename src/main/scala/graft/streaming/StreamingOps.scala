package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming extension (SURVEY §2.10): the streaming analogues of
  * the engine's window-frame aggregates, plus custom keyed state.
  *
  * The reference is batch-only; these operators make the same analytics run
  * incrementally: `readStream` -> transform -> `writeStream`, with
  * watermarked event-time windows and `mapGroupsWithState` for state the
  * built-in windows can't express.
  */
object StreamingOps {

  /** An event row for the typed stateful operators. */
  final case class Evt(ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Per-key running state for [[runningStats]]. */
  final case class KeyStats(user_id: Long, n: Long, sum: Double, max: Double)

  /** Watermarked sliding event-time window aggregation — the streaming form
    * of the batch tumbling agg (SparkEntry q16) and of the engine's window
    * aggregates (A3-A5). Late rows beyond the watermark are dropped, so
    * state is bounded at any scale.
    */
  def windowedAgg(
      events: DataFrame,
      win: String = "1 hour",
      slide: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Watermarked session-window aggregation — the streaming form of the
    * batch gap-based sessionization ([[graft.operators.Temporal.sessionize]],
    * SparkEntry q42): a session closes once no event arrives within `gap`,
    * and the watermark bounds how long an open session's state is held.
    */
  def sessionAgg(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n"), col("sum_value"))

  /** Streaming exact dedup — the incremental form of the batch hash-dedup
    * ([[graft.operators.Dedup.exact]], SparkEntry q29): drop rows whose
    * key (e.g. a content fingerprint) was already seen, holding per-key
    * state only within the event-time watermark so state is bounded at
    * any scale — the guarantee an unbounded `dropDuplicates` on a stream
    * cannot give. A duplicate arriving after its key's watermark window
    * expired is re-emitted; for corpus curation that is the correct
    * trade (state stays O(keys-per-window), and a later batch compaction
    * catches stragglers).
    */
  def dedupStream(
      events: DataFrame,
      keys: Seq[String],
      eventTime: String = "ts",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(eventTime, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Streaming near-dup detection against a persisted LSH band index
    * ([[graft.operators.Dedup.bandIndexWrite]]) — the stream-static form
    * of the incremental batch dedup (SparkEntry q61): each arriving
    * document is MinHash-signed per-row (map-only native expression,
    * works unchanged under streaming), its band keys are stacked, and a
    * stream-static equi-join against the index scan yields
    * `(a = indexed id, b = streamed id)` candidate pairs. The corpus is
    * never re-signed; per-micro-batch work is O(batch + matched buckets).
    *
    * The distinct is a stateful streaming dedup on the pair key; without
    * an upstream watermark its state grows with distinct pairs — bound it
    * in production by watermarking the stream before this operator (the
    * state then expires like [[dedupStream]]'s).
    */
  def nearDupCandidates(
      docsStream: DataFrame,
      bandIndex: DataFrame,
      text: String,
      id: String,
      numHashes: Int = 8,
      bands: Int = 4): DataFrame = {
    import graft.operators.Dedup
    Dedup.incrementalPairs(bandIndex,
      Dedup.lshBands(signDocs(docsStream, text, id, numHashes),
        id, numHashes, bands), id, bands)
  }

  /** Per-row MinHash signature columns (m0..m{k-1}) of a document frame —
    * the map-only native-expression signing shared by the streaming
    * near-dup query side and the index maintenance side (per-row signing
    * means a signature is the same whether signed alone or with the
    * corpus, the property both rely on). */
  private def signDocs(docs: DataFrame, text: String, id: String,
      numHashes: Int): DataFrame =
    docs.where(col(text).isNotNull).select(col(id),
        graft.functions.MinHashSig.minhash_sig(col(text), numHashes).as("__sig"))
      .select(col(id) +: (0 until numHashes).map(i =>
        element_at(col("__sig"), i + 1).as(s"m$i")): _*)

  /** Sign one (static) micro-batch and append its band rows to the
    * persisted band index — the per-batch body of [[maintainBandIndex]],
    * exposed for direct use and testing. Returns false (a no-op) for a
    * batch id at or below the last applied one: `foreachBatch` is
    * at-least-once, so a retried micro-batch would otherwise DOUBLE-append
    * its band rows (and double-count toward the bucket cap). The guard
    * records the applied batch id in `<path>/lastbatch` AFTER the index
    * write — a crash between them re-runs the append (the torn state
    * [[graft.operators.Dedup.bandIndexVerify]] detects), never skips one.
    * The first batch onto an empty path builds the index; later ones
    * take the capped-append path, so the never-over-`maxBucket` invariant
    * holds across the whole stream lifetime. */
  def appendBatchToBandIndex(batch: DataFrame, batchId: Long,
      text: String, id: String, path: String,
      numHashes: Int = 8, bands: Int = 4,
      maxBucket: Int = Int.MaxValue): Boolean = {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    val last = graft.sources.Markers.readLastBatch(spark, s"$path/lastbatch")
    if (batchId <= last) false
    else {
      Dedup.bandIndexWrite(
        Dedup.lshBands(signDocs(batch, text, id, numHashes), id, numHashes, bands),
        id, bands, path, maxBucket, append = true)
      graft.sources.Markers.writeLastBatch(spark, s"$path/lastbatch", batchId)
      true
    }
  }

  /** Streaming band-index maintenance: each micro-batch is MinHash-signed
    * (map-only) and appended to the persisted band index via
    * [[appendBatchToBandIndex]], so the index [[nearDupCandidates]]
    * queries stays CURRENT under continuous ingest — a doc arriving in
    * batch N collides with a near-dup ingested in batch N−1
    * (StreamingSpec pins exactly that). The capped-append semantics
    * bound every bucket by construction across the stream's lifetime;
    * retried batches are no-ops via the `lastbatch` marker. Returns the
    * configured writer — caller sets `checkpointLocation` and `start()`s. */
  def maintainBandIndex(docsStream: DataFrame, text: String, id: String,
      path: String, numHashes: Int = 8, bands: Int = 4,
      maxBucket: Int = Int.MaxValue)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      appendBatchToBandIndex(batch, batchId, text, id, path,
        numHashes, bands, maxBucket)
      ()
    }
    docsStream.writeStream.foreachBatch(fn)
  }

  /** Streaming URL-key index maintenance — the crawl pipeline's stage
    * ZERO kept current under ingest: each micro-batch's canonical 8 B
    * URL hashes append idempotently
    * ([[graft.operators.Dedup.urlIndexAppendBatch]]), so
    * [[graft.operators.Dedup.urlIndexDuplicates]] answers "has this
    * resource been crawled before, under ANY cosmetic URL variant?"
    * against everything ingested so far — before a single content byte
    * is compared. Retried batches are no-ops via the `lastbatch`
    * marker. Caller sets `checkpointLocation` and `start()`s. */
  def maintainUrlIndex(docsStream: DataFrame, url: String, id: String,
      path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.Dedup.urlIndexAppendBatch(path, batch, url, id, batchId)
      ()
    }
    docsStream.writeStream.foreachBatch(fn)
  }

  /** Streaming winnow-index maintenance — the containment-screen twin of
    * [[maintainBandIndex]]: each micro-batch winnows only its own rows
    * (per-doc selection is corpus-independent, so batch sketches equal
    * whole-corpus sketches) and appends via the replay-guarded
    * [[graft.operators.Dedup.winnowAppendBatch]], keeping
    * [[graft.operators.Dedup.winnowIncrementalPairs]] current under
    * ingest — a doc arriving in batch N collides with a containment
    * match ingested in batch N−1 (StreamingSpec pins that, plus retry
    * idempotence and a green [[graft.operators.Dedup.winnowIndexVerify]]
    * afterwards). Caller sets `checkpointLocation` and `start()`s. */
  def maintainWinnowIndex(docsStream: DataFrame, text: String, id: String,
      path: String, k: Int = 3, w: Int = 4)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.Dedup.winnowAppendBatch(path,
        graft.operators.Dedup.winnowFingerprints(batch, text, id, k, w),
        id, batchId)
      ()
    }
    docsStream.writeStream.foreachBatch(fn)
  }

  /** The one foreachBatch shape behind the banded-fingerprint index
    * maintenance pair ([[maintainDHashIndex]]/[[maintainSpectralIndex]]):
    * per batch, run the caller's decode→fingerprint stage and append via
    * the replay-guarded [[graft.operators.Multimodal.dhashAppendBatch]].
    * The fingerprint stage emits the DHashRow shape whose id column is
    * `doc_id` REGARDLESS of the stream's id column name (the case-class
    * encoder renames) — the append is keyed on that, not on the caller's
    * name. */
  private def maintainBandedIndex(payloadStream: DataFrame, path: String,
      maxBucket: Int)(fingerprint: DataFrame => DataFrame)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.Multimodal.dhashAppendBatch(path,
        fingerprint(batch), "doc_id", batchId, maxBucket)
      ()
    }
    payloadStream.writeStream.foreachBatch(fn)
  }

  /** Streaming dHash-index maintenance — the image-ingest twin of
    * [[maintainWinnowIndex]]: each micro-batch of `(id, payload)` rows
    * decodes (PPM here; swap the decoder for other formats), hashes
    * map-only, and appends via the replay-guarded
    * [[graft.operators.Multimodal.dhashAppendBatch]], keeping
    * [[graft.operators.Multimodal.dhashIncrementalPairs]] current under
    * ingest. On a CAPPED index pass the index's `maxBucket` so every
    * batch append keeps the combined-size bucket invariant (an uncapped
    * append onto a capped index is refused by the operator). Caller sets
    * `checkpointLocation` and `start()`s. */
  def maintainDHashIndex(payloadStream: DataFrame, id: String,
      payload: String, path: String, maxBucket: Int = Int.MaxValue)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    maintainBandedIndex(payloadStream, path, maxBucket) { batch =>
      graft.operators.Multimodal.imageDHash(
        graft.operators.Multimodal.decodePpm(batch, id, payload))
    }

  /** Streaming SPECTRAL-index maintenance — the audio twin of
    * [[maintainDHashIndex]]: each micro-batch of `(id, wavPayload)` rows
    * decodes ([[graft.operators.Multimodal.decodeWav]]), fingerprints
    * map-only ([[graft.operators.Multimodal.audioSpectralFingerprint]] —
    * the gain-robust spectral hash), and appends via the replay-guarded
    * [[graft.operators.Multimodal.dhashAppendBatch]], keeping
    * [[graft.operators.Multimodal.dhashIncrementalPairs]] current under
    * ingest — the q146 probe against a live index. On a CAPPED index
    * pass the index's `maxBucket` (the [[maintainDHashIndex]] contract).
    * Caller sets `checkpointLocation` and `start()`s. */
  def maintainSpectralIndex(payloadStream: DataFrame, id: String,
      payload: String, path: String, maxBucket: Int = Int.MaxValue)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    maintainBandedIndex(payloadStream, path, maxBucket) { batch =>
      graft.operators.Multimodal.audioSpectralFingerprint(
        graft.operators.Multimodal.decodeWav(batch, id, payload))
    }

  /** Streaming IVF maintenance — the embedding-index twin of
    * [[maintainBandIndex]]: each micro-batch of `(id, emb)` vectors is
    * assigned against the index's STORED centroids (map-only — the
    * quantizer never moves under ingest) and appended into the cell
    * partitions via the replay-guarded
    * [[graft.operators.Similarity.ivfAppendBatch]], so a vector ingested
    * in batch N−1 is retrievable by [[graft.operators.Similarity
    * .ivfSearchIndexed]] in batch N (StreamingSpec pins that, and that a
    * retried batch appends nothing). Fragmentation under continuous
    * appends is repaired offline by [[graft.operators.Similarity
    * .ivfCompact]]; distribution drift is watched by `ivfDrift` — both
    * maintenance jobs, not per-batch work. Caller sets
    * `checkpointLocation` and `start()`s. */
  def maintainIvfIndex(vecsStream: DataFrame,
      idx: graft.operators.Similarity.IvfIndex)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.Similarity.ivfAppendBatch(idx, batch, batchId)
      ()
    }
    vecsStream.writeStream.foreachBatch(fn)
  }

  /** Streaming maintenance of the BQ CODE tier
    * ([[graft.operators.Similarity.BqIvfIndex]]): each micro-batch's
    * vectors are assigned against the persisted centroids, sign-bit
    * quantized, and their 8 B codes appended into the cell partitions —
    * so the tier q176 scans stays current under ingest without ever
    * touching the float index. Same `lastbatch` replay guard as
    * [[maintainIvfIndex]] (an at-least-once retry appends nothing);
    * same rebuild contract (a [[graft.operators.Similarity.bqIvfBuild]]
    * resets the marker). */
  def maintainBqIvfIndex(vecsStream: DataFrame,
      idx: graft.operators.Similarity.BqIvfIndex)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.Similarity.bqIvfAppendBatch(idx, batch, batchId)
      ()
    }
    vecsStream.writeStream.foreachBatch(fn)
  }

  /** Streaming semantic dedup — the ingest gate and the index
    * maintenance in ONE foreachBatch: each micro-batch is checked
    * against the MATERIALIZED corpus
    * ([[graft.operators.Similarity.semDedupIncremental]]: stored
    * quantizer, partition-pruned probe, broadcast batch) and only the
    * SURVIVORS append into the cell partitions — with the `lastbatch`
    * replay guard, so an at-least-once retry appends nothing. A batch-N
    * duplicate of a batch-N−1 ingest is flagged because that ingest's
    * survivors are already in the index. Batch-INTERNAL duplicates are
    * the caller's call — run `semDedup` on the batch inside `onBatch`
    * when micro-batches are large enough to care. `onBatch` receives
    * each batch's full verdict frame `(id, cell, cent_cos, dup_of,
    * keep)` for the gate's side effects (metrics, a quarantine sink). */
  def maintainSemDedupIndex(vecsStream: DataFrame,
      idx: graft.operators.Similarity.IvfIndex,
      cents: Seq[(Long, Seq[Double])], tau: Double,
      onBatch: DataFrame => Unit = _ => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      val verdict = graft.operators.Similarity
        .semDedupIncremental(idx, cents, batch, tau)
      onBatch(verdict)
      val survivors = batch.join(
        verdict.where(col("keep")).select(col(idx.id)), idx.id)
      graft.operators.Similarity.ivfAppendBatch(idx, survivors, batchId)
      ()
    }
    vecsStream.writeStream.foreachBatch(fn)
  }

  /** Streaming IVF-PQ maintenance — [[maintainIvfIndex]] for the code
    * index: each micro-batch routes through BOTH stored quantizers
    * (coarse assign + PQ encode, map-only) and appends into the cell
    * partitions with the `lastbatch` replay guard. The embedding index
    * stays searchable under continuous ingest without retraining. */
  def maintainIvfPqIndex(vecsStream: DataFrame,
      idx: graft.operators.Similarity.IvfPqIndex,
      cb: graft.operators.Similarity.PqCodebooks, emb: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.Similarity.ivfPqAppendBatch(idx, cb, batch, emb, batchId)
      ()
    }
    vecsStream.writeStream.foreachBatch(fn)
  }

  /** Streaming decontamination — the stream-static twin of the batch
    * eval-overlap gates (SparkEntry q62/q73): each arriving document
    * explodes to hashed word n-gram rows (map-only, the SAME operators as
    * batch — [[graft.operators.Dedup.shingles]] + `hashShingles`, so the
    * exchange-free 16 B/shingle discipline carries over), joins the small
    * STATIC eval shingle set as a broadcast, and a stateful distinct
    * emits each contaminated doc id exactly once across micro-batches.
    * State is O(flagged ids); bound it in production by watermarking
    * upstream (as [[dedupStream]] does) so ids expire with the event-time
    * horizon. The eval side refreshes like [[quantileGate]]'s thresholds.
    */
  def decontaminateStream(docsStream: DataFrame, evalSh: DataFrame,
      text: String, id: String, n: Int = 3): DataFrame = {
    import graft.operators.Dedup
    Dedup.hashShingles(
        Dedup.shingles(docsStream.where(col(text).isNotNull), text, id, n,
          dedup = false), id)
      .join(broadcast(evalSh), "sh_h")
      .select(id)
      .dropDuplicates(id)
  }

  /** Distribution-relative quality gate on a stream — the streaming form
    * of the batch per-stratum quantile gate
    * ([[graft.operators.TextOps.quantileKeep]], SparkEntry q65). A
    * quantile over an unbounded stream is ill-defined, so the thresholds
    * come from a STATIC frame ([[graft.operators.TextOps.quantileThresholds]]
    * with `exact = false` — approx_percentile's t-digest — over the
    * already-ingested corpus, refreshed on whatever cadence the corpus
    * drifts; re-reading the frame per micro-batch picks the refresh up).
    * The stream side is then a stateless broadcast join + comparison —
    * map-only per micro-batch, no stream-side shuffle, no state. Same
    * output schema as the batch gate: `(id, strata, value, thresh, kept)`.
    */
  def quantileGate(docsStream: DataFrame, thresholds: DataFrame,
      id: String, strata: String,
      value: org.apache.spark.sql.Column): DataFrame =
    graft.operators.TextOps.applyThresholds(
      docsStream, thresholds, id, strata, value)

  /** Distribution-drift monitor ON A STREAM — the ingest form of the
    * batch frozen-model drift
    * ([[graft.operators.TextOps.unigramDriftAgainst]], SparkEntry q167):
    * each micro-batch's per-stratum unigram distribution is measured
    * against a STATIC [[graft.operators.TextOps.unigramModel]] `(w, c)`
    * (the last known-good corpus, refreshed on whatever cadence it
    * drifts), and `(batch_id, stratum, n_tokens, terms_used, kl_bits)`
    * rows append to `path` — the alert feed an ingest pipeline tails for
    * a spam burst or topic shift BEFORE the batch joins the corpus. A KL
    * over an unbounded stream is ill-defined (like the quantile in
    * [[quantileGate]]), so the aggregate runs per micro-batch inside
    * foreachBatch — the same one-batch-one-append discipline as the
    * index-maintenance family; the batch-local KL is exactly the batch
    * operator's output (StreamingSpec pins stream ≡ batch). Caller sets
    * `checkpointLocation` and `start()`s. */
  def driftMonitor(docsStream: DataFrame, model: DataFrame, text: String,
      strata: String, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.TextOps.unigramDriftAgainst(batch, model, text, strata)
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(path)
      ()
    }
    docsStream.writeStream.foreachBatch(fn)
  }

  /** PSI drift monitor ON A STREAM — the numeric-feature twin of
    * [[driftMonitor]] (the q168 batch operator,
    * [[graft.operators.TextOps.psiDrift]]): each micro-batch's
    * per-stratum value distribution is binned against the STATIC
    * reference frame's quantile edges and
    * `(batch_id, stratum, n_docs, psi)` rows append to `path`. The
    * reference (and so the edges) is frozen like [[quantileGate]]'s
    * thresholds — refresh it on corpus cadence; the per-batch PSI is
    * exactly the batch operator's output (stream ≡ batch by
    * construction). Caller sets `checkpointLocation` and `start()`s. */
  def psiMonitor(docsStream: DataFrame, reference: DataFrame,
      value: String, strata: String, path: String, bins: Int = 5)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.TextOps.psiDrift(batch, reference, value, strata, bins)
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(path)
      ()
    }
    docsStream.writeStream.foreachBatch(fn)
  }

  /** Surgical eval decontamination AT INGEST — the streaming form of
    * the batch strip ([[graft.operators.Dedup.stripContaminatedSpans]],
    * SparkEntry q164): each micro-batch's docs are rebuilt with every
    * eval-overlapping span excised, and the cleaned rows append to
    * `path` tagged with the batch id. Contamination is defined against
    * the STATIC eval set only (a batch window is contaminated iff its
    * text occurs in the eval set — batch-local ≡ corpus-global, no
    * cross-batch coupling), but the span merge is a window-function
    * pass, which a streaming plan can't host — so the batch operator
    * runs unchanged per micro-batch inside foreachBatch (the
    * [[driftMonitor]] discipline; StreamingSpec pins stream ≡ batch).
    * Caller sets `checkpointLocation` and `start()`s. */
  def stripContaminatedStream(docsStream: DataFrame, evalDf: DataFrame,
      text: String, id: String, w: Int, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.Dedup.stripContaminatedSpans(batch, evalDf, text, id, w)
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(path)
      ()
    }
    docsStream.writeStream.foreachBatch(fn)
  }

  /** Streaming count-min maintenance — the frequency sketch kept
    * current under ingest: each micro-batch is sketched ALONE (a
    * bounded ≤ depth×width partial, however large the batch) and
    * appended replay-guarded ([[graft.operators.Sketch.sketchAppendBatch]]);
    * the mergeable-sketch property (SparkEntry q193) makes the
    * read-time cell-wise sum ([[graft.operators.Sketch.cmRead]])
    * EXACTLY the sketch of everything ingested so far — heavy-hitter
    * estimates stay live without ever rescanning history. Caller sets
    * `checkpointLocation` and `start()`s. */
  def maintainCountMin(tokStream: DataFrame, token: String, path: String,
      depth: Int, width: Int)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.Sketch.sketchAppendBatch(path,
        graft.operators.Sketch.countMinCells(batch, token, depth, width),
        batchId)
      ()
    }
    tokStream.writeStream.foreachBatch(fn)
  }

  /** Streaming HLL maintenance — the distinct-count twin of
    * [[maintainCountMin]]: per-batch registers appended, read-time
    * register-wise max ([[graft.operators.Sketch.hllRead]]) equals the
    * directly-built sketch (SparkEntry q196), so "how many distinct
    * URLs/tokens so far?" is answerable from ≤ batches × m stored rows.
    * Caller sets `checkpointLocation` and `start()`s. */
  def maintainHll(tokStream: DataFrame, token: String, path: String,
      by: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.Sketch.sketchAppendBatch(path,
        graft.operators.Sketch.hllRegisters(batch, token, by), batchId)
      ()
    }
    tokStream.writeStream.foreachBatch(fn)
  }

  /** Streaming HISTOGRAM maintenance — the range-selectivity tier kept
    * current under ingest (the round-13 verdict's maintained-histogram
    * ask): with bucket bounds FROZEN at `[lo, hi]` (the one-time ANALYZE
    * decision), each micro-batch's per-bucket counts
    * ([[graft.operators.Stats.histogramPartial]] — a bounded ≤ nBuckets
    * partial) append replay-guarded; read-time bucket-wise sum
    * ([[graft.operators.Stats.histogramRead]]) equals the direct
    * whole-corpus build bit for bit (SparkEntry q233), so range
    * estimates stay live without a rebuild. A batch value outside the
    * frozen span fails the batch loud — the re-freeze signal. Caller
    * sets `checkpointLocation` and `start()`s. */
  def maintainHistogram(valStream: DataFrame, c: String, path: String,
      nBuckets: Int, lo: Long, hi: Long)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.Sketch.sketchAppendBatch(path,
        graft.operators.Stats.histogramPartial(batch, c, nBuckets, lo, hi),
        batchId)
      ()
    }
    valStream.writeStream.foreachBatch(fn)
  }

  /** Streaming KMV maintenance — the bottom-k sample kept current under
    * ingest: each micro-batch's per-group sample (≤ k rows per group)
    * appends replay-guarded; read-time min-k
    * ([[graft.operators.Sketch.kmvRead]]) equals the directly-built
    * sketch by the min-k merge property (SparkEntry q206), so distinct
    * counts AND cross-group intersections stay answerable from
    * ≤ batches × k stored rows per group. Caller sets
    * `checkpointLocation` and `start()`s. */
  def maintainKmv(tokStream: DataFrame, token: String, path: String,
      by: Seq[String] = Nil, k: Int = graft.operators.Sketch.KmvK)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.Sketch.sketchAppendBatch(path,
        graft.operators.Sketch.kmvSketch(batch, token, by, k), batchId)
      ()
    }
    tokStream.writeStream.foreachBatch(fn)
  }

  /** Streaming host-graph edge maintenance — the link graph kept
    * current under crawl ingest: each micro-batch's weighted edge
    * aggregate (an additive partial, exactly the count-min shape)
    * appends replay-guarded; read-time keyed sum
    * ([[graft.operators.Sketch.sumRead]]) is exactly the whole-history
    * edge list, so PageRank/authority (SparkEntry q203/q217) stays
    * recomputable without rescanning old batches. The stream rows are
    * `(src, dst)` link observations; weights are the batch counts.
    * Caller sets `checkpointLocation` and `start()`s. */
  def maintainEdges(linkStream: DataFrame, src: String, dst: String,
      path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (DataFrame, Long) => Unit = (batch, batchId) => {
      graft.operators.Sketch.sketchAppendBatch(path,
        batch.groupBy(col(src).as("src"), col(dst).as("dst"))
          .agg(count(lit(1)).as("w")), batchId)
      ()
    }
    linkStream.writeStream.foreachBatch(fn)
  }

  /** The CURRENT edge list under a maintained path — the read side
    * every graph query goes through (SparkEntry q217/q244): keyed sum
    * of the appended weight partials, with edges whose weight summed
    * to ZERO dropped (a fully-forgotten edge is ABSENT, not a
    * zero-weight row — a ghost edge would put its endpoints back in
    * the node set and shift every teleport share). A NEGATIVE sum
    * (over-deletion) flows into [[graft.operators.Graph]]'s
    * non-positive-weight raise, the family's fail-loud guard. */
  def edgeRead(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    graft.operators.Sketch.sumRead(spark, path, Seq("src", "dst"), "w")
      .where(col("w") =!= 0)

  /** RTBF for the maintained edge list (the round-14 verdict gap: a
    * forgotten document's outlinks kept shaping PageRank forever):
    * edge weights are ADDITIVE partials, so the q230 count-min
    * negative-partial discipline applies verbatim — append the
    * NEGATED weighted aggregate of the forgotten documents' link
    * observations (`forgottenLinks` = the same `(src, dst)` rows those
    * documents contributed at ingest), replay-guarded by the ingest
    * protocol itself (a replayed delete batch would subtract twice —
    * the batch tag stops it, gated in-memo like q230). Every
    * [[edgeRead]] from the append on serves the truncated graph; no
    * history rescan. Returns true iff the batch applied. */
  def edgeForgetBatch(forgottenLinks: DataFrame, src: String, dst: String,
      path: String, batchId: Long): Boolean =
    graft.operators.Sketch.sketchAppendBatch(path,
      forgottenLinks.groupBy(col(src).as("src"), col(dst).as("dst"))
        .agg((-count(lit(1))).as("w")), batchId)

  /** PURGE the maintained edge list: atomic rewrite of `<path>/parts`
    * as the current LIVE nonzero edges (one summed batch, tagged
    * `-1`) — the forgotten documents' rows leave the storage
    * physically and the parts directory compacts to |edges| rows
    * regardless of batch count. The `lastbatch` marker stays valid
    * (purge is maintenance, not a rebuild — later appends keep their
    * replay guard), mirroring [[graft.operators.Sketch.kmvPurge]]. */
  def edgePurge(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val live = graft.engine.Checkpoints.mark(
      edgeRead(spark, path).withColumn("batch_id", lit(-1L)))
    try graft.operators.Rtbf.swapRewrite(spark, path, "parts", live)
    finally graft.engine.Checkpoints.release(live)
  }

  /** Paired-modality alignment gate ON A STREAM — the ingest form of
    * the batch LAION filter ([[graft.operators.Similarity.alignmentFilter]],
    * SparkEntry q152): cosine between each incoming pair's caption and
    * image embedding columns, keep = `align_cos ≥ tau`. The score is a
    * pure projection, so the stream side is STATELESS map-only — no
    * shuffle, no watermark, no state store; it composes with
    * [[quantileGate]] for the distribution-relative variant (static
    * per-stratum thresholds over the already-ingested corpus, refreshed
    * on corpus drift). Same output schema as the batch gate. */
  def alignmentGate(pairsStream: DataFrame, embA: String, embB: String,
      tau: Double): DataFrame =
    graft.operators.Similarity.alignmentFilter(pairsStream, embA, embB, tau)

  /** Custom keyed state via mapGroupsWithState: per-user running
    * count/sum/max — state the built-in aggregations would re-shuffle for,
    * kept incrementally per key. State size is O(keys), partitioned by key
    * hash, so it scales out with executors.
    */
  def runningStats(events: Dataset[Evt]): Dataset[KeyStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Evt], state: GroupState[KeyStats]) =>
          val prev = state.getOption.getOrElse(KeyStats(user, 0L, 0.0, Double.MinValue))
          val next = rows.foldLeft(prev) { (s, e) =>
            KeyStats(user, s.n + 1, s.sum + e.value, math.max(s.max, e.value))
          }
          state.update(next)
          next
      }
  }
}
