package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming deduplication — the ingest-time face of [[graft.operators
  * .Dedup]] for a continuously-arriving document corpus (the reference
  * has no streaming at all; this is the training-data-pipeline extension
  * alongside the batch operators).
  *
  * Two layers, mirroring the batch `dedupCorpus` composition:
  *
  *  1. [[exactDedupStream]] — first occurrence per content hash, state
  *     bounded by the watermark (Spark's `dropDuplicatesWithinWatermark`:
  *     RocksDB/HDFS-backed key state, evicted as event time advances).
  *     Mass duplication is caught here, exactly once per hash per
  *     watermark horizon.
  *  2. [[nearDupCandidates]] — stateful MinHash-LSH: each doc's band
  *     hashes key a `flatMapGroupsWithState` whose state is the first
  *     doc id seen in that bucket; later docs landing in the bucket emit
  *     `(doc_id, candidate_of)` pairs. State is per non-empty bucket and
  *     carries a processing-time TTL, so the footprint is
  *     O(active buckets), not O(stream length).
  *
  * Candidates are per-band (a pair sharing several bands is emitted once
  * per shared band) and UNVERIFIED — at scale you window them and run the
  * batch verification kernel (`Dedup.ngramJaccard`) over the candidate
  * set, exactly like the batch LSH path does in one job.
  */
object StreamingDedup {

  /** First occurrence per `sha2(content)` within the watermark horizon.
    * Input needs `content` and an `event_time` timestamp column. */
  def exactDedupStream(records: DataFrame,
                       watermark: String = "10 minutes"): DataFrame =
    records
      .withColumn("sha256", sha2(col("content"), 256))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(Seq("sha256"))

  case class BandRow(bucket_key: String, doc_id: String)
  case class BucketState(firstDoc: String)
  case class Candidate(doc_id: String, candidate_of: String,
                       bucket_key: String)

  /** Stateful LSH near-duplicate candidates over a streaming documents
    * frame (`idCol`, `textCol`). Same signature family as the batch
    * [[Dedup.minhashLsh]] (k hashes, `bands` bands, shingle n-grams) —
    * the band-row computation IS the batch one (`minhashBandRows`), so
    * stream and batch bucket identically.
    *
    * `stateTtl` evicts idle bucket owners on a processing-time timeout —
    * note that registered timeouts make the no-trigger default run
    * continuous empty micro-batches to fire them (fine under a real
    * `Trigger.ProcessingTime`, and it starves `processAllAvailable`-style
    * synchronous drains); pass `stateTtl = ""` for unbounded state with
    * data-driven batches only. */
  def nearDupCandidates(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", k: Int = 64,
                        bands: Int = 16, shingleN: Int = 3,
                        stateTtl: String = "30 minutes"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val withTtl = stateTtl != null && stateTtl.nonEmpty
    val bandRows = Dedup
      .minhashBandRows(docs, textCol, idCol, k, bands, shingleN)
      .select(concat_ws(":", col("band"), col("band_hash")).as("bucket_key"),
        col("id").cast("string").as("doc_id"))
      .as[BandRow]
    bandRows.groupByKey(_.bucket_key)
      .flatMapGroupsWithState[BucketState, Candidate](OutputMode.Append,
        if (withTtl) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (bucket: String, rows: Iterator[BandRow],
         state: org.apache.spark.sql.streaming.GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var owner = state.getOption.map(_.firstDoc).orNull
            val out = rows.flatMap { r =>
              if (owner == null) { owner = r.doc_id; None }
              else if (r.doc_id != owner)
                Some(Candidate(r.doc_id, owner, bucket))
              else None
            }.toList
            state.update(BucketState(owner))
            if (withTtl) state.setTimeoutDuration(stateTtl)
            out.iterator
          }
      }.toDF()
  }

  /** Distinct candidate PAIRS from the per-band candidate stream of one
    * micro-batch window (normalized a < b) — the frame you hand to the
    * batch verification kernel. Stateless; usable under foreachBatch. */
  def candidatePairs(candidates: DataFrame): DataFrame =
    candidates.select(
      least(col("doc_id"), col("candidate_of")).as("id_a"),
      greatest(col("doc_id"), col("candidate_of")).as("id_b"))
      .where(col("id_a") =!= col("id_b"))
      .distinct()
}
