package graft

import org.apache.spark.sql.functions._
import graft.sources.{AtomicPublish, WarcOps}
import graft.streaming.StreamingOps

/** The streamed full pipeline (warc.gz file stream → extract →
  * canon-dedup vs the published state → model gate → blocklist →
  * tokenize → exactly-once publish): equal to the batch showpiece,
  * replay-safe at the commit window, cross-batch dedup observable.
  */
class StreamPipelineSpec extends SparkSpec {

  test("streamed pool packs to the batch showpiece's exact output, " +
      "and the cross-batch canon-dedup fired on the straddling group") {
    val batch = SparkEntry.queries("e_pipeline_full")(spark, sf)
      .collect().toSeq
    val streamed = SparkEntry.queries("e_stream_pipeline_full")(spark, sf)
      .collect().toSeq
    assert(streamed == batch,
      "streamed pack diverged from the batch composition")
  }

  test("kill-and-replay at the commit window: a re-delivered batchId " +
      "is refused, the published pool is unchanged, and a later batch " +
      "of already-seen URLs dedups to nothing") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pipe_spec").toString
    StreamingOps.runFullPipelineStream(spark, sf, root)
    val docs = Tables.load(spark, sf, "documents")
    def pool() = AtomicPublish.readStreamPublished(spark, root)
      .orderBy("doc_id").collect().toSeq
    val committed = pool()
    assert(committed.nonEmpty)
    // the straddling canon group {102, 103}: 102 arrived in day 1 and
    // won; 103 arrived in day 2 and must have been anti-joined away by
    // the PUBLISHED state, exactly like the batch window rule
    val ids = committed.map(_.getLong(0)).toSet
    assert(ids.contains(102L), "group winner 102 missing from the pool")
    assert(!ids.contains(103L),
      "cross-batch canon-dup 103 leaked into the pool")
    // foreachBatch is at-least-once: re-deliver day 2 under its
    // original batchId — the commit protocol must refuse (no-op), not
    // double-publish
    val w = graft.operators.QualityModelOps.trainedWeights(spark, sf)
    val tok = graft.operators.CorpusOps.bpeTokenCounts(spark, sf)
    val day2 = WarcOps.synthWarcFilesGz(
      docs.where(col("doc_id") >= StreamingOps.PipelineSplitId))
    assert(!StreamingOps.processPipelineBatch(
      spark, day2, 1L, root, w, tok), "replayed batchId was committed")
    assert(pool() == committed, "replay mutated the published pool")
    // a FRESH batch whose content is all already-published canon URLs
    // commits (the marker advances) but contributes zero rows — the
    // published state is the dedup index, so re-crawled pages drop
    assert(StreamingOps.processPipelineBatch(
      spark, day2, 2L, root, w, tok), "fresh batchId refused")
    assert(pool() == committed,
      "re-crawled duplicate content leaked into the pool")
    assert(AtomicPublish.currentStream(root).exists(_.lastBatch == 2L),
      "marker did not advance past the all-duplicate batch")
  }
}
