package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.ops.VectorOps

/** Streaming maintenance of a PERSISTED ANN index — the ingest half of
  * the IVFADC serve lifecycle running continuously instead of as a
  * daily batch: each arriving micro-batch of vectors encodes against
  * the FROZEN saved model halves (coarse centroids + PQ codebook,
  * exactly [[graft.ops.VectorOps.encodeWithIndex]] — so a vector
  * encodes identically whether it arrived in training, in a batch
  * append, or on the stream) and lands as its own append dir in the
  * index's codes table. Model halves stay frozen between deliberate
  * retrains, the standard IVF ingest contract; drift between retrains
  * is what `q_ivf_cell_balance` / [[graft.ops.VectorOps.ivfCellShares]]
  * monitor, and `q_ann_recall` is the end-to-end quality readout.
  *
  * foreachBatch is the right bridge (the [[DocStream.dedupOnIngest]]
  * rationale): encoding is a broadcast-join batch pipeline, not a
  * stateless streaming operator. Replay safety is a two-step commit
  * per `append=<baseAppendId + batchId>` dir — parquet `_SUCCESS`
  * seals the data, an ownership marker names this stream (its
  * checkpoint dir) as the writer — so a redelivered batch SKIPS its
  * own committed dir (sealed data is never deleted or rewritten under
  * a live reader) and a foreign sealed dir under the same id is a
  * loud error, never a silent overwrite
  * ([[graft.ops.VectorOps.appendBatchToIvfPqIndex]]).
  */
object EmbStream {

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def readEmbeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(embSchema)
      .parquet(s"$sfDir/embeddings.*")

  /** Maintain a persisted IVFADC index from a vector stream: the saved
    * model is read ONCE at stream start (centroids + codebook are
    * broadcast-sized; the codes table is never read here — per-batch
    * cost scales with the batch, not the index). `baseAppendId`
    * offsets the stream's micro-batch ids above the appends already in
    * the artifact (streaming ids start at 0 on a fresh checkpoint;
    * append=0 is the training write) — pass the SAME value when
    * restarting from the checkpoint, since redelivered batch ids must
    * map to the dirs they wrote before the crash (a FRESH checkpoint
    * needs a fresh baseAppendId above every existing AND absorbed
    * append — [[graft.ops.VectorOps.nextAppendId]] computes it; the
    * ownership marker turns a stale one into a loud error, not data
    * loss). While the stream runs it must be the index's only writer
    * (the serial-writer contract appends and retrains already carry);
    * retraining is a deliberate stop-retrain-restart event, the
    * retrain MUST cover everything the stream has ingested (a replayed
    * pre-retrain batch is deduplicated against the old version's
    * markers on that contract), and pruning the old version waits
    * until the restarted stream has caught up past its pre-retrain
    * batches.
    */
  def indexOnIngest(newVecs: DataFrame, indexDir: String,
      checkpointDir: String,
      baseAppendId: Long = 1L): org.apache.spark.sql.streaming.StreamingQuery = {
    val index = VectorOps.readIvfPqIndex(newVecs.sparkSession, indexDir)
    newVecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // writerId = the checkpoint dir: the one identity that is
        // stable across restarts of THIS stream and distinct for any
        // other incarnation (a different checkpoint = a different
        // batch-id numbering = a different owner)
        VectorOps.appendBatchToIvfPqIndex(index, batch, indexDir,
          baseAppendId + id, writerId = checkpointDir)
      }
      .start()
  }
}
