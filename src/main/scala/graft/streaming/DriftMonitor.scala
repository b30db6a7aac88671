package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** st18 — streaming distribution-drift monitor: t23 as a continuous
  * query over the document ingest feed.
  *
  * A 100 TB ingest pipeline wants the drift alarm LIVE (is today's
  * crawl shaped like the corpus?), not at the end of a batch job. The
  * streaming form is a complete-mode aggregation whose ENTIRE state is
  * the (source, bin) count matrix — |sources|×8 rows regardless of
  * stream length, the textbook small-state/big-stream shape, so
  * complete mode is not a scale concession but the point: every
  * micro-batch refreshes a tiny frame, and the PSI arithmetic runs on
  * that frame, never on the stream. Binning and scoring are the SAME
  * definitions t23 uses (TextAnalysis.t23Bin / t23FromCounts), so the
  * live score and the batch score cannot fork.
  *
  * The gate entry drives a REAL stream (file source over the parquet
  * corpus, availableNow) into a foreachBatch overwrite of the counts
  * frame — last trigger wins, so re-runs are idempotent and the final
  * state equals the batch counts exactly; the oracle is t23's SQL
  * verbatim. StreamingSpec additionally proves micro-batch-split
  * invariance by driving the same corpus through a MemoryStream in
  * arbitrary batch slices.
  */
object DriftMonitor {

  private[graft] val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The streaming counts aggregation — shared by the gate entry and
    * the MemoryStream spec. Complete mode: state = the counts matrix.
    */
  private[graft] def driftCounts(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"), TextAnalysis.t23Bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** One catch-up run's outcome: the drift frame after the run, plus
    * how many input rows the run actually processed (0 = nothing new
    * arrived; the counts state and `out` are simply carried forward).
    */
  final case class CatchUp(drift: DataFrame, inputRows: Long)

  /** Production resumable form of the monitor: the checkpoint is KEPT,
    * so each availableNow invocation processes ONLY the files that
    * arrived since the last run and folds them into the complete-mode
    * counts state — a nightly/hourly catch-up costs the delta, never a
    * corpus rescan. (The st18 gate face below deletes its checkpoint
    * on purpose: its contract is "recompute from the corpus", and a
    * kept checkpoint would turn gate re-runs into zero-batch no-ops.
    * This is the form an ops deployment schedules.) A run that finds
    * no new files triggers zero batches and leaves `out` at the last
    * state — idempotent by construction. At 100 TB the state is still
    * the |sources|x8 counts matrix; the stream's cost is the new
    * files' scan only.
    */
  def monitorResumable(s: SparkSession, docsDir: String, out: String,
      ckpt: String): CatchUp = {
    val stream = s.readStream.schema(docSchema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(docsDir)
    val q = driftCounts(stream)
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(out)
      }
      .start()
    q.awaitTermination()
    val rows = q.recentProgress.map(_.numInputRows).sum
    CatchUp(TextAnalysis.t23FromCounts(s.read.parquet(out)), rows)
  }

  /** Run the monitor over a corpus dir as a real availableNow stream;
    * returns the drift frame computed from the streamed counts.
    */
  def st18(s: SparkSession, d: String): DataFrame = {
    val tag = graft.Scratch.tag(d)
    val out = s"${graft.Scratch.dir}/st18_counts/$tag"
    val ckpt = s"${graft.Scratch.dir}/st18_ckpt/$tag"
    // fresh run each invocation: the stream is the thing under test,
    // a stale checkpoint would turn re-runs into zero-batch no-ops
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
    // basePath must be a directory; the glob filter narrows the file
    // stream to the documents table inside the multi-table sf dir
    val stream = s.readStream.schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(d)
    val q = driftCounts(stream)
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(out)
      }
      .start()
    q.awaitTermination()
    TextAnalysis.t23FromCounts(s.read.parquet(out))
  }
}
