package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming late-data observability — the ops face of the watermark
  * contract. Every watermarked stream here (st01/st07/st11's faces)
  * DROPS events that arrive behind the watermark; that is the correct
  * semantics for an append-mode pipeline, but a deployment must be able
  * to SEE the drop rate — silently shrinking counts are
  * indistinguishable from traffic loss without it. Spark already
  * measures everything needed per micro-batch
  * (StreamingQueryProgress: per-operator numRowsDroppedByWatermark,
  * state sizes, the watermark itself); this module turns that event
  * stream into a queryable DataFrame via a StreamingQueryListener —
  * driver-side, constant memory per batch, zero cost on the hot path
  * (the listener bus is async and off the task threads).
  */
object Observability {

  /** One micro-batch's health row. `dropped_late_rows` counts input
    * rows discarded because they arrived behind the watermark
    * (summed over stateful operators); `state_rows` is the retained
    * state footprint the watermark is there to bound.
    */
  case class BatchMetric(query_name: String, batch_id: Long,
      input_rows: Long, dropped_late_rows: Long, state_rows: Long,
      watermark: String, batch_ts: String)

  /** Accumulates per-batch metrics from the listener bus. One recorder
    * can watch any number of concurrent queries (rows carry the query
    * name); attach/detach per monitoring scope.
    */
  class Recorder extends StreamingQueryListener {
    private val buf = new ConcurrentLinkedQueue[BatchMetric]()
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryIdle(e: QueryIdleEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      buf.add(BatchMetric(
        Option(p.name).getOrElse(p.id.toString), p.batchId,
        p.numInputRows,
        p.stateOperators.map(_.numRowsDroppedByWatermark).sum,
        p.stateOperators.map(_.numRowsTotal).sum,
        Option(p.eventTime.get("watermark")).getOrElse(""),
        p.timestamp))
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    private[graft] def snapshot: Seq[BatchMetric] = {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq
    }
  }

  def attach(s: SparkSession): Recorder = {
    val r = new Recorder
    s.streams.addListener(r)
    r
  }

  def detach(s: SparkSession, r: Recorder): Unit =
    s.streams.removeListener(r)

  /** The raw per-batch metric frame (one row per micro-batch seen so
    * far). The listener bus delivers asynchronously — call after
    * `processAllAvailable`/`awaitTermination`, or poll.
    */
  def metrics(s: SparkSession, r: Recorder): DataFrame = {
    import s.implicits._
    r.snapshot.toDF()
  }

  /** Per-query rollup — the dashboard row: batches seen, input volume,
    * TOTAL dropped-late rows, current state footprint and watermark
    * high-mark.
    */
  def lateDataSummary(s: SparkSession, r: Recorder): DataFrame =
    metrics(s, r)
      .groupBy(col("query_name"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("input_rows")).as("input_rows"),
        sum(col("dropped_late_rows")).as("dropped_late_rows"),
        max(col("state_rows")).as("max_state_rows"),
        max(col("watermark")).as("watermark_high"))
}
