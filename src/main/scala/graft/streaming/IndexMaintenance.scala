package graft.streaming

import graft.Tables.embeddings
import graft.operators.Similarity
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** st16 — streaming index maintenance: the persisted IVF index kept
  * current by a micro-batch CDC stream instead of nightly batch jobs.
  * The reference deployment re-imports and re-indexes on a schedule;
  * a 100 TB vector corpus cannot (a rebuild is a corpus rescan plus a
  * Lloyd retrain), so the serving index must absorb the delta stream
  * in place. The batch append path already exists and is proven
  * (appendIvf: assignment is a pure per-vector function of (vector,
  * centroids), so append ≡ rebuild-at-fixed-centroids exactly); this
  * module is its streaming face — foreachBatch drives the SAME
  * per-batch function, so the streamed index and the batch-appended
  * index cannot fork. Recall over the streamed index is re-asserted by
  * the same monitor shape s11 runs (StreamingSpec), because append
  * correctness and retrieval quality are separate claims.
  *
  * Exactly-once: Spark's foreachBatch replays a batch after a restart,
  * and a blind bucketed append would duplicate its rows. Each applied
  * batchId leaves a marker INSIDE the index table's own directory
  * (`_graft_ledger/` — underscore-prefixed, so every parquet scan
  * ignores it); a replayed id is skipped ([[appendIvfBatch]] returns
  * false). Living in the table dir ties the ledger to the index's
  * lifetime: an overwrite rebuild clears both together, so a stale
  * ledger can never silently swallow appends into a fresh index (the
  * exact failure a Scratch-side ledger had — the session catalog is
  * per-JVM, tables rebuild per session, but Scratch persists). The
  * done marker lands AFTER the append commits, so a crash between them
  * leaves the batch applied but unmarked; to keep that window
  * exactly-once (not at-least-once-with-duplicates) every attempt
  * first drops an INTENT marker, and a replay that finds intent
  * without done takes the dedup path — it re-assigns the batch and
  * anti-joins the (vec_id, cid) rows already in the cells table before
  * appending only what's missing. The anti-join keys on (vec_id, cid),
  * not vec_id alone, because the bucketed write re-clusters a vector's
  * IVF_ASSIGN rows by cid across task files — a driver crash mid
  * job-commit (FileOutputCommitter publishes task outputs
  * sequentially) can leave a vector partially assigned, and vec_id
  * presence alone would mask the missing cells. The common no-crash
  * path stays one blind append; the cells-table (vec_id, cid) scan is
  * paid only on the replay-after-crash path.
  */
object IndexMaintenance {

  private def marker(s: SparkSession, cellsT: String, batchId: Long): Path = {
    val loc = s.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(cellsT)).location
    new Path(s"$loc/_graft_ledger/b$batchId")
  }

  /** Idempotent micro-batch append into a persisted IVF index: apply
    * `delta` under `batchId` unless that id already applied. Returns
    * true iff the batch was applied (or repaired) now. Intent/done
    * marker pair per the object doc: intent-without-done means a prior
    * attempt crashed after (possibly partially) committing its append,
    * so that replay appends only the (vec_id, cid) rows still missing.
    */
  def appendIvfBatch(s: SparkSession, cellsT: String, centT: String,
      batchId: Long, delta: DataFrame): Boolean = {
    val done = marker(s, cellsT, batchId)
    val f = done.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (f.exists(done)) false
    else {
      val intent = new Path(done.getParent, s"b$batchId.intent")
      val rows = delta.select(col("vec_id"), col("embedding"))
      if (f.exists(intent)) {
        val missing = Similarity.assignCells(rows, s.table(centT))
          .join(s.table(cellsT).select(col("vec_id"), col("cid")),
            Seq("vec_id", "cid"), "left_anti")
        if (!missing.isEmpty)
          Similarity.appendIvfAssigned(s, cellsT, missing)
      } else {
        f.mkdirs(intent)
        Similarity.appendIvf(s, cellsT, centT, rows)
      }
      f.mkdirs(done) // done BEFORE intent cleanup: the inverse order
      f.delete(intent, true) // re-opens the crash window it closes
      true
    }
  }

  /** Continuous maintenance: a stream of (vec_id, embedding) rows
    * appended into the index per micro-batch, exactly once per batchId.
    */
  def ivfMaintenanceSink(s: SparkSession, vectors: DataFrame,
      cellsT: String, centT: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: Dataset[Row], batchId: Long) => {
        appendIvfBatch(batch.sparkSession, cellsT, centT, batchId,
          batch.toDF()); ()
      })
      .start()

  /** Gate face: the appended-lifecycle corpus quarter arriving as
    * three deterministic micro-batches through the SAME per-batch
    * function the sink calls (st12's convention), batch 0 replayed to
    * prove the ledger. The output compares the streamed index against
    * [[Similarity.ensureIvfIndexAppended]]'s batch-appended twin (both
    * assign with the SAME fixed centroids): three rows — batch,
    * common (the semi-join of streamed into batch), streamed — whose
    * equal n_rows/n_cells IS cells-table equality. Deterministic
    * (assignment is a pure function of (vector, centroids)); no SQL
    * oracle expresses the k-means assignment, so the entry is
    * rows-only with a twin-equality evidence row. Build-once per sf
    * dir; a half-built table (killed run) is detected by row count and
    * rebuilt.
    */
  def st16(s: SparkSession, d: String): DataFrame = {
    val nb = graft.GraftConf.indexBuckets(s)
    val tag = graft.Scratch.tag(d)
    val (appCells, appCent) = Similarity.ensureIvfIndexAppended(s, d)
    val streamT = s"graft_ivf_stream_cells_${tag}_b$nb"
    val e = embeddings(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val mod = Similarity.APP_DELTA_MOD
    if (!s.catalog.tableExists(streamT) ||
        s.table(streamT).count() != s.table(appCells).count()) {
      if (s.catalog.tableExists(streamT)) s.sql(s"DROP TABLE $streamT")
      // the overwrite below clears the table dir INCLUDING its
      // _graft_ledger, so the re-streamed batches re-apply cleanly
      val base = e.filter(col("vec_id") % mod =!= mod - 1)
      Similarity.assignCells(base, s.table(appCent))
        .write.mode("overwrite")
        .bucketBy(nb, "cid").sortBy("cid")
        .option("path", s"${graft.Scratch.dir}/ivf_stream_cells/${tag}_b$nb")
        .saveAsTable(streamT)
      val delta = e.filter(col("vec_id") % mod === mod - 1)
      (0 until 3).foreach { b =>
        appendIvfBatch(s, streamT, appCent, b.toLong,
          delta.filter(expr(s"(vec_id div $mod) % 3") === b))
      }
      // a replayed batchId must be a no-op (the restart/replay path)
      require(!appendIvfBatch(s, streamT, appCent, 0L, delta),
        "replayed batch 0 was re-applied — ledger broken")
    }
    def leg(nm: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_rows"),
        countDistinct(col("cid")).as("n_cells"))
        .select(lit(nm).as("index"), col("n_rows"), col("n_cells"))
    val streamed = s.table(streamT).select("vec_id", "cid")
    val batched = s.table(appCells).select("vec_id", "cid")
    val common = streamed.join(batched, Seq("vec_id", "cid"), "left_semi")
    Seq(leg("batch", batched), leg("common", common),
      leg("streamed", streamed))
      .reduce(_ unionByName _)
      .transform(graft.Gate.ordered("index"))
  }
}
