package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncation strategy for iterative DataFrame algorithms
  * (Dedup.d06's label propagation): every iteration MUST materialize
  * its output and cut the plan, or the analyzed plan doubles per
  * iteration (join left + union right both embed the previous one) and
  * Catalyst grinds to a halt around iteration 8.
  *
  * HOW to materialize is a deployment decision, so it is a parameter,
  * not a comment:
  *
  *  - [[LocalCheckpointer]] — `localCheckpoint()`: blocks cached on the
  *    executors that computed them. Right for single-JVM runs (tests,
  *    Bench, local mode); on a cluster an executor loss kills the
  *    lineage-free blocks and the job with them.
  *  - [[ReliableCheckpointer]] — `checkpoint()` into a fault-tolerant
  *    directory (HDFS/object store): survives executor loss, the
  *    cluster form for a fixpoint loop that may run tens of iterations
  *    over 100 TB. Costs a write+read per iteration — the price of
  *    restartability.
  *
  * DedupSpec proves both strategies reach identical labels.
  */
sealed trait Checkpointer {
  def apply(df: DataFrame): DataFrame
}

case object LocalCheckpointer extends Checkpointer {
  def apply(df: DataFrame): DataFrame = df.localCheckpoint()
}

/** Reliable checkpointing into `dir` (set as the SparkContext
  * checkpoint dir on first use; pass an HDFS/object-store URI on a
  * real cluster).
  */
final case class ReliableCheckpointer(dir: String) extends Checkpointer {
  def apply(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    // setCheckpointDir resolves to a scheme-qualified URI and appends a
    // per-app UUID subdir under `dir` — so an existing checkpoint dir
    // belongs to THIS checkpointer iff its PARENT equals the qualified
    // form of `dir`, compared exactly. (A substring match here let
    // overlapping names like /tmp/ck and /tmp/ck2 silently share one
    // directory, and mistook any unrelated pre-set dir containing the
    // string for ours.)
    val p = new org.apache.hadoop.fs.Path(dir)
    val qualified = p.getFileSystem(sc.hadoopConfiguration).makeQualified(p)
    val ours = sc.getCheckpointDir
      .exists(cd => new org.apache.hadoop.fs.Path(cd).getParent == qualified)
    if (!ours) sc.setCheckpointDir(dir)
    df.checkpoint()
  }
}
