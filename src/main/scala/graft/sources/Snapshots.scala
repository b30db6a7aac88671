package graft.sources

import graft.Gate
import graft.Tables._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A replace-form commit (commitReplace / a compaction attempt) lost
  * its CAS race: a concurrent commit landed after this writer read the
  * base version, so the pre-computed replacement state no longer
  * reflects the table — blindly re-stamping it at the next version
  * would silently DROP the interloper's rows (the lost-update bug this
  * exception exists to prevent; Delta raises the same class of
  * conflict for concurrent metadata changes). Callers that can
  * recompute from the new head (compact does, internally) retry;
  * callers that cannot (a CDC merge built from a specific base) must
  * surface the conflict to whoever owns the merge semantics.
  */
final class SnapshotConflictException(msg: String)
  extends RuntimeException(msg)

/** Snapshot-isolated append commits with time travel — the lakehouse
  * table contract (Iceberg/Delta's core idea, re-derived minimally) a
  * 100 TB deployment needs so readers NEVER see a half-written table
  * and audits can re-run against the exact bytes a past report saw.
  * The reference gets this from PostgreSQL's MVCC (its CRC store is
  * transactional); on a parquet lake it has to be built:
  *
  *   root/data/w<token>/       immutable data files, one dir per commit
  *                              attempt (writer-unique name)
  *   root/manifests/v<n>.json   the dir list visible at snapshot n —
  *                              its EXCLUSIVE creation is the one
  *                              commit point (optimistic concurrency)
  *   root/HEAD                  hint to the current version; readers
  *                              probe manifests forward from it
  *
  * Correctness rests on two facts: data files are immutable once a
  * manifest references them (a reader planned against snapshot n lists
  * exactly those files — later commits cannot change what it reads),
  * and manifest v<n> can be created by exactly ONE writer (an atomic
  * link/no-overwrite rename — the CAS primitive PostgreSQL MVCC gives
  * the reference for free). Two writers racing version n both write
  * their data under writer-unique dirs, then race the manifest: the
  * winner owns v<n>; the loser re-reads head, REBASES its manifest on
  * the winner's state, and retries as v<n+1> — both commits land, no
  * rows lost. A crash before the manifest publish leaves only an
  * unreferenced (invisible) data dir, swept by [[vacuumOrphans]]; a
  * crash after it is a completed commit whose HEAD hint lags —
  * [[headVersion]]'s forward probe makes that benign. This is
  * deletePatients' tombstone discipline applied to whole-table
  * versioning, plus the multi-writer safety a lakehouse needs.
  *
  * Scale of the METADATA itself (the thousand-commit story): every
  * manifest is SELF-CONTAINED — the full dir list, not an action delta
  * — so any version resolves from ONE manifest read; there is no log
  * replay to checkpoint away (Delta needs periodic checkpoint files
  * precisely because its log is deltas; writing the checkpoint every
  * commit is affordable here because a manifest is a dir list, not a
  * file list — [[commitManaged]] bounds the dirs). HEAD is the
  * `_last_checkpoint`-style pointer: monotonic, self-healing (a probe
  * that advances rewrites it), re-verified by [[vacuum]] before it
  * truncates history — head resolution stays O(1) filesystem ops
  * amortized at any commit count. Appends carry a SCHEMA CONTRACT:
  * each manifest pins the committed StructType; an append merges
  * against it (same-name columns must keep their type — loud
  * rejection, never a silent fork) and readers scan with the pinned
  * schema, so old versions keep their own narrower shape with zero
  * footer-merge cost.
  */
object Snapshots {

  private def fs(s: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def headPath(root: String) = new Path(s"$root/HEAD")

  /** Current committed version; 0 = no snapshot yet. HEAD is a HINT
    * (see [[advanceHead]]): the manifest publish is the commit point,
    * so versions committed past a stale hint — a crash between publish
    * and advance, or a slower writer's older advance landing last —
    * are found by probing manifests FORWARD from it.
    */
  def headVersion(s: SparkSession, root: String): Int = {
    val f = fs(s, root)
    val hint = readHint(f, root)
    var v = hint
    while (f.exists(new Path(s"$root/manifests/v${v + 1}.json"))) v += 1
    // SELF-HEALING pointer (the `_last_checkpoint` discipline): a hint
    // left stale by a crash between publish and advance, or by an older
    // concurrent advance landing last, would tax EVERY future probe by
    // the gap — rewrite it to the probed head so resolution stays O(1)
    // amortized however many thousands of commits the table accretes.
    // Best-effort: a read-only caller without write permission still
    // resolves, just without repairing the hint.
    if (v > hint)
      try advanceHead(s, f, root, v) catch {
        // best-effort ONLY for expected repair failures: interruption
        // re-flags the thread (the read still resolves), and fatal
        // errors (OOM, linkage) propagate instead of being swallowed
        case _: InterruptedException => Thread.currentThread().interrupt()
        case scala.util.control.NonFatal(_) => ()
      }
    v
  }

  /** The persisted HEAD hint (0 when absent or unreadable). A hint of
    * 0 is always SAFE — the probe just walks from the start — so a
    * read that races a concurrent overwriting rename (on Hadoop's
    * checksummed local fs the data file and its .crc sidecar move in
    * two steps, so a mid-rename reader can see a checksum mismatch)
    * retries briefly and then degrades to the full probe instead of
    * failing the read path.
    */
  private def readHint(f: FileSystem, root: String): Int = {
    val hf = hintFs(f)
    var attempts = 0
    while (true) {
      try {
        if (!hf.exists(headPath(root))) return 0
        val in = hf.open(headPath(root))
        val txt =
          try scala.io.Source.fromInputStream(in).mkString.trim
          finally in.close()
        return if (txt.isEmpty) 0 else txt.toInt
      } catch {
        case _: java.io.IOException | _: NumberFormatException =>
          attempts += 1
          if (attempts >= 3) return 0
          Thread.sleep(5L * attempts)
      }
    }
    0 // unreachable
  }

  /** HEAD is the one MUTABLE file in the layout, so its IO must bypass
    * Hadoop's ChecksumFileSystem on local disks: an overwriting rename
    * there moves the data file and its .crc sidecar in TWO steps, and a
    * concurrent reader in the window sees new bytes verified against
    * the old checksum (a spurious ChecksumException under exactly the
    * write-heavy contention OCC is for). Immutable files (manifests,
    * data) never hit this — they are written once and linked, never
    * overwritten.
    */
  private def hintFs(f: FileSystem): FileSystem = f match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case other => other
  }

  /** Writer-unique suffix for data/sidecar dirs and tmp files — two
    * concurrent committers must never target the same physical paths.
    */
  private def token(): String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Append `df` as the next snapshot; returns the new version. The
    * data lands ONCE under a writer-unique dir; the manifest publish is
    * the commit point, CAS-retried on contention (the parent state is
    * re-read per attempt, so a losing writer rebases on the winner's).
    */
  def commit(s: SparkSession, root: String, df: DataFrame): Int = {
    // an append extends the PARENT MANIFEST (not "dirs 1..v" by
    // convention — a delete commit contributes no data dir, a replace
    // swapped the set) and carries its deletion vectors forward: new
    // files can't be referenced by any DV (sidecars name (file, row)
    // pairs), and rows already deleted must STAY deleted
    val dataDir = writeData(s, root, df, None)
    retryCommit(s, root) { v =>
      // the schema contract rebases per attempt too: the parent the
      // loser merges against is the RACE WINNER's committed schema. A
      // PRE-CONTRACT parent (manifest without a schema key) anchors on
      // the schema its data actually reads as — otherwise the first
      // post-upgrade append would pin the contract as its own schema,
      // silently narrowing away columns (and bypassing the type-fork
      // check) for every HEAD reader after it.
      val merged = schemaOf(s, root, v - 1)
        .orElse(inferredSchemaOf(s, root, v - 1))
        .fold(df.schema)(p => mergeSchemas(p, df.schema))
      (dirsOf(s, root, v - 1) :+ dataDir, dvDirsOf(s, root, v - 1),
        Some(merged))
    }
  }

  /** Commit `df` as the next snapshot whose manifest lists ONLY the new
    * data dir — the REPLACE form the manifest design anticipated: each
    * version is a full materialized state (st12's CDC merge), not an
    * append. Same write-once discipline, but the CAS is SINGLE-SHOT: a
    * replacement is computed FROM a specific base state, so losing the
    * race to any concurrent commit means the replacement is stale —
    * re-stamping it at the next version would silently drop the
    * winner's rows (the lost-update an append's rebase loop cannot
    * have, because an append re-reads the parent manifest per
    * attempt). The loser's never-referenced data dir is removed and
    * [[SnapshotConflictException]] raised; the caller re-derives from
    * the new head and retries ([[compact]] does exactly that).
    */
  def commitReplace(s: SparkSession, root: String, df: DataFrame): Int =
    replaceAt(s, root, headVersion(s, root), df, None)

  /** Publish `df` as version `base`+1 replacing all prior state, iff
    * the table is still at `base`. Package-private so specs can force
    * the conflict path deterministically.
    */
  private[graft] def replaceAt(s: SparkSession, root: String, base: Int,
      df: DataFrame, maxRecordsPerFile: Option[Long]): Int = {
    val dataDir = writeData(s, root, df, maxRecordsPerFile)
    if (tryPublishManifest(s, root, base + 1, Seq(dataDir), Seq.empty,
        Some(df.schema))) base + 1
    else {
      // this dir was never referenced by any manifest: safe to drop
      // eagerly instead of waiting out vacuumOrphans' age horizon
      fs(s, root).delete(new Path(dataDir), true)
      throw new SnapshotConflictException(
        s"replace commit at $root lost the race for v${base + 1}: a " +
          s"concurrent commit landed after this writer read v$base — " +
          "re-derive the replacement from the new head and retry")
    }
  }

  /** The one data write of any commit: ONCE, outside the CAS loop —
    * the dir name carries no version, so a lost append race re-stamps
    * only the manifest. A crashed attempt leaves an unreferenced,
    * invisible dir (vacuumOrphans' job), never a half-visible table.
    */
  private val DUP_MARKER = "graft-merge-dup: "

  /** Attach the MERGE family's duplicate-source-key refusal to the
    * source frame itself instead of running it as a separate eager
    * `groupBy().count()` job per merge (r14's "third job per merge"
    * finding — measurable at nightly-delta cadence). A key-partitioned
    * window count rides the data-dir WRITE: every source row must flow
    * through the write, so the raise_error guard is evaluated
    * row-by-row and cannot be skipped by a lazily-consumed join side
    * (a semi-join-side check WOULD be skippable — sort-merge join
    * consumes its right side only as far as the left reaches). The
    * window's key shuffle is the same |source|-sized shuffle the eager
    * job did, now folded into the write — one fewer job, and the
    * written files come out clustered by merge key as a side effect.
    * The raised error surfaces through [[rethrowDup]] as the same
    * IllegalArgumentException the eager check threw.
    */
  private def dupValidated(source: DataFrame, keyCols: Seq[String],
      op: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    source.withColumn("_graft_kn", count(lit(1)).over(w))
      .filter(coalesce(
        when(col("_graft_kn") > 1, raise_error(lit(
          s"$DUP_MARKER$op source carries duplicate keys on " +
            s"(${keyCols.mkString(", ")}) - latest-wins needs at most " +
            "one source row per key")).cast("boolean")),
        lit(true)))
      .drop("_graft_kn")
  }

  /** Unwrap a [[dupValidated]] refusal from Spark's task-failure
    * nesting back into the MERGE contract's IllegalArgumentException;
    * anything else rethrows untouched.
    */
  private def rethrowDup(t: Throwable): Nothing = {
    var c: Throwable = t
    while (c != null) {
      val m = c.getMessage
      if (m != null && m.contains(DUP_MARKER))
        throw new IllegalArgumentException(
          m.substring(m.indexOf(DUP_MARKER) + DUP_MARKER.length))
      c = c.getCause
    }
    throw t
  }

  private def writeData(s: SparkSession, root: String, df: DataFrame,
      maxRecordsPerFile: Option[Long]): String = {
    val dataDir = s"$root/data/w${token()}"
    val w = df.write.mode("overwrite")
    maxRecordsPerFile.fold(w)(n => w.option("maxRecordsPerFile", n))
      .parquet(dataDir)
    dataDir
  }

  /** The optimistic-concurrency loop shared by every commit form
    * (append / replace / [[deleteWhere]]'s data-free sidecar commit):
    * derive the next version from the CURRENT head, publish its
    * manifest exclusively; exactly one concurrent writer wins each
    * version number — a loser re-invokes `manifestFor`, which re-reads
    * the parent state (the rebase), and retries at the next version.
    */
  private def retryCommit(s: SparkSession, root: String)
      (manifestFor: Int => (Seq[String], Seq[String], Option[StructType]))
      : Int = {
    var attempts = 0
    while (true) {
      val v = headVersion(s, root) + 1
      val (dirs, dvs, schema) = manifestFor(v)
      if (tryPublishManifest(s, root, v, dirs, dvs, schema)) return v
      attempts += 1
      require(attempts < 64,
        s"commit contention at $root: lost $attempts CAS races")
    }
    -1 // unreachable
  }

  /** Publish manifest v iff nobody else has: full content goes to a
    * writer-unique tmp file first, then ONE atomic create-if-absent
    * link/rename makes it visible — a reader can never observe a
    * partial manifest, and exactly one of N racing writers returns
    * true. On success the HEAD hint advances (best-effort).
    */
  private def tryPublishManifest(s: SparkSession, root: String, v: Int,
      dirs: Seq[String], dvs: Seq[String],
      schema: Option[StructType]): Boolean = {
    val f = fs(s, root)
    def arr(ps: Seq[String]) = ps.map(p => "\"" + p + "\"").mkString(", ")
    // manifest = explicit dir list (not "1..v" by convention) so a
    // compaction/replace commit can swap file sets freely; "dvs" lists
    // deletion-vector sidecars (absent = none, so every pre-DV
    // manifest keeps parsing); "schema" pins the committed StructType
    // (base64 of its canonical JSON — keeps the manifest grammar flat;
    // absent on pre-contract manifests, which keep parsing)
    val schemaField =
      schema.fold("")(sc => s""", "schema": "${encodeSchema(sc)}"""")
    val manifest =
      s"""{"version": $v, "dirs": [${arr(dirs)}], "dvs": [${arr(dvs)}]$schemaField}"""
    val mTmp = new Path(s"$root/manifests/v$v.json.tmp-${token()}")
    val mFin = new Path(s"$root/manifests/v$v.json")
    writeFile(f, mTmp, manifest)
    val won = linkExclusive(f, mTmp, mFin)
    f.delete(mTmp, false)
    if (won) advanceHead(s, f, root, v)
    won
  }

  /** Atomic create-if-absent publish — the CAS primitive. Local fs: a
    * hard link (link(2) is O_EXCL-atomic; POSIX rename(2) silently
    * OVERWRITES, so it cannot arbitrate a race). HDFS-semantics
    * stores: FileSystem.rename, which fails when the destination
    * exists. Object stores without either need an external lock/log
    * service (documented, out of scope — same caveat as Delta's
    * S3 LogStore).
    */
  private def linkExclusive(f: FileSystem, src: Path, dst: Path): Boolean =
    if (f.getScheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(src.toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else !f.exists(dst) && f.rename(src, dst)

  /** Advance the HEAD hint to v via an OVERWRITING rename — never
    * delete-then-rename, which would open a no-HEAD window where a
    * concurrent headVersion() pays a full forward probe from 0. HEAD
    * is a hint, not the commit point: a crash before this line is a
    * COMPLETED commit (the manifest is published) whose hint lags, and
    * headVersion's probe finds it.
    */
  private def advanceHead(s: SparkSession, f: FileSystem, root: String,
      v: Int): Unit =
    // MONOTONIC: re-read before writing so a slower writer's older
    // advance (the documented stale-hint source) is usually dropped
    // here instead of landing last. The check-then-rename window
    // remains (HEAD is a hint, not the commit point) — headVersion's
    // self-heal and vacuum's pre-truncation re-verification close the
    // only path where a stale hint could strand readers.
    if (readHint(f, root) < v) {
      val hf = hintFs(f)
      val hTmp = new Path(s"$root/HEAD.tmp-${token()}")
      writeFile(hf, hTmp, v.toString)
      renameOver(s, hf, hTmp, headPath(root))
      // a pre-raw-IO root may carry a stale .HEAD.crc sidecar that
      // would fail any checksummed reader — retire it
      val crc = new Path(s"$root/.HEAD.crc")
      if (hf.exists(crc)) hf.delete(crc, false)
    }

  /** Atomic overwriting rename. FileContext carries the OVERWRITE
    * rename option the FileSystem API lacks; fall back to
    * delete+rename only on stores without a FileContext binding (the
    * degraded path keeps working, minus the no-HEAD-window guarantee).
    */
  private def renameOver(s: SparkSession, f: FileSystem, src: Path,
      dst: Path): Unit =
    if (f.getUri.getScheme == "file")
      // POSIX rename(2): one atomic syscall, no sidecar second step —
      // FileContext's local binding is ChecksumFs, whose OVERWRITE
      // rename moves data then crc (two steps a concurrent reader can
      // land between)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(src.toUri.getPath),
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    else try {
      org.apache.hadoop.fs.FileContext
        .getFileContext(dst.toUri, s.sparkContext.hadoopConfiguration)
        .rename(src, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException =>
        f.delete(dst, false)
        require(f.rename(src, dst), s"rename $src -> $dst failed")
    }

  private def writeFile(f: FileSystem, p: Path, content: String): Unit = {
    val out = f.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Read a pinned snapshot (or HEAD when `version` is None). The
    * returned frame's scan lists exactly the manifest's directories —
    * immutable files, so the frame is stable however long the reader
    * holds it and whatever commits land meanwhile.
    */
  def read(s: SparkSession, root: String, version: Option[Int] = None)
      : DataFrame = {
    val v = version.getOrElse(headVersion(s, root))
    require(v > 0, s"no snapshot at $root")
    // the manifest's committed schema IS the read schema: a pinned
    // reader sees exactly what its version committed (dirs written
    // before a later column existed surface it as null), and the scan
    // never pays a mergeSchema footer sweep — at 100 TB schema comes
    // from one manifest read, not a million file footers. Pre-contract
    // manifests (no schema field) fall back to footer inference.
    val dirs = dirsOf(s, root, v)
    def scan(): DataFrame = schemaOf(s, root, v)
      .fold(s.read)(sc => s.read.schema(sc)).parquet(dirs: _*)
    val base = scan()
    val dvs = dvDirsOf(s, root, v)
    if (dvs.isEmpty) base
    else {
      // merge-on-read: anti-join the (file, row-position) sidecar rows
      // out of the scan. Positions come from the parquet reader itself
      // (_metadata.row_index — no stored row ids, no table rewrite);
      // the scan side stays a plain pruned/pushed-down parquet scan.
      val cols = base.columns.map(col)
      minusDvs(s,
        scan()
          .select(cols :+ col("_metadata.file_path").as("_graft_fp")
            :+ col("_metadata.row_index").as("_graft_ri"): _*),
        dvs, "_graft_fp", "_graft_ri")
        .drop("_graft_fp", "_graft_ri")
    }
  }

  /** THE deletion-vector application rule — anti-join the sidecars'
    * (file, row-position) pairs out of a scan carrying its positions in
    * columns `fp`/`ri`. The sidecar holds ONLY deleted positions, so it
    * broadcasts. One definition shared by [[read]] and [[deleteWhere]]'s
    * candidate scan, so the merge-on-read semantics (distinct pairs,
    * both-column equality, anti-join) cannot fork between them.
    */
  private def minusDvs(s: SparkSession, scan: DataFrame, dvs: Seq[String],
      fp: String, ri: String): DataFrame =
    if (dvs.isEmpty) scan
    else {
      val dv = broadcast(s.read.parquet(dvs: _*)
        .select(col("file_path").as("_dv_fp"), col("row_index").as("_dv_ri"))
        .distinct())
      scan.join(dv, col(fp) === col("_dv_fp") && col(ri) === col("_dv_ri"),
        "left_anti")
    }

  /** Deletion-vector DELETE — the lakehouse merge-on-read delete: rows
    * matching `cond` at HEAD are recorded as (file, row-position) pairs
    * in a sidecar, and the commit is a new manifest referencing the SAME
    * immutable data files plus the sidecar. No data file is rewritten —
    * a delete of 100 rows in a 100 TB table costs one small parquet
    * write — and pinned readers of older versions are untouched. The
    * candidate scan runs over [[read]] (which already applies earlier
    * sidecars), so re-deleting a dead row never double-records it.
    * Physical purge stays [[compact]]'s job: it reads the DV-applied
    * state and commits a REPLACE with no sidecars, materializing every
    * outstanding delete (the erasure story: deleteWhere = instant
    * logical removal, compact = the physical rewrite src11 does eagerly,
    * on the operator's schedule).
    */
  def deleteWhere(s: SparkSession, root: String,
      cond: org.apache.spark.sql.Column): Int = {
    val f = fs(s, root)
    var attempts = 0
    while (true) {
      val head = headVersion(s, root)
      require(head > 0, s"no snapshot at $root")
      val dvs = dvDirsOf(s, root, head)
      val dvDir = s"$root/dv/w${token()}"
      // the candidate scan carries its own positions (_metadata is a
      // scan column, not a join output), with earlier sidecars
      // anti-joined out (minusDvs — read()'s one rule) so an
      // already-deleted row never double-records
      val scan = s.read.parquet(dirsOf(s, root, head): _*)
        .select(col("_metadata.file_path").as("file_path"),
          col("_metadata.row_index").as("row_index"), col("*"))
      minusDvs(s, scan, dvs, "file_path", "row_index")
        .filter(cond).select("file_path", "row_index")
        .write.mode("overwrite").parquet(dvDir)
      // a delete changes no columns: the parent's committed schema
      // carries forward verbatim
      if (tryPublishManifest(s, root, head + 1,
          dirsOf(s, root, head), dvs :+ dvDir,
          schemaOf(s, root, head))) return head + 1
      // lost the CAS race: this sidecar was computed against a
      // superseded head — discard it and recompute against the new
      // state (a concurrent replace/compact can remap (file, row)
      // positions; a concurrent delete changes what is already dead)
      f.delete(new Path(dvDir), true)
      attempts += 1
      require(attempts < 64,
        s"deleteWhere contention at $root: lost $attempts CAS races")
    }
    -1 // unreachable
  }

  /** MERGE INTO — latest-wins upsert as ONE atomic commit: table rows
    * whose merge key appears in `source` are deleted via a
    * deletion-vector sidecar (merge-on-read: no data file rewrites),
    * and the whole `source` appends as a new data dir — BOTH listed by
    * the same manifest publish, so a reader sees the pre-merge or the
    * fully-merged state, never an intermediate. That single commit
    * point is what a deleteWhere-then-commit pair cannot give: a crash
    * between the two leaves matched rows deleted with their
    * replacements never landed, and a concurrent reader in the window
    * sees the table with the matched rows simply GONE. Matched →
    * replace, not-matched → insert (the Delta/Iceberg MERGE in its
    * latest-wins form — [[RoundTrip.src08]] is the read-time view of
    * the same rule, [[commitReplace]] the full-rewrite form). The
    * source must carry at most one row per key (both would survive the
    * merge — refused loudly, src08's documented contract). The CAS
    * retry recomputes the sidecar against the new head (a concurrent
    * compaction remaps (file, row) positions); the data dir is written
    * ONCE, outside the loop. At 100 TB: cost = one key-column scan of
    * the table (pruned to the merge keys + _metadata) + |source|
    * written — never a table rewrite; Catalyst broadcasts the source
    * key set when it's small (the nightly-delta case).
    */
  def mergeInto(s: SparkSession, root: String, source: DataFrame,
      keyCols: Seq[String]): Int = {
    require(keyCols.nonEmpty, "mergeInto needs at least one key column")
    // duplicate source keys would BOTH survive the merge — refused
    // loudly, but the check rides the data-dir write (dupValidated)
    // instead of costing its own job
    val dataDir =
      try writeData(s, root, dupValidated(source, keyCols, "mergeInto"), None)
      catch { case t: Throwable => rethrowDup(t) }
    val f = fs(s, root)
    var attempts = 0
    while (true) {
      val head = headVersion(s, root)
      require(head > 0, s"no snapshot at $root — bootstrap with commit()")
      val dvs = dvDirsOf(s, root, head)
      val dvDir = s"$root/dv/w${token()}"
      // matched rows = semi-join of the live table (earlier sidecars
      // anti-joined out, so an already-deleted row never double-
      // records) against the source keys, pruned to keys + positions
      val keys = source.select(keyCols.map(col): _*).distinct()
      val scan = s.read.parquet(dirsOf(s, root, head): _*)
        .select(col("_metadata.file_path").as("file_path")
          +: col("_metadata.row_index").as("row_index")
          +: keyCols.map(col): _*)
      minusDvs(s, scan, dvs, "file_path", "row_index")
        .join(keys, keyCols, "left_semi")
        .select("file_path", "row_index")
        .write.mode("overwrite").parquet(dvDir)
      // same contract rule as commit(): merge against the parent's
      // committed (or, pre-contract, inferred) schema
      val merged = schemaOf(s, root, head)
        .orElse(inferredSchemaOf(s, root, head))
        .fold(source.schema)(p => mergeSchemas(p, source.schema))
      if (tryPublishManifest(s, root, head + 1,
          dirsOf(s, root, head) :+ dataDir, dvs :+ dvDir, Some(merged)))
        return head + 1
      f.delete(new Path(dvDir), true)
      attempts += 1
      require(attempts < 64,
        s"mergeInto contention at $root: lost $attempts CAS races")
    }
    -1 // unreachable
  }

  /** Versioned MERGE — [[mergeInto]] for OUT-OF-ORDER feeds: a matched
    * target row is replaced only when the source row wins by
    * `versionCol` (ties go to the source: an equal-version replay
    * re-applies idempotently — convergent, and a genuinely conflicting
    * equal-version pair is the feed's own ambiguity, resolved
    * deterministically); a source row that LOSES to the live row is
    * dropped entirely, so a late replay of older history cannot
    * clobber newer state — the resurrection bug st15 documents, closed
    * at the table layer instead of by the in-order-feed contract plain
    * mergeInto (and st17) rely on. The table must be key-unique (any
    * table maintained by merges from a key-unique base is). Unlike
    * mergeInto, the winning-rows data dir depends on the head it was
    * computed against, so it is (re)written inside the CAS loop and a
    * loser's dir is deleted with its sidecar — still |source|-sized
    * work per attempt, never a table rewrite.
    */
  def mergeIntoVersioned(s: SparkSession, root: String, source: DataFrame,
      keyCols: Seq[String], versionCol: String): Int = {
    require(keyCols.nonEmpty, "mergeIntoVersioned needs a key column")
    require(!keyCols.contains(versionCol),
      s"'$versionCol' cannot be both merge key and version")
    val f = fs(s, root)
    var attempts = 0
    while (true) {
      val head = headVersion(s, root)
      require(head > 0, s"no snapshot at $root — bootstrap with commit()")
      val dvs = dvDirsOf(s, root, head)
      val scan = s.read.parquet(dirsOf(s, root, head): _*)
        .select(col("_metadata.file_path").as("file_path")
          +: col("_metadata.row_index").as("row_index")
          +: col(versionCol).as("_tgt_v")
          +: keyCols.map(col): _*)
      val live = minusDvs(s, scan, dvs, "file_path", "row_index")
      val matched = live.join(
        source.select(keyCols.map(col) :+ col(versionCol).as("_src_v"): _*),
        keyCols)
      val losers = matched.filter(col("_src_v") < col("_tgt_v"))
        .select(keyCols.map(col): _*)
      // winning rows FIRST: the dup refusal rides this write
      // (dupValidated — duplicate source keys must be refused before
      // any sidecar lands; reduce to the max-version row per key
      // upstream), and every source row is checked because the
      // anti-join consumes its full probe side
      val dataDir =
        try writeData(s, root,
          dupValidated(source, keyCols, "mergeIntoVersioned")
            .join(losers, keyCols, "left_anti"), None)
        catch { case t: Throwable => rethrowDup(t) }
      val dvDir = s"$root/dv/w${token()}"
      try matched.filter(col("_src_v") >= col("_tgt_v"))
        .select("file_path", "row_index")
        .write.mode("overwrite").parquet(dvDir)
      catch { case t: Throwable =>
        f.delete(new Path(dataDir), true); throw t }
      val merged = schemaOf(s, root, head)
        .orElse(inferredSchemaOf(s, root, head))
        .fold(source.schema)(p => mergeSchemas(p, source.schema))
      if (tryPublishManifest(s, root, head + 1,
          dirsOf(s, root, head) :+ dataDir, dvs :+ dvDir, Some(merged)))
        return head + 1
      f.delete(new Path(dvDir), true)
      f.delete(new Path(dataDir), true)
      attempts += 1
      require(attempts < 64,
        s"mergeIntoVersioned contention at $root: lost $attempts CAS races")
    }
    -1 // unreachable
  }

  /** Oldest version whose manifest is still resolvable — the retention
    * floor [[vacuum]] leaves behind (head+1 when nothing is committed).
    * Incremental consumers anchor on this: a delta for v needs BOTH
    * v-1 and v resolvable, so the oldest drainable version is floor+1
    * (or 1 while the floor is still 1 — v0 is the synthetic empty
    * bootstrap manifest).
    */
  private[graft] def oldestVersion(s: SparkSession, root: String): Int = {
    val f = fs(s, root)
    val head = headVersion(s, root)
    (1 to head).find(v => f.exists(new Path(s"$root/manifests/v$v.json")))
      .getOrElse(head + 1)
  }

  /** The data dirs a version's manifest lists (v0 = the empty table —
    * the bootstrap anchor for [[changesBetween]]).
    */
  private[graft] def dirsOf(s: SparkSession, root: String, v: Int)
      : Seq[String] = arrayOf(manifestOf(s, root, v), "dirs")

  /** The deletion-vector sidecar dirs a version's manifest lists
    * (absent key = none — pre-DV manifests parse unchanged).
    */
  private[graft] def dvDirsOf(s: SparkSession, root: String, v: Int)
      : Seq[String] =
    if (v == 0) Seq.empty else arrayOf(manifestOf(s, root, v), "dvs")

  private def manifestOf(s: SparkSession, root: String, v: Int): String = {
    if (v == 0) return """{"dirs": []}"""
    val f = fs(s, root)
    val mp = new Path(s"$root/manifests/v$v.json")
    // loud, actionable failure — never a partial scan: a reader pinned
    // below the vacuum retention floor must learn WHY its version is
    // gone (RoundTripSpec pins this negative path)
    require(f.exists(mp), s"snapshot v$v at $root does not exist: " +
      "vacuumed below the retention floor, or never committed")
    val in = f.open(mp)
    try scala.io.Source.fromInputStream(in).mkString finally in.close()
  }

  /** Schema anchor for a PRE-CONTRACT parent (manifest without a
    * schema key): inferred ONCE from the version's committed data via
    * [[read]] (footer inference — pre-contract tables are small legacy
    * tables by definition; every contract-era commit pays one manifest
    * read instead). v0 and dir-less parents have no data to anchor.
    */
  private def inferredSchemaOf(s: SparkSession, root: String, v: Int)
      : Option[StructType] =
    if (v == 0 || dirsOf(s, root, v).isEmpty) None
    else Some(read(s, root, Some(v)).schema)

  /** The schema a version's manifest committed (None on v0 and on
    * pre-contract manifests).
    */
  private[graft] def schemaOf(s: SparkSession, root: String, v: Int)
      : Option[StructType] =
    if (v == 0) None
    else stringOf(manifestOf(s, root, v), "schema").map(b64 =>
      org.apache.spark.sql.types.DataType.fromJson(
        new String(java.util.Base64.getDecoder.decode(b64), "UTF-8"))
        .asInstanceOf[StructType])

  private def encodeSchema(sc: StructType): String =
    java.util.Base64.getEncoder.encodeToString(sc.json.getBytes("UTF-8"))

  /** THE append compatibility rule: columns shared with the committed
    * schema must keep their exact type (a silent type fork would make
    * the same column read differently per file — rejected loudly; a
    * deliberate type change is a rewrite, i.e. [[commitReplace]]);
    * columns new to the table append. The merged schema becomes the
    * new committed contract, so an old pinned reader keeps its own
    * version's narrower schema while HEAD readers see the union.
    */
  private[graft] def mergeSchemas(parent: StructType, next: StructType)
      : StructType = {
    parent.foreach { pf =>
      next.find(_.name == pf.name).foreach { nf =>
        require(nf.dataType == pf.dataType,
          s"incompatible append: column '${pf.name}' is committed as " +
            s"${pf.dataType.simpleString} but the append carries " +
            s"${nf.dataType.simpleString} — a type change is a rewrite " +
            "(commitReplace), not an append")
      }
    }
    val known = parent.fieldNames.toSet
    StructType(parent.fields ++ next.fields.filterNot(f => known(f.name)))
  }

  /** The quoted string value of a flat manifest key (None when the
    * key is absent — optional fields stay backward compatible).
    */
  private def stringOf(manifest: String, key: String): Option[String] =
    ("\"" + key + "\"\\s*:\\s*\"([^\"]*)\"").r
      .findFirstMatchIn(manifest).map(_.group(1))

  /** The quoted strings of the named JSON array (the manifest grammar
    * is ours and flat, so a keyed scan is exact).
    */
  private def arrayOf(manifest: String, key: String): Seq[String] = {
    val k = manifest.indexOf("\"" + key + "\"")
    if (k < 0) return Seq.empty
    val start = manifest.indexOf('[', k)
    val end = manifest.indexOf(']', start)
    "\"([^\"]+)\"".r.findAllMatchIn(manifest.substring(start, end + 1))
      .map(_.group(1)).toSeq
  }

  /** Incremental read — the change feed between two committed versions,
    * resolved from MANIFESTS alone: committed data files are immutable
    * and an append commit's manifest is a superset of its parent's, so
    * the rows added in (va, vb] are EXACTLY the files vb lists and va
    * doesn't. The consumer scans only the delta — no old data is read,
    * no row diffing runs; at 100 TB a nightly incremental consumer
    * (p03's shape) costs the night's bytes, never the table's. va = 0
    * bootstraps (everything up to vb). Non-append ranges (a
    * replace/compaction commit swaps the file set; its logical change
    * is the writer's merge semantics, not a file-set difference —
    * st12's CDC face) are refused loudly rather than mis-answered.
    */
  def changesBetween(s: SparkSession, root: String, va: Int, vb: Int)
      : DataFrame = {
    require(0 <= va && va <= vb && vb <= headVersion(s, root),
      s"bad change range v$va..v$vb at $root")
    val base = dirsOf(s, root, va).toSet
    val target = dirsOf(s, root, vb)
    require(base.subsetOf(target.toSet),
      s"v$va..v$vb is not append-lineage (a replace commit intervened); " +
        "read the versions and diff by the writer's merge key instead")
    require(dvDirsOf(s, root, va) == dvDirsOf(s, root, vb),
      s"v$va..v$vb crosses a delete commit (new deletion vectors): the " +
        "logical change includes row REMOVALS a file-add feed can't " +
        "express — read the versions and diff by the writer's key instead")
    val added = target.filterNot(base)
    if (added.isEmpty) s.emptyDataFrame
    else s.read.parquet(added: _*)
  }

  /** All committed versions, ascending. */
  def versions(s: SparkSession, root: String): Seq[Int] =
    (1 to headVersion(s, root))

  /** OPTIMIZE — compaction AS a snapshot commit (src05's small-file
    * rewrite composed into the table contract): rewrite HEAD's state —
    * possibly many append dirs of micro-batch-sized files — as ONE
    * clustered data dir and commit it as the next version via
    * [[commitReplace]]'s manifest form. Isolation falls out of the
    * machinery: committed data files are immutable and older manifests
    * keep listing them, so a reader pinned to any version scans
    * byte-identical files while (and after) the compaction lands; the
    * only visible change is HEAD advancing to an equivalent, better-
    * laid-out state. A crash mid-compaction leaves HEAD untouched —
    * the half-written writer-unique dir is an invisible orphan
    * [[vacuumOrphans]] sweeps. Reads the DV-APPLIED state and commits with no
    * sidecars, so compaction also materializes every outstanding
    * [[deleteWhere]] — the physical-purge half of the erasure story.
    * Returns the new version.
    */
  def compact(s: SparkSession, root: String, clusterBy: Seq[String],
      maxRecordsPerFile: Long = 1000000): Int = {
    var attempts = 0
    while (true) {
      // read PINNED at the base the CAS will assert, so the rewrite is
      // byte-equivalent to exactly that version; losing the race means
      // a concurrent commit changed the state this rewrite no longer
      // carries — recompute FROM THE NEW HEAD and retry (deleteWhere's
      // discipline; never re-stamp the stale file set, which would
      // drop the interloper's rows)
      val base = headVersion(s, root)
      val cur = read(s, root, Some(base))
      val clustered =
        if (clusterBy.isEmpty) cur.coalesce(s.sparkContext.defaultParallelism)
        else cur.repartition(clusterBy.map(col): _*)
      try return replaceAt(s, root, base, clustered, Some(maxRecordsPerFile))
      catch {
        case e: SnapshotConflictException =>
          attempts += 1
          if (attempts >= 16) throw new SnapshotConflictException(
            s"compaction at $root lost $attempts CAS races: ${e.getMessage}")
      }
    }
    -1 // unreachable
  }

  /** Append with BOUNDED table metadata — the maintenance policy a
    * thousand-commit table needs folded into one call: commit the
    * append, then, when the manifest's dir list has grown past
    * `maxDirs`, fold the history into one clustered dir via [[compact]].
    * Keeps read planning O(maxDirs) and the manifest O(maxDirs) bytes
    * forever (RoundTripSpec drives ~200 commits and asserts both),
    * while HEAD's self-healing hint keeps version resolution O(1) —
    * together the flat-cost visibility story PostgreSQL MVCC gives the
    * reference for free. The compaction is maintenance, not the commit:
    * if it loses every CAS race to concurrent writers, the append —
    * already durable — stands, and a later managed commit re-triggers
    * the fold.
    */
  def commitManaged(s: SparkSession, root: String, df: DataFrame,
      maxDirs: Int = 16): Int = {
    val v = commit(s, root, df)
    if (dirsOf(s, root, v).size <= maxDirs) v
    else try compact(s, root, Seq.empty)
    catch { case _: SnapshotConflictException => v }
  }

  /** VACUUM — truncate history below `keepFrom`: delete every data dir
    * and deletion-vector sidecar referenced ONLY by manifests older
    * than `keepFrom`, then the old manifests themselves. This is the
    * third stage of the erasure lifecycle — [[deleteWhere]] removes a
    * row logically (instant), [[compact]] materializes a state without
    * it (the physical rewrite), and vacuum destroys the historical
    * bytes that still contained it (time travel below `keepFrom` is
    * deliberately forfeited: that is what a retention policy IS).
    * Kept versions are untouched — their manifests list their own
    * dirs, and any dir shared with a dropped version survives the
    * reference check. Returns the number of directories deleted.
    */
  def vacuum(s: SparkSession, root: String, keepFrom: Int): Int = {
    val head = headVersion(s, root)
    require(1 <= keepFrom && keepFrom <= head,
      s"keepFrom $keepFrom outside committed range 1..$head at $root")
    val f = fs(s, root)
    // headVersion's probe walks CONSECUTIVE manifests forward from the
    // hint; truncating manifests below keepFrom while the hint lags
    // below keepFrom-1 would leave the probe stranded at a vacuumed
    // version (every later read/commit resolving a dead head). So:
    // repair the hint to the probed head FIRST (headVersion above
    // already self-heals; this re-assert closes the crashed-advance
    // case), then re-read and REFUSE to truncate past what the
    // persisted hint can anchor — an older concurrent advance landing
    // in the window aborts the vacuum, never strands the table.
    advanceHead(s, f, root, head)
    val hint = readHint(f, root)
    require(hint >= keepFrom - 1,
      s"vacuum aborted at $root: persisted HEAD hint $hint cannot anchor " +
        s"the manifest probe once v<$keepFrom are truncated — rerun " +
        "(a concurrent stale HEAD advance landed mid-vacuum)")
    val kept = (keepFrom to head).flatMap(v =>
      dirsOf(s, root, v) ++ dvDirsOf(s, root, v)).toSet
    // RE-RUNNABLE (a retention policy runs daily): versions a prior
    // vacuum already truncated have no manifest left — they contribute
    // no dirs and are skipped instead of crashing manifestOf
    val extant = (1 until keepFrom).filter(v =>
      f.exists(new Path(s"$root/manifests/v$v.json")))
    val dropped = extant.flatMap(v =>
      dirsOf(s, root, v) ++ dvDirsOf(s, root, v)).distinct
      .filterNot(kept)
    dropped.foreach(dir => f.delete(new Path(dir), true))
    extant.foreach { v =>
      f.delete(new Path(s"$root/manifests/v$v.json"), false)
    }
    dropped.size
  }

  /** Sweep data/sidecar dirs REFERENCED BY NO extant manifest — the
    * debris of crashed or CAS-losing commit attempts (data is written
    * before the manifest publish; a loser's dir is simply never
    * referenced). Age-gated: a dir younger than `olderThanMs` may
    * belong to a commit IN FLIGHT (written, publish pending), so only
    * dirs past the horizon are dropped — the standard lakehouse
    * orphan-retention rule (pick a horizon well past the longest
    * plausible commit). Returns deleted-dir count.
    */
  def vacuumOrphans(s: SparkSession, root: String,
      olderThanMs: Long = 24L * 3600 * 1000): Int = {
    val f = fs(s, root)
    val head = headVersion(s, root)
    val referenced = (1 to head)
      .filter(v => f.exists(new Path(s"$root/manifests/v$v.json")))
      .flatMap(v => dirsOf(s, root, v) ++ dvDirsOf(s, root, v)).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    Seq("data", "dv").map { sub =>
      val base = new Path(s"$root/$sub")
      if (!f.exists(base)) 0
      else f.listStatus(base).toSeq
        .filter(st => st.isDirectory &&
          !referenced.contains(s"$root/$sub/${st.getPath.getName}") &&
          st.getModificationTime < cutoff)
        .count { st => f.delete(st.getPath, true); true }
    }.sum
  }

  /** Parquet file count under a version's data dirs (the compaction
    * metric RoundTripSpec asserts on).
    */
  def fileCount(s: SparkSession, root: String, version: Int): Int = {
    val f = fs(s, root)
    dirsOf(s, root, version).map(dir => f.listStatus(new Path(dir))
      .count(_.getPath.getName.endsWith(".parquet"))).sum
  }

  // -- src15: the gate face ----------------------------------------------
  // Two deterministic event-slice commits (first half of January, then
  // the rest), then BOTH snapshots read back through the manifest
  // machinery — per-version row and patient counts. The oracle
  // recomputes the same splits from the raw table, so the snapshot
  // path's fidelity (no lost/duplicated/extra rows in either version)
  // is hash-checked, not just spec'd. Build-once per sf dir; version
  // count is checked so a half-built root from a killed run rebuilds.
  private val SPLIT_DAY = "2024-01-16"

  def src15(s: SparkSession, d: String): DataFrame = {
    val root = s"${graft.Scratch.dir}/src15_snap/${graft.Scratch.tag(d)}"
    if (headVersion(s, root) != 2) {
      fs(s, root).delete(new Path(root), true)
      val ev = events(s, d)
      commit(s, root, ev.filter(col("ts") < lit(SPLIT_DAY).cast("timestamp")))
      commit(s, root, ev.filter(col("ts") >= lit(SPLIT_DAY).cast("timestamp")))
    }
    versions(s, root).map { v =>
      read(s, root, Some(v))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"))
        .select(lit(v).cast("int").as("version"), col("n_rows"),
          col("n_users"))
    }.reduce(_ unionByName _)
      .transform(Gate.ordered("version"))
  }

  val oracle: String =
    s"""SELECT 1 AS version, COUNT(*) AS n_rows,
       | COUNT(DISTINCT user_id) AS n_users
       |FROM events WHERE ts < TIMESTAMP '$SPLIT_DAY'
       |UNION ALL
       |SELECT 2, COUNT(*), COUNT(DISTINCT user_id) FROM events
       |ORDER BY version""".stripMargin

  // -- src17: compaction as a snapshot commit (the OPTIMIZE face) --------
  // Two fragmented append commits (40 writers each — the micro-batch
  // layout src05 simulates), then compact() rewrites the union as
  // version 3. The output reads versions 2 (pre-compaction HEAD) and 3
  // (compacted) through the manifest machinery: both must aggregate to
  // the full table — the compaction changed LAYOUT, not one row. The
  // oracle hash-checks both versions against the raw table;
  // RoundTripSpec covers the pinned-reader isolation, the file-count
  // collapse, and crash healing.
  def src17(s: SparkSession, d: String): DataFrame = {
    val root = s"${graft.Scratch.dir}/src17_snap/${graft.Scratch.tag(d)}"
    if (headVersion(s, root) != 3) {
      fs(s, root).delete(new Path(root), true)
      val ev = events(s, d)
      commit(s, root,
        ev.filter(col("ts") < lit(SPLIT_DAY).cast("timestamp")).repartition(40))
      commit(s, root,
        ev.filter(col("ts") >= lit(SPLIT_DAY).cast("timestamp")).repartition(40))
      compact(s, root, Seq("user_id"))
    }
    Seq(2, 3).map { v =>
      read(s, root, Some(v))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"))
        .select(lit(v).cast("int").as("version"), col("n_rows"),
          col("n_users"))
    }.reduce(_ unionByName _)
      .transform(Gate.ordered("version"))
  }

  val compactionOracle: String =
    """SELECT 2 AS version, COUNT(*) AS n_rows,
      | COUNT(DISTINCT user_id) AS n_users FROM events
      |UNION ALL
      |SELECT 3, COUNT(*), COUNT(DISTINCT user_id) FROM events
      |ORDER BY version""".stripMargin

  // -- src19: the change feed (incremental read between versions) --------
  // Three deterministic ten-day append commits, then every consumer
  // range a nightly pipeline would ask for — each consecutive delta
  // (v0→v1, v1→v2, v2→v3) plus a catch-up range (v1→v3) — read through
  // changesBetween's manifest diff. The oracle recomputes each range's
  // rows from the raw table by the same day slices, so the manifest
  // path must lose/duplicate nothing in ANY range; RoundTripSpec covers
  // the scan-only-the-delta plan claim, the empty va=vb feed, and the
  // replace-commit refusal.
  private val SRC19_CUTS = Seq("2024-01-11", "2024-01-21")

  def src19(s: SparkSession, d: String): DataFrame = {
    val root = s"${graft.Scratch.dir}/src19_snap/${graft.Scratch.tag(d)}"
    if (headVersion(s, root) != 3) {
      fs(s, root).delete(new Path(root), true)
      val ev = events(s, d)
      val Seq(c1, c2) = SRC19_CUTS.map(lit(_).cast("timestamp"))
      commit(s, root, ev.filter(col("ts") < c1))
      commit(s, root, ev.filter(col("ts") >= c1 && col("ts") < c2))
      commit(s, root, ev.filter(col("ts") >= c2))
    }
    Seq((0, 1), (1, 2), (2, 3), (1, 3)).map { case (va, vb) =>
      changesBetween(s, root, va, vb)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"))
        .select(lit(va).cast("int").as("from_v"),
          lit(vb).cast("int").as("to_v"), col("n_rows"), col("n_users"))
    }.reduce(_ unionByName _)
      .transform(Gate.ordered("from_v", "to_v"))
  }

  val changeFeedOracle: String = {
    val Seq(c1, c2) = SRC19_CUTS
    s"""SELECT 0 AS from_v, 1 AS to_v, COUNT(*) AS n_rows,
       | COUNT(DISTINCT user_id) AS n_users
       |FROM events WHERE ts < TIMESTAMP '$c1'
       |UNION ALL
       |SELECT 1, 2, COUNT(*), COUNT(DISTINCT user_id) FROM events
       | WHERE ts >= TIMESTAMP '$c1' AND ts < TIMESTAMP '$c2'
       |UNION ALL
       |SELECT 2, 3, COUNT(*), COUNT(DISTINCT user_id) FROM events
       | WHERE ts >= TIMESTAMP '$c2'
       |UNION ALL
       |SELECT 1, 3, COUNT(*), COUNT(DISTINCT user_id) FROM events
       | WHERE ts >= TIMESTAMP '$c1'
       |ORDER BY from_v, to_v""".stripMargin
  }

  // -- src20: deletion-vector deletes (merge-on-read) ---------------------
  // Two append commits, then two deleteWhere batches — a patient-id
  // erasure and a selective event purge — each a data-free sidecar
  // commit. The output reads the pre-delete version (pinned history
  // must still show every row) and both post-delete versions through
  // the DV-applying read path; the oracle recomputes all three states
  // from the raw table with the same predicates, so the sidecar
  // anti-join must remove EXACTLY the matching rows — no more (a DV
  // naming a live row), no fewer (a missed file/position). RoundTripSpec
  // covers the no-data-files-written claim, compaction materializing
  // the sidecars away, and the change-feed refusal across a delete.
  private val SRC20_MOD7 = 3L // delete batch 1: user_id % 7 = 3
  private val SRC20_MOD5 = 0L // delete batch 2: errors of user_id % 5 = 0

  private[graft] def buildSrc20(s: SparkSession, d: String): String = {
    val root = s"${graft.Scratch.dir}/src20_snap/${graft.Scratch.tag(d)}"
    if (headVersion(s, root) != 4) {
      fs(s, root).delete(new Path(root), true)
      val ev = events(s, d)
      commit(s, root, ev.filter(col("ts") < lit(SPLIT_DAY).cast("timestamp")))
      commit(s, root, ev.filter(col("ts") >= lit(SPLIT_DAY).cast("timestamp")))
      deleteWhere(s, root, col("user_id") % 7 === SRC20_MOD7)
      deleteWhere(s, root,
        col("event_type") === "error" && col("user_id") % 5 === SRC20_MOD5)
    }
    root
  }

  def src20(s: SparkSession, d: String): DataFrame = {
    val root = buildSrc20(s, d)
    Seq(2, 3, 4).map { v =>
      read(s, root, Some(v))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"))
        .select(lit(v).cast("int").as("version"), col("n_rows"),
          col("n_users"))
    }.reduce(_ unionByName _)
      .transform(Gate.ordered("version"))
  }

  val deletionVectorOracle: String =
    s"""SELECT 2 AS version, COUNT(*) AS n_rows,
       | COUNT(DISTINCT user_id) AS n_users FROM events
       |UNION ALL
       |SELECT 3, COUNT(*), COUNT(DISTINCT user_id) FROM events
       | WHERE NOT (user_id % 7 = $SRC20_MOD7)
       |UNION ALL
       |SELECT 4, COUNT(*), COUNT(DISTINCT user_id) FROM events
       | WHERE NOT (user_id % 7 = $SRC20_MOD7)
       |  AND NOT (event_type = 'error' AND user_id % 5 = $SRC20_MOD5)
       |ORDER BY version""".stripMargin

  // -- src21: MERGE INTO, the gate face ------------------------------------
  // Base = orders missing the %10==3 keys; the merge source carries the
  // %10∈{3,7} keys re-priced and re-statused — so one merge exercises
  // BOTH arms: %10==7 matched (replace via DV), %10==3 not-matched
  // (insert). The pinned pre-merge version must read back untouched.
  private val SRC21_INS = 3L // source keys absent from the base → insert
  private val SRC21_UPD = 7L // source keys present in the base → replace

  private def src21Source(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderkey") % 10 === SRC21_INS ||
        col("o_orderkey") % 10 === SRC21_UPD)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
      .withColumn("o_orderstatus", lit("U"))

  private[graft] def buildSrc21(s: SparkSession, d: String): String = {
    val root = s"${graft.Scratch.dir}/src21_snap/${graft.Scratch.tag(d)}"
    if (headVersion(s, root) != 2) {
      fs(s, root).delete(new Path(root), true)
      commit(s, root, orders(s, d).filter(col("o_orderkey") % 10 =!= SRC21_INS))
      mergeInto(s, root, src21Source(s, d), Seq("o_orderkey"))
    }
    root
  }

  def src21(s: SparkSession, d: String): DataFrame = {
    val root = buildSrc21(s, d)
    Seq(1, 2).map { v =>
      read(s, root, Some(v))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("o_orderkey")).as("n_keys"),
          graft.Det.dsum(col("o_totalprice")).as("sum_price"),
          count(when(col("o_orderstatus") === "U", 1)).as("n_merged"))
        .select(lit(v).cast("int").as("version"), col("n_rows"),
          col("n_keys"), col("sum_price"), col("n_merged"))
    }.reduce(_ unionByName _)
      .transform(Gate.ordered("version"))
  }

  val mergeOracle: String =
    s"""SELECT 1 AS version, COUNT(*) AS n_rows,
       | COUNT(DISTINCT o_orderkey) AS n_keys,
       | ${graft.Det.sqlDsum("o_totalprice")} AS sum_price,
       | COUNT(CASE WHEN o_orderstatus = 'U' THEN 1 END) AS n_merged
       |FROM orders WHERE o_orderkey % 10 != $SRC21_INS
       |UNION ALL
       |SELECT 2, COUNT(*), COUNT(DISTINCT o_orderkey),
       | ${graft.Det.sqlDsum("o_totalprice")},
       | COUNT(CASE WHEN o_orderstatus = 'U' THEN 1 END)
       |FROM (
       |  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice,
       |   'U' AS o_orderstatus
       |  FROM orders
       |  WHERE o_orderkey % 10 IN ($SRC21_INS, $SRC21_UPD)
       |  UNION ALL
       |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
       |  WHERE o_orderkey % 10 NOT IN ($SRC21_INS, $SRC21_UPD)
       |)
       |ORDER BY version""".stripMargin
}
