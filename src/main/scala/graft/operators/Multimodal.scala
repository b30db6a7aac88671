package graft.operators

import graft.Gate
import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** §2.C m01–m03 — multimodal column plumbing.
  *
  * The reference ingests opaque documents alongside structured facts
  * (CDA document imports into the AKTIN services packaged by
  * /root/reference/generated/compose.yml); at training-data scale the
  * same shape carries media. Media assets ride through the engine as
  * opaque `binary` payload
  * columns plus a typed metadata struct — the schema/partitioning shape a
  * 100 TB image/audio corpus needs (payload stays columnar, metadata is
  * filterable without touching bytes). The decode step is a clearly
  * marked DETERMINISTIC STUB (this container ships no image/audio codecs)
  * computing fake-but-stable dimensions from the payload hash; the
  * surrounding plumbing — binary column, struct schema, per-batch
  * processing shape — is real and tested.
  */
object Multimodal {

  /** Payload synthesis + stubbed decode. In production `payload` IS the
    * stored media bytes and decode is a real codec call (mapInPandas /
    * mapInArrow batches on a cluster with codecs installed); everything
    * downstream of `media_meta` is unchanged.
    */
  def m01(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .withColumn("media_meta", struct(
        length(col("payload")).as("n_bytes"),
        crc32(col("payload")).as("checksum"),
        // ---- deterministic decode STUB below this line ----
        element_at(array(lit("jpeg"), lit("png"), lit("webp")),
          (pmod(xxhash64(col("payload")), lit(3)) + lit(1)).cast("int")).as("format"),
        (lit(16) + pmod(xxhash64(col("payload"), lit(1)), lit(2033))).cast("int").as("width"),
        (lit(16) + pmod(xxhash64(col("payload"), lit(2)), lit(2033))).cast("int").as("height")))
      .select(col("doc_id"),
        col("media_meta.n_bytes").as("n_bytes"),
        col("media_meta.checksum").as("checksum"),
        col("media_meta.format").as("format"),
        col("media_meta.width").as("width"),
        col("media_meta.height").as("height"),
        // frame-sample stub: first-KB slice of the payload, rehashed —
        // the batch shape of a thumbnail/frame extraction
        crc32(expr("substring(payload, 1, 1024)")).as("head_checksum"))
      .transform(Gate.ordered("doc_id"))

  /** Typed batch-decode shape: media rows flow through a per-partition
    * iterator — the Scala analogue of a Pandas-UDF/mapInArrow decode
    * stage, and the ONE place `mapPartitions` is the right tool (a codec
    * call is opaque per-row compute no Catalyst expression can express).
    * Real deployments put the actual image/audio codec inside
    * `decodeOne`; here it is the same deterministic stub as m01's SQL
    * path (asserted equal in MultimodalSpec). Partition-iterator
    * processing keeps per-batch state (codec contexts, buffers)
    * allocatable once per partition, not per row.
    */
  case class MediaIn(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
      width: Int, height: Int)

  def decodeStubTyped(s: SparkSession, d: String): Dataset[MediaMeta] = {
    import s.implicits._
    val in: Dataset[MediaIn] = documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaIn]
    in.mapPartitions { it =>
      // per-partition setup would open the codec ONCE here
      it.map(decodeOne)
    }
  }

  /** Deterministic fake decode — mirrors m01's SQL-expression stub
    * bit-for-bit: Spark's `xxhash64(payload)` is
    * hashUnsafeBytes(payload, seed=42), and `xxhash64(payload, lit(i))`
    * chains hashInt(i, <previous hash>).
    */
  private def decodeOne(m: MediaIn): MediaMeta = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val h0 = XXH64.hashUnsafeBytes(m.payload,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, m.payload.length, 42L)
    val h1 = XXH64.hashInt(1, h0)
    val h2 = XXH64.hashInt(2, h0)
    val fmt = Seq("jpeg", "png", "webp")(Math.floorMod(h0, 3L).toInt)
    MediaMeta(m.doc_id, m.payload.length, fmt,
      16 + Math.floorMod(h1, 2033L).toInt, 16 + Math.floorMod(h2, 2033L).toInt)
  }

  // -- m02: frame sampling ------------------------------------------------
  // The video-ingest batch shape: each asset explodes into strided
  // fixed-width frame rows (video_id, frame_no, frame) which downstream
  // stages feature-extract per-frame — the explode IS the real plumbing
  // (a frames table partitionable independently of its source videos).
  // Frames here are 64-char text slices every 256 chars (a codec-free
  // deterministic stand-in for "decode every 4th 64-byte frame"); every
  // asset yields at least its head frame. Value-checked by the oracle:
  // the per-frame digest is md5 over the identical slice in DuckDB.
  private val FRAME = 64
  private val STRIDE_CHARS = 256

  /** The shared strided frame sampler: (doc_id, frame_no, frame).
    * Repartition BEFORE the explode with a pinned count: single-file
    * parquet is one input partition, and AQE sizes by bytes so it
    * cannot see the amplification (the docsRepart trap).
    */
  private def frames(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("text"),
        explode(expr(
          s"sequence(0L, greatest(length(text) div $STRIDE_CHARS, 1) - 1)"))
          .as("frame_no"))
      .select(col("doc_id"), col("frame_no"),
        expr(s"substring(text, frame_no * $STRIDE_CHARS + 1, $FRAME)").as("frame"))

  def m02(s: SparkSession, d: String): DataFrame =
    frames(s, d)
      .select(col("doc_id"), col("frame_no"),
        md5(col("frame").cast("binary")).as("frame_md5"),
        length(col("frame")).as("frame_chars"))
      .transform(Gate.ordered("doc_id", "frame_no"))

  // -- m03: per-frame feature extraction (the embedding bridge) ----------
  // The step between frame sampling and similarity search: every sampled
  // frame reduces to a fixed-dimension feature vector — in production a
  // vision/audio encoder inside mapInArrow batches; here a deterministic
  // codec-free stand-in (per-chunk byte-sum pooling over the
  // space-padded frame) that both engines compute exactly, so the
  // oracle checks every feature value. Output rows are embedding-shaped
  // (id, dims) and feed the s01–s04 stack unchanged — the full
  // media → frames → features → ANN pipeline is one composition.
  private val FEAT_CHUNKS = 8
  private val CHUNK = FRAME / FEAT_CHUNKS

  /** Unsorted core — composed by p02 (the c01Core pattern). */
  private def m03Core(s: SparkSession, d: String): DataFrame = {
    // per-chunk byte-sum pooling via the loop-codegen'd ascii-window
    // sum (r16, m04's move): value-identical to the former rpad + 8x8
    // unrolled ascii chain — the pad-with-space semantics live in the
    // expression — with 0 instead of ~66 allocations per frame row
    val feats = (0 until FEAT_CHUNKS).map { c =>
      graft.functions.TextFunctions.asciiWindowSum(col("frame"),
        lit(c * CHUNK + 1), CHUNK).as(s"f$c")
    }
    frames(s, d)
      .select(col("doc_id") +: col("frame_no") +: feats: _*)
  }

  def m03(s: SparkSession, d: String): DataFrame =
    m03Core(s, d).transform(Gate.ordered("doc_id", "frame_no"))

  // -- p02: the multimodal pipeline composed end to end ------------------
  // m03's header claims its rows "feed the s01–s04 stack unchanged";
  // p02 PROVES the bridge as one declarative query: asset → strided
  // frames → per-frame features → k-NN of every PROBE-asset frame
  // against every other asset's frames ("find the assets containing
  // footage similar to this clip's"). Scoring is ALL-INTEGER dot and
  // norms (features are small ascii sums, far under 2^23) with exactly
  // one double division and sqrt per scored pair — bit-stable on both
  // engines, so rank order and the oracle hash agree exactly; ties
  // break by (doc_id, frame_no). The probe side is ONE asset's few
  // frames (broadcast — s05's bounded-probe shape, O(frames·corpus));
  // the large-probe-set scale path is s05b's persisted-index form.
  private val P02_K = 5
  private val P02_PROBE = 0L

  def p02(s: SparkSession, d: String): DataFrame = {
    val sq = (p: String) =>
      (0 until FEAT_CHUNKS).map(i => col(s"$p$i") * col(s"$p$i")).reduce(_ + _)
    val f = m03Core(s, d)
    val corpus = f.filter(col("doc_id") =!= P02_PROBE)
      .withColumn("nrm", sq("f"))
    val probe = broadcast(f.filter(col("doc_id") === P02_PROBE)
      .select(col("frame_no").as("q_frame") +:
        (0 until FEAT_CHUNKS).map(i => col(s"f$i").as(s"q$i")): _*)
      .withColumn("qnrm", sq("q")))
    val dot = (0 until FEAT_CHUNKS).map(i => col(s"f$i") * col(s"q$i"))
      .reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_frame")
      .orderBy(col("cos").desc, col("doc_id"), col("frame_no"))
    corpus.crossJoin(probe)
      .select(col("q_frame"), col("doc_id"), col("frame_no"),
        (dot.cast("double") /
          sqrt(col("nrm").cast("double") * col("qnrm").cast("double")))
          .as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= P02_K)
      .select(col("q_frame"), col("rk"), col("doc_id"), col("frame_no"),
        round(col("cos"), 6).as("cosine"))
      .transform(Gate.ordered("q_frame", "rk"))
  }

  // -- m04: audio-style windowing with activity gating -------------------
  // The audio-ingest shape differs from video's in two ways m02 doesn't
  // exercise: windows OVERLAP (hop < window, standard for spectral
  // features) and low-energy windows are dropped before feature
  // extraction (voice-activity gating — most of a raw audio corpus is
  // silence, and shipping it to the encoder wastes the 100 TB budget).
  // Codec-free stand-ins: the "signal" is the text's byte stream, window
  // "energy" is the mean ascii value over the window, and the activity
  // gate keeps windows above a fixed threshold. Every value is
  // oracle-checked; the explode is the real plumbing (a windows table
  // partitionable independently of its source assets).
  private val WIN = 128
  private val HOP = 64
  // corpus window energies span ~54-97 with median ~94 (mean ascii of
  // word text); 93 gates out the low-energy tail (~10-15%) without
  // being vacuous in either direction — MultimodalSpec asserts both
  // sides of the gate are non-empty
  private val ENERGY_MIN = 93.0

  def m04(s: SparkSession, d: String): DataFrame =
    m04Core(s, d).transform(Gate.ordered("doc_id", "win_no"))

  /** Unsorted core — composed by m06's sync join (the c09Core pattern). */
  private def m04Core(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      // pinned-count repartition before the ~len/HOP explode (the same
      // single-input-partition trap frames() documents)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("text"),
        explode(expr(
          s"sequence(0L, greatest((length(text) - $WIN) div $HOP, 0))"))
          .as("win_no"))
      // energy via the loop-codegen'd ascii-window sum (r16): value-
      // identical to the former substring + rpad + 128-term unrolled
      // ascii chain — same code points, same space padding past the
      // text end, same single double division — but reads the text
      // bytes in place instead of allocating ~130 UTF8Strings per
      // window (the allocation storm behind m04's in-suite 32-core GC
      // phantom). win_chars folds the same substring-length clamp into
      // arithmetic: windows start at least one char inside the text,
      // so length(substring) = min(WIN, len - start + 1) exactly.
      .select(col("doc_id"), col("win_no"),
        least(lit(WIN.toLong),
          length(col("text")).cast("long") - col("win_no") * HOP)
          .cast("int").as("win_chars"),
        (graft.functions.TextFunctions.asciiWindowSum(col("text"),
          col("win_no") * HOP + lit(1L), WIN).cast("double") / WIN)
          .as("energy"))
      .filter(col("energy") >= ENERGY_MIN)

  // -- m06: audio-visual sync (each frame ↔ its best active window) ------
  // The AV-training alignment step: paired (frame, audio-window)
  // samples need each video frame labeled with the overlapping audio
  // window that will encode alongside it — and frames over silence
  // (every overlapping window energy-gated away) must surface as
  // unpaired, not vanish. A frame at char p = frame_no*256 overlaps a
  // 128-char window starting at win_no*64 iff p-128 < win_no*64 <
  // p+64, i.e. exactly the two candidates win_no ∈ {4f-1, 4f} — so the
  // alignment is a 2-candidate equi-join (q26's bounded-bin move:
  // never a range join, never a nested loop), the best-window pick is
  // a row_number over ≤2 rows per frame (energy desc, win_no tie), and
  // silent frames come back on the left join as NULL sync. Energies
  // are integer-sum/2^7 — exactly representable doubles, so the
  // tie order is engine-stable without rounding.
  def m06(s: SparkSession, d: String): DataFrame = {
    val f = frames(s, d).select(col("doc_id"), col("frame_no"))
    val cand = f.select(col("doc_id"), col("frame_no"),
      explode(array(col("frame_no") * (STRIDE_CHARS / HOP) - 1,
        col("frame_no") * (STRIDE_CHARS / HOP))).as("win_no"))
      .filter(col("win_no") >= 0)
    // best-of-≤2 via max(struct(energy, -win_no)) — field-order struct
    // comparison IS the (energy desc, win_no asc) rule, and unlike a
    // rank window it partial-aggregates map-side: no per-group sort,
    // and the single shuffle carries one candidate per frame per task
    val best = cand
      .join(m04Core(s, d).select(col("doc_id"), col("win_no"), col("energy")),
        Seq("doc_id", "win_no"))
      .groupBy(col("doc_id"), col("frame_no"))
      .agg(max(struct(col("energy"), (-col("win_no")).as("nw"))).as("m"))
      .select(col("doc_id"), col("frame_no"),
        (-col("m.nw")).as("sync_win"), col("m.energy").as("energy"))
    f.join(best, Seq("doc_id", "frame_no"), "left_outer")
      .transform(Gate.ordered("doc_id", "frame_no"))
  }

  // -- m05: size-bounded shard manifest (the WebDataset export shape) ----
  // Training jobs read media as sequential SHARDS, not per-asset files;
  // the export step packs assets into byte-bounded shards and emits the
  // manifest readers use for work assignment (resume offsets, balance,
  // integrity). Packing is t07's starting-offset bin applied per SOURCE
  // stream (the natural shard prefix — one crawl stream, one site):
  // within a source, assets in doc_id order bin by starting-byte-offset
  // div the shard budget (spark.graft.shard.bytes). Sources pack
  // independently — embarrassingly parallel, ONE shuffle on source
  // serving both the running-sum window and the manifest aggregate —
  // and no shard's contents ever depend on another source's data, so
  // adding a source never repacks existing shards. Manifest identity
  // fields (min/max content hash, doc range, byte total) are
  // order-independent aggregates: the manifest is partition-stable and
  // each field is exact in the oracle.
  // -- m07: modality-aware sequence packing ------------------------------
  // t07's context-window packing, multimodal: an omni-model's training
  // sequence budget is spent on TEXT tokens, IMAGE tokens (per frame —
  // m02's stride defines the frame count) and AUDIO tokens (per
  // ACTIVE window — m04's energy gate, so silence costs nothing),
  // and packing must budget the COMBINED cost per asset. Same scale
  // shape as t07: per-shard cumulative sum after one shuffle on shard,
  // embarrassingly parallel; the audio-cost join is doc-keyed and
  // AQE-splittable; image cost is in-row arithmetic (no frame explode
  // — only the COUNT is needed). Per-modality token sums per packed
  // sequence come out of the same rollup, so the mixture accounting
  // (text:image:audio ratio per sequence) is free.
  private val M07_BUDGET = 2048L
  private val M07_SHARDS = 8
  private val M07_IMG_TOK = 16L // tokens per frame (patch grid stand-in)
  private val M07_AUD_TOK = 8L // tokens per active audio window

  def m07(s: SparkSession, d: String): DataFrame = {
    val aud = m04Core(s, d).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_win"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("text_tok"),
        (greatest(expr(s"length(text) div $STRIDE_CHARS"), lit(1L)) *
          M07_IMG_TOK).as("img_tok"))
      .join(aud, Seq("doc_id"), "left")
      .withColumn("aud_tok", coalesce(col("n_win"), lit(0L)) * M07_AUD_TOK)
      .withColumn("shard", pmod(col("doc_id"), lit(M07_SHARDS.toLong)))
      .withColumn("cost", col("text_tok") + col("img_tok") + col("aud_tok"))
      .withColumn("cum", sum(col("cost")).over(w))
      .withColumn("seq_id", expr(s"(cum - cost) div $M07_BUDGET"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("text_tok")).as("text_tokens"),
        sum(col("img_tok")).as("img_tokens"),
        sum(col("aud_tok")).as("aud_tokens"),
        sum(col("cost")).as("total_tokens"))
      .transform(Gate.ordered("shard", "seq_id"))
  }

  def m05(s: SparkSession, d: String): DataFrame = {
    val b = graft.GraftConf.shardBytes(s)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy("source").orderBy("doc_id")
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
        md5(col("text").cast("binary")).as("h"))
      .withColumn("start_off", sum(col("n_chars")).over(w) - col("n_chars"))
      .groupBy(col("source"), expr(s"start_off div $b").as("shard_no"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_chars")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        min(col("h")).as("h_min"),
        max(col("h")).as("h_max"))
      .transform(Gate.ordered("source", "shard_no"))
  }

  // -- m08: dataset card (the datasheet every released corpus ships) -----
  // One queryable report of what the training corpus IS — sizes, token
  // totals, language mix, source spread, modality volumes — the
  // "Datasheets for Datasets" (Gebru et al. 2018) accounting face,
  // emitted by the same engine that built the data so the card can
  // never drift from the corpus. c18's multi-section report shape:
  // each section is ONE scan of its table reduced to section-key rows
  // (corpus totals ride the language rollup — no second documents
  // scan), unioned into a uniform (section, sec_key, n_items, n_units)
  // schema. All-integer metrics.
  def m08(s: SparkSession, d: String): DataFrame = {
    val docTok = documents(s, d)
      .select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val langs = docTok
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_items"), sum(col("n_tok")).as("n_units"))
      .select(lit("lang").as("section"), col("lang").as("sec_key"),
        col("n_items"), col("n_units"))
    val docs = docTok
      .agg(count(lit(1)).as("n_items"), sum(col("n_tok")).as("n_units"))
      .select(lit("corpus").as("section"), lit("documents").as("sec_key"),
        col("n_items"), col("n_units"))
    val sources = docTok
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_items"), max(col("n")).as("n_units"))
      .select(lit("corpus").as("section"), lit("sources").as("sec_key"),
        col("n_items"), col("n_units"))
    val vecs = embeddings(s, d)
      .agg(count(lit(1)).as("n_items"),
        max(size(col("embedding"))).cast("long").as("n_units"))
      .select(lit("modality").as("section"), lit("embeddings").as("sec_key"),
        col("n_items"), col("n_units"))
    val evs = events(s, d)
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("user_id")).as("n_units"))
      .select(lit("modality").as("section"), lit("events").as("sec_key"),
        col("n_items"), col("n_units"))
    docs.unionByName(langs).unionByName(sources).unionByName(vecs)
      .unionByName(evs)
      .transform(Gate.ordered("section", "sec_key"))
  }

  // -- m09: cross-asset frame-level near-dup (same footage detection) ----
  // The video face of d02: two assets sharing ≥2 sampled-frame digests
  // contain the same footage (re-uploads, edits, mirrored clips) — the
  // multimodal dedup signal frame hashes give for free once m02's
  // frames table exists. Exactly d02's inverted-index shape with the
  // frame digest as the shingle: df-capped (an intro/outro card shared
  // by thousands of assets must not pair them all), bucket equi-join,
  // never an asset × asset comparison.
  private val M09_MIN_SHARED = 2L

  def m09(s: SparkSession, d: String): DataFrame = {
    val fd = frames(s, d)
      .select(col("doc_id"), md5(col("frame").cast("binary")).as("h"))
      .distinct()
    val common = fd.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > graft.GraftConf.dfCap(s))
      .select("h")
    val ci = fd.join(broadcast(common), Seq("h"), "left_anti")
    ci.select(col("h"), col("doc_id").as("asset_a"))
      .join(ci.select(col("h"), col("doc_id").as("asset_b")), "h")
      .filter(col("asset_a") < col("asset_b"))
      .groupBy(col("asset_a"), col("asset_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= M09_MIN_SHARED)
      .transform(Gate.ordered("asset_a", "asset_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m08_dataset_card" -> (m08 _),
    "m09_video_neardup" -> (m09 _),
    "m01_multimodal_meta" -> (m01 _),
    "m02_frame_sample" -> (m02 _),
    "m03_frame_features" -> (m03 _),
    "m04_audio_windows" -> (m04 _),
    "m05_shard_manifest" -> (m05 _),
    "m07_pack_multimodal" -> (m07 _),
    "m06_av_sync" -> (m06 _),
    "p02_multimodal_ann" -> (p02 _)
  )

  /** m01 is rows-only: xxhash64-derived stub fields are not
    * DuckDB-expressible; schema/determinism are pinned by MultimodalSpec.
    */
  /** m03's feature derivation as a reusable CTE body (everything up to
    * the final ORDER BY) — shared verbatim by the m03 and p02 oracles
    * so the encoder stand-in has ONE SQL definition.
    */
  private val M03_FEATS_SQL = {
    val featSql = (0 until FEAT_CHUNKS).map { c =>
      (0 until CHUNK).map(i => s"ascii(substring(fr, ${c * CHUNK + i + 1}, 1))")
        .mkString("(", " + ", s") AS f$c")
    }.mkString(",\n ")
    s"""SELECT doc_id, i AS frame_no,
       | $featSql
       |FROM (
       | SELECT doc_id, i,
       |  rpad(substring(text, CAST(i * $STRIDE_CHARS + 1 AS INT), $FRAME),
       |   $FRAME, ' ') AS fr
       | FROM documents,
       |  LATERAL (SELECT unnest(range(0,
       |    greatest(len(text) // $STRIDE_CHARS, 1))) AS i) r)""".stripMargin
  }

  /** m04's active windows (doc_id, win_no, win_chars, energy — no
    * ORDER) — ONE SQL definition shared by the m04 and m06 oracles.
    */
  private val M04_WINS_SQL =
    s"""SELECT doc_id, win_no, win_chars, energy FROM (
       | SELECT doc_id, i AS win_no,
       |  length(w) AS win_chars,
       |  CAST(list_sum(list_transform(string_split(rpad(w, $WIN, ' '), ''),
       |    c -> ascii(c))) AS DOUBLE) / $WIN AS energy
       | FROM (
       |  SELECT doc_id, i,
       |   substring(text, CAST(i * $HOP + 1 AS INT), $WIN) AS w
       |  FROM documents,
       |   LATERAL (SELECT unnest(range(0,
       |     greatest((len(text) - $WIN) // $HOP, 0) + 1)) AS i) r))
       |WHERE energy >= $ENERGY_MIN""".stripMargin

  val oracle: Map[String, String] = Map(
    // m02's frame digests, d02's df-cap/pair shape on them
    "m09_video_neardup" ->
      s"""WITH fd AS (
         | SELECT DISTINCT doc_id,
         |  md5(substring(text, CAST(i * $STRIDE_CHARS + 1 AS INT), $FRAME))
         |   AS h
         | FROM documents,
         |  LATERAL (SELECT unnest(range(0,
         |    greatest(len(text) // $STRIDE_CHARS, 1))) AS i) r),
         |ci AS (SELECT * FROM fd WHERE h NOT IN (
         | SELECT h FROM fd GROUP BY 1
         | HAVING COUNT(*) > ${graft.operators.Dedup.DF_CAP}))
         |SELECT a.doc_id AS asset_a, b.doc_id AS asset_b,
         | COUNT(*) AS n_shared
         |FROM ci a JOIN ci b ON a.h = b.h AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |ORDER BY asset_a, asset_b""".stripMargin,
    // per-section recomputes from the raw tables; HUGEINT discipline
    "m08_dataset_card" ->
      """SELECT section, sec_key, n_items, n_units FROM (
        | SELECT 'corpus' AS section, 'documents' AS sec_key,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_units
        | FROM documents
        | UNION ALL
        | SELECT 'lang', lang, COUNT(*),
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
        | FROM documents GROUP BY lang
        | UNION ALL
        | SELECT 'corpus', 'sources', COUNT(*), CAST(MAX(n) AS BIGINT)
        | FROM (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1)
        | UNION ALL
        | SELECT 'modality', 'embeddings', COUNT(*),
        |  CAST(MAX(len(embedding)) AS BIGINT) FROM embeddings
        | UNION ALL
        | SELECT 'modality', 'events', COUNT(*),
        |  COUNT(DISTINCT user_id) FROM events)
        |ORDER BY section, sec_key""".stripMargin,
    "m03_frame_features" ->
      s"""$M03_FEATS_SQL
         |ORDER BY doc_id, frame_no""".stripMargin,
    // the packing rule verbatim: per-source running byte offset, offset
    // div the (default) shard budget, order-independent manifest fields.
    // HUGEINT window/group sums cast back to BIGINT to match Spark.
    "m05_shard_manifest" ->
      """WITH a AS (
        | SELECT doc_id, source, n_chars, md5(text) AS h,
        |  CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars
        |   AS BIGINT) AS start_off
        | FROM documents)
        |SELECT source, start_off // 4096 AS shard_no,
        | COUNT(*) AS n_assets, CAST(SUM(n_chars) AS BIGINT) AS shard_bytes,
        | MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
        | MIN(h) AS h_min, MAX(h) AS h_max
        |FROM a GROUP BY 1, 2 ORDER BY source, shard_no""".stripMargin,
    // the composed bridge: m03's feature CTE verbatim, all-integer
    // dot/norms, one double division + sqrt per pair — rank order is
    // bit-stable on both engines
    "p02_multimodal_ann" -> {
      val fs = (0 until FEAT_CHUNKS)
      val nrm = fs.map(i => s"f$i * f$i").mkString(" + ")
      val dot = fs.map(i => s"c.f$i * p.q$i").mkString(" + ")
      val qsel = fs.map(i => s"f$i AS q$i").mkString(", ")
      s"""WITH feats AS ($M03_FEATS_SQL),
         |n AS (SELECT *, ($nrm) AS nrm FROM feats),
         |probe AS (SELECT frame_no AS q_frame, $qsel, nrm AS qnrm
         | FROM n WHERE doc_id = $P02_PROBE),
         |scored AS (
         | SELECT p.q_frame, c.doc_id, c.frame_no,
         |  CAST($dot AS DOUBLE) /
         |   sqrt(CAST(c.nrm AS DOUBLE) * CAST(p.qnrm AS DOUBLE)) AS cos
         | FROM n c, probe p WHERE c.doc_id <> $P02_PROBE),
         |r AS (SELECT q_frame, doc_id, frame_no, cos, ROW_NUMBER() OVER (
         | PARTITION BY q_frame ORDER BY cos DESC, doc_id, frame_no) AS rk
         | FROM scored)
         |SELECT q_frame, rk, doc_id, frame_no, ROUND(cos, 6) AS cosine
         |FROM r WHERE rk <= $P02_K ORDER BY q_frame, rk""".stripMargin
    },
    // the byte sum is integer-exact on both engines, so DuckDB's list
    // fold and Spark's unrolled codegen chain agree bit-for-bit after
    // the single double division (a 128-term `+` chain exceeds DuckDB's
    // expression-binder recursion limit, hence the list form here)
    "m04_audio_windows" ->
      s"""$M04_WINS_SQL
         |ORDER BY doc_id, win_no""".stripMargin,
    // the per-doc costs re-derived from scratch (m04's window SQL for
    // the audio count, in-row frame arithmetic for image) and the t07
    // cum-sum packing rule; HUGEINT discipline throughout
    "m07_pack_multimodal" ->
      s"""WITH wn AS (SELECT doc_id, COUNT(*) AS n_win
         | FROM ($M04_WINS_SQL) GROUP BY 1),
         |c AS (
         | SELECT doc_id, doc_id % $M07_SHARDS AS shard,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS text_tok,
         |  CAST(greatest(length(text) // $STRIDE_CHARS, 1) * $M07_IMG_TOK
         |   AS BIGINT) AS img_tok,
         |  CAST(COALESCE(n_win, 0) * $M07_AUD_TOK AS BIGINT) AS aud_tok
         | FROM documents LEFT JOIN wn USING (doc_id)),
         |p AS (SELECT *, text_tok + img_tok + aud_tok AS cost,
         |  SUM(text_tok + img_tok + aud_tok) OVER (PARTITION BY shard
         |   ORDER BY doc_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         | FROM c)
         |SELECT shard, CAST((cum - cost) // $M07_BUDGET AS BIGINT) AS seq_id,
         | COUNT(*) AS n_assets,
         | CAST(SUM(text_tok) AS BIGINT) AS text_tokens,
         | CAST(SUM(img_tok) AS BIGINT) AS img_tokens,
         | CAST(SUM(aud_tok) AS BIGINT) AS aud_tokens,
         | CAST(SUM(cost) AS BIGINT) AS total_tokens
         |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the same active-window fragment, 2-candidate join, best by
    // (energy desc, win_no); silent frames stay as NULL rows
    "m06_av_sync" ->
      s"""WITH fr AS (SELECT doc_id,
         |  unnest(range(0, greatest(len(text) // $STRIDE_CHARS, 1)))
         |   AS frame_no FROM documents),
         |wn AS (SELECT doc_id, win_no, energy FROM ($M04_WINS_SQL)),
         |cand AS (SELECT doc_id, frame_no,
         |  frame_no * ${STRIDE_CHARS / HOP} - 1 + k AS win_no
         | FROM fr, LATERAL (SELECT unnest(range(0, 2)) AS k) r
         | WHERE frame_no * ${STRIDE_CHARS / HOP} - 1 + k >= 0),
         |j AS (SELECT c.doc_id, c.frame_no, c.win_no, wn.energy,
         |  ROW_NUMBER() OVER (PARTITION BY c.doc_id, c.frame_no
         |   ORDER BY wn.energy DESC, c.win_no) AS rk
         | FROM cand c JOIN wn ON wn.doc_id = c.doc_id
         |  AND wn.win_no = c.win_no)
         |SELECT fr.doc_id, fr.frame_no, j.win_no AS sync_win, j.energy
         |FROM fr LEFT JOIN (SELECT * FROM j WHERE rk = 1) j
         | ON j.doc_id = fr.doc_id AND j.frame_no = fr.frame_no
         |ORDER BY fr.doc_id, fr.frame_no""".stripMargin,
    "m02_frame_sample" ->
      s"""SELECT doc_id, i AS frame_no,
         | md5(substring(text, CAST(i * $STRIDE_CHARS + 1 AS INT), $FRAME))
         |  AS frame_md5,
         | length(substring(text, CAST(i * $STRIDE_CHARS + 1 AS INT), $FRAME))
         |  AS frame_chars
         |FROM documents,
         | LATERAL (SELECT unnest(range(0,
         |   greatest(len(text) // $STRIDE_CHARS, 1))) AS i) r
         |ORDER BY doc_id, frame_no""".stripMargin
  )
}
