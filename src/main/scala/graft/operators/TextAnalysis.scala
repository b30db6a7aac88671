package graft.operators

import graft.Det.dsumWide
import graft.Gate
import graft.Tables._
import graft.functions.RollingFingerprint
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.C t01–t07 — text analysis over the `documents` corpus: language-ID,
  * quality scoring, token statistics, fingerprinting, deterministic
  * splits/mixtures, context-window packing. Mostly builtin-function
  * pipelines (split/filter/regexp — all codegen'd), one scan each, no
  * shuffle except the final oracle-determinism sort.
  */
object TextAnalysis {

  private val LANGS = Seq("en", "de", "fr", "es", "zh")

  // -- t01: stopword-hit language ID -------------------------------------
  // Score each language's stopword list against the token stream; predict
  // the argmax with a fixed preference order for ties. One scan, no joins.
  def t01(s: SparkSession, d: String): DataFrame = {
    val scored = documents(s, d)
      .select(col("doc_id") +: tokens(col("text")).as("w") +: Nil: _*)
      .select(col("doc_id") +:
        LANGS.map(l => stopwordHits("w", stopwords(l)).as(s"score_$l")): _*)
    val best: Column = greatest(LANGS.map(l => col(s"score_$l")): _*)
    val pred = LANGS.foldRight(lit("und")) { (l, acc) =>
      when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight gives en > de > fr > es > zh tie preference
    scored.withColumn("lang_pred", pred).transform(Gate.ordered("doc_id"))
  }

  // -- t02: document quality score ---------------------------------------
  // Length, lexical diversity and stopword saturation combined into one
  // bounded score — the standard cheap pre-training quality filter.
  /** Unsorted scoring core — composed by Pipeline.p01, where a gate
    * sort on an intermediate result would be wasted work.
    */
  private[graft] def t02Core(s: SparkSession, d: String): DataFrame =
    t02Scored(s, d, Nil)

  /** t02's scoring with pass-through columns (t18 groups the same
    * scores by source) — ONE formula, whatever the caller carries.
    */
  private[graft] def t02Scored(s: SparkSession, d: String,
      extra: Seq[String]): DataFrame =
    documents(s, d)
      .select(Seq(col("doc_id"), col("text"), tokens(col("text")).as("w")) ++
        extra.map(col): _*)
      .select(Seq(col("doc_id"),
        size(col("w")).as("n_tokens"),
        (size(array_distinct(col("w"))).cast("double") /
          size(col("w")).cast("double")).as("distinct_ratio"),
        (stopwordHits("w", stopwords("en")).cast("double") /
          size(col("w")).cast("double")).as("stop_ratio")) ++
        extra.map(col): _*)
      .select(Seq(col("doc_id"), col("n_tokens"),
        round(col("distinct_ratio"), 6).as("distinct_ratio"),
        round(col("stop_ratio"), 6).as("stop_ratio"),
        round(least(lit(1.0), col("n_tokens") / 100.0) *
          (lit(0.5) + lit(0.5) * col("distinct_ratio")) *
          (lit(1.0) - lit(0.2) * col("stop_ratio")), 6).as("quality")) ++
        extra.map(col): _*)

  def t02(s: SparkSession, d: String): DataFrame =
    t02Core(s, d).transform(Gate.ordered("doc_id"))

  // -- t03: token statistics ---------------------------------------------
  // Whitespace tokens plus a BPE-ish subword segmentation (consonant/vowel
  // runs via regexp_extract_all) — the token-count accounting every
  // training-data pipeline needs.
  def t03(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("w"))
      .select(col("doc_id"),
        size(col("w")).as("n_tokens"),
        size(array_distinct(col("w"))).as("n_distinct"),
        size(regexp_extract_all(col("text"),
          lit("[bcdfghjklmnpqrstvwxyz]+|[aeiou]+"), lit(0))).as("n_subtokens"),
        length(regexp_replace(col("text"), " ", "")).as("n_chars_nospace"))
      .transform(Gate.ordered("doc_id"))

  // -- t04: rolling-hash document fingerprint ----------------------------
  // Custom Catalyst Expression (graft.functions.RollingFingerprint) with
  // full codegen: one generated-Java pass over the UTF-8 bytes per doc,
  // inside the same WholeStageCodegen stage as the scan. Grouping by the
  // fingerprint gives winnowing-style near-dup clusters.
  def t04(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), RollingFingerprint(col("text")).as("fingerprint"))
      .transform(Gate.ordered("doc_id"))

  // -- t05: deterministic train/val/test split ---------------------------
  // Dataset splitting for training pipelines done CONTENT-ADDRESSABLY:
  // the split is a pure function of the doc id's md5 (first hex byte
  // thresholded at cd/e6 → ~80/10/10), so it is identical on every
  // engine, every partitioning, and every rerun — no sampling seed to
  // drift between the 100 TB run and the validation extract. (Spark's
  // sample()/sampleBy are seed+partitioning dependent: unusable for a
  // reproducible split contract.)
  private[graft] def splitOf(idCol: Column): Column = {
    val h = substring(md5(idCol.cast("string").cast("binary")), 1, 2)
    when(h < "cd", "train").when(h < "e6", "val").otherwise("test")
  }

  def t05(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("split", splitOf(col("doc_id")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("split")

  // -- t06: deterministic mixture sampling -------------------------------
  // Training-mixture construction: downsample each language stratum at
  // its own rate (upweight scarce languages, downweight English) with
  // the same content-addressed mechanism as t05 — keep a doc iff its
  // md5-hex prefix falls under the stratum's threshold. The mixture is
  // a pure function of (doc_id, lang): identical on every engine,
  // partitioning and rerun, and REFINABLE (raising a rate strictly
  // grows the sample — thresholds are nested).
  private val MIX_RATES = Seq(
    "en" -> 0.25, "de" -> 1.0, "es" -> 0.75, "fr" -> 1.0, "zh" -> 0.5)

  private def hex4(rate: Double): String =
    "%04x".formatLocal(java.util.Locale.ROOT, (rate * 65536).toLong)

  /** The t06 mixture-keep rule as a Column over (doc_id, lang) — ONE
    * definition shared by t06 and Pipeline.p04's release stage.
    */
  private[graft] def mixtureKeep: Column = {
    val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4)
    MIX_RATES.map { case (l, r) =>
      if (r >= 1.0) col("lang") === l
      else col("lang") === l && h < hex4(r)
    }.reduce(_ || _)
  }

  def t06(s: SparkSession, d: String): DataFrame = {
    val keep = mixtureKeep
    documents(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        count(when(keep, 1)).as("n_sampled"))
      .orderBy("lang")
  }

  // -- t07: context-window sequence packing ------------------------------
  // The pretraining packing step: documents are concatenated (per shard,
  // in a deterministic order) and chunked into fixed-token context
  // windows; a doc's window is determined by its starting offset in the
  // shard's token stream. Packing is per-shard — one window pass after
  // one shuffle on shard, embarrassingly parallel at 100 TB (shard
  // count scales with the cluster; order within a shard is the stable
  // doc_id order, so the packing is deterministic and append-friendly).
  private val PACK_TOKENS = 1024
  private val PACK_SHARDS = 8

  def t07(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    documents(s, d)
      .select(col("doc_id"), pmod(col("doc_id"), lit(PACK_SHARDS)).as("shard"),
        size(tokens(col("text"))).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("seq_id", expr(s"(cum - n_tokens) div $PACK_TOKENS"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .transform(Gate.ordered("shard", "seq_id"))
  }

  // -- t08: PII redaction ------------------------------------------------
  // Training corpora are scrubbed of emails/phones before use. The test
  // corpus is synthetic and clean, so each doc first gains a
  // deterministic contact line derived from doc_id (the oracle rebuilds
  // it exactly) carrying FIVE phone shapes — international with country
  // code and space/dash grouping, NANP parenthesized area code, and
  // dash-/dot-separated 10-digit forms — then the redactor strips every
  // match and counts what it removed. Patterns stay in the common
  // Java-regex/RE2 subset (no lookaround, no backreferences) so Spark
  // and DuckDB agree byte-for-byte; the whole pass is regexp_* builtins
  // — codegen'd, one scan, trivially parallel at any corpus size.
  private val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // alternation of well-formed shapes, NOT one loose digit-soup pattern:
  // a scrubber that matches any digit run would eat quantities/years.
  //  1. +<cc> <groups>: +44 20 7946 0958, +1-555-0142, +49-30-1234-567
  //  2. (NNN) NNN-NNNN / (NNN)NNN NNNN
  //  3. NNN-NNN-NNNN / NNN.NNN.NNNN
  private val PHONE_RE =
    "\\+[0-9]{1,3}[- ][0-9]{2,4}([- ][0-9]{3,4}){1,3}" +
      "|\\([0-9]{3}\\)[ -]?[0-9]{3}[- ][0-9]{4}" +
      "|[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"

  def t08(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("d4",
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
      .withColumn("d3",
        lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"))
      .withColumn("pii_text", concat(col("text"),
        lit(" Contact user"), col("doc_id").cast("string"),
        lit("@example.com or +1-555-"), col("d4"),
        lit(" or (555) 014-"), col("d4"),
        lit(" or 555-"), col("d3"), lit("-0"), col("d3"),
        lit(" or +44 20 7946 "), col("d4"),
        lit(" or 555."), col("d3"), lit(".9"), col("d3")))
      .select(col("doc_id"),
        regexp_count(col("pii_text"), lit(EMAIL_RE)).as("n_emails"),
        regexp_count(col("pii_text"), lit(PHONE_RE)).as("n_phones"),
        regexp_replace(
          regexp_replace(col("pii_text"), EMAIL_RE, "[EMAIL]"),
          PHONE_RE, "[PHONE]").as("redacted"))
      .transform(Gate.ordered("doc_id"))

  /** Residual-PII audit of [[t08]]'s output — the redaction's own QA
    * pass; TextAnalysisSpec asserts both counts are zero everywhere.
    */
  def t08Residual(s: SparkSession, d: String): DataFrame =
    t08(s, d).select(col("doc_id"),
      regexp_count(col("redacted"), lit(EMAIL_RE)).as("res_emails"),
      regexp_count(col("redacted"), lit(PHONE_RE)).as("res_phones"))

  // -- t09: intra-document repetition cleanup ----------------------------
  // Corpus cleaning: collapse consecutive duplicate tokens (degenerate
  // generation loops, stutter artifacts — "batch batch batch" → "batch").
  // Scale shape: tokens stream through ONE keyed window (lag over
  // (doc, pos)) — spillable, no per-doc materialization until the final
  // bounded re-assembly; a 10M-token doc flows through Spark's external
  // sort. The re-assembly transform() runs per kept token over one doc's
  // array — small, off the hot path. Oracle rebuilds the identical
  // cleaned text via DuckDB's indexed list_filter.
  def t09(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    documents(s, d)
      // null text would vanish under posexplode while a SQL engine
      // keeps the row — make the not-null contract explicit on BOTH
      // sides (oracle mirrors the filter) instead of corpus-dependent
      .filter(col("text").isNotNull)
      // pinned-count repartition before the ~tokens/doc explode (the
      // single-input-partition trap — AQE can't see the amplification)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("prev", lag(col("tok"), 1).over(w))
      .withColumn("keep", col("prev").isNull || col("tok") =!= col("prev"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_before"),
        count(when(col("keep"), lit(1))).as("n_after"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("tok"))))),
          p => p.getField("tok"))).as("cleaned"))
      .transform(Gate.ordered("doc_id"))
  }

  // -- t10: corpus-statistic token commonness ----------------------------
  // Quality filtering against CORPUS-derived statistics (the step after
  // t02's per-document heuristics): per document, the average corpus
  // frequency of its tokens — garbled/OCR-noise docs score near 1
  // (tokens seen nowhere else), boilerplate scores huge. Two passes over
  // the token stream, both distributed: one groupBy(token) builds the
  // unigram table (map-side partial agg shrinks it before the shuffle),
  // one shuffle join tags each token with its count. The join — not a
  // per-token window — is deliberate: AQE can split a skewed join key
  // (stop-words at 100 TB), while a window over a stop-word's partition
  // cannot be split. All-integer accumulation; the ONE double division
  // at the end is exact-rounded on any engine.
  def t10(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .filter(col("text").isNotNull)
      // same pinned repartition-before-explode as t09/t11
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("tok_n"))
    toks.join(freq, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("tok_n")).as("sum_freq"))
      .withColumn("avg_tok_freq",
        col("sum_freq").cast("double") / col("n_tokens"))
      .transform(Gate.ordered("doc_id"))
  }

  // -- t11: train/eval contamination detection ---------------------------
  // Decontamination, the step every training pipeline runs before
  // reporting eval numbers: find val/test documents (t05's content-
  // addressed split) that share enough word-3-gram shingles with ANY
  // single train document to indicate leakage. Scale shape is d02's
  // inverted index, but the self-join is replaced by the asymmetric
  // train x eval join — candidate cost is |eval shingles| x bounded
  // bucket size, never corpus x corpus. The same DF_CAP-style stop-
  // shingle drop bounds bucket sizes (a 100 TB corpus's "the end"
  // shingle would otherwise pair every eval doc with every train doc),
  // and the index joins on the 8-byte xxhash64, not the string (a 64-bit
  // collision can only nudge a shared count — the d02 caveat applies).
  // The thresholds ARE d02's — referenced, not re-declared, so a tune of
  // the dedup gate cannot silently diverge the contamination gate
  // (TextAnalysisSpec chains t11 to d02's pairs on this basis).
  private[graft] val CONTAM_DF_CAP = Dedup.DF_CAP
  private[graft] val CONTAM_MIN_SHARED = Dedup.MIN_SHARED

  def t11(s: SparkSession, d: String): DataFrame = {
    // repartition before the explode: single-file parquet = ONE input
    // partition, and AQE sizes by bytes so it cannot see the ~90x
    // shingle amplification (the docsRepart trap d02's index avoids)
    val sh = documents(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), splitOf(col("doc_id")).as("split"),
        tokens(col("text")).as("w"))
      .select(col("doc_id"), col("split"),
        explode(shingles3("w")).as("shingle"))
      .select(col("doc_id"), col("split"), xxhash64(col("shingle")).as("h"))
    val common = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > graft.GraftConf.contamDfCap(s)).select("h")
    val ci = sh.join(broadcast(common), Seq("h"), "left_anti")
    val train = ci.filter(col("split") === "train")
      .select(col("h"), col("doc_id").as("train_id"))
    ci.filter(col("split") =!= "train")
      .join(train, "h")
      .groupBy(col("doc_id"), col("split"), col("train_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= CONTAM_MIN_SHARED)
      .groupBy(col("doc_id"), col("split"))
      .agg(countDistinct(col("train_id")).as("n_contaminating"),
        max(col("shared")).as("max_shared"))
      .transform(Gate.ordered("doc_id"))
  }

  // -- t12: corpus-frequency boilerplate removal (C4-style) --------------
  // The cleanup step between t09 (intra-doc repeats) and the pair-level
  // dedups (d02/d08): text BLOCKS that recur across enough DISTINCT
  // documents are boilerplate (headers, navigation, license banners)
  // and are cut from every document, keeping the rest in order — C4's
  // "discard any line seen more than once" rule, re-expressed over
  // fixed-size token blocks because this corpus has no line structure.
  // Scale shape: blocks come from an in-row `slice` (no explode until
  // after the repartition), the document frequency is ONE groupBy with
  // map-side partials (never a self-join — a block with df=10⁶ costs
  // one aggregate row, not 10¹² pairs), and the tag-back is a shuffle
  // join on the block text that AQE can split on skew. Reassembly is
  // the t09 collect-sort pattern: deterministic on any partitioning.
  // defaults of the spark.graft.boilerplate.* sizing knobs — the
  // recorded oracle mirrors THESE (an override is an accuracy/cost
  // knob, same contract as spark.graft.dedup.dfCap)
  private val T12_BLOCK = 8 // tokens per block
  private val T12_DF = 2 // blocks in >= this many docs are boilerplate

  def t12(s: SparkSession, d: String): DataFrame = {
    val b = graft.GraftConf.boilerBlockTokens(s)
    val dfT = graft.GraftConf.boilerDf(s)
    val blocks = documents(s, d)
      .filter(col("text").isNotNull)
      // pinned-count repartition before the per-block explode (the
      // single-input-partition trap — AQE sizes by bytes)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), ((size(col("w")) - 1) / b).cast("int")),
        bi => array_join(slice(col("w"), bi * b + 1, lit(b)), " ")))
        .as(Seq("bi", "blk")))
    val df = blocks.groupBy(col("blk"))
      .agg(countDistinct(col("doc_id")).as("df"))
    blocks.join(df, "blk")
      .withColumn("keep", col("df") < dfT)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        count(when(!col("keep"), lit(1))).as("n_removed"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("bi"), col("blk"))))),
          p => p.getField("blk"))).as("clean_text"))
      .transform(Gate.ordered("doc_id"))
  }

  // -- t13: intra-document duplicate-n-gram fraction (Gopher signal) -----
  // The repetition quality filter from the Gopher/MassiveText recipe:
  // documents whose 3-grams repeat heavily (looping generations, boiler
  // chrome, scraped nav) are down-weighted or dropped. Complements t09
  // (which removes CONSECUTIVE token repeats) by scoring repeats at ANY
  // distance. Count-based form, one definition on both sides: an
  // occurrence is duplicated iff its 3-gram value occurs ≥2 times in
  // the SAME document; frac = duplicated occurrences / occurrences.
  // Scale shape: shingles3 reuses the dedup family's in-row shingler,
  // the per-(doc, gram) count is one groupBy with map-side partials
  // (grouping key is doc-scoped so no cross-corpus skew), and the
  // division is the t10 pattern — all-integer accumulation, one
  // exact-rounded double at the end.
  def t13(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("text").isNotNull)
      // pinned repartition-before-explode, as t09/t10/t11
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(shingles3All("w")).as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_ngrams"),
        sum(when(col("c") >= 2, col("c")).otherwise(0)).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_ngrams"), 6))
      .transform(Gate.ordered("doc_id"))

  // -- t14: RAG/context chunking with overlap ----------------------------
  // The retrieval-indexing step t07 does NOT cover: t07 packs many docs
  // into fixed windows for pretraining; t14 splits EACH doc into
  // overlapping chunks (window `chunkTokens`, stride `chunkStride`,
  // overlap = window - stride) so a retriever never loses a fact to a
  // chunk boundary. Start rule: starts at stride multiples, last start
  // = ceil((len - window)/stride) — the tail is covered exactly once,
  // never by a pure-suffix chunk. All in-row (sequence → slice, no
  // pre-join explode) and embarrassingly parallel: zero shuffles at any
  // scale beyond the pinned repartition (the single-input-partition
  // trap — AQE sizes by pre-explode bytes). Geometry is conf-driven
  // (spark.graft.chunk.*) like t12's; the oracle mirrors the defaults.
  private[graft] val T14_CHUNK = 32 // GraftConf.chunkTokens default
  private[graft] val T14_STRIDE = 24 // GraftConf.chunkStride default

  def t14(s: SparkSession, d: String): DataFrame = {
    val c = graft.GraftConf.chunkTokens(s)
    val st = graft.GraftConf.chunkStride(s)
    documents(s, d)
      .filter(col("text").isNotNull)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0),
          ((greatest(lit(0), size(col("w")) - c) + lit(st - 1)) / st)
            .cast("int")),
        i => slice(col("w"), i * st + 1, lit(c))))
        .as(Seq("chunk_id", "cw")))
      .select(col("doc_id"), col("chunk_id").cast("bigint").as("chunk_id"),
        (col("chunk_id") * st).cast("bigint").as("tok_start"),
        size(col("cw")).cast("bigint").as("n_tokens"),
        array_join(col("cw"), " ").as("chunk_text"))
      .transform(Gate.ordered("doc_id", "chunk_id"))
  }

  // -- t15: exact-count deterministic stratified sample ------------------
  // The other sampling contract t06 can't give: t06 keeps each doc at a
  // RATE (count is binomial); evaluation extracts and ablation corpora
  // need EXACTLY N per stratum, reproducibly. Rank by the full md5 of
  // the id (content-addressed like t05/t06 — engine/partitioning/rerun
  // invariant, and md5 is injective on distinct ids for all practical
  // purposes, with doc_id as the formal tie-break) and keep rank <= N
  // per language. The rank window sorts each stratum; at 100 TB the
  // production form pre-gates with t06's rate threshold set safely
  // above N/|stratum| (a tiny count aggregate first), so the exact
  // sort ranks ~2N survivors instead of the stratum — same answer,
  // hash-prefix nesting makes the pre-gate provably superset.
  private[graft] val T15_N = 40

  def t15(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("h"), col("doc_id"))
    documents(s, d)
      .select(col("lang"), col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= T15_N)
      .select(col("lang"), col("rk").cast("bigint").as("rk"), col("doc_id"))
      .transform(Gate.ordered("lang", "rk"))
  }

  // -- t22: per-rule quality gate (the Gopher-rules shape) ---------------
  // t02 gives ONE blended score; production filtering pipelines
  // (Gopher/Rae et al. 2021 §A1.1; C4's heuristics) ship a RULE LIST,
  // because the ops question is never "what's the score" but "WHICH
  // rule killed my document" — per-rule pass/fail flags per document,
  // plus the kept verdict (all rules pass). Five rules over the same
  // whitespace tokenizer every t-operator shares: token-count band,
  // mean-word-length band, minimum stopword evidence, lexical-diversity
  // floor (integer-compare form: n_distinct·2 ≥ n_tokens — no double
  // boundary), and a max-word-length cap. One scan, one projection —
  // every rule is codegen'd column arithmetic; the only HOF is the
  // per-doc max-word-length transform over a ≤10²-token array.
  // Thresholds sit inside this corpus's measured ranges so every rule
  // fires both ways at every SF (TextAnalysisSpec pins non-vacuity).
  def t22(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("w"))
      .select(col("doc_id"),
        size(col("w")).as("n_tokens"),
        length(regexp_replace(col("text"), " ", "")).as("n_chars"),
        size(array_distinct(col("w"))).as("n_distinct"),
        stopwordHits("w", stopwords("en")).as("stop_hits"),
        array_max(transform(col("w"), t => length(t))).as("max_word"))
      .select(col("doc_id"),
        (col("n_tokens") >= 20 && col("n_tokens") <= 80)
          .cast("int").as("r_words"),
        (col("n_chars").cast("double") / col("n_tokens") >= 4.0 &&
          col("n_chars").cast("double") / col("n_tokens") < 5.0)
          .cast("int").as("r_meanlen"),
        (col("stop_hits") >= 2).cast("int").as("r_stop"),
        (col("n_distinct") * 2 >= col("n_tokens")).cast("int").as("r_distinct"),
        (col("max_word") <= 7).cast("int").as("r_maxword"))
      .withColumn("n_failed",
        lit(5) - col("r_words") - col("r_meanlen") - col("r_stop") -
          col("r_distinct") - col("r_maxword"))
      .withColumn("keep", (col("n_failed") === 0).cast("int"))
      .transform(Gate.ordered("doc_id"))

  // -- t16: TF-IDF keyword extraction ------------------------------------
  // The per-document salient-term face (search indexing, topic tagging,
  // near-dup EXPLANATION): top-3 tokens by tf·idf. Scale shape mirrors
  // t10: one corpus token scan feeds BOTH the per-(doc, token) tf
  // aggregate and the vocabulary-sized document-frequency table (built
  // FROM the tf frame — one row per (doc, token) — so no second scan,
  // with map-side partials); the idf tag-back is a vocabulary join AQE
  // can split on stop-word skew; the top-3 is a row_number over the
  // per-doc partition. Both engines rank by the ROUNDED score (then
  // token) so float noise below 1e-6 cannot reorder the cut.
  private val T16_K = 3
  def t16(s: SparkSession, d: String): DataFrame =
    t16Core(s, d)

  /** Core with the materialization strategy exposed (c30's convention).
    * The tf frame feeds BOTH the df rollup and the scored join; without
    * the checkpoint each branch re-executes the corpus scan + explode +
    * aggregate (static planning does not reuse the exchange here —
    * measured: 3 corpus scans in the executed plan, 2 from this
    * subtree).
    */
  private[graft] def t16Core(s: SparkSession, d: String,
      cp: graft.Checkpointer = graft.LocalCheckpointer): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    val docs = documents(s, d).filter(col("text").isNotNull)
    val tf = cp(docs
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df_docs"))
    val n = docs.select(count(lit(1)).as("n_docs")) // 1 row — bounded
    tf.join(df, "tok").crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") *
        (log((col("n_docs") + 1).cast("double") /
          (col("df_docs") + 1).cast("double")) + 1.0), 6))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= T16_K)
      .select(col("doc_id"), col("rank"), col("tok"), col("tf"),
        col("df_docs"), col("score"))
      .transform(Gate.ordered("doc_id", "rank"))
  }

  // -- t17: bigram-LM fluency score --------------------------------------
  // The cheap statistical-fluency filter between t02's surface
  // heuristics and a neural perplexity pass: per document, the mean
  // corpus log-probability of its word bigrams, ln c(w1 w2) − ln c(w1 ·)
  // under the corpus's own bigram counts (documents full of never-
  // repeated word sequences — OCR noise, shuffled text — score far
  // below fluent ones). Scale shape: bigrams come from an in-row
  // transform (no explode before the pinned repartition), corpus
  // counts are vocabulary²-bounded aggregates with map-side partials,
  // and both tag-backs are joins AQE can split on skew — never a
  // window over a hot bigram's partition. The first-word total is
  // derived FROM the bigram table (sum over w2), not a second corpus
  // pass. Integer counts throughout; the single double expression at
  // the end is rounded to 6.
  def t17(s: SparkSession, d: String): DataFrame =
    t17Core(s, d)

  /** Core with the materialization strategy exposed (c30's convention).
    * The per-(doc, bigram) multiplicity table tfb is the ONE corpus-
    * derived frame: the bigram LM (cBi, then cW1 from cBi) and the
    * per-doc scoring join both branch from its checkpoint, so the
    * corpus scan + explode runs once. The per-doc mean is the
    * multiplicity-weighted mean — identical to averaging the exploded
    * rows, without carrying them.
    */
  private[graft] def t17Core(s: SparkSession, d: String,
      cp: graft.Checkpointer = graft.LocalCheckpointer): DataFrame = {
    val tfb = cp(documents(s, d)
      .filter(col("text").isNotNull)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(bigramsAll("w")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("m")))
    val cBi = tfb.groupBy(col("bg")).agg(sum(col("m")).as("c_bg"))
    val cW1 = cBi
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .groupBy(col("w1")).agg(sum(col("c_bg")).as("c_w1"))
    tfb.join(cBi, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(cW1, "w1")
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_bigrams"),
        round((sum(col("m") * (log(col("c_bg").cast("double")) -
          log(col("c_w1").cast("double")))) / sum(col("m"))), 6)
          .as("mean_logp"))
      .transform(Gate.ordered("doc_id"))
  }

  // -- t18: source-level quality gating (domain filtering) ---------------
  // The RefinedWeb/C4 move AFTER per-doc scoring: entire SOURCES
  // (domains, crawls, feeds) whose mean document quality falls below a
  // corpus-relative bar are dropped wholesale — a bad OCR batch or spam
  // domain is cheaper to kill at the source level than doc by doc. ONE
  // pass: t02's scoring core (shared formula, source carried through)
  // aggregates per source; the corpus mean derives from the SAME
  // per-source sums via an unpartitioned window over the source-count-
  // sized frame (sources ≪ docs at any scale — this frame is KB).
  // Exact decimal quality sums make both means engine-stable.
  private[graft] val T18_REL_BAR = 0.9

  // bar from spark.graft.sourceQuality.bar (default = T18_REL_BAR,
  // which the recorded oracle mirrors)
  def t18(s: SparkSession, d: String): DataFrame = {
    val bar = graft.GraftConf.sourceQualityBar(s)
    val per = t02Scored(s, d, Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("quality").cast("decimal(18,6)")).as("sum_q"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    per
      .withColumn("mean_quality",
        round(col("sum_q").cast("double") / col("n_docs"), 6))
      .withColumn("corpus_mean",
        round(sum(col("sum_q")).over(all).cast("double") /
          sum(col("n_docs")).over(all), 6))
      .withColumn("keep",
        (col("mean_quality") >= lit(bar) * col("corpus_mean"))
          .cast("int"))
      .select(col("source"), col("n_docs"), col("mean_quality"),
        col("corpus_mean"), col("keep"),
        when(col("keep") === 0, col("n_docs")).otherwise(0L)
          .as("n_docs_dropped"))
      .transform(Gate.ordered("source"))
  }

  // -- t19: Zipf rank-frequency fit (corpus-health report) ---------------
  // Natural text follows Zipf's law (slope ≈ -1 on the log-log
  // rank-frequency line); a corpus whose slope drifts toward 0 is
  // boilerplate-flooded, toward -2 is degenerate/near-empty. One token
  // scan builds the unigram table (t10's shape, map-side combined);
  // the regression runs on the VOCABULARY-sized frame — q37's exact
  // decimal moment-sum discipline over (ln rank, ln freq) rounded to 6
  // so both engines feed identical decimals.
  // The fit runs over the TOP-N ranks (the standard practice — the
  // deep tail is noise for the slope anyway): orderBy.limit plans as
  // TakeOrderedAndProject, so the rank window runs over a BOUNDED
  // frame instead of a single-partition sort of a web-scale
  // vocabulary. Below N tokens (every test SF) the result is
  // identical to the unbounded fit.
  private val T19_TOP = 10000

  def t19(s: SparkSession, d: String): DataFrame = {
    val freq = documents(s, d)
      .filter(col("text").isNotNull)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(T19_TOP)
    val xy = freq
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("tok"))))
      .select(round(log(col("rank").cast("double")), 6).as("x"),
        round(log(col("cnt").cast("double")), 6).as("y"),
        col("cnt"))
    xy.agg(count(lit(1)).as("vocab_size"),
        sum(col("cnt")).as("n_tokens"),
        dsumWide(col("x")).as("sx"), dsumWide(col("x") * col("x")).as("sxx"),
        dsumWide(col("y")).as("sy"), dsumWide(col("x") * col("y")).as("sxy"),
        dsumWide(col("y") * col("y")).as("syy"))
      .select(col("vocab_size"), col("n_tokens"),
        round((col("sxy") - col("sx") * col("sy") / col("vocab_size")) /
          (col("sxx") - col("sx") * col("sx") / col("vocab_size")), 6)
          .as("zipf_slope"),
        round(col("sy") / col("vocab_size") -
          (col("sxy") - col("sx") * col("sy") / col("vocab_size")) /
            (col("sxx") - col("sx") * col("sx") / col("vocab_size")) *
            (col("sx") / col("vocab_size")), 6).as("intercept"),
        round(pow(col("sxy") - col("sx") * col("sy") / col("vocab_size"), 2) /
          ((col("sxx") - col("sx") * col("sx") / col("vocab_size")) *
            (col("syy") - col("sy") * col("sy") / col("vocab_size"))), 6)
          .as("r2"))
  }

  // -- t20: per-document token-entropy (gibberish/repetition filter) -----
  // Shannon entropy of the token distribution: near-uniform docs sit at
  // ln(types); heavy repetition collapses toward 0 — the cheap
  // statistical screen between t02's ratios and t17's bigram LM.
  // H = ln(n) − Σ c·ln(c) / n keeps everything integer until one ln per
  // TYPE (types ≤ vocab per doc); the Σ takes t17's rounded-double
  // route with the decimal rendition pinning partition order out.
  private val T20_FLAG_BELOW = 2.6

  def t20(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("text").isNotNull)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        // NOT dsumWide: its 2-decimal total rounding (sized for 1e10
        // money sums) costs 1e-4 of a per-doc entropy; a per-doc sum is
        // bounded by len·ln(len), so the unrounded 6-decimal sum
        // converts to double exactly at any doc length
        sum((col("c") * log(col("c").cast("double")))
          .cast("decimal(38,6)")).cast("double").as("sclc"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(log(col("n_tokens").cast("double")) -
          col("sclc") / col("n_tokens"), 6).as("entropy"))
      .withColumn("flagged",
        (col("entropy") < T20_FLAG_BELOW).cast("int"))
      .transform(Gate.ordered("doc_id"))

  // -- t21: n-gram novelty score (data-value probe) ----------------------
  // The uniqueness complement of t10's commonness: what share of a
  // doc's distinct 3-gram shingles appears NOWHERE else in the corpus?
  // Templated/mirrored/boilerplate docs collapse toward 0 (every
  // shingle shared), original prose sits high — the "is this document
  // adding anything" triage signal corpus curators run before paying
  // for a dedup pass. Reuses Dedup's ONE shingle definition
  // (shingleIndex — the same rows d02's index is built from), so the
  // novelty gate and the dedup gate can never disagree about what a
  // shingle is. Scale shape: the shingle df aggregate (map-side
  // combined) + one AQE-splittable tag-back join — t10's exact shape
  // one n-gram order up.
  private val T21_FLAG_BELOW = 0.15

  def t21(s: SparkSession, d: String): DataFrame = {
    val sh = Dedup.shingleIndex(s, d)
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    sh.join(df, "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_shingles"), 6))
      .withColumn("templated",
        (col("novelty") < T21_FLAG_BELOW).cast("int"))
      .transform(Gate.ordered("doc_id"))
  }

  // -- t23: per-source distribution drift (PSI + exact-rational chi²) ----
  // Drift monitoring for a multi-source ingest: each source's document-
  // length distribution against the corpus-wide baseline over FIXED
  // width-90 bins (fixed bins, not quantiles, so the score is comparable
  // across runs and needs no global sort). PSI = Σ (p−q)·ln(p/q) — the
  // population-stability score monitoring teams alarm on — plus
  // chi² = Σ (p−q)²/q, the rational-arithmetic companion whose terms
  // involve no transcendental. Laplace-smoothed (+0.5/bin) so empty
  // bins contribute finite terms on both engines.
  //
  // Scale shape: ONE corpus scan reduced map-side to (source, bin)
  // counts — everything downstream is arithmetic on a |sources|×8
  // frame. The bin grid comes from explode(sequence(..)) on the
  // per-source totals (no cross join), the 8-row corpus baseline and
  // the 1-row total ride broadcasts. At 100 TB this is the cheapest
  // possible drift monitor: cost == one pruned scan of (source,
  // n_chars).
  private val T23_BIN_W = 90
  private val T23_NBINS = 8
  private val T23_ALARM = 0.25

  /** The fixed binning — shared with the streaming monitor (st18), so
    * the live and batch scores cannot disagree about what a bin is.
    */
  private[graft] def t23Bin: Column =
    least(floor(col("n_chars") / T23_BIN_W), lit(T23_NBINS - 1)).cast("int")

  /** Drift scores from a (source, bin, cnt) counts frame — the shared
    * tail: t23 feeds it batch counts, st18 feeds it the final state of
    * a complete-mode streaming aggregation over the same binning.
    */
  private[graft] def t23FromCounts(binned: DataFrame): DataFrame = {
    val grid = binned.groupBy(col("source")).agg(sum("cnt").as("n_src"))
      .select(col("source"), col("n_src"),
        explode(sequence(lit(0), lit(T23_NBINS - 1))).as("bin"))
    val corpus = binned.groupBy(col("bin")).agg(sum("cnt").as("ccnt"))
    val total = binned.agg(sum("cnt").as("n_tot"))
    val p = (coalesce(col("cnt"), lit(0L)).cast("double") + lit(0.5)) /
      (col("n_src").cast("double") + lit(0.5 * T23_NBINS))
    val q = (coalesce(col("ccnt"), lit(0L)).cast("double") + lit(0.5)) /
      (col("n_tot").cast("double") + lit(0.5 * T23_NBINS))
    grid
      .join(binned, Seq("source", "bin"), "left")
      .join(corpus, Seq("bin"), "left")
      .crossJoin(total) // 1-row scalar broadcast (allowlisted)
      .select(col("source"), col("n_src"), p.as("p"), q.as("q"))
      .groupBy(col("source"))
      .agg(max(col("n_src")).as("n_docs"),
        // t20's idiom: per-term double math with fixed parenthesization,
        // exact decimal summation, one final 6-decimal rounding
        round(sum(((col("p") - col("q")) * log(col("p") / col("q")))
          .cast("decimal(38,12)")).cast("double"), 6).as("psi"),
        round(sum(((col("p") - col("q")) * (col("p") - col("q")) / col("q"))
          .cast("decimal(38,12)")).cast("double"), 6).as("chi2"))
      .withColumn("drifted", (col("psi") > T23_ALARM).cast("int"))
      .transform(Gate.ordered("source"))
  }

  def t23(s: SparkSession, d: String): DataFrame =
    t23FromCounts(documents(s, d)
      .groupBy(col("source"), t23Bin.as("bin"))
      .agg(count(lit(1)).as("cnt")))

  // -- t24: seeded global training shuffle --------------------------------
  // Epoch reshuffling for training-order assignment: every epoch gets its
  // own pseudo-random but fully DETERMINISTIC global order, a pure
  // function of (epoch, doc_id) — identical across engines, reruns and
  // partitionings, so a resumed training job sees byte-identical batch
  // order. No global sort at 100 TB: the order key's 2-hex-char prefix
  // IS the shard (256 independent shards, the scale knob — raise the
  // prefix width with the corpus), and a document's position is a
  // row_number within its shard only. Global order = (shard, pos):
  // readers stream shards independently; nothing ever range-partitions
  // the corpus. Window parallelism = shard count, skew-free by md5
  // uniformity.
  private val SHUFFLE_EPOCHS = Seq(1, 2)

  private def epochKey(epoch: Int): Column =
    md5(concat(lit(s"e$epoch:"), col("doc_id").cast("string"))
      .cast("binary"))

  def t24(s: SparkSession, d: String): DataFrame = {
    val keyed = documents(s, d).select(
      col("doc_id") +: SHUFFLE_EPOCHS.map(e =>
        epochKey(e).as(s"key_e$e")): _*)
    SHUFFLE_EPOCHS.foldLeft(keyed) { (df, e) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(s"shard_e$e").orderBy(s"key_e$e", "doc_id")
      df.withColumn(s"shard_e$e", substring(col(s"key_e$e"), 1, 2))
        .withColumn(s"pos_e$e", row_number().over(w))
    }.select(col("doc_id") +: SHUFFLE_EPOCHS.flatMap(e =>
      Seq(col(s"shard_e$e"), col(s"pos_e$e"))): _*)
      .transform(Gate.ordered("doc_id"))
  }

  // -- t25: per-domain representation caps ---------------------------------
  // "At most CAP documents per source/domain" — the anti-over-
  // representation rule every web-scale mixture applies (one crawl
  // domain must not dominate the corpus). Selection is deterministic:
  // keep the CAP best documents by (t02 quality DESC, doc_id) — the
  // same rounded-quality formula the t02 gate already proves
  // engine-identical, so the kept SET is engine-identical too. The
  // Spark shape is the declarative rank-filter: Catalyst rewrites
  // row_number()<=CAP into WindowGroupLimit, which computes the
  // per-source top-CAP map-side BEFORE the shuffle — at 100 TB each
  // task forwards at most CAP rows per source it sees, so the shuffle
  // carries O(sources x CAP x tasks), never the corpus, and a skewed
  // mega-domain costs its scan, not a sort. (Spec-asserted: the plan
  // must contain WindowGroupLimit.)
  private[graft] val DOMAIN_CAP = 10

  /** The ranked kept-set core (doc-level), shared by t25 and its spec. */
  private[graft] def t25Kept(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    t02Scored(s, d, Seq("source"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= DOMAIN_CAP)
  }

  def t25(s: SparkSession, d: String): DataFrame = {
    val totals = documents(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"))
    t25Kept(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        round(min(col("quality")), 6).as("min_kept_quality"),
        sum(col("n_tokens")).as("kept_tokens"))
      .join(totals, Seq("source"))
      .select(col("source"), col("n_total"), col("n_kept"),
        (col("n_total") - col("n_kept")).as("n_dropped"),
        col("min_kept_quality"), col("kept_tokens"))
      .transform(Gate.ordered("source"))
  }

  // -- t26: token-budget dataset assembly ----------------------------------
  // Fill each source's slice of a training mixture to a fixed token
  // budget, taking documents in content-addressed sample order (the
  // md5 key: a uniform random draw that is a pure function of doc_id —
  // rerun-stable, refinable, engine-identical) until the budget is
  // crossed; the crossing document is kept (fill-past-once, so a
  // nonzero budget always yields at least one document). The naive
  // form is a per-source ORDER BY cumsum — a sort of the corpus. This
  // implementation never sorts the corpus: the sample key's 2-hex
  // prefix buckets each source 256 ways; bucket-level token sums (a
  // tiny aggregate, 256 rows/source) locate the BOUNDARY bucket via a
  // cumsum over that tiny frame; whole buckets under the boundary are
  // kept with NO window at all, and only the boundary bucket — 1/256th
  // of the source — enters a row-level cumsum. Because the bucket is a
  // PREFIX of the sample key, (bucket, key) order IS key order, and
  // the result is bit-identical to the naive global cumsum (the DuckDB
  // oracle runs the naive form — the gate proves the decomposition
  // exact).
  private[graft] val TOKEN_BUDGET = 600L

  private def sampleKey: Column =
    md5(concat(lit("tb:"), col("doc_id").cast("string")).cast("binary"))

  def t26(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("source"), col("doc_id"),
      size(tokens(col("text"))).cast("bigint").as("n_tokens"),
      sampleKey.as("key"))
      .withColumn("bucket", substring(col("key"), 1, 2))
    // bucket sums: 256 rows per source — driver-trivial at any corpus
    // size; the cumsum window runs on THIS frame, never the corpus
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("bucket")
    val buckets = docs.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_tokens")).as("b_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("b_tokens")).over(
          wb.rowsBetween(Long.MinValue, -1)), lit(0L)))
    // whole buckets strictly under the budget: every doc kept, no sort
    val whole = docs.join(
      buckets.filter(col("cum_before") + col("b_tokens") <= TOKEN_BUDGET)
        .select("source", "bucket"),
      Seq("source", "bucket"), "left_semi")
      .select("source", "doc_id", "n_tokens")
    // the ONE boundary bucket per source: row-level cumsum over
    // 1/256th of the source, offset by the whole-bucket prefix
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("key", "doc_id")
    val boundary = docs.join(
      broadcast(buckets
        .filter(col("cum_before") < TOKEN_BUDGET &&
          col("cum_before") + col("b_tokens") > TOKEN_BUDGET)
        .select(col("source"), col("bucket"), col("cum_before"))),
      Seq("source", "bucket"))
      .withColumn("cum", col("cum_before") + sum(col("n_tokens")).over(wr))
      .filter(col("cum") - col("n_tokens") < TOKEN_BUDGET)
      .select("source", "doc_id", "n_tokens")
    whole.union(boundary)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).as("kept_tokens"))
      .withColumn("budget", lit(TOKEN_BUDGET))
      .withColumn("utilization",
        round(col("kept_tokens").cast("double") / TOKEN_BUDGET, 6))
      .transform(Gate.ordered("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t24_global_shuffle" -> (t24 _),
    "t25_domain_caps" -> (t25 _),
    "t26_token_budget" -> (t26 _),
    "t23_psi_drift" -> (t23 _),
    "t21_ngram_novelty" -> (t21 _),
    "t18_source_quality" -> (t18 _),
    "t19_zipf_fit" -> (t19 _),
    "t20_token_entropy" -> (t20 _),
    "t16_tfidf_keywords" -> (t16 _),
    "t17_bigram_fluency" -> (t17 _),
    "t01_langid" -> (t01 _),
    "t02_quality_score" -> (t02 _),
    "t22_gopher_rules" -> (t22 _),
    "t03_token_stats" -> (t03 _),
    "t04_fingerprint" -> (t04 _),
    "t05_train_split" -> (t05 _),
    "t06_mixture_sample" -> (t06 _),
    "t07_pack_sequences" -> (t07 _),
    "t08_pii_redaction" -> (t08 _),
    "t09_dedup_repeats" -> (t09 _),
    "t10_token_commonness" -> (t10 _),
    "t11_contamination" -> (t11 _),
    "t12_boilerplate_blocks" -> (t12 _),
    "t13_dup_ngram_fraction" -> (t13 _),
    "t14_chunk_overlap" -> (t14 _),
    "t15_stratified_exact" -> (t15 _)
  )

  private def sqlHits(list: Seq[String]) =
    s"len(list_filter(string_split(text, ' '), t -> t IN (${list.map(w => s"'$w'").mkString(", ")})))"

  /** t06's mixture-keep rule as one SQL predicate over (doc_id, lang)
    * — shared by t06's oracle and Pipeline.p04's.
    */
  private[graft] val MIXTURE_COND_SQL: String = MIX_RATES.map { case (l, r) =>
    if (r >= 1.0) s"lang = '$l'"
    else s"(lang = '$l' AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)" +
      s" < '${hex4(r)}')"
  }.mkString("\n   OR ")

  /** The t05 split rule as a SQL expression over a doc_id column — ONE
    * definition shared by every oracle that partitions by split (t05,
    * t11, Pipeline.p01), so the rule cannot silently fork.
    */
  private[graft] val SPLIT_CASE_SQL =
    """CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
      |   THEN 'train'
      |  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
      |   THEN 'val'
      |  ELSE 'test' END""".stripMargin

  /** t11's contamination pipeline as shared oracle CTEs (`sh` shingles,
    * `sp` splits, `ci` df-capped index, `m` contaminated (eval, train)
    * matches) — t11's and Pipeline.p05's oracles both splice THIS
    * (the dischargeVerdicts pattern: one definition, two faces).
    */
  private[graft] lazy val CONTAM_CTES: String =
    s"""sh AS (
       | SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |   AS shingle
       | FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |  LATERAL (SELECT unnest(range(1, greatest(len(w) - 1, 1))) AS i) r),
       |sp AS (SELECT doc_id,
       |  $SPLIT_CASE_SQL AS split FROM documents),
       |ci AS (SELECT sh.doc_id, shingle, split FROM sh JOIN sp USING (doc_id)
       | WHERE shingle NOT IN (
       |  SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) > $CONTAM_DF_CAP)),
       |m AS (
       | SELECT e.doc_id, e.split, t.doc_id AS train_id, COUNT(*) AS shared
       | FROM ci e JOIN ci t ON e.shingle = t.shingle
       |  AND t.split = 'train' AND e.split <> 'train'
       | GROUP BY 1, 2, 3 HAVING COUNT(*) >= $CONTAM_MIN_SHARED)""".stripMargin

  /** t02's per-document scoring as a reusable subquery
    * (doc_id, n_tokens, distinct_ratio, stop_ratio, quality).
    */
  private[graft] val T02_SCORED_SQL =
    s"""(SELECT doc_id, n_tokens,
       |  ROUND(distinct_ratio, 6) AS distinct_ratio,
       |  ROUND(stop_ratio, 6) AS stop_ratio,
       |  ROUND(least(1.0, n_tokens / 100.0) * (0.5 + 0.5 * distinct_ratio)
       |   * (1.0 - 0.2 * stop_ratio), 6) AS quality
       | FROM (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |   CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio,
       |   CAST(${sqlHits(stopwords("en"))} AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio
       |  FROM documents))""".stripMargin

  val oracle: Map[String, String] = Map(
    // the identical fixed bins, Laplace smoothing, per-term double math
    // and exact decimal summation; cast-to-double BEFORE the 6-decimal
    // rounding on both engines (the c41 ordering)
    "t23_psi_drift" ->
      s"""WITH b AS (SELECT source,
         |  CAST(least(floor(n_chars / $T23_BIN_W), ${T23_NBINS - 1}) AS INT)
         |   AS bin, COUNT(*) AS cnt
         | FROM documents GROUP BY 1, 2),
         |g AS (SELECT source, n_src, r.bin FROM
         |  (SELECT source, SUM(cnt) AS n_src FROM b GROUP BY 1) s,
         |  LATERAL (SELECT unnest(range(0, $T23_NBINS)) AS bin) r),
         |c AS (SELECT bin, SUM(cnt) AS ccnt FROM b GROUP BY 1),
         |t AS (SELECT SUM(cnt) AS n_tot FROM b),
         |terms AS (SELECT g.source, g.n_src,
         |  (CAST(COALESCE(b.cnt, 0) AS DOUBLE) + 0.5)
         |    / (CAST(g.n_src AS DOUBLE) + ${0.5 * T23_NBINS}) AS p,
         |  (CAST(COALESCE(c.ccnt, 0) AS DOUBLE) + 0.5)
         |    / (CAST(t.n_tot AS DOUBLE) + ${0.5 * T23_NBINS}) AS q
         | FROM g LEFT JOIN b ON g.source = b.source AND g.bin = b.bin
         |  LEFT JOIN c ON g.bin = c.bin CROSS JOIN t)
         |SELECT source, n_docs, psi, chi2,
         | CAST(psi > $T23_ALARM AS INT) AS drifted
         |FROM (
         | SELECT source, CAST(MAX(n_src) AS BIGINT) AS n_docs,
         |  ROUND(CAST(SUM(CAST((p - q) * ln(p / q) AS DECIMAL(38,12)))
         |   AS DOUBLE), 6) AS psi,
         |  ROUND(CAST(SUM(CAST((p - q) * (p - q) / q AS DECIMAL(38,12)))
         |   AS DOUBLE), 6) AS chi2
         | FROM terms GROUP BY source)
         |ORDER BY source""".stripMargin,
    // Dedup's shared shingle CTE verbatim — one shingle definition
    "t21_ngram_novelty" ->
      s"""WITH ${graft.operators.Dedup.SQL_SHINGLES},
         |df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1)
         |SELECT doc_id, COUNT(*) AS n_shingles,
         | CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_unique,
         | ROUND(CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |  / COUNT(*), 6) AS novelty,
         | CAST(ROUND(CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END)
         |   AS DOUBLE) / COUNT(*), 6) < $T21_FLAG_BELOW AS INT)
         |  AS templated
         |FROM sh JOIN df USING (shingle)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the same t02 scoring subquery, source tagged back by doc_id;
    // decimal quality sums make both means exact
    "t18_source_quality" ->
      s"""WITH sc AS (SELECT t.doc_id, t.quality, d.source
         |  FROM $T02_SCORED_SQL t JOIN documents d USING (doc_id)),
         |per AS (SELECT source, COUNT(*) AS n_docs,
         |  SUM(CAST(quality AS DECIMAL(18,6))) AS sum_q FROM sc GROUP BY 1),
         |tot AS (SELECT SUM(sum_q) AS sq,
         |  CAST(SUM(n_docs) AS BIGINT) AS nd FROM per)
         |SELECT source, n_docs, mean_quality, corpus_mean, keep,
         | CASE WHEN keep = 0 THEN n_docs ELSE 0 END AS n_docs_dropped
         |FROM (
         | SELECT source, n_docs,
         |  ROUND(CAST(sum_q AS DOUBLE) / n_docs, 6) AS mean_quality,
         |  ROUND(CAST(sq AS DOUBLE) / nd, 6) AS corpus_mean,
         |  CAST(ROUND(CAST(sum_q AS DOUBLE) / n_docs, 6) >=
         |   $T18_REL_BAR * ROUND(CAST(sq AS DOUBLE) / nd, 6) AS INT) AS keep
         | FROM per CROSS JOIN tot)
         |ORDER BY source""".stripMargin,
    // q37's moment-sum discipline over (ln rank, ln freq) rounded to 6
    // before the decimal rendition — identical inputs on both engines
    "t19_zipf_fit" ->
      s"""WITH freq AS (SELECT tok, COUNT(*) AS cnt FROM (
         |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
         |  WHERE text IS NOT NULL) GROUP BY 1),
         |xy AS (SELECT ROUND(ln(CAST(rank AS DOUBLE)), 6) AS x,
         |  ROUND(ln(CAST(cnt AS DOUBLE)), 6) AS y, cnt
         | FROM (SELECT tok, cnt, ROW_NUMBER() OVER (
         |   ORDER BY cnt DESC, tok) AS rank FROM (
         |  SELECT * FROM freq ORDER BY cnt DESC, tok LIMIT $T19_TOP))),
         |m AS (SELECT COUNT(*) AS vocab_size,
         |  CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         |  ${graft.Det.sqlDsumWide("x")} AS sx,
         |  ${graft.Det.sqlDsumWide("x * x")} AS sxx,
         |  ${graft.Det.sqlDsumWide("y")} AS sy,
         |  ${graft.Det.sqlDsumWide("x * y")} AS sxy,
         |  ${graft.Det.sqlDsumWide("y * y")} AS syy FROM xy)
         |SELECT vocab_size, n_tokens,
         | ROUND((sxy - sx * sy / vocab_size) /
         |  (sxx - sx * sx / vocab_size), 6) AS zipf_slope,
         | ROUND(sy / vocab_size - (sxy - sx * sy / vocab_size) /
         |  (sxx - sx * sx / vocab_size) * (sx / vocab_size), 6)
         |  AS intercept,
         | ROUND(POW(sxy - sx * sy / vocab_size, 2) /
         |  ((sxx - sx * sx / vocab_size) *
         |   (syy - sy * sy / vocab_size)), 6) AS r2
         |FROM m""".stripMargin,
    // integer counts until one ln per type; the decimal rendition of
    // c·ln(c) pins partition order out of the per-doc sum
    "t20_token_entropy" ->
      s"""WITH cn AS (SELECT doc_id, tok, COUNT(*) AS c FROM (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents WHERE text IS NOT NULL) GROUP BY 1, 2),
         |e AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |  COUNT(*) AS n_types,
         |  CAST(SUM(CAST(c * ln(CAST(c AS DOUBLE)) AS DECIMAL(38,6)))
         |   AS DOUBLE) AS sclc
         | FROM cn GROUP BY 1)
         |SELECT doc_id, n_tokens, n_types, entropy,
         | CAST(entropy < $T20_FLAG_BELOW AS INT) AS flagged
         |FROM (SELECT doc_id, n_tokens, n_types,
         |  ROUND(ln(CAST(n_tokens AS DOUBLE)) - sclc / n_tokens, 6)
         |   AS entropy FROM e)
         |ORDER BY doc_id""".stripMargin,
    // both engines rank by the ROUNDED score then token, so a <1e-6
    // ln() ulp difference cannot reorder the top-3 cut
    "t16_tfidf_keywords" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |df AS (SELECT tok, COUNT(*) AS df_docs FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents
         |  WHERE text IS NOT NULL),
         |scored AS (
         | SELECT doc_id, tok, tf, df_docs,
         |  ROUND(tf * (ln(CAST(n_docs + 1 AS DOUBLE)
         |    / CAST(df_docs + 1 AS DOUBLE)) + 1.0), 6) AS score
         | FROM tf JOIN df USING (tok) CROSS JOIN n)
         |SELECT doc_id, rank, tok, tf, df_docs, score FROM (
         | SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |   ORDER BY score DESC, tok) AS rank
         | FROM scored)
         |WHERE rank <= $T16_K ORDER BY doc_id, rank""".stripMargin,
    // 1-based bigram positions 1..len-1; c_w1 derived from the bigram
    // table exactly as the Spark side does; HUGEINT discipline on SUM
    "t17_bigram_fluency" ->
      """WITH bi AS (
        | SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
        | FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |        WHERE text IS NOT NULL),
        |  LATERAL (SELECT unnest(range(1, greatest(len(w), 1))) AS i) r),
        |cb AS (SELECT bg, COUNT(*) AS c_bg FROM bi GROUP BY 1),
        |cw AS (SELECT string_split(bg, ' ')[1] AS w1,
        |  CAST(SUM(c_bg) AS BIGINT) AS c_w1 FROM cb GROUP BY 1)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        | ROUND(AVG(ln(CAST(c_bg AS DOUBLE)) - ln(CAST(c_w1 AS DOUBLE))), 6)
        |  AS mean_logp
        |FROM bi JOIN cb USING (bg)
        |JOIN cw ON string_split(bg, ' ')[1] = cw.w1
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same start rule (non-negative ceil-div keeps // and Spark's
    // truncating int division identical), 1-based inclusive slice
    // mirrors Spark's `slice`; defaults mirror spark.graft.chunk.*
    "t14_chunk_overlap" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w
         | FROM documents WHERE text IS NOT NULL),
         |ch AS (SELECT doc_id, i AS chunk_id,
         |  w[i * $T14_STRIDE + 1 : i * $T14_STRIDE + $T14_CHUNK] AS cw
         | FROM tk, LATERAL (SELECT unnest(range(0,
         |  (greatest(0, len(w) - $T14_CHUNK) + ${T14_STRIDE - 1})
         |   // $T14_STRIDE + 1)) AS i) r)
         |SELECT doc_id, chunk_id, chunk_id * $T14_STRIDE AS tok_start,
         | len(cw) AS n_tokens, array_to_string(cw, ' ') AS chunk_text
         |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,
    // identical content-addressed rank: md5 over the id string, doc_id
    // tie-break (t05's md5 equivalence pattern)
    "t15_stratified_exact" ->
      s"""SELECT lang, rk, doc_id FROM (
         | SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang
         |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         | FROM documents) WHERE rk <= $T15_N ORDER BY lang, rk""".stripMargin,
    // ALL 3-gram occurrences (no DISTINCT — multiplicity IS the
    // signal); docs under 3 tokens drop from both sides identically
    "t13_dup_ngram_fraction" ->
      """WITH g AS (
        | SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        | FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |        WHERE text IS NOT NULL),
        |  LATERAL (SELECT unnest(range(1, greatest(len(w) - 1, 1))) AS i) r),
        |c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_ngrams,
        | CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup,
        | ROUND(CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE)
        |  / CAST(SUM(c) AS DOUBLE), 6) AS dup_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // identical blocking (1-based list slice mirrors Spark's `slice`),
    // df over DISTINCT docs, ordered string_agg reassembly; COALESCE
    // keeps an all-boilerplate doc as '' the way concat_ws does
    "t12_boilerplate_blocks" ->
      s"""WITH tk AS (
         | SELECT doc_id, string_split(text, ' ') AS w FROM documents
         | WHERE text IS NOT NULL),
         |blk AS (
         | SELECT doc_id, bi, array_to_string(
         |   w[bi * $T12_BLOCK + 1 : (bi + 1) * $T12_BLOCK], ' ') AS blk
         | FROM tk, LATERAL (SELECT unnest(range(0,
         |   (len(w) - 1) // $T12_BLOCK + 1)) AS bi) r),
         |df AS (SELECT blk AS b, COUNT(DISTINCT doc_id) AS df
         | FROM blk GROUP BY 1)
         |SELECT doc_id, COUNT(*) AS n_blocks,
         | COUNT(CASE WHEN df >= $T12_DF THEN 1 END) AS n_removed,
         | COALESCE(string_agg(blk, ' ' ORDER BY bi)
         |   FILTER (WHERE df < $T12_DF), '') AS clean_text
         |FROM blk JOIN df ON b = blk
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // exact-string shingles on the oracle side (the engine joins on
    // xxhash64 — the d02 collision caveat); same split CASE as t05
    "t11_contamination" ->
      s"""WITH $CONTAM_CTES
         |SELECT doc_id, split, COUNT(DISTINCT train_id) AS n_contaminating,
         | CAST(MAX(shared) AS BIGINT) AS max_shared
         |FROM m GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,
    // HUGEINT discipline: SUM -> BIGINT cast; the division mirrors
    // Spark's cast-to-double-then-divide exactly
    "t10_token_commonness" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |freq AS (SELECT tok, COUNT(*) AS tok_n FROM toks GROUP BY tok)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        | CAST(SUM(tok_n) AS BIGINT) AS sum_freq,
        | CAST(SUM(tok_n) AS DOUBLE) / COUNT(*) AS avg_tok_freq
        |FROM toks JOIN freq USING (tok)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "t09_dedup_repeats" ->
      """SELECT doc_id, len(toks) AS n_before, len(cleaned) AS n_after,
        | array_to_string(cleaned, ' ') AS cleaned
        |FROM (
        | SELECT doc_id, toks,
        |  list_filter(toks, (x, i) -> i = 1 OR x != toks[i - 1]) AS cleaned
        | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |        WHERE text IS NOT NULL))
        |ORDER BY doc_id""".stripMargin,
    "t08_pii_redaction" ->
      s"""SELECT doc_id,
         | len(regexp_extract_all(pii_text, '$EMAIL_RE')) AS n_emails,
         | len(regexp_extract_all(pii_text, '$PHONE_RE')) AS n_phones,
         | regexp_replace(
         |   regexp_replace(pii_text, '$EMAIL_RE', '[EMAIL]', 'g'),
         |   '$PHONE_RE', '[PHONE]', 'g') AS redacted
         |FROM (SELECT doc_id,
         |  text || ' Contact user' || CAST(doc_id AS VARCHAR)
         |   || '@example.com or +1-555-' || d4
         |   || ' or (555) 014-' || d4
         |   || ' or 555-' || d3 || '-0' || d3
         |   || ' or +44 20 7946 ' || d4
         |   || ' or 555.' || d3 || '.9' || d3 AS pii_text
         | FROM (SELECT doc_id, text,
         |   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS d4,
         |   lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') AS d3
         |  FROM documents))
         |ORDER BY doc_id""".stripMargin,
    "t01_langid" -> {
      val scores = LANGS.map(l => s"${sqlHits(stopwords(l))} AS score_$l").mkString(",\n ")
      val best = s"greatest(${LANGS.map(l => s"score_$l").mkString(", ")})"
      val pred = LANGS.map(l => s"WHEN score_$l = $best AND $best > 0 THEN '$l'")
        .mkString("CASE ", " ", " ELSE 'und' END")
      s"""SELECT doc_id, score_en, score_de, score_fr, score_es, score_zh,
         | $pred AS lang_pred
         |FROM (SELECT doc_id, $scores FROM documents)
         |ORDER BY doc_id""".stripMargin
    },
    "t02_quality_score" ->
      s"""SELECT doc_id, n_tokens, distinct_ratio, stop_ratio, quality
         |FROM $T02_SCORED_SQL
         |ORDER BY doc_id""".stripMargin,
    // every rule re-derived over the same split-on-space tokenizer;
    // the diversity rule is the integer-compare form on both engines
    "t22_gopher_rules" ->
      s"""WITH f AS (
         | SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         |  length(replace(text, ' ', '')) AS n_chars,
         |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
         |  ${sqlHits(stopwords("en"))} AS stop_hits,
         |  list_max(list_transform(string_split(text, ' '),
         |    t -> length(t))) AS max_word
         | FROM documents),
         |r AS (
         | SELECT doc_id,
         |  CAST(n_tokens >= 20 AND n_tokens <= 80 AS INTEGER) AS r_words,
         |  CAST(CAST(n_chars AS DOUBLE) / n_tokens >= 4.0
         |   AND CAST(n_chars AS DOUBLE) / n_tokens < 5.0 AS INTEGER)
         |   AS r_meanlen,
         |  CAST(stop_hits >= 2 AS INTEGER) AS r_stop,
         |  CAST(n_distinct * 2 >= n_tokens AS INTEGER) AS r_distinct,
         |  CAST(max_word <= 7 AS INTEGER) AS r_maxword
         | FROM f)
         |SELECT doc_id, r_words, r_meanlen, r_stop, r_distinct, r_maxword,
         | 5 - r_words - r_meanlen - r_stop - r_distinct - r_maxword
         |  AS n_failed,
         | CAST(r_words + r_meanlen + r_stop + r_distinct + r_maxword = 5
         |  AS INTEGER) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "t03_token_stats" ->
      """SELECT doc_id,
        | len(string_split(text, ' ')) AS n_tokens,
        | len(list_distinct(string_split(text, ' '))) AS n_distinct,
        | len(regexp_extract_all(text, '[bcdfghjklmnpqrstvwxyz]+|[aeiou]+'))
        |  AS n_subtokens,
        | length(replace(text, ' ', '')) AS n_chars_nospace
        |FROM documents ORDER BY doc_id""".stripMargin,
    // HUGEINT discipline: DuckDB's windowed SUM and // yield HUGEINT;
    // cast every derived integer back to BIGINT (c09 lesson)
    "t07_pack_sequences" ->
      s"""SELECT shard, CAST((cum - n_tokens) // $PACK_TOKENS AS BIGINT)
         |  AS seq_id,
         | COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
         |FROM (
         | SELECT doc_id % $PACK_SHARDS AS shard,
         |  len(string_split(text, ' ')) AS n_tokens,
         |  SUM(len(string_split(text, ' '))) OVER (
         |   PARTITION BY doc_id % $PACK_SHARDS ORDER BY doc_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         | FROM documents)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t06_mixture_sample" ->
      s"""SELECT lang, COUNT(*) AS n_total,
         | COUNT(CASE WHEN $MIXTURE_COND_SQL THEN 1 END) AS n_sampled
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical md5-hex thresholding in DuckDB -> identical split
    "t05_train_split" ->
      s"""SELECT split, COUNT(*) AS n_docs,
         | CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
         | COUNT(DISTINCT lang) AS n_langs
         |FROM (SELECT *, $SPLIT_CASE_SQL AS split
         | FROM documents)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the same md5 epoch keys -> the same shards and in-shard ranks
    "t24_global_shuffle" ->
      """WITH k AS (SELECT doc_id,
        |  md5('e1:' || CAST(doc_id AS VARCHAR)) AS key_e1,
        |  md5('e2:' || CAST(doc_id AS VARCHAR)) AS key_e2
        | FROM documents)
        |SELECT doc_id,
        | substring(key_e1, 1, 2) AS shard_e1,
        | CAST(row_number() OVER (PARTITION BY substring(key_e1, 1, 2)
        |   ORDER BY key_e1, doc_id) AS INTEGER) AS pos_e1,
        | substring(key_e2, 1, 2) AS shard_e2,
        | CAST(row_number() OVER (PARTITION BY substring(key_e2, 1, 2)
        |   ORDER BY key_e2, doc_id) AS INTEGER) AS pos_e2
        |FROM k ORDER BY doc_id""".stripMargin,
    // the naive rank form of the cap - the WindowGroupLimit plan must
    // select the identical per-source top-CAP set
    "t25_domain_caps" ->
      s"""WITH s AS (SELECT t.*, d.source
         |  FROM $T02_SCORED_SQL t JOIN documents d USING (doc_id)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY source
         |  ORDER BY quality DESC, doc_id) AS rn FROM s)
         |SELECT source, COUNT(*) AS n_total,
         | COUNT(CASE WHEN rn <= $DOMAIN_CAP THEN 1 END) AS n_kept,
         | COUNT(*) - COUNT(CASE WHEN rn <= $DOMAIN_CAP THEN 1 END)
         |  AS n_dropped,
         | ROUND(MIN(CASE WHEN rn <= $DOMAIN_CAP THEN quality END), 6)
         |  AS min_kept_quality,
         | CAST(SUM(CASE WHEN rn <= $DOMAIN_CAP THEN n_tokens END) AS BIGINT)
         |  AS kept_tokens
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // the naive global-cumsum form - the oracle proving the bucketed
    // two-level fill exact (bucket = key prefix, so (bucket, key) order
    // IS key order)
    "t26_token_budget" ->
      s"""WITH d AS (SELECT source, doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  md5('tb:' || CAST(doc_id AS VARCHAR)) AS key
         | FROM documents),
         |c AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY source
         |  ORDER BY key, doc_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         | FROM d)
         |SELECT source, COUNT(*) AS n_kept,
         | CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
         | CAST($TOKEN_BUDGET AS BIGINT) AS budget,
         | ROUND(CAST(SUM(n_tokens) AS DOUBLE) / $TOKEN_BUDGET, 6)
         |  AS utilization
         |FROM c WHERE cum - n_tokens < $TOKEN_BUDGET
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
