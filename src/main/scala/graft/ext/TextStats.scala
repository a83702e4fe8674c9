package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token counting, quality
  * scoring, language identification, and document fingerprinting.
  *
  * Everything is built from codegen'd string/regex built-ins — one pass over
  * the text column, no shuffle until the optional per-language aggregation.
  * Each heuristic is deliberately simple and EXACTLY mirrored by a DuckDB
  * oracle SQL (the point at 100 TB is deterministic, cheap, vectorizable
  * scoring — model-based scoring would sit behind the same column API).
  */
object TextStats {

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: word chunks of <= 4 chars — a deterministic
    * stand-in for tokenizer budget estimation (ceil(len/4) per word). */
  def subwordCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(aggregate(
        split(trim(text), "\\s+"),
        lit(0),
        (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("int")))

  /** REAL subword tokenization: the greedy BPE merge loop over the pinned
    * merge table (graft.functions.BpeVocab), one compiled pass per row.
    * This is what shard packing (x18) and context-window chunking (x29)
    * budget with — whitespace words under-count what a subword tokenizer
    * actually produces, and a budget is only as real as its token counts. */
  def bpeTokens(text: Column): Column =
    graft.functions.BpeTokenizer.bpe_tokens(text)

  /** Subword count of [[bpeTokens]]; empty/blank text counts 0. */
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Per-doc top-k salient terms (keyword extraction): score =
    * tf / (df + 1) — term frequency penalized by corpus document frequency.
    * Deliberately division-only (no ln as in classic tf-idf): tf and df are
    * exact integers and a single IEEE division produces identical bits on
    * any engine, so the ranking is oracle-comparable; ln differs in ulps
    * across libm implementations and could flip ranks at ties.
    *
    * Scale: one shuffle for tf, one term-partitioned window for df, one
    * per-doc rank — three exchanges flat, NO join. (The earlier
    * formulation aggregated df separately and joined it back: a fourth
    * exchange pair at any scale where the term table outgrows broadcast,
    * and a recompute of the tf side. The window computes the same count on
    * rows that must be term-clustered anyway.) Ties resolve
    * (salience desc, term asc). */
  def topTerms(docs: DataFrame, k: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tok = graft.ops.Par.fanOut(docs)
      .select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), " ")).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("salience").desc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(wTerm))
      .withColumn("salience",
        col("tf").cast("double") / (col("df") + lit(1)).cast("double"))
      .withColumn("rank", row_number().over(wDoc).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "salience", "rank")
  }

  /** Simple quality features (ratios in [0,1]). */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_chars_actual", length(t))
      .withColumn("token_count", tokenCount(t))
      .withColumn("avg_token_len",
        when(tokenCount(t) === 0, 0.0)
          .otherwise(length(regexp_replace(trim(t), "\\s+", "")).cast("double") / tokenCount(t)))
      .withColumn("stopword_ratio",
        when(tokenCount(t) === 0, 0.0)
          .otherwise(size(expr(
            s"filter(split(trim($textCol), '\\\\s+'), w -> w IN ('the','a','and','of','to','in'))"))
            .cast("double") / tokenCount(t)))
      .withColumn("digit_ratio",
        when(length(t) === 0, 0.0)
          .otherwise(regexp_count(t, lit("[0-9]")).cast("double") / length(t)))
  }

  /** Quality score + keep flag with ordered overrides (the F1 masked-
    * assignment pattern applied to curation): score from features, then
    * unconditional drops for degenerate docs. */
  def qualityScore(docs: DataFrame, textCol: String = "text",
      minTokens: Int = 10, maxAvgTokenLen: Double = 12.0): DataFrame =
    qualityFeatures(docs, textCol)
      .withColumn("quality_score",
        (least(col("token_count").cast("double") / 100.0, lit(1.0)) * 0.4
          + (lit(1.0) - col("digit_ratio")) * 0.3
          + least(col("stopword_ratio") * lit(5.0), lit(1.0)) * 0.3))
      .withColumn("keep",
        when(col("token_count") < minTokens, 0)
          .when(col("avg_token_len") > maxAvgTokenLen, 0)
          .when(col("quality_score") >= 0.5, 1)
          .otherwise(0))

  /** PII scrubbing: replace email addresses, IPv4 literals, and long digit
    * runs (phone/account-number shaped) with typed placeholder tokens, and
    * count each class. One compiled regex pass per class per row — no
    * shuffle, no UDF; RE2-compatible patterns so external engines (and the
    * DuckDB oracle) replay the rewrite byte for byte. Order matters and is
    * fixed: emails first (they contain digits and dots), then IPv4, then
    * bare digit runs — each later pass sees the earlier pass's output. */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
    val longNum = "\\b\\d{7,}\\b"
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, email, "<EMAIL>")
    val t2 = regexp_replace(t1, ipv4, "<IP>")
    val t3 = regexp_replace(t2, longNum, "<NUM>")
    docs
      .withColumn("n_emails", regexp_count(t0, lit(email)))
      .withColumn("n_ips", regexp_count(t1, lit(ipv4)))
      .withColumn("n_longnums", regexp_count(t2, lit(longNum)))
      .withColumn("text_redacted", t3)
  }

  /** Language-ID by stopword markers — a deterministic n-gram/stopword
    * heuristic with a fixed precedence order (zh by CJK presence first, then
    * the marker-count argmax, ties broken by the fixed language order). */
  def langId(text: Column): Column = {
    def hits(markers: String): Column = regexp_count(lower(text), lit(s"\\b($markers)\\b"))
    val en = hits("the|and|of|to|a")
    val de = hits("der|die|und|das|ist")
    val es = hits("el|la|los|que|es")
    val fr = hits("le|les|et|une|est")
    val zh = regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]"))
    when(zh > 0, "zh")
      .when(en >= de && en >= es && en >= fr && en > 0, "en")
      .when(de >= es && de >= fr && de > 0, "de")
      .when(es >= fr && es > 0, "es")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Document fingerprints: md5 of whitespace-normalized text (exact-dup
    * key robust to spacing) + the minimum shingle digest (a 1-hash MinHash —
    * cheap containment fingerprint). */
  def fingerprints(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("_sh", Dedup.shingles(textCol))
      .select(
        col(idCol),
        md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")).as("norm_fp"),
        expr("array_min(transform(_sh, s -> md5(s)))").as("min_shingle_fp"))

  /** Winnowing fingerprint sets (rolling k-gram hashes, window minima) —
    * documents sharing any long-enough substring share fingerprints; overlap
    * ratio is a containment signal. One compiled pass per row. */
  def winnowingFingerprints(docs: DataFrame, k: Int = 8, window: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      graft.functions.HashFunctions.winnowing_fp(col(textCol), k, window).as("fingerprints"))
}
