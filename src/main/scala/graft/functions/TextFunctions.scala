package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the large-scale training-data pipeline
  * operators (BASELINE.json north star): tokenization, shingling, language
  * ID, quality scoring, fingerprinting. All pure Column expressions —
  * codegen'd, no UDFs, safe inside whole-stage codegen at 100TB.
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), w => length(w) > 0)

  /** Word n-gram shingles joined by single spaces; a doc shorter than n
    * words yields one shingle of the whole doc. */
  def shingles(c: Column, n: Int): Column = {
    val ws = tokens(c)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n), i => array_join(slice(ws, i + lit(1), lit(n)), " ")))
      .otherwise(array(array_join(ws, " ")))
  }

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: alternating alnum / non-alnum runs. */
  def subwordCount(c: Column): Column =
    size(filter(split(lower(c), "(?<=[a-z0-9])(?=[^a-z0-9])|(?<=[^a-z0-9])(?=[a-z0-9])"),
      t => length(trim(t)) > 0))

  private[graft] val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "für", "auf", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pour", "dans", "un", "une", "sur"),
    "es" -> Seq("el", "los", "las", "y", "es", "para", "en", "un", "una", "con"))

  def stopwordCount(c: Column, lang: String = "en"): Column =
    size(filter(tokens(c), w => w.isin(stopwords(lang): _*)))

  /** n-gram-heuristic language ID: stopword-hit argmax over known languages,
    * CJK-codepoint override for zh, 'und' when nothing matches. */
  def langId(c: Column): Column = {
    val ws = tokens(c)
    val ordered = stopwords.toSeq.sortBy(_._1)
    val scored = array(ordered.zipWithIndex.map { case ((lang, stops), i) =>
      struct(
        size(filter(ws, w => w.isin(stops: _*))).as("s"),
        lit(ordered.size - i).as("prio"), // deterministic tie-break: earlier lang wins
        lit(lang).as("lang"))
    }: _*)
    val top = array_max(scored)
    when(c.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(top.getField("s") > 0, top.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Punctuation character count (fixed class, replace-all semantics). */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,!?;:]", ""))

  /** Composite quality score in [0,1]: length saturation + stopword density
    * + punctuation penalty (the reference-style length/punct/stopword ratio
    * heuristics, deterministic and oracle-expressible). */
  def qualityScore(c: Column, nCharsCol: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val lenScore = least(nCharsCol.cast("double") / lit(500.0), lit(1.0))
    val stopRatio = stopwordCount(c).cast("double") / greatest(nTok, lit(1.0))
    val punctRatio = punctCount(c).cast("double") / greatest(length(c).cast("double"), lit(1.0))
    round(lit(0.5) * lenScore + lit(0.4) * least(stopRatio * 3, lit(1.0))
      + lit(0.1) * (lit(1.0) - least(punctRatio * 10, lit(1.0))), 6)
  }

  /** Order-sensitive 64-bit document fingerprint: rolling xxhash64 chain over
    * the token stream (acc' = xxhash64(acc, token) — one pass via aggregate,
    * codegen'd, overflow-free under ANSI mode). Reordered tokens change the
    * fingerprint; use for exact-order dedup. */
  def fingerprint(c: Column): Column =
    aggregate(tokens(c), lit(1469598103934665603L), (acc, w) => xxhash64(acc, w))
}
