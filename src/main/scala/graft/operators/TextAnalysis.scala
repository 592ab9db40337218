package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for LLM data pipelines: language ID, quality scoring,
  * token counting. All pure codegen'd column expressions (no UDFs), so
  * they ride inside whole-stage codegen over 100 TB scans, and all
  * have exact SQL mirrors for the DuckDB oracle (deterministic
  * marker-word / ratio heuristics — no floating-point model).
  */
object TextAnalysis {
  /** Marker stopwords per language for the n-gram/lexicon heuristic. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "los", "una"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une"))

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct-marker-hit score for one language. */
  def langScore(text: Column, lang: String): Column = {
    val m = markers.toMap.apply(lang)
    size(array_intersect(array_distinct(tokens(lower(text))),
      array(m.map(lit): _*)))
  }

  /** Highest-scoring language, ties broken alphabetically; no marker
    * hits at all -> 'und'. */
  def langId(text: Column): Column = {
    val scored = markers.map { case (l, _) => (l, langScore(text, l)) }
    val best = greatest(scored.map(_._2): _*)
    // first (alphabetically) language reaching the max score
    scored.sortBy(_._1).foldRight(lit("und")) { case ((l, s), acc) =>
      when(best > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  private val PUNCT = "[.,!?;:]"
  val stopwords: Seq[String] =
    Seq("the", "and", "of", "is", "to", "in", "a", "that", "it", "for")

  /** Adds deterministic quality metrics + a composite score. */
  def withQualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nChars = length(t).cast("double")
    val nToks = size(toks).cast("double")
    val punct = (length(t) - length(regexp_replace(t, PUNCT, ""))).cast("double")
    val upper = (length(t) - length(regexp_replace(t, "[A-Z]", ""))).cast("double")
    val stops = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*))).cast("double")
    df.withColumn("n_tokens", size(toks))
      .withColumn("punct_ratio", punct / nChars)
      .withColumn("upper_ratio", upper / nChars)
      .withColumn("stopword_hits", stops.cast("int"))
      .withColumn("avg_token_len", (nChars - (nToks - 1)) / nToks)
      .withColumn("quality_score",
        least(nToks / 100.0, lit(1.0)) * 0.5 +
          least(stops / 5.0, lit(1.0)) * 0.3 +
          when(punct / nChars < 0.1, 0.2).otherwise(0.0))
  }

  /** Token count under a BPE-ish regex (letter runs / digit runs /
    * single non-space symbols) alongside the whitespace count. */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("ws_tokens", size(tokens(t)))
      .withColumn("bpe_ish_tokens",
        size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))))
  }
}
