package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality operators for the training-data pipeline: token counts,
  * quality scoring, language stats. All arithmetic is int-ratio → double
  * (deterministic, oracle-reproducible); everything is codegen'd
  * built-ins over the `documents` table.
  */
object TextAnalysis {

  /** Whitespace token count (BPE-ish superset available via the regex in
    * tokensBpeish). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Crude BPE-flavored tokenizer: word pieces + digits + punctuation as
    * separate tokens. */
  def tokensBpeish(text: Column): Column =
    filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      t => length(t) > 0 && t =!= lit(" "))

  private val enStop =
    Seq("the", "and", "of", "to", "a", "in", "is", "that", "with", "for")

  /** Deterministic quality features + a fixed-weight score. All
    * components are expressible in ANSI SQL (see the oracle). */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val chars = length(t)
    val toks = tokenCount(t)
    val punct = length(t) - length(regexp_replace(t, "[\\.,;:!\\?]", ""))
    val stopHits = enStop.map(w =>
      size(filter(split(t, " "), x => x === lit(w))))
      .reduce(_ + _)
    docs
      .withColumn("n_chars_m", chars)
      .withColumn("n_tokens", toks)
      .withColumn("avg_token_len",
        when(toks > 0, chars.cast("double") / toks.cast("double")).otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(chars > 0, punct.cast("double") / chars.cast("double")).otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(toks > 0, stopHits.cast("double") / toks.cast("double")).otherwise(lit(0.0)))
      .withColumn("quality_score",
        least(lit(1.0), col("n_tokens").cast("double") / lit(400.0)) * lit(0.4)
          + col("stopword_ratio") * lit(2.0)
          + (lit(1.0) - col("punct_ratio")) * lit(0.2))
  }

  /** TF-IDF term weights per document: tf from a (doc, term) count,
    * document frequency from a distinct-doc count per term, idf =
    * ln(N/df) with the corpus size N riding the plan as a broadcast
    * 1-row aggregate (no driver action). The term-keyed df join is the
    * standard vocabulary shuffle; all counts are exact longs so only the
    * final ln/multiply is floating point (same expression shape as the
    * oracle). */
  def tfidf(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("term"))
    val tf = words.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = words.groupBy("term").agg(countDistinct(idCol).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        (col("tf") * log(col("n").cast("double") / col("df"))).as("tfidf"))
  }
}
