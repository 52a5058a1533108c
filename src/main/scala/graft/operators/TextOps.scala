package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines: token counting,
  * language identification (stopword-marker heuristic), quality scoring,
  * document fingerprinting, and term frequencies. All pure built-in
  * expressions (codegen'd, shuffle only where a groupBy is inherent) with
  * exact DuckDB oracles. */
object TextOps {

  def tokens(text: Column): Column = split(text, "\\s+")

  /** Language marker stopwords (tiny, deterministic heuristic — the
    * classic n-gram/stopword-profile approach scaled down; real corpora
    * would load bigger profiles the same way). */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "y", "una", "es"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  private def markerHits(t: Column, lang: String): Column =
    size(filter(t, x => x.isin(markers(lang): _*)))

  /** Predicted language: argmax of marker hit-count with deterministic
    * preference order en > de > fr > es > zh on ties (ties include the
    * all-zero case → "en"). */
  def langId(text: Column): Column = {
    val t = tokens(lower(text))
    val langs = Seq("en", "de", "fr", "es", "zh")
    val hits = langs.map(l => markerHits(t, l))
    val best = hits.reduce((a, b) => greatest(a, b))
    // first lang (in preference order) whose hit-count equals the max
    langs.zip(hits).foldRight(lit(langs.head)) { case ((l, h), acc) =>
      when(h === best, lit(l)).otherwise(acc)
    }
  }

  /** Token count (whitespace tokens). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy count: alphanumeric runs + punctuation marks
    * each count as one token (regexp-based). */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "[^0-9A-Za-z]+"), x => x =!= "")) +
      length(regexp_replace(text, "[0-9A-Za-z\\s]+", ""))

  /** Quality score in [0,1]: 0.4·min(len/400,1) + 0.3·distinct-token
    * ratio + 0.3·alpha-char ratio, rounded to 6dp. Deterministic,
    * mirrors the oracle exactly. */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val lenScore = least(length(text).cast("double") / 400.0d, lit(1.0d))
    val distinctRatio = size(array_distinct(t)).cast("double") /
      greatest(size(t), lit(1)).cast("double")
    val alphaRatio = length(regexp_replace(text, "[^A-Za-z]", ""))
      .cast("double") / greatest(length(text), lit(1)).cast("double")
    round(lenScore * 0.4d + distinctRatio * 0.3d + alphaRatio * 0.3d, 6)
  }

  /** Document fingerprint: md5 of the sorted distinct token set — a
    * canonical-form fingerprint (rolling-hash family stand-in that is
    * portable across engines). */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(lower(text)))), " ")
      .cast("binary"))

  /** Per-document text profile: one row per doc with all text metrics. */
  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      tokenCount(col(textCol)).as("n_tokens"),
      subwordCount(col(textCol)).as("n_subwords"),
      langId(col(textCol)).as("pred_lang"),
      qualityScore(col(textCol)).as("quality"),
      fingerprint(col(textCol)).as("fingerprint"))

  /** TF-IDF scores: for every (doc, token), tf * ln(N / df) with raw
    * term counts and document frequency over the corpus. Two narrow
    * aggregations (token counts per doc; df per token) joined on token —
    * the df side is small (vocabulary) and broadcast. */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"),
      explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col("doc"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.count()
    tf.join(broadcast(df), "token")
      .withColumn("tfidf",
        round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
      .select(col("doc"), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** Corpus term frequencies: top-k tokens by count (ties broken by
    * token text) — explode + count, map-side combined. */
  def topTerms(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
}
