package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines: token counting,
  * language identification (stopword-marker heuristic), quality scoring,
  * document fingerprinting, and term frequencies. All pure built-in
  * expressions (codegen'd, shuffle only where a groupBy is inherent) with
  * exact DuckDB oracles. */
object TextOps {

  /** The canonical whitespace tokenizer — delegates to [[Dedup.tokens]]
    * so the text and dedup families can never diverge. */
  def tokens(text: Column): Column = Dedup.tokens(text)

  /** HTML → text extraction (the step right after the WARC read in a
    * crawl pipeline; the C4/CCNet papers call it "text extraction"):
    * drop script/style/comment subtrees, replace every remaining tag
    * with a space, decode the five XML entities plus nbsp, collapse
    * whitespace, trim. A pure chain of codegen'd `regexp_replace`
    * steps — per-row, no shuffle, and an SQL engine can replay the
    * identical chain. (Java regex here; `(?is)` = case-insensitive +
    * dotall so multi-line scripts die with their tags.) */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    // an UNTERMINATED <script>/<style> (truncated crawl payload) would
    // otherwise lose only its open tag and leak raw JS/CSS into the
    // extracted text — strip the dangling subtree to end-of-document
    val noScriptTail = regexp_replace(noScript, "(?is)<script[^>]*>.*$", " ")
    val noStyle = regexp_replace(noScriptTail,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noStyleTail = regexp_replace(noStyle, "(?is)<style[^>]*>.*$", " ")
    val noComment = regexp_replace(noStyleTail, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (e, r)) =>
      regexp_replace(c, e, r)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

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
    // real Chinese is unsegmented — whitespace tokens never isin-match
    // the zh markers, so a CJK-character-ratio branch decides first
    // (identity on the gated corpora, which carry no CJK characters)
    val cjkRatio =
      length(regexp_replace(text, "[^\u4e00-\u9fff]", "")).cast("double") /
        greatest(length(text), lit(1)).cast("double")
    // first lang (in preference order) whose hit-count equals the max
    val vote = langs.zip(hits).foldRight(lit(langs.head)) {
      case ((l, h), acc) => when(h === best, lit(l)).otherwise(acc)
    }
    when(cjkRatio > 0.3d, lit("zh")).otherwise(vote)
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

  /** Per-document text profile: one row per doc with all text metrics.
    * Null text profiles as the empty string (the chunkDocuments
    * coalesce discipline) instead of emitting null/negative metrics. */
  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn(textCol, coalesce(col(textCol), lit(""))).select(
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
    // no broadcast hint: the df side is the VOCABULARY, unbounded at
    // web scale (typos, URLs, hashes easily exceed the broadcast
    // limit) — let AQE broadcast it when it is actually small
    tf.join(df, "token")
      .withColumn("tfidf",
        round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
      .select(col("doc"), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** PII detection patterns (the scrubbing pass of a training-data
    * pipeline). Simple character-class regexes on purpose: they behave
    * identically in Java regex (Spark) and RE2 (DuckDB), and the
    * pii corpus oracle verifies the MATCH COUNTS closed-form. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val DigitRunRe = "[0-9]+"

  /** Per-document PII scan: counts of emails, URLs, phone numbers, and
    * maximal digit runs — a pure codegen projection (regexp_count over
    * the text column, no shuffle). */
  def piiProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(UrlRe)).cast("long").as("n_urls"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(col(textCol), lit(DigitRunRe)).cast("long").as("n_digit_runs"))

  /** PII redaction: replace every email/URL/phone match with a typed
    * placeholder token (order matters — URLs first so an email regex
    * can't nibble a URL's userinfo-free host, phones last). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "[URL]"),
        EmailRe, "[EMAIL]"),
      PhoneRe, "[PHONE]")

  /** Deterministic PII-bearing corpus (the text twin of the PNG/WAV
    * generators): doc id plants id%3 emails, id%4 URLs, id%5 phone
    * numbers and one standalone number into digit-free filler, so every
    * regex match count is closed-form in the id — the oracle predicts
    * what the real regex engine must find (emails carry 2 digit runs
    * each, URLs 2, phones 3, the trailing number 1). */
  def piiCorpus(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame =
    spark.range(n).select(
      col("id").as("doc_id"),
      concat(
        expr("repeat(concat('contact a', id, '@ex', id % 7, '.com '), int(id % 3))"),
        lit("plain filler words here "),
        expr("repeat(concat('visit http://h', id, '.example/p', id, ' '), int(id % 4))"),
        expr("repeat('call 555-867-5309 ', int(id % 5))"),
        expr("concat('num ', id * 37, ' end')")).as("text"))

  /** Gopher-style repetition metrics (Rae et al. 2021, appendix A —
    * scaled to whitespace tokens since the synthetic corpus has no line
    * structure): duplicate-token fraction, the most frequent bigram's
    * share of all bigram positions, and the fraction of trigram
    * positions covered by trigrams that occur more than once. High
    * values flag boilerplate and degenerate machine text — the standard
    * pretraining quality gate alongside [[qualityScore]].
    *
    * Shape: ONE explode pass over both gram families (each gram tagged
    * with its size n in a struct), so the text is scanned and tokenized
    * once and there is a single (doc, n, gram) count aggregation plus
    * one per-doc rollup — two keyed shuffles total, both map-side
    * combined. n_tokens / n_distinct ride along the exploded rows (two
    * ints, constant per doc) instead of a third plan branch re-reading
    * the source. n-gram arrays reuse [[Dedup.shinglesOf]] slice
    * semantics so the DuckDB oracle mirrors them exactly — including
    * the short-doc clamp: a doc with fewer than n tokens emits ONE
    * truncated shingle, so a 1-token doc scores top_bigram_frac = 1.0
    * (maximally repetitive). Filter such docs upstream if that gate is
    * unwanted. */
  def repetitionProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tagged = docs
      .select(col(idCol).as("doc"), tokens(col(textCol)).as("toks"))
      .select(col("doc"), size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        explode(concat(
          transform(Dedup.shinglesOf(col("toks"), 2),
            g => struct(lit(2).as("n"), g.as("g"))),
          transform(Dedup.shinglesOf(col("toks"), 3),
            g => struct(lit(3).as("n"), g.as("g"))))).as("gram"))
    tagged
      .groupBy(col("doc"), col("gram.n").as("n"), col("gram.g").as("g"))
      .agg(count(lit(1)).as("c"),
        max(col("n_tokens")).as("n_tokens"),
        max(col("n_distinct")).as("n_distinct"))
      .groupBy(col("doc"))
      .agg(max(col("n_tokens")).as("n_tokens"),
        max(col("n_distinct")).as("n_distinct"),
        max(when(col("n") === 2, col("c"))).as("top2"),
        sum(when(col("n") === 2, col("c")).otherwise(lit(0L))).as("n2"),
        sum(when(col("n") === 3 && col("c") >= 2, col("c"))
          .otherwise(lit(0L))).as("dup3"),
        sum(when(col("n") === 3, col("c")).otherwise(lit(0L))).as("n3"))
      .select(col("doc"), col("n_tokens"),
        round((col("n_tokens") - col("n_distinct")).cast("double") /
          col("n_tokens").cast("double"), 6).as("dup_token_frac"),
        round(col("top2").cast("double") / col("n2").cast("double"), 6)
          .as("top_bigram_frac"),
        round(col("dup3").cast("double") / col("n3").cast("double"), 6)
          .as("dup_trigram_frac"))
  }

  /** Corpus term frequencies: top-k tokens by count (ties broken by
    * token text) — explode + count, map-side combined. */
  def topTerms(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** BM25 ranked retrieval (Robertson & Zaragoza 2009, the Okapi/Lucene
    * scoring function — public method; no reference counterpart): score
    * every document against a FIXED query-term list and return the top
    * `topK` by
    *   Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) (the always-positive
    * Lucene form).
    *
    * Determinism across engines: N, df, dl and Σdl are exact integers;
    * avgdl is one exact division; the per-doc score is a FIXED-ORDER
    * expression sum over the query terms (each term's tf arrives as its
    * own when-sum aggregate column — never a float sum whose order the
    * engine picks), and ranking uses the 6dp-ROUNDED score with a doc-id
    * tie-break, so a last-ulp ln() difference between libms cannot
    * reorder the cut.
    *
    * Scale shape: one tokenize+explode pass filtered to the query terms
    * BEFORE the shuffle (the isin filter prunes the exploded stream to
    * Q terms), one groupBy(doc) with map-side-combined when-sums, df as
    * a Q-row driver-side lookup (bounded by the query, not the corpus),
    * and a rounded top-k TakeOrdered. No corpus-wide join. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], topK: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.distinct
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // null text scores as the empty document (null dl would skew avgdl)
    val toks = docs.select(col(idCol).as("doc"),
      tokens(coalesce(col(textCol), lit(""))).as("ts"))
    val n = docs.count()
    if (n == 0L)
      return docs.select(col(idCol).as("doc")).limit(0)
        .withColumn("bm25", lit(0.0d))
    val sumDl = toks.agg(sum(size(col("ts")))).head().getLong(0)
    val avgdl = sumDl.toDouble / n
    // df per query term: # docs containing it (Q-row driver map)
    val dfMap = toks
      .select(col("doc"), explode(array_distinct(col("ts"))).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val idf = terms.map { t =>
      val df = dfMap.getOrElse(t, 0L).toDouble
      t -> math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }.toMap
    // per-doc tf of each query term as its own aggregate column
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, 1L).otherwise(0L)).as(s"_tf$i")
    }
    val perDoc = toks
      .select(col("doc"), size(col("ts")).as("dl"),
        explode(col("ts")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc"))
      .agg(max(col("dl")).as("dl"), tfCols: _*)
    val norm = lit(k1) * (lit(1.0 - b) +
      lit(b) * col("dl").cast("double") / avgdl)
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = col(s"_tf$i").cast("double")
      lit(idf(t)) * tf * lit(k1 + 1.0) / (tf + norm)
    }.reduce((a, c) => a + c)
    perDoc
      .withColumn("bm25", round(score, 6))
      .orderBy(col("bm25").desc, col("doc"))
      .limit(topK)
      .select(col("doc"), col("bm25"))
  }

  /** PHRASE occurrence count: how many token positions start an exact
    * consecutive match of `phrase` under the same whitespace
    * tokenization as every other text operator. Evaluates as a single
    * codegen'd array expression per row — the candidate start positions
    * are a `sequence`, the match test a conjunction of `element_at`
    * probes — so phrase search over a corpus is an embarrassingly
    * parallel scan with no explode, no join, and no shuffle. (The
    * positional-postings alternative only wins when the index already
    * exists and the phrase's terms are rare; as a corpus *filter* —
    * "docs that quote this exact sentence" — the scan form is the
    * one that streams.) */
  def phraseHits(text: Column, phrase: Seq[String]): Column =
    // native kernel: Catalyst evaluates higher-order `filter` lambdas
    // interpreted (one closure call per candidate position); the
    // PhraseCountExpr loop runs inside whole-stage codegen and skips
    // on first mismatch — same count, no index-sequence allocation
    graft.functions.VectorExpressions.phraseCount(tokens(text), phrase)

  /** Default banned substrings for [[c4LineClean]] — the C4 paper's
    * boilerplate markers (Raffel et al. 2020, §2.2): pages behind
    * javascript walls, lorem-ipsum filler, and code braces. */
  val C4Banned: Seq[String] = Seq("javascript", "lorem ipsum", "{")

  /** Per-LINE word count on the trimmed line (empty lines count 0).
    * Splits on \s+ like [[tokens]] — a tab-separated clean sentence
    * must not be undercounted into the c4 discard bin. */
  private[operators] def lineWords(ln: Column): Column =
    size(filter(split(trim(ln), "\\s+"), w => w =!= ""))

  /** A line survives C4 cleaning iff it ends in terminal punctuation,
    * carries at least `minWords` words, and contains no banned marker
    * (case-insensitive). */
  private def lineKeep(ln: Column, minWords: Int,
                       banned: Seq[String]): Column = {
    val t = trim(ln)
    val punct = substring(t, -1, 1).isin(".", "!", "?", "\"")
    val noBan = banned.map(b => !lower(t).contains(lit(b)))
      .reduce((a, b) => a && b)
    (lineWords(ln) >= minWords) && punct && noBan
  }

  /** C4-style LINE-level cleaning (Raffel et al. 2020, §2.2 — the
    * cleaning pass behind the C4 pretraining corpus, public method; no
    * reference counterpart): split each document on newlines, keep only
    * lines that end in terminal punctuation (. ! ? "), have at least
    * `minWords` words, and contain none of the `banned` markers
    * (javascript walls, lorem ipsum, code braces), then re-join the
    * survivors.
    *
    * Shape: one pure per-row projection — split, higher-order filter,
    * re-join — no explode, no shuffle, codegen end to end; at 100 TB
    * this runs at scan speed and composes with the rest of the curation
    * pipeline (dedup → clean → pack). Returns (id, n_lines, n_kept,
    * clean_md5, clean_text); the md5 rides along so a gate can compare
    * cleaned text without hauling it. */
  def c4LineClean(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 5,
                  banned: Seq[String] = C4Banned): DataFrame = {
    val lines = split(coalesce(col(textCol), lit("")), "\n")
    docs.select(
      col(idCol),
      size(lines).as("n_lines"),
      size(filter(lines, ln => lineKeep(ln, minWords, banned)))
        .as("n_kept"),
      md5(array_join(filter(lines, ln => lineKeep(ln, minWords, banned)),
        "\n")).as("clean_md5"),
      array_join(filter(lines, ln => lineKeep(ln, minWords, banned)), "\n")
        .as("clean_text"))
  }

  /** Bigram language-model cross-entropy scoring (the CCNet quality
    * signal — Wenzek et al. 2020 score documents by the perplexity of a
    * target-domain LM; lower = more target-like): train an add-one-
    * smoothed bigram LM on the TARGET slice of the corpus, score every
    * document by its mean negative log bigram probability,
    * p(w2|w1) = (C2(w1,w2)+1) / (C1(w1)+V). The complement of
    * [[Pipeline.dsirWeights]]: DSIR ranks by a target/raw RATIO of
    * hashed features; this ranks by absolute likelihood under the
    * target LM.
    *
    * Cross-engine determinism: each bigram's −ln p is snapped to fixed
    * point (round(·1e8) as a long) before the per-doc sum — the same
    * integer-aggregation contract as DSIR — and the mean divides the
    * integer sum once at the end. V (target vocabulary + 1) is a
    * BOUNDED driver scalar (the vocabulary, not the corpus).
    *
    * Shape at scale: bigram/unigram count aggregations over the target
    * slice (map-side combined), two keyed left joins of the per-doc
    * bigram stream against them, one per-doc sum. Docs with fewer than
    * two tokens have no bigrams and are absent from the output. */
  def bigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
                         isTarget: Column): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    val base = docs.select(col(idCol).as("doc"), isTarget.as("tgt"),
      toks.as("ts"))
    val pairs = base.select(col("doc"), col("tgt"),
        explode(expr("zip_with(slice(ts, 1, size(ts) - 1), " +
          "slice(ts, 2, size(ts) - 1), (a, b) -> struct(a AS w1, b AS w2))"))
          .as("bg"))
      .select(col("doc"), col("tgt"), col("bg.w1").as("w1"),
        col("bg.w2").as("w2"))
    val c2 = pairs.filter(col("tgt")).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val c1 = base.filter(col("tgt")).select(explode(col("ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val v = (c1.count() + 1).toDouble
    val lamFp = round(-org.apache.spark.sql.functions.log(
        (coalesce(col("c2"), lit(0L)) + 1.0) /
          (coalesce(col("c1"), lit(0L)) + lit(v))) * 1e8)
      .cast("long")
    pairs
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .select(col("doc"), lamFp.as("lam_fp"))
      .groupBy(col("doc"))
      .agg(round((sum(col("lam_fp")).cast("double") / 1e8) /
        count(lit(1)), 6).as("ce"))
  }

  /** URL canonicalization for URL-level dedup (the CCNet / RefinedWeb
    * pre-pass: crawl snapshots carry the same page under scheme, case,
    * www, tracking-parameter and fragment variants — canonicalize
    * BEFORE content dedup so the expensive near-dup machinery never
    * sees n copies of one page). Steps, in order: drop the #fragment,
    * drop tracking parameters (utm_*, fbclid, gclid) wherever they sit
    * in the query string, repair the separator when the first real
    * parameter followed a dropped one (`page&x=1` → `page?x=1`), drop a
    * dangling `?`/`&`, lowercase, strip the http(s) scheme and a
    * leading www., and strip trailing slashes. Pure per-row projection
    * — codegen, no shuffle; the DuckDB oracle mirrors each step with
    * the same regexes. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(coalesce(url, lit("")), "#.*", "")
    // lowercase FIRST so mixed-case tracking params (UTM_SOURCE,
    // FBclid) canonicalize too
    val lowered = lower(noFrag)
    // tracked params are removed in three lossless steps that never
    // touch a literal '&' elsewhere in the URL (the previous
    // unconditional '^([^?]*)&' -> '?' separator repair rewrote
    // 'host/a&b' — a legal path — into 'host/a?b'):
    //  1. '&'-led tracked params drop cleanly wherever they sit;
    val noAmpTrack =
      regexp_replace(lowered, "&(utm_[a-z]+|fbclid|gclid)=[^&#]*", "")
    //  2. at most one tracked param remains, '?'-led: drop it and
    //     promote its follower ('p?utm_x=1&a=2' -> 'p?a=2');
    val noLeadMid = regexp_replace(noAmpTrack,
      "\\?(utm_[a-z]+|fbclid|gclid)=[^&#]*&", "?")
    //  3. or drop it terminally ('p?utm_x=1' -> 'p').
    val noLeadEnd = regexp_replace(noLeadMid,
      "\\?(utm_[a-z]+|fbclid|gclid)=[^&#]*$", "")
    val noDangle = regexp_replace(noLeadEnd, "[?&]+$", "")
    val noScheme = regexp_replace(noDangle, "^https?://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    regexp_replace(noWww, "/+$", "")
  }

  /** URL-level duplicate grouping: every row mapped to the canonical
    * (minimum) doc id of its [[canonicalUrl]] group, plus group size —
    * the URL-keyed twin of [[Dedup.exactDuplicates]]. One keyed window;
    * the canonical key is computed once per row at scan speed. */
  def urlDuplicates(docs: DataFrame, idCol: String,
                    urlCol: String): DataFrame = {
    val canon = canonicalUrl(col(urlCol))
    val w = Window.partitionBy(canon)
    docs.select(col(idCol),
      canon.as("canonical_url"),
      min(col(idCol)).over(w).as("canonical_id"),
      count(lit(1)).over(w).as("group_size"))
  }

  /** Deterministic URL corpus (the URL twin of [[lineCorpus]] — the
    * synthetic documents table has no url column): closed-form in the
    * id, covering every canonicalization case — scheme and case
    * variants, www, trailing slash, tracking params in first, middle
    * and only positions (including the separator-repair shape), real
    * params that must survive, and fragments — with base (site, page)
    * keys chosen so variants collide into shared canonical groups. */
  def urlCorpus(spark: org.apache.spark.sql.SparkSession,
                n: Int): DataFrame =
    spark.range(n).select(
      col("id").as("doc_id"),
      concat(
        expr("CASE WHEN id % 2 = 0 THEN 'http://' ELSE 'https://' END"),
        expr("CASE WHEN id % 4 = 0 THEN 'www.' ELSE '' END"),
        expr("CASE WHEN id % 3 = 0 THEN 'ExAmPlE' ELSE 'example' END"),
        expr("CAST(id % 5 AS STRING)"),
        expr("CASE WHEN id % 6 = 3 THEN '.CoM/Page' ELSE '.com/page' END"),
        expr("CAST(id % 20 AS STRING)"),
        expr("CASE WHEN id % 7 = 0 THEN '/' ELSE '' END"),
        expr("CASE WHEN id % 6 = 0 THEN '?utm_source=feed&utm_campaign=c' " +
          "WHEN id % 11 = 0 THEN '?utm_medium=m&x=1' " +
          "WHEN id % 13 = 0 THEN '?x=1&utm_medium=m' " +
          "ELSE '' END"),
        expr("CASE WHEN id % 8 = 0 THEN '#frag' ELSE '' END")
      ).as("url"))

  /** Deterministic multi-line corpus (the line-structured twin of
    * [[piiCorpus]] — the synthetic documents table is single-line word
    * soup with no punctuation, so line-level ops need their own
    * fixture): every doc carries a mix of keepable sentences, a
    * too-short line, a terminal-punctuation-free header, banned-marker
    * lines that alternate with clean ones by id parity, and two
    * boilerplate lines duplicated across docs (one global, one per
    * id%10 cohort) for the line-dedup family. Closed-form in the id, so
    * a DuckDB oracle rebuilds it exactly. */
  def lineCorpus(spark: org.apache.spark.sql.SparkSession,
                 n: Int): DataFrame =
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws("\n",
        expr("concat('spark cleans corpus line ', id, ' with punctuation.')"),
        lit("too short."),
        expr("CASE WHEN id % 2 = 1 THEN concat('javascript must be enabled to view page ', id % 7, '.') " +
          "ELSE concat('page ', id, ' renders fine without any scripting at all.') END"),
        lit("lorem ipsum dolor sit amet consectetur adipiscing elit."),
        expr("concat('unterminated navigation header number ', id % 5)"),
        lit("subscribe to our newsletter now please today."),
        expr("concat('shared boilerplate variant ', id % 10, ' appears rather often indeed.')"),
        expr("concat('document ', id, ' closes with a unique parting sentence, number ', id * 3, '.')")
      ).as("text"))
}
