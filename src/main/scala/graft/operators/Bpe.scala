package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair encoding) tokenizer training and
  * application (Sennrich, Haddow & Birch, "Neural Machine Translation
  * of Rare Words with Subword Units", ACL 2016) — the
  * vocabulary-construction step of a training-data pipeline.
  *
  * Scale shape (100 TB): the corpus is touched ONCE, by the word-freq
  * aggregation (map-side combined groupBy over whitespace tokens — the
  * same shuffle profile as a word count). Everything after operates on
  * the word-frequency SUMMARY, which is vocabulary-sized, not
  * corpus-sized; training cuts it to the top `maxWords` words (the
  * standard practical cap — rare-word tails contribute ~nothing to
  * merge counts) and runs the merge loop on that bounded summary
  * driver-side, like k-means centroids or PQ codebooks: the result is
  * a MODEL artifact, not data. Applying a trained tokenizer streams
  * through `mapPartitions` with a broadcast merge-rank map and a
  * per-partition word→segmentation memo, so each distinct word per
  * partition is segmented once regardless of its frequency.
  *
  * The distributed pair-count aggregation (the heart of one training
  * iteration) is exposed as [[pairCounts]] and oracle-gated: it is a
  * pure explode + keyed sum, identical in SQL. */
object Bpe {

  val Eow = "</w>"

  /** (word, freq) over whitespace tokens — one corpus pass. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial segmentation: characters plus a trailing end-of-word
    * marker (merges never cross word boundaries). */
  def initialSegments(wordFreq: DataFrame): DataFrame =
    wordFreq.withColumn("syms",
      concat(split(col("word"), ""), array(lit(Eow))))

  /** Frequency-weighted adjacent-symbol-pair counts of a segmented
    * word-freq table — one explode + keyed sum, the distributed form
    * of a single training iteration's counting step. */
  def pairCounts(segments: DataFrame): DataFrame =
    segments
      .select(col("freq"), col("syms"),
        explode(sequence(lit(0), size(col("syms")) - 2)).as("i"))
      .select(col("syms").getItem(col("i")).as("left"),
        col("syms").getItem(col("i") + 1).as("right"), col("freq"))
      .groupBy(col("left"), col("right"))
      .agg(sum(col("freq")).as("weight"))

  /** Train `numMerges` merges on the top `maxWords` words by frequency
    * (ties broken by word so the cut is deterministic). Returns merges
    * in application order. Tie-break inside the loop: highest weight,
    * then lexicographically smallest (left, right) — fully
    * deterministic, engine-independent. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 100000): Seq[(String, String)] = {
    val wf: Array[(String, Long)] = wordFreq(docs, textCol)
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var segs: Array[(Array[String], Long)] =
      wf.map { case (w, f) => (w.map(_.toString).toArray :+ Eow, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    var done = false
    while (iter < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), w) => (-w, l, r) }._1
        merges += best
        segs = segs.map { case (syms, f) => (applyMerge(syms, best), f) }
      }
      iter += 1
    }
    merges.toSeq
  }

  /** One merge applied left-to-right in one pass (the standard BPE
    * convention: after merging at i, scanning resumes at i+2). */
  private def applyMerge(syms: Array[String],
                         m: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Segment one word with a merge-rank map: repeatedly apply the
    * lowest-rank merge present among adjacent pairs until none
    * applies — the standard greedy BPE apply. */
  private def segmentWord(word: String,
                          rank: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ Eow
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) continue = false
      else syms = applyMerge(syms, best)
    }
    syms
  }

  /** Tokenize documents with a trained merge list: (id, tokens
    * array<string>, n_tokens). Broadcast rank map + per-partition
    * word-segmentation memo — each distinct word per partition is
    * segmented once. */
  def segment(docs: DataFrame, idCol: String, textCol: String,
              merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rankBc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val rank = rankBc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          val words = text.split("\\s+").filter(_.nonEmpty)
          val toks = words.flatMap(w =>
            memo.getOrElseUpdate(w, segmentWord(w, rank)))
          (id, toks.toSeq, toks.length)
        }
      }.toDF(idCol, "tokens", "n_tokens")
  }
}
