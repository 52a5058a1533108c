package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training-data pipelines: deterministic
  * sampling, train/val/test splitting, and sequence packing. Everything
  * is a pure projection or a keyed window — no shuffle wider than the
  * data requires — and every decision derives from an md5-based uniform
  * hash, so results are reproducible run-to-run, engine-portable (the
  * DuckDB oracles recompute the identical uniforms — same construction
  * the i3 generator oracle uses), and stable under repartitioning:
  * membership depends only on (id, salt), never on row order or
  * partition placement — the property rand()/sample() lacks at scale. */
object Pipeline {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Empty-result limit shared by the rebalancers: a target domain with
    * zero rows means the data cannot supply ANY corpus at the requested
    * mixture (K = 0). Returned as an empty frame rather than a job
    * abort, but LOUDLY — a typo'd domain name would otherwise produce
    * an empty training corpus with no signal. */
  private def emptyMixture(inScope: DataFrame, op: String,
                           missing: Seq[String]): DataFrame = {
    log.warn(s"$op: target domain(s) ${missing.mkString(", ")} have zero " +
      "rows; the requested mixture is unsatisfiable, returning an EMPTY " +
      "result (check for misspelled domain names)")
    inScope.filter(lit(false))
  }

  /** Deterministic uniform in [0, 1): the shared md5-prefix uniform
    * ([[graft.functions.PortableHash.md5Uniform]]) keyed by
    * id || '_' || salt. */
  def hashUniform(id: Column, salt: String): Column =
    graft.functions.PortableHash.md5Uniform(
      concat(id.cast("string"), lit("_" + salt)))

  /** Bernoulli sample at `rate`, keyed by the hash uniform — the
    * deterministic replacement for df.sample at pipeline scale. */
  def sample(df: DataFrame, idCol: String, rate: Double,
             salt: String): DataFrame =
    df.filter(hashUniform(col(idCol), salt) < rate)

  /** Per-stratum sampling rates (stratified downsampling — e.g. cap an
    * over-represented language). `rates` maps stratum value → rate;
    * strata not listed keep `defaultRate`. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[Long, Double], defaultRate: Double,
                       salt: String): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(hashUniform(col(idCol), salt) < rate)
  }

  /** Scratch-column collision guard: withColumn would silently replace
    * a caller's same-named column and the trailing drop would delete it
    * from the promised passthrough output. Case-INSENSITIVE, because
    * Spark's default resolver is — a caller's 'REP' column would be
    * replaced by withColumn("rep", ...) just as surely as 'rep'. */
  private def requireFreeCols(df: DataFrame, op: String,
                              names: String*): Unit =
    names.foreach(n => require(
      !df.columns.exists(_.equalsIgnoreCase(n)),
      s"$op: input already has a '$n' column (reserved scratch name)"))

  /** EXACT-count stratified sample: exactly min(k, |stratum|) rows per
    * stratum — the k smallest hash-uniforms in each group, ties broken
    * by id. Where [[stratifiedSample]] guarantees a RATE in
    * expectation, this guarantees a COUNT (balanced eval sets, fixed
    * per-language quotas), while staying a pure function of (id, salt):
    * reproducible across runs, engines, and repartitioning. One keyed
    * window whose rank cut Spark pushes map-side (WindowGroupLimit), so
    * no stratum's full membership ever reaches one reducer. */
  def stratifiedExactK(df: DataFrame, idCol: String, stratumCol: String,
                       k: Int, salt: String): DataFrame = {
    requireFreeCols(df, "stratifiedExactK", "_rk")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashUniform(col(idCol), salt), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Train/val/test split assignment from cumulative weight thresholds:
    * weights (name, w) with Σw = 1; a row lands in the first split whose
    * cumulative upper bound exceeds its uniform. Disjoint and exhaustive
    * by construction, stable across runs and engines. */
  def splitAssign(df: DataFrame, idCol: String,
                  weights: Seq[(String, Double)], salt: String): DataFrame = {
    require(weights.nonEmpty, "splitAssign needs at least one split")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${weights.map(_._2).sum}")
    val u = hashUniform(col(idCol), salt)
    val bounds = weights.scanLeft(0.0d) { case (acc, (_, w)) => acc + w }.tail
    val assign = weights.zip(bounds).init.foldRight(lit(weights.last._1)) {
      case (((name, _), bound), acc) => when(u < bound, lit(name)).otherwise(acc)
    }
    // a null id cannot key the hash membership — without this filter a
    // null-id row's when-chain falls through to the LAST split (test-set
    // contamination); the samplers drop null ids via their null
    // membership predicate, so dropping keeps ONE contract family-wide
    df.filter(col(idCol).isNotNull).withColumn("split", assign)
  }

  /** Sequential sequence packing: within each shard (idCol mod
    * `numShards`), documents are processed in id order and a document's
    * bin is floor(cumulative-tokens-before-it / capacity) — the
    * running-sum formulation of greedy concat-and-chunk packing (the
    * standard LM pretraining layout). One keyed window per shard; no
    * global sort, no driver loop. Returns (id, shard, n_tokens, bin).
    *
    * `count` is the token-counting column (default whitespace tokens,
    * [[TextOps.tokenCount]]); pass [[TextOps.subwordCount]] (or any
    * tokenizer-faithful counter) when packing must match the training
    * tokenizer's unit rather than whitespace words.
    *
    * `packKeys` prepends extra partition keys to the shard (pack within
    * split, within source, ...); `carry` columns are forwarded to the
    * output untouched.
    *
    * `orderCols` (default just `idCol`) is the in-shard packing order
    * and MUST be a row-unique key: with duplicate order values the
    * running sum over ties is partition-placement-dependent and bins go
    * nondeterministic. Upsampled corpora ([[rebalanceRepeat]] output,
    * where doc_id repeats per epoch) pack with
    * `orderCols = Seq(idCol, "rep")`. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    capacity: Int, numShards: Int,
                    count: Column => Column = TextOps.tokenCount,
                    packKeys: Seq[String] = Nil,
                    carry: Seq[String] = Nil,
                    orderCols: Seq[String] = Nil): DataFrame = {
    val order = if (orderCols.nonEmpty) orderCols else Seq(idCol)
    val w = Window
      .partitionBy((packKeys.map(col) :+ col("shard")): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select((packKeys ++ carry ++ order.filterNot(_ == idCol))
        .distinct.map(col) ++ Seq(
        col(idCol), (col(idCol) % numShards).as("shard"),
        // null text counts zero tokens — a null n_tokens would null
        // the running sum and emit bin = null rows into the shard
        // writers, and under legacy (non-ANSI) sizeOfNull a counter
        // built on size() returns -1 instead of null, which would walk
        // the running sum BACKWARDS: clamp at 0 as well as coalescing
        greatest(coalesce(count(col(textCol)), lit(0)), lit(0))
          .as("n_tokens")): _*)
      .withColumn("bin",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) /
          capacity).cast("long"))
  }

  /** Domain rebalancing: deterministic, downsample-only resampling
    * toward target domain proportions (the data-mixture step of a
    * pretraining pipeline — e.g. rebalance a crawl that is 44% English
    * to a 25% target). `targets` maps domain value → target share
    * (Σ = 1); rows outside the listed domains are dropped.
    *
    * The kept set is the largest proportional corpus the data can
    * supply without upsampling: K = min over domains of count/target,
    * and each domain keeps rate = target·K/count of its rows (the
    * limiting domain keeps everything, rate exactly 1.0). Membership is
    * the md5 uniform keyed by (id, salt) — reproducible, engine-
    * portable, repartition-stable. One bounded count aggregation
    * (#domains rows to the driver) plus a map-only filter — no shuffle
    * of the data itself. Dyadic targets keep the rate threshold
    * bit-identical across engines (the oracle recomputes it with the
    * same IEEE operation order).
    *
    * A target domain with ZERO rows makes K = min(count/target) = 0, so
    * the kept set is empty — the data cannot supply any corpus at the
    * requested mixture. That limit is returned as an empty DataFrame
    * (same schema), not a job abort. */
  def rebalance(df: DataFrame, idCol: String, domainCol: String,
                targets: Seq[(String, Double)], salt: String): DataFrame = {
    require(targets.nonEmpty, "rebalance needs at least one target domain")
    require(targets.forall(_._2 > 0), "target shares must be positive")
    require(math.abs(targets.map(_._2).sum - 1.0) < 1e-9,
      s"target shares must sum to 1, got ${targets.map(_._2).sum}")
    val inScope = df.filter(col(domainCol).isin(targets.map(_._1): _*))
    val counts = domainCounts(inScope, domainCol)
    val missing = targets.collect { case (dom, _) if !counts.contains(dom) => dom }
    if (missing.nonEmpty) emptyMixture(inScope, "rebalance", missing)
    else {
      val kTotal = targets.map { case (dom, t) => counts(dom).toDouble / t }.min
      val rate = targets.foldLeft(lit(0.0d)) { case (acc, (dom, t)) =>
        when(col(domainCol) === dom,
          lit(t * kTotal / counts(dom).toDouble)).otherwise(acc)
      }
      inScope.filter(hashUniform(col(idCol), salt) < rate)
    }
  }

  /** Observed per-domain row counts, collected (bounded: #domains
    * rows) — the input to [[temperatureTargets]] and the internal
    * count step of the rebalancers. Rows with a NULL domain are
    * excluded (they can never be mixture targets — the rebalancers'
    * isin scope drops them too). */
  def domainCounts(df: DataFrame, domainCol: String): Map[String, Long] =
    // cast to string so a non-string domain column (int lang ids) feeds
    // the mixture math instead of a driver-side ClassCastException
    df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("_d"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Temperature-flattened mixture targets from observed domain counts
    * (the mT5 / XLM-R sampling rule): share_d ∝ count_d^alpha, alpha ∈
    * (0, 1] — alpha 1 keeps natural proportions, smaller alpha flattens
    * toward uniform so low-resource domains are seen more often.
    * Deterministic: domains processed in sorted order (the float sum
    * order is fixed), shares sum to 1 within the [[rebalance]]
    * tolerance. alpha = 0.5 uses `sqrt` explicitly — correctly rounded
    * by IEEE in every engine, so a DuckDB oracle can reproduce the
    * shares bit-for-bit (`pow` carries no such guarantee across libm
    * implementations). */
  def temperatureTargets(counts: Map[String, Long],
                         alpha: Double): Seq[(String, Double)] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(counts.nonEmpty, "temperatureTargets needs at least one domain")
    require(counts.values.forall(_ > 0), "domain counts must be positive")
    val powed = counts.toSeq.sortBy(_._1).map { case (d, n) =>
      (d, if (alpha == 0.5) math.sqrt(n.toDouble)
          else if (alpha == 1.0) n.toDouble
          else math.pow(n.toDouble, alpha))
    }
    val tot = powed.map(_._2).sum
    powed.map { case (d, p) => (d, p / tot) }
  }

  /** Upsampling rebalance — the other half of data-mixture practice:
    * instead of shrinking to what the scarcest domain can supply
    * ([[rebalance]]), REPEAT scarce-domain rows (bounded by `maxRepeat`
    * epochs, the standard cap before repetition hurts — e.g. Muennighoff
    * et al. 2023 find ~4 epochs of repeated data near-free) so the output
    * hits the target mixture at the largest size the cap allows:
    * K = min over domains of count·maxRepeat/target, each domain
    * contributing ≈ target·K rows.
    *
    * Per-row copy counts are deterministic: a domain needing n = rate·
    * count rows (rate = target·K/count, may exceed 1) gives every row
    * floor(rate) copies plus one more iff its md5 uniform < frac(rate) —
    * the same (id, salt)-keyed uniform as every sampler here, so the
    * output is reproducible and repartition-stable. A pure projection +
    * one explode (no shuffle); rows surviving with c copies emit `rep` =
    * 0..c−1 alongside the original columns. Domains with zero rows make
    * K = 0 → empty output, mirroring [[rebalance]]. */
  def rebalanceRepeat(df: DataFrame, idCol: String, domainCol: String,
                      targets: Seq[(String, Double)], maxRepeat: Int,
                      salt: String): DataFrame = {
    require(targets.nonEmpty, "rebalanceRepeat needs at least one target domain")
    require(targets.forall(_._2 > 0), "target shares must be positive")
    require(math.abs(targets.map(_._2).sum - 1.0) < 1e-9,
      s"target shares must sum to 1, got ${targets.map(_._2).sum}")
    require(maxRepeat >= 1, "maxRepeat must be at least 1")
    requireFreeCols(df, "rebalanceRepeat", "_copies", "rep")
    // null ids: rebalance's membership filter silently drops them (null
    // predicate); mirror that here — otherwise floor(rate) copies of a
    // null-id row would survive and membership would stop being a pure
    // function of (id, salt)
    val inScope = df.filter(col(domainCol).isin(targets.map(_._1): _*) &&
      col(idCol).isNotNull)
    val counts = domainCounts(inScope, domainCol)
    val missing = targets.collect { case (dom, _) if !counts.contains(dom) => dom }
    if (missing.nonEmpty)
      emptyMixture(inScope, "rebalanceRepeat", missing).withColumn("rep", lit(0L))
    else {
      val kTotal = targets.map { case (dom, t) =>
        counts(dom).toDouble * maxRepeat / t }.min
      val rate = targets.foldLeft(lit(0.0d)) { case (acc, (dom, t)) =>
        when(col(domainCol) === dom,
          lit(t * kTotal / counts(dom).toDouble)).otherwise(acc)
      }
      inScope
        .withColumn("_copies",
          floor(rate).cast("long") +
            when(hashUniform(col(idCol), salt) < rate - floor(rate), 1L)
              .otherwise(0L))
        .filter(col("_copies") > 0)
        .withColumn("rep", explode(sequence(lit(0L), col("_copies") - 1)))
        .drop("_copies")
    }
  }

  /** Exact-dedup stage of [[curate]]: keep the minimum id per md5(text)
    * group — one keyed window, no join. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    requireFreeCols(docs, "exactDedup", "_h", "_canon")
    // NULL text is unknown, not identical: key each null-text doc to its
    // own group (md5(null) is null — one raw partition would silently
    // delete all null-text docs but one as "exact duplicates")
    val byHash = Window.partitionBy(coalesce(col("_h"),
      concat(lit(" null:"), col(idCol).cast("string"))))
    docs
      .withColumn("_h", md5(col(textCol)))
      .withColumn("_canon", min(col(idCol)).over(byHash))
      .filter(col(idCol) === col("_canon"))
      .drop("_h", "_canon")
  }

  /** The shareable near-dup artifact of [[curate]]: the verified
    * candidate-pair relation (columns a, b) over the EXACT-DEDUPED
    * corpus — exactly what [[curate]] computes internally. The MinHash
    * signatures, LSH band join, and Jaccard re-check are the expensive
    * stages of every composed pipeline; compute this ONCE (and
    * `localCheckpoint` it), then feed any number of [[curateWith]]
    * configurations — different eval sets, mixtures, or packing — so a
    * multi-configuration run pays one LSH pass instead of one per
    * configuration (A/B'd in BASELINE.md). */
  def curatePairs(docs: DataFrame, idCol: String, textCol: String,
                  jaccard: Double = 0.6): DataFrame =
    Dedup.lshVerifiedPairs(exactDedup(docs, idCol, textCol), idCol, textCol,
      3, jaccard)

  /** Split long documents into overlapping token-window CHUNKS — the
    * long-document step that precedes packing in an LM pipeline (a
    * 200k-token document can't ride one sequence; it becomes
    * ceil((n−overlap)/stride) chunks of up to `maxTokens` whitespace
    * tokens, consecutive chunks sharing `overlap` tokens so no context
    * is lost at boundaries). Chunk i covers tokens [i·stride,
    * i·stride + maxTokens) with stride = maxTokens − overlap; every doc
    * yields at least one chunk (short docs pass through whole). A pure
    * projection + one explode — no shuffle, stateless, so it runs
    * unchanged on streams like the other per-row ops. Deterministic and
    * engine-portable (the p10 oracle recomputes every chunk boundary).
    * Returns the input columns + (chunk, chunk_text, n_chunk_tokens). */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap of $maxTokens")
    val stride = maxTokens - overlap
    // null text tokenizes to null (size -1 would corrupt the chunk
    // arithmetic); coalesce to the empty array so a null doc emits one
    // empty chunk ('' / 0) — same as the oracle's coalesced split
    val toks = coalesce(TextOps.tokens(col(textCol)),
      typedlit(Seq.empty[String]))
    // integer-arithmetic chunk count: ceil((n - overlap) / stride) with
    // a floor of 1 — identical in both engines (no float rounding)
    val nChunks = greatest(
      expr(s"(size(_graft_ts) - $overlap + ${stride - 1}) div $stride")
        .cast("long"),
      lit(1L))
    requireFreeCols(docs, "chunkDocuments", "_graft_ts")
    docs
      .withColumn("_graft_ts", toks)
      .withColumn("chunk", explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("chunk_text",
        array_join(slice(col("_graft_ts"),
          (col("chunk") * stride + 1).cast("int"), lit(maxTokens)), " "))
      .withColumn("n_chunk_tokens",
        size(slice(col("_graft_ts"),
          (col("chunk") * stride + 1).cast("int"), lit(maxTokens))).cast("long"))
      .drop("_graft_ts")
  }

  /** The STATELESS prefix of [[curate]] for streaming ingest: every
    * stage is a pure per-row projection/filter — decontamination
    * against a precollected eval shingle set ([[Dedup.evalShingleSet]]
    * → [[Dedup.decontaminateStateless]], shingles embed as one
    * literal), the quality gate, and split assignment (id-keyed md5
    * uniform) — so the SAME code drives `readStream` sources unchanged
    * (StreamOpsSpec asserts stream ≡ batch row-for-row). Deduplication,
    * rebalancing, and packing need cross-row state: run those
    * batch-side on the accumulated corpus ([[curate]] /
    * [[curateWith]]); this prefix is the ingest-time filter that keeps
    * contaminated and low-quality rows out of the stored corpus in the
    * first place. Returns the input columns + (quality, split). */
  def curateStateless(docs: DataFrame, idCol: String, textCol: String,
                      evalShingles: Array[String] = Array.empty,
                      decontamK: Int = 3, maxShared: Long = 1L,
                      minQuality: Double = 0.5,
                      splits: Seq[(String, Double)] =
                        Seq(("train", 0.75), ("val", 0.125), ("test", 0.125)),
                      salt: String = "cu"): DataFrame = {
    val clean =
      if (evalShingles.isEmpty) docs
      else Dedup.decontaminateStateless(docs, evalShingles, textCol,
        decontamK, maxShared)
    val scored = clean
      .withColumn("quality", TextOps.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
    splitAssign(scored, idCol, splits, salt)
  }

  /** End-to-end corpus curation — the composed training-data pipeline,
    * every stage one of this library's gated operators:
    *  1. exact dedup: keep the minimum id per md5(text) group
    *     ([[exactDedup]]);
    *  2. near-dup dedup: LSH candidates + exact-Jaccard re-check
    *     ([[Dedup.lshVerifiedPairs]]), then ONE representative per
    *     connected near-dup cluster (transitive closure via
    *     [[Dedup.clusterIds]], unlike pairwise keep-first);
    *  3. benchmark decontamination (when `evalDocs` is given): drop
    *     every surviving doc sharing >= `maxShared` distinct
    *     `decontamK`-shingles with the eval set
    *     ([[Dedup.decontaminate]] — eval shingles broadcast, corpus
    *     side map-only);
    *  4. quality gate: [[TextOps.qualityScore]] >= minQuality;
    *  5. deterministic split assignment ([[splitAssign]]);
    *  6. domain rebalancing (when `rebalanceTargets` is non-empty):
    *     downsample to the target mixture over `domainCol`
    *     ([[rebalance]], salt `salt + "_rb"`) — after splitting so the
    *     mixture holds within every split (membership is id-keyed,
    *     independent of the split uniform); `maxRepeat` > 1 upsamples
    *     instead ([[rebalanceRepeat]] — scarce domains repeat up to
    *     maxRepeat epochs, rows gain a `rep` column). Passing
    *     `mixtureAlpha` instead of explicit targets derives them from
    *     the post-quality post-split corpus with the mT5/XLM-R
    *     temperature rule ([[temperatureTargets]] over
    *     [[domainCounts]]) — alpha 0.5 keeps the shares IEEE-portable
    *     (sqrt), so the p9 oracle recomputes them bit-for-bit;
    *  7. sequence packing per (split, shard) ([[packSequences]] —
    *     ordered by (id, rep) when upsampled so repeated rows pack
    *     deterministically).
    * Returns (split, quality[, domain][, rep], id, shard, n_tokens, bin).
    * Every stage is keyed/bucketed — the widest shuffle is the LSH band
    * join; decontam adds a broadcast probe, rebalance one bounded
    * count agg — and the whole flow is engine-portable (the p3/p5/p9
    * DuckDB oracles recompute it end to end, transitive closure
    * included). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             jaccard: Double = 0.6, minQuality: Double = 0.5,
             splits: Seq[(String, Double)] =
               Seq(("train", 0.75), ("val", 0.125), ("test", 0.125)),
             salt: String = "cu",
             capacity: Int = 512, numShards: Int = 8,
             evalDocs: Option[DataFrame] = None,
             decontamK: Int = 3, maxShared: Long = 1L,
             domainCol: Option[String] = None,
             rebalanceTargets: Seq[(String, Double)] = Nil,
             maxRepeat: Int = 1,
             mixtureAlpha: Option[Double] = None): DataFrame =
    curateImpl(docs, idCol, textCol, jaccard, minQuality, splits, salt,
      capacity, numShards, evalDocs, decontamK, maxShared, domainCol,
      rebalanceTargets, maxRepeat, mixtureAlpha, None, None)

  /** [[curate]] over a PRECOMPUTED near-dup artifact: `pairs` is the
    * verified candidate-pair relation over the exact-deduped corpus
    * ([[curatePairs]] — same ngram/jaccard contract), and `clusters`
    * (optional) the transitive closure over those pairs
    * ([[Dedup.clusterIds]] output) when several configurations should
    * also share the one closure pass. Output is IDENTICAL to the
    * self-computing [[curate]] for the same inputs (spec-asserted);
    * what changes is that a multi-configuration run — p3/p5/p7-style
    * pipelines over one corpus — computes signatures, band join,
    * Jaccard re-check, and closure once instead of per configuration. */
  def curateWith(docs: DataFrame, idCol: String, textCol: String,
                 pairs: DataFrame,
                 clusters: Option[DataFrame] = None,
                 minQuality: Double = 0.5,
                 splits: Seq[(String, Double)] =
                   Seq(("train", 0.75), ("val", 0.125), ("test", 0.125)),
                 salt: String = "cu",
                 capacity: Int = 512, numShards: Int = 8,
                 evalDocs: Option[DataFrame] = None,
                 decontamK: Int = 3, maxShared: Long = 1L,
                 domainCol: Option[String] = None,
                 rebalanceTargets: Seq[(String, Double)] = Nil,
                 maxRepeat: Int = 1,
                 mixtureAlpha: Option[Double] = None): DataFrame =
    curateImpl(docs, idCol, textCol, 0.6, minQuality, splits, salt,
      capacity, numShards, evalDocs, decontamK, maxShared, domainCol,
      rebalanceTargets, maxRepeat, mixtureAlpha, Some(pairs), clusters)

  private def curateImpl(docs: DataFrame, idCol: String, textCol: String,
                         jaccard: Double, minQuality: Double,
                         splits: Seq[(String, Double)], salt: String,
                         capacity: Int, numShards: Int,
                         evalDocs: Option[DataFrame],
                         decontamK: Int, maxShared: Long,
                         domainCol: Option[String],
                         rebalanceTargets: Seq[(String, Double)],
                         maxRepeat: Int,
                         mixtureAlpha: Option[Double],
                         precomputedPairs: Option[DataFrame],
                         precomputedClusters: Option[DataFrame]): DataFrame = {
    require(rebalanceTargets.isEmpty || domainCol.nonEmpty,
      "rebalanceTargets needs domainCol")
    require(mixtureAlpha.isEmpty || domainCol.nonEmpty,
      "mixtureAlpha needs domainCol")
    require(mixtureAlpha.isEmpty || rebalanceTargets.isEmpty,
      "pass explicit rebalanceTargets OR mixtureAlpha, not both")
    require(maxRepeat == 1 || rebalanceTargets.nonEmpty || mixtureAlpha.nonEmpty,
      "maxRepeat > 1 needs rebalanceTargets or mixtureAlpha (upsampling is a rebalance mode)")
    val exactKept = exactDedup(docs, idCol, textCol)
    val clusters = precomputedClusters.getOrElse {
      Dedup.clusterIds(precomputedPairs.getOrElse(
        Dedup.lshVerifiedPairs(exactKept, idCol, textCol, 3, jaccard)))
    }
    val dropped = clusters
      .filter(col("node") =!= col("cluster"))
      .select(col("node").as(idCol))
    val deduped = exactKept.join(dropped, Seq(idCol), "left_anti")
    val clean = evalDocs.fold(deduped)(ev =>
      Dedup.decontaminate(deduped, ev, idCol, textCol, decontamK, maxShared))
    val scored = clean
      .withColumn("quality", TextOps.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
    // BOTH rebalance modes run an eager domainCounts collect before the
    // caller's final action (temperature derives targets from it;
    // explicit-target rebalance counts inside rebalance()), so either
    // would recompute the whole dedup lineage (the LSH pipeline) twice
    // without this checkpoint
    val assigned0 = splitAssign(scored, idCol, splits, salt)
    val assigned =
      if (mixtureAlpha.isDefined || rebalanceTargets.nonEmpty)
        assigned0.localCheckpoint()
      else assigned0
    // counts drive the DERIVED (temperature) targets only — never run the
    // collect action when the caller supplied explicit rebalanceTargets
    // (the require above forbids both, but keep the guard local too)
    val counts =
      if (rebalanceTargets.isEmpty)
        mixtureAlpha.map(_ => domainCounts(assigned, domainCol.get))
      else None
    val targets =
      if (rebalanceTargets.nonEmpty) rebalanceTargets
      else counts.filter(_.nonEmpty)
        .map(c => temperatureTargets(c, mixtureAlpha.get)).getOrElse(Nil)
    val upsampled = targets.nonEmpty && maxRepeat > 1
    val mixed =
      // empty-corpus limit under mixtureAlpha: zero rows carry a non-null
      // domain, so no mixture is derivable. Return the same empty result
      // the explicit-rebalanceTargets path yields for an unsatisfiable
      // mixture instead of letting temperatureTargets' require abort —
      // one failure contract for both target modes.
      if (counts.exists(_.isEmpty)) {
        log.warn("curate: mixtureAlpha set but the post-quality corpus " +
          "has no non-null domain rows; returning an EMPTY mixture")
        assigned.filter(lit(false))
      }
      else if (targets.isEmpty) assigned
      else if (upsampled)
        rebalanceRepeat(assigned, idCol, domainCol.get, targets,
          maxRepeat, salt + "_rb")
      else rebalance(assigned, idCol, domainCol.get, targets, salt + "_rb")
    packSequences(mixed, idCol, textCol, capacity, numShards,
      packKeys = Seq("split"), carry = Seq("quality") ++ domainCol.toSeq,
      orderCols = if (upsampled) Seq(idCol, "rep") else Nil)
  }

  /** Deterministic weighted sampling WITHOUT replacement, k per group
    * (Efraimidis & Spirakis 2006, the A-ES scheme): each row draws the
    * reproducible uniform u = md5Uniform(id, salt) and ranks by
    * ln(u)/w descending — the classic exponential-race key — so a row
    * with twice the weight is twice as likely to make the cut, and
    * membership is a pure function of (id, salt, weight): stable
    * across runs, engines, and repartitioning, like every sampler
    * here. ln(u)/w is negative; LARGER (closer to 0) wins, matching
    * u^(1/w) descending without the pow.
    *
    * Cross-engine determinism: the rank key is snapped to 6dp (same
    * contract as t7/p13 — a last-ulp ln/division difference between
    * libms cannot reorder the cut) with the id as the total tie
    * break. One keyed window — no shuffle wider than the group key.
    * Weights must be strictly positive; rows with null/≤0 weight are
    * dropped (they have zero mass). */
  def weightedSamplePerGroup(df: DataFrame, idCol: String,
                             groupCol: String, weight: Column, k: Int,
                             salt: String): DataFrame = {
    requireFreeCols(df, "weightedSamplePerGroup", "es_key", "es_rank")
    val u = hashUniform(col(idCol), salt)
    val key = round(org.apache.spark.sql.functions.log(u) / weight, 6)
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("es_key", key)
      .withColumn("es_rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("es_key").desc, col(idCol))))
      .filter(col("es_rank") <= k)
      .drop("es_key", "es_rank")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling" — public method; no
    * reference counterpart): score every document by how much its
    * hashed-n-gram distribution resembles a TARGET slice of the corpus
    * (a trusted domain, a language, a quality tier) relative to the raw
    * distribution. Features are unigrams + bigrams (bigrams with
    * [[Dedup.shinglesOf]] short-doc clamp semantics) hashed into
    * `buckets` buckets with the engine-portable md5 construction;
    * per-bucket log-ratios λ_b = ln(p̂_target(b) / p̂_raw(b)) under
    * add-`alpha` smoothing; a doc's weight is the sum of λ over its
    * feature OCCURRENCES (a multiset, as in the paper).
    *
    * Cross-engine determinism: λ is snapped to FIXED POINT
    * (round(λ·1e8) as a long) before the per-doc sum, so the aggregate
    * is an integer sum — immune to the float-accumulation-order
    * differences a distributed sum otherwise has vs the sequential
    * oracle — and the final weight is the same BIGINT/1e8 division in
    * both engines.
    *
    * Shape at scale: one explode over features (the only wide data),
    * ONE map-side-combined count aggregation keyed by bucket carrying
    * (raw, target) counts together, a `buckets`-row λ relation that
    * BROADCASTS back onto the feature stream, and one keyed per-doc
    * sum. Nothing quadratic, nothing driver-side. Returns
    * (doc, weight). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 1024,
                  alpha: Double = 1.0): DataFrame = {
    // alpha = 0 would null out lambda for raw-only buckets (log(0)),
    // silently inverting the penalty those features carry
    require(alpha > 0, s"smoothing alpha must be positive, got $alpha")
    val toks = Dedup.tokens(col(textCol))
    // the feature stream feeds BOTH the lambda aggregation and the
    // per-doc probe join — materialize the tokenize+shingle+md5 explode
    // once (the shared-consumer discipline of Dedup.lshVerifiedPairs)
    val feats = docs.select(col(idCol).as("doc"), isTarget.as("tgt"),
        toks.as("toks"))
      .select(col("doc"), col("tgt"),
        explode(concat(col("toks"), Dedup.shinglesOf(col("toks"), 2)))
          .as("gram"))
      .select(col("doc"), col("tgt"),
        (conv(substring(md5(col("gram").cast("binary")), 1, 15), 16, 10)
          .cast("long") % buckets).as("bucket"))
      .localCheckpoint()
    val counts = feats.groupBy(col("bucket")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
    val all = Window.partitionBy(lit(1))
    val lam = counts.select(col("bucket"),
        ((col("ct") + alpha) / (sum(col("ct")).over(all) + alpha * buckets))
          .as("pt"),
        ((col("cr") + alpha) / (sum(col("cr")).over(all) + alpha * buckets))
          .as("pr"))
      .select(col("bucket"),
        round(org.apache.spark.sql.functions.log(col("pt") / col("pr")) * 1e8)
          .cast("long").as("lam_fp"))
    feats.join(broadcast(lam), Seq("bucket"))
      .groupBy(col("doc"))
      .agg((sum(col("lam_fp")).cast("double") / 1e8).as("weight"))
  }

  /** Top-`n` DSIR selection over [[dsirWeights]]: highest weight first,
    * doc id as the deterministic tie break — the "select the k most
    * target-like documents" cut the paper resamples from. */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, n: Int, buckets: Int = 1024,
                 alpha: Double = 1.0): DataFrame =
    dsirWeights(docs, idCol, textCol, isTarget, buckets, alpha)
      .orderBy(col("weight").desc, col("doc"))
      .limit(n)
}
