package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.PortableHash.phash

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent AND partitioning-dependent — rerun
  * the job with different file splits and you get a different sample,
  * which poisons train/test hygiene. Hash-mod sampling keys the
  * decision on the ROW (portable salted hash of its id), so membership
  * is stable across runs, engines, partitionings, and cluster sizes,
  * and it needs no shuffle at all: the sample is a pushed-down filter.
  */
object Sampling {

  /** THE split definition — salt, bucket count, and thresholds live
    * here only (Pipelines.curate and both oracles derive from it):
    * changing them in one place keeps train/test membership in sync
    * everywhere. */
  val splitSalt: Int = 11

  def splitBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(phash(id.cast("string"), splitSalt), lit(10L))

  def splitName(bucket: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(bucket < 8, "train").when(bucket === 8, "dev").otherwise("test")

  /** Deterministic 80/10/10 train/dev/test split by hashed doc id;
    * returns per-(lang, split) counts. The split column is computable
    * by any engine that has md5 — membership never drifts. */
  def sampleSplit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .withColumn("bucket", splitBucket(col("doc_id")))
      .withColumn("split", splitName(col("bucket")))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("split"))
  }

  /** Class-balanced downsampling: at most `cap` docs per language,
    * chosen by hash order (deterministic, unbiased by ingest order).
    * One shuffle on the class key; the per-class sort is bounded by the
    * class size — for skewed classes at extreme scale, pre-filter with
    * a hash-mod gate to approximately cap before the exact window. */
  def sampleBalanced(spark: SparkSession, dir: String, cap: Int = 50): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
    t.documents
      .withColumn("h", phash(col("doc_id").cast("string"), 12))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= cap)
      .select(col("lang"), col("rn"), col("doc_id"))
      .orderBy(col("lang"), col("rn"))
  }

  val shuffleSalt: Int = 17
  val shuffleShards: Int = 32

  /** Deterministic global corpus shuffle — the "shuffle the training
    * corpus identically on every run, engine, and cluster size" step
    * every pretraining pipeline needs before packing. The ordering key
    * is the portable salted hash of the doc id (ties broken by id), so
    * the permutation is a pure function of ids — no seed, no
    * partitioning dependence.
    *
    * The global position is computed WITHOUT a single-partition
    * window: rows shard by pmod(h, 32); each shard ranks locally (one
    * 32-way shuffle); shard offsets are a running sum over the 32-ROW
    * shard-count aggregate (driver-size, the only global object) and
    * join back broadcast. pos is therefore exactly
    * row_number() OVER (ORDER BY shard, h, doc_id) — what the oracle
    * computes with the single window this plan refuses to use — while
    * every data-sized sort stays per-shard. At 100 TB the same plan
    * holds with shards sized to executors. */
  def sampleShuffle(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val hashed = t.documents
      .withColumn("h", phash(col("doc_id").cast("string"), shuffleSalt))
      .withColumn("shard", pmod(col("h"), lit(shuffleShards.toLong)))
    val offsets = hashed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"))
      .withColumn("offset", coalesce(
        sum(col("n")).over(Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("offset"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    hashed
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(offsets), Seq("shard")) // 32 rows by construction
      .select((col("offset") + col("rn")).as("pos"), col("doc_id"), col("h"))
      .orderBy(col("pos"))
  }

  /** Mixture weights for [[sampleMixture]] in milli-epochs per lang:
    * 2500 = every doc appears 2–3 times (2 guaranteed + hash-gated
    * third), 250 = 1-in-4 downsample. The single source of truth for
    * both the operator and its oracle. */
  val mixtureRatesE3: Seq[(String, Long)] = Seq(
    "en" -> 2500L, "de" -> 1000L, "fr" -> 500L, "es" -> 250L,
    "zh" -> 100L)

  val mixtureSalt: Int = 13

  /** Training-mix construction — the "N epochs of Wikipedia, 0.3
    * epochs of CommonCrawl" step every pretraining data pipeline runs:
    * each source's weight w (milli-epochs) replicates every doc
    * ⌊w⌋ times plus one more for the hash-gated w−⌊w⌋ fraction.
    * Membership of the fractional copy is keyed on the portable row
    * hash — stable across runs, engines, and partitionings, exactly
    * like [[sampleSplit]] — so the mix is reproducible and needs NO
    * shuffle to build: copies = narrow `sequence` explode, the gate is
    * a pushed-down filter. Output is the per-lang audit (docs in, rows
    * out, weighted id checksum pinning exact membership). */
  def sampleMixture(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val rate = mixtureRatesE3.tail.foldLeft(
      when(col("lang") === mixtureRatesE3.head._1, mixtureRatesE3.head._2)) {
      case (acc, (l, r)) => acc.when(col("lang") === l, r)
    }.otherwise(0L)
    val mixed = t.documents
      .withColumn("rate_e3", rate)
      .withColumn("copies",
        expr("rate_e3 div 1000") +
          when(pmod(phash(col("doc_id").cast("string"), mixtureSalt),
            lit(1000L)) < col("rate_e3") % 1000, 1L).otherwise(0L))
      .filter(col("copies") > 0) // sequence(1,0) steps DOWN, not empty
      .select(col("lang"), col("doc_id"),
        explode(expr("sequence(1, CAST(copies AS INT))")).as("epoch"))
    mixed.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_rows"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("lang"))
  }

  val temperatureSalt: Int = 29

  /** Temperature-rebalanced language sampling (T = 0.5): sampling
    * weight ∝ √n_lang instead of ∝ n_lang — the standard multilingual
    * rebalancing that upweights low-resource languages without
    * drowning the head. All arithmetic that decides membership is
    * exact-integer and engine-portable: √ is correctly rounded under
    * IEEE-754 in every engine, so s_l = ⌊√n_l · 1e6⌋ is deterministic;
    * rates then come from integer division only (per-lang rate
    * p_e3 = (1000 · target · s_l) div (S · n_l), capped at 1000), and
    * membership is the salted hash-mod gate of [[sampleSplit]].
    * Scale shape: the lang→rate table is one tiny aggregation
    * (|langs| rows) joined back on the lang key; membership is a
    * pushed-down filter — no data-sized shuffle anywhere. */
  def sampleTemperature(spark: SparkSession, dir: String,
      targetPermille: Long = 400L): DataFrame = {
    val t = Tables(spark, dir)
    val counts = t.documents.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"))
      .withColumn("s_l",
        floor(sqrt(col("n_total").cast("double")) * 1e6).cast("long"))
    val totals = counts.agg(sum(col("n_total")).as("corpus_n"),
      sum(col("s_l")).as("s_sum"))
    val rates = counts.crossJoin(broadcast(totals))
      .withColumn("target_rows",
        expr(s"(corpus_n * $targetPermille) div 1000"))
      // 128-bit exact: 1000·target·s_l overflows Int64 for corpora
      // past ~1e9 docs (s_l carries a 1e6 factor); DECIMAL(38,0)
      // here = HUGEINT in the oracle, same integral quotient
      .withColumn("p_e3",
        least(lit(1000L),
          expr("""CAST((CAST(1000 AS DECIMAL(38,0)) * target_rows * s_l)
                 div (CAST(s_sum AS DECIMAL(38,0)) * n_total) AS LONG)""")))
      .select(col("lang"), col("n_total"), col("p_e3"))
    t.documents.join(broadcast(rates), Seq("lang"))
      .filter(pmod(phash(col("doc_id").cast("string"), temperatureSalt),
        lit(1000L)) < col("p_e3"))
      .groupBy(col("lang"))
      .agg(first(col("n_total")).as("n_total"),
        first(col("p_e3")).as("p_e3"),
        count(lit(1)).as("n_sampled"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("lang"))
  }

  val budgetSalt: Int = 41
  val budgetPermille: Long = 400L

  /** Token-budget mixture cut — the "take the first B tokens of each
    * source" step that turns per-source epoch weights into an actual
    * token-counted training mix: docs are ordered by the portable
    * salted hash of their id (stable across runs/engines, unbiased by
    * ingest order) and kept while the lang's running token total stays
    * within its budget (40% of the lang's tokens here; any budget
    * table plugs in). Membership = a prefix of a deterministic
    * permutation, so re-running with a BIGGER budget strictly extends
    * the sample — the property curriculum schedules rely on.
    *
    * Scale shape: the running total is NEVER a per-lang single
    * partition. Rows shard by pmod(h, 32); each (lang, shard) cumsums
    * locally (bounded by shard size), shard token-offsets come from
    * the |langs|×32-row aggregate (driver-size, broadcast back), and
    * the global running total is offset + local — exactly the
    * [[sampleShuffle]] decomposition with SUM in place of COUNT. The
    * oracle checks it with the single per-lang window this plan
    * refuses to use. */
  def sampleTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val docs = t.documents
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .withColumn("h", phash(col("doc_id").cast("string"), budgetSalt))
      .withColumn("shard", pmod(col("h"), lit(shuffleShards.toLong)))
    val budgets = docs.groupBy(col("lang"))
      .agg(sum(col("n_toks")).as("total_toks"))
      .withColumn("budget_toks",
        expr(s"(total_toks * $budgetPermille) div 1000"))
      .select(col("lang"), col("budget_toks"))
    val localW = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offW = Window.partitionBy(col("lang")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy(col("lang"), col("shard"))
      .agg(sum(col("n_toks")).as("sh_toks"))
      .withColumn("tok_offset",
        coalesce(sum(col("sh_toks")).over(offW), lit(0L)))
      .select(col("lang"), col("shard"), col("tok_offset"))
    docs
      .withColumn("local_cum", sum(col("n_toks")).over(localW))
      .join(broadcast(offsets), Seq("lang", "shard")) // |langs|*32 rows
      .join(broadcast(budgets), Seq("lang"))          // |langs| rows
      .filter(col("tok_offset") + col("local_cum") <= col("budget_toks"))
      .groupBy(col("lang"))
      .agg(first(col("budget_toks")).as("budget_toks"),
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("toks_kept"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("lang"))
  }

  /** Leakage-safe train/dev/test split: near-duplicate documents must
    * never straddle a split boundary (a test doc with a train-set
    * near-twin is contamination, not evaluation), so the split
    * decision is keyed on the document's DEDUP COMPONENT — MinHash-LSH
    * pair graph connected components, singletons their own component —
    * instead of the document id. Split-purity of every component then
    * holds by construction on any engine: the split is a pure function
    * of the component label. Output is the per-split audit (docs,
    * components, id checksum pinning exact membership).
    *
    * Scale shape: inherits MinHash-LSH's band-key equi-join and CC's
    * shuffle-bounded label propagation; the split stamp itself is a
    * narrow hash of the component label, and the audit is a 3-row
    * aggregate. */
  def sampleLeakageSafe(spark: SparkSession, dir: String): DataFrame =
    leakageSafeStamped(spark, dir)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("component")).as("n_components"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("split"))

  /** Per-document (doc_id, component, split) frame behind
    * [[sampleLeakageSafe]] — exposed so the zero-straddler law can be
    * asserted on the exact frame the audit aggregates. */
  def leakageSafeStamped(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pairs = Dedup.minhashCandidates(Dedup.shingles(t))
      .select(col("a").as("src"), col("b").as("dst"))
    val labels = Cluster.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("label"))
    t.documents.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("label"), col("doc_id")))
      .withColumn("split", splitName(splitBucket(col("component"))))
  }

  val tierSalt: Int = 37

  /** Quality-tier rates in e3: the DCLM-style "sample good data more"
    * dial — single source of truth for operator and oracle. Tiers cut
    * by FIXED diversity thresholds (calibrated constants, the
    * production norm) rather than corpus quantiles: the tier of a doc
    * then never depends on what else is in the batch, so membership
    * is stable under corpus growth and needs no global sort. */
  val tierRatesE3: Seq[(String, Long)] = Seq(
    "t1_low" -> 100L, "t2_mid" -> 300L, "t3_good" -> 600L,
    "t4_best" -> 1000L)

  /** Quality-weighted sampling: per-doc token-diversity score →
    * fixed-threshold tier → per-tier hash-gated keep rate. Everything
    * is narrow (score, tier, gate are all map-side; the only shuffle
    * is the |tiers|-row audit rollup), and membership is the same
    * portable salted-hash discipline as [[sampleSplit]]. */
  def sampleQualityTiers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val rate = tierRatesE3.tail.foldLeft(
      when(col("tier") === tierRatesE3.head._1, tierRatesE3.head._2)) {
      case (acc, (l, r)) => acc.when(col("tier") === l, r)
    }.otherwise(0L)
    t.documents
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
      .withColumn("diversity_e4",
        expr("(20000 * n_distinct + n_tokens) div (2 * n_tokens)"))
      .withColumn("tier",
        when(col("diversity_e4") < 5000, "t1_low")
          .when(col("diversity_e4") < 6500, "t2_mid")
          .when(col("diversity_e4") < 8000, "t3_good")
          .otherwise("t4_best"))
      .withColumn("p_e3", rate)
      .withColumn("kept",
        pmod(phash(col("doc_id").cast("string"), tierSalt),
          lit(1000L)) < col("p_e3"))
      .groupBy(col("tier"))
      .agg(first(col("p_e3")).as("p_e3"),
        count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("doc_id")).otherwise(0L))
          .as("id_checksum"))
      .orderBy(col("tier"))
  }
}
