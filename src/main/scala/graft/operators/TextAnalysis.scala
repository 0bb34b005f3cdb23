package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.PortableHash.phash

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * narrow transformations (no shuffle except final small aggregations)
  * over codegen'd built-ins — at 100 TB these run at scan speed.
  */
object TextAnalysis {

  /** Per-"language" token profiles for the n-gram/stopword heuristic.
    * Profiles are over the corpus vocabulary; real deployments would
    * plug in per-language character-n-gram tables the same way. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "key", "row"),
    "de" -> Seq("agg", "hash", "batch", "window"),
    "es" -> Seq("data", "query", "small", "stream"),
    "fr" -> Seq("join", "line", "sort", "order"),
    "zh" -> Seq("big", "merge", "spark", "table"))

  /** Language ID: argmax of profile-token hits with a deterministic
    * preference-order tie-break; confusion-matrix style output
    * (actual lang × predicted) with counts.
    *
    * One explode + hash aggregation (whole-stage codegen) rather than
    * per-row array lambdas — `filter(toks, ...)` higher-order functions
    * run interpreted and cost ~8× more at sf0.1. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val tok = t.documentsSpread.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("tok"))
    val scoreCols = profiles.map { case (l, ws) =>
      sum(when(col("tok").isin(ws: _*), 1).otherwise(0)).as(s"s_$l")
    }
    val scored = tok.groupBy(col("doc_id"), col("lang"))
      .agg(scoreCols.head, scoreCols.tail: _*)
    val langs = profiles.map(_._1)
    // first lang (in profile order) whose score >= all others wins
    val predicted = langs.foldRight(lit("und")) { case (l, els) =>
      val ge = langs.filter(_ != l)
        .map(o => col(s"s_$l") >= col(s"s_$o"))
        .reduce(_ && _)
      when(ge, lit(l)).otherwise(els)
    }
    scored.withColumn("predicted", predicted)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Quality scoring: per-doc integer-exact stats — char/token counts,
    * lexical diversity (distinct/total tokens, e4 fixed-point), and a
    * boolean quality gate. No float nondeterminism anywhere. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documentsSpread
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
      .withColumn("diversity_e4",
        expr("(20000 * n_distinct + n_tokens) div (2 * n_tokens)"))
      .withColumn("is_quality",
        col("n_tokens") >= 30 && col("n_distinct") * 2 >= col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Token counting, whitespace + BPE-ish regex segmentation
    * ([a-z]+ | digits | single non-alnum), aggregated per language. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documentsSpread
      .withColumn("n_ws", size(split(col("text"), " ")))
      .withColumn("n_bpe", regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")))
      .groupBy(col("lang"))
      .agg(
        sum(col("n_ws")).as("ws_tokens"),
        sum(col("n_bpe")).as("bpe_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("lang"))
  }

  /** Document fingerprinting: md5-prefix fingerprint of the normalized
    * text + a 64-way portable-hash shard bucket (the rolling-hash role:
    * stable id + partition key for incremental dedup). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val normed = regexp_replace(lower(col("text")), "[^a-z0-9]", "")
    t.documentsSpread
      .select(
        col("doc_id"),
        substring(md5(normed), 1, 8).as("fp8"),
        pmod(phash(normed, 7), lit(64L)).as("shard"))
      .orderBy(col("doc_id"))
  }

  /** Top-3 terms per document by quantized TF-IDF. IDF is the rational
    * form `(10000·N) div df` (reciprocal document frequency in 1e-4
    * units) — no floating log, so scores are exact integers on every
    * engine. Two shuffles: per-(doc, term) counts, then the term-keyed
    * join against document frequencies; the corpus size N arrives via a
    * broadcast single-row aggregate, never a driver collect. */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val tf = t.documentsSpread
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = t.documents.agg(count(lit(1)).as("n_total"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    tf.join(dfc, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("idf_e4", expr("(10000 * n_total) div df"))
      .withColumn("score", col("tf") * col("idf_e4"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("tok"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"), col("rn"))
  }

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** PII redaction (the scrubbing pass of a training-data pipeline):
    * emails → &lt;EMAIL&gt;, 7+-digit runs → &lt;NUM&gt;. A narrow
    * regexp_replace chain — scan-speed at any corpus size. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, emailRe, "<EMAIL>"),
      "[0-9]{7,}", "<NUM>")

  /** Oracle-gated redaction drive: deterministic synthetic PII appended
    * per doc (the id makes some digit runs cross the 7-digit redaction
    * threshold and others not, exercising both branches); output pinned
    * to counts + an md5 of the redacted text. */
  def textRedactPii(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val raw = concat(col("text"), lit(" contact u"),
      col("doc_id").cast("string"), lit("@example.com or ref 90210"),
      pmod(col("doc_id"), lit(100)).cast("string"))
    t.documentsSpread.select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"),
        regexp_count(col("raw"), lit(emailRe)).cast("long").as("n_emails"),
        md5(redactPii(col("raw"))).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  /** Sliding-window token chunking — the context-window packing
    * precursor: every document becomes ⌈(n−size)/stride⌉+1 chunks of up
    * to `chunkSize` tokens, consecutive chunks overlapping by
    * size−stride tokens (the overlap LLM pretraining uses so no
    * boundary context is lost). Pure narrow work: one `sequence`
    * explode per doc (bounded by n/stride) and an array slice — no
    * shuffle at all, scan-speed at 100 TB. Chunks are pinned by md5 so
    * the oracle compares content, not array plumbing. */
  def chunk(spark: SparkSession, dir: String,
      chunkSize: Int = 20, stride: Int = 15): DataFrame = {
    val t = Tables(spark, dir)
    t.documentsSpread
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast("long"))
      // guard the CASE: Spark's sequence(1, 0) steps DOWNWARD, it is
      // not empty like a half-open range — n_chunks must stay >= 1
      .withColumn("n_chunks", expr(
        s"CASE WHEN n <= $chunkSize THEN 1L " +
          s"ELSE 1 + ((n - $chunkSize + $stride - 1) div $stride) END"))
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(0, n_chunks - 1)")).as("chunk_id"))
      .withColumn("chunk", expr(s"slice(toks, chunk_id * $stride + 1, $chunkSize)"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Character-bigram language-model quality score — the CCNet-style
    * "how corpus-like is this document" filter, with the corpus itself
    * as the training set. Training: one pass explodes each position into
    * its bigram and hash-aggregates counts c(ab) and prefix totals
    * c(a·) (alphabet² states — CONSTANT size by construction, the
    * legitimate broadcast). Scoring: a second pass aggregates per-doc
    * bigram counts and joins the broadcast model.
    *
    * No floating log anywhere: per-bigram conditional probability is
    * the exact rational (10⁶·c(ab)) div c(a·), and the doc score is the
    * integer mean over its bigrams — bit-identical on every engine and
    * every partitioning, where a Σlog(p) fold would drift by summation
    * order. */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val chars = t.documentsSpread
      .select(col("doc_id"), lower(col("text")).as("lt"))
      .filter(length(col("lt")) >= 2)
      .select(col("doc_id"),
        explode(expr("sequence(1, length(lt) - 1)")).as("i"), col("lt"))
      .select(col("doc_id"), expr("substring(lt, CAST(i AS INT), 2)").as("bg"))
    val model = chars.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
      .withColumn("c1", sum(col("c2")).over(
        Window.partitionBy(substring(col("bg"), 1, 1))))
      .withColumn("p_e6", expr("(1000000 * c2) div c1"))
      .select(col("bg"), col("p_e6"))
    chars.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("m"))
      .join(broadcast(model), Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("m") * col("p_e6")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("s div n_bigrams").as("lm_score_e6"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark-contamination scan (the decontamination step): corpus
    * documents sharing any 3-token shingle with the benchmark set,
    * with overlap counts. The benchmark side is SMALL BY DEFINITION
    * (eval sets are thousands of docs against a corpus of billions) →
    * its distinct shingles broadcast; the corpus is touched once and
    * never self-joins. Here docs with id ≡ 0 (mod 97) stand in for the
    * benchmark. */
  def textContamination(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val sh = Dedup.shingles(t)
    val isBench = pmod(col("doc_id"), lit(97)) === 0
    val bench = sh.filter(isBench).select(col("shingle")).distinct()
    val corpus = sh.filter(!isBench)
    corpus.join(broadcast(bench), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_shingles"))
      .orderBy(col("doc_id"))
  }

  /** Sub-document (chunk-level) deduplication: the corpus-wide dedup
    * granularity below whole documents — repeated boilerplate chunks
    * are kept at their FIRST occurrence (ordered by doc, then chunk
    * position) and counted as dropped everywhere else. Zero-overlap
    * chunks so the kept/dropped accounting partitions the token
    * stream. One shuffle on the chunk hash (uniform by construction),
    * one on doc_id for the rollup. */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val ch = chunk(spark, dir, chunkSize = 20, stride = 20)
    val w = Window.partitionBy(col("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
    ch.withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"))
      .withColumn("n_dropped", col("n_chunks") - col("n_kept"))
      .orderBy(col("doc_id"))
  }

  /** Word-trigram repetition ratio — the Gopher-style "fraction of
    * duplicated n-grams" quality rule: highly repetitive documents
    * (boilerplate, keyword stuffing, generation loops) score high and
    * get filtered. Positions explode to trigrams (codegen'd — no
    * higher-order lambdas), then two hash aggregates; the ratio is an
    * exact e6 rational. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val tri = t.documentsSpread
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") >= 3) // shorter docs have no trigram signal
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(1, CAST(n - 2 AS INT))")).as("i"))
      .select(col("doc_id"),
        concat_ws(" ", expr("element_at(toks, i)"),
          expr("element_at(toks, i + 1)"),
          expr("element_at(toks, i + 2)")).as("tri"))
    tri.groupBy(col("doc_id"), col("tri")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_tri"),
        count(lit(1)).as("n_distinct_tri"),
        max(col("c")).cast("long").as("max_tri_count"))
      .withColumn("rep_e6",
        expr("(1000000 * (n_tri - n_distinct_tri)) div n_tri"))
      .orderBy(col("doc_id"))
  }

  /** BM25-ranked full-text search — the reference's entire query
    * surface is Elasticsearch match queries over the `datalake-*`
    * indices (SURVEY §2.1-S8, §2.5-A12;
    * `/root/reference/Send_Data_To_DataLake/Documentations/
    * Vehicle_Dev_Tool.txt` `_search` smoke queries), i.e. BM25-scored
    * relevance ranking. This re-expresses that serving capability
    * Spark-side with ES/Lucene's scoring SHAPE (per-term IDF damping ×
    * saturating TF normalized by document length, k1=1.2, b=0.75) in
    * exact integer arithmetic: the float `log` IDF is replaced by the
    * rational reciprocal-df form `(10⁴·N) div df` (same family as
    * [[tfidf]]), so scores are bit-identical on every engine and
    * partitioning.
    *
    * Scale shape: the `isin(terms)` filter runs AT the explode — only
    * the query terms' postings ever reach a shuffle (the inverted-index
    * access path; a standing index table keyed by term makes the scan
    * incremental, same plan from there). Corpus stats (N, Σdl) arrive
    * as a broadcast single-row aggregate, and the final top-k is
    * TakeOrderedAndProject — partial per partition, never a global
    * sort. */
  def bm25Search(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "join", "vector"),
      topK: Int = 10): DataFrame = {
    val t = Tables(spark, dir)
    // spread: the ~130-tokens/doc explode must own its parallelism,
    // not inherit the corpus's split count (documentsSpread — the
    // r9/r10 single-split lesson, same as the dedup explodes)
    val docs = t.documentsSpread.select(col("doc_id"),
      split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("t_toks"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfc), Seq("tok"))
      .crossJoin(broadcast(stats))
      // (dl/avgdl) in e3; k1·(1−b+b·dl/avgdl) in e4 with k1=1.2, b=0.75
      .withColumn("idf_e4", expr("(10000 * n_docs) div df"))
      .withColumn("dlr_e3", expr("(1000 * dl * n_docs) div t_toks"))
      .withColumn("sat_e4", expr("12 * (250 + (750 * dlr_e3) div 1000)"))
      // tf·(k1+1)/(tf + k1·(…)) in e3 — saturates at 2200
      .withColumn("ratio_e3",
        expr("(tf * 2200 * 10000) div (tf * 10000 + sat_e4)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("idf_e4") * col("ratio_e3")).as("score_e7"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score_e7").desc, col("doc_id"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_e7").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("score_e7"), col("n_terms"))
      .orderBy(col("rank"))
  }

  /** BM25 served from a STANDING inverted index — the "index" half of
    * the ES story, and the scale path [[bm25Search]]'s scaladoc
    * promises: the corpus is tokenized ONCE into a term-clustered
    * postings table (tok, doc_id, dl, tf) in the tx-table format
    * (range-partitioned by term, Bloom bitmap on term per file), plus
    * a one-row corpus-stats table. A query then touches only the
    * files whose Bloom may contain its terms — point reads, no corpus
    * rescan, no re-tokenization — and scores identically to the scan
    * path (the oracle for this query IS [[bm25Search]]'s oracle:
    * an index is an optimization, never a semantic). At 100 TB the
    * build is one pass, appends are incremental
    * (`TxTable.append`), and per-query work is proportional to the
    * query terms' postings, not the corpus. */
  /** A standing FTS index: tx-table roots plus the corpus stats PINNED
    * at build time (the ES semantic — index-wide statistics live with
    * the index and serve from memory; queries never re-aggregate the
    * corpus). */
  final case class FtsIndex(postings: String, stats: String,
      nDocs: Long, tToks: Long)

  /** Standing FTS index registry: corpus dir → index. One build per
    * corpus per process; `text_fts_build` refreshes it (last build
    * wins), `bm25Indexed` get-or-builds. */
  private val ftsStanding =
    new java.util.concurrent.ConcurrentHashMap[String, FtsIndex]()

  /** One pass over the corpus into the standing postings + stats
    * tables: (tok, doc_id, dl, tf, df) term-range-partitioned with a
    * Bloom bitmap on `tok` per file, and the one-row (n_docs, Σdl)
    * stats table. `df` is the term-dictionary statistic denormalized
    * onto each posting at build (what Lucene keeps per term) so a
    * query reads its postings ONCE — no second per-query pass to
    * re-count document frequency. The window that computes it runs on
    * the same range partitioning the layout needs anyway (range on
    * `tok` satisfies the window's clustering), so it costs a sort, not
    * a shuffle. Returns the registered standing index for `dir`. */
  private def buildFts(spark: SparkSession, dir: String): FtsIndex = {
    import graft.lake.TxTable
    import graft.core.Scratch
    // spread: the build's corpus tokenize+explode is the whole cost —
    // split-bound at x100 it ran on 1 core of 32 (documentsSpread)
    val docs = Tables(spark, dir).documentsSpread.select(col("doc_id"),
      split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val pDir = Scratch.fresh("tx_fts")
    TxTable(spark, pDir).append(
      docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
        .groupBy(col("tok"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .repartitionByRange(8, col("tok"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))
        ,
      bloomCols = Seq("tok"))
    val sDir = Scratch.fresh("tx_fts_stats")
    val txStats = TxTable(spark, sDir)
    // r16 (guide §1.2): the stats row derives from the JUST-WRITTEN
    // postings — a column-pruned read of (doc_id, dl) — instead of a
    // second full corpus scan + tokenize. Exact: dl is functionally
    // dependent on doc_id and every doc has >= 1 posting (split of ""
    // is [""]), so distinct (doc_id, dl) is one row per document.
    txStats.append(TxTable(spark, pDir).read()
      .select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_toks")))
    val st = txStats.read().head() // two scalars, paid once at build
    // the stats root lives IN the index layout (manifest beside the
    // postings) so a cold session reloads the handle from disk
    // ([[loadFts]], VERDICT r13 task 4) instead of rebuilding
    Similarity.writeIndexManifest(pDir, "family" -> "fts", "stats" -> sDir)
    val idx = FtsIndex(pDir, sDir,
      st.getLong(st.fieldIndex("n_docs")), st.getLong(st.fieldIndex("t_toks")))
    ftsStanding.put(dir, idx)
    idx
  }

  /** Cold-session loader: reconstruct (and re-register) the standing
    * FTS handle from the on-disk layout alone — the manifest names the
    * stats root, whose one-row table carries the two corpus scalars,
    * so a fresh JVM serves from the standing postings without ever
    * re-tokenizing the corpus. */
  def loadFts(spark: SparkSession, dir: String,
      postingsRoot: String): FtsIndex = {
    import graft.lake.TxTable
    val m = Similarity.readIndexManifest(postingsRoot)
    Similarity.requireFamily(m, postingsRoot, "fts")
    val sDir = Similarity.manifestKey(m, postingsRoot, "stats")
    val st = TxTable(spark, sDir).read().head()
    val idx = FtsIndex(postingsRoot, sDir,
      st.getLong(st.fieldIndex("n_docs")), st.getLong(st.fieldIndex("t_toks")))
    ftsStanding.put(dir, idx)
    idx
  }

  /** Test hook: forget the standing FTS registration (simulates the
    * cold session [[loadFts]] exists for) without touching disk. */
  private[graft] def dropFtsForTest(dir: String): Unit = {
    ftsStanding.remove(dir)
    ()
  }

  /** Get-or-build the standing index (idempotent; used by Bench's
    * warm-up so the serving query times point reads, not the build —
    * what a deployment pays per query). */
  def ensureFts(spark: SparkSession, dir: String): FtsIndex = {
    val hit = ftsStanding.get(dir)
    if (hit != null) hit else buildFts(spark, dir)
  }

  /** The BUILD half of the indexed-BM25 story as its own declared
    * query — it owns the two tx commits (the one-pass tokenize +
    * postings write `bm25Indexed` serves from) and returns the index
    * summary for the oracle: postings count, vocabulary size, and the
    * corpus stats row. Always builds fresh (it is the build-cost
    * measurement) and re-registers the standing index. */
  def ftsBuild(spark: SparkSession, dir: String): DataFrame = {
    import graft.lake.TxTable
    val idx = buildFts(spark, dir)
    val posts = TxTable(spark, idx.postings).read()
    posts
      .agg(count(lit(1)).as("n_postings"),
        countDistinct(col("tok")).as("n_terms"))
      .crossJoin(TxTable(spark, idx.stats).read())
      .select(col("n_postings"), col("n_terms"), col("n_docs"),
        col("t_toks"))
  }

  def bm25Indexed(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "join", "vector"),
      topK: Int = 10): DataFrame = {
    import graft.lake.TxTable
    val idx = ensureFts(spark, dir)
    val tx = TxTable(spark, idx.postings)
    // query: ONE Bloom-pruned multi-term point read — the posting
    // lists of all query terms in a single index access. df travels ON
    // the postings (term-dictionary stat, see [[buildFts]]) and the
    // corpus stats are the build-time-pinned scalars, so serving is a
    // single pass: no per-query stats scan, no df re-aggregation.
    bm25ScoreTail(tx.readWhereIn("tok", terms.map(lit(_))),
      idx.nDocs, idx.tToks, topK)
  }

  /** Shared exact-integer BM25 scoring tail over postings that already
    * carry `df` (denormalized at build, or segment-merged at read by
    * the incremental path — [[graft.streaming.StreamFts]]): saturation
    * in e-units, partial top-k, rank window over topK rows. */
  private[graft] def bm25ScoreTail(posts: DataFrame, nDocs: Long,
      tToks: Long, topK: Int): DataFrame =
    posts
      .withColumn("n_docs", lit(nDocs))
      .withColumn("t_toks", lit(tToks))
      .withColumn("idf_e4", expr("(10000 * n_docs) div df"))
      .withColumn("dlr_e3", expr("(1000 * dl * n_docs) div t_toks"))
      .withColumn("sat_e4", expr("12 * (250 + (750 * dlr_e3) div 1000)"))
      .withColumn("ratio_e3",
        expr("(tf * 2200 * 10000) div (tf * 10000 + sat_e4)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("idf_e4") * col("ratio_e3")).as("score_e7"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score_e7").desc, col("doc_id"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_e7").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("score_e7"), col("n_terms"))
      .orderBy(col("rank"))


  /** The standing-index CHURN lifecycle as one verified query —
    * append → fragment → compact → serve (VERDICT r8 task 3), the
    * maintenance cycle every production index lives through: the
    * corpus arrives as `slices` separate commits (each a term-
    * clustered micro-batch append, fragmenting the table to
    * slices × files), `TxTable.compact` rewrites the fragments back
    * into `targetFiles` term-range-clustered files WITH fresh Bloom
    * bitmaps (the build-time layout — see [[graft.lake.TxTable
    * .compact]]'s clusterBy/bloomCols), and BM25 serves from the
    * compacted snapshot with one multi-term point read.
    *
    * Scores are byte-equal to the full-corpus scan — every document
    * lands in exactly one slice, df merges across segments at read
    * ([[graft.streaming.StreamFts]]'s semantic), stats are the sum of
    * the per-commit rows — so this query shares [[bm25Search]]'s
    * oracle: neither incremental commits nor compaction may ever
    * change an answer. The file-count bound after compaction is
    * asserted by `TxTableSpec`. */
  def ftsChurn(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "join", "vector"),
      topK: Int = 10, slices: Int = 10, targetFiles: Int = 8): DataFrame = {
    import graft.lake.TxTable
    import graft.core.Scratch
    val (idx, st) = ftsChurnTables(spark, dir, slices, targetFiles,
      Scratch.fresh("tx_fts_churn"), Scratch.fresh("tx_fts_churn_stats"))
    val stRow = st.read()
      .agg(sum(col("n_docs")).as("n"), sum(col("t_toks")).as("t")).head()
    val posts = idx.readWhereIn("tok", terms.map(lit(_)))
    val dfc = posts.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    bm25ScoreTail(posts.join(broadcast(dfc), Seq("tok")),
      stRow.getLong(0), stRow.getLong(1), topK)
  }

  /** The lifecycle's table half, shared with the spec that asserts
    * the post-compaction file bound: `slices` fragmented appends into
    * fresh postings + stats tables at the given roots, then a
    * layout-restoring compaction of both. */
  private[graft] def ftsChurnTables(spark: SparkSession, dir: String,
      slices: Int, targetFiles: Int, postingsRoot: String,
      statsRoot: String): (graft.lake.TxTable, graft.lake.TxTable) = {
    import graft.lake.TxTable
    // r16 (guide §1.2 "don't compute things you throw away"): the old
    // loop re-scanned the corpus and re-ran the tokenize per slice AND
    // per stats row — 2·slices parquet scans, 2 full tokenize passes.
    // ONE slice-tagged tokenize pass is persisted, RANGE-clustered by
    // slice (hashing 10 values into 10 partitions would collide, guide
    // §2.5) so each cached batch holds one slice and the per-slice
    // filters below prune batches via the in-memory min/max stats.
    // Both commit kinds read it: postings explode+group their slice's
    // cached rows (grouping keys include doc_id, so each slice's
    // postings are bit-identical to tokenizing that slice alone), and
    // the stats rows are the same count/sum(dl) aggregate as before,
    // now over cache. The commits (and the fragmentation the lifecycle
    // models) are unchanged.
    val docs = Tables(spark, dir).documentsSpread
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .withColumn("slice", pmod(col("doc_id"), lit(slices)))
      .repartitionByRange(slices, col("slice"))
      .persist()
    val idx = TxTable(spark, postingsRoot)
    val st = TxTable(spark, statsRoot)
    try {
      for (i <- 0 until slices) {
        val slice = docs.filter(col("slice") === i)
        idx.append(slice
          .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
          .groupBy(col("tok"), col("doc_id"), col("dl"))
          .agg(count(lit(1)).as("tf"))
          .repartitionByRange(4, col("tok")),
          bloomCols = Seq("tok"))
        st.append(slice.agg(count(lit(1)).as("n_docs"),
          sum(col("dl")).as("t_toks")))
      }
    } finally docs.unpersist(blocking = false)
    idx.compact(targetFiles, bloomCols = Seq("tok"),
      clusterBy = Seq("tok"))
    st.compact(1)
    (idx, st)
  }

  /** Fuzzy full-text search — ES `match` with `fuzziness: 1`: each
    * query term expands to every VOCABULARY token within edit
    * distance 1, a doc scores each query term as the BEST of its
    * matched expansions (ES's dis-max over fuzzy expansions — summing
    * them would double-count one intent), and per-doc BM25 sums over
    * query terms. Same exact-integer BM25 pipeline as [[bm25Search]],
    * with each expansion scored at ITS OWN df (ES behavior: rare
    * misspellings rank high).
    *
    * Scale shape: expansion runs query-terms × vocabulary — the
    * vocabulary is the corpus's distinct-token table (Heaps-law
    * sublinear), the query side is literal-bounded, so the cross is
    * a broadcast of constants over an aggregate-sized table; matched
    * expansions then equi-join the postings with NO hint (their size
    * is data-dependent — AQE decides). Tie-breaks are total
    * (term_score, then token), so both engines agree bit-for-bit. */
  def fuzzySearch(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spak", "joinn", "vectr"),
      topK: Int = 10): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val docs = t.documentsSpread.select(col("doc_id"),
      split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("t_toks"))
    val toks = docs.select(col("doc_id"), col("dl"),
      explode(col("toks")).as("tok"))
    val qterms = terms.toDF("qt")
    val expanded = toks.select(col("tok")).distinct()
      .crossJoin(broadcast(qterms))
      .filter(levenshtein(col("qt"), col("tok")) <= 1)
    val tf = toks.join(expanded, Seq("tok"))
      .groupBy(col("doc_id"), col("dl"), col("qt"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.select(col("doc_id"), col("tok")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfc, Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_e4", expr("(10000 * n_docs) div df"))
      .withColumn("dlr_e3", expr("(1000 * dl * n_docs) div t_toks"))
      .withColumn("sat_e4", expr("12 * (250 + (750 * dlr_e3) div 1000)"))
      .withColumn("ratio_e3",
        expr("(tf * 2200 * 10000) div (tf * 10000 + sat_e4)"))
      .withColumn("term_score", col("idf_e4") * col("ratio_e3"))
    val best = scored.groupBy(col("doc_id"), col("qt"))
      .agg(min(struct((-col("term_score")).as("neg"), col("tok")))
        .as("b"))
      .select(col("doc_id"), col("qt"), (-col("b.neg")).as("term_score"),
        col("b.tok").as("matched_tok"))
    best.groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score_e7"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score_e7").desc, col("doc_id"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_e7").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("score_e7"), col("n_terms"))
      .orderBy(col("rank"))
  }

  /** Hybrid retrieval — the lexical arm ([[bm25Search]]) fused with
    * the semantic arm (exact cosine top-k for a query embedding) by
    * Reciprocal Rank Fusion, the standard score-free fusion of a
    * modern retrieval/RAG pipeline: RRF(d) = Σ_arms 1/(60 + rank_d),
    * here in exact e6 integers (`1000000 div (60 + rank)`) so both
    * engines agree bit-for-bit. A document missing from an arm
    * contributes nothing (its rank surfaces as the 0 sentinel).
    *
    * Scale shape: each arm is an already-top-k result — the arms carry
    * the corpus-scale story (indexed BM25 point reads, IVF ANN); the
    * fusion itself joins two ≤kArm-row frames and ranks ≤2·kArm rows —
    * metadata-sized at ANY corpus size, exactly like ES's own
    * `rrf` retriever which fuses per-shard top-k lists. */
  def hybridRrf(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "join", "vector"),
      qid: Long = 0L, kArm: Int = 20, topK: Int = 10): DataFrame = {
    val lex = bm25Search(spark, dir, terms, kArm)
      .select(col("doc_id"), col("rank").as("lex_rank"))
    val sem = Similarity.topk(spark, dir, kArm, sameLabelOnly = false)
      .filter(col("qid") === qid)
      .select(col("nid").as("doc_id"), col("rn").as("sem_rank"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_e6",
        coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + sem_rank)"), lit(0L)))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_e6").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("rank"), col("doc_id"), col("rrf_e6"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0L)).as("sem_rank"))
      .orderBy(col("rank"))
  }

  /** ES `bool` query — the workhorse composite of real ES traffic:
    * filter context (term + range clauses, unscored, cacheable) gating
    * a scored `match` clause. The ES semantic detail that matters:
    * IDF/avgdl statistics are INDEX-WIDE — a filter narrows the
    * candidate set but never changes term statistics — so df, N and
    * Σdl here come from the full corpus while only filtered docs are
    * scored and ranked. Same exact-integer BM25 shape as
    * [[bm25Search]]; the filter is a pushed-down predicate on the
    * scoring join's doc side, so the postings shuffle carries only the
    * query terms and the rank only the filtered candidates. */
  def boolSearch(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "join", "vector"),
      filterLang: String = "en", minChars: Long = 300L,
      topK: Int = 10): DataFrame = {
    val t = Tables(spark, dir)
    val docs = t.documentsSpread.select(col("doc_id"), col("lang"),
      col("n_chars"), split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("t_toks"))
    val tf = docs
      .select(col("doc_id"), col("lang"), col("n_chars"), col("dl"),
        explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("lang"), col("n_chars"), col("dl"),
        col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.filter(col("lang") === filterLang && col("n_chars") >= minChars)
      .join(broadcast(dfc), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_e4", expr("(10000 * n_docs) div df"))
      .withColumn("dlr_e3", expr("(1000 * dl * n_docs) div t_toks"))
      .withColumn("sat_e4", expr("12 * (250 + (750 * dlr_e3) div 1000)"))
      .withColumn("ratio_e3",
        expr("(tf * 2200 * 10000) div (tf * 10000 + sat_e4)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("idf_e4") * col("ratio_e3")).as("score_e7"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score_e7").desc, col("doc_id"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_e7").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("score_e7"), col("n_terms"))
      .orderBy(col("rank"))
  }

  /** ES/Kibana `significant_terms` aggregation — "what terms are
    * unusually frequent in this bucket vs the background corpus", the
    * drill-down analytic behind Kibana's significant-terms panel
    * (A12's family; the reference's dashboards are exactly such
    * per-bucket term analytics). Scoring is ES's default JLH lift:
    * (fg% − bg%) · fg%/bg%, here in exact e6 integer arithmetic so
    * both engines agree bit-for-bit; terms must be POSITIVELY lifted
    * (fg% > bg%) to qualify, as in ES.
    *
    * One explode feeds one (bucket, term) count; foreground totals,
    * background counts, and the global total all derive from that same
    * aggregate (no second corpus scan). The per-bucket top-k is a rank
    * window over the scored terms — cardinality (buckets × vocab),
    * already aggregate-sized, never row-sized. */
  def significantTerms(spark: SparkSession, dir: String,
      topK: Int = 3): DataFrame = {
    val t = Tables(spark, dir)
    val fg = t.documentsSpread
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("f"))
    val fgt = fg.groupBy(col("lang")).agg(sum(col("f")).as("ft"))
    val bg = fg.groupBy(col("tok")).agg(sum(col("f")).as("b"))
    val bgt = fg.agg(sum(col("f")).as("bt"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("jlh").desc, col("tok"))
    fg.join(fgt, Seq("lang")).join(bg, Seq("tok")).crossJoin(bgt)
      .withColumn("fg_e6", expr("(1000000 * f) div ft"))
      .withColumn("bg_e6", expr("(1000000 * b) div bt"))
      .filter(col("fg_e6") > col("bg_e6"))
      // clamp the divisor: a term rarer than 1e-6 of the background
      // floors bg_e6 to 0, and integer div-by-zero would NULL out
      // exactly the highest-lift terms (inverting the ranking on any
      // corpus past ~1M tokens). greatest(bg_e6,1) scores them as
      // "smallest representable background share" — maximal lift,
      // the ES semantic.
      .withColumn("jlh",
        expr("((fg_e6 - bg_e6) * fg_e6) div greatest(bg_e6, 1)"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
      .select(col("lang"), col("rn"), col("tok"), col("f"), col("b"),
        col("jlh"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Corpus-wide boilerplate removal — the RefinedWeb/C4 line-dedup
    * rule at segment granularity: a fixed-width token segment that
    * appears in >= `minDf` DISTINCT documents is boilerplate (nav
    * bars, cookie banners, license headers) and is dropped from EVERY
    * document, survivors reassembling in original order. The corpus
    * is space-separated tokens with no newlines, so "lines" are the
    * zero-overlap `segTokens`-token segments ([[chunk]]'s stride =
    * size family). Differs from [[chunkDedup]] (first occurrence
    * kept) — boilerplate is removed everywhere, including its first
    * occurrence, which is the C4 rule for nav/banner text.
    *
    * Scale shape: one explode to segments, the df aggregate and the
    * join back both keyed on md5(seg) — a 32-char key regardless of
    * segment width, so the df shuffle ships hashes, not text. The
    * per-doc reassembly sorts each doc's kept segments by position
    * inside the rollup (sort_array over the collected struct —
    * per-doc bounded, no extra shuffle) and pins the cleaned text as
    * an md5 so the oracle compares content without shipping megabyte
    * strings through the checker. */
  def boilerplate(spark: SparkSession, dir: String,
      segTokens: Int = 10, minDf: Int = 3): DataFrame = {
    val t = Tables(spark, dir)
    val seg = t.documentsSpread
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .select(col("doc_id"), col("toks"), explode(expr(
        s"sequence(0, CAST((n + ${segTokens - 1}) div $segTokens AS INT) - 1)"))
        .as("seg_id"))
      .select(col("doc_id"), col("seg_id").cast("long").as("seg_id"),
        concat_ws(" ",
          slice(col("toks"), col("seg_id") * segTokens + 1, lit(segTokens)))
          .as("seg"))
      .withColumn("seg_h", md5(col("seg")))
    val df = seg.groupBy(col("seg_h"))
      .agg(countDistinct(col("doc_id")).cast("long").as("docfreq"))
    seg.join(df, Seq("seg_h"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("docfreq") >= minDf, 1L).otherwise(0L)).as("n_boiler"),
        sort_array(collect_list(when(col("docfreq") < minDf,
          struct(col("seg_id"), col("seg"))))).as("kept"))
      .select(col("doc_id"), col("n_segments"), col("n_boiler"),
        md5(concat_ws(" ", expr("transform(kept, x -> x.seg)")))
          .as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** Positional phrase matching — ES `match_phrase` semantics: count
    * occurrences of consecutive tokens t₁ t₂ (adjacent positions in the
    * ORIGINAL token stream), per document. This is the positional
    * inverted index access path: posexplode keeps each token's
    * position, the phrase-term filter drops every other posting before
    * any shuffle, and adjacency is decided by ONE window pass over
    * (doc, position) order — `lead(tok)` is t₂ at `lead(pos) = pos+1`
    * exactly when the bigram occurs (nothing between p and p+1 can
    * survive the filter). One shuffle, carrying only the two terms'
    * postings, at any corpus size. */
  def matchPhrase(spark: SparkSession, dir: String,
      t1: String = "spark", t2: String = "join"): DataFrame = {
    val t = Tables(spark, dir)
    val postings = t.documents
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "tok")
      .filter(col("tok").isin(t1, t2))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    postings
      .withColumn("next_tok", lead(col("tok"), 1).over(w))
      .withColumn("next_pos", lead(col("pos"), 1).over(w))
      .filter(col("tok") === t1 && col("next_tok") === t2 &&
        col("next_pos") === col("pos") + 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_phrase"),
        min(col("pos")).cast("long").as("first_pos"))
      .orderBy(col("doc_id"))
  }

  /** Retrieval-quality evaluation — the measuring half every search
    * stack needs (BM25, ANN, RRF are answer-producers; this scores the
    * answers): per query, MRR and NDCG@k of the BM25 ranking against a
    * deterministic graded ground truth. Relevance of a document is the
    * number of DISTINCT query terms it contains (0..|q| — the standard
    * term-containment grade when no human labels exist), the ideal
    * ranking sorts by that grade, and MRR looks for the first FULL
    * match (rel = |q|; "first hit" under any-term relevance is vacuous
    * for a ranker that only retrieves matching docs).
    *
    * Numerics: the discount is harmonic (gain/(rank+1), the
    * Burges-family alternative to 1/log₂(rank+1)) so every per-rank
    * term is one exact integer division — floor(10⁶·rel/(rank+1)) —
    * and DCG, IDCG, and their e6 ratio are bit-identical across
    * engines; a log₂ discount would put a transcendental in the hash
    * path for no methodological gain.
    *
    * Scale shape: the query list is metadata (|Q| terms, broadcast);
    * the corpus contributes one tokenize-filter-aggregate pass shared
    * by scoring AND grading (the tf frame feeds both), the per-query
    * candidate sets are top-k (k rows per query), and the metric
    * reduction is |Q|-sized. Nothing here outgrows the BM25 scan it
    * evaluates. */
  def searchEval(spark: SparkSession, dir: String,
      queries: Seq[(Long, Seq[String])] = Seq(
        0L -> Seq("spark", "join", "vector"),
        1L -> Seq("stream", "window"),
        2L -> Seq("hash", "merge", "batch", "scan")),
      topK: Int = 10): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val q = queries.flatMap { case (qid, ts) => ts.map(tk => (qid, tk)) }
      .toDF("qid", "tok")
    val nq = q.groupBy(col("qid")).agg(count(lit(1)).as("n_q"))
    val docs = t.documents.select(col("doc_id"),
        split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("t_toks"))
    // one shared pass: (qid, doc, tok) term frequencies drive BOTH the
    // BM25 score and the relevance grade
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .join(broadcast(q), Seq("tok"))
      .groupBy(col("qid"), col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("qid"), col("tok")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfc), Seq("qid", "tok"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_e4", expr("(10000 * n_docs) div df"))
      .withColumn("dlr_e3", expr("(1000 * dl * n_docs) div t_toks"))
      .withColumn("sat_e4", expr("12 * (250 + (750 * dlr_e3) div 1000)"))
      .withColumn("ratio_e3",
        expr("(tf * 2200 * 10000) div (tf * 10000 + sat_e4)"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("idf_e4") * col("ratio_e3")).as("score_e7"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("score_e7").desc, col("doc_id"))
    val rk = scored.withColumn("rank", row_number().over(wq).cast("long"))
      .filter(col("rank") <= topK)
    val rel = tf.groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("rel")) // rows are distinct terms present
    val dcg = rk.join(rel, Seq("qid", "doc_id"))
      .groupBy(col("qid"))
      .agg(sum(expr("(1000000 * rel) div (rank + 1)")).as("dcg_e6"))
    val wi = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("doc_id"))
    val idcg = rel.withColumn("irank", row_number().over(wi).cast("long"))
      .filter(col("irank") <= topK)
      .groupBy(col("qid"))
      .agg(sum(expr("(1000000 * rel) div (irank + 1)")).as("idcg_e6"))
    val mrr = rk.join(rel, Seq("qid", "doc_id")).join(nq, Seq("qid"))
      .filter(col("rel") === col("n_q"))
      .groupBy(col("qid"))
      .agg(expr("1000000 div min(rank)").as("mrr_e6"))
    val nrel = rel.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    nq.select(col("qid"))
      .join(nrel, Seq("qid"), "left")
      .join(dcg, Seq("qid"), "left")
      .join(idcg, Seq("qid"), "left")
      .join(mrr, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("mrr_e6"), lit(0L)).as("mrr_e6"),
        coalesce(col("dcg_e6"), lit(0L)).as("dcg_e6"),
        coalesce(col("idcg_e6"), lit(0L)).as("idcg_e6"),
        expr("CASE WHEN coalesce(idcg_e6, 0) > 0 THEN" +
          " (1000000 * coalesce(dcg_e6, 0)) div idcg_e6" +
          " ELSE 0 END").as("ndcg_e6"))
      .orderBy(col("qid"))
  }
}
