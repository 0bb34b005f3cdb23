package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.core.{Scratch, Tables}
import graft.lake.TxTable
import graft.operators.TextAnalysis

/** End-to-end streamed-index pipeline — the composition of the two
  * verified halves (`StreamZoneSpec`'s idempotent micro-batch index
  * maintenance and `bm25Indexed`'s Bloom point-read serving) into ONE
  * query the oracle checks: a standing postings index is seeded from
  * the base corpus, late documents arrive as AvailableNow micro-batches
  * whose postings + corpus-stats deltas commit idempotently into the
  * same index (batch markers make redelivery a no-op), and BM25 serves
  * from the merged snapshot.
  *
  * Index semantics under increments: `df` merges across segments at
  * read (each commit's postings are per-segment; document frequency is
  * the count over the merged point-read — Lucene's per-segment term
  * stats), and the corpus stats are the SUM of the per-commit stats
  * rows — work proportional to the number of commits, never the
  * corpus. Scores are byte-equal to the full-corpus scan
  * (`text_bm25_search`'s oracle verifies this query too): an index is
  * an optimization, never a semantic.
  *
  * Reference parity: micro-batch-per-uploaded-file ingestion is the
  * reference's transport (`Send_Data_To_DataLake/main.py:64`); here
  * each uploaded batch ALSO maintains the serving index instead of
  * waiting for a rebuild.
  */
object StreamFts {

  def streamFtsServe(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "join", "vector"),
      topK: Int = 10): DataFrame = {
    // base seed = 90% of the corpus through a tokenize+explode —
    // spread so the build stage owns its parallelism (the x100
    // single-split lesson); the late 10% streams through micro-batch
    // files and needs no spread
    val base = Tables(spark, dir).documentsSpread
      .select(col("doc_id"), col("text"))
      .filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val late = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
      .filter(pmod(col("doc_id"), lit(10)) === 0)

    def tokenized(d: DataFrame): DataFrame =
      d.select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("dl", size(col("toks")).cast("long"))
    def postings(d: DataFrame): DataFrame =
      tokenized(d)
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
        .groupBy(col("tok"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
    def statsDelta(d: DataFrame): DataFrame =
      tokenized(d).agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("t_toks"))

    // seed commit: the base corpus, term-range-clustered with Bloom
    // bitmaps — identical layout to TextAnalysis.buildFts
    val idx = TxTable(spark, Scratch.fresh("tx_fts_stream"))
    val st = TxTable(spark, Scratch.fresh("tx_fts_stream_stats"))
    idx.append(postings(base).repartitionByRange(8, col("tok")),
      bloomCols = Seq("tok"))
    st.append(statsDelta(base))

    // the late documents land as files (the reference's per-file
    // upload transport); the stream tails the directory one file per
    // micro-batch and each batch commits postings + stats deltas
    // under its batch marker
    val srcDir = Scratch.fresh("fts_late_src")
    late.repartition(2).write.mode("overwrite").json(srcDir)
    val chk = Scratch.fresh("fts_late_chk")
    val q = spark.readStream
      .schema(StructType.fromDDL("doc_id LONG, text STRING"))
      .option("maxFilesPerTrigger", 1)
      .json(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        idx.appendBatchIdempotent(postings(batch), id,
          bloomCols = Seq("tok"))
        st.appendBatchIdempotent(statsDelta(batch), id)
        ()
      }
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // serve from the merged snapshot: one multi-term Bloom point read,
    // per-segment df merged by the count, stats summed per commit row
    val stRow = st.read()
      .agg(sum(col("n_docs")).as("n"), sum(col("t_toks")).as("t")).head()
    val posts = idx.readWhereIn("tok", terms.map(lit(_)))
    val dfc = posts.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    TextAnalysis.bm25ScoreTail(posts.join(broadcast(dfc), Seq("tok")),
      stRow.getLong(0), stRow.getLong(1), topK)
  }
}
