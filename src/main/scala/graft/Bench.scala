package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, parquet footer cache, executor threads)
    // so the first timed query doesn't absorb startup cost
    val t = graft.core.Tables(spark, sfDir)
    t.lineitem.count(); t.events.count(); t.documents.count(); t.embeddings.count()
    // dev knob: comma-separated query names (unset = full suite, what
    // the driver runs); lets a perf investigation time one query in
    // the same warmed-session conditions as the real bench
    val subset = sys.env.get("SPARK_GRAFT_BENCH_SUBSET")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a subset run only needs the standing indexes its queries serve
    // from (the full-suite driver run builds all four); at x100 the
    // unconditional pre-builds cost ~8 min of warm-up before a
    // dedup-only investigation could even start
    def needs(keys: String*) =
      subset.forall(s => s.exists(n => keys.exists(n.contains)))
    // pre-build the standing FTS index so text_bm25_indexed times the
    // point-read SERVING path (what a deployment pays per query);
    // text_fts_build still owns the build cost as its own timed entry
    if (needs("fts", "bm25", "search", "stream"))
      graft.operators.TextAnalysis.ensureFts(spark, sfDir)
    // likewise the standing IVF indexes: sim_ann_indexed* time the
    // Bloom-pruned point-read serving paths; the sim_*_build queries
    // own the build costs as their own timed entries
    if (needs("ivf", "ann", "sq8", "sim")) {
      graft.operators.Similarity.ensureIvf(spark, sfDir)
      graft.operators.Similarity.ensureIvfSqrt(spark, sfDir)
      graft.operators.Similarity.ensureIvfSq8(spark, sfDir)
    }
    val selected = subset match {
      case Some(s) => SparkEntry.queries.filter { case (n, _) => s(n) }
      case None => SparkEntry.queries
    }
    // measurement protocol (BASELINE.md r9): each query runs TWICE and
    // reports the min. A single-JVM 170-query sweep manufactures 2-4x
    // singleton outliers from GC pressure and codegen-cache churn
    // (adjudicated by isolation re-runs every round, r7/r8 verdicts);
    // min-of-two reflects the PLAN, not transient JVM state, at the
    // cost of one extra pass. The gc + settle between queries keeps one
    // query's garbage from billing the next.
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(2)
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // noop sink: materializes EVERY output column (count() would
        // let Catalyst prune computed expressions and understate work)
        val t = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0 // sentinel: a failed query must not look like a fast one
        }
        spark.catalog.clearCache()
        t
      }
      System.gc()
      Thread.sleep(50)
      // any failed run fails the query; otherwise the min of the runs
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
