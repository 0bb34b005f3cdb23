package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only matched-condition A/B for the `dedup_substring` plan
  * change (round 10): the r9 two-exchange shape (partial-agg exchange
  * on (gram, doc), second full exchange + sort for the df window) vs
  * the one-exchange shape shipped in `Dedup.substringDup`. Same JVM,
  * alternating runs, min per arm — the only protocol that attributes
  * a delta at x100, where same-code chunk runs vary 1.3× (BASELINE.md
  * r9 variance note).
  *
  *   SPARK_GRAFT_SF_DIR=target/scale/x100 runMain graft.tools.SubstringAB
  */
object SubstringAB {

  /** The r9 shape, kept verbatim for the A arm. */
  private def oldShape(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.core.Tables(spark, dir)
    val wins = t.documentsSpread
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, greatest(length(text) - 39, 1))")).as("i"))
      .select(col("doc_id"), expr("unhex(md5(substring(text, i, 40)))").as("gram"))
    val perDocGram = wins.groupBy(col("gram"), col("doc_id"))
      .agg(count(lit(1)).as("m"))
    val wG = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    perDocGram.withColumn("n_docs", count(lit(1)).over(wG))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_win"),
        sum(when(col("n_docs") >= 2, col("m")).otherwise(0L)).as("dup_win"))
      .withColumn("dup_frac_e4", expr("(20000 * dup_win + n_win) div (2 * n_win)"))
      .withColumn("dup_heavy", col("dup_frac_e4") >= 2000)
      .orderBy(col("doc_id"))
  }

  /** Sums shuffle write bytes + spill across all stages of whatever
    * runs between reset() and read — wall-clock at x100 on this box
    * varies 3-4× with page-cache/GC state (both arms measured 44-174 s
    * across positions), so the DETERMINISTIC exchange-volume metric is
    * what actually attributes the plan change. */
  private class ShuffleMeter extends org.apache.spark.scheduler.SparkListener {
    @volatile var shuffleWrite = 0L
    @volatile var spill = 0L
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      spill += sc.stageInfo.taskMetrics.diskBytesSpilled
    }
    def reset(): Unit = { shuffleWrite = 0L; spill = 0L }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.get("SPARK_GRAFT_AB_ROUNDS").map(_.toInt).getOrElse(2)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    graft.core.Tables(spark, sfDir).documents.count() // warm
    def time(f: => DataFrame): (Double, Long, Long) = {
      meter.reset()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc(); Thread.sleep(500)
      (s, meter.shuffleWrite, meter.spill)
    }
    val results = (1 to rounds).flatMap { r =>
      val (a, aw, as) = time(oldShape(spark, sfDir))
      val (b, bw, bs) = time(graft.operators.Dedup.substringDup(spark, sfDir))
      println(f"round $r: old=$a%.1f (shuffle ${aw / 1e9}%.2f GB, spill ${as / 1e9}%.2f GB) " +
        f"new=$b%.1f (shuffle ${bw / 1e9}%.2f GB, spill ${bs / 1e9}%.2f GB)")
      Seq(("old", a, aw), ("new", b, bw))
    }
    val oldMin = results.filter(_._1 == "old").map(_._2).min
    val newMin = results.filter(_._1 == "new").map(_._2).min
    val oldW = results.filter(_._1 == "old").map(_._3).max
    val newW = results.filter(_._1 == "new").map(_._3).max
    println(f"""{"metric":"substring_ab","old_min":$oldMin%.1f,"new_min":$newMin%.1f,"old_shuffle_gb":${oldW / 1e9}%.2f,"new_shuffle_gb":${newW / 1e9}%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
