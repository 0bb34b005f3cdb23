package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only matched-condition A/B for the `dedup_substring_winnow`
  * gate (round 11): the r10 md5-prefix gate (A arm, kept verbatim
  * below) vs whatever `Dedup.substringDupWinnow` currently ships
  * (B arm). Same JVM, alternating runs, min per arm — the SubstringAB
  * protocol.
  *
  * OUTCOME (r11, x100, 16-thread protocol): both "cheap pre-gate so
  * md5 runs only on survivors" candidates LOST to the md5-prefix
  * gate — window-string char mix 134.2 s vs 59.0 s, text-offset char
  * mix 103.7 s vs 59.2 s (per-position `substring` walks the UTF8
  * bytes, so five 1-char reads cost more than one walk + digest).
  * `substringDupWinnow` therefore ships the md5-prefix gate, and the
  * two arms here are now IDENTICAL by construction — the tool stays
  * as the harness that adjudicated the question and re-runs if a new
  * gate candidate appears.
  *
  *   SPARK_GRAFT_SF_DIR=target/scale/x100 runMain graft.tools.WinnowAB
  */
object WinnowAB {

  /** The r10 gate, kept verbatim for the A arm: md5 per window, gate
    * on the digest's first hex char. */
  private def oldGate(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.core.Tables(spark, dir)
    val wins = t.documentsSpread
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, greatest(length(text) - 39, 1))")).as("i"))
      .select(col("doc_id"), expr("md5(substring(text, i, 40))").as("h"))
      .filter(substring(col("h"), 1, 1).isin("0", "8"))
      .select(col("doc_id"), expr("unhex(h)").as("gram"))
    val perDocGram = wins.repartition(col("gram"))
      .groupBy(col("gram"), col("doc_id"))
      .agg(count(lit(1)).as("m"))
    val wG = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    val stats = perDocGram.withColumn("n_docs", count(lit(1)).over(wG))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_win"),
        sum(when(col("n_docs") >= 2, col("m")).otherwise(0L)).as("dup_win"))
    t.documents.select(col("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .withColumn("n_win", coalesce(col("n_win"), lit(0L)))
      .withColumn("dup_win", coalesce(col("dup_win"), lit(0L)))
      .withColumn("dup_frac_e4",
        expr("CASE WHEN n_win = 0 THEN 0L ELSE (20000 * dup_win + n_win) div (2 * n_win) END"))
      .withColumn("dup_heavy", col("dup_frac_e4") >= 2000)
      .orderBy(col("doc_id"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.get("SPARK_GRAFT_AB_ROUNDS").map(_.toInt).getOrElse(2)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables(spark, sfDir).documents.count() // warm
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc(); Thread.sleep(500)
      s
    }
    val results = (1 to rounds).flatMap { r =>
      val a = time(oldGate(spark, sfDir))
      val b = time(graft.operators.Dedup.substringDupWinnow(spark, sfDir))
      // armA = the pinned r10 md5-prefix gate above; armB = whatever
      // Dedup.substringDupWinnow currently ships (identical to armA
      // since the r11 null result — relabel if a new candidate lands)
      println(f"round $r: armA(md5-gate)=$a%.1f s, armB(shipped)=$b%.1f s")
      Seq(("old", a), ("new", b))
    }
    val oldMin = results.filter(_._1 == "old").map(_._2).min
    val newMin = results.filter(_._1 == "new").map(_._2).min
    println(f"""{"metric":"winnow_ab","old_min":$oldMin%.1f,"new_min":$newMin%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
