package graft

import org.apache.spark.sql.functions._
import graft.functions.{CosineSimQ, ModeAgg}

class FunctionsSpec extends SparkSpec {

  test("ModeAgg matches Counter semantics: count desc, first-seen tie-break") {
    import spark.implicits._
    // b and c tie at 2; c first seen at ord 0 → c wins
    val df = Seq(("c", 0L), ("b", 1L), ("b", 3L), ("c", 4L), ("a", 2L))
      .toDF("v", "ord")
    val got = df.agg(ModeAgg.column(col("v"), col("ord")).as("mode"))
      .collect().head.getString(0)
    assert(got == "c")
    // clear winner
    val df2 = Seq(("x", 9L), ("y", 1L), ("y", 2L)).toDF("v", "ord")
    assert(df2.agg(ModeAgg.column(col("v"), col("ord"))).collect().head.getString(0) == "y")
    // nulls ignored; all-null → null
    val df3 = Seq((null.asInstanceOf[String], 1L)).toDF("v", "ord")
    assert(df3.agg(ModeAgg.column(col("v"), col("ord"))).collect().head.isNullAt(0))
  }

  test("ModeAgg agrees with the window-based mode on real data") {
    val events = graft.core.Tables(spark, "/root/testdata/sf0.001").events
    val viaAgg = events.groupBy(col("user_id"))
      .agg(ModeAgg.column(col("event_type"), col("event_id")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaWindow = graft.enrich.Enrich.mode(
      events.withColumn("frame_number", col("event_id")), "user_id", "event_type")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaAgg == viaWindow)
  }

  test("CosineSimQ native expression: identity, orthogonal, codegen path") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // cos=1
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // cos=0
      (Array(1.0f, 1.0f), Array(1.0f, 0.0f)),   // cos=0.7071
      (Array(0.0f, 0.0f), Array(1.0f, 0.0f)))   // zero norm → 0
      .toDF("a", "b")
    val got = df.select(CosineSimQ.cosineSimE6(col("a"), col("b")).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1000000L, 0L, 707106L, 0L))
    // registered SQL function via GraftExtensions
    df.createOrReplaceTempView("vecs")
    val sqlGot = spark.sql("SELECT cosine_sim_e6(a, b) FROM vecs")
      .collect().map(_.getLong(0)).toSeq
    assert(sqlGot == got)
  }
}
