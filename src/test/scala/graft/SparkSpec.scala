package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + JSON-fixture helpers for all suites. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4)

  /** Write a JSON fixture to a temp file and read it back the way the
    * engine reads raw detection documents (multiLine PERMISSIVE). */
  def readJsonFixture(json: String): DataFrame = {
    val f = Files.createTempFile("graft-fixture", ".json")
    Files.writeString(f, json)
    f.toFile.deleteOnExit()
    spark.read.option("multiLine", true).option("mode", "PERMISSIVE")
      .json(f.toString)
  }

  def rowsByKey[K](df: DataFrame, key: String): Map[K, org.apache.spark.sql.Row] =
    df.collect().map(r => r.getAs[K](key) -> r).toMap
}
