package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Scratch, Tables}

/** Oracle-gated drives of the transactional-table features the refine
  * zone graduates to at lake scale (BASELINE.json names Delta/Iceberg
  * as the substrate; [[TxTable]] carries their essential semantics):
  * copy-on-write MERGE, row-level CDC between versions, and
  * stats-pruned range reads. Each query BUILDS a tx table from the
  * driver's parquet tables, exercises the feature, and returns a
  * result DuckDB can reproduce with plain SQL over the same inputs —
  * the table machinery cancels out, the semantics are what's checked.
  */
object LakeOps {

  /** Base state: one row per customer, balances as exact cents. */
  private def baseRows(t: Tables): DataFrame =
    t.customer.select(
      col("c_custkey").as("k"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("val_cents"),
      col("c_mktsegment").as("seg"))

  /** Update set: per-customer order totals (cents) for customers with
    * orders — keys that exist in the base (updates). */
  private def updateRows(t: Tables, urgentOnly: Boolean): DataFrame = {
    val o = if (urgentOnly) t.orders.filter(col("o_orderpriority") === "1-URGENT")
            else t.orders
    o.groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).cast("long")
        .as("val_cents"))
      .select(col("o_custkey").as("k"), col("val_cents"),
        lit("updated").as("seg"))
  }

  /** Insert set: supplier-derived rows on keys far above every
    * customer key — no base file's [min,max] can intersect them, so
    * this merge is the pure-insert fast path (zero files rewritten). */
  private def insertRows(t: Tables): DataFrame =
    t.supplier.select(
      (lit(20000000L) + col("s_suppkey")).as("k"),
      expr("CAST(round(s_acctbal * 100) AS BIGINT)").as("val_cents"),
      lit("inserted").as("seg"))

  /** Copy-on-write MERGE: load customers into a range-clustered tx
    * table, upsert per-customer order totals (update-heavy merge),
    * then merge disjoint-key supplier rows (insert-only merge — file
    * stats prove no rewrite needed). The final snapshot must equal
    * the equivalent FULL OUTER JOIN upsert in plain SQL. */
  def lakeMergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val tx = TxTable(spark, Scratch.fresh("tx_merge"))
    tx.append(baseRows(t).repartitionByRange(8, col("k")), statsCols = Seq("k"))
    tx.merge(updateRows(t, urgentOnly = false), "k",
      statsCols = Seq("k"), targetFiles = 8)
    tx.merge(insertRows(t), "k", statsCols = Seq("k"), targetFiles = 2)
    tx.read().select(col("k"), col("val_cents"), col("seg")).orderBy(col("k"))
  }

  /** Row-level CDC: capture the version before an update-only merge,
    * diff the two snapshots from their manifests. Net changes must be
    * exactly {old row as delete, new row as insert} per updated key —
    * rows merely rewritten (same content) cancel out of the diff. */
  def lakeCdcDiff(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val tx = TxTable(spark, Scratch.fresh("tx_cdc"))
    val v0 = tx.append(baseRows(t).repartitionByRange(8, col("k")),
      statsCols = Seq("k"))
    val v1 = tx.merge(updateRows(t, urgentOnly = true), "k",
      statsCols = Seq("k"), targetFiles = 8)
    tx.changes(v0, v1)
      .select(col("k"), col("val_cents"), col("seg"), col("_change"))
      .orderBy(col("_change"), col("k"))
  }

  /** Stats-pruned range read: orders range-clustered on orderkey, then
    * a read of the lowest eighth of the key space — the skipping read
    * must equal the plain filter (pruning is an optimization, never a
    * semantic). The spec asserts the file-count actually shrank. */
  def lakeSkipRead(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val tx = TxTable(spark, Scratch.fresh("tx_skip"))
    tx.append(
      t.orders.select(col("o_orderkey").as("k"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_cents"),
        col("o_orderpriority").as("prio"))
        .repartitionByRange(16, col("k")),
      statsCols = Seq("k"))
    val r = t.orders
      .agg(min(col("o_orderkey")).as("mn"), max(col("o_orderkey")).as("mx"))
      .selectExpr("mn", "mn + (mx - mn) div 8 AS hi").collect().head
    tx.readWhere("k", r.getLong(0), r.getLong(1))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n"), sum(col("price_cents")).cast("long")
        .as("sum_cents"))
      .orderBy(col("prio"))
  }

  /** Bloom-indexed point lookup: documents clustered by LANGUAGE (so
    * doc_id ranges span every file and [min,max] stats prune nothing),
    * Bloom bitmaps on doc_id, then three single-key lookups — the
    * equality-predicate index for columns the table is not clustered
    * by. Must equal the plain IN-list filter. */
  def lakePointRead(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val tx = TxTable(spark, Scratch.fresh("tx_pt"))
    tx.append(
      t.documents.select(col("doc_id"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
        .repartitionByRange(8, col("lang"), col("doc_id")),
      statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
    val r = t.documents
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .selectExpr("mn", "mn + (mx - mn) div 3 AS mid",
        "mn + 2 * ((mx - mn) div 3) AS hi").collect().head
    Seq(r.getLong(0), r.getLong(1), r.getLong(2))
      .map(id => tx.readWhereEq("doc_id", lit(id)))
      .reduce(_.unionByName(_))
      .orderBy(col("doc_id"))
  }

  /** Copy-on-write DELETE: drop the second eighth of the key space
    * from a range-clustered orders table (stats-pruned rewrite — only
    * the covering files are touched), then aggregate what remains.
    * Must equal the plain NOT-BETWEEN filter. */
  def lakeDelete(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val tx = TxTable(spark, Scratch.fresh("tx_del"))
    tx.append(
      t.orders.select(col("o_orderkey").as("k"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_cents"),
        col("o_orderpriority").as("prio"))
        .repartitionByRange(16, col("k")),
      statsCols = Seq("k"))
    val r = t.orders
      .agg(min(col("o_orderkey")).as("mn"), max(col("o_orderkey")).as("mx"))
      .selectExpr("mn + (mx - mn) div 8 + 1 AS lo",
        "mn + 2 * ((mx - mn) div 8) AS hi").collect().head
    tx.delete("k", r.getLong(0), r.getLong(1), statsCols = Seq("k"))
    tx.read()
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n"), sum(col("price_cents")).cast("long")
        .as("sum_cents"))
      .orderBy(col("prio"))
  }

  /** Time travel: every commit's snapshot stays readable forever (the
    * manifest log is immutable; only `vacuum` reclaims replaced
    * files), so `read(Some(v))` reconstructs any historical state —
    * the audit/reproducibility feature Delta calls VERSION AS OF.
    * Three commits build three states (base customers → urgent-order
    * upsert → disjoint-key insert), then each PINNED VERSION is
    * summarized from its own manifest. The oracle recomputes all
    * three states relationally from the source tables — a reader that
    * leaked rows across versions (e.g. read latest files for an old
    * version) fails the gate. Version reads list one manifest each;
    * no data beyond the summarized snapshots is touched. */
  def lakeTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val tx = TxTable(spark, Scratch.fresh("tx_tt"))
    val v0 = tx.append(baseRows(t).repartitionByRange(8, col("k")),
      statsCols = Seq("k"))
    val v1 = tx.merge(updateRows(t, urgentOnly = true), "k",
      statsCols = Seq("k"), targetFiles = 8)
    val v2 = tx.merge(insertRows(t), "k", statsCols = Seq("k"),
      targetFiles = 2)
    def summarize(v: Long, name: String): DataFrame =
      tx.read(Some(v))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("val_cents")).cast("long").as("sum_cents"),
          count(when(col("seg") === "updated", lit(1))).as("n_updated"))
        .select(lit(name).as("state"), col("n_rows"), col("sum_cents"),
          col("n_updated"))
    summarize(v0, "v0")
      .unionByName(summarize(v1, "v1"))
      .unionByName(summarize(v2, "v2"))
      .orderBy(col("state"))
  }
}
