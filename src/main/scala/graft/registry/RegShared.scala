package graft.registry

/** Oracle-SQL helpers shared across the family registries: the portable
  * salted hash and the document normalizer / split-bucket SQL twins that
  * several families' oracles embed (derived from the same constants as
  * the engine, so the oracle can never drift).
  */
object RegShared {
  private[graft] def phashSql(e: String, salt: Int): String =
    graft.functions.PortableHash.phashSql(e, salt)

  private[graft] val normSql = "regexp_replace(lower(text), '[^a-z0-9]', '', 'g')"

  /** SQL twin of Sampling.{splitBucket,splitName} — derived from the
    * same salt constant so the oracle can never drift from the engine. */
  private[graft] val splitBucketSql: String =
    s"${graft.functions.PortableHash.phashSql("CAST(doc_id AS VARCHAR)", graft.operators.Sampling.splitSalt)} % 10"
  private[graft] val splitCaseSql: String =
    "CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'dev' ELSE 'test' END"
}
