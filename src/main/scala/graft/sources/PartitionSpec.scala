package graft.sources

/** One partition-spec field of an Iceberg-lite table, in the writer's
  * mini-DSL: `"col"` (identity), `"day(col)"`, or `"bucket(N, col)"`.
  *
  * Iceberg's HIDDEN partitioning: transform fields derive from a source
  * data column at write time, land as Hive path segments (never inside
  * the data files), and queries keep filtering the SOURCE column — the
  * reader projects those predicates through the transform to prune files
  * (reference: Iceberg spec "Partition Transforms"; the `source-name`
  * key below replaces real Iceberg's source-id indirection since this
  * reader is the only consumer of the lite metadata).
  *
  * `transform` is `"identity"`, `"day"`, or `"bucket[N]"` (Iceberg's
  * spelling). The bucket hash is the repo-wide md5-prefix int (NOT
  * Iceberg's murmur3 — self-consistent within lite tables and
  * reproducible by any engine, which is what the oracle harness needs).
  */
final case class PartitionField(name: String, transform: String, source: String) {
  def bucketCount: Option[Int] =
    if (transform.startsWith("bucket["))
      Some(transform.stripPrefix("bucket[").stripSuffix("]").toInt)
    else None
}

object PartitionSpec {

  private val DayRe = """^\s*day\s*\(\s*([\w.]+)\s*\)\s*$""".r
  private val BucketRe = """^\s*bucket\s*\(\s*(\d+)\s*,\s*([\w.]+)\s*\)\s*$""".r

  def parse(s: String): PartitionField = s match {
    case DayRe(src) => PartitionField(s"${src}_day", "day", src)
    case BucketRe(n, src) => PartitionField(s"${src}_bucket", s"bucket[$n]", src)
    case name => PartitionField(name.trim, "identity", name.trim)
  }

  /** Reconstruct the DSL string (what append inheritance re-feeds). */
  def toDsl(f: PartitionField): String = f.transform match {
    case "identity" => f.source
    case "day" => s"day(${f.source})"
    case t if t.startsWith("bucket[") => s"bucket(${f.bucketCount.get}, ${f.source})"
    case other => throw new IllegalArgumentException(s"unknown transform $other")
  }

  /** Spark SQL deriving the partition value from the source column.
    * day: session-timezone calendar date as 'yyyy-MM-dd' (lexicographic
    * order == chronological order, so range pruning is a string compare).
    * bucket: md5-prefix int64 mod N — non-negative, engine-reproducible.
    */
  def deriveSql(f: PartitionField): String = f.transform match {
    case "day" => s"date_format(`${f.source}`, 'yyyy-MM-dd')"
    case t if t.startsWith("bucket[") =>
      s"CAST(conv(substring(md5(CAST(`${f.source}` AS STRING)), 1, 8), 16, 10) AS BIGINT) % ${f.bucketCount.get}"
    case "identity" => s"`${f.source}`"
    case other => throw new IllegalArgumentException(s"unknown transform $other")
  }

  /** The JVM mirror of the bucket derivation, for planning-time pruning:
    * bucket of a literal value's string form. Must stay bit-identical to
    * [[deriveSql]]'s md5 path (CAST AS STRING of integral/string values
    * is their plain decimal/identity rendering in Spark, matching
    * `toString` here — which is why pruning only engages for those
    * types).
    */
  def bucketOf(value: String, n: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(value.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % n
  }
}
