package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup
import graft.sources.{IcebergLite, IcebergLiteWriter}

/** End-to-end incremental curation: the 100 TB operating mode where the
  * corpus GROWS and each ingest batch is curated against everything already
  * accepted — without ever rescanning the existing corpus text. Composes
  * the storage layer (snapshot appends + incremental snapshot-diff reads)
  * with the dedup operators:
  *
  *   raw appends  →  incrementalScan (new rows only)  →  exact-hash
  *   anti-join against the curated table's fingerprints  →  curated append
  *
  * The invariant checked at the end is the strong one: batch-by-batch
  * incremental curation lands on EXACTLY the same curated set as
  * re-running full-corpus dedup from scratch.
  */
class IncrementalPipelineSpec extends AnyFunSuite with SparkFixture {

  test("incremental snapshot-diff curation equals full-corpus dedup") {
    import spark.implicits._
    val warehouse = tmpDir("inc_pipeline")
    val rawDir = s"$warehouse/warehouse/raw_docs"
    val curatedDir = s"$warehouse/warehouse/curated_docs"

    // Batch 1: 6 docs, one internal duplicate pair (1 and 4).
    val batch1 = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu"),
      (4L, "alpha beta gamma delta"), // dup of 1
      (5L, "nu xi omicron pi"),
      (6L, "rho sigma tau upsilon")
    ).toDF("doc_id", "text")
    IcebergLiteWriter.write(spark, batch1, rawDir)
    val snap1 = IcebergLite.snapshotsRelation(spark, rawDir)
      .orderBy("committed_at").collect().last.getLong(0)

    // Initial curation: plain exact dedup of batch 1, kept ids 1,2,3,5,6.
    val curated1 = batch1.join(
      Dedup.exactKeep(batch1).select(col("doc_id")), Seq("doc_id"), "semi")
    IcebergLiteWriter.write(spark, curated1, curatedDir)
    assert(IcebergLite.scan(spark, curatedDir).count() == 5)

    // Batch 2 arrives: two fresh docs, one duplicate of the EXISTING
    // corpus (7 dups 2), one duplicate pair inside the batch (8/9).
    val batch2 = Seq(
      (7L, "epsilon zeta eta theta"), // dup of curated doc 2
      (8L, "phi chi psi omega"),
      (9L, "phi chi psi omega"),      // dup of 8, same batch
      (10L, "aleph beth gimel daleth")
    ).toDF("doc_id", "text")
    IcebergLiteWriter.append(spark, batch2, rawDir)

    // Incremental read: ONLY batch 2's rows come back — the existing
    // corpus text is never rescanned (the whole point at 100 TB).
    val incoming = IcebergLite.incrementalScan(spark, rawDir, fromSnapshotId = snap1)
    assert(incoming.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(7L, 8L, 9L, 10L))

    // Curate the increment: dedup WITHIN the batch, then anti-join its
    // content hashes against the curated table's fingerprint projection
    // (hashes only — no curated text moves).
    val batchKept = incoming.join(
      Dedup.exactKeep(incoming).select(col("doc_id")), Seq("doc_id"), "semi")
    val curatedHashes = IcebergLite.scan(spark, curatedDir)
      .select(md5(col("text")).as("h")).distinct()
    val newDocs = batchKept
      .withColumn("h", md5(col("text")))
      .join(curatedHashes, Seq("h"), "anti")
      .drop("h")
    IcebergLiteWriter.append(spark, newDocs, curatedDir)

    // The strong invariant: incremental curation == from-scratch dedup of
    // the full raw table (same survivor rule: min doc_id per content).
    val allRaw = IcebergLite.scan(spark, rawDir)
    val fromScratch = allRaw.join(
      Dedup.exactKeep(allRaw).select(col("doc_id")), Seq("doc_id"), "semi")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val incremental = IcebergLite.scan(spark, curatedDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(incremental == fromScratch,
      s"incremental $incremental != from-scratch $fromScratch")
    assert(incremental == Set(1L, 2L, 3L, 5L, 6L, 8L, 10L))

    // And the curated table's history shows the two curation commits —
    // time travel to the pre-batch-2 curated state still works.
    val curatedSnaps = IcebergLite.snapshotsRelation(spark, curatedDir)
      .orderBy("committed_at").collect()
    assert(curatedSnaps.length == 2)
    assert(IcebergLite.scan(spark, curatedDir,
      snapshotId = Some(curatedSnaps.head.getLong(0))).count() == 5)
  }
}
