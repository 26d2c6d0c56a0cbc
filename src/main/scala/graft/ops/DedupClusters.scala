package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTER resolution: pair generators (exact Jaccard,
  * MinHash LSH, SimHash) emit edges; keeping one doc per duplicate GROUP
  * needs the connected components of that graph. Computed by iterative
  * min-label propagation (each round: neighbors' labels -> min, one
  * shuffle-join + one min-aggregate), converging in O(component diameter)
  * rounds — duplicate clusters are shallow, so a handful of rounds at any
  * corpus size. The iteration is driver-CONTROLLED but data never leaves
  * the cluster: the driver sees only the changed-row count per round.
  */
object DedupClusters {

  /** (doc_id, cluster_id) for every doc in `docs`: cluster_id = the
    * smallest doc_id reachable through `pairs` (i,j edges); singletons
    * keep their own id. Deterministic for any edge set.
    *
    * Two things make the loop viable: (a) `localCheckpoint` truncates the
    * plan each round — without it every iteration's logical plan embeds
    * all prior rounds and Catalyst analysis/codegen grows quadratically;
    * (b) a pointer-jumping step (label <- label(label), valid because a
    * label is always some node's id) collapses chains exponentially, so
    * rounds are O(log diameter) instead of O(diameter).
    */
  def connectedComponents(docs: DataFrame, pairs: DataFrame,
      maxIter: Int = 50): DataFrame = {
    // Eager checkpoint: materializes the (tiny) edge relation ONCE and
    // truncates its lineage, so no per-round job DAG re-embeds the pair
    // generator's plan (for verified-duplicate edges that is the whole
    // PPJoin pipeline).
    val edges = pairs.select(col("i").as("src"), col("j").as("dst"))
      .union(pairs.select(col("j").as("src"), col("i").as("dst")))
      .localCheckpoint()
    var labels = docs.select(col("doc_id").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var retired = List.empty[DataFrame]
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges
        .join(labels, col("dst") === col("id"))
        .groupBy(col("src"))
        .agg(min(col("label")).as("nlabel"))
      // Neighbor-min step (carrying the previous label for the convergence
      // check), checkpointed BEFORE the pointer jump: the self-join below
      // consumes `stepped` on both sides, and without materialization the
      // join+aggregate above would run twice per round.
      val stepped = labels
        .join(neighborMin, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          col("label").as("prev"))
        .localCheckpoint()
      // Pointer jump (label <- label(label), valid because a label is
      // always some node's id) over the materialized step, then a
      // shuffle-free changed-count on the checkpointed result.
      val next = stepped
        .join(stepped.select(col("id").as("jid"), col("label").as("jlabel")),
          col("label") === col("jid"), "left")
        .select(col("id"),
          coalesce(col("jlabel"), col("label")).as("label"),
          col("prev"))
        .localCheckpoint()
      changed = next.filter(col("label") =!= col("prev")).count()
      // Prior rounds' checkpoint blocks are no longer reachable from the
      // live plan — free them now instead of waiting for the GC-driven
      // ContextCleaner, which lets storage accumulate across rounds on a
      // big corpus.
      retired.foreach(freeCheckpoint)
      retired = List(labels, stepped)
      labels = next.select(col("id"), col("label"))
      iter += 1
      if (sys.env.contains("SPARK_GRAFT_CC_LOG"))
        System.err.println(s"[cc] round $iter: $changed labels changed")
    }
    retired.foreach(d => if (!(d eq labels)) freeCheckpoint(d))
    freeCheckpoint(edges)
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Drop the storage blocks behind a localCheckpoint'd DataFrame. The
    * checkpointed RDD hangs off the plan's LogicalRDD leaf; DataFrame
    * .unpersist only touches CacheManager entries, not checkpoint blocks.
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    } catch { case _: Throwable => () }
}
