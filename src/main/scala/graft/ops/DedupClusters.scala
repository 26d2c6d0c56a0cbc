package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
    */
  def connectedComponents(docs: DataFrame, pairs: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("i").as("src"), col("j").as("dst"))
      .union(pairs.select(col("j").as("src"), col("i").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = docs.select(col("doc_id").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges
        .join(labels, col("dst") === col("id"))
        .groupBy(col("src"))
        .agg(min(col("label")).as("nlabel"))
      val next = labels
        .join(neighborMin, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.join(labels.select(col("id"), col("label").as("prev")), "id")
        .filter(col("label") =!= col("prev"))
        .count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }
}
