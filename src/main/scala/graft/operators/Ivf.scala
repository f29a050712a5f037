package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.NativeVector

/** IVF (inverted-file) approximate nearest neighbor search — the
  * clustered scale path for embedding similarity (SURVEY.md §7), next to
  * the SRP-LSH variant in Embeddings.
  *
  * Build: L2-normalize, KMeans into nLists partitions (euclidean on unit
  * vectors ≈ cosine), store assignments. Search: score queries against
  * the (tiny, broadcast) centroid table, probe the nProbe nearest lists,
  * exact-cosine only the candidates — at 1B vectors with nLists≈√n and
  * nProbe≪nLists the scan touches ~nProbe/nLists of the corpus instead
  * of all of it, and the candidate join shuffles on centroid_id.
  */
object Ivf {

  final case class Index(centroids: DataFrame, assigned: DataFrame,
                         idCol: String, vecCol: String)

  /** Unit-L2 float-array view of a vector column. */
  private def normalized(vec: Column): Column = {
    val l2 = sqrt(aggregate(vec, lit(0.0), (a, x) => a + x.cast("double") * x.cast("double")))
    transform(vec, x => x.cast("double") / l2).cast("array<float>")
  }

  /** Build the index: nLists KMeans centroids over normalized vectors +
    * per-vector list assignment. `trainFraction` < 1 fits the centroids
    * on a sample (the standard move at corpus scale — centroid quality
    * converges long before the full corpus is seen); assignment always
    * covers every vector. */
  def build(df: DataFrame, id: String, vec: String, nLists: Int,
            seed: Long = 42L, maxIter: Int = 8,
            trainFraction: Double = 1.0): Index = {
    val withVec = df.select(col(id), col(vec),
      array_to_vector(normalized(col(vec))).as("__nv"))
    val trainSet =
      (if (trainFraction < 1.0) withVec.sample(trainFraction, seed) else withVec)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model =
      try new KMeans().setK(nLists).setSeed(seed)
        .setMaxIter(maxIter).setTol(1e-3)
        .setFeaturesCol("__nv").setPredictionCol("centroid_id")
        .fit(trainSet) // iterative: each pass reads the cached vectors
      finally trainSet.unpersist(blocking = false)
    val assigned = model.transform(withVec)
      .select(col(id), col(vec), col("centroid_id"))
    val spark = df.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("centroid_id", "cvec")
    Index(centroids, assigned, id, vec)
  }

  /** Probe the nProbe nearest lists per query (broadcast centroid
    * scoring), then exact cosine top-k inside the probed lists only. */
  def search(index: Index, queries: DataFrame, qid: String, vec: String,
             nProbe: Int, topK: Int): DataFrame = {
    NativeVector.register(queries.sparkSession)
    val q = queries.select(col(qid).as("query_id"), normalized(col(vec)).as("qv"))
    val wProbe = Window.partitionBy("query_id").orderBy(desc("csim"), col("centroid_id"))
    val probes = q.crossJoin(broadcast(index.centroids))
      .withColumn("csim", NativeVector.dot(col("qv"), col("cvec")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select("query_id", "qv", "centroid_id")
    val wTop = Window.partitionBy("query_id").orderBy(desc("sim"), col("neighbor_id"))
    probes.join(index.assigned, Seq("centroid_id"))
      .withColumnRenamed(index.idCol, "neighbor_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        round(NativeVector.dot(col("qv"), normalized(col(index.vecCol))) * 1e6) / 1e6)
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= topK)
      .select("query_id", "neighbor_id", "sim")
  }
}
