package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Embeddings
import Util.{Q, qz}

/** Similarity-search queries over `embeddings` (SURVEY.md §7):
  * per-vector stats, brute-force cosine top-k (oracle-checked), and the
  * LSH-bucketed scale path (rows-only — hash-based).
  */
object EmbeddingQueries {

  def queries: Map[String, Q] = Map(
    "q57_embed_stats" -> ((s, dir) => {
      Embeddings.stats(Tables.embeddings(s, dir), "vec_id", "embedding")
        .select(col("vec_id"), qz(col("l2_norm"), 6).as("l2_norm"),
          qz(col("mean"), 6).as("mean"),
          col("min_v"), col("max_v"))
        .orderBy("vec_id")
    }),

    // brute-force cosine top-5 for the first 20 vectors
    "q58_knn_bruteforce" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Embeddings.cosineTopK(e.filter(col("vec_id") < 20), e,
          "vec_id", "vec_id", "embedding", k = 5)
        .orderBy("query_id", "neighbor_id")
    }),

    // IVF index: KMeans lists + nProbe search (rows-only — KMeans has no
    // SQL oracle; recall vs brute force is asserted in IvfSpec)
    "q62_ivf_knn" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val index = graft.operators.Ivf.build(e, "vec_id", "embedding", nLists = 16)
      graft.operators.Ivf.search(index, e.filter(col("vec_id") < 20),
          "vec_id", "embedding", nProbe = 4, topK = 5)
        .orderBy("query_id", "neighbor_id")
    }),

    // sign-random-projection LSH near-neighbor pairs (rows-only)
    "q59_lsh_neighbors" -> ((s, dir) => {
      Embeddings.lshNeighborPairs(Tables.embeddings(s, dir),
          "vec_id", "embedding", nPlanes = 12, dim = 64, minSim = 0.0)
        .orderBy("id1", "id2")
    })
  )

  def oracle: Map[String, String] = Map(
    "q57_embed_stats" ->
      """WITH e AS (
        | SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |  embedding FROM embeddings)
        |SELECT vec_id,
        | round((sqrt(list_sum(list_transform(v, x -> x*x)))) * 1000000.0) / 1000000.0 + 0.0 AS l2_norm,
        | round((list_sum(v) / len(v)) * 1000000.0) / 1000000.0 + 0.0 AS mean,
        | CAST(list_min(embedding) AS DOUBLE) AS min_v,
        | CAST(list_max(embedding) AS DOUBLE) AS max_v
        |FROM e ORDER BY vec_id""".stripMargin,

    "q58_knn_bruteforce" ->
      """WITH e AS (
        | SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        | FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
        |sims AS (
        | SELECT query_id, e.vec_id AS neighbor_id,
        |  round((list_dot_product(qv, e.v)
        |   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v)))) * 1000000.0) / 1000000.0 + 0.0 AS sim
        | FROM q, e WHERE e.vec_id <> query_id),
        |ranked AS (
        | SELECT query_id, neighbor_id, sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        | FROM sims)
        |SELECT query_id, neighbor_id, sim FROM ranked WHERE rn <= 5
        |ORDER BY query_id, neighbor_id""".stripMargin
  )
}
