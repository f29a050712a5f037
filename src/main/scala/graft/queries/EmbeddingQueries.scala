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

    // IVF ANN, oracle-checked via the q17-style tolerance pattern: the
    // nProbe=4 search's mean recall@5 against the EXACT top-5
    // (cosineTopK — itself hash-proven against DuckDB by q58) must clear
    // a 0.4 floor. On this corpus (random vectors, the hard case) the
    // measured mean is 0.63 (sf0.01) / 0.53 (sf0.1), while a broken
    // assignment or probe ranking degenerates to ~nProbe/nLists = 0.25 —
    // the floor separates the two regardless of data seed. Probe recall
    // is THE property that matters at 1B vectors.
    "q62_ivf_knn" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 20)
      val index = graft.operators.Ivf.build(e, "vec_id", "embedding", nLists = 16)
      val approx = graft.operators.Ivf.search(index, q,
        "vec_id", "embedding", nProbe = 4, topK = 5)
      val exact = Embeddings.cosineTopK(q, e, "vec_id", "vec_id", "embedding", k = 5)
      exact.join(approx.withColumnRenamed("sim", "asim"),
          Seq("query_id", "neighbor_id"), "left")
        .agg(count_distinct(col("query_id")).as("n_queries"),
          count(lit(1)).cast("long").as("n_exact"),
          count(col("asim")).cast("long").as("n_hits"))
        .select(col("n_queries"), col("n_exact"),
          (col("n_hits").cast("double") / col("n_exact") >= 0.4).as("recall_ok"))
    }),

    // IVF machinery proof: probing ALL lists must reproduce brute force
    // EXACTLY (hash-checked vs the q58 oracle) — a dropped or duplicated
    // vector anywhere in build/assign/search breaks this row
    "q63_ivf_exact" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val index = graft.operators.Ivf.build(e, "vec_id", "embedding", nLists = 16)
      graft.operators.Ivf.search(index, e.filter(col("vec_id") < 20),
          "vec_id", "embedding", nProbe = 16, topK = 5)
        .orderBy("query_id", "neighbor_id")
    }),

    // SRP-LSH near-dup pairs, oracle-checked on the deterministic LSH
    // guarantee: identical vectors share every hyperplane sign, so
    // planted exact copies (vec_id+100000, reproducible in SQL) MUST be
    // found with probability 1 — while the corpus's natural pairs (max
    // cosine ~0.6) stay far under the 0.999 floor. Recall of exact
    // duplicates is the dedup contract this operator serves at scale.
    "q59_lsh_neighbors" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val planted = e.filter(col("vec_id") < 50)
        .withColumn("vec_id", col("vec_id") + 100000L)
      Embeddings.lshNeighborPairs(e.unionByName(planted),
          "vec_id", "embedding", nPlanes = 12, dim = 64, minSim = 0.999)
        .orderBy("id1", "id2")
    }),

    // embedding-cosine NEAR-dup detection (vector half of the dedup
    // family), oracle-checked end to end like q54: multi-table SRP-LSH
    // generates candidates, exact cosine verifies, and the emitted set
    // must EQUAL the exact cosine>=0.9 pair set DuckDB computes directly
    // on the same derived corpus. Planted copies are PERTURBED (first
    // coordinate +0.01, double math both engines reproduce bit-equal) so
    // this tests genuine near-dups at cosine ~0.9998 — missed by any one
    // table w.p. ~0.16 but by all 8 w.p. ~1e-9 — while natural pairs
    // (cosine <= ~0.65) stay far under the 0.9 threshold.
    "q74_cosine_neardup" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val base = e.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val planted = base.filter(col("vec_id") < 40)
        .select((col("vec_id") + 200000L).as("vec_id"),
          concat(array(element_at(col("v"), 1) + lit(0.01)),
            slice(col("v"), lit(2), size(col("v")) - 1)).as("v"))
      Embeddings.cosineNearDupPairs(base.unionByName(planted),
          "vec_id", "v", minSim = 0.9, nPlanes = 12, nTables = 8, dim = 64)
        .orderBy("id1", "id2")
    })
  )

  def oracle: Map[String, String] = Map(
    // exact cosine>=0.9 pairs over the same derived corpus (originals +
    // perturbed copies) — candidate generation must not lose one
    "q74_cosine_neardup" ->
      """WITH e AS (
        | SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        | FROM embeddings),
        |ad AS (
        | SELECT vec_id, v FROM e
        | UNION ALL
        | SELECT vec_id + 200000, list_concat([v[1] + 0.01], v[2:]) AS v
        | FROM e WHERE vec_id < 40),
        |sims AS (
        | SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round((list_dot_product(a.v, b.v)
        |   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1000000.0) / 1000000.0 + 0.0 AS sim
        | FROM ad a JOIN ad b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, sim FROM sims WHERE sim >= 0.9
        |ORDER BY id1, id2""".stripMargin,

    // the planted exact copies are the complete >=0.999 pair set
    "q59_lsh_neighbors" ->
      """SELECT vec_id AS id1, vec_id + 100000 AS id2, CAST(1.0 AS DOUBLE) AS sim
        |FROM embeddings WHERE vec_id < 50 ORDER BY id1""".stripMargin,

    // mean probe recall must clear the floor (q17-style tolerance flag)
    "q62_ivf_knn" ->
      """SELECT count(*) AS n_queries, CAST(5 * count(*) AS BIGINT) AS n_exact,
        | true AS recall_ok
        |FROM embeddings WHERE vec_id < 20""".stripMargin,

    // full-probe IVF == brute force, same oracle as q58
    "q63_ivf_exact" ->
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
        |ORDER BY query_id, neighbor_id""".stripMargin,

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
