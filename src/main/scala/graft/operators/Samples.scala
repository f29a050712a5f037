package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, xxhash64}

/** Deterministic bounded sampling shared by the ANN trainers (Ivf, Pq):
  * keep the `maxN` rows with the smallest xxhash64(id) — a
  * partition-count-independent pseudo-random choice that every executor
  * layout reproduces bit-for-bit. */
object Samples {

  /** The hash is STAGED as its own projected column `__h` (round-10
    * advice: `select(v).orderBy(xxhash64(id))` ordered by a column the
    * select had dropped and only worked because Catalyst's
    * ResolveMissingReferences silently re-added it). Cost shape:
    * orderBy+limit plans as TakeOrderedAndProject — a per-partition
    * top-K heap merged on the driver, O(n·log maxN) scan with NO
    * corpus-wide shuffle or sort (plan-guarded in PqSpec). Callers read
    * their `keep` columns by position; `__h` rides last. */
  private[graft] def hashTopN(df: DataFrame, id: String,
                                  keep: Seq[Column], maxN: Int): DataFrame =
    df.select(keep :+ xxhash64(col(id)).as("__h"): _*)
      .orderBy(col("__h"))
      .limit(maxN)
}
