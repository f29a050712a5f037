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
    * their `keep` columns by position; `__h` rides last.
    *
    * Ties on `__h` (duplicate ids — LeafBoostProbe samples lineitem by
    * l_orderkey, which repeats per line — or a genuine xxhash64
    * collision) break on the kept columns themselves, so the kept SET
    * is a pure function of the data: without the secondary key, rows at
    * the limit boundary sharing a hash would be chosen by partition
    * arrival order, contradicting the bit-reproducibility contract.
    * Rows identical in hash AND every kept column are interchangeable,
    * so full determinism of the returned multiset holds. */
  private[graft] def hashTopN(df: DataFrame, id: String,
                                  keep: Seq[Column], maxN: Int): DataFrame = {
    val staged = df.select(keep :+ xxhash64(col(id)).as("__h"): _*)
    val keepNames = staged.columns.dropRight(1)
    staged
      .orderBy(col("__h") +: keepNames.map(col).toSeq: _*)
      .limit(maxN)
  }
}
