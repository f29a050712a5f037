package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transaction generator (SURVEY.md §2.1 S3).
  *
  * Capability match for the reference's generator
  * (`src/data/loader.py:75-184`): seeded, exponential amounts with a
  * fraud-conditional shift, weighted categorical draws, fraud-signal
  * V-columns, injected nulls, sorted uniform event times.
  *
  * Scale design: `spark.range(n)` partitions the id space; every random
  * draw is a pure function of (id, salt) via xxhash64 — reproducible
  * independent of partitioning/parallelism (unlike rand(seed), which is
  * only fixed for a fixed partition layout), and embarrassingly parallel
  * at any n.
  */
object SyntheticData {

  /** uniform(0,1) from (id, salt): 53 usable mantissa bits of xxhash64. */
  private def u(salt: Int) =
    (shiftrightunsigned(xxhash64(col("id"), lit(salt)), 11).cast("double")
      / lit(9007199254740992.0)) // 2^53

  /** -ln(1-u)/λ ~ Exponential(rate λ) via inverse CDF. */
  private def expo(salt: Int, mean: Double) = -log(lit(1.0) - u(salt)) * mean

  /** Weighted categorical draw: cumulative-probability when-ladder. */
  private def weighted(salt: Int, items: Seq[(String, Double)]): Column = {
    val uu = u(salt)
    val cum = items.scanLeft(0.0)(_ + _._2).tail
    items.zip(cum).init.foldRight(lit(items.last._1): Column) {
      case (((v, _), c), acc) => when(uu < c, lit(v)).otherwise(acc)
    }
  }

  /** n synthetic transactions. Fraud rate ~3.5%; fraud amounts shifted
    * (Exp(200)+100 vs Exp(50)), clipped to [1, 10000]; ~n/5 users, ~n/20
    * merchants; nulls injected into email/device at ~10%. */
  def transactions(spark: SparkSession, n: Long, seed: Int = 42): DataFrame = {
    val base = spark.range(n).toDF("id")
    val isFraud = (u(seed + 1) < 0.035).cast("int")
    val legitAmt = expo(seed + 2, 50.0)
    val fraudAmt = expo(seed + 3, 200.0) + 100.0
    val amt = least(greatest(when(isFraud === 1, fraudAmt).otherwise(legitAmt),
      lit(1.0)), lit(10000.0))
    base.select(
      col("id").as("transaction_id"),
      // sorted uniform timestamps over ~1 year of seconds; double step so
      // n > 31.5M doesn't truncate the stride to 0 and collapse event time
      floor(col("id") * lit(31536000.0 / math.max(n, 1L))).cast("long")
        .as("transaction_dt"),
      isFraud.as("is_fraud"),
      (round(amt * 100) / 100).as("transaction_amt"),
      pmod(xxhash64(col("id"), lit(seed + 4)), lit(math.max(n / 5, 1L))).as("card1"),
      pmod(xxhash64(col("id"), lit(seed + 5)), lit(math.max(n / 20, 1L))).as("card2"),
      weighted(seed + 6, Seq("W" -> 0.6, "H" -> 0.15, "C" -> 0.15, "S" -> 0.05, "R" -> 0.05)).as("product_cd"),
      weighted(seed + 7, Seq("visa" -> 0.5, "mastercard" -> 0.3, "american express" -> 0.12, "discover" -> 0.08)).as("card4"),
      weighted(seed + 8, Seq("debit" -> 0.6, "credit" -> 0.4)).as("card6"),
      when(u(seed + 9) < 0.10, lit(null).cast("string"))
        .otherwise(weighted(seed + 10, Seq("gmail.com" -> 0.4, "yahoo.com" -> 0.25,
          "hotmail.com" -> 0.2, "outlook.com" -> 0.15))).as("p_emaildomain"),
      when(u(seed + 11) < 0.10, lit(null).cast("string"))
        .otherwise(weighted(seed + 12, Seq("Windows" -> 0.4, "iOS Device" -> 0.3,
          "MacOS" -> 0.15, "Android" -> 0.15))).as("device_info"),
      // fraud-signal numeric columns: class-conditional means + noise
      (randnFrom(seed + 13) + when(isFraud === 1, 2.0).otherwise(0.0)).as("v1"),
      (randnFrom(seed + 14) + when(isFraud === 1, -1.5).otherwise(0.0)).as("v2"),
      (randnFrom(seed + 15) * 2.0 + when(isFraud === 1, 1.0).otherwise(0.0)).as("v3")
    )
  }

  /** standard normal from two uniforms (Box–Muller), deterministic. */
  private def randnFrom(salt: Int) = {
    val u1 = u(salt)
    val u2 = u(salt + 1000)
    sqrt(lit(-2.0) * log(when(u1 <= 0, 1e-12).otherwise(u1))) *
      cos(lit(2.0 * math.Pi) * u2)
  }

  /** uniform(0,1) from (id, salt-COLUMN) — the lambda-friendly form of
    * [[u]] (a per-element salt must be a Column, not an Int). */
  private def uc(salt: Column) =
    (shiftrightunsigned(xxhash64(col("id"), salt), 11).cast("double")
      / lit(9007199254740992.0))

  /** n MIXTURE-OF-CLUSTERS embeddings (round-16 verdict "Missing #4":
    * the driver corpus is Gaussian/isotropic, so IVF cell-recall,
    * SemDeDup, and the OPQ rotation tiers never see discriminating
    * geometry — OPQ-P saturates at recall 1.000 everywhere and q157/
    * q159 must plant anisotropy by hand). Geometry: `k` seeded cluster
    * centers; each cluster draws x = center_c + Σ_j s_j·g_j·v_{c,j}
    * with its OWN orthonormal principal axes v_{c,·} (Gram-Schmidt on
    * seeded Gaussians) and a long/short axis split (s = 2.5 on dim/8
    * axes, 0.3 elsewhere) — per-cluster anisotropy in per-cluster
    * ORIENTATIONS, the geometry a single global rotation provably
    * cannot align for every cluster at once.
    *
    * Determinism: the per-cluster matrices are driver-side constants
    * of the seed; every per-row draw is a pure function of (id, salt)
    * via xxhash64 (the S3 discipline) — layout-independent at any
    * partitioning. Cost note: the matvec is an interpreted
    * O(dim²)-per-row expression over literal arrays — a FIXTURE
    * generator for probes and specs, not a hot-path operator (at the
    * probe's 10⁵ rows it is sub-second; a corpus-scale generator would
    * stage this as a native expression first). */
  def clusteredEmbeddings(spark: SparkSession, n: Long, k: Int = 8,
                          dim: Int = 64, seed: Int = 42): DataFrame = {
    require(k >= 1 && dim >= 8 && dim % 8 == 0,
      s"need k >= 1 and dim a positive multiple of 8: k=$k dim=$dim")
    // amplitude budget: every component must stay inside Pca.fit's
    // fixed-point range (|x| < 2). Center components are N(0, 0.35²)
    // (512 draws — a 3.5σ outlier is ~1.2) and the noise sum per output
    // dim is N(0, ~0.13²) (a 5σ tail over 4M draws is ~0.66), so |x|
    // stays under ~1.9 without clipping that would distort the geometry
    val rnd = new scala.util.Random(seed.toLong * 1000003L + 17L)
    val centers = Array.fill(k, dim)(rnd.nextGaussian() * 0.35)
    // per-cluster M[o][j] = s_j · v_j[o]: x = center + M · g
    val mats: Array[Array[Array[Double]]] = Array.fill(k) {
      val g = Array.fill(dim, dim)(rnd.nextGaussian())
      for (i <- 0 until dim) {
        for (j <- 0 until i) {
          val d = (0 until dim).map(t => g(i)(t) * g(j)(t)).sum
          for (t <- 0 until dim) g(i)(t) -= d * g(j)(t)
        }
        val nn = math.sqrt(g(i).map(x => x * x).sum)
        for (t <- 0 until dim) g(i)(t) /= nn
      }
      Array.tabulate(dim, dim) { (o, j) =>
        val s = if (j < dim / 8) 0.35 else 0.05 // 7x long/short anisotropy
        s * g(j)(o)
      }
    }
    val mLit = typedLit(mats.map(_.map(_.toSeq).toSeq).toSeq)
    val cLit = typedLit(centers.map(_.toSeq).toSeq)
    spark.range(n).toDF("id")
      .withColumn("__c",
        pmod(xxhash64(col("id"), lit(seed + 21)), lit(k.toLong)).cast("int"))
      // the Gaussian vector is STAGED once per row — referencing the
      // Box-Muller expression inside the matvec lambda would re-derive
      // it per output dimension (the O(n²) interpreted-lambda trap)
      .withColumn("__g", transform(sequence(lit(0), lit(dim - 1)), j => {
        val u1 = uc(lit(seed + 100) + j * 2)
        val u2 = uc(lit(seed + 101) + j * 2)
        sqrt(lit(-2.0) * log(when(u1 <= 0, 1e-12).otherwise(u1))) *
          cos(lit(2.0 * math.Pi) * u2)
      }))
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)), o =>
          (element_at(element_at(cLit, col("__c") + 1), o) +
            aggregate(sequence(lit(1), lit(dim)), lit(0.0), (acc, j) =>
              acc + element_at(element_at(
                element_at(mLit, col("__c") + 1), o), j) *
                element_at(col("__g"), j)))
            .cast("float")).as("embedding"),
        col("__c").as("cluster_id"))
  }
}
