package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

object Util {
  /** A registered query: (session, sfDir) => result DataFrame. */
  type Q = (SparkSession, String) => DataFrame

  /** Cross-engine deterministic quantization to `digits` decimals:
    * round(x·10ᵈ)/10ᵈ as plain double ops. Unlike decimal-string rounding
    * (Spark's round(col, d)), this agrees bit-for-bit with DuckDB's
    * round(x·10ᵈ)/10ᵈ because both sides see the identical double y=x·10ᵈ
    * and integer-round it with the same half-away-from-zero rule at
    * representable halves. Used on every float output in the oracle
    * queries.
    *
    * The trailing `+ 0.0` canonicalizes IEEE negative zero (−0.0 + 0.0 =
    * +0.0; identity for every other double): DuckDB's round preserves the
    * sign of −0.0 (e.g. round(cos(3π/2)·1e6)/1e6) while Spark's BigDecimal
    * round cannot represent it, so without normalization on BOTH engines a
    * bit-exact hash compare fails on values that are numerically equal.
    * The oracle SQL twin appends `+ 0.0` after each round(...)/f. */
  def qz(c: Column, digits: Int): Column = {
    import org.apache.spark.sql.functions.{lit, round}
    val f = math.pow(10, digits)
    round(c * f, 0) / f + lit(0.0)
  }

  /** Association-free money-sum gate: quantize each term to `digits`
    * decimals AS A LONG (round(x·10ᵈ) — exact for |x·10ᵈ| < 2⁵³), sum
    * the longs (exact, order-independent), divide back to a double.
    * A plain double sum(x) of n large terms carries ~n·ulp(total) of
    * engine-specific association error; once that exceeds half the
    * rounding step of a qz gate the cross-engine hash is a coin flip
    * (the round-9 q119 red row: sum ≈ 2×10⁹ over 60 K terms ≈ 0.03
    * error vs a 0.005 step). The long sum has ZERO association error,
    * so both engines derive the identical double at any scale where
    * the scaled total fits 2⁶³ (sf5 money totals ≈ 2.6×10¹⁵ « 2⁶³).
    * DuckDB twin: sum(CAST(round(x*10ᵈ) AS BIGINT)) / 10ᵈ.0 + 0.0. */
  def exactSum(c: Column, digits: Int): Column = {
    import org.apache.spark.sql.functions.{lit, round, sum}
    val f = math.pow(10, digits)
    sum(round(c * f, 0).cast("long")) / f + lit(0.0)
  }

  /** Discrete-percentile gate values (round-10 verdict #1/#2): the
    * k-th smallest ACTUAL DATA VALUE at k = ceil(n·num/den), computed
    * with pure integer arithmetic `(n·num + den − 1) div den` — the
    * SQL-standard percentile_disc selection (smallest v with
    * cume_dist ≥ num/den; the ceil-rank element equals it even under
    * ties), but with the rank arithmetic written out EXPLICITLY so
    * neither engine's percentile implementation is in the loop.
    *
    * Why: an interpolated percentile (Spark `percentile`, DuckDB
    * `quantile_cont`) emits `lo + frac·(hi−lo)` — a double whose last
    * ulp depends on each engine's interpolation arithmetic and version.
    * Hash a qz() of that, or multiply it into a clip, and the gate is
    * one ulp away from a coin flip whenever `x·10⁶` sits near a `.5`
    * boundary (the three-round q119 red row). A discrete bound is an
    * element of the input — bit-identical in both engines by
    * construction, at any scale and any DuckDB version. Rule: any
    * percentile value that is HASHED (or feeds a hashed comparison)
    * must be discrete or pre-quantized; interpolated percentiles are
    * only for unhashed containment windows with ≥0.5%-rank margins.
    *
    * Cost: one rank shuffle per group (unpartitioned window when
    * `groupCols` is empty) — the same single-reducer class as the exact
    * percentile it replaces; gate-only code by the q119/q128 contract,
    * never the 100 TB path (that is approx_percentile).
    *
    * Nulls are filtered BEFORE ranking (Spark sorts nulls first,
    * DuckDB last — identical only on null-free input; percentile
    * semantics ignore nulls anyway).
    *
    * DuckDB twin (grouped; drop PARTITION BY for global):
    *   WITH r AS (SELECT g, v,
    *     row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
    *     count(*)    OVER (PARTITION BY g)              AS n
    *    FROM t WHERE v IS NOT NULL)
    *   SELECT g, max(CASE WHEN rn = (n*num + den-1) // den THEN v END) AS p
    *   FROM r GROUP BY g
    */
  def discPercentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Int, Int)]): DataFrame =
    rankGate(df, groupCols, valueCol) { (rn, n, v) =>
      import org.apache.spark.sql.functions.{expr, max, when}
      ps.map { case (nm, num, den) =>
        max(when(rn === expr(s"(__n * $num + ${den - 1}) div $den"), v)).as(nm)
      }
    }

  /** Linearly-INTERPOLATED percentile with the interpolation arithmetic
    * written out explicitly — same VALUE (to 1 ulp) as Spark
    * `percentile` / DuckDB `quantile_cont` / pandas `.median()`, but
    * because BOTH engines evaluate the identical explicit expression
    * `lo + (hi − lo)·(rem/den)` on identical discrete neighbors
    * (lo = v at rank (n−1)·num div den + 1; hi = next rank iff
    * rem = (n−1)·num mod den > 0), the result is bit-identical across
    * engines and versions — hashable. Use this (not the builtins) for
    * every hashed percentile where interpolated semantics matter
    * (medians / describe parity); use [[discPercentiles]] where a
    * data-value bound is wanted (winsorize clips). Same nulls/cost
    * contract as discPercentiles.
    *
    * DuckDB twin (rem/den is DuckDB float division):
    *   max(CASE WHEN rn = lo_rank THEN v END)
    *    + (max(CASE WHEN rn = hi_rank THEN v END)
    *       - max(CASE WHEN rn = lo_rank THEN v END))
    *      * (((n-1)*num % den) / den)
    */
  def interpPercentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Int, Int)]): DataFrame =
    rankGate(df, groupCols, valueCol) { (rn, n, v) =>
      import org.apache.spark.sql.functions.{expr, lit, max, when}
      ps.map { case (nm, num, den) =>
        val loRank = expr(s"((__n - 1) * $num) div $den + 1")
        val rem = expr(s"((__n - 1) * $num) % $den")
        val hiRank = loRank + when(rem > 0, lit(1)).otherwise(lit(0))
        val lo = max(when(rn === loRank, v))
        val hi = max(when(rn === hiRank, v))
        (lo + (hi - lo) * (max(rem).cast("double") / lit(den.toDouble))).as(nm)
      }
    }

  /** Dual-dialect integer floor-division on a nonneg integer expr:
    * `/` is float division in BOTH Spark SQL and DuckDB (so this parses
    * in both — SqlSurfaceSpec runs every oracle through spark.sql), and
    * floor(x/d) is exact for x < 2⁵³ (correctly-rounded division can't
    * cross an integer boundary: error ≤ ulp(x) « distance 1/d). */
  private def fdiv(x: String, den: Int): String =
    s"CAST(floor(($x) / $den) AS BIGINT)"

  /** DuckDB/Spark twin snippet for one [[discPercentiles]] aggregate —
    * ceil-rank selection, integer arithmetic only. */
  def discSql(v: String, num: Int, den: Int): String =
    s"max(CASE WHEN rn = ${fdiv(s"n * $num + ${den - 1}", den)} THEN $v END)"

  /** DuckDB/Spark twin snippet for one [[interpPercentiles]] aggregate —
    * to be placed in a GROUP BY over a CTE exposing (rn, n, value) from
    * row_number()/count() windows (see q129's oracle). Generated, not
    * hand-copied, so the two engines' arithmetic cannot drift. */
  def interpSql(v: String, num: Int, den: Int): String = {
    val lo = s"${fdiv(s"((n-1) * $num)", den)} + 1"
    val hi = s"$lo + (CASE WHEN ((n-1) * $num) % $den > 0 THEN 1 ELSE 0 END)"
    s"max(CASE WHEN rn = $lo THEN $v END)" +
      s" + (max(CASE WHEN rn = $hi THEN $v END)" +
      s" - max(CASE WHEN rn = $lo THEN $v END))" +
      s" * (CAST(max(((n-1) * $num) % $den) AS DOUBLE) / $den.0)"
  }

  /** Bucketed rank-k selection (round-11 verdict #4 — the
    * `Metrics.rocAuc` bucketed-prefix-sum shape applied to the
    * percentile gates): the old implementation ranked with ONE
    * unpartitioned `row_number` window — the single-reducer sort Spark
    * itself warns about, and the battery's only single-reducer stage at
    * sf5. Now ranks come from three parallel steps:
    *
    *  1. per-group [min, max] (tiny frame, broadcast back);
    *  2. each row buckets by `floor((v−mn)/(mx−mn)·B)` — every FP op is
    *     monotone nondecreasing and equal values share a bucket, so
    *     bucket order IS value order; per-(group, bucket) counts
    *     prefix-sum into bucket offsets along the BOUNDED bucket axis
    *     (≤ B rows per group: a window PARTITIONED by group, or for the
    *     global case a ≤B-row driver fold — the bounded-aggregate class,
    *     like the ANN codebooks);
    *  3. `row_number` PARTITIONED by (group, bucket) + the bucket's
    *     offset reconstructs the exact global rank.
    *
    * The value at every rank is identical to the sorted-rank value
    * (ties share a bucket and are interchangeable at equal value), so
    * the six gate queries' hashes are unchanged by construction — only
    * the plan shape moved from one reducer to ~B-way parallel.
    * Floating NaN sorts last (both engines' convention): NaN parks in
    * the top bucket and min/max ignore it.
    *
    * EAGER by design: the bounded per-group aggregate executes here
    * and the caller receives the result as a LOCAL frame. That kills
    * the dominant cost of the lazy form — a STACKED gate (q126: MAD
    * over deviations from a gate-computed median) re-ran the entire
    * first gate inside each of the second gate's passes (19.2 s →
    * 7.7 s at sf5) — and every downstream join against a gate result
    * now broadcasts trivially. The 3-4 passes within ONE gate still
    * re-read the slim input (range, counts, ranks — the range subtree
    * rides each executed plan as a broadcast build); persisting the
    * projection instead measured neutral-to-slightly-worse at sf5
    * (cache materialization ≈ the saved columnar re-scans), so the
    * simpler uncached form stands — revisit only if a gate input ever
    * becomes expensive to recompute upstream of the projection. */
  private def rankGate(df: DataFrame, groupCols: Seq[String], valueCol: String)(
      build: (Column, Column, Column) => Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, floor, isnan, least, lit, max, min, not, row_number, sum, when}
    val B = 1024
    val v = col(valueCol)
    val gc = groupCols.map(col)
    val spark = df.sparkSession
    val nn: DataFrame = df.filter(v.isNotNull).select(gc :+ v: _*)
    locally {
      val floating = df.schema(valueCol).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => true
        case _ => false
      }
      val finite = if (floating) when(not(isnan(v)), v) else v
      val rangeAggs = Seq(min(finite).as("__mn"), max(finite).as("__mx"))
      val range =
        if (groupCols.isEmpty) nn.agg(rangeAggs.head, rangeAggs.tail: _*)
        else nn.groupBy(gc: _*).agg(rangeAggs.head, rangeAggs.tail: _*)
      val withRange =
        if (groupCols.isEmpty) nn.crossJoin(broadcast(range))
        else nn.join(broadcast(range), groupCols)
      val span = col("__mx") - col("__mn")
      val base = when(span <= 0 || col("__mn").isNull, lit(0))
        .otherwise(least(floor((v - col("__mn")) / span * B), lit(B - 1)))
        .cast("int")
      val bExpr = if (floating) when(isnan(v), lit(B - 1)).otherwise(base) else base
      val bucketed = withRange.select(gc :+ v :+ bExpr.as("__b"): _*)
      val counts = bucketed.groupBy((gc :+ col("__b")): _*).agg(count(lit(1)).as("__c"))
      val ranked =
        if (groupCols.isEmpty) {
          // global case: the counts frame is ≤ B rows by construction —
          // fold offsets on the driver (bounded aggregate) instead of an
          // unpartitioned window over it
          val rows = counts.orderBy("__b").collect()
          var acc = 0L
          val offs = rows.map { r =>
            val o = (r.getInt(0), acc); acc += r.getLong(1); o
          }.toSeq
          val n = acc
          import spark.implicits._
          val offsets = offs.toDF("__b", "__off")
          bucketed.join(broadcast(offsets), Seq("__b"))
            .select(v,
              (col("__off") + row_number().over(
                Window.partitionBy(col("__b")).orderBy(valueCol))).as("__rn"),
              lit(n).as("__n"))
        } else {
          val wOff = Window.partitionBy(gc: _*).orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)
          val wTot = Window.partitionBy(gc: _*)
          val offsets = counts.select(gc :+ col("__b") :+
            coalesce(sum(col("__c")).over(wOff), lit(0L)).as("__off") :+
            sum(col("__c")).over(wTot).as("__n"): _*)
          val wLocal = Window.partitionBy((gc :+ col("__b")): _*).orderBy(valueCol)
          bucketed.join(broadcast(offsets), groupCols :+ "__b")
            .select(gc :+ v :+
              (col("__off") + row_number().over(wLocal)).as("__rn") :+ col("__n"): _*)
        }
      val aggs = build(col("__rn"), col("__n"), v)
      val result =
        if (groupCols.isEmpty) ranked.agg(aggs.head, aggs.tail: _*)
        else ranked.groupBy(gc: _*).agg(aggs.head, aggs.tail: _*)
      // one row per group — bounded by the gate contract
      val out = result.collect()
      spark.createDataFrame(java.util.Arrays.asList(out: _*), result.schema)
    }
  }

  /** Append derived (name, expr) pairs in ONE select — avoids the
    * chained-withColumn analysis blowup on wide schemas (SURVEY.md §4.1). */
  def addCols(df: DataFrame, feats: Seq[(String, Column)]): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.select(df.columns.map(col).toSeq ++ feats.map { case (n, c) => c.as(n) }: _*)
  }
}
