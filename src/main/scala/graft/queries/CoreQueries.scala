package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.TargetEncoding
import Util.{Q, qz}

/** Scan / projection / aggregation / join / set-op queries
  * (SURVEY.md §2.1-2.4, §2.6-2.7) with DuckDB oracle SQL.
  *
  * Float-determinism policy for oracle parity: money-scale sums round to
  * 2 decimals, means/derived ratios to 6; counts stay exact integers and
  * all integer outputs are BIGINT on both sides. Every query carries a
  * deterministic total ORDER BY.
  */
object CoreQueries {

  def queries: Map[String, Q] = Map(
    // A1-A4: TPC-H Q1-style grouped multi-aggregate (partial+final hash
    // agg). The MONEY sums gate through Util.exactSum (per-row cent
    // quantization, exact long sum): group sums reach ~5×10⁸ at sf0.01
    // and ~5×10¹⁰ at sf1, where a double sum's association error rivals
    // the 2-dp audit step (the q119 lesson — only 4.3× worst-case
    // headroom here pre-fix). sum_qty stays a plain double sum:
    // quantities are small integers, so their double sum is EXACT.
    // avg_price derives from the same exact cent sum; avg_qty/avg_disc
    // have 10³-10⁵× headroom at 6 dp (integer-exact / tiny magnitude).
    "q01_pricing_summary" -> ((s, dir) => {
      val disc  = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val charge = disc * (lit(1.0) + col("l_tax"))
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          qz(sum("l_quantity"), 2).as("sum_qty"),
          Util.exactSum(col("l_extendedprice"), 2).as("sum_base_price"),
          Util.exactSum(disc, 4).as("sum_disc_price"),
          Util.exactSum(charge, 4).as("sum_charge"),
          qz(avg("l_quantity"), 6).as("avg_qty"),
          qz(Util.exactSum(col("l_extendedprice"), 2) / count(lit(1)), 6).as("avg_price"),
          qz(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // S1/S2 round trip: parquet -> partitioned CSV sink -> explicit-schema
    // CSV scan -> aggregate; the oracle aggregates the parquet source
    // directly, so any loss in the CSV writer/reader (types, precision,
    // timestamps, header handling) turns this row red. CSV is the
    // reference's native format (`src/data/loader.py:41`).
    "q64_csv_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val path = graft.sources.Io.scratchDir("graft_csv_rt")
      graft.sources.Io.writeCsv(Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
        path)
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType),
        StructField("o_orderdate", TimestampType)))
      graft.sources.Io.readCsv(s, path, schema)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          Util.exactSum(col("o_totalprice"), 2).as("sum_price"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"),
          max("o_orderdate").as("max_date"))
        .orderBy("o_orderstatus")
    }),

    // ORC round trip (round 14, q64's mold for the second warehouse
    // format): parquet → ORC sink → ORC scan → aggregate must equal
    // DuckDB computing directly on the parquet source — the trip is
    // proven lossless (types, nulls, and every value feeding the
    // exact-long sums). No timestamp column on purpose: ORC's own
    // temporal classes are a separate semantics (the q64 NTZ note),
    // and this row gates the FORMAT, not calendar plumbing.
    "q158_orc_roundtrip" -> ((s, dir) => {
      val path = graft.sources.Io.scratchDir("graft_orc_rt")
      graft.sources.Io.writeOrc(Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_returnflag",
          "l_quantity", "l_extendedprice"), path)
      graft.sources.Io.readOrc(s, path)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          Util.exactSum(col("l_quantity"), 2).as("sum_qty"),
          Util.exactSum(col("l_extendedprice"), 2).as("sum_price"),
          min("l_extendedprice").as("min_price"),
          max("l_extendedprice").as("max_price"))
        .orderBy("l_returnflag")
    }),

    // deterministic stratified sampling: membership is a pure function
    // of the row key (md5 threshold), so DuckDB evaluating the same
    // predicate must select the IDENTICAL rows — sampling that survives
    // repartitioning, engine swaps and reruns (training-data curation)
    "q66_hash_sample" -> ((s, dir) => {
      graft.operators.Sampling.stratified(Tables.orders(s, dir),
          col("o_orderstatus"), col("o_orderkey"),
          Map("O" -> 0.10, "F" -> 0.20, "P" -> 0.50))
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy("o_orderkey")
    }),

    // P1/P4/P7: predicate + projection — filters push to the parquet scan
    "q02_filter_project" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
          && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"),
          qz(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("net"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // O3: top-k by aggregate → TakeOrderedAndProject, no global sort
    "q03_topk_users" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(qz(sum("value"), 2).as("total_value"), count(lit(1)).as("n_events"))
        .orderBy(desc("total_value"), col("user_id"))
        .limit(10)
    }),

    // A2: histogram
    "q04_event_histogram" -> ((s, dir) => {
      Tables.events(s, dir).groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // A3: grouped describe incl. exact interpolated median. The hashed
    // median comes from Util.interpPercentiles (explicit lo+(hi−lo)·frac
    // — same value as percentile(0.5)/pandas .median(), bit-identical
    // across engines; round-10 verdict-#2 sweep).
    //
    // CONTRACT (round-11 advice): the inner join with the percentile
    // frame drops any group whose value column is ENTIRELY null (the
    // rank gate filters nulls, so such a group has no percentile row).
    // Pandas describe would keep the group with a NaN median; both
    // engines here drop it consistently (the oracle's rank CTE filters
    // nulls the same way), and no test corpus has an all-null group.
    // Use a left join if all-null groups must survive with NULL medians.
    "q05_describe_by_type" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val medx = Util.interpPercentiles(ev.select(col("event_type"), col("value")),
        Seq("event_type"), "value", Seq(("medx", 1, 2)))
      ev.groupBy("event_type")
        .agg(
          count(lit(1)).as("cnt"),
          qz(avg("value"), 6).as("mean_value"),
          qz(stddev_samp(col("value")), 6).as("std_value"),
          min("value").as("min_value"),
          max("value").as("max_value"))
        .join(medx, Seq("event_type"))
        .select(col("event_type"), col("cnt"), col("mean_value"),
          col("std_value"), col("min_value"), col("max_value"),
          qz(col("medx"), 6).as("median_value"))
        .orderBy("event_type")
    }),

    // quantile SKETCH (approx_percentile — mergeable, bounded-memory,
    // the 100 TB path for percentiles) next to the exact sort-based
    // percentile, q17-style tolerance flags: with accuracy 1000 the
    // sketch's rank error is 0.1%, far inside each containment window —
    // ±5% of rank for p50/p90, [p98, max] for p99 (1% below, open
    // above). A broken sketch falls outside; the exact values
    // themselves are hash-checked
    // hashed exact quantiles via Util.interpPercentiles (explicit
    // interpolation, bit-identical cross-engine — round-10 verdict-#2
    // sweep); the builtin percentile array survives only as the unhashed
    // ±5%-rank containment windows
    "q67_quantile_sketch" -> ((s, dir) => {
      val ex = col("ex"); val ap = col("ap")
      val exact = Util.interpPercentiles(
        Tables.events(s, dir).select(col("event_type"), col("value")),
        Seq("event_type"), "value",
        Seq(("p50x", 1, 2), ("p90x", 9, 10), ("p99x", 99, 100)))
      Tables.events(s, dir).groupBy("event_type")
        .agg(
          expr("percentile(value, array(0.45, 0.55, 0.85, 0.95, 0.98))").as("ex"),
          expr("approx_percentile(value, array(0.5, 0.9, 0.99), 1000)").as("ap"),
          count(lit(1)).as("n"),
          max("value").as("mx"))
        .join(exact, Seq("event_type"))
        .select(col("event_type"),
          qz(col("p50x"), 6).as("p50_exact"),
          qz(col("p90x"), 6).as("p90_exact"),
          qz(col("p99x"), 6).as("p99_exact"),
          col("n"),
          element_at(ap, 1).between(element_at(ex, 1), element_at(ex, 2)).as("p50_ok"),
          element_at(ap, 2).between(element_at(ex, 3), element_at(ex, 4)).as("p90_ok"),
          element_at(ap, 3).between(element_at(ex, 5), col("mx")).as("p99_ok"))
        .orderBy("event_type")
    }),

    // JSON-lines round trip — q64's check for the second interchange
    // format (same parquet-source oracle, same lossless-or-red contract)
    "q73_json_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val path = graft.sources.Io.scratchDir("graft_json_rt")
      graft.sources.Io.writeJson(Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
        path)
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType),
        StructField("o_orderdate", TimestampType)))
      graft.sources.Io.readJson(s, path, schema)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          Util.exactSum(col("o_totalprice"), 2).as("sum_price"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"),
          max("o_orderdate").as("max_date"))
        .orderBy("o_orderstatus")
    }),

    // reshape: unpivot/melt (pandas .melt parity, the inverse of q34's
    // pivot) — wide measure columns to (metric, value) long form, a
    // narrow transform (no shuffle; the exchange below is only the
    // output ORDER BY)
    "q68_unpivot" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    }),

    // A5/P5: one-pass per-column null counts over the full width
    "q06_null_counts" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.agg(
        count(lit(1)).as("n_rows"),
        e.columns.map(c => count(when(col(c).isNull, lit(1))).as(s"null_$c")).toSeq: _*)
    }),

    // A6/A7: exact distinct count per group (+ totals)
    "q07_distinct_per_group" -> ((s, dir) => {
      Tables.events(s, dir).groupBy("user_id")
        .agg(countDistinct("event_type").as("n_types"),
          count(lit(1)).as("n_events"),
          qz(sum("value"), 4).as("total_value"))
        .orderBy("user_id")
    }),

    // J1: left outer equi-join, fact side large → shuffle join on key
    "q08_join_left" -> ((s, dir) => {
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(coalesce(col("c_mktsegment"), lit("missing")).as("segment"))
        .agg(count(lit(1)).as("n_orders"), Util.exactSum(col("o_totalprice"), 2).as("total"))
        .orderBy("segment")
    }),

    // left-semi (EXISTS)
    "q09_join_semi" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("c_nationkey")
    }),

    // left-anti (NOT EXISTS). Every harness-SF customer has orders, so
    // the natural result is empty and a green 0 = 0 row was vacuous —
    // plant customers under keys orders can't contain (negative) so the
    // anti-join must find exactly the planted set (q69/q59 pattern).
    "q10_join_anti" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val planted = cust.filter(col("c_custkey") % 50 === 0)
        .withColumn("c_custkey", -col("c_custkey") - 1)
      cust.unionByName(planted)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")
    }),

    // multiway join with explicitly broadcast dims — fact shuffles at most
    // once (for the agg); dim joins are broadcast hash joins
    "q11_join_multiway" -> ((s, dir) => {
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"), Util.exactSum(col("o_totalprice"), 2).as("revenue"))
        .orderBy("r_name", "n_name")
    }),

    // set ops: INTERSECT / EXCEPT over distinct keys
    "q12_set_ops" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      def users(t: String) = e.filter(col("event_type") === t).select("user_id").distinct()
      val both = users("click").intersect(users("purchase"))
        .withColumn("op", lit("click_and_purchase"))
      val diff = users("click").except(users("error"))
        .withColumn("op", lit("click_not_error"))
      both.unionByName(diff).select("op", "user_id").orderBy("op", "user_id")
    }),

    // ORDERED target statistics (CatBoost's ordered-categorical
    // encoding, Prokhorenkova 2018 — the round-9 "no MLlib equivalent"
    // gap): each row's per-category fraud-rate encoding uses ONLY rows
    // preceding it in a fixed permutation (event_id), so no row sees
    // its own label. One key-partitioned window with an
    // unbounded-preceding..1-preceding frame — exact, one shuffle,
    // layout-independent. Integer 0/1 target keeps window sums exact,
    // so the smoothed quotient is cross-engine deterministic.
    "q133_ordered_target_enc" -> ((s, dir) => {
      val enc = graft.operators.TargetEncoding.orderedEncode(
        Tables.events(s, dir)
          .select(col("event_id"), col("event_type"),
            // when/otherwise (not a bare cast): a NULL value must map
            // to 0 exactly like the oracle's CASE WHEN, or the two
            // engines' histories diverge on the first null row
            when(col("value") > 100, lit(1)).otherwise(lit(0)).as("y")),
        key = "event_type", target = col("y"), orderBy = col("event_id"),
        smoothing = 1.0)
      enc.select(col("event_id"), col("event_type"),
          qz(col("ordered_ts"), 6).as("ordered_ts"))
        .orderBy("event_id")
    }),

    // A1+J2: target encoding fit on the chronological "train" slice only,
    // broadcast-joined back with a default for unseen keys
    "q13_target_encoding" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val train = o.filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
      val target = when(col("o_totalprice") > 200000, 1.0).otherwise(0.0)
      val enc = TargetEncoding.fit(train, "o_orderpriority", target)
      TargetEncoding.transform(o, enc, "o_orderpriority", default = 0.035)
        .select(col("o_orderkey"), qz(col("o_orderpriority_enc"), 6).as("prio_enc"))
        .orderBy("o_orderkey")
    }),

    // rollup: hierarchical subtotals + grand total (beyond-reference —
    // the reference has no grouping sets; free from Catalyst)
    "q19_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(qz(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // cube: all 2^k grouping sets in one pass (beyond-reference, like
    // q19's rollup); grouping_id() disambiguates subtotal NULLs from
    // data NULLs — bit order (first col = MSB) verified against DuckDB
    "q75_cube" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(qz(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
    }),

    // arbitrary grouping sets through the SQL front end (rollup/cube
    // are fixed shapes; GROUPING SETS is the general form) — the Spark
    // side IS the oracle text modulo engine, proving the SQL surface
    "q76_grouping_sets" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity) * 100.0) / 100.0 + 0.0 AS sum_qty,
        | count(*) AS n,
        | cast(grouping_id(l_returnflag, l_linestatus) as bigint) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin)
    }),

    // skew path: two-phase salted aggregation — must equal a plain
    // GROUP BY (the oracle IS the unsalted form)
    "q18_salted_agg" -> ((s, dir) => {
      graft.operators.Salting.saltedAgg(Tables.events(s, dir),
          key = "event_type", idCol = "event_id", valueCol = "value")
        .select(col("event_type"), col("n"),
          qz(col("total"), 4).as("total"),
          col("min_value"), col("max_value"),
          qz(qz(col("total"), 4) / col("n"), 6).as("avg_value"))
        .orderBy("event_type")
    }),

    // A9: correlation aggregates (Pearson, sample covariance) per group
    "q16_correlation" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("double").as("k"))
        .groupBy("event_type")
        .agg(qz(corr(col("value"), col("k")), 6).as("corr_vk"),
          qz(covar_samp(col("value"), col("k")), 4).as("covar_vk"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // A6 scale path: exact vs approximate (HLL) distinct counts. The HLL
    // estimate has no cross-engine oracle VALUE, but its relationship to
    // the exact count does: emit a within-tolerance flag (rsd=0.02, 10%
    // band) that DuckDB asserts as literal TRUE — so the exact counts are
    // hash-checked and a broken HLL path flips the flag.
    "q17_approx_distinct" -> ((s, dir) => {
      Tables.events(s, dir).groupBy("event_type")
        .agg(countDistinct("user_id").as("exact_users"),
          approx_count_distinct("user_id", 0.02).as("approx_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * 0.1).as("approx_within_tol"))
        .orderBy("event_type")
    }),

    // JSON extraction from string props + grouped agg
    "q14_json_extract" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), qz(avg("k"), 6).as("avg_k"),
          sum("k").as("sum_k"))
        .orderBy("event_type")
    }),

    // S4 + P3 as a driver gate (previously spec-only): a properties
    // config is WRITTEN then LOADED (GraftConfig.fromProperties — the
    // reference's config.yaml knobs), and its values parameterize the
    // computation: the flag threshold is the file's 0.7, NOT the 0.6
    // default, so a loader that silently fell back to defaults changes
    // n_flagged and the hash goes red; lookback_echo pins the list
    // parsing the same way. The dtype-driven projection (P3,
    // Profiler.numericColumns/stringColumns — pandas select_dtypes
    // parity) picks the columns whose names the oracle pins as
    // literals, and the value mean is computed over the PROJECTED
    // frame, exact-long-summed.
    "q147_config_dtype" -> ((s, dir) => {
      val propsPath = java.nio.file.Files.createTempFile("graft_cfg", ".properties")
      java.nio.file.Files.writeString(propsPath,
        "risk.fraudThreshold=0.7\nfeatures.lookbackDays=2,14\n")
      val cfg = try graft.GraftConfig.fromProperties(propsPath.toString)
      finally java.nio.file.Files.delete(propsPath)
      val ev = Tables.events(s, dir)
      val nums = graft.sources.Profiler.numericColumns(ev)
      val strs = graft.sources.Profiler.stringColumns(ev)
      val numOnly = ev.select(nums.map(col): _*)
      val numStats = numOnly.agg(count(lit(1)).as("n"),
        Util.exactSum(col("value"), 6).as("sv"))
      val flagged = ev.agg(
        sum((graft.serve.RiskScore.EventScore.blended >= cfg.fraudThreshold)
          .cast("long")).as("n_flagged"))
      flagged.crossJoin(broadcast(numStats)).select(
        lit(nums.mkString(",")).as("numeric_cols"),
        lit(strs.mkString(",")).as("string_cols"),
        lit(cfg.lookbackDays.mkString(",")).as("lookback_echo"),
        col("n_flagged"),
        qz(col("sv") / col("n"), 6).as("mean_value_q"))
    })
  )

  def oracle: Map[String, String] = Map(
    // the oracle reads the PARQUET source — equality proves the CSV
    // write/read round trip on the Spark side was lossless
    "q64_csv_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
        | sum(CAST(round((o_totalprice) * 100.0) AS BIGINT)) / 100e0 + 0.0 AS sum_price,
        | min(o_totalprice) AS min_price,
        | max(o_totalprice) AS max_price,
        | max(o_orderdate) AS max_date
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // DuckDB reads the PARQUET source directly — equality proves the
    // ORC write+read trip lossless (q64's discipline)
    "q158_orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n,
        | sum(CAST(round((l_quantity) * 100.0) AS BIGINT)) / 100e0 + 0.0 AS sum_qty,
        | sum(CAST(round((l_extendedprice) * 100.0) AS BIGINT)) / 100e0 + 0.0 AS sum_price,
        | min(l_extendedprice) AS min_price,
        | max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // same md5-threshold predicate, evaluated by DuckDB: the row sets
    // must be identical (thresholds: floor(f*2^32) as 8 hex digits)
    "q66_hash_sample" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE CASE o_orderstatus
        |  WHEN 'O' THEN md5(CAST(o_orderkey AS VARCHAR)) < '19999999'
        |  WHEN 'F' THEN md5(CAST(o_orderkey AS VARCHAR)) < '33333333'
        |  WHEN 'P' THEN md5(CAST(o_orderkey AS VARCHAR)) < '80000000'
        |  ELSE false END
        |ORDER BY o_orderkey""".stripMargin,

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round((sum(l_quantity)) * 100.0) / 100.0 + 0.0 AS sum_qty,
        | sum(CAST(round((l_extendedprice) * 100.0) AS BIGINT)) / 100e0 + 0.0 AS sum_base_price,
        | sum(CAST(round((l_extendedprice*(1-l_discount)) * 10000.0) AS BIGINT)) / 10000e0 + 0.0 AS sum_disc_price,
        | sum(CAST(round((l_extendedprice*(1-l_discount)*(1+l_tax)) * 10000.0) AS BIGINT)) / 10000e0 + 0.0 AS sum_charge,
        | round((avg(l_quantity)) * 1000000.0) / 1000000.0 + 0.0 AS avg_qty,
        | round(((sum(CAST(round((l_extendedprice) * 100.0) AS BIGINT)) / 100e0 + 0.0) / count(*)) * 1000000.0) / 1000000.0 + 0.0 AS avg_price,
        | round((avg(l_discount)) * 1000000.0) / 1000000.0 + 0.0 AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity,
        | round((l_extendedprice*(1-l_discount)) * 10000.0) / 10000.0 + 0.0 AS net
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_topk_users" ->
      """SELECT user_id, round((sum(value)) * 100.0) / 100.0 + 0.0 AS total_value, count(*) AS n_events
        |FROM events GROUP BY user_id
        |ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin,

    "q04_event_histogram" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type",

    // median via the explicit-interpolation twin (Util.interpSql) —
    // same value as median(), bit-identical to the Spark side
    "q05_describe_by_type" ->
      s"""WITH r AS (
        | SELECT event_type, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM events WHERE value IS NOT NULL),
        |m AS (
        | SELECT event_type, ${Util.interpSql("value", 1, 2)} AS medx
        | FROM r GROUP BY event_type)
        |SELECT event_type, count(*) AS cnt,
        | round((avg(value)) * 1000000.0) / 1000000.0 + 0.0 AS mean_value,
        | round((stddev_samp(value)) * 1000000.0) / 1000000.0 + 0.0 AS std_value,
        | min(value) AS min_value, max(value) AS max_value,
        | round(max(medx) * 1000000.0) / 1000000.0 + 0.0 AS median_value
        |FROM events JOIN m USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // exact quantiles hash-checked (explicit-interpolation twin —
    // Util.interpSql); sketch containment flags must be true
    "q67_quantile_sketch" ->
      s"""WITH r AS (
        | SELECT event_type, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM events WHERE value IS NOT NULL),
        |m AS (
        | SELECT event_type,
        |  ${Util.interpSql("value", 1, 2)} AS p50x,
        |  ${Util.interpSql("value", 9, 10)} AS p90x,
        |  ${Util.interpSql("value", 99, 100)} AS p99x
        | FROM r GROUP BY event_type)
        |SELECT event_type,
        | round(p50x * 1000000.0) / 1000000.0 + 0.0 AS p50_exact,
        | round(p90x * 1000000.0) / 1000000.0 + 0.0 AS p90_exact,
        | round(p99x * 1000000.0) / 1000000.0 + 0.0 AS p99_exact,
        | c.n AS n,
        | true AS p50_ok, true AS p90_ok, true AS p99_ok
        |FROM m JOIN (SELECT event_type, count(*) AS n FROM events GROUP BY 1) c
        | USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // parquet-source oracle: equality proves the JSON round trip lossless
    "q73_json_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
        | sum(CAST(round((o_totalprice) * 100.0) AS BIGINT)) / 100e0 + 0.0 AS sum_price,
        | min(o_totalprice) AS min_price,
        | max(o_totalprice) AS max_price,
        | max(o_orderdate) AS max_date
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // long-form twin via UNION ALL (portable, no UNPIVOT dialect)
    "q68_unpivot" ->
      """WITH w AS (
        | SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_quantity, l_extendedprice, l_discount
        | FROM lineitem WHERE l_orderkey < 100)
        |SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM w
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM w
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM w
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "q06_null_counts" ->
      """SELECT count(*) AS n_rows,
        | count(*) FILTER (WHERE event_id IS NULL) AS null_event_id,
        | count(*) FILTER (WHERE ts IS NULL) AS null_ts,
        | count(*) FILTER (WHERE user_id IS NULL) AS null_user_id,
        | count(*) FILTER (WHERE event_type IS NULL) AS null_event_type,
        | count(*) FILTER (WHERE value IS NULL) AS null_value,
        | count(*) FILTER (WHERE props IS NULL) AS null_props
        |FROM events""".stripMargin,

    "q07_distinct_per_group" ->
      """SELECT user_id, count(DISTINCT event_type) AS n_types, count(*) AS n_events,
        | round((sum(value)) * 10000.0) / 10000.0 + 0.0 AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q08_join_left" ->
      """SELECT coalesce(c_mktsegment,'missing') AS segment, count(*) AS n_orders,
        | sum(CAST(round((o_totalprice) * 100.0) AS BIGINT)) / 100e0 + 0.0 AS total
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY segment""".stripMargin,

    "q09_join_semi" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS n_cust
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q10_join_anti" ->
      """WITH allc AS (
        | SELECT c_custkey, c_mktsegment FROM customer
        | UNION ALL
        | SELECT -c_custkey - 1, c_mktsegment FROM customer WHERE c_custkey % 50 = 0)
        |SELECT c_mktsegment, count(*) AS n_cust
        |FROM allc WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q11_join_multiway" ->
      """SELECT r_name, n_name, count(*) AS n_orders, sum(CAST(round((o_totalprice) * 100.0) AS BIGINT)) / 100e0 + 0.0 AS revenue
        |FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    // identical window semantics in DuckDB (empty preceding frame →
    // NULL → coalesce); the global prior is an exact-int-sum average on
    // both engines, so the smoothed quotient matches bit-for-bit
    "q133_ordered_target_enc" ->
      """WITH t AS (
        | SELECT event_id, event_type,
        |  CASE WHEN value > 100 THEN 1 ELSE 0 END AS y
        | FROM events)
        |SELECT event_id, event_type,
        | round(((coalesce(sum(y) OVER w, 0) + 1.0 * (SELECT avg(y) FROM t)) /
        |        (coalesce(count(y) OVER w, 0) + 1.0)) * 1000000.0) / 1000000.0 + 0.0 AS ordered_ts
        |FROM t
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |ORDER BY event_id""".stripMargin,

    "q12_set_ops" ->
      """SELECT 'click_and_purchase' AS op, user_id FROM
        | (SELECT DISTINCT user_id FROM events WHERE event_type='click'
        |  INTERSECT SELECT DISTINCT user_id FROM events WHERE event_type='purchase')
        |UNION ALL
        |SELECT 'click_not_error' AS op, user_id FROM
        | (SELECT DISTINCT user_id FROM events WHERE event_type='click'
        |  EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type='error')
        |ORDER BY op, user_id""".stripMargin,

    "q13_target_encoding" ->
      """WITH enc AS (
        | SELECT o_orderpriority,
        |  avg(CASE WHEN o_totalprice > 200000 THEN 1.0 ELSE 0.0 END) AS rate
        | FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        | GROUP BY o_orderpriority)
        |SELECT o_orderkey, round((coalesce(rate, 0.035)) * 1000000.0) / 1000000.0 + 0.0 AS prio_enc
        |FROM orders LEFT JOIN enc USING (o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin,

    "q19_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | round((sum(l_quantity)) * 100.0) / 100.0 + 0.0 AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q75_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | round((sum(l_quantity)) * 100.0) / 100.0 + 0.0 AS sum_qty, count(*) AS n,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q76_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | round((sum(l_quantity)) * 100.0) / 100.0 + 0.0 AS sum_qty, count(*) AS n,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q17_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        | TRUE AS approx_within_tol
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q18_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        | round((sum(value)) * 10000.0) / 10000.0 + 0.0 AS total,
        | min(value) AS min_value, max(value) AS max_value,
        | round(((round((sum(value)) * 10000.0) / 10000.0 + 0.0) / count(*)) * 1000000.0) / 1000000.0 + 0.0 AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q16_correlation" ->
      """SELECT event_type,
        | round((corr(value, CAST(json_extract_string(props,'$.k') AS DOUBLE))) * 1000000.0) / 1000000.0 + 0.0 AS corr_vk,
        | round((covar_samp(value, CAST(json_extract_string(props,'$.k') AS DOUBLE))) * 10000.0) / 10000.0 + 0.0 AS covar_vk,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q14_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | round((avg(CAST(json_extract_string(props,'$.k') AS BIGINT))) * 1000000.0) / 1000000.0 + 0.0 AS avg_k,
        | CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the column lists are schema constants (int64/double vs string
    // fields of events); n_flagged re-derives the q32 score chain at
    // the CONFIG-FILE threshold 0.7 — a loader falling back to the 0.6
    // default diverges by the mass between the two thresholds
    "q147_config_dtype" ->
      """WITH base AS (
        | SELECT event_id, value*20.0 AS amt, hour(ts) AS h,
        |  (event_type = 'error') AS dev_missing,
        |  (event_type = 'signup') AS unusual
        | FROM events),
        |s0 AS (SELECT *, 1.0/(1.0 + exp(-0.003*(amt - 500.0))) AS b0 FROM base),
        |s1 AS (SELECT *, CASE WHEN amt > 5000 THEN least(b0 + 0.15, 0.95)
        |                      WHEN amt > 1000 THEN least(b0 + 0.08, 0.85)
        |                      ELSE b0 END AS b1 FROM s0),
        |s2 AS (SELECT *, CASE WHEN dev_missing THEN least(b1 + 0.05, 0.95) ELSE b1 END AS b2 FROM s1),
        |s3 AS (SELECT *, CASE WHEN unusual THEN least(b2 + 0.05, 0.95) ELSE b2 END AS b3 FROM s2),
        |scored AS (
        | SELECT *, CASE WHEN h < 5 OR h > 23 THEN least(b3 + 0.07, 0.95) ELSE b3 END AS heuristic,
        |  least(1.0, amt/10000.0) AS model
        | FROM s3),
        |blended AS (
        | SELECT *, least(1.0, greatest(0.0, model*0.4 + heuristic*0.6)) AS b
        | FROM scored),
        |f AS (SELECT CAST(sum(CASE WHEN b >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged FROM blended),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value*1000000.0) AS BIGINT)) AS DOUBLE)/1000000.0 AS sv FROM events)
        |SELECT 'event_id,user_id,value' AS numeric_cols,
        | 'event_type,props' AS string_cols,
        | '2,14' AS lookback_echo, n_flagged,
        | round((sv / n) * 1000000.0) / 1000000.0 + 0.0 AS mean_value_q
        |FROM f CROSS JOIN m""".stripMargin
  )
}
