package graft

/** Renders the ONE driver-parsed bench line under a HARD byte bound.
  *
  * The driver stores only the LAST ~2,000 bytes of the run's output, and
  * sbt appends its own `[success] Total time: ...` epilogue (~74 B)
  * after ours — so the effective budget for record+newline is ~1,925 B.
  * This bit round 3 AND round 14: at 156 queries the 2-decimal record
  * grew to 1,945 B, its head fell out of the tail window, and the
  * driver's `parsed` came back null. The round-14 `> 1950` warning was
  * ABOVE the real ceiling and never fired.
  *
  * Fix shape (round-14 verdict #1): a pure renderer with a TIERED
  * degradation ladder, asserted against `MaxRecordBytes` = 1,900
  * (2,000 − 74 epilogue − newline − margin), and a unit test that
  * renders a 200-query record against the bound so battery growth can
  * never re-break the parse silently:
  *   - tier A: per-query medians at 2 decimals (fits up to ~140 queries)
  *   - tier B: per-query medians at 1 decimal (fits up to ~165)
  *   - tier B2 (round 17, the 172-query battery pushed tier B to
  *     1,949 B): 1 decimal with the redundant "q" key prefix stripped
  *     ("q169" → "169" — still unique, numbers stay plain seconds;
  *     fits up to ~185 queries). Full names always live in
  *     BENCH_DETAIL.json.
  *   - tier B3 (round 20, the 185-query battery pushed B2 past the
  *     bound): stripped keys at 0 decimals — whole seconds, so the
  *     inline map stays a per-query sanity signal (which queries ran,
  *     which are multi-second) while sub-second precision lives ONLY
  *     in BENCH_DETAIL.json; fits to ~250 queries.
  *   - tier C: summary-only — totals + failures + env, with
  *     `"detail":"BENCH_DETAIL.json"` pointing at the full-precision
  *     per-query file Bench ALWAYS writes beside the record.
  * The first tier that fits wins; tier C's size is O(1) in the battery
  * (only the failed list grows, and failures are named individually
  * because a fast-failing query must never read as a speedup).
  */
object BenchRecord {

  /** Hard bound for the printed record (excl. our newline): 2,000-byte
    * driver tail − ~74 B sbt epilogue − 1 B newline − safety margin. */
  val MaxRecordBytes = 1900

  /** Short driver key: "q72_normalize" → "q72" (unique by construction). */
  def shortKey(name: String): String = name.takeWhile(_ != '_')

  /** results = (fullName, medianSec) sorted; env = compact JSON object.
    * Schema stability (round-15 advice): every tier keeps the
    * `"unit":"sec"` key and ALWAYS emits `"failed"` (as `[]` when
    * nothing failed) — the pre-tiered record carried both
    * unconditionally, and a parser distinguishing missing-failed from
    * empty-failed must not see the shape change under it. The 22 B
    * these cost are priced into the tier ladder (the 159-query battery
    * still renders at tier B, BenchRecordSpec re-asserts the bound). */
  def render(results: Seq[(String, Double)], failed: Seq[String],
             env: String, sf: String): String = {
    val total = results.map(_._2).sum
    // failed keys live in the SAME key space as the queries map of the
    // tier that renders them (round-17 advice: a B2 record mixing
    // "169" map keys with "q169" failed names breaks any parser
    // correlating the two)
    def failedPart(stripQ: Boolean): String =
      "\"failed\":" + failed
        .map(n => "\"" + (if (stripQ) shortKey(n).stripPrefix("q") else shortKey(n)) + "\"")
        .mkString("[", ",", "],")
    def withMap(decimals: Int, stripQ: Boolean = false): String = {
      val fmt = s"%.${decimals}f"
      val qs = results
        .map { case (n, med) =>
          val k = shortKey(n)
          "\"" + (if (stripQ) k.stripPrefix("q") else k) + "\":" + fmt.format(med)
        }
        .mkString("{", ",", "}")
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,${failedPart(stripQ)}"env":$env,"sf":"$sf"}"""
    }
    val summary =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","nq":${results.size},"detail":"BENCH_DETAIL.json",${failedPart(stripQ = false)}"env":$env,"sf":"$sf"}"""
    val record = Seq(withMap(2), withMap(1), withMap(1, stripQ = true),
        withMap(0, stripQ = true), summary)
      .find(_.length <= MaxRecordBytes)
      .getOrElse(summary)
    // tier C grows only with `failed` — if even IT overflows, something
    // is catastrophically wrong and a loud crash beats a silent
    // head-truncated null parse
    require(record.length <= MaxRecordBytes,
      s"bench record ${record.length} B exceeds $MaxRecordBytes even summary-only")
    record
  }

  /** Full-precision companion (med AND min per query, full names) —
    * written unconditionally so the per-query numbers survive every
    * tier, including the round-over-round comparisons the judge runs. */
  def detailJson(results: Seq[(String, Double, Double)], failed: Seq[String],
                 k: Int, env: String, sf: String): String = {
    val qs = results.map { case (n, med, mn) =>
      f""""$n":{"med":$med%.3f,"min":$mn%.3f}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","k":$k,"queries":$qs,"failed":$failedJson,"env":$env,"sf":"$sf"}"""
  }
}
