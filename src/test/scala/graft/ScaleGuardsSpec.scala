package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level scale guards (round-10 verdict #8): invariants that are
  * about what code EXISTS, not what it computes. Exact `percentile` —
  * the sort-based aggregate that buffers a whole group on one reducer —
  * is a CROSS-ENGINE GATE device; the oracle queries under
  * `graft/queries` may use it to pin exact values (with the
  * approx_percentile scale path exercised beside them, q128/q129), but
  * no operator or pipeline under the other packages may, or a
  * production path would silently inherit the single-reducer shape at
  * 100 TB. */
class ScaleGuardsSpec extends AnyFunSuite {

  private def scalaSources(dir: java.io.File): Seq[java.io.File] = {
    val (dirs, files) = Option(dir.listFiles).getOrElse(Array.empty).toSeq
      .partition(_.isDirectory)
    files.filter(_.getName.endsWith(".scala")) ++ dirs.flatMap(scalaSources)
  }

  test("exact percentile appears ONLY under graft/queries (gate code), never in operators") {
    val root = new java.io.File("src/main/scala/graft")
    assert(root.isDirectory, s"run from the repo root: ${root.getAbsolutePath}")
    val offenders = scalaSources(root)
      .filterNot(_.getPath.contains("/queries/"))
      .flatMap { f =>
        val text = java.nio.file.Files.readString(f.toPath)
        // strip the approx_ prefix hits, then look for the exact form
        val stripped = text.replace("approx_percentile", "")
        if (stripped.contains("percentile(")) Some(f.getPath) else None
      }
    assert(offenders.isEmpty,
      s"exact percentile() leaked into non-gate code: $offenders — use " +
        "approx_percentile (mergeable sketch) in operators; exact " +
        "percentile is reserved for oracle-gate queries")
  }
}
