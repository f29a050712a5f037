package graft

import org.apache.spark.sql.SparkSession

/** The extensions-built session resolves the native expressions as SQL
  * functions with no imperative registration, and they agree with the
  * temp-function route. A fresh SparkSession is built over the shared
  * SparkContext (default/active cleared first — getOrCreate would
  * otherwise return the existing session and skip the extensions). */
class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions registers float_dot/sorted_long_intersect/simhash32/bloom_might_contain") {
    val base = spark // force the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = ext.sql(
        """SELECT
          | float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |           array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          | sorted_long_intersect(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS i,
          | simhash32(array(1L, 3L)) AS s""".stripMargin).collect()(0)
      assert(r.getDouble(0) == 11.0)
      assert(r.getInt(1) == 2)
      // same value through the temp-function route on the base session
      graft.functions.NativeVector.register(base)
      val viaTemp = base.sql("SELECT simhash32(array(1L, 3L))").collect()(0).getLong(0)
      assert(r.getLong(2) == viaTemp)
      // bloom_might_contain through pure SQL on the extensions session:
      // membership of an inserted value, rejection of a disjoint one
      val members = ext.range(100)
        .selectExpr("md5(concat('m', id)) AS s")
      val bloom = graft.functions.BloomSketch.build(members, "s", 100, 0.01)
      // the Column API routes through the same permanent-function
      // registry the extension filled (call_function by name)
      import org.apache.spark.sql.functions.{col, sum => ssum}
      val hits = members.select(ssum(
        graft.functions.BloomSketch.mightContain(col("s"), bloom)
          .cast("int"))).collect()(0).getLong(0)
      assert(hits == 100L, s"members missed: ${100 - hits}")
      // and disjoint probes are (almost all) rejected — an expression
      // that resolved to constant-true would pass the member check
      val disjoint = ext.range(1000).selectExpr("md5(concat('x', id)) AS s")
      val fp = disjoint.select(ssum(
        graft.functions.BloomSketch.mightContain(col("s"), bloom)
          .cast("int"))).collect()(0).getLong(0)
      assert(fp <= 30L, s"non-member acceptance $fp/1000 far above 1% FPP")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
