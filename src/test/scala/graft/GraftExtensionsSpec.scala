package graft

import org.apache.spark.sql.SparkSession

/** The `spark.sql.extensions` deployment path: a session built with
  * `graft.GraftExtensions` resolves the engine's native expressions in
  * plain `spark.sql` without any operator having registered them.
  */
class GraftExtensionsSpec extends SparkTestBase {

  test("spark.sql.extensions injects the native functions into a fresh session") {
    val original = spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions` is a STATIC conf — it only applies when the
    // SparkContext is built with it (cluster deployment). In-JVM, the
    // public `.withExtensions` builder hook exercises the same injection.
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val d = s2.sql("SELECT int_dot(array(1L, 2L), array(3L, 4L)) AS d")
        .collect()(0).getLong(0)
      assert(d === 11L)
      // char_trigrams is a Generator: one output ROW per trigram
      val g = s2.sql("SELECT char_trigrams('abcd') AS g")
        .collect().map(_.getString(0)).toSeq
      assert(g === Seq("abc", "bcd"))
      val q = s2.sql(
        "SELECT histogram_quantile(0.9d, array(1.0d), array(10L), 10L) AS q")
        .collect()(0).getDouble(0)
      assert(q === 0.9)
      // the deterministic transcendentals resolve too, and equal the
      // pinned scalar sequence
      val de = s2.sql("SELECT det_exp2(2.5d) AS e, det_log2(10.0d) AS l")
        .collect()(0)
      assert(de.getDouble(0) === graft.functions.DetMath.exp2(2.5))
      assert(de.getDouble(1) === graft.functions.DetMath.log2(10.0))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(original)
      SparkSession.setActiveSession(original)
    }
  }
}
