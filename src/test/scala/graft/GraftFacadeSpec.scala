package graft

/** The SQL-first façade: registered views answer plain spark.sql with
  * the native functions available, and the PromQL entry point matches
  * the operator result.
  */
class GraftFacadeSpec extends SparkTestBase {
  import spark.implicits._

  test("registerViews exposes the engine relations to plain spark.sql") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 2.0, "a"),
      ev(1, 1000, "purchase", 3.0, "a"),
      ev(2, 0, "signup", 7.0, "a"),
      ev(3, 0, "error", 0.5, "a")
    ).toDF(eventCols: _*),
      "documents" -> Seq((0L, "alpha beta gamma delta", "en", "src", 22L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq((0L, Array(1.0f, 0.0f)))
        .toDF("doc_id", "embedding"))
    Graft.registerViews(spark, dir)
    assert(spark.sql("SELECT value FROM counter_snapshot WHERE name = 'purchase'")
      .as[Double].head() === 5.0)
    assert(spark.sql("SELECT value FROM gauge_snapshot").as[Double].head() === 7.0)
    assert(spark.sql("SELECT COUNT(*) FROM metric_events").as[Long].head() === 4L)
    assert(spark.sql("SELECT COUNT(*) FROM doc_shingles").as[Long].head() === 2L)
    // native function registered alongside the views
    assert(spark.sql("SELECT int_dot(array(2L, 3L), array(4L, 5L)) AS d")
      .as[Long].head() === 23L)
    // PromQL façade agrees with the SQL view
    assert(Graft.promql(spark, dir, "sum by (k) (purchase)")
      .select($"value").as[Double].head() === 5.0)
  }

  test("rowsOnly manifest is exactly the oracle-less registered queries") {
    val oracleLess = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(SparkEntry.rowsOnly.keySet === oracleLess,
      s"manifest drift: only-in-manifest=${SparkEntry.rowsOnly.keySet -- oracleLess} " +
        s"missing-from-manifest=${oracleLess -- SparkEntry.rowsOnly.keySet}")
    // every ungateable query carries a substantive reason naming the spec
    // that pins it instead of the hash gate
    SparkEntry.rowsOnly.foreach { case (name, reason) =>
      assert(reason.length > 40 && reason.toLowerCase.contains("spec"),
        s"$name: rows-only reason must say why and which spec covers it")
    }
    // and no oracle entry dangles without a registered query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("releaseCaches drops the session caches; queries rebuild them transparently") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 2.0, "a"), ev(1, 1000, "purchase", 3.0, "a")
    ).toDF(eventCols: _*))
    import graft.operators.Metrics
    Metrics.metricEvents(spark, dir).count()
    Graft.releaseCaches(spark)
    // all engine-cached RDDs are gone from executor storage
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "released caches still pin executor storage")
    // and the next query simply rebuilds the cache
    assert(Metrics.counterSnapshot(spark, dir).count() > 0)
  }
}
