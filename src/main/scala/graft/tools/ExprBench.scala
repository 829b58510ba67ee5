package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the custom-expression promotions: the codegen'd
  * `int_dot` vs the composed `aggregate(zip_with(...))` higher-order
  * form (CodegenFallback) on synthetic embedding pairs, and the native
  * `char_trigrams` generator vs the `explode(transform(sequence(...)))`
  * substring form. Prints one JSON line per comparison — the "measure,
  * don't guess" evidence behind SURVEY §4's promotion decisions.
  *
  * Run: sbt "runMain graft.tools.ExprBench [nRows]"
  */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.IntDotExpr.register(spark)
    graft.plans.CharTrigramsExpr.register(spark)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // 128-dim integer-quantized embedding pairs
    val vecs = spark.range(n).select(
      expr("transform(sequence(1, 128), i -> CAST((id * 31 + i * 7) % 10007 AS BIGINT))").as("a"),
      expr("transform(sequence(1, 128), i -> CAST((id * 17 + i * 3) % 10007 AS BIGINT))").as("b"))
      .persist()
    vecs.count()
    val hof = "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    (1 to 2).foreach { _ => // warm codegen both ways
      vecs.select(sum(expr("int_dot(a, b)"))).collect()
      vecs.select(sum(expr(hof))).collect()
    }
    val tNative = time(vecs.select(sum(expr("int_dot(a, b)"))).collect())
    val tHof = time(vecs.select(sum(expr(hof))).collect())
    println(s"""{"bench":"int_dot","rows":$n,"native_sec":$tNative,"hof_sec":$tHof,"speedup":${tHof / tNative}}""")
    vecs.unpersist()

    // ~1 KB texts for the trigram generator
    val texts = spark.range(n / 4).select(
      expr("repeat(concat('doc', CAST(id AS STRING), ' lorem ipsum dolor sit amet '), 32)").as("t"))
      .persist()
    texts.count()
    val substrForm =
      "explode(transform(sequence(1, greatest(length(t) - 2, 0)), i -> substr(t, i, 3)))"
    (1 to 2).foreach { _ =>
      texts.select(expr("char_trigrams(t)")).selectExpr("count(g)").collect()
      texts.select(expr(substrForm).as("g")).selectExpr("count(g)").collect()
    }
    val tGen = time(texts.select(expr("char_trigrams(t)")).selectExpr("count(g)").collect())
    val tSubstr = time(texts.select(expr(substrForm).as("g")).selectExpr("count(g)").collect())
    println(s"""{"bench":"char_trigrams","rows":${n / 4},"native_sec":$tGen,"substr_sec":$tSubstr,"speedup":${tSubstr / tGen}}""")
    spark.stop()
  }
}
