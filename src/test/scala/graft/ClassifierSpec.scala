package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier
import graft.plans.DetMathExprs

/** Laws for the x85/x86 trained quality filter (fixed-round logistic
  * GD distilling the x24 verdict stack).
  */
class ClassifierSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("round-1 weights match the closed form (p = 1/2 at w = 0)") {
    // with w = 0 the sigmoid is exactly 1/2, so round 1 collapses to
    // w_j = −η · (Σ floor((0.5 − y)·f_j·1e9 + 0.5)) / 1e9 / n —
    // recomputed here over collected rows in plain Scala (independent
    // path: no Spark aggregate, no DetMath)
    val rows = Classifier.features(spark, dir)
      .select("y", "f0", "f1", "f2", "f3", "f4").collect()
    val n = rows.length
    val expected = (0 until 5).map { j =>
      val s = rows.map { r =>
        math.floor((0.5 - r.getDouble(0)) * r.getDouble(1 + j) * 1e9 + 0.5).toLong
      }.sum
      0.0 - Classifier.LearningRate * ((s.toDouble / 1.0e9) / n.toDouble)
    }
    val got = Classifier.train(spark, dir).head
    assert(got.toSeq == expected,
      s"round-1 weights ${got.toSeq} != closed form $expected")
  }

  test("the student generalizes: agreement beats the majority class") {
    val g = Classifier.classifierGate(spark, dir)
      .agg(avg(when(col("agree"), 1.0).otherwise(0.0)).as("acc"),
        avg(when(col("teacher_keep"), 1.0).otherwise(0.0)).as("base"))
      .head()
    val (acc, base) = (g.getDouble(0), g.getDouble(1))
    val majority = math.max(base, 1.0 - base)
    assert(acc >= 0.90 && acc > majority,
      s"agreement $acc should exceed 0.90 and majority $majority")
  }

  test("training reduces the logistic loss across the trajectory") {
    DetMathExprs.register(spark)
    val hist = Classifier.train(spark, dir)
    def loss(w: Array[Double]): Double = {
      val m = (0 until 5).map(j => lit(w(j)) * col(s"f$j")).reduceLeft(_ + _)
      val p = lit(1.0) / (lit(1.0) +
        DetMathExprs.detExp2C(-(m * lit(Classifier.Log2E))))
      Classifier.features(spark, dir)
        .select(avg(-DetMathExprs.detLog2C(
          when(col("y") === 1.0, p).otherwise(lit(1.0) - p))))
        .head().getDouble(0)
    }
    val first = loss(hist.head)
    val last = loss(hist.last)
    assert(last < first, s"logloss should fall: round1 $first vs final $last")
  }

  test("gradient sums are partitioning-invariant (nano-bit BIGINTs)") {
    val f = Classifier.features(spark, dir)
    def sums(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val aggs = (0 until 5).map(j =>
        sum(floor(((lit(0.5) - col("y")) * col(s"f$j")) * lit(1e9) + lit(0.5)))
          .as(s"s$j"))
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      (0 until 5).map(j => r.getAs[Long](s"s$j"))
    }
    assert(sums(f) == sums(f.repartition(7)),
      "round-1 gradient sums must not depend on partitioning")
  }
}
