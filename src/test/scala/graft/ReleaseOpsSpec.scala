package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Laws for the release-ops tier (x94 diff, x95 drift, x99 funnel). */
class ReleaseOpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("x94: the diff classes partition the union of the two snapshots") {
    val d = TextAnalysis.snapshotDiff(spark, dir)
    val total = d.agg(sum(col("n_docs"))).head().getLong(0)
    // union = docs in prior (%10 != 8) ∪ current (%10 != 9) = all docs
    val docs = graft.sources.Tables.documents(spark, dir).count()
    assert(total == docs,
      s"classes cover $total docs, the snapshot union holds $docs")
    // every simulated class is present and lands where the simulation
    // put it: %10==8 → added, %10==9 → removed, %10==7 → changed
    val by = d.groupBy(col("change")).agg(sum(col("n_docs")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docsDf = graft.sources.Tables.documents(spark, dir)
    def m(i: Int) = docsDf.filter(col("doc_id") % 10 === i).count()
    assert(by("added") == m(8) && by("removed") == m(9) && by("changed") == m(7))
  }

  test("x95: per-source PSI is non-negative; membership-stable sources read exactly 0") {
    // each term (q−p)·log(q/p) is ≥ 0 (both factors share sign), so the
    // 21-bin sum is a true divergence — negativity means a dropped bin
    val rows = TextAnalysis.releaseDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0,
        s"source ${r.getString(0)}: psi ${r.getDouble(3)} < 0")
    }
  }

  test("x99: funnel arithmetic is closed (remaining k = entered k+1; totals add up)") {
    val f = Dedup.dedupFunnel(spark, dir).collect().sortBy(_.getInt(0))
    assert(f.map(_.getString(1)).toSeq == Seq("exact", "near", "perceptual"))
    f.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(5) == b.getLong(4),
        s"stage ${a.getString(1)} remaining != next entered")
    }
    val docs = graft.sources.Tables.documents(spark, dir).count()
    assert(f.head.getLong(4) == docs, "first stage must see the whole corpus")
    val dropped = f.map(_.getLong(2)).sum
    assert(f.last.getLong(5) == docs - dropped,
      "final remaining must equal corpus minus all drops")
  }
}
