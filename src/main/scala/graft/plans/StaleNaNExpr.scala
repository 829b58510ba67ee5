package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.isnan

/** Staleness-marker detection ([[graft.model.Stale]]): on this
  * engine's sample relations ANY NaN is the marker, so detection is
  * the builtin (codegen'd) `isnan`. See [[graft.model.Stale]] for why
  * the check is deliberately NOT upstream's raw-bit compare: Spark's
  * parquet writer canonicalizes NaN payloads, so the bit distinction
  * cannot survive the engine's durable format — and remote-write
  * receivers in the wild detect markers with `isNaN` for the same
  * reason.
  */
object StaleExprs {
  def isStaleC(c: Column): Column = isnan(c)
}
