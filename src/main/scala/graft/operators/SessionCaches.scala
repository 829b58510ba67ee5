package graft.operators

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Automatic eviction for the session-keyed caches (events adapter,
  * minhash signatures, langid grams). The maps are JVM-global and keyed
  * by `SparkSession`; without a hook, entries for stopped sessions pin
  * the session and its cached plan until a caller remembers to invoke
  * the module's `unpersist*` method. One `SparkListener` per
  * `SparkContext` drops every registered entry at application end —
  * the storage blocks die with the executors, so eviction here is only
  * reference-dropping (no `unpersist` call against a stopped context).
  */
object SessionCaches {

  private val evictors =
    new ConcurrentHashMap[SparkContext, ConcurrentLinkedQueue[() => Unit]]()

  /** Run `evict` (idempotent reference-drop) when `spark`'s application
    * ends. Call from inside a cache's `computeIfAbsent` factory so each
    * cache entry registers exactly once.
    */
  def onApplicationEnd(spark: SparkSession)(evict: () => Unit): Unit = {
    val sc = spark.sparkContext
    val queue = evictors.computeIfAbsent(sc, c => {
      val q = new ConcurrentLinkedQueue[() => Unit]()
      c.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          val drained = evictors.remove(c)
          if (drained ne null) {
            drained.forEach(f => try f() catch { case _: Throwable => () })
          }
        }
      })
      q
    })
    queue.add(evict)
  }
}
