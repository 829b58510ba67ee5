package graft.promql

import org.apache.spark.sql.SparkSession

/** The query-frontend RESULTS CACHE for `query_range` — the split+cache
  * tier Cortex/Thanos put in front of a Prometheus: a range query
  * splits into fixed-width chunks of its instant grid, each COMPLETE
  * chunk's evaluated samples cache by (corpus, resolved query, step,
  * chunk base), and a repeat or overlapping dashboard request re-renders
  * from cached chunks — only never-seen chunks touch Spark.
  *
  * Soundness rests on PromQL's own evaluation model: every `query_range`
  * instant evaluates independently (the lattice bounds only scope the
  * relation — the same fact the sharded grid evaluator relies on), so
  * any instant partition of the grid is result-identical to one plan.
  * Two requests share chunks when their grids align: same step, same
  * phase (`start mod step`) — the cache key's chunk base carries the
  * phase by construction.
  *
  * What deliberately does NOT cache:
  *  - the HEAD chunk — a chunk whose full span would run past the
  *    corpus instant evaluates only its in-range instants and is never
  *    stored (Cortex likewise refuses to cache the still-mutable
  *    current period);
  *  - nothing keyed on the raw query STRING: the key holds the
  *    RESOLVED Ast (case-class structural equality), so `@ start()` /
  *    `@ end()` pins — which resolve against the full request bounds —
  *    produce distinct keys for distinct ranges instead of poisoned
  *    hits.
  *
  * Rendering goes through the same [[Api.seriesSamples]] fragments as
  * the direct path, so cached responses are byte-identical (spec-pinned
  * across selector/rate/aggregation/binary shapes, cold and warm).
  * Capacity is a 512-entry LRU of collected sample fragments — driver
  * memory ∝ series × chunk instants, the same order as one response.
  */
object ResultsCache {

  /** Chunk width in INSTANTS (Cortex splits by wall-clock day; an
    * instant budget adapts to any step while keeping plans bounded).
    */
  val SplitInstants = 240

  private val MaxEntries = 512

  private final case class Key(dir: String, ast: Ast, stepS: Long,
      chunkBase: Long, msr: Option[Long], nf: Seq[String])

  private type Chunk = Map[String, Vector[(Long, String)]]

  private val lru =
    new java.util.LinkedHashMap[Key, Chunk](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Key, Chunk]): Boolean = size() > MaxEntries
    }

  private val lock = new Object
  private var hitN = 0L
  private var missN = 0L

  /** (hits, misses) since start/clear — the spec's reuse proof. */
  def stats: (Long, Long) = lock.synchronized((hitN, missN))

  def clear(): Unit = lock.synchronized { lru.clear(); hitN = 0L; missN = 0L }

  /** Drop-in twin of [[Api.queryRangeJson]], served through the cache. */
  def queryRangeJson(spark: SparkSession, dir: String, query: String,
      startS: Long, endS: Long, stepS: Long,
      nativeFamilies: Set[String] = Set.empty,
      maxSourceResS: Option[Long] = None,
      splitInstants: Int = SplitInstants): String = {
    require(stepS > 0, "step must be positive")
    require(endS >= startS, "end must be >= start")
    require(splitInstants > 0, "positive split width")
    val ast = Ast.resolveAtEdges(Parser.parse(query), Some(startS), Some(endS))
    val tCorpus = Compiler.instantSeconds(spark, dir).toLong
    val phase = Math.floorMod(startS, stepS)
    val span = splitInstants.toLong * stepS
    // the last evaluable instant on this request's grid
    val lastOk = tCorpus - Math.floorMod(tCorpus - phase, stepS)
    def base(t: Long): Long = t - Math.floorMod(t - phase, span)
    val nfKey = nativeFamilies.toSeq.sorted

    def compute(cs: Long, ce: Long): Chunk =
      Compiler.withNativeFamilies(nativeFamilies) {
        Api.seriesSamples(Api.rangeRelation(spark, dir, ast, cs, ce, stepS,
          grid = true, maxSourceResS))
          .collect()
          .groupBy(_.getString(0))
          .map { case (m, rows) =>
            m -> rows.map(r => (r.getLong(1), r.getString(2))).toVector
          }
      }

    val merged = scala.collection.mutable.HashMap.empty[String, Vector[(Long, String)]]
    (startS to endS by stepS).map(base).distinct.foreach { cb =>
      val chunkEnd = cb + span - stepS
      val rows: Chunk =
        if (chunkEnd <= lastOk) {
          val key = Key(dir, ast, stepS, cb, maxSourceResS, nfKey)
          lock.synchronized(Option(lru.get(key))) match {
            case Some(hit) =>
              lock.synchronized { hitN += 1 }
              hit
            case None =>
              val fresh = compute(cb, chunkEnd)
              lock.synchronized { missN += 1; lru.put(key, fresh) }
              fresh
          }
        } else {
          // head chunk: evaluate only the requested tail, never store
          compute(math.max(cb, startS), math.min(endS, lastOk))
        }
      rows.foreach { case (m, vs) =>
        merged.update(m, merged.getOrElse(m, Vector.empty) ++ vs)
      }
    }

    // stitch: in-range samples per series in instant order, series in
    // the same lexicographic order the direct path's orderBy(m) yields
    // (label JSON here is ASCII, where UTF-8 binary and UTF-16 string
    // orders agree); series whose samples all fall outside the request
    // drop, exactly as the direct path never saw them
    val parts = merged.toSeq
      .map { case (m, vs) =>
        m -> vs.filter(v => v._1 >= startS && v._1 <= endS)
          .sortBy(_._1).map(_._2)
      }
      .filter(_._2.nonEmpty)
      .sortBy(_._1)
      .map { case (m, ss) =>
        s"""{"metric":$m,"values":[${ss.mkString(",")}]}"""
      }
    parts.mkString(
      """{"status":"success","data":{"resultType":"matrix","result":[""",
      ",", "]}}")
  }
}
