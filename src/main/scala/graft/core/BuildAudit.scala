package graft.core

/** Process-global seed-time audit for the streamed lifecycle rows
  * (VERDICT r15 task 5). The four `stream_*_serve` lifecycle queries
  * re-drive seed+stream+serve every run BY DESIGN, so on a bursty box
  * they are always the suite's most expensive flagged rows — and
  * attributing a flagged reading (was it the seed's shuffle or the
  * serve's point read?) used to take a side run. The lifecycle
  * functions now time their seed/stream half through [[timed]]; Bench
  * snapshots the registry around each rep and folds a
  * `build_split` map (`seed_sec` vs `serve_sec`, taken from the same
  * rep as the row's reported min) into the full-map artifact, so a
  * flagged lifecycle row self-attributes.
  *
  * One query runs at a time in Bench, so a clear-all [[reset]] between
  * reps is race-free there; concurrent test suites only ever OVERWRITE
  * their own key (ConcurrentHashMap), never read each other's.
  */
object BuildAudit {
  private val seeds =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  def record(key: String, sec: Double): Unit = { seeds.put(key, sec); () }

  def reset(): Unit = seeds.clear()

  def snapshot(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    seeds.asScala.toMap
  }

  /** Time `body` (wall seconds), record under `key`, return its value.
    * The key is the benchmark query name by convention — that is what
    * lets Bench join the audit back to the row it just measured. */
  def timed[T](key: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val v = body
    record(key, (System.nanoTime() - t0) / 1e9)
    v
  }
}
