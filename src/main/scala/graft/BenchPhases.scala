package graft

/** Side channel for SELF-STAGING bench queries (VERDICT r11 #4): the
  * index/DML queries (q225/q228/q229/q232/q233/q234) build their fixture
  * INSIDE the timed body — copy a table, build an index, run a delete —
  * and only then exercise the operation the query exists to price. A
  * single wall-clock number conflates the two, so a probe-path
  * regression hides behind setup noise. Operators wrap their staging in
  * [[BenchPhases.setup]]; [[Bench]] drains the recorder per rep and
  * stamps `setup_s`/`probe_s` per query into the artifact.
  *
  * The recorder is additive within a rep (a query may stage in several
  * steps) and drained between reps, so each rep's split is its own.
  * Outside a bench run the recording is a few ns of clock reads —
  * Verify and the specs pay nothing they'd notice. */
object BenchPhases {
  private val acc =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Run `body` as part of `query`'s SETUP phase, accumulating its
    * wall-clock into the query's setup time. */
  def setup[T](query: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    acc.merge(query, Double.box((System.nanoTime() - t0) / 1e9),
      (a, b) => Double.box(a + b))
    r
  }

  /** Drain the recorded setup seconds for `query` (None = the query
    * does not self-stage, or recorded nothing this rep). */
  def take(query: String): Option[Double] =
    Option(acc.remove(query)).map(_.doubleValue())

  def clear(): Unit = acc.clear()
}
