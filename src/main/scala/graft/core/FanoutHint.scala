package graft.core

import scala.util.DynamicVariable

/** Construction-time request flag for the scan fan-out rewrite
  * (Tables.fanout). A thread-local, not a session conf, so queries
  * built concurrently against one shared session (the test suites, the
  * bench watchdog threads) can never leak the request into each
  * other's plans. The flag only matters while a query's DataFrame is
  * being CONSTRUCTED — the repartition is baked into the plan — so the
  * scope of `withFanout` is exactly the `Q.run` call.
  *
  * Which queries request it is decided by measurement, not guesswork:
  * graft.queries.FanoutHints carries the winner list with the A/B
  * evidence (bench_results/r16_baseline.json vs r16_fanout.json).
  */
object FanoutHint {
  private val flag = new DynamicVariable[Boolean](false)

  def requested: Boolean = flag.value

  def withFanout[T](body: => T): T = flag.withValue(true)(body)
}
