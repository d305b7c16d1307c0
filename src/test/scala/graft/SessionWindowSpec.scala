package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps

/** The native session_window operator must produce exactly the sessions
  * of the declared lag-based q_sessionize (the oracle-checked form).
  */
class SessionWindowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("session_window == lag-based sessionize on every session column") {
    val native = EventOps.sessionizeNative(
        graft.core.Tables.events(spark, dir))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect().map(_.toString).sorted
    val declared = EventOps.queries("q_sessionize")(spark, dir)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect().map(_.toString).sorted
    assert(native.nonEmpty)
    assert(native.sameElements(declared))
  }
}
