package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

/** VERDICT #10 done-criterion: a deliberately slow query must be
  * cancelled by the guard without sinking the session, and subsequent
  * queries must still run. */
class GuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("guard cancels a runaway query and the session survives") {
    import spark.implicits._
    val slow = spark.range(0, 64, 1, 8).mapPartitions { it =>
      it.map { i => Thread.sleep(600000); i }
    }
    val t0 = System.nanoTime()
    val ok = QueryGuard.run(spark, "injected-slow", timeoutMs = 3000) {
      slow.count(): Unit
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(!ok, "slow query must be reported as timed out")
    assert(sec < 60, s"guard must return promptly, took ${sec}s")
    // the session must remain usable for the next query
    val ok2 = QueryGuard.run(spark, "fast-after", timeoutMs = 60000) {
      assert(spark.range(100).count() == 100)
    }
    assert(ok2)
  }
}
