package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

/** As-of and band join semantics: inclusivity at equality, tie rules,
  * no-match nulls, and bucket-boundary band counts. */
class TimeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("asofJoin: greatest right ts <= left ts, inclusive, ties to max id, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, ts(5)),   // before any click -> null
      (2L, 1L, ts(15)),  // between 10 and 20 -> id 100
      (3L, 1L, ts(20)),  // equality inclusive; ts-20 tie -> max id 102
      (4L, 1L, ts(25)),  // after everything -> id 102
      (5L, 2L, ts(50))   // user with no right rows -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(10), 100L, 1.0),
      (1L, ts(20), 101L, 2.0),
      (1L, ts(20), 102L, 3.0)
    ).toDF("user_id", "ts", "click_id", "click_value")
    val out = TimeJoinOps.asofJoin(left, right, "user_id", "ts",
        "click_id", Seq("click_id", "click_value")).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("click_value")).map(_.toDouble))))
      .toMap
    assert(out(1L) == ((None, None)), out(1L))
    assert(out(2L) == ((Some(100L), Some(1.0))), out(2L))
    assert(out(3L) == ((Some(102L), Some(3.0))), out(3L))
    assert(out(4L) == ((Some(102L), Some(3.0))), out(4L))
    assert(out(5L) == ((None, None)), out(5L))
    assert(out.size == 5)
  }

  test("asofJoin: randomized equivalence with the sequential argmax reference") {
    import spark.implicits._
    for (seed <- Seq(41, 42)) {
      val r = new scala.util.Random(seed)
      // dense small key/time spaces force equal-ts ties and no-match rows
      val left = (0 until 120).map(i => (i.toLong, (r.nextInt(6) + 1).toLong, ts(r.nextInt(40))))
      val right = (0 until 80).map(i => ((r.nextInt(6) + 1).toLong, ts(r.nextInt(40)), (1000 + i).toLong, r.nextInt(50) / 10.0))
      val out = TimeJoinOps.asofJoin(
          left.toDF("event_id", "user_id", "ts"),
          right.toDF("user_id", "ts", "click_id", "click_value"),
          "user_id", "ts", "click_id", Seq("click_id", "click_value")).collect()
        .map(x => x.getAs[Long]("event_id") -> Option(x.getAs[java.lang.Long]("click_id")).map(_.toLong))
        .toMap
      left.foreach { case (id, u, t) =>
        val cands = right.filter(c => c._1 == u && !c._2.after(t))
        val expect = if (cands.isEmpty) None
          else Some(cands.maxBy(c => (c._2.getTime, c._3))._3)
        assert(out(id) == expect, s"seed=$seed event=$id")
      }
    }
  }

  test("bandCountJoin: randomized equivalence with the sequential band count") {
    import spark.implicits._
    val r = new scala.util.Random(51)
    val left = (0 until 100).map(i => (i.toLong, (r.nextInt(5) + 1).toLong, ts(r.nextInt(600))))
    val right = (0 until 150).map(_ => ((r.nextInt(5) + 1).toLong, ts(r.nextInt(600))))
    val band = 30L
    val out = TimeJoinOps.bandCountJoin(
        left.toDF("event_id", "user_id", "ts"),
        right.toDF("user_id", "ts"), "user_id", "ts", "event_id", band).collect()
      .map(x => x.getAs[Long]("event_id") -> x.getAs[Long]("n_in_band")).toMap
    left.foreach { case (id, u, t) =>
      val expect = right.count(c => c._1 == u &&
        math.abs(c._2.getTime - t.getTime) <= band * 1000L).toLong
      assert(out(id) == expect, s"event=$id")
    }
  }

  test("bandCountJoin: inclusive band, adjacent-bucket matches counted once, zero rows kept") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, ts(100)), // clicks at 90(in,=band) 89(out) 100(in) 110(in,=band) 111(out)
      (2L, 2L, ts(100))  // no clicks for user 2 -> 0
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(90)), (1L, ts(89)), (1L, ts(100)), (1L, ts(110)), (1L, ts(111))
    ).toDF("user_id", "ts")
    val out = TimeJoinOps.bandCountJoin(left, right, "user_id", "ts",
        "event_id", bandSec = 10L).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_in_band")).toMap
    assert(out == Map(1L -> 3L, 2L -> 0L), out)
  }
}
