package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

/** Z-order key correctness (vs a bit-by-bit reference) and the locality
  * property the layout exists for: disjoint per-partition key ranges. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zOrderKey == bit-by-bit Morton reference, incl. 32-bit masking") {
    import spark.implicits._
    val r = new scala.util.Random(61)
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFFFFFL, 0xFFFFFFFFL),
      (0x123456789AL, 5L)) ++ // wider than 32 bits: high bits must mask off
      (0 until 200).map(_ => (r.nextLong().abs, r.nextLong().abs))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), LayoutOps.zOrderKey(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == mortonRef(a & 0xFFFFFFFFL, b & 0xFFFFFFFFL), s"a=$a b=$b")
    }
  }

  test("clusterByZOrder: per-partition zkey ranges are pairwise disjoint") {
    import spark.implicits._
    val r = new scala.util.Random(62)
    val df = (0 until 5000).map(_ => (r.nextInt(1000).toLong, r.nextInt(1000).toLong))
      .toDF("a", "b")
    val ranges = LayoutOps.clusterByZOrder(df, col("a"), col("b"), partitions = 8)
      .select(col("zkey"), spark_partition_id().as("pid"))
      .groupBy(col("pid")).agg(min(col("zkey")).as("lo"), max(col("zkey")).as("hi"))
      .orderBy(col("lo"))
      .as[(Int, Long, Long)].collect()
    assert(ranges.length > 1, "range partitioning must actually split")
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping partition ranges: $hi1 > $lo2")
      case _ =>
    }
  }
}
