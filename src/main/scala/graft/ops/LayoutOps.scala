package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side layout operators: Z-order (Morton) clustering for
  * multi-dimensional data skipping — the lakehouse table-layout step
  * (Delta OPTIMIZE ZORDER / Iceberg sort-order) that makes min/max file
  * stats selective on BOTH dimensions at once. A table range-partitioned
  * and sorted by the interleaved key gives every file a tight bounding
  * box in (a, b) space, so a scan filtered on either dimension prunes
  * files instead of reading the corpus.
  *
  * No reference counterpart (json-ld.net has no storage layer); this
  * serves the Iceberg-table side of the north rule — at 10^12 pages the
  * (host, warc_ts) layout decides whether a host- or time-scoped query
  * reads terabytes or gigabytes.
  */
object LayoutOps {

  /** Bit-spread the low 32 bits of a non-negative long so bit i lands at
    * bit 2i — the classic magic-mask doubling, 5 shift/mask steps, all
    * codegen'd integer ops (no UDF, no loop). */
  private def spread(c: Column): Column = {
    val m16 = lit(0x0000FFFF0000FFFFL)
    val m8 = lit(0x00FF00FF00FF00FFL)
    val m4 = lit(0x0F0F0F0F0F0F0F0FL)
    val m2 = lit(0x3333333333333333L)
    val m1 = lit(0x5555555555555555L)
    val x0 = c.bitwiseAND(lit(0xFFFFFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(m16)
    val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(m8)
    val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(m4)
    val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(m2)
    x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(m1)
  }

  /** 64-bit Morton (Z-order) key of two columns' low 32 bits: bit i of
    * `a` → bit 2i, bit i of `b` → bit 2i+1. Inputs are masked to their
    * low 32 bits (callers hash-or-bucket wider domains first). Pure
    * integer Column arithmetic, so a SQL oracle replays it exactly. */
  def zOrderKey(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Cluster a frame for (a, b) data skipping: range-partition by the
    * Morton key and sort within partitions, so each written file covers
    * a contiguous Z-curve segment — a tight (a, b) bounding box.
    *
    * Scale shape: ONE range exchange (sampled boundaries, the same
    * mechanism as a global orderBy) + an in-partition sort; no
    * aggregation state. LayoutSpec proves the locality property this
    * layout exists for: per-partition zkey ranges are pairwise disjoint,
    * which is exactly the file-stats condition a reader's min/max
    * pruning needs. */
  def clusterByZOrder(df: DataFrame, a: Column, b: Column,
                      partitions: Int): DataFrame = {
    require(partitions >= 1)
    df.withColumn("zkey", zOrderKey(a, b))
      .repartitionByRange(partitions, col("zkey"))
      .sortWithinPartitions(col("zkey"))
  }
}
