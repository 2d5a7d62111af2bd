package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys: interleave the bits of two
  * dimensions so that sorting by the combined key keeps rows close in
  * BOTH dimensions. Writing a table sorted by `morton(x, y)` gives
  * parquet row-group min/max stats that prune for range predicates on
  * either column — the standard lakehouse layout trick for
  * two-dimensional data skipping (sorting by (x, y) prunes only x).
  *
  * Pure bit arithmetic on BIGINT (values stay < 2^32), so the key is
  * engine-portable and oracle-checkable.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions (classic
    * mask-shift cascade).
    */
  def spreadBits16(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions. */
  def morton16(x: Column, y: Column): Column =
    spreadBits16(x.bitwiseAND(lit(65535L)))
      .bitwiseOR(shiftleft(spreadBits16(y.bitwiseAND(lit(65535L))), 1))
}
