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

  /** Spread the low 16 bits of `x` to every third bit position (the
    * 3-D mask cascade; intermediate values stay < 2^48).
    */
  def spreadBits16x3(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000FF0000FFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00F00F00F00FL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0C30C30C30C3L))
    (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x249249249249L))
  }

  /** 48-bit Morton code of three 16-bit dimensions — the layout key
    * for tables queried by any of (key, time, bucket).
    */
  def morton16x3(x: Column, y: Column, z: Column): Column =
    spreadBits16x3(x.bitwiseAND(lit(65535L)))
      .bitwiseOR(shiftleft(spreadBits16x3(y.bitwiseAND(lit(65535L))), 1))
      .bitwiseOR(shiftleft(spreadBits16x3(z.bitwiseAND(lit(65535L))), 2))
}
