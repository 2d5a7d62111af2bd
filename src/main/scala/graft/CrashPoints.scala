package graft

/** Test-only CRASH INJECTION at the handlers' staged boundaries — the
  * device behind the randomized crash-point sweep (CrashSweepSpec):
  * every maintenance/retraction handler calls [[hit]] immediately
  * AFTER each durable step (a stats append, a zone append, a staged
  * write, the rename-away half of a swap), so a sweep can
  * programmatically kill the handler in EVERY window a real crash
  * could leave behind, instead of hand-constructing each state.
  *
  * Production fast path: one volatile read per boundary — [[hit]] is
  * a no-op unless a test armed it. Never armed outside tests; the
  * sweep arms the Nth boundary, catches the [[InjectedCrash]], and
  * re-runs the handler asserting heal-to-convergence.
  */
object CrashPoints {
  /** Distinguishable from every real failure class so a sweep can
    * assert it killed the handler at the boundary it armed, not on an
    * incidental error.
    */
  final class InjectedCrash(val point: String, val index: Int)
    extends RuntimeException(s"injected crash at boundary '$point' (#$index)")

  @volatile private var armed: Int = -1
  private var count: Int = 0

  /** Arm the `n`-th boundary (0-based) crossed after this call: that
    * [[hit]] throws. `Int.MaxValue` = count boundaries without killing
    * (the sweep's dry run, read back with [[crossed]]).
    */
  def arm(n: Int): Unit = synchronized { armed = n; count = 0 }

  def disarm(): Unit = synchronized { armed = -1; count = 0 }

  /** Boundaries crossed since the last [[arm]]. */
  def crossed: Int = synchronized { count }

  /** A staged boundary: the handler just completed a durable step and
    * would survive a crash here iff its retry converges.
    */
  def hit(point: String): Unit = {
    if (armed < 0) return // the production fast path: one volatile read
    synchronized {
      if (armed < 0) return
      val i = count
      count += 1
      if (i == armed) throw new InjectedCrash(point, i)
    }
  }
}
