package graft

/** Test-only CRASH INJECTION at the handlers' staged boundaries — the
  * device behind the randomized crash-point sweep (CrashSweepSpec) and
  * the composed crash-under-interleaving harness (InterleavingSpec):
  * every maintenance/retraction handler calls [[hit]] immediately
  * AFTER each durable step (a stats append, a zone append, a staged
  * write, the rename-away half of a swap), so a sweep can
  * programmatically kill the handler in EVERY window a real crash
  * could leave behind, instead of hand-constructing each state.
  *
  * THREAD-SCOPED arming: the armed counter lives in a ThreadLocal, so
  * arming kills only boundaries crossed by the ARMING thread — every
  * handler's `hit` calls run on its caller's thread (they are inline
  * driver code, never inside a task), which is what lets the
  * interleaving harness inject crashes into 8 concurrent lifecycle
  * sequences without one sequence's armed boundary killing another's
  * handler (and lets independently-scheduled suites coexist). A
  * global armed flag fronts the fast path: [[hit]] is one volatile
  * read when NO thread has armed anything — the production state —
  * and only consults the ThreadLocal while some test is injecting.
  *
  * Never armed outside tests; a sweep arms the Nth boundary, catches
  * the [[InjectedCrash]], and re-runs the handler asserting
  * heal-to-convergence.
  */
object CrashPoints {
  /** Distinguishable from every real failure class so a sweep can
    * assert it killed the handler at the boundary it armed, not on an
    * incidental error.
    */
  final class InjectedCrash(val point: String, val index: Int)
    extends RuntimeException(s"injected crash at boundary '$point' (#$index)")

  private final class State(var armed: Int, var count: Int)

  /** How many THREADS currently hold an armed state — the fast-path
    * gate. Incremented by [[arm]], decremented by [[disarm]]; handlers
    * pay the ThreadLocal lookup only while this is non-zero.
    */
  @volatile private var armers: Int = 0

  private val state = new ThreadLocal[State]

  /** Arm the `n`-th boundary (0-based) crossed BY THIS THREAD after
    * this call: that [[hit]] throws. `Int.MaxValue` = count boundaries
    * without killing (the sweep's dry run, read back with [[crossed]]).
    * Pair every arm with a [[disarm]] (a `finally`), or the thread —
    * typically a pool thread the next test reuses — stays armed.
    */
  def arm(n: Int): Unit = {
    if (state.get == null) synchronized { armers += 1 }
    state.set(new State(n, 0))
  }

  def disarm(): Unit = {
    if (state.get != null) {
      state.remove()
      synchronized { armers -= 1 }
    }
  }

  /** Boundaries crossed by this thread since its last [[arm]]. */
  def crossed: Int = Option(state.get).map(_.count).getOrElse(0)

  /** A staged boundary: the handler just completed a durable step and
    * would survive a crash here iff its retry converges.
    */
  def hit(point: String): Unit = {
    if (armers == 0) return // the production fast path: one volatile read
    val s = state.get
    if (s == null) return // some OTHER thread is injecting, not this one
    val i = s.count
    s.count += 1
    if (i == s.armed) throw new InjectedCrash(point, i)
  }
}
