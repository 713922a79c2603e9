package graft.streaming

/**
 * Crash-injection seam for the archive commit protocol (round-14 ask
 * #2). The durability claims of the temp+rename commit discipline —
 * a crash mid-write leaves only an invisible `.inprogress-*` dir; a
 * crash between the entry rename and the stream's checkpoint advance
 * re-delivers the batch, which the replay guard must skip without
 * double-counting or un-forgetting — were reasoned and state-simulated
 * through round 13, never EXECUTED. This seam executes them: the
 * commit paths call [[reach]] at the two crash windows
 * (`pre-rename:<entryPath>` — every component written, rename not yet
 * issued; `post-commit:<entryPath>` — rename durable, control not yet
 * returned to the caller, i.e. the stream's checkpoint has NOT
 * advanced), and a test installs a hook that throws there. An
 * exception at those exact points leaves BIT-IDENTICAL on-disk state
 * to a process kill at the same instant (the JVM's subsequent actions
 * are the recovery path under test, not cleanup — the commit code
 * runs no finally blocks around these windows), so the spec then
 * "restarts" by re-delivering the batch exactly as Structured
 * Streaming would and asserts recovery.
 *
 * The hook receives the full `phase:entryPath` string and is expected
 * to filter on its own archive directory — suites share one JVM and
 * may run concurrently, so a crash hook must never fire on another
 * suite's commits. Production behavior: the default hook is a no-op
 * and the call sites cost one volatile read.
 */
object CrashPoints {
  /** Thrown by test hooks to simulate the process dying at the reached
    * point — a distinct type so specs can assert they injected THIS
    * crash and not a genuine failure. */
  final class InjectedCrash(point: String)
    extends RuntimeException(s"injected crash at $point")

  @volatile private var hook: String => Unit = _ => ()

  /** Install a hook that throws [[InjectedCrash]] the FIRST time a
    * point matching (phase, pathSubstring) is reached; auto-disarms so
    * the recovery re-delivery does not crash again. */
  def armOnce(phase: String, pathSubstring: String): Unit = {
    hook = { point =>
      if (point.startsWith(s"$phase:") && point.contains(pathSubstring)) {
        hook = _ => ()
        throw new InjectedCrash(point)
      }
    }
  }

  def disarm(): Unit = hook = _ => ()

  /** Install a hook that runs `action` (WITHOUT throwing) the first
    * time a matching point is reached, then auto-disarms — for
    * interleaving injection: e.g. folding a batch at the exact window
    * where a reseed-shaped commit re-validates `lastFolded`, to
    * execute the racing-fold ABORT path rather than argue it. */
  def installOnce(phase: String, pathSubstring: String)(action: () => Unit): Unit = {
    hook = { point =>
      if (point.startsWith(s"$phase:") && point.contains(pathSubstring)) {
        hook = _ => ()
        action()
      }
    }
  }

  private[graft] def reach(point: String): Unit = hook(point)
}
