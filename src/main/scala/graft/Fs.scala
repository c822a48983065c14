package graft

/** Tiny filesystem helpers shared by fixture management and the
  * idempotent sink (no equivalent exists in the JDK short of walking a
  * stream, and hand-rolling it twice invites divergence). */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(deleteRecursively)
    f.delete(); ()
  }
}
