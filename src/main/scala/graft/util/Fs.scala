package graft.util

/** Tiny local-filesystem helpers shared by bench/test scaffolding. */
object Fs {
  /** Recursive delete; silently tolerates missing paths. Does not follow
   * directory symlinks into their targets (listFiles on a symlinked dir
   * deletes the link target's entries only if traversed — bench/test trees
   * contain no symlinks by construction). */
  def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
    f.delete(); ()
  }
}
