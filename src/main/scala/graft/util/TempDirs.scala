package graft.util

import java.io.File

/** Recursive delete for per-run temp state (staged streaming input,
  * persisted-index gate directories). One implementation instead of a
  * copy per call site. */
object TempDirs {
  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** A fresh unique directory path under java.io.tmpdir (not created —
    * Spark writers create it). */
  def fresh(prefix: String): File =
    new File(sys.props("java.io.tmpdir"),
      prefix + java.util.UUID.randomUUID().toString.replace("-", ""))
}
