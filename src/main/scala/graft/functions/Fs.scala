package graft.functions

/** Tiny local-filesystem helpers shared by the demo sinks and the
  * verify dump (driver-local java.io; production uses a transactional
  * table format instead of directory swaps). */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
    ()
  }
}
