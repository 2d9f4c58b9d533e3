package graft.queries

import java.nio.file.{Files, Path}

import scala.collection.mutable

/** Temp-dir factory for the round-trip queries (sink/source/pipeline
  * fixtures). Every directory is registered for recursive deletion at JVM
  * exit, so repeated bench reps don't accumulate table-sized copies under
  * /tmp for the life of the machine. */
object QueryTmp {
  private val created = mutable.ArrayBuffer.empty[Path]

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    created.synchronized(created.foreach(delete))))

  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(s"graft_$prefix")
    created.synchronized(created += p)
    p.toString
  }

  private def delete(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val children = Files.list(p)
      try children.forEach(delete(_)) finally children.close()
    }
    try Files.deleteIfExists(p) catch { case _: Exception => () }
  }
}
