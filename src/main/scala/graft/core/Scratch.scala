package graft.core

import java.io.File
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

/** Per-process scratch directories for queries that materialize state
  * (tx tables, format round-trips): isolated across concurrently
  * running Verify/Bench JVMs, FRESH per call within a JVM (a tx table
  * must start empty — re-appending into last run's log would change
  * the result), and removed wholesale by a shutdown hook. */
object Scratch {

  private val seq = new AtomicInteger(0)

  private lazy val root: File = {
    val d = new File(s"target/tmp/p${ProcessHandle.current().pid()}")
    d.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val walk = Files.walk(d.toPath)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
      finally walk.close()
    }))
    d
  }

  /** A new empty directory, never returned before in this process. */
  def fresh(prefix: String): String = {
    val d = new File(root, s"${prefix}_${seq.incrementAndGet()}")
    d.mkdirs()
    d.toString
  }
}
