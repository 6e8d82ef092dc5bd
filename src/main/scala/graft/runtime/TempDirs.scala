package graft.runtime

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Temp warehouse directories for self-contained query pipelines (the
  * q30/q76/q80-style demos that materialize into a scratch [[Warehouse]]):
  * created under java.io.tmpdir and swept on JVM exit, so repeated
  * Verify/Bench runs don't accumulate stale `graft_*` warehouses. */
object TempDirs {
  private val created = scala.collection.concurrent.TrieMap.empty[Path, Unit]

  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => created.keys.foreach(deleteQuietly), "graft-tempdir-sweep"))

  /** Create a tracked temp directory; returns its absolute path as a string
    * (the shape every Warehouse constructor call site wants). */
  def create(prefix: String): String = {
    hook
    val p = Files.createTempDirectory(prefix)
    created.put(p, ())
    p.toString
  }

  /** Shared recursive delete (strict: first failure propagates). The ONE
    * walk+reverse+delete implementation — Warehouse and the commit
    * protocols delegate here so future fixes land once. */
  def deleteTree(p: Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    finally walk.close()
  }

  private def deleteQuietly(p: Path): Unit =
    // the walk itself can throw too (dir removed concurrently after the
    // exists check, permission error) — nothing here may escape, or the
    // shutdown-hook forEach aborts the sweep for all remaining directories
    try {
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(Comparator.reverseOrder[Path]()).forEach { f =>
          try Files.delete(f)
          catch { case _: java.io.IOException => () } // best-effort at exit
        } finally walk.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}
