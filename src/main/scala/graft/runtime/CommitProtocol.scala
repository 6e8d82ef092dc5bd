package graft.runtime

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.Comparator

/** Commit protocol for atomically publishing a fully-staged table directory
  * as the live table — the seam where a table-format transaction log would
  * plug in.
  *
  * The reference materializes 197 models on Delta via `create or replace
  * table` / MERGE (reference: macros/spark_adapter_patch/create_table.sql:29-34),
  * whose atomicity comes from the Delta transaction log, not the filesystem.
  * This engine's parquet stand-in gets the same all-or-nothing visibility
  * from a filesystem rename — valid on local disk and HDFS, where rename is
  * atomic. Object stores (S3/GCS) have NO atomic directory rename: there the
  * correct implementation of this trait is a metadata-pointer swap — append
  * a commit to a Delta/Iceberg log (or flip a catalog pointer) naming the
  * staged files, and never move data at all. Readers then resolve the table
  * through the log/catalog instead of directory listing. Swapping that
  * implementation in requires no change to any [[Warehouse]] write path:
  * every full-table replacement funnels through [[commitReplace]].
  */
trait TableCommitProtocol {
  /** Publish `staged` (a complete, self-consistent table directory) as
    * `target`. Must be all-or-nothing from a reader's perspective: a
    * concurrent reader sees the old table or the new one, never a mix. */
  def commitReplace(staged: Path, target: Path): Unit
}

object TableCommitProtocol {

  /** Local-FS / HDFS protocol: delete the old directory, then ATOMIC_MOVE
    * the staged one into place. The rename is the commit point; the window
    * after delete is acceptable single-writer semantics on a filesystem
    * with atomic rename (and is exactly what Spark's own
    * InsertIntoHadoopFsRelation non-dynamic overwrite does). */
  object LocalAtomicRename extends TableCommitProtocol {
    def commitReplace(staged: Path, target: Path): Unit = {
      if (Files.exists(target)) {
        val walk = Files.walk(target)
        try walk.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
        finally walk.close()
      }
      Files.move(staged, target, StandardCopyOption.ATOMIC_MOVE)
    }
  }
}
