package graft.prepare

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared crash-safe bin-packing for the two compactors
  * ([[Prepare.compact]] on the partitioned fact layout,
  * [[ZOrder.compactZOrdered]] on z-cell layouts — previously two copies
  * of the same list-threshold-rewrite-swap skeleton, each with a
  * delete-then-unchecked-rename window that could silently LOSE a
  * partition's rows if the process died between the two calls).
  *
  * Swap protocol (replaces delete-then-rename): write the packed copy
  * to a dot-prefixed tmp dir, rename live -> `.old_<name>` (the data is
  * never unreachable without a backup existing), rename tmp -> live
  * (CHECKED — on failure the original is restored and the error is
  * loud), then drop the backup. A crash inside the two-rename window
  * leaves `.old_<name>` on disk; [[recoverSwaps]] — run by every
  * compactor pass before packing — restores it when the live dir is
  * missing and deletes it when the swap had already completed. Readers
  * ignore dot-prefixed dirs, so a half-finished swap is at worst a
  * TEMPORARILY missing partition that the next maintenance pass
  * restores; rows are never deleted before their replacement is fully
  * written and renamed into place.
  *
  * APPEND ORDERING INVARIANT (round-17, advisor finding): recovery's
  * "live exists => swap completed, drop the backup" inference is only
  * sound if nothing else can recreate a crashed-away live dir. An
  * append CAN: it routes delta rows into any partition, including one
  * whose live dir a half-finished swap left as `.old_` only —
  * recreating `<name>` with delta-only rows, after which recovery
  * would delete the backup and silently lose the cell's entire
  * pre-crash row set. Every append into a swap-managed layout must
  * therefore run [[recoverSwaps]] / [[recoverSwapsRecursive]] over the
  * layout FIRST ([[ZOrder.appendZOrdered]], [[Prepare.refresh]]'s fact
  * append) — then live+backup coexisting genuinely implies a completed
  * swap and the delete branch is safe. */
private[prepare] object BinPack {

  /** Restore or clean up artifacts of an interrupted [[packDir]] swap
    * under `parent`: `.old_<name>` is renamed back when `<name>` is
    * missing (crash between the two renames) and deleted when `<name>`
    * exists (crash after the swap, before backup cleanup); stale
    * `.compact_<name>` tmp dirs are dropped. No-op when `parent` does
    * not exist (first write to a fresh layout). */
  def recoverSwaps(fs: FileSystem, parent: Path): Unit = {
    if (!fs.exists(parent)) return
    fs.listStatus(parent).filter(_.isDirectory).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith(".old_")) {
        val live = new Path(parent, n.stripPrefix(".old_"))
        if (!fs.exists(live)) {
          require(fs.rename(s.getPath, live),
            s"swap recovery: rename ${s.getPath} -> $live failed")
        } else fs.delete(s.getPath, true)
      } else if (n.startsWith(".compact_")) fs.delete(s.getPath, true)
    }
  }

  /** [[recoverSwaps]] at every level of a nested partition tree
    * (event_type=/day=): the pre-append recovery walk for multi-level
    * layouts. Recovery runs on a parent BEFORE recursing, so a
    * just-restored dir's children are visited too. */
  def recoverSwapsRecursive(fs: FileSystem, parent: Path): Unit = {
    if (!fs.exists(parent)) return
    recoverSwaps(fs, parent)
    fs.listStatus(parent)
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
      .foreach(s => recoverSwapsRecursive(fs, s.getPath))
  }

  /** Pack one leaf dir to ceil(bytes / targetBytes) files when it holds
    * more than `maxFiles` part files; `rewrite` shapes the packed copy
    * (coalesce, plus any layout-specific re-sort). Reads go through
    * [[graft.sources.ParquetNanos.read]] (CLAUDE.md invariant — the dir
    * may carry a raw nanos ts column). Returns true if packed. */
  def packDir(spark: SparkSession, fs: FileSystem, dir: Path,
              targetBytes: Long, maxFiles: Int)
             (rewrite: (DataFrame, Int) => DataFrame): Boolean = {
    val files = fs.listStatus(dir).filter(f =>
      f.isFile && f.getPath.getName.startsWith("part-"))
    if (files.length <= maxFiles) return false
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new Path(dir.getParent, s".compact_${dir.getName}")
    val old = new Path(dir.getParent, s".old_${dir.getName}")
    rewrite(graft.sources.ParquetNanos.read(spark, dir.toString), nOut)
      .write.mode("overwrite")
      .option("compression", "zstd").parquet(tmp.toString)
    fs.delete(old, true) // stale backup from a completed prior swap
    require(fs.rename(dir, old),
      s"compaction swap: rename $dir -> $old failed")
    if (!fs.rename(tmp, dir)) {
      require(fs.rename(old, dir),
        s"compaction swap: restore $old -> $dir ALSO failed after " +
          s"tmp rename failure — manual recovery needed")
      throw new java.io.IOException(
        s"compaction swap: rename $tmp -> $dir failed; original restored")
    }
    fs.delete(old, true)
    true
  }
}
