package graft

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}

import graft.prepare.Prepare

/** Test-only FileSystem: local disk under a NON-default scheme
  * (`graftfs://`). Registering it under `fs.graftfs.impl` lets a spec
  * hand Prepare a root whose scheme differs from `fs.defaultFS`
  * (`file:///`) — the exact condition under which an FS obtained via
  * `FileSystem.get(conf)` (the default FS) throws
  * `IllegalArgumentException("Wrong FS")` on the first recovery-walk
  * call instead of recovering. Hadoop instantiates it reflectively, so
  * it must stay a public top-level class with a no-arg constructor. */
class GraftTestFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfs:///")
  override def getScheme: String = "graftfs"
}

/** Pins the round-18 Wrong-FS fix (Prepare.refresh / Prepare.compact /
  * stampVersion derive the FS from the ROOT PATH, never
  * `FileSystem.get(conf)`): the full prepare → crash-interrupted swap →
  * refresh-with-recovery → compact cycle must work on a root whose
  * scheme is NOT the default FS — the s3a://-root deployment shape,
  * reproduced locally via [[GraftTestFs]]. */
class WrongFsRecoverySpec extends SparkSpec {

  test("prepare, swap recovery and compaction work on a non-default-FS root") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    // precondition: the default FS really is a DIFFERENT scheme, so an
    // accidental FileSystem.get(conf) in any walked code path would
    // throw Wrong-FS rather than silently passing this spec
    assert(FileSystem.get(conf).getUri.getScheme == "file")

    val localRoot = new java.io.File("target/tmp/wrongfs_root").getAbsolutePath
    val root = s"graftfs://$localRoot"
    val fs = new Path(root).getFileSystem(conf)
    assert(fs.isInstanceOf[GraftTestFs])
    fs.delete(new Path(root), true)

    val ev = graft.sources.ParquetNanos.read(spark, s"$sfDir/events.parquet")
    val baseCount = ev.count()
    Prepare.run(spark, ev, root)
    assert(spark.read.parquet(s"$root/events").count() == baseCount)

    // simulate a compaction swap that crashed after backing up the live
    // partition dir but before promoting the rewrite: only `.old_<name>`
    // remains (BinPack's documented interrupted state)
    val eventsRoot = new Path(s"$root/events")
    val typeDir = fs.listStatus(eventsRoot)
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
      .head.getPath
    val leaf = fs.listStatus(typeDir)
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
      .head.getPath
    val backup = new Path(leaf.getParent, s".old_${leaf.getName}")
    assert(fs.rename(leaf, backup))
    // the dot-prefixed backup is invisible to the scan — rows are
    // "missing" until recovery restores the partition
    assert(spark.read.parquet(s"$root/events").count() < baseCount)

    // refresh must FIRST recover the interrupted swap (restoring the
    // backed-up partition), then append the delta — all through the
    // graftfs:// root
    val delta = ev.limit(17)
    val deltaCount = delta.count()
    Prepare.refresh(spark, delta, root)
    assert(!fs.exists(backup))
    assert(fs.exists(leaf))
    assert(spark.read.parquet(s"$root/events").count() == baseCount + deltaCount)

    // the stamp rewrite also went through the root's FS
    assert(fs.exists(new Path(s"$root/_graft_version")))

    // compact's recovery-during-walk path on the same non-default root:
    // interrupt another partition, then compact — it must recover it and
    // complete without Wrong-FS
    val leaf2 = fs.listStatus(typeDir)
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
      .head.getPath
    val backup2 = new Path(leaf2.getParent, s".old_${leaf2.getName}")
    assert(fs.rename(leaf2, backup2))
    Prepare.compact(spark, root)
    assert(!fs.exists(backup2))
    assert(fs.exists(leaf2))
    assert(spark.read.parquet(s"$root/events").count() == baseCount + deltaCount)
  }
}
