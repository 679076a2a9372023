package graft.etl

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Multi-column zone maps + z-order compaction: what the oracled
  * `snapshot_zorder` relation can't show — the A/B against single-column
  * clustering (the dimension it leaves full-range prunes NOTHING),
  * skip-but-never-drop exactness on both dimensions, the manifest
  * encoding round trip next to legacy lines, and composition with
  * merge-on-read tombstones.
  */
class SnapshotZOrderSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def tmpRoot(): Path = Files.createTempDirectory("graft_zspec")

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  /** 64×64 grid: both dimensions uniform, so clustering quality is pure
    * layout, not data luck.
    */
  private def grid() = {
    val sq = s; import sq.implicits._
    (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
  }

  test("z-order prunes BOTH dimensions; single-column clustering leaves the other full-range") {
    val zRoot = tmpRoot(); val xRoot = tmpRoot()
    try {
      Snapshots.publish(s, zRoot, grid().repartition(8))
      Snapshots.publish(s, xRoot, grid().repartition(8))
      val (zid, _) = Snapshots.compactZOrder(s, zRoot, 16, "x", "y")
      // the honest competitor: same file count, range-clustered on x,
      // with NAMED zone maps for both columns so the comparison is
      // layout-vs-layout, not stats-vs-no-stats
      val (xid, _) = {
        import org.apache.spark.sql.functions.col
        Snapshots.rewriteOcc(s, xRoot) { base =>
          Snapshots.stageOccMulti(s, xRoot,
            base.repartitionByRange(16, col("x")).sortWithinPartitions("x"),
            Seq("x", "y"))
        }
      }
      val total = Snapshots.manifest(zRoot, zid).size
      def opened(root: Path, n: Int, c: String) =
        Snapshots.readPrunedOn(s, root, n, c, 0L, 7L).inputFiles.length
      // x-slab: both layouts prune
      assert(opened(zRoot, zid, "x") < total)
      assert(opened(xRoot, xid, "x") < total)
      // y-slab: the z-order layout prunes; x-clustering cannot — every
      // file's y range spans the full domain
      val zy = opened(zRoot, zid, "y")
      val xy = opened(xRoot, xid, "y")
      assert(zy < total, s"z-order y-slab opened all $total files")
      assert(xy == total, s"x-clustered layout unexpectedly pruned y: $xy of $total")
      assert(zy < xy, s"z-order ($zy) not better than x-clustering ($xy) on y")
    } finally { rm(zRoot); rm(xRoot) }
  }

  test("pruned reads on either dimension are exact: skip files, never rows") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, grid().repartition(8))
      val (zid, _) = Snapshots.compactZOrder(s, root, 16, "x", "y")
      import org.apache.spark.sql.functions.col
      val full = Snapshots.readAt(s, root, zid)
      for ((c, lo, hi) <- Seq(("x", 5L, 20L), ("y", 33L, 60L), ("x", 0L, 63L))) {
        val pruned = Snapshots.readPrunedOn(s, root, zid, c, lo, hi)
          .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val expect = full.filter(col(c).between(lo, hi))
          .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(pruned == expect, s"pruned read on $c in [$lo,$hi] diverged")
      }
    } finally rm(root)
  }

  test("named zone maps round-trip the manifest encoding, beside legacy lines") {
    val root = tmpRoot()
    try {
      Files.createDirectories(root.resolve("manifests"))
      val entries = Seq(
        Snapshots.ManifestEntry("data/a.parquet", "00" * 16, 10L, None, 1),
        Snapshots.ManifestEntry("data/b.parquet", "11" * 16, 20L, Some((5L, 9L)), 2),
        Snapshots.ManifestEntry("data/c.parquet", "22" * 16, 30L, None, 3,
          multi = Seq(("x", 0L, 7L), ("y", -4L, 63L))),
        Snapshots.ManifestEntry("data/d.parquet", "33" * 16, 40L, Some((1L, 2L)), 4,
          multi = Seq(("k", 100L, 200L))))
      Snapshots.writeManifestForTest(root, 1, entries)
      assert(Snapshots.manifest(root, 1) == entries)
      // a column name that would corrupt the encoding is refused
      intercept[IllegalArgumentException] {
        Snapshots.writeManifestForTest(root, 2, Seq(
          Snapshots.ManifestEntry("e", "44" * 16, 1L, None, 1,
            multi = Seq(("bad=name", 0L, 1L)))))
      }
    } finally rm(root)
  }

  test("z-pruned reads still apply merge-on-read tombstones") {
    val sq = s; import sq.implicits._
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, grid().repartition(8))
      val (zid, _) = Snapshots.compactZOrder(s, root, 16, "x", "y")
      Snapshots.publishDeletes(s, root,
        (0L until 64L).map(y => (3L * 64L + y)).toDF("rowid")
          .selectExpr("CAST(rowid / 64 AS BIGINT) AS x").distinct())
      // deleting x=3: the x-slab [0,7] loses its x=3 rows on the pruned path
      val got = Snapshots.readPrunedOn(s, root, Snapshots.currentId(root).get,
        "x", 0L, 7L).select("x").distinct().collect().map(_.getLong(0)).toSet
      assert(got == Set(0L, 1L, 2L, 4L, 5L, 6L, 7L), s"tombstone skipped on pruned read: $got")
    } finally rm(root)
  }
}
