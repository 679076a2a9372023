package graft.etl

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table TRANSACTIONS over [[Snapshots]] stores, by lifting the
  * one-pointer-rename commit one level up: a CATALOG owns several
  * tables and ONE version pointer; a catalog version maps every table
  * name to a snapshot id, and committing a transaction = writing the
  * next version file + atomically renaming `_current`. A reader that
  * resolves the catalog version at any instant gets a CONSISTENT
  * cross-table view — a transaction that deletes rows from one table
  * and appends them to another (the classic move) is either entirely
  * visible or entirely invisible, never half.
  *
  * The mechanics reuse the layer wholesale: each table stages its half
  * with [[Snapshots.stageOnto]] / [[Snapshots.stageDeletesOnto]]
  * (manifests written, per-table pointers untouched — within a catalog
  * the catalog version IS the commit; the tables' own `_current` files
  * are not consulted), and the catalog commit validates its base
  * version under a writer lock, conflicting loudly if another
  * transaction landed first — the same optimistic discipline as
  * [[Snapshots.commitOcc]], one level up. Reads at an old catalog
  * version are cross-table time travel for free.
  *
  * At 100 TB nothing here grows with data: a version file is one line
  * per table, the commit is one rename, and all data I/O is the staged
  * tables' own.
  */
object TxnCatalog {

  // one crash-safety kernel for the whole layer: the catalog shares the
  // snapshot store's write-temp+rename and dir-lock primitives rather
  // than carrying a second copy that could drift
  private def withLock[T](cat: Path)(f: => T): T = Snapshots.withDirLock(cat)(f)
  private def atomicWrite(target: Path, content: String): Unit =
    Snapshots.atomicWrite(target, content)

  def tableRoot(cat: Path, name: String): Path = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"table name '$name' must be [A-Za-z0-9_-]")
    cat.resolve("tables").resolve(name)
  }

  /** Current catalog version number (None before the first commit). */
  def version(cat: Path): Option[Int] = {
    val p = cat.resolve("_current")
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), UTF_8).trim.toInt)
  }

  /** The table → snapshot-id mapping of catalog version `v`. */
  def mapping(cat: Path, v: Int): Map[String, Int] =
    Files.readAllLines(cat.resolve("versions").resolve(s"version-$v")).asScala
      .filter(_.nonEmpty)
      .map { line =>
        val Array(name, id) = line.split('\t')
        name -> id.toInt
      }.toMap

  /** Commit a transaction: the next version = the base version's
    * mapping overlaid with `updates` (staged snapshot ids from
    * [[Snapshots.stageOnto]] / [[Snapshots.stageDeletesOnto]]), made
    * visible by one atomic rename. `expectVersion` is the version the
    * transaction STAGED against (None founds the catalog): if another
    * transaction committed since, this one conflicts loudly — its
    * staged deletes/appends were derived from a superseded state, and
    * overlaying them could lose that commit's effects. The caller
    * restages from the new version and retries, exactly like a
    * [[Snapshots.compactOcc]] retry.
    */
  def commit(cat: Path, updates: Map[String, Int], expectVersion: Option[Int]): Int =
    withLock(cat) {
      val cur = version(cat)
      if (cur != expectVersion)
        throw new Snapshots.CommitConflictException(
          s"transaction staged against catalog version $expectVersion but " +
            s"current is $cur: concurrent transaction landed")
      require(updates.nonEmpty, "empty transaction")
      updates.foreach { case (name, id) =>
        require(Files.exists(
          tableRoot(cat, name).resolve("manifests").resolve(s"manifest-$id")),
          s"staged snapshot $id of table '$name' has no manifest")
      }
      val v = cur.getOrElse(0) + 1
      val merged = cur.map(mapping(cat, _)).getOrElse(Map.empty) ++ updates
      Files.createDirectories(cat.resolve("versions"))
      atomicWrite(cat.resolve("versions").resolve(s"version-$v"),
        merged.toSeq.sortBy(_._1).map { case (n, id) => s"$n\t$id" }.mkString("\n"))
      atomicWrite(cat.resolve("_current"), v.toString)
      v
    }

  /** Read a table AT a catalog version — the cross-table-consistent
    * read path: resolve version → mapping → the table's pinned
    * snapshot, through its manifest.
    */
  def readTableAt(s: SparkSession, cat: Path, name: String, v: Int): DataFrame = {
    val id = mapping(cat, v).getOrElse(name,
      throw new IllegalStateException(s"table '$name' not in catalog version $v"))
    Snapshots.readAt(s, tableRoot(cat, name), id)
  }

  /** Read a table at the CURRENT catalog version. One version resolve
    * per transaction, not per table: callers needing a consistent
    * multi-table view resolve [[version]] once and use [[readTableAt]].
    */
  def readTable(s: SparkSession, cat: Path, name: String): DataFrame =
    readTableAt(s, cat, name, version(cat).getOrElse(
      throw new IllegalStateException(s"empty catalog $cat")))

  /** Catalog-level retention GC: drop every catalog version below
    * `keepFrom`, then delegate per-table reclamation to
    * [[Snapshots.expire]] with each table's OLDEST snapshot id still
    * referenced by a retained version — so any manifest (and its files)
    * some retained catalog version can reach survives, and everything
    * only expired versions reached is swept. Returns (files deleted,
    * bytes freed) summed across tables. Writer-side, like the per-table
    * expire it builds on.
    */
  def expire(cat: Path, keepFrom: Int): (Int, Long) = withLock(cat) {
    val cur = version(cat).getOrElse(return (0, 0L))
    require(keepFrom <= cur, s"keepFrom $keepFrom is beyond current $cur")
    val dir = cat.resolve("versions")
    val listing = Files.list(dir)
    val all = try listing.iterator().asScala
      .flatMap(p => Snapshots.numericSuffix(p.getFileName.toString, "version-"))
      .toSeq.sorted
    finally listing.close()
    val (expired, retained) = all.partition(_ < keepFrom)
    val keepIds: Map[String, Int] = retained.flatMap(mapping(cat, _))
      .groupBy(_._1).map { case (t, ids) => t -> ids.map(_._2).min }
    var files = 0; var bytes = 0L
    keepIds.foreach { case (t, minId) =>
      // catalog tables have no per-table pointer — their commits ARE the
      // retained catalog versions, which is exactly the bound passed here
      val (n, b) = Snapshots.expire(tableRoot(cat, t), minId, allowNoPointer = true)
      files += n; bytes += b
    }
    expired.foreach(v => Files.delete(dir.resolve(s"version-$v")))
    (files, bytes)
  }

  /** A31 query `snapshot_txn`: a cross-table transaction under the
    * driver gate. Version 1 founds `hot` (odd order keys) and `cold`
    * (even); one transaction then MOVES the keys ≡ 1 (mod 10) from hot
    * to cold — a tombstone commit staged on hot, an append staged on
    * cold, both made visible by ONE catalog rename. The output states
    * both tables at both versions; the oracle derives all four states
    * from the source table, so the hash gate proves the move conserved
    * every row and cent (nothing lost, nothing doubled) and that
    * version-1 reads are unchanged after the transaction — cross-table
    * time travel. An in-query require proves staged-but-uncommitted
    * halves are invisible through the catalog.
    */
  def snapshotTxn(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val cat = Files.createTempDirectory("graft_txn")
    try {
      val orders = graft.Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderstatus"), round(col("o_totalprice") * 100).cast("long").as("cents"))
      val hotId = Snapshots.stageOnto(s, tableRoot(cat, "hot"),
        orders.filter(col("o_orderkey") % 2 === 1), None)
      val coldId = Snapshots.stageOnto(s, tableRoot(cat, "cold"),
        orders.filter(col("o_orderkey") % 2 === 0), None)
      val v1 = commit(cat, Map("hot" -> hotId, "cold" -> coldId), None)
      // pin the pre-staging view BEFORE anything is staged, so the
      // invisibility check below compares against independent state
      val hotBefore = readTable(s, cat, "hot").count()
      val moved = orders.filter(col("o_orderkey") % 10 === 1)
      val hotId2 = Snapshots.stageDeletesOnto(s, tableRoot(cat, "hot"),
        moved.select("o_orderkey"), hotId)
      val coldId2 = Snapshots.stageOnto(s, tableRoot(cat, "cold"), moved, Some(coldId))
      // staged halves are invisible: the catalog still serves version 1
      require(TxnCatalog.version(cat).contains(v1) &&
        readTable(s, cat, "hot").count() == hotBefore,
        "staged transaction leaked before the catalog commit")
      val v2 = commit(cat, Map("hot" -> hotId2, "cold" -> coldId2), Some(v1))
      val out = for {
        v <- Seq(v1, v2)
        t <- Seq("cold", "hot")
        r <- readTableAt(s, cat, t, v)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_total_cents"))
          .collect()
      } yield Row(v.toLong, t, r.getString(0), r.getLong(1), r.getLong(2))
      val schema = StructType(Seq(
        StructField("version", LongType), StructField("tbl", StringType),
        StructField("o_orderstatus", StringType),
        StructField("n", LongType), StructField("sum_total_cents", LongType)))
      s.createDataFrame(s.sparkContext.parallelize(out, 1), schema)
        .orderBy("version", "tbl", "o_orderstatus")
    } finally {
      val walk = Files.walk(cat)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  val snapshotTxnOracleSql: String = """
    WITH b AS (SELECT o_orderkey AS k, o_orderstatus,
        CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
    SELECT CAST(1 AS BIGINT) AS version, 'cold' AS tbl, o_orderstatus,
      CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sum_total_cents
    FROM b WHERE k % 2 = 0 GROUP BY o_orderstatus
    UNION ALL
    SELECT 1, 'hot', o_orderstatus, CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
    FROM b WHERE k % 2 = 1 GROUP BY o_orderstatus
    UNION ALL
    SELECT 2, 'cold', o_orderstatus, CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
    FROM b WHERE k % 2 = 0 OR k % 10 = 1 GROUP BY o_orderstatus
    UNION ALL
    SELECT 2, 'hot', o_orderstatus, CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
    FROM b WHERE k % 2 = 1 AND k % 10 <> 1 GROUP BY o_orderstatus
    ORDER BY version, tbl, o_orderstatus"""
}
