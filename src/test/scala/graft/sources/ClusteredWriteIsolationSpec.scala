package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Task-attempt isolation of the clustered DSv2 writers: a failed or
  * speculative attempt's files must never reach the committed manifest.
  * The old shape wrote final files into the shared staging dir, left
  * them on abort, and the driver manifested EVERYTHING it found —
  * a retried task would double its rows in the committed snapshot.
  * Now: abort() deletes the attempt's own files, the commit message
  * names the committed attempt's files, and the driver sweeps + manifests
  * only message-named paths ([[GraftClusteredCommit.committedPaths]]).
  */
class ClusteredWriteIsolationSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private val schema = StructType(Seq(StructField("k", LongType)))

  private def mkFactory(dataDir: Path): GraftClusteredWriterFactory = {
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      s.sessionState.newHadoopConf())
    val owFactory =
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
        .prepareWrite(s.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          job, Map.empty, schema)
    new GraftClusteredWriterFactory(dataDir.toString, schema, owFactory,
      new org.apache.spark.util.SerializableConfiguration(job.getConfiguration),
      GraftIdentityKey(0, LongType), -1, None)
  }

  private def row(k: Long): InternalRow = new GenericInternalRow(Array[Any](k))

  private def parquetsUnder(dir: Path): Seq[String] = {
    val walk = Files.walk(dir)
    try walk.iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => dir.relativize(p).toString).sorted
    finally walk.close()
  }

  test("maxRecordsPerFile bounds clustered files; sorted claims survive the roll") {
    val root = Files.createTempDirectory("graft_cwi_maxrec")
    val cat = "gmaxrec"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    val prev = s.conf.get("spark.sql.files.maxRecordsPerFile")
    s.conf.set("spark.sql.files.maxRecordsPerFile", "500")
    try {
      // a hot identity partition must not land one giant file
      s.sql(s"CREATE TABLE $cat.hot (p BIGINT, k BIGINT) PARTITIONED BY (p)")
      s.sql(s"INSERT INTO $cat.hot SELECT 7L, id FROM range(0, 5000)")
      val hotFiles = graft.etl.Snapshots.manifest(root.resolve("hot"), 1)
      assert(hotFiles.size >= 10, s"expected >=10 bounded files, got ${hotFiles.size}")
      assert(hotFiles.forall(e =>
        graft.etl.Snapshots.partValueOf(e.relPath).contains("7")))
      assert(s.sql(s"SELECT count(*), sum(k) FROM $cat.hot").head.toSeq ==
        Seq(5000L, (0L until 5000L).sum))
      // a SORTED bucket rolled at the size bound keeps the ordering
      // claim: consecutive slices of one ascending run have disjoint
      // zone ranges, so sorted_disjoint stays TRUE per bucket
      s.sql(s"CREATE TABLE $cat.srt (k BIGINT NOT NULL, v BIGINT NOT NULL) " +
        "PARTITIONED BY (bucket(2, k)) TBLPROPERTIES ('sortcol'='v')")
      s.sql(s"INSERT INTO $cat.srt SELECT id % 16, id FROM range(0, 4000)")
      val parts = s.sql(s"SELECT partition, n_files, sorted_disjoint " +
        s"FROM $cat.srt.partitions").collect()
      assert(parts.forall(_.getLong(1) > 1),
        s"sorted buckets should have rolled multiple files: ${parts.mkString(";")}")
      assert(parts.forall(r => !r.isNullAt(2) && r.getBoolean(2)),
        s"size rolls broke the sorted-disjoint claim: ${parts.mkString(";")}")
    } finally {
      s.conf.set("spark.sql.files.maxRecordsPerFile", prev)
      rm(root)
    }
  }

  test("abort() deletes the attempt's own files") {
    val dataDir = Files.createTempDirectory("graft_cwi_abort")
    try {
      val w = mkFactory(dataDir).createWriter(0, 1L)
      w.write(row(1)); w.write(row(1)); w.write(row(2)) // rolls two files
      assert(parquetsUnder(dataDir).size == 2)
      w.abort()
      assert(parquetsUnder(dataDir).isEmpty,
        "aborted attempt left files for the driver to manifest")
    } finally rm(dataDir)
  }

  test("commit manifests ONLY message-named files; strays are swept") {
    val dataDir = Files.createTempDirectory("graft_cwi_commit")
    try {
      val factory = mkFactory(dataDir)
      // attempt 1 of task 0: writes, then DIES without abort (executor
      // crash) — its files linger on disk
      val dead = factory.createWriter(0, 1L)
      dead.write(row(1)); dead.write(row(2))
      // attempt 2 of task 0: the retry that COMMITS
      val live = factory.createWriter(0, 2L)
      live.write(row(1)); live.write(row(2))
      val msg = live.commit()
      val named = msg.asInstanceOf[GraftBucketedTaskFiles].paths.toSet
      assert(named.size == 2)
      assert(parquetsUnder(dataDir).size == 4, "both attempts' files on disk")
      val committed = GraftClusteredCommit.committedPaths(
        dataDir, Array[WriterCommitMessage](msg))
      assert(committed == named)
      // the dead attempt's files are GONE; only the winner's remain
      assert(parquetsUnder(dataDir).toSet == named,
        "stray attempt files survived the commit sweep")
      // and the committed rows are exactly one copy per key
      val rows = s.read.parquet(
        named.map(dataDir.resolve(_).toString).toSeq: _*)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(rows == Seq(1L, 2L))
    } finally rm(dataDir)
  }
}
