package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A17: release-path construction — the reference's FTP/rsync path algebra
  * (RunnableDB/Base.pm:62-74 `base_ftp_path`, Base.pm:123-144
  * `nfs_ftp_site_dir`) as a pure string relation over
  * (db × release × division × prerelease).
  *
  * Branches covered, verbatim from the reference:
  *  - `base_ftp_path`: a prerelease mirror lives in a DOT-directory
  *    (`.release-N`); `current` is passed through untouched (the dot and
  *    `release-` prefix only apply to numbered releases); the division
  *    segment appears only when a division is set (Perl truthiness — the
  *    empty string is skipped, which the `division <> ''` test mirrors
  *    exactly).
  *  - `nfs_ftp_site_dir`: the rsync base always gets `release-N` /
  *    `.release-N` (NO `current` special case — faithful to the
  *    reference, which never passes `current` here but computes exactly
  *    this), then the division, then `/mysql/`, then File::Spec->catdir
  *    with the target dir — which collapses the doubled slash, i.e. a
  *    plain `/mysql/` || db concat.
  *
  * Pure per-row string expressions over a broadcast 8-row config grid:
  * zero shuffles beyond the final presentation sort; at 100 TB of db
  * names this is a map-only pass.
  */
object ReleasePaths {

  /** Stand-in for the reference's `rsync_url` param (an NFS-mounted FTP
    * staging root in the reference's deployment).
    */
  val rsyncBase = "/nfs/ftpsite"

  val releases: Seq[String]  = Seq("110", "current")
  val divisions: Seq[String] = Seq("", "plants")

  def query(s: SparkSession, d: String): DataFrame = {
    val sq = s; import sq.implicits._
    val cfg = (for {
      r <- releases; dv <- divisions; p <- Seq(false, true)
    } yield (r, dv, p)).toDF("release", "division", "prerelease")
    val relSeg = when(col("release") =!= "current",
      concat(when(col("prerelease"), lit(".")).otherwise(lit("")),
        lit("release-"), col("release"))).otherwise(col("release"))
    val divSeg = when(col("division") =!= "",
      concat(lit("/"), col("division"))).otherwise(lit(""))
    Discovery.databases(s, d).crossJoin(broadcast(cfg))
      .select(col("db"), col("release"), col("division"), col("prerelease"),
        concat(lit("/pub/"), relSeg, divSeg, lit("/mysql")).as("ftp_path"),
        concat(lit(rsyncBase),
          when(col("prerelease"), lit("/.release-")).otherwise(lit("/release-")),
          col("release"), divSeg, lit("/mysql/"), col("db")).as("rsync_target"))
      .orderBy("db", "release", "division", "prerelease")
  }
}
