package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A28: the MySQL-dialect statement stream of a database load — the exact
  * statements, in the exact order, the reference issues per database
  * (LoadFiles.pm:44-83 `run`, :120-149 `_load_data_file`, :218-234
  * disable/enable/analyze; Database.pm:78-90 `run_mysql_cmd`). A13
  * executes the load for real against embedded Derby where only
  * URL/dialect differ; this relation closes the remaining gap — "what
  * would MySQL be ASKED to do" — the way A10's `grant_ddl` pins GRANT
  * text, so dialect conformance is oracle-checked without a server:
  *
  *   1. `drop database` — only when the target exists AND this is a
  *      retry (first-attempt-exists throws instead: A18's `load_retry`
  *      pins that gate; LoadFiles.pm:56-64);
  *   2. `create database` (LoadFiles.pm:103);
  *   3. the dump DDL, statement by statement in file order — the CLI
  *      pipes the whole `<db>.sql` file (Database.pm:85-88), and this is
  *      the statement sequence the server executes from it;
  *   4. per data table in ASCII-sorted order (LoadFiles.pm:74,
  *      `sort keys`), VIEWs skipped (:124-129, is_view): disable keys →
  *      `LOAD DATA LOCAL INFILE '<table>.txt' INTO TABLE ... FIELDS
  *      ESCAPED BY '\\'` (:137-140 — split parts were gunzip-CONCATENATED
  *      to one `<table>.txt`, so one LOAD per table regardless of part
  *      count) → enable keys → analyze (:142-144).
  *
  * Statement text is whitespace-normalized (multi-line DDL folds to one
  * line) — the relation pins text and order, not formatting. Spark-first:
  * the stream is derived relationally — header statements filter/project
  * off the scenario relation, DDL rows posexplode in file order, load
  * rows are a view-skip anti-join then a 4-statement explode — and the
  * per-db sequence is a window over the metadata-sized result. The
  * scenario fixture covers both the fresh-load and the exists+retry
  * paths, split parts, and a view with a stray dump file.
  */
object LoadStatements {

  /** (db, db_exists, retry_count): one fresh load, one retry reload. */
  val sampleDbs: Seq[(String, Boolean, Int)] = Seq(
    ("homo_sapiens_core_99_38", true, 1),
    ("mus_musculus_core_99_39", false, 0))

  /** Dump-dir listing: split gene parts, unsplit exon, a stray dump file
    * for the VIEW (must be skipped at load), non-data entries ignored.
    */
  val sampleListing: Seq[String] = Seq(
    "exon.txt.gz",
    "gene.0001.txt.gz", "gene.0002.txt.gz", "gene.0010.txt.gz",
    "gene_view.txt.gz",
    "CHECKSUMS", "README")

  private def normalize(c: org.apache.spark.sql.Column) =
    regexp_replace(trim(c), "\\s+", " ")

  def query(s: SparkSession, d: String): DataFrame = {
    val sq = s; import sq.implicits._
    val dbs = broadcast(sampleDbs.toDF("db", "db_exists", "retry_count"))

    val drops = dbs.filter(col("db_exists") && col("retry_count") > 0)
      .select(col("db"), lit(0).as("stage_rank"), lit("").as("tbl"), lit(0).as("sub"),
        lit("drop").as("stage"),
        concat(lit("drop database `"), col("db"), lit("`")).as("stmt"))

    val creates = dbs
      .select(col("db"), lit(1).as("stage_rank"), lit("").as("tbl"), lit(0).as("sub"),
        lit("create").as("stage"),
        concat(lit("create database `"), col("db"), lit("`")).as("stmt"))

    // The dump DDL in file order (same statement split SqlDdl.parse uses).
    val ddlStatements = SqlDdl.sampleDdl.split(";\\s*(\n|$)")
      .map(_.trim).filter(_.nonEmpty).toSeq
    val ddl = dbs.crossJoin(
        ddlStatements.zipWithIndex.toDF("raw", "idx"))
      .select(col("db"), lit(2).as("stage_rank"), lit("").as("tbl"), col("idx").as("sub"),
        lit("ddl").as("stage"), normalize(col("raw")).as("stmt"))

    // Data tables from the listing, views anti-joined away (is_view).
    val views = SqlDdl.parse(SqlDdl.sampleDdl).filter(_.isView).map(_.name)
      .toDF("table_name")
    val tables = SplitFiles.group(sampleListing.toDF("file"))
      .select("table_name")
      .join(broadcast(views), Seq("table_name"), "left_anti")
    val loadStmts = dbs.crossJoin(broadcast(tables))
      .select(col("db"), lit(3).as("stage_rank"), col("table_name").as("tbl"),
        explode(array(
          struct(lit(0).as("sub"), lit("disable_keys").as("stage"),
            concat(lit("alter table `"), col("table_name"), lit("` disable keys")).as("stmt")),
          struct(lit(1).as("sub"), lit("load").as("stage"),
            concat(lit("LOAD DATA LOCAL INFILE '"), col("table_name"),
              lit(".txt' INTO TABLE `"), col("table_name"),
              lit("` FIELDS ESCAPED BY '\\\\'")).as("stmt")),
          struct(lit(2).as("sub"), lit("enable_keys").as("stage"),
            concat(lit("alter table `"), col("table_name"), lit("` enable keys")).as("stmt")),
          struct(lit(3).as("sub"), lit("analyze").as("stage"),
            concat(lit("analyze table `"), col("table_name"), lit("`")).as("stmt"))
        )).as("x"))
      .select(col("db"), col("stage_rank"), col("tbl"),
        col("x.sub").as("sub"), col("x.stage").as("stage"), col("x.stmt").as("stmt"))

    val all = drops.unionByName(creates).unionByName(ddl).unionByName(loadStmts)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("db").orderBy("stage_rank", "tbl", "sub")
    all.withColumn("seq", row_number().over(w))
      .select("db", "seq", "stage", "stmt")
      .orderBy("db", "seq")
  }
}
