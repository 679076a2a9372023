package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** A9: MySQL dump DDL → Spark StructType, with VIEW detection.
  *
  * The reference pipes the `.sql.gz` DDL straight into MySQL and later
  * skips VIEWs when loading data files (LoadFiles.pm:106-129; view skip
  * at :123-129). For a Spark-native warehouse we instead parse the dump
  * DDL into StructTypes so the mirrored tables can be materialized as
  * parquet with faithful types.
  */
object SqlDdl {

  final case class DdlColumn(name: String, sparkType: DataType)
  final case class DdlObject(name: String, isView: Boolean, columns: Seq[DdlColumn]) {
    def toStructType: StructType =
      StructType(columns.map(c => StructField(c.name, c.sparkType)))
  }

  private val CreateTableRe =
    """(?is)CREATE\s+TABLE\s+`?([A-Za-z_0-9 ]+)`?\s*\((.*)\)[^)]*$""".r
  private val CreateViewRe =
    """(?is)CREATE\s+(?:OR\s+REPLACE\s+)?(?:ALGORITHM\s*=\s*\S+\s+)?(?:DEFINER\s*=\s*\S+\s+)?(?:SQL\s+SECURITY\s+\S+\s+)?VIEW\s+`?([A-Za-z_0-9 ]+)`?.*""".r
  private val ColumnRe =
    """^`?([A-Za-z_0-9 ]+)`?\s+([A-Za-z]+(?:\([^)]*\))?(?:\s+unsigned)?).*$""".r
  private val IndexPrefixes =
    Seq("PRIMARY", "UNIQUE", "KEY", "INDEX", "CONSTRAINT", "FULLTEXT", "SPATIAL", "FOREIGN")

  /** MySQL column type → Spark type (unsigned ints widen one tier,
    * matching what the values can hold).
    */
  def mysqlTypeToSpark(raw: String): DataType = {
    val t = raw.trim.toLowerCase(java.util.Locale.ROOT)
    val unsigned = t.contains("unsigned")
    val base = t.takeWhile(c => c.isLetter)
    val params = "\\((\\d+)(?:\\s*,\\s*(\\d+))?\\)".r.findFirstMatchIn(t)
    base match {
      case "tinyint"                   => if (unsigned) ShortType else ByteType
      case "smallint"                  => if (unsigned) IntegerType else ShortType
      case "mediumint" | "int" | "integer" => if (unsigned) LongType else IntegerType
      case "bigint"                    => if (unsigned) DecimalType(20, 0) else LongType
      case "float"                     => FloatType
      case "double" | "real"           => DoubleType
      case "decimal" | "numeric" =>
        val p = params.map(_.group(1).toInt).getOrElse(10)
        val sc = params.flatMap(m => Option(m.group(2))).map(_.toInt).getOrElse(0)
        DecimalType(p, sc)
      case "datetime" | "timestamp"    => TimestampType
      case "date"                      => DateType
      case "year"                      => IntegerType
      case "blob" | "tinyblob" | "mediumblob" | "longblob" | "binary" | "varbinary" => BinaryType
      case "bit"                       => if (params.exists(_.group(1).toInt > 1)) LongType else BooleanType
      case _                           => StringType // char/varchar/text/enum/set/time/json...
    }
  }

  /** Split a dump into statements and parse every CREATE TABLE / VIEW. */
  def parse(ddl: String): Seq[DdlObject] = {
    // Statements end with ';' at line end; good enough for mysqldump output.
    val statements = ddl.split(";\\s*(\n|$)").map(_.trim).filter(_.nonEmpty)
    statements.flatMap { st =>
      st match {
        case CreateViewRe(name) => Some(DdlObject(name.trim, isView = true, Nil))
        case CreateTableRe(name, body) =>
          val cols = body.split(",\\s*\n").map(_.trim).filter(_.nonEmpty).flatMap { line =>
            val upper = line.toUpperCase
            if (IndexPrefixes.exists(upper.startsWith)) None
            else line match {
              case ColumnRe(colName, colType) => Some(DdlColumn(colName.trim, mysqlTypeToSpark(colType)))
              case _ => None
            }
          }
          Some(DdlObject(name.trim, isView = false, cols.toSeq))
        case _ => None
      }
    }.toSeq
  }

  /** A9 reverse: StructType → MySQL CREATE TABLE DDL, the generator the
    * JDBC bulk-load path needs when the target table doesn't exist yet.
    * Emits the canonical MySQL type per Spark type, so
    * parse(toMySqlDdl(schema)) == schema for every representable schema
    * (the round-trip identity asserted in SqlDdlSpec).
    */
  def sparkTypeToMysql(t: DataType): String = t match {
    case ByteType           => "tinyint"
    case ShortType          => "smallint"
    case IntegerType        => "int"
    case LongType           => "bigint"
    case FloatType          => "float"
    case DoubleType         => "double"
    case d: DecimalType if d.precision == 20 && d.scale == 0 => "bigint unsigned"
    case d: DecimalType     => s"decimal(${d.precision},${d.scale})"
    case TimestampType      => "datetime"
    case DateType           => "date"
    case BinaryType         => "blob"
    case BooleanType        => "bit(1)"
    case _                  => "text"
  }

  def toMySqlDdl(table: String, schema: StructType): String =
    schema.fields.map(f => s"  `${f.name}` ${sparkTypeToMysql(f.dataType)}")
      .mkString(s"CREATE TABLE `$table` (\n", ",\n", "\n);")

  /** A representative slice of an Ensembl-style dump DDL (tables + a view). */
  val sampleDdl: String =
    """CREATE TABLE `gene` (
      |  `gene_id` int(10) unsigned NOT NULL AUTO_INCREMENT,
      |  `biotype` varchar(40) NOT NULL,
      |  `description` text,
      |  `created_date` datetime NOT NULL,
      |  `stable_id` varchar(128) DEFAULT NULL,
      |  `version` smallint(5) unsigned,
      |  `score` double DEFAULT NULL,
      |  `cost` decimal(10,2),
      |  `status` enum('KNOWN','NOVEL'),
      |  PRIMARY KEY (`gene_id`),
      |  KEY `biotype_idx` (`biotype`)
      |) ENGINE=MyISAM DEFAULT CHARSET=latin1;
      |CREATE TABLE `exon` (
      |  `exon_id` bigint unsigned NOT NULL,
      |  `seq` blob,
      |  `is_current` tinyint(1) DEFAULT '1'
      |) ENGINE=MyISAM;
      |CREATE ALGORITHM=UNDEFINED DEFINER=`adm`@`%` SQL SECURITY DEFINER VIEW `gene_view` AS select g.gene_id from gene g;
      |""".stripMargin

  /** A9 query: the parsed catalog as rows (views carry no column rows,
    * mirroring the reference's "skip VIEWs" rule for data loading).
    */
  def query(s: SparkSession, d: String): DataFrame = {
    val sq = s; import sq.implicits._
    val rows = parse(sampleDdl).flatMap { obj =>
      if (obj.isView) Seq((obj.name, "view", 0, "", ""))
      else obj.columns.zipWithIndex.map { case (c, i) =>
        (obj.name, "table", i + 1, c.name, c.sparkType.simpleString)
      }
    }
    rows.toDF("obj_name", "obj_type", "ord", "col_name", "col_type")
      .orderBy("obj_name", "ord")
  }
}
