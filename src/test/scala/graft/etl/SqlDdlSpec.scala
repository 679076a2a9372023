package graft.etl

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SqlDdlSpec extends AnyFunSuite {

  test("parses tables, skips index lines, detects views") {
    val objs = SqlDdl.parse(SqlDdl.sampleDdl)
    assert(objs.map(_.name) == Seq("gene", "exon", "gene_view"))
    val gene = objs.head
    assert(!gene.isView)
    assert(gene.columns.map(_.name) == Seq("gene_id", "biotype", "description",
      "created_date", "stable_id", "version", "score", "cost", "status"))
    assert(objs(2).isView && objs(2).columns.isEmpty)
  }

  test("mysql type mapping incl. unsigned widening") {
    assert(SqlDdl.mysqlTypeToSpark("int(10) unsigned") == LongType)
    assert(SqlDdl.mysqlTypeToSpark("int(11)") == IntegerType)
    assert(SqlDdl.mysqlTypeToSpark("bigint unsigned") == DecimalType(20, 0))
    assert(SqlDdl.mysqlTypeToSpark("smallint(5) unsigned") == IntegerType)
    assert(SqlDdl.mysqlTypeToSpark("tinyint(1)") == ByteType)
    assert(SqlDdl.mysqlTypeToSpark("varchar(40)") == StringType)
    assert(SqlDdl.mysqlTypeToSpark("enum('A','B')") == StringType)
    assert(SqlDdl.mysqlTypeToSpark("decimal(10,2)") == DecimalType(10, 2))
    assert(SqlDdl.mysqlTypeToSpark("datetime") == TimestampType)
    assert(SqlDdl.mysqlTypeToSpark("blob") == BinaryType)
    assert(SqlDdl.mysqlTypeToSpark("double") == DoubleType)
  }

  test("toStructType produces a usable schema") {
    val st = SqlDdl.parse(SqlDdl.sampleDdl).head.toStructType
    assert(st.fieldNames.contains("gene_id"))
    assert(st("cost").dataType == DecimalType(10, 2))
  }
}
