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

  test("generate∘parse is the identity on every parsed sample schema") {
    SqlDdl.parse(SqlDdl.sampleDdl).filterNot(_.isView).foreach { obj =>
      val ddl = SqlDdl.toMySqlDdl(obj.name, obj.toStructType)
      val reparsed = SqlDdl.parse(ddl)
      assert(reparsed.size == 1)
      assert(reparsed.head.name == obj.name)
      assert(reparsed.head.toStructType == obj.toStructType, ddl)
    }
  }

  test("generated DDL covers every Spark type the loader produces") {
    val schema = StructType(Seq(
      StructField("a", ByteType), StructField("b", ShortType),
      StructField("c", IntegerType), StructField("d", LongType),
      StructField("e", DecimalType(20, 0)), StructField("f", FloatType),
      StructField("g", DoubleType), StructField("h", DecimalType(12, 3)),
      StructField("i", TimestampType), StructField("j", DateType),
      StructField("k", BinaryType), StructField("l", BooleanType),
      StructField("m", StringType)))
    val back = SqlDdl.parse(SqlDdl.toMySqlDdl("t", schema)).head.toStructType
    assert(back == schema, SqlDdl.toMySqlDdl("t", schema))
  }
}
