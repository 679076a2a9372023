package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class LoadStatementsSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private lazy val rows = LoadStatements.query(s, TestSpark.sf).collect()
    .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))

  test("drop database is issued only on the exists+retry path") {
    val drops = rows.filter(_._3 == "drop")
    assert(drops.map(_._1).toSeq == Seq("homo_sapiens_core_99_38"))
    assert(drops.forall(_._2 == 1), "drop must be the first statement")
    // the fresh load starts straight at create
    assert(rows.filter(r => r._1 == "mus_musculus_core_99_39" && r._2 == 1)
      .head._3 == "create")
  }

  test("views never get load statements; split parts get exactly one LOAD") {
    assert(!rows.exists(r => r._3 != "ddl" && r._4.contains("gene_view")),
      "view must be skipped at load")
    val geneLoads = rows.filter(r => r._1.startsWith("homo") && r._3 == "load" &&
      r._4.contains("`gene`"))
    assert(geneLoads.length == 1, "3 split parts concat to ONE load")
  }

  test("LOAD DATA dialect text matches LoadFiles.pm:137-140 byte for byte") {
    val load = rows.find(r => r._3 == "load" && r._4.contains("`exon`")).get._4
    assert(load ==
      "LOAD DATA LOCAL INFILE 'exon.txt' INTO TABLE `exon` FIELDS ESCAPED BY '\\\\'")
  }

  test("per-table statement order is disable -> load -> enable -> analyze, tables ASCII-sorted") {
    val mus = rows.filter(r => r._1 == "mus_musculus_core_99_39" && r._2 >= 5)
      .sortBy(_._2).map(_._3).toSeq
    assert(mus == Seq("disable_keys", "load", "enable_keys", "analyze",
      "disable_keys", "load", "enable_keys", "analyze"))
    val tablesInOrder = rows.filter(r => r._1 == "mus_musculus_core_99_39" && r._3 == "analyze")
      .sortBy(_._2).map(_._4).toSeq
    assert(tablesInOrder == Seq("analyze table `exon`", "analyze table `gene`"))
  }

  test("ddl statements ride between create and the first table, in file order") {
    val homo = rows.filter(_._1 == "homo_sapiens_core_99_38").sortBy(_._2)
    assert(homo.slice(2, 5).forall(_._3 == "ddl"))
    assert(homo(2)._4.startsWith("CREATE TABLE `gene`"))
    assert(homo(3)._4.startsWith("CREATE TABLE `exon`"))
    assert(homo(4)._4.contains("VIEW `gene_view`"))
  }
}
