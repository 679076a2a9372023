package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's routing rules (Prioritise.pm:32-81) on crafted
  * names, independent of the derived-db oracle relation.
  */
class DiscoverySpec extends AnyFunSuite {

  test("priority scoring reproduces the reference's score→flow map") {
    val s = TestSpark.spark
    val rows = Discovery.prioritise(s, TestSpark.sf).collect()
      .map(r => r.getString(0) -> (r.getInt(1).toLong, r.getInt(2).toLong)).toMap
    // plain db: no species hit, no group hit → priority 0, flow 2
    assert(rows("nation_0_core_110_1") == (0L, 2L))
    // prioritised species prefix only → 1, flow 3 (nation_1 prefix also
    // matches nation_1x names, like the reference's /^species/ regex)
    assert(rows("nation_1_core_110_1") == (1L, 3L))
    assert(rows("nation_10_core_110_1") == (1L, 3L))
    // species + group → 2, flow 4
    assert(rows("mus_musculus_variation_110_39") == (2L, 4L))
    // human variation triple hit → 3, flow 5 (Prioritise.pm:71-76)
    assert(rows("homo_sapiens_variation_110_38") == (3L, 5L))
    // group hit without species → 1, flow 3
    assert(rows("nation_0_variation_110_1") == (1L, 3L))
  }

  test("release paths pin the reference's dot-dir / current / division branches") {
    val s = TestSpark.spark
    val rows = ReleasePaths.query(s, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3)) ->
        (r.getString(4), r.getString(5))).toMap
    val db = "homo_sapiens_core_110_38"
    // released, no division (Base.pm:62-74)
    assert(rows((db, "110", "", false))._1 == "/pub/release-110/mysql")
    // prerelease numbered release → DOT directory (Base.pm:66-68)
    assert(rows((db, "110", "", true))._1 == "/pub/.release-110/mysql")
    // 'current' passes through untouched, even prerelease (Base.pm:67)
    assert(rows((db, "current", "", true))._1 == "/pub/current/mysql")
    // division segment present only when set (Base.pm:71)
    assert(rows((db, "110", "plants", false))._1 == "/pub/release-110/plants/mysql")
    // rsync target: NO current special case (Base.pm:131-139) + catdir join
    assert(rows((db, "current", "", false))._2 == s"/nfs/ftpsite/release-current/mysql/$db")
    assert(rows((db, "110", "plants", true))._2 == s"/nfs/ftpsite/.release-110/plants/mysql/$db")
  }

  test("mode filter matches the reference's mart/ensembl split") {
    val s = TestSpark.spark
    val rows = Discovery.modeFilter(s, TestSpark.sf).collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(rows("ensembl_mart_110") == (true, false))
    assert(rows("homo_sapiens_core_110_38") == (false, true))
  }
}
