package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: every oracle key is backed by a query,
  * every Bench headline exists, the flagship entry returns rows, and
  * result schemas obey the comparison normalization rules (no raw
  * int/float/timestamp columns reaching the oracle compare).
  */
class ContractSpec extends AnyFunSuite {

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query carries an oracle, except the documented rows-only sketch") {
    // the driver records a weaker rows-only check for oracle-less queries;
    // the ONLY surface allowed to ride that is the HLL sketch (its oracled
    // counterpart is q_kmv_distinct) — a new query landing here is a bug
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly == Set("q_approx_distinct"), s"un-oracled queries: $rowsOnly")
  }

  test("every Bench headline name is a registered query") {
    val missing = Bench.headline.toSet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"headline without query: $missing")
  }

  test("entry() produces rows (driver smoke parity)") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("oracle-checked query schemas contain no raw int/float/timestamp columns") {
    import org.apache.spark.sql.types._
    val s = TestSpark.spark
    SparkEntry.oracleSql.keySet.toSeq.sorted.foreach { name =>
      val schema = SparkEntry.queries(name)(s, TestSpark.sf).schema
      schema.fields.foreach { f =>
        assert(!Seq(IntegerType, ShortType, ByteType, FloatType, TimestampType)
          .contains(f.dataType),
          s"$name.${f.name}: ${f.dataType.simpleString} would break oracle normalization")
      }
    }
  }
}
