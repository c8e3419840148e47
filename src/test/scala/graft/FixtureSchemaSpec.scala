package graft

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema canary: fails with a readable per-column diff when the
  * driver regenerates `/root/testdata` with a physical type the engine does
  * not know how to normalize (the r8 events nanos→micros flip surfaced as 30
  * opaque query failures; this turns the next one into a single named red
  * test). */
class FixtureSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("fixture columns read as accepted types at sf0.001") {
    val drift = FixtureCheck.diff(spark, sf)
    assert(drift.isEmpty, "\n" + drift.mkString("\n"))
  }

  test("Tables() normalizes events.ts to session-TZ TimestampType") {
    // Whatever physical generation the fixture carries, downstream queries
    // and the driver's parquet-schema compare must see one stable type.
    val t = Tables(spark, sf, "events").schema("ts").dataType
    assert(t == TimestampType, s"events.ts normalized to $t, want timestamp")
  }
}
