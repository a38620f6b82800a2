package graft
import org.scalatest.funsuite.AnyFunSuite
/** The driver's flagship smoke check: SparkEntry.entry returns rows. */
class EntrySmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  test("entry(spark) produces rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
