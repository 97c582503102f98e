package graft

import org.scalatest.funsuite.AnyFunSuite

class FlagshipSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry: full reference pipeline over sf0.001 yields one overview row per coin") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length == 5) // one per event_type "coin"
    assert(df.columns.toSeq == Seq("asset_id", "symbol", "name", "display_price",
      "market_cap", "volume", "pct_change_24h", "ts"))
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("display_price"))))
  }
}
