package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema snapshot of the driver-generated testdata (TESTDATA.md).
  *
  * The engine assumes specific dtypes per table (join keys long vs int,
  * prices double, `events.ts` one of three physical timestamp layouts).
  * The r9 testdata regeneration silently flipped `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP_MICROS and 42 queries failed with an
  * opaque analysis error each. This spec turns the next such drift into
  * ONE labeled failure that names the changed table + column.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def schemaOf(name: String): StructType =
    spark.read.parquet(s"$dir/$name.parquet").schema

  /** Both timestamp flavors are acceptable wherever the engine expects a
    * point-in-time: session TZ is pinned UTC (GraftSession), so NTZ and
    * UTC-adjusted micros carry identical wall-clocks and every consumer
    * (date filters, window buckets, DuckDB oracle) agrees. Collapse them
    * so a regeneration flipping the flag doesn't fail the snapshot.
    */
  private def normalized(name: String): String =
    schemaOf(name).fields.map { f =>
      val dt = f.dataType match {
        case TimestampNTZType => "timestamp"
        case other            => other.simpleString
      }
      s"${f.name}:$dt"
    }.mkString(",")

  private def assertSchema(name: String, expected: String): Unit =
    assert(normalized(name) == expected,
      s"testdata table `$name` drifted from the engine's assumed schema")

  test("TPC-H-ish tables carry the assumed dtypes") {
    assertSchema("region", "r_regionkey:int,r_name:string")
    assertSchema("nation", "n_nationkey:int,n_name:string,n_regionkey:int")
    assertSchema("customer",
      "c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string")
    assertSchema("supplier", "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double")
    assertSchema("part",
      "p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double")
    assertSchema("orders",
      "o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double," +
      "o_orderdate:timestamp,o_orderpriority:string")
    assertSchema("lineitem",
      "l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int,l_quantity:double," +
      "l_extendedprice:double,l_discount:double,l_tax:double,l_returnflag:string," +
      "l_linestatus:string,l_shipdate:timestamp")
  }

  test("documents / embeddings tables carry the assumed dtypes") {
    assertSchema("documents", "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint")
    assertSchema("embeddings", "vec_id:bigint,embedding:array<float>,label:int")
  }

  test("events.ts is one of the three supported physical layouts and adapts to TIMESTAMP") {
    val raw = schemaOf("events")
    val cols = raw.fields.map(f => f.name -> f.dataType).toMap
    assert(raw.fieldNames.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(cols("event_id") == LongType && cols("user_id") == LongType &&
      cols("event_type") == StringType && cols("value") == DoubleType &&
      cols("props") == StringType)
    val ts = cols("ts")
    assert(ts == LongType || ts == TimestampNTZType || ts == TimestampType,
      s"events.ts physical layout $ts is not one Tables.events knows how to adapt " +
      "(epoch-nanos long / TIMESTAMP_NTZ micros / UTC TIMESTAMP)")
    // And the adaptive reader must always surface native TIMESTAMP.
    assert(Tables.events(spark, dir).schema("ts").dataType == TimestampType)
  }

  test("session timezone is UTC so NTZ and UTC timestamps agree on wall-clock") {
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
  }
}
