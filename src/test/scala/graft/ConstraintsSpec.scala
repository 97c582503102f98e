package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ManifestTable

/** Table-level CHECK constraints (Delta's ALTER TABLE ADD CONSTRAINT):
  * durable props validated by every value-landing write — merge
  * batches and MoR update appendices — with SQL-standard semantics
  * (FALSE violates, NULL satisfies).
  */
class ConstraintsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ck_$tag").toString + "/t"

  private def seed(path: String): Unit = {
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("id", "part", "v")
    ManifestTable.merge(spark, path, df, Seq("id"), "part")
  }

  test("addConstraint validates existing data; merges refuse violating " +
    "batches wholesale and admit clean ones") {
    val path = freshPath("basic")
    seed(path)
    ManifestTable.addConstraint(spark, path, "v_pos", "v > 0")
    // a violating ADD is refused
    val e0 = intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, path, "v_big", "v > 15")
    }
    assert(e0.getMessage.contains("v_big"))
    // clean batch lands
    ManifestTable.merge(spark, path,
      Seq((4L, "b", 5.0)).toDF("id", "part", "v"), Seq("id"), "part")
    assert(ManifestTable.read(spark, path).count() == 4L)
    // violating batch refuses and commits NOTHING (not even its clean rows)
    val e1 = intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, path,
        Seq((5L, "a", 50.0), (6L, "b", -1.0)).toDF("id", "part", "v"),
        Seq("id"), "part")
    }
    assert(e1.getMessage.contains("v_pos"))
    assert(ManifestTable.read(spark, path).count() == 4L,
      "the refused merge must not be visible")
    // the table still works after the refusal (residue swept by merge)
    ManifestTable.merge(spark, path,
      Seq((5L, "a", 50.0)).toDF("id", "part", "v"), Seq("id"), "part")
    assert(ManifestTable.read(spark, path).count() == 5L)
  }

  test("NULL satisfies (SQL-standard CHECK); IS NOT NULL forbids it") {
    val path = freshPath("nulls")
    seed(path)
    ManifestTable.addConstraint(spark, path, "v_pos", "v > 0")
    // NULL v passes v > 0 (UNKNOWN, not FALSE)
    ManifestTable.merge(spark, path,
      Seq((7L, "a", Option.empty[Double])).toDF("id", "part", "v"),
      Seq("id"), "part")
    assert(ManifestTable.read(spark, path).where(col("v").isNull).count() == 1L)
    val e = intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, path, "v_req", "v IS NOT NULL")
    }
    assert(e.getMessage.contains("v_req"), "existing null row must refuse the ADD")
  }

  test("MoR updates validate the appendix rows; constraints survive " +
    "compaction and drop cleanly") {
    val path = freshPath("mor")
    seed(path)
    ManifestTable.addConstraint(spark, path, "v_pos", "v > 0")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.updateWhereMoR(spark, path, "part",
        col("id") === 2L, Map("v" -> lit(-5.0)))
    }
    assert(e.getMessage.contains("v_pos"))
    assert(ManifestTable.read(spark, path).where(col("id") === 2L)
      .select("v").as[Double].head() == 20.0, "refused update must not land")
    // a clean update passes
    ManifestTable.updateWhereMoR(spark, path, "part",
      col("id") === 2L, Map("v" -> lit(25.0)))
    // constraints survive compaction (durable-prefix props)
    ManifestTable.compact(spark, path, "part")
    assert(ManifestTable.constraintsOf(ManifestTable.readProps(spark, path))
      == Map("v_pos" -> "v > 0"))
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, path,
        Seq((9L, "a", -2.0)).toDF("id", "part", "v"), Seq("id"), "part")
    }
    assert(e2.getMessage.contains("v_pos"))
    // drop, then the same batch lands
    ManifestTable.dropConstraint(spark, path, "v_pos")
    ManifestTable.merge(spark, path,
      Seq((9L, "a", -2.0)).toDF("id", "part", "v"), Seq("id"), "part")
    assert(ManifestTable.read(spark, path).where(col("v") < 0).count() == 1L)
  }

  test("the multi-table path enforces per-table constraints too") {
    import graft.ops.ManifestTable.TableMerge
    val base = java.nio.file.Files.createTempDirectory("graft_ck_many").toString
    val a = Seq((1L, "p", 5.0)).toDF("id", "part", "v")
    val b = Seq((1L, "p", 9.0)).toDF("id", "part", "w")
    ManifestTable.mergeMany(spark, base, Seq(
      TableMerge("ta", a, Seq("id"), "part"),
      TableMerge("tb", b, Seq("id"), "part")))
    ManifestTable.addConstraint(spark, s"$base/tb", "w_pos", "w > 0")
    val bad = Seq((2L, "p", -1.0)).toDF("id", "part", "w")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.mergeMany(spark, base, Seq(
        TableMerge("ta", Seq((2L, "p", 6.0)).toDF("id", "part", "v"),
          Seq("id"), "part"),
        TableMerge("tb", bad, Seq("id"), "part")))
    }
    assert(e.getMessage.contains("w_pos"))
    assert(ManifestTable.read(spark, s"$base/tb").count() == 1L,
      "tb's violating batch must not commit")
  }

  test("rename/drop of a constrained column refuses (the stale constraint " +
    "text would otherwise break every write, or validate a future column " +
    "of the old name); unconstrained columns still rename/drop") {
    val path = freshPath("rendrop")
    seed(path)
    ManifestTable.addConstraint(spark, path, "v_pos", "v > 0")
    val e1 = intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, path, "v", "val")
    }
    assert(e1.getMessage.contains("v_pos") &&
      e1.getMessage.contains("dropConstraint"))
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, path, "v")
    }
    assert(e2.getMessage.contains("v_pos"))
    // an UNreferenced column is free to move; case-insensitive match
    // mirrors the analyzer's resolver (constraint "V > 0" binds v)
    ManifestTable.renameColumn(spark, path, "id", "rid")
    assert(ManifestTable.read(spark, path).columns.contains("rid"))
    // after dropping the constraint, the rename goes through
    ManifestTable.dropConstraint(spark, path, "v_pos")
    ManifestTable.renameColumn(spark, path, "v", "val")
    assert(ManifestTable.read(spark, path).columns.contains("val"))
  }

  test("refusals and duplicates: duplicate name, unknown drop, bad name") {
    val path = freshPath("guards")
    seed(path)
    ManifestTable.addConstraint(spark, path, "c1", "id > 0")
    intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, path, "c1", "id > 1")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.dropConstraint(spark, path, "nope")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, path, "bad name", "id > 0")
    }
  }
}
