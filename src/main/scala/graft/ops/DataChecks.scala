package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checks — the validation layer
  * every production pipeline runs before trusting a load (the
  * reference delegates this entirely to Postgres constraints:
  * PKs/FKs/NOT NULL in `sql/schema.sql:4-36`; a lake has no engine to
  * enforce them, so they become assertions over scans).
  *
  * Every check is ONE aggregate (or one anti-join + aggregate) and
  * reports exact integer evidence `(n_bad, n_total)` rather than a
  * bare boolean — at 100 TB you triage by violation count, and the
  * integers make the report engine-exact for cross-engine gates.
  * Checks return 1-row frames with a common schema
  * (check, n_bad, n_total, ok) so callers union them into one report
  * and write it next to the load.
  */
object DataChecks {

  /** Key uniqueness: n_bad = rows beyond the first per key (0 ⇒ the
    * columns form a candidate key). One hash aggregate + one scalar
    * aggregate; NULL keys group together like SQL GROUP BY. The sums
    * are coalesced to 0: an empty table trivially satisfies the key
    * constraint, and a bare SUM over zero groups is NULL — which
    * would make `ok` NULL and silently drop the row from BOTH
    * `filter(ok)` and `filter(!ok)` consumers (neither pass nor
    * fail). Empty input reports (0, 0, true) like the other checks. */
  def uniqueness(df: DataFrame, cols: Seq[String], name: String): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(lit(name).as("check"),
        coalesce(sum(col("__n") - 1), lit(0L)).cast("long").as("n_bad"),
        coalesce(sum(col("__n")), lit(0L)).cast("long").as("n_total"))
      .withColumn("ok", col("n_bad") === 0)

  /** Completeness: n_bad = NULL rows in `c`. */
  def completeness(df: DataFrame, c: String, name: String): DataFrame =
    df.agg(lit(name).as("check"),
      count(when(col(c).isNull, 1)).as("n_bad"),
      count(lit(1)).as("n_total"))
      .withColumn("ok", col("n_bad") === 0)

  /** Referential integrity: n_bad = child rows whose key has no match
    * in `parent` (NULL child keys are orphans too — a lake FK can't
    * be satisfied by an absent key). Left-anti join on the key — at
    * scale the parent key column broadcasts or bloom-prunes. Fully
    * lazy: the orphan count and the total are two 1-row aggregates
    * combined by a trivial broadcast cross join, no driver action. */
  def referential(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String, name: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("__bad"))
      .crossJoin(child.agg(count(lit(1)).as("__tot")))
      .select(lit(name).as("check"), col("__bad").as("n_bad"), col("__tot").as("n_total"))
      .withColumn("ok", col("n_bad") === 0)

  /** Range/predicate conformance: n_bad = rows FAILING `pred` (null
    * predicate results count as failures — unknown is not conforming). */
  def satisfies(df: DataFrame, pred: org.apache.spark.sql.Column, name: String): DataFrame =
    df.agg(lit(name).as("check"),
      (count(lit(1)) - count(when(pred, 1))).as("n_bad"),
      count(lit(1)).as("n_total"))
      .withColumn("ok", col("n_bad") === 0)

  /** A [[enforce]] split: rows passing every rule, and quarantined
    * rows carrying the names of ALL the rules they failed. */
  final case class Enforced(clean: DataFrame, quarantined: DataFrame)

  /** WRITE-TIME expectation enforcement (the Delta-Live-Tables shape,
    * next to this object's read-side report checks): each rule is a
    * PASS predicate; a row where a rule evaluates false OR NULL fails
    * it (a null value cannot be asserted in-range — fail-closed, the
    * only safe default for a gate guarding a table). Failing rows
    * quarantine with every failed rule named — countable, routable,
    * re-processable — never silently dropped (the q102
    * corrupt-record-routing posture applied to semantic rules). One
    * map-only pass; the split is two filters over the same tagged
    * plan. */
  def enforce(df: DataFrame, rules: Seq[(String, Column)]): Enforced = {
    require(rules.nonEmpty, "DataChecks.enforce: no rules")
    val names = rules.map(_._1)
    require(names.distinct.size == names.size,
      s"DataChecks.enforce: duplicate rule names in ${names.mkString(", ")}")
    val failed = rules.map { case (n, pass) =>
      when(coalesce(pass, lit(false)), lit(null).cast("string")).otherwise(lit(n))
    }
    val tagged = df.withColumn("__viol", array_compact(array(failed: _*)))
    Enforced(
      clean = tagged.filter(size(col("__viol")) === 0).drop("__viol"),
      quarantined = tagged.filter(size(col("__viol")) > 0)
        .withColumnRenamed("__viol", "violated"))
  }
}
