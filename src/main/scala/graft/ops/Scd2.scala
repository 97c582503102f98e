package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD TYPE-2 DIMENSION WRITER — the history-maintaining counterpart
  * of [[Ops.scd2Join]] (which only QUERIES an existing version table):
  * fold dimension snapshots into a half-open `[valid_from, valid_to)`
  * version history, Kimball-style.
  *
  * Per [[applyBatch]] with a snapshot effective at `effectiveTs`:
  *   - a key absent from the open history INSERTS `[eff, openEnd)`;
  *   - a key whose open row carries DIFFERENT attributes CLOSES it
  *     (`valid_to := eff`) and inserts the new version;
  *   - an identical row is untouched (no spurious versions — the
  *     comparison is null-safe across every attribute);
  *   - keys absent from the batch are untouched (the batch is a
  *     delta/partial snapshot; deletes are modeled as an explicit
  *     attribute, the usual SCD2 convention).
  *
  * The effective timestamp must advance monotonically per key; a
  * violation (closing a version before it opened) is refused IN-PLAN
  * with `raise_error` — a zero/negative interval would silently
  * vanish from every as-of join. One keyed exchange per batch;
  * closed history rows stream through untouched. Works as a plain
  * frame fold (gated q145) or against a [[ManifestTable]] bucket
  * layout like any other frame.
  */
object Scd2 {

  /** The open-row sentinel (exclusive upper bound "forever"; kept inside the int64-NANOSECOND timestamp range — 9999-12-31 overflows ns-based readers like Arrow/pandas). */
  val OpenEnd: java.sql.Timestamp = java.sql.Timestamp.valueOf("2100-01-01 00:00:00")

  /** An empty history frame shaped for `batch` — the fold's seed. */
  def emptyHistory(batch: DataFrame, fromCol: String = "valid_from",
                   toCol: String = "valid_to"): DataFrame =
    batch.limit(0)
      .withColumn(fromCol, lit(OpenEnd))
      .withColumn(toCol, lit(OpenEnd))

  /** Fold one snapshot (effective at `effectiveTs`) into `history`. */
  def applyBatch(history: DataFrame, batch: DataFrame, keys: Seq[String],
                 effectiveTs: java.sql.Timestamp,
                 fromCol: String = "valid_from", toCol: String = "valid_to"): DataFrame = {
    require(keys.nonEmpty, "Scd2.applyBatch: no key columns")
    val attrs = batch.columns.filterNot(keys.contains).toSeq
    require(attrs.nonEmpty, "Scd2.applyBatch: batch has no attribute columns")
    val expected = (batch.columns.toSeq ++ Seq(fromCol, toCol)).sorted
    require(history.columns.toSeq.sorted == expected,
      s"Scd2.applyBatch: history columns ${history.columns.sorted.mkString(",")} != " +
        s"batch + [$fromCol, $toCol]")
    // A batch carrying a key twice would fan the keyed join out into
    // parallel version chains — refuse like mergeInto does.
    ManifestTable.requireUniqueKeys(batch, keys, "Scd2.applyBatch batch")
    val eff = lit(effectiveTs)
    val open = history.filter(col(toCol) === lit(OpenEnd))
    val closedRows = history.filter(col(toCol) =!= lit(OpenEnd))
    val o = open.select(keys.map(col) ++ Seq(
      struct(attrs.map(col): _*).as("__oa"), col(fromCol).as("__of"),
      lit(true).as("__oe")): _*)
    val b = batch.select(keys.map(col) ++ Seq(
      struct(attrs.map(col): _*).as("__ba"), lit(true).as("__be")): _*)
    val j = o.join(b, keys, "full_outer")
    val changed = col("__oe").isNotNull && col("__be").isNotNull &&
      !(col("__oa") <=> col("__ba"))
    // Monotonicity guard: closing a version at or before its own
    // valid_from would create an empty/negative interval — refuse
    // loudly in-plan rather than emit a row no as-of join can see.
    val guardedEff = when(changed && col("__of") >= eff,
      raise_error(concat(lit("Scd2.applyBatch: effectiveTs "), eff.cast("string"),
        lit(" does not advance past open valid_from "), col("__of").cast("string"))))
      .otherwise(eff)
    // keep-open: the surviving open row (old when unchanged/absent
    //            from batch, new when inserted or version-bumped)
    // close:     the old version with valid_to = eff (changed keys)
    val keepOpen = when(col("__oe").isNull,
        struct(col("__ba").as("a"), eff.as("f")))            // brand-new key
      .when(changed, struct(col("__ba").as("a"), guardedEff.as("f"))) // new version
      .otherwise(struct(col("__oa").as("a"), col("__of").as("f")))    // unchanged
    val close = when(changed,
      struct(col("__oa").as("a"), col("__of").as("f")))
    j.select(keys.map(col) :+
        explode(array(
          struct(keepOpen.getField("a").as("a"), keepOpen.getField("f").as("f"),
            lit(OpenEnd).as("t")),
          when(changed, struct(close.getField("a").as("a"), close.getField("f").as("f"),
            guardedEff.as("t"))))).as("__v"): _*)
      .filter(col("__v").isNotNull)
      .select(keys.map(col) ++ attrs.map(a => col(s"__v.a.$a").as(a)) ++ Seq(
        col("__v.f").as(fromCol), col("__v.t").as(toCol)): _*)
      .unionByName(closedRows.select(
        (keys ++ attrs ++ Seq(fromCol, toCol)).map(col): _*))
  }
}
