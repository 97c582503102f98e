package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (one-JSON-object-per-line) parsing with corrupt-record
  * routing — the shape raw web-scrape / dump corpora actually arrive
  * in: TB of `.jsonl` shards where some lines are truncated by the
  * producer, interleaved with non-JSON noise, or schema-drifted, and
  * a parse that dies (or silently drops) on the first bad line is
  * useless at scale.
  *
  * [[parseLines]] wraps Spark's own Jackson path (`from_json` — the
  * SAME parser the `spark.read.json` file source runs per line) in
  * PERMISSIVE mode with an explicit corrupt-record column: a
  * malformed line yields a row with every data field null, the raw
  * line preserved under `corruptCol`, and `is_corrupt` = true, so
  * bad records are ROUTED — countable, quarantinable, re-parsable —
  * never dropped. The boolean exists because the raw-line column
  * alone cannot classify a NULL input line (nothing to preserve,
  * still not a good row). The explicit caller schema is the 100 TB
  * posture: schema inference is a full extra pass over the corpus
  * before the real one, and inferred schemas drift shard-to-shard; a
  * declared schema makes the parse single-pass and the output shape
  * a contract. Map-only, codegen'd, no shuffle — parsing
  * parallelizes with the scan. */
object Jsonl {

  /** Parse a one-column frame of JSONL lines under `schema` (which
    * must NOT itself contain `corruptCol`). Output columns: the
    * schema's fields, then `corruptCol` (the raw line for malformed
    * input, null otherwise) and `is_corrupt`. */
  def parseLines(lines: DataFrame, lineCol: String, schema: StructType,
                 corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already contains $corruptCol — pass a data-only schema")
    val full = schema.add(corruptCol, "string")
    val parsed = lines.withColumn("__r",
      from_json(col(lineCol), full,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)))
    // PERMISSIVE from_json carries a malformed line's raw text in
    // corruptCol — but returns a NULL STRUCT for null input and for
    // degenerate lines (empty/whitespace) on some parser paths, so
    // both routing and preservation must treat a null struct over a
    // non-null line as "malformed, raw line = the input".
    val raw0 = col(s"__r.`$corruptCol`")
    val raw = when(col("__r").isNull, col(lineCol)).otherwise(raw0)
    val dataCols = schema.fieldNames.map(f => col(s"__r.`$f`").as(f))
    parsed.select(dataCols
      :+ raw.as(corruptCol)
      :+ (col(lineCol).isNull || col("__r").isNull || raw0.isNotNull)
        .as("is_corrupt"): _*)
  }

  /** Per-parse health report: (n_lines, n_good, n_corrupt) — the
    * numbers an ingest job alerts on. One map-side-combinable
    * aggregate. */
  def parseStats(parsed: DataFrame): DataFrame =
    parsed.agg(
      count(lit(1)).as("n_lines"),
      sum(when(!col("is_corrupt"), 1L).otherwise(0L)).as("n_good"),
      sum(when(col("is_corrupt"), 1L).otherwise(0L)).as("n_corrupt"))

  /** DETERMINISTIC SHARDED JSONL EXPORT — the delivery end of the
    * pipeline: the corpus leaves as `shard=NN/` directories of
    * one-JSON-object-per-line text, globally shuffled and sharded by
    * [[graft.ext.Curate.shuffleShards]] (seeded md5 assignment + an
    * independent seeded within-shard order), so the SAME corpus and
    * seed produce byte-identical shards on any cluster size — the
    * property that makes a training run repeatable and resumable.
    * Rows are written in `shard_pos` order (one repartition + a
    * within-partition sort; never a global sort). An `_index`
    * directory (ignored by Spark readers — underscore prefix)
    * records each shard's row count and first/last ids, the sidecar
    * a training loader checks before streaming; the same frame is
    * returned. `df`'s columns become the JSON fields in order. */
  def writeShards(df: DataFrame, outDir: String, n: Int, seed: String,
                  idCol: String = "doc_id"): DataFrame = {
    val cols = df.columns.toSeq
    val sharded = graft.ext.Curate.shuffleShards(df, n, seed, idCol)
    sharded
      .select(col("shard"), col("shard_pos"),
        to_json(struct(cols.map(col): _*)).as("value"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .select(col("shard"), col("value"))
      .write.partitionBy("shard").text(outDir)
    val idx = sharded.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min_by(col(idCol), col("shard_pos")).as("first_id"),
        max_by(col(idCol), col("shard_pos")).as("last_id"))
    idx.coalesce(1).write.mode("overwrite").json(s"$outDir/_index")
    idx
  }
}
