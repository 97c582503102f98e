package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities beyond search (driver mandate;
  * SURVEY.md §7.5): pooling segment embeddings into group embeddings
  * (the chunk-embeddings → document-embedding step of a training
  * pipeline) and unit normalization.
  */
object Embeddings {

  /** Element-wise pooling sums per group, in 1e-7 fixed point:
    * (grpCol, pos, sum_e7, n_vecs). This is the mean-pool numerator/
    * denominator pair; divide downstream (or don't — attention-style
    * weighted pools want the parts).
    *
    * Shape: posexplode + hash aggregate with map-side combine — the
    * `Ivf.train` centroid shape; aggregate state is groups·dim cells,
    * never a collected vector list. Fixed point because float
    * addition is order-sensitive: a double SUM over an unordered
    * group is not deterministic across partitionings, while
    * `FLOOR(x·1e7)` BIGINT sums are exact in any order — the same
    * portability argument as q23/q29's averages. */
  def poolSumsE7(vecs: DataFrame, grpCol: String,
                 vecCol: String = "embedding"): DataFrame =
    vecs
      .select(col(grpCol), posexplode(col(vecCol)).as(Seq("pos", "__x")))
      .groupBy(col(grpCol), col("pos").cast("long").as("pos"))
      .agg(
        sum(floor(col("__x").cast("double") * lit(1e7))).as("sum_e7"),
        count(lit(1)).as("n_vecs"))

  /** Unit-normalized copy of a vector column (zero vectors pass
    * through unchanged rather than dividing by zero). After this,
    * cosine similarity degenerates to a plain dot product —
    * spec-checked within float tolerance. */
  def unitNorm(vec: Column): Column = {
    val norm = sqrt(aggregate(vec, lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(norm === 0.0d, vec)
      .otherwise(transform(vec, x => (x.cast("double") / norm).cast("float")))
  }
}
