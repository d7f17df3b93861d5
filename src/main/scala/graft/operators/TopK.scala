package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.min_k

/** Group-wise top-k with BOUNDED aggregation state — the form
  * per-group ranking must take at 100 TB. The window-rank idiom
  * (`row_number over (partition by g order by v desc) <= k`) sorts
  * every group's full row set; this operator instead packs the
  * (value desc, key asc) order isomorphically into one long and runs
  * [[graft.expressions.MinKAgg]], whose partial state is k longs per
  * group per task with map-side combine — the shuffle moves
  * k * |groups| * |tasks| longs however many rows exist, and no
  * per-group sort ever materializes. The rank window runs over the
  * k * |groups| unpacked rows only.
  *
  * Packing contract (caller-checked by require):
  * - key in [0, 2^32): rides the low 32 bits
  * - value in (-2^22, 2^22]: biased by 2^23 total offset (2 * Bias,
  *   Bias = 1L << 22) into the high bits, so ascending packed order
  *   == (value desc, key asc)
  * Decode is integer shifts — packed longs pass 2^53, a double divide
  * would corrupt them.
  */
object TopK {

  private val Bias = 1L << 22

  /** Top-k rows per group by `value` descending, key ascending on
    * ties. Output: (groupCol, rk, key, value). */
  def topK(df: DataFrame, group: String, key: String, value: String,
      k: Int): DataFrame = {
    // out-of-range inputs fail LOUDLY — silently dropping rows would
    // corrupt the ranking
    val enc0 = (lit(2 * Bias) - col(value)) * lit(1L << 32) + col(key)
    val enc = when(col(key) >= 0 && col(key) < (1L << 32) &&
        col(value) > -Bias && col(value) <= Bias, enc0)
      .otherwise(raise_error(concat(lit("TopK packing bounds violated: key="),
        col(key).cast("string"), lit(" value="), col(value).cast("string"))))
    df.groupBy(col(group)).agg(min_k(enc, k).as("__top"))
      .select(col(group), posexplode(col("__top")).as(Seq("__pos", "__v")))
      .select(col(group), (col("__pos") + 1).cast("long").as("rk"),
        pmod(col("__v"), lit(1L << 32)).as(key),
        (lit(2 * Bias) - shiftrightunsigned(col("__v"), 32)).as(value))
  }
}
