package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salted shuffle join — the standard remedy for a skewed fact key
  * when the dimension side is too large to broadcast: a hot key's rows
  * all land in ONE task under a plain hash join, so that task runs as
  * long as the key is hot regardless of cluster size.
  *
  * Mechanism: the fact side gets a DETERMINISTIC salt in [0, R) derived
  * from a caller-supplied per-row column (an id, never rand() — reruns
  * and retries must salt identically); the dimension side is exploded
  * into R replicas, one per salt value; the join key becomes
  * (key, salt), spreading each hot key over R tasks. Cost: the dim
  * shuffle grows R-fold — which is why R stays single-digit and the
  * fact (the 100 TB side) is untouched beyond one extra int column.
  * Results are exactly those of the unsalted join (the salt columns
  * join 1:1 by construction and are dropped), which is what the q145
  * oracle checks with a plain SQL join.
  *
  * AQE's skew-join handles sort-merge skew adaptively; explicit salting
  * remains the tool when the skew is known ahead of time, when the
  * engine picks a hash join, or when a downstream groupBy inherits the
  * same hot key. */
object Salted {

  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltSrc: Column, replicas: Int): DataFrame = {
    require(replicas > 0, "replicas must be positive")
    val salted = fact.withColumn("__salt",
      pmod(saltSrc, lit(replicas.toLong)).cast("int"))
    val rep = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(replicas - 1))))
    salted.join(rep.hint("shuffle_hash"),
        salted(factKey) === rep(dimKey) && salted("__salt") === rep("__salt"))
      .drop("__salt")
  }
}
