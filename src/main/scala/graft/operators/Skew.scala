package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join split handles most cases at
  * runtime; explicit salting remains necessary when one join key is so
  * hot that even a split partition overwhelms a task (the classic
  * power-law entity in a 100 TB fact table).
  */
object Skew {

  /** Salted equi-join: the large side gets a deterministic salt derived
    * from its full row content (not rand(), so the plan stays
    * deterministic and retry-safe); the small side is replicated once per
    * salt. Result equals `large.join(small, Seq(key))` row-for-row; the
    * hot key's rows spread over `salts` reducers instead of one. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltedLarge = large.withColumn("__salt",
      F.pmod(F.xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
