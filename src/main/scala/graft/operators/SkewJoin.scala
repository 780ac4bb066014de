package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew-join split isn't enough (e.g. a single hot topic holding most of
  * a 100 TB offsets history).
  *
  * The skewed (big) side gets a random salt in [0, salt); the small side
  * is replicated `salt` times; the join key becomes (key, salt), spreading
  * one hot key over `salt` tasks. Semantics are identical to the plain
  * inner equi-join (verified in SkewJoinSpec).
  */
object SkewJoin {

  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
                      salt: Int = 16): DataFrame = {
    require(salt > 0)
    val saltedBig = big.withColumn("__salt",
      (abs(hash(monotonically_increasing_id())) % salt).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<int>")))
    saltedBig.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
