package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (builder-prompt scale mandate): salted joins for hot
  * keys that AQE's skew-join split can't fix (e.g. when the skewed side
  * must shuffle anyway, or the build side is just over the broadcast
  * threshold).
  *
  * Shape: the skewed (probe) side gets a random salt in [0, factor); the
  * small/replicated side is exploded `factor`× with every salt value;
  * the join key becomes (key, salt) so one hot key spreads over `factor`
  * reducers. Row multiplicity is unchanged — each probe row matches
  * exactly the one replica carrying its salt.
  */
object Skew {

  /** Join types that preserve multiplicity under replication: ones where
    * unmatched REPLICATED-side rows never surface. A right/full outer
    * join would emit `factor` null-extended copies of every unmatched
    * replica.
    */
  private val safeJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")

  def saltedJoin(skewed: DataFrame, replicated: DataFrame, key: String,
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    require(safeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin: '$joinType' would duplicate unmatched replicated-side " +
        s"rows ${factor}x; only inner/left/semi/anti joins are salt-safe")
    val salted = skewed.withColumn("__salt",
      (rand(42) * factor).cast("int"))
    val expanded = replicated.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(expanded, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
