package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin rejects replicated-side-preserving join types") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "y")).toDF("k", "w")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(a, b, "k", 4, "full_outer")
    }
    assert(e.getMessage.contains("salt-safe"))
  }
  import spark.implicits._

  test("saltedJoin result is identical to the plain join (multiplicity preserved)") {
    val skewed = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v") // key 1 is hot (100 rows)
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (77L, "c")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).groupBy("name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("name").collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", factor = 4).groupBy("name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("name").collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin left join keeps unmatched probe rows") {
    val probe = Seq((1L, "x"), (9L, "y")).toDF("k", "v")
    val dim = Seq((1L, "one")).toDF("k", "name")
    val got = Skew.saltedJoin(probe, dim, "k", factor = 3, joinType = "left")
      .orderBy("k").collect()
    assert(got.length == 2)
    assert(got(1).isNullAt(2)) // unmatched keeps null name
  }
}
