package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom expressions must be reachable from SQL text, not just the
  * Column API — registered via the same builders GraftExtensions injects
  * at session-build time.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions match the Column-API expressions") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  simhash64(array('a','b','c')) AS sh,
        |  minhash_sig(array('a','b'), 4) AS mh,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  round(cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS cs
        |""".stripMargin).head()
    import org.apache.spark.sql.graftshim.GraftShim
    import spark.implicits._
    val viaColumn = Seq(1).toDF("x").select(
      GraftShim.column(SimHash64(GraftShim.expression(
        array(lit("a"), lit("b"), lit("c"))))).as("sh"),
      GraftShim.column(MinHashSig(GraftShim.expression(
        array(lit("a"), lit("b"))), 4)).as("mh"),
      GraftShim.column(DotProduct(
        GraftShim.expression(array(lit(1.0), lit(2.0))),
        GraftShim.expression(array(lit(3.0), lit(4.0))))).as("dp"),
      round(GraftShim.column(CosineSimilarity(
        GraftShim.expression(array(lit(1.0), lit(0.0))),
        GraftShim.expression(array(lit(1.0), lit(0.0))))), 6).as("cs"))
      .head()
    assert(row.getLong(0) == viaColumn.getLong(0))
    assert(row.getSeq[Long](1) == viaColumn.getSeq[Long](1))
    assert(row.getDouble(2) == viaColumn.getDouble(2))
    assert(row.getDouble(3) == viaColumn.getDouble(3))
    assert(row.getDouble(2) == 11.0 && row.getDouble(3) == 1.0)
  }

  test("class-based extension injects the same function set") {
    // builder-time injection can't apply to the already-built shared
    // session; assert the extension wires every registered function
    val ids = GraftExtensions.functions.map(_._1.funcName).toSet
    assert(ids == Set("simhash64", "simhash_md5", "minhash_sig",
      "dot_product", "cosine_similarity", "freq_items_sketch",
      "cms_estimate"))
  }

  test("freq_items_sketch is callable from SQL and matches the Column path") {
    GraftExtensions.register(spark)
    import spark.implicits._
    (Seq.fill(9)("x") ++ Seq.fill(4)("y") ++ Seq("z")).toDF("t")
      .createOrReplaceTempView("freq_items_input")
    val viaSql = spark.sql(
      "SELECT freq_items_sketch(t, 8) FROM freq_items_input")
      .head().getMap[String, Long](0)
    assert(viaSql == Map("x" -> 9L, "y" -> 4L, "z" -> 1L))
  }

  test("simhash_md5 matches an independent reimplementation, bit for bit") {
    // reference: votes over the first 8 md5 digest bytes, big-endian —
    // written WITHOUT the expression's kernel so a kernel bug can't
    // self-certify
    def reference(tokens: Seq[String]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = Array.fill(64)(0)
      tokens.foreach { t =>
        val h = BigInt(1, md.digest(t.getBytes("UTF-8")).take(8))
        (0 until 64).foreach { b =>
          if (h.testBit(b)) votes(b) += 1 else votes(b) -= 1
        }
      }
      (0 until 64).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
    }
    GraftExtensions.register(spark)
    import spark.implicits._
    val docs = Seq("the quick brown fox", "a", "the the the unique",
      "päättäjäinen unicode ünïcodé", "x y z w v u t s r q p")
    val got = docs.toDF("text")
      .selectExpr("simhash_md5(split(trim(text), '\\\\s+')) AS h")
      .collect().map(_.getLong(0)).toSeq
    val want = docs.map(d => reference(d.trim.split("\\s+").toSeq))
    assert(got == want)
    // hex rendering used by q_simhash: 16 lowercase chars, zero-padded
    val hexed = docs.toDF("text")
      .select(graft.ops.TextOps.simHashMd5Hex(col("text")).as("h"))
      .collect().map(_.getString(0)).toSeq
    assert(hexed == want.map(w => f"$w%016x"))
  }

  test("RoundRoundFold collapses redundant re-rounding, preserving values") {
    GraftExtensions.register(spark)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val df = li.select(round(round(col("l_discount"), 1), 3).as("y"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("round\\(".r.findAllIn(optimized.toLowerCase).size == 1, optimized)
    val single = li.select(round(col("l_discount"), 1).as("y"))
    assert(df.collect().map(_.getDouble(0)).toSeq ==
      single.collect().map(_.getDouble(0)).toSeq)
    // tighter outer round must NOT fold
    val keep = li.select(round(round(col("l_discount"), 3), 1).as("y"))
    assert("round\\(".r.findAllIn(
      keep.queryExecution.optimizedPlan.toString.toLowerCase).size == 2)
    // decimals must NOT fold: Round's decimal result type (precision/
    // scale) is position-dependent, so the rewrite would change the
    // analyzed schema out from under the plan
    val dec = li.select(
      round(round(col("l_discount").cast("decimal(10,4)"), 1), 3).as("y"))
    assert("round\\(".r.findAllIn(
      dec.queryExecution.optimizedPlan.toString.toLowerCase).size == 2)
  }

  test("minhash_sig rejects a non-literal k with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), CAST(id AS INT)) FROM range(1)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }

  test("sketch builders reject wrong arity and non-integral parameters descriptively") {
    GraftExtensions.register(spark)
    // wrong arity: an analysis error naming the function, not a raw
    // IndexOutOfBoundsException
    val arity = intercept[Exception] {
      spark.sql("SELECT freq_items_sketch(t) FROM VALUES ('a') AS v(t)").collect()
    }
    assert(arity.getMessage.contains("freq_items_sketch expects 2 arguments"),
      arity.getMessage)
    // fractional capacity: must error, not silently truncate 3.9 -> 3
    val frac = intercept[Exception] {
      spark.sql("SELECT freq_items_sketch(t, 3.9) FROM VALUES ('a') AS v(t)").collect()
    }
    assert(frac.getMessage.contains("integer literal"), frac.getMessage)
    // non-positive capacity
    val neg = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), 0) FROM range(1)").collect()
    }
    assert(neg.getMessage.contains("must be in [1,"), neg.getMessage)
  }

  test("windowTopKRewrite conf gate disables the rewrite per-session") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"))))
      .filter(col("rn") <= 3)
    val plan = df.queryExecution.optimizedPlan
    val on = GraftRules.WindowTopKToAggregate(plan)
    assert(!on.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.Window]))
    spark.conf.set(GraftRules.WindowTopKToAggregate.EnabledKey, "false")
    try {
      val off = GraftRules.WindowTopKToAggregate(plan)
      assert(off.fastEquals(plan), "disabled rule must be the identity")
    } finally spark.conf.unset(GraftRules.WindowTopKToAggregate.EnabledKey)
  }
}

class CmsEstimateSpec extends SparkSpec {
  import spark.implicits._

  test("cms_estimate: exact on a small corpus, never undercounts, SQL-registered") {
    GraftExtensions.register(spark)
    // 1000 tokens over 50 distinct values — far under the sketch width,
    // so every estimate is exact
    val toks = (0 until 1000).map(i => s"tok_${i % 50}").toDF("t")
    toks.createOrReplaceTempView("cms_toks")
    val rows = spark.sql(
      """WITH sk AS (SELECT count_min_sketch(t, 0.001d, 0.99d, 42) AS s
        |            FROM cms_toks)
        |SELECT t, count(*) AS c, any_value(cms_estimate(s, t)) AS est
        |FROM cms_toks, sk GROUP BY t""".stripMargin).collect()
    assert(rows.length == 50)
    rows.foreach(r => assert(r.getLong(2) == r.getLong(1), r.toString))
    // bigint item path
    val lrow = spark.sql(
      """SELECT cms_estimate(count_min_sketch(x, 0.01d, 0.9d, 7), 3L) AS e
        |FROM (SELECT CAST(id % 5 AS BIGINT) AS x FROM range(100))""".stripMargin)
      .head()
    assert(lrow.getLong(0) == 20L)
  }

  test("cms_estimate: wrong arity fails at analysis with a descriptive error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT cms_estimate(CAST('x' AS BINARY))").collect())
    assert(e.getMessage.contains("2 arguments"), e.getMessage)
  }
}
