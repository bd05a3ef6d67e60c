package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FastRound

/** Bit-identity of the guarded fast round against Spark's BigDecimal
  * HALF_UP semantics — the property every oracle hash depends on. */
class FastRoundSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sparkRound(x: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  test("fast_round == BigDecimal HALF_UP on 2M random values across " +
    "scales 0/2/4/6, including adversarial near-half values") {
    val rng = new scala.util.Random(42)
    val scales = Seq(0, 2, 4, 6)
    var checked = 0L
    for (_ <- 0 until 500000) {
      // mix magnitudes: stats-sized, price-sized, tiny, huge
      val x = rng.nextInt(4) match {
        case 0 => rng.nextGaussian()
        case 1 => rng.nextDouble() * 200000.0 - 100000.0
        case 2 => rng.nextGaussian() * 1e-7
        case 3 => rng.nextGaussian() * 1e12
      }
      for (s <- scales) {
        val p = math.pow(10.0, s)
        assert(FastRound.compute(x, p, s) == sparkRound(x, s),
          s"mismatch at x=$x scale=$s")
        checked += 1
      }
    }
    // adversarial: values constructed to land ON or NEAR n + 0.5 at the
    // scale — these must take the exact path and still agree
    for (_ <- 0 until 100000) {
      val s = scales(rng.nextInt(4))
      val p = math.pow(10.0, s)
      val n = rng.nextInt(2000000) - 1000000
      val x = (n + 0.5) / p * (1.0 + (rng.nextInt(5) - 2) * 1e-16)
      assert(FastRound.compute(x, p, s) == sparkRound(x, s),
        s"near-half mismatch at x=$x scale=$s")
      checked += 1
    }
    // fixed edges
    for (s <- scales; x <- Seq(0.0, -0.0, 0.125, -0.125, 0.5, -0.5,
        1.0000005, -1.0000005, 4.5035996273704955e15, -4.6e15,
        Double.MaxValue, Double.MinPositiveValue)) {
      assert(FastRound.compute(x, math.pow(10.0, s), s) == sparkRound(x, s),
        s"edge mismatch at x=$x scale=$s")
      checked += 1
    }
    assert(FastRound.compute(Double.NaN, 1e6, 6).isNaN)
    assert(FastRound.compute(Double.PositiveInfinity, 1e6, 6)
      .isPosInfinity)
    assert(FastRound.compute(Double.NegativeInfinity, 1e6, 6)
      .isNegInfinity)
    assert(checked > 2000000L)
  }

  test("fast_round column ≡ Spark round column on real data, and the " +
    "SQL registration matches too") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select((col("l_extendedprice") * col("l_discount") +
        col("l_quantity") / lit(3.0)).cast("double").as("v"))
    GraftFunctions.register(spark)
    li.createOrReplaceTempView("fr_vals")
    val diff = spark.sql(
      """SELECT count(*) AS n FROM fr_vals
        |WHERE fast_round(v, 6) IS DISTINCT FROM round(v, 6)
        |   OR fast_round(v, 2) IS DISTINCT FROM round(v, 2)""".stripMargin)
      .collect()(0).getLong(0)
    assert(diff == 0L)
    val viaColumn = li.select(FastRound(col("v"), 4).as("a"),
      round(col("v"), 4).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(viaColumn == 0L)
  }
}
