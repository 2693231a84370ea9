package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order layout: Morton math against a bitwise reference, and the
  * pruning claim — a z-ordered layout touches fewer partitions for a
  * narrow single-dimension slice than an arrival-order layout. */
class LayoutSpec extends SparkTestBase {

  private def ref(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("morton2 matches the bitwise reference") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (12345L, 54321L), (65535L, 65535L))
    val got = pts.toDF("x", "y")
      .withColumn("z", Layout.morton2(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z === ref(x, y, 16),
      s"morton($x, $y)") }
  }

  test("widthBucket quantizes into [0, 2^bits) with hi in the top " +
      "bucket and a degenerate domain collapsing to 0") {
    import spark.implicits._
    val vals = Seq(0.0, 31.9, 32.0, 63.0, 64.0).toDF("v")
    val b = vals.select(Layout.widthBucket(col("v"), 0.0, 64.0, 2)
      .as("b")).as[Long].collect().toSeq
    assert(b === Seq(0L, 1L, 2L, 3L, 3L))
    val d = vals.select(Layout.widthBucket(col("v"), 5.0, 5.0, 2)
      .as("b")).as[Long].collect().toSeq
    assert(d.forall(_ === 0L))
  }

  test("zorderBy prunes a narrow x-slice to fewer partitions than " +
      "the row-striped arrival order") {
    import spark.implicits._
    val n = 64
    val grid = (for (y <- 0 until n; x <- 0 until n)
      yield (x, y, y * n + x)).toDF("x", "y", "arrival")

    def touched(df: org.apache.spark.sql.DataFrame): Long = df
      .groupBy(spark_partition_id().as("p"))
      .agg(min("x").as("lo"), max("x").as("hi"))
      .filter(col("lo") <= 13 && col("hi") >= 10) // slice x in [10,13]
      .count()

    val striped = grid.repartitionByRange(16, col("arrival"))
    val zed = Layout.zorderBy(grid, "x", "y", bits = 6, partitions = 16)
    val (ts, tz) = (touched(striped), touched(zed))
    assert(ts === 16L, s"row stripes must span x fully, got $ts")
    assert(tz * 2 <= ts, s"z-order touched $tz of $ts partitions")
  }

  test("hilbert2: consecutive curve positions are ALWAYS grid-" +
      "adjacent (the locality property the Z-curve lacks)") {
    import spark.implicits._
    val bits = 4 // 16×16 grid, exhaustive
    val cells = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield (x, y)).toDF("x", "y")
      .withColumn("d", Layout.hilbert2(col("x"), col("y"), bits))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    // a space-filling bijection over [0, 256)
    assert(cells.map(_._1).toSeq === (0L until 256L))
    cells.sliding(2).foreach { case Array((_, (x1, y1)), (d, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"curve jump at d=$d: ($x1,$y1)→($x2,$y2)")
    }
    // Morton, by contrast, jumps: count non-adjacent consecutive pairs
    val mcells = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield (x, y)).toDF("x", "y")
      .withColumn("d", Layout.morton2(col("x"), col("y"), bits))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    val mortonJumps = mcells.sliding(2).count {
      case Array((_, (x1, y1)), (_, (x2, y2))) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1L
    }
    assert(mortonJumps > 0, "expected the Z-curve to jump somewhere")
  }

  test("hilbertBy prunes the narrow x-slice at least as well as " +
      "arrival order striping") {
    import spark.implicits._
    val n = 64
    val grid = (for (y <- 0 until n; x <- 0 until n)
      yield (x, y, y * n + x)).toDF("x", "y", "arrival")
    def touched(df: org.apache.spark.sql.DataFrame): Long = df
      .groupBy(spark_partition_id().as("p"))
      .agg(min("x").as("lo"), max("x").as("hi"))
      .filter(col("lo") <= 13 && col("hi") >= 10)
      .count()
    val striped = grid.repartitionByRange(16, col("arrival"))
    val hil = Layout.hilbertBy(grid, "x", "y", bits = 6, partitions = 16)
    val (ts, th) = (touched(striped), touched(hil))
    assert(ts === 16L)
    assert(th * 2 <= ts, s"hilbert touched $th of $ts partitions")
  }
}
