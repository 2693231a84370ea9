package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Split invariants: determinism, proportion accuracy, and the
  * leakage guarantee (near-dup clusters never straddle splits). */
class SplitSpec extends SparkTestBase {

  private val weights =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("hash split is deterministic and total") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    val a = Split.hashSplit(df, "id", weights).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Split.hashSplit(df, "id", weights).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(a.size === 1000)
  }

  test("proportions track the weights at 10k keys") {
    import spark.implicits._
    val counts = Split.hashSplit((0L until 10000L).toDF("id"), "id",
        weights)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 8000L) < 400,
      s"train=${counts("train")}")
    assert(math.abs(counts("val") - 1000L) < 200, s"val=${counts("val")}")
    assert(math.abs(counts("test") - 1000L) < 200,
      s"test=${counts("test")}")
  }

  test("cluster-aware split co-travels near-dup components") {
    import spark.implicits._
    val df = (1L to 6L).toDF("id")
    // components: {1,2,3} (chain), {5,6}; 4 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Split.clusterAwareSplit(df, "id", pairs, weights)
      .select("id", "root", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = got.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(1L)._1 === 1L && byId(2L)._1 === 1L && byId(3L)._1 === 1L)
    assert(byId(5L)._1 === 5L && byId(6L)._1 === 5L)
    assert(byId(4L)._1 === 4L)
    assert(Set(byId(1L)._2, byId(2L)._2, byId(3L)._2).size === 1,
      "component {1,2,3} straddles splits")
    assert(byId(5L)._2 === byId(6L)._2, "component {5,6} straddles splits")
  }

  test("stratified sample is nested: lowering a rate only removes " +
      "rows") {
    import spark.implicits._
    val df = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")
    def ids(rate: Double) = Split.stratifiedSample(df, "id", "lang",
        Map("en" -> rate)).select("id").collect()
      .map(_.getLong(0)).toSet
    val half = ids(0.5)
    val quarter = ids(0.25)
    assert(quarter.subsetOf(half))
    assert(ids(1.0).size === 2000)
    // de stratum untouched at every rate
    assert(half.count(_ % 2 == 1) === 1000)
    // en stratum lands near its rate
    assert(math.abs(half.count(_ % 2 == 0) - 500) < 100)
    assert(math.abs(quarter.count(_ % 2 == 0) - 250) < 80)
  }

  test("weights must sum to 1") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Split.hashSplit((0L to 1L).toDF("id"), "id",
        Seq("a" -> 0.5, "b" -> 0.4)).collect()
    }
  }

  test("weighted sample over-represents heavy rows and is " +
      "deterministic") {
    import spark.implicits._
    val df = (0L until 2000L).map(i =>
      (i, if (i < 1000L) 1.0 else 10.0)).toDF("id", "w")
    val a = Split.weightedSample(df, "id", "w", k = 300)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Split.weightedSample(df.repartition(7), "id", "w", k = 300)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b, "sample must be partitioning-independent")
    val heavy = a.count(_ >= 1000L)
    assert(heavy > 200,
      s"10x-weight rows should dominate a 300-sample, got $heavy")
    assert(a.size === 300)
  }

  test("weighted sample drops non-positive weights") {
    import spark.implicits._
    val df = Seq((1L, 0.0), (2L, -1.0), (3L, 5.0)).toDF("id", "w")
    val got = Split.weightedSample(df, "id", "w", k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(3L))
  }

  test("per-group cap keeps the first n by key and bounds every group") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"g${i % 3}"))
      .toDF("id", "grp")
    val got = Split.capPerGroup(df, "grp", "id", n = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.length === 15)
    val byGrp = got.groupBy(_._2)
    byGrp.foreach { case (g, rows) =>
      assert(rows.length === 5, s"group $g over cap")
      // first five ids of the group, ranks 1..5 in id order
      val expected = (0L until 100L).filter(i => s"g${i % 3}" == g).take(5)
      assert(rows.sortBy(_._3).map(_._1).toSeq === expected)
    }
  }

  test("temperature sample flattens strata toward sqrt proportions " +
      "and is nested in the target total") {
    import spark.implicits._
    val df = ((0L until 1600L).map(i => (i, "big")) ++
      (10000L until 10100L).map(i => (i, "small"))).toDF("id", "lang")
    // sqrt mixture: q_big = 40/50, q_small = 10/50; T=500 →
    // rate_big = 500*0.8/1600 = 0.25, rate_small = 500*0.2/100 = 1.0
    val kept = Split.temperatureSample(df, "id", "lang", 500L)
      .select("id").collect().map(_.getLong(0)).toSet
    val big = kept.count(_ < 1600L)
    val small = kept.count(_ >= 10000L)
    assert(small === 100, "under-represented stratum kept whole")
    assert(math.abs(big - 400) < 80,
      s"big stratum should land near rate 0.25 (400), got $big")
    // raising T only adds rows (bucket filter is monotone in rate)
    val more = Split.temperatureSample(df, "id", "lang", 800L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(more))
  }

  test("epochShuffle: contiguous positions, per-epoch permutations, " +
      "run determinism (r5)") {
    import spark.implicits._
    val df = (0L until 500L).toDF("id")
    def perm(epoch: Int): Seq[Long] =
      Split.epochShuffle(df, "id", epoch)
        .orderBy("position").select("id")
        .collect().map(_.getLong(0)).toSeq
    val e1 = perm(1)
    // a permutation with contiguous positions 0..n-1
    assert(e1.toSet === (0L until 500L).toSet)
    val pos = Split.epochShuffle(df, "id", 1)
      .select("position").collect().map(_.getLong(0)).sorted
    assert(pos === (0L until 500L).toArray)
    // deterministic across runs, different across epochs, shuffled
    assert(perm(1) === e1)
    assert(perm(2) !== e1)
    assert(e1 !== (0L until 500L).toSeq, "must not be identity order")
  }

  test("mixture plan: α=0.5 targets, epochs and rates match hand " +
      "math (exact-square strata)") {
    import spark.implicits._
    // strata token totals are perfect squares → √ is exact, no
    // truncation fuzz in the hand numbers: a=10000, b=100
    val rows = Seq.fill(2)(("a", 5000L)) ++ Seq(("b", 100L))
    val plan = Split.mixturePlan(rows.toDF("src", "n_tok"),
        "src", "n_tok", budgetTokens = 10100L)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    val a = plan("a"); val b = plan("b")
    assert(a.getAs[Long]("n_tokens") === 10000L)
    // weights 100 and 10 → targets 10/11 and 1/11
    assert(a.getAs[Double]("target_frac") === 100.0 / 110.0)
    assert(b.getAs[Double]("target_frac") === 10.0 / 110.0)
    // a is downsampled (epochs < 1), b upsampled (epochs > 1)
    assert(a.getAs[Double]("epochs") === 10100.0 * (100.0 / 110.0) / 10000.0)
    assert(b.getAs[Double]("epochs") === 10100.0 * (10.0 / 110.0) / 100.0)
    assert(a.getAs[Double]("sample_rate") < 1.0)
    assert(b.getAs[Double]("sample_rate") === 1.0)
    // the plan spends exactly the budget
    val spend = plan.values.map(_.getAs[Double]("need_tokens")).sum
    assert(math.abs(spend - 10100.0) < 1e-6)
  }

  test("sampleKPerGroup: exactly min(k, |group|) rows per group, " +
      "deterministic under repartition, stable as k grows (k=2 " +
      "sample is a subset of k=4)") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, s"g${i % 7}")).toSeq
      .toDF("id", "g")
    val s2 = Split.sampleKPerGroup(df, Seq("g"), "id", 2)
    val s4 = Split.sampleKPerGroup(df, Seq("g"), "id", 4)
    val by2 = s2.collect().groupBy(_.getString(1))
    assert(by2.size === 7 && by2.values.forall(_.length === 2))
    val set2 = s2.collect().map(_.getLong(0)).toSet
    val set4 = s4.collect().map(_.getLong(0)).toSet
    assert(set2.subsetOf(set4))
    val a = s2.orderBy("id").collect().map(_.toSeq).toSeq
    val b = Split.sampleKPerGroup(df.repartition(11), Seq("g"),
      "id", 2).orderBy("id").collect().map(_.toSeq).toSeq
    assert(a === b)
    // tiny group: returns the whole group, never errors
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "g")
    assert(Split.sampleKPerGroup(tiny, Seq("g"), "id", 5)
      .count() === 2L)
  }

  test("rendezvous shard: total, deterministic, weight-proportional") {
    import spark.implicits._
    val keys = (0L until 3000L).toDF("id")
    val shards = Seq("a" -> 2, "b" -> 1)
    val got = Split.rendezvousAssign(keys, "id", shards)
    val counts = got.groupBy("shard").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 3000L) // total: every key assigned
    // a holds 2 of 3 vnodes -> expect ~2000; loose 10% band
    assert(counts("a") > 1800L && counts("a") < 2200L, counts)
    // deterministic across partitionings
    val again = Split.rendezvousAssign(keys.repartition(7), "id", shards)
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(got.orderBy("id").collect().map(_.getString(1)).toSeq === again)
  }

  test("rendezvous shard: adding a shard only moves keys TO it " +
      "(minimal disruption)") {
    import spark.implicits._
    val keys = (0L until 2000L).toDF("id")
    val before = Split.rendezvousAssign(keys, "id",
        Seq("a" -> 1, "b" -> 1, "c" -> 1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Split.rendezvousAssign(keys, "id",
        Seq("a" -> 1, "b" -> 1, "c" -> 1, "d" -> 1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = before.keys.filter(k => before(k) != after(k))
    assert(moved.nonEmpty) // d won something
    assert(moved.forall(k => after(k) == "d"))
  }

  test("rendezvous shard: raising a weight only moves keys INTO " +
      "that shard") {
    import spark.implicits._
    val keys = (0L until 2000L).toDF("id")
    val before = Split.rendezvousAssign(keys, "id",
        Seq("a" -> 1, "b" -> 1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Split.rendezvousAssign(keys, "id",
        Seq("a" -> 2, "b" -> 1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = before.keys.filter(k => before(k) != after(k))
    assert(moved.nonEmpty)
    assert(moved.forall(k => after(k) == "a"))
  }
}
