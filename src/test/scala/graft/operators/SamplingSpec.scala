package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val ids = (1L to 10000L).toDF("id")

  test("thresholdHex: fraction edges and known values") {
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(0.5) == "80000000")
    assert(Sampling.thresholdHex(0.8) == "cccccccc")
    assert(Sampling.thresholdHex(1.0) == "g") // above every hex digit: keeps all
    intercept[IllegalArgumentException](Sampling.thresholdHex(-0.1))
  }

  test("hashSample: deterministic, close to the requested fraction, stable") {
    val a = Sampling.hashSample(ids, Seq("id"), 0.2)
    val n = a.count()
    assert(math.abs(n - 2000L) < 200, s"20% of 10k should be ~2000, got $n")
    // determinism: same rows on every evaluation
    assert(a.agg(sum("id")).head().getLong(0) ==
      Sampling.hashSample(ids, Seq("id"), 0.2).agg(sum("id")).head().getLong(0))
    // monotone: a smaller fraction is a SUBSET of a larger one
    val small = Sampling.hashSample(ids, Seq("id"), 0.1)
    assert(small.join(a, Seq("id"), "left_anti").count() == 0)
    // fraction 1.0 keeps everything
    assert(Sampling.hashSample(ids, Seq("id"), 1.0).count() == 10000)
  }

  test("deterministicSplit: disjoint, exhaustive, near the weights") {
    val s = Sampling.deterministicSplit(ids, Seq("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 10000, "every row assigned exactly once")
    assert(math.abs(counts("train") - 8000L) < 300)
    assert(math.abs(counts("val") - 1000L) < 150)
    // weights normalize: 8/1/1 == 0.8/0.1/0.1
    val s2 = Sampling.deterministicSplit(ids, Seq("id"),
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
    assert(s2.filter(col("split") === "train").count() == counts("train"))
  }

  test("split assignment is a pure function of the key (row content irrelevant)") {
    val withPayload = ids.withColumn("payload", rand())
    val a = Sampling.deterministicSplit(ids, Seq("id"), Seq("x" -> 0.5, "y" -> 0.5))
    val b = Sampling.deterministicSplit(withPayload, Seq("id"), Seq("x" -> 0.5, "y" -> 0.5))
    assert(a.select("id", "split").except(b.select("id", "split")).count() == 0)
  }

  test("capPerGroup: at most n per group, deterministic, subset-stable") {
    val df = (1L to 1000L).map(i => (i, s"g${i % 7}")).toDF("id", "grp")
    val capped = Sampling.capPerGroup(df, Seq("grp"), Seq("id"), 20)
    val counts = capped.groupBy("grp").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 20L), "every group has > 20 rows, so all cap at exactly 20")
    // small groups pass through whole
    val small = Sampling.capPerGroup(df.filter(col("id") <= 5), Seq("grp"), Seq("id"), 20)
    assert(small.count() == 5)
    // determinism: same survivors every run
    assert(capped.agg(sum("id")).head().getLong(0) ==
      Sampling.capPerGroup(df, Seq("grp"), Seq("id"), 20).agg(sum("id")).head().getLong(0))
    // a larger cap keeps a SUPERSET of a smaller cap's survivors
    val cap10 = Sampling.capPerGroup(df, Seq("grp"), Seq("id"), 10)
    assert(cap10.join(capped, Seq("id"), "left_anti").count() == 0)
  }

  test("sampleFractionPerGroup: exact ceil proportions, tiny strata keep a row") {
    val df = ((1L to 10L).map(i => (i, "big")) ++
      (11L to 14L).map(i => (i, "mid")) ++
      Seq((15L, "solo"))).toDF("id", "grp")
    val got = Sampling.sampleFractionPerGroup(df, Seq("grp"), Seq("id"), 0.5)
    val by = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by === Map("big" -> 5L, "mid" -> 2L, "solo" -> 1L))
    // determinism + monotonicity: a larger fraction keeps a superset
    val half2 = Sampling.sampleFractionPerGroup(df, Seq("grp"), Seq("id"), 0.5)
    assert(got.select("id").except(half2.select("id")).count() === 0)
    val most = Sampling.sampleFractionPerGroup(df, Seq("grp"), Seq("id"), 0.8)
    assert(got.join(most, Seq("id"), "left_anti").count() === 0)
    // fraction 1.0 keeps everything
    assert(Sampling.sampleFractionPerGroup(df, Seq("grp"), Seq("id"), 1.0)
      .count() === 15L)
  }

  test("mixSources: per-source fractions, unknown sources dropped") {
    val df = (1L to 3000L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val mixed = Sampling.mixSources(df, "src", Seq("id"),
      Map("src0" -> 1.0, "src1" -> 0.25))
    val by = mixed.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by.getOrElse("src2", 0L) == 0L, "unlisted source must be dropped")
    assert(by("src0") == 1000L, "fraction 1.0 keeps every row")
    assert(math.abs(by("src1") - 250L) < 80)
  }

  test("shuffleOrder: a reproducible permutation — total, uniform, key-pure") {
    val df = ids // 1..10000
    val a = Sampling.shuffleOrder(df, Seq("id"))
    // (shard, pos) is a total order: all 10000 assignments distinct
    assert(a.select("shard", "pos").distinct().count() == 10000)
    assert(a.count() == 10000)
    // shards span 0..255 and are roughly uniform
    val shardCounts = a.groupBy("shard").count().collect()
    assert(shardCounts.length == 256)
    assert(shardCounts.map(_.getLong(1)).max < 100, "256-way md5 sharding of 10k ~ 39/shard")
    // pos is 1..n contiguous within each shard
    val bad = a.groupBy("shard").agg(
      min(col("pos")).as("lo"), max(col("pos")).as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(bad.count() == 0)
    // pure function of the key: payload content and row order are irrelevant
    val shuffledInput = Sampling.shuffleOrder(
      df.orderBy(rand(7)).withColumn("noise", rand(13)), Seq("id"))
    assert(a.select("id", "shard", "pos")
      .except(shuffledInput.select("id", "shard", "pos")).count() == 0)
  }

  test("upsampleSources: integer weights copy exactly, fractions sample, unknown drops") {
    val df = (1L to 400L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    def run() = Sampling.upsampleSources(df, "src", Seq("id"),
      Map("s0" -> 2.0, "s1" -> 0.5, "s2" -> 1.25)) // s3 unweighted -> dropped
    val out = run()
    val by = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(by("s0") === 200L) // 100 rows x exactly 2
    assert(!by.contains("s3"))
    assert(by("s1") > 20 && by("s1") < 80) // ~50 expected, deterministic
    assert(by("s2") > 100 && by("s2") < 150) // every row once + ~25 extra
    // epoch indexes: s0 rows carry copies 0 and 1; s2 extras carry epoch 1
    val s0Epochs = out.filter($"src" === "s0").select("epoch")
      .as[Int].collect().toSet
    assert(s0Epochs === Set(0, 1))
    val s2Max = out.filter($"src" === "s2").groupBy()
      .max("epoch").as[Int].head()
    assert(s2Max === 1)
    // fully deterministic under re-run
    assert(out.collect().toSet === run().collect().toSet)
  }

  test("temperatureWeights: exact closed forms at alpha 0 and 1, smooth between") {
    val df = ((1L to 40L).map(i => (i, "big")) ++ (41L to 50L).map(i => (i, "small")))
      .toDF("id", "src")
    // alpha = 1: natural proportions -> one uniform rate
    val w1 = Sampling.temperatureWeights(df, "src", alpha = 1.0, targetRows = 25L)
    assert(w1 === Map("big" -> 0.5, "small" -> 0.5))
    // alpha = 0: equal budget per source -> small source upweighted
    val w0 = Sampling.temperatureWeights(df, "src", alpha = 0.0, targetRows = 20L)
    assert(w0 === Map("big" -> 10.0 / 40.0, "small" -> 10.0 / 10.0))
    // 0 < alpha < 1 rebalances monotonically: small's weight between its
    // alpha=1 and alpha=0 values, and expected totals still sum to target
    val wh = Sampling.temperatureWeights(df, "src", alpha = 0.5, targetRows = 20L)
    assert(wh("small") > wh("big"))
    assert(wh("small") < w0("small") * 2 && wh("small") > 0.4)
    val expected = 40.0 * wh("big") + 10.0 * wh("small")
    assert(math.abs(expected - 20.0) < 1e-9)
  }

  test("mixByTemperature: whole-weight copies exact, fractional deterministic") {
    val df = ((1L to 40L).map(i => (i, "big")) ++ (41L to 50L).map(i => (i, "small")))
      .toDF("id", "src")
    def run() = Sampling.mixByTemperature(df, "src", Seq("id"),
      alpha = 0.0, targetRows = 20L)
    val out = run()
    val by = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(by("small") === 10L) // weight exactly 1.0: every row once
    assert(by("big") > 2 && by("big") < 18) // rate 0.25, deterministic subset
    assert(out.collect().toSet === run().collect().toSet)
  }

  test("takeByBudget keeps the exact global prefix in priority order") {
    val df = (1L to 100L).map(i => (i, 10L + i % 7, i % 13)).toDF("id", "cost", "prio")
    val got = Sampling.takeByBudget(df, "cost", 300L,
      Seq(col("prio").desc, col("id").asc))
    assert(got.columns.toSeq === Seq("id", "cost", "prio", "cum_cost"))
    val gotMap = got.select("id", "cum_cost").as[(Long, Long)].collect().toMap
    // driver-side replay of the same total order
    var cum = 0L
    val expect = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, p) => (-p, id) }
      .flatMap { case (id, c, _) =>
        cum += c; if (cum <= 300L) Some(id -> cum) else None
      }.toMap
    assert(gotMap === expect)
    assert(expect.nonEmpty && expect.size < 100)
  }

  test("takeByBudget boundary and degenerate budgets") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("id", "cost")
    // budget exactly on a row boundary: that row is kept (inclusive <=)
    val exact = Sampling.takeByBudget(df, "cost", 10L, Seq(col("id").asc))
      .select("id").as[Long].collect().toSet
    assert(exact === Set(1L, 2L))
    assert(Sampling.takeByBudget(df, "cost", 0L, Seq(col("id").asc)).count() === 0)
    // budget beyond the total keeps everything, cum_cost is the global sum
    val all = Sampling.takeByBudget(df, "cost", 1000L, Seq(col("id").asc))
      .select("id", "cum_cost").as[(Long, Long)].collect().toMap
    assert(all === Map(1L -> 5L, 2L -> 10L, 3L -> 15L))
  }

  test("takeByBudget fuzz: random data and budgets match the driver-side prefix") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(300)
      val rows = (1L to n).map(i =>
        (i, rnd.nextInt(20).toLong, rnd.nextInt(10).toLong))
      val total = rows.map(_._2).sum
      val budget = trial match {
        case 1 => 0L
        case 2 => total // everything
        case _ => rnd.nextLong(total + 2)
      }
      val df = rows.toDF("id", "cost", "prio")
      val got = Sampling.takeByBudget(df, "cost", budget,
        Seq(col("prio").asc, col("id").desc))
        .select("id", "cum_cost").as[(Long, Long)].collect().toMap
      var cum = 0L
      val expect = rows.sortBy { case (id, _, p) => (p, -id) }
        .flatMap { case (id, c, _) =>
          cum += c; if (cum <= budget) Some(id -> cum) else None
        }.toMap
      assert(got === expect, s"trial $trial n=$n budget=$budget")
    }
  }

  test("takeByBudget on an empty input returns an empty frame with the out column") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "cost")
    val got = Sampling.takeByBudget(empty, "cost", 100L, Seq(col("id").asc))
    assert(got.columns.toSeq === Seq("id", "cost", "cum_cost"))
    assert(got.count() === 0)
  }

  test("takeByBudget rejects negative costs loudly") {
    val df = Seq((1L, 5L), (2L, -1L)).toDF("id", "cost")
    val e = intercept[Exception] {
      Sampling.takeByBudget(df, "cost", 10L, Seq(col("id").asc)).count()
    }
    def rootChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(rootChain(e).exists(m => m != null && m.contains("non-negative")))
  }

  test("takeByBudget rejects null costs loudly (no silent free rides)") {
    val df = Seq((1L, java.lang.Long.valueOf(5L)), (2L, null: java.lang.Long))
      .toDF("id", "cost")
    val e = intercept[Exception] {
      Sampling.takeByBudget(df, "cost", 10L, Seq(col("id").asc)).count()
    }
    def rootChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(rootChain(e).exists(m => m != null && m.contains("non-null")))
  }

  test("splitLeakageSafe: a near-dup family never straddles the split") {
    import spark.implicits._
    // three exact-dup families + singletons with mutually disjoint words
    val docs = (0L until 30L).map { i =>
      val fam = i % 10
      val text =
        if (fam < 3) s"family$fam alpha$fam beta$fam gamma$fam delta$fam " * 3
        else s"solo$i-${"x" * (i.toInt % 5)} w1-$i w2-$i w3-$i w4-$i w5-$i"
      (i, text.trim)
    }.toDF("doc_id", "text")
    val split = Sampling.splitLeakageSafe(docs, "doc_id", "text",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split.size === 30)
    // families {0,10,20},{1,11,21},{2,12,22} each land on ONE side
    (0L until 3L).foreach { f =>
      assert(Set(split(f), split(f + 10), split(f + 20)).size === 1,
        s"family $f straddles the split")
    }
    // singletons split exactly as the plain doc-keyed split would
    val plain = Sampling.deterministicSplit(
        docs.filter(col("doc_id") >= 3 && col("doc_id") % 10 >= 3),
        Seq("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    plain.foreach { case (id, s) => assert(split(id) === s, s"singleton $id") }
  }

  test("mineContrastiveTriplets: cluster positives, ring negatives, exclusions") {
    // two exact-dup clusters {1,2,3} and {10,11}; 20 singleton docs for
    // ring mass (no positives → no triplets of their own)
    val corpus = (Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "alpha beta gamma delta epsilon"),
      (10L, "omega psi chi phi upsilon"),
      (11L, "omega psi chi phi upsilon")) ++
      (100L until 120L).map(i => (i, s"unique${i}a unique${i}b unique${i}c unique${i}d")))
      .toDF("doc_id", "text")
    val t = Sampling.mineContrastiveTriplets(corpus, "doc_id", "text",
        minEstJaccard = 0.9)
      .as[(Long, Long, Long)].collect().toSeq
    val byAnchor = t.map(x => x._1 -> x).toMap
    // every clustered doc anchors at most one triplet; positives exact
    assert(t.map(_._1).distinct.size == t.size)
    assert(byAnchor.get(1L).forall(_._2 == 2L)) // label-holder pairs with 2nd-min
    assert(byAnchor.get(2L).forall(_._2 == 1L))
    assert(byAnchor.get(3L).forall(_._2 == 1L))
    assert(byAnchor.get(10L).forall(_._2 == 11L))
    assert(byAnchor.get(11L).forall(_._2 == 10L))
    // no singleton anchors, no self-negatives, no in-cluster negatives
    assert(t.forall(x => Set(1L, 2L, 3L, 10L, 11L).contains(x._1)))
    assert(t.forall(x => x._3 != x._1 && x._3 != x._2))
    val clusterOf = Map(1L -> 1, 2L -> 1, 3L -> 1, 10L -> 2, 11L -> 2)
    assert(t.forall(x =>
      !clusterOf.contains(x._3) || clusterOf(x._3) != clusterOf(x._1)))
    // determinism: a re-run mines the identical triplet set
    val t2 = Sampling.mineContrastiveTriplets(corpus, "doc_id", "text",
        minEstJaccard = 0.9)
      .as[(Long, Long, Long)].collect().toSeq
    assert(t.sorted == t2.sorted)
  }
}
