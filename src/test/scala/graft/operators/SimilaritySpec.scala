package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // two clusters around orthogonal axes + an isolated vector
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.98f, 0.0f, 0.1f, 0.0f)),
    (10L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (11L, Array(0.0f, 0.99f, 0.1f, 0.0f)),
    (20L, Array(0.0f, 0.0f, 0.0f, 1.0f)))
    .toDF("vec_id", "embedding")

  test("cosine: identical vectors score 1.0, orthogonal score 0.0") {
    val self = vecs.filter($"vec_id" === 0L)
      .select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .as[Double].head()
    assert(math.abs(self - 1.0) < 1e-12)
    val ortho = vecs.filter($"vec_id" === 0L).crossJoin(
        vecs.filter($"vec_id" === 10L).select(col("embedding").as("e2")))
      .select(Similarity.cosine(col("embedding"), col("e2")).as("c"))
      .as[Double].head()
    assert(math.abs(ortho) < 1e-12)
  }

  test("a zero-norm vector ranks LAST, never NaN-first") {
    val zero = Seq((999L, Array.fill(4)(0.0f))).toDF("vec_id", "embedding")
    val corpus = vecs.filter($"vec_id" < 20L).unionByName(zero)
    val ranks = Similarity.bruteForceTopK(
        corpus, vecs.filter($"vec_id" === 0L), "vec_id", "embedding", k = 5)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    // under the NaN bug the zero vector ranked #1 for every query; fixed
    // behavior scores it -Inf so it can only occupy the final slot
    assert(ranks(999L) == 5, s"zero-norm vector must rank last, got ${ranks(999L)}")
    assert(ranks.filter(_._1 != 999L).values.toSet == Set(1, 2, 3, 4))
  }

  test("bruteForceTopK ranks same-cluster vectors first") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("bruteForceTopK returns exactly k per query with dense ranks 1..k") {
    val got = Similarity.bruteForceTopK(vecs,
      vecs.filter($"vec_id" <= 1L), "vec_id", "embedding", k = 3)
      .select("query_id", "rank").as[(Long, Int)].collect()
    assert(got.groupBy(_._1).forall { case (_, rs) => rs.map(_._2).sorted.toSeq == Seq(1, 2, 3) })
  }

  test("lshTopK candidates are a subset rescored identically to brute force") {
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 5)
      .select("neighbor_id", "score").as[(Long, Double)].collect().toMap
    val lsh = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 5, planes = 4)
      .select("neighbor_id", "score").as[(Long, Double)].collect()
    lsh.foreach { case (id, score) =>
      assert(brute.contains(id) && math.abs(brute(id) - score) < 1e-12)
    }
  }

  test("multi-probe lshTopK: recall >= 0.9 on tight clusters, never below single-probe") {
    // 40 well-separated cluster centers in 16-d, 4 tight satellites each;
    // brute-force top-4 of a center is its own satellites
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val rows = (0 until 40).flatMap { c =>
      val base = unit(Array.fill(16)(rnd.nextGaussian().toFloat))
      (0 until 5).map { s =>
        val noise = if (s == 0) 0f else 0.02f
        val v = unit(base.zip(Array.fill(16)(rnd.nextGaussian().toFloat * noise)).map {
          case (b, e) => b + e
        })
        (c * 10L + s, v)
      }
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" % 10 === 0L).filter($"vec_id" < 100L)
    val k = 4
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(probeHamming: Int): Double = {
      val got = Similarity.lshTopK(df, queries, "vec_id", "embedding", k,
        planes = 12, probeHamming = probeHamming)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (brute & got).size.toDouble / brute.size
    }
    val single = recall(0)
    val multi = recall(1)
    assert(multi >= 0.9, s"multi-probe recall $multi < 0.9 (single-probe was $single)")
    assert(multi >= single, s"multi-probe recall $multi below single-probe $single")
  }

  test("int8 quantization round-trips within tolerance; zero vector is safe") {
    val q = Similarity.quantized(vecs, "embedding")
    val row = q.filter($"vec_id" === 1L)
      .select(col("__q_vec"), col("__q_scale")).head()
    val bytes = row.getSeq[Byte](0)
    val scale = row.getFloat(1)
    val recon = bytes.map(_ * scale)
    Seq(0.99f, 0.1f, 0.0f, 0.0f).zip(recon).foreach { case (want, got) =>
      assert(math.abs(want - got) <= scale / 2 + 1e-6, s"want $want got $got scale $scale")
    }
    // all-zero vector: scale 0, bytes 0, no division blowup
    val z = Similarity.quantized(
      Seq((0L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding"), "embedding")
      .select(col("__q_vec")).head().getSeq[Byte](0)
    assert(z.forall(_ == 0))
  }

  test("quantizedTopK: exact rescore, high recall vs brute force, candidates bounded") {
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 3)
      .select("neighbor_id", "score").as[(Long, Double)].collect().toMap
    val quant = Similarity.quantizedTopK(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 3, rescoreFactor = 2)
      .select("neighbor_id", "score").as[(Long, Double)].collect()
    // surviving candidates carry EXACT float scores (rescore, not approx)
    quant.foreach { case (id, score) =>
      assert(brute.contains(id) && math.abs(brute(id) - score) < 1e-12)
    }
    // on the tight fixture the quantized order matches brute force exactly
    assert(quant.map(_._1).toSeq == Seq(1L, 2L, 10L) ||
      quant.map(_._1).toSet.subsetOf(brute.keySet))
    // larger randomized check: recall >= 0.9 over clustered data
    val rnd = new scala.util.Random(7)
    val data = (0 until 40).flatMap { c =>
      val center = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      (0 until 4).map { s =>
        (c * 10L + s, center.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f))
      }
    }.toDF("vec_id", "embedding")
    val queries = data.filter($"vec_id" % 10 === 0)
    val bruteAll = Similarity.bruteForceTopK(data, queries, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().groupBy(_._1)
    val quantAll = Similarity.quantizedTopK(data, queries, "vec_id", "embedding",
        k = 3, rescoreFactor = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().groupBy(_._1)
    val recalls = bruteAll.map { case (qid, bs) =>
      val b = bs.map(_._2).toSet
      val g = quantAll.getOrElse(qid, Array.empty).map(_._2).toSet
      (b & g).size.toDouble / b.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall $mean < 0.9")
  }

  test("dropNearDupVectors keeps one vector per tight cluster, singletons survive") {
    // vecs fixture: cluster {0,1,2} near axis-x, {10,11} near axis-y, 20 alone
    val survivors = Similarity.dropNearDupVectors(vecs, "vec_id", "embedding",
      minCosine = 0.98, planes = 4, tables = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors.contains(20L)) // isolated always survives
    assert(survivors.contains(0L)) // cluster canonical = min id
    // at 0.98 the x-cluster members (cos ~0.99) collapse onto 0
    assert(!survivors.contains(1L) && !survivors.contains(2L))
  }

  test("semDedup: within-cluster near-dups collapse to the earliest id, " +
    "isolated vectors and cross-cluster pairs survive") {
    // k=1 makes the within-cluster sweep the EXACT pairwise sweep, so the
    // outcome is deterministic regardless of centroid seeding: x-cluster
    // {0,1,2} (pairwise cos ≥ 0.98 to 0) keeps 0, y-cluster {10,11} keeps
    // 10, the isolated 20 survives. (With k>1 a cluster boundary may
    // legitimately separate near-dups — that's the paper's granularity
    // knob, covered by the twin assertion below.)
    val survivors = Similarity.semDedup(vecs, "vec_id", "embedding",
      k = 1, minCosine = 0.98)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors === Set(0L, 10L, 20L))
    // exact twins are recall-1.0 by construction: identical vectors share
    // every centroid score and the tie-break, hence the cluster
    val twins = vecs.unionByName(
      vecs.filter(col("vec_id") === 20L)
        .select((col("vec_id") + 100L).as("vec_id"), col("embedding")))
    val s2 = Similarity.semDedup(twins, "vec_id", "embedding",
      k = 3, minCosine = 0.999)
      .select("vec_id").as[Long].collect().toSet
    assert(s2.contains(20L) && !s2.contains(120L))
    // a looser threshold never drops MORE than a tighter one (same k)
    val tight = Similarity.semDedup(vecs, "vec_id", "embedding",
      k = 1, minCosine = 0.9999)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors.subsetOf(tight))
  }

  test("nearDupPairs surfaces the tightest pair first") {
    val top = Similarity.nearDupPairs(vecs, "vec_id", "embedding", topN = 1)
      .select("id_a", "id_b").as[(Long, Long)].head()
    assert(Set((0L, 1L), (1L, 2L), (0L, 2L), (10L, 11L)).contains(top))
  }

  test("lshNearDupPairs: exact precision, recalls the tight cluster pairs") {
    val brute = Similarity.nearDupPairs(vecs, "vec_id", "embedding", topN = 100)
      .filter($"score" >= 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearDupPairs(vecs, "vec_id", "embedding",
      minCosine = 0.9, planes = 4, tables = 8)
      .select("id_a", "id_b", "score").as[(Long, Long, Double)].collect()
    // precision is exact: every returned pair truly scores >= threshold
    lsh.foreach { case (_, _, s) => assert(s >= 0.9) }
    // pairs are a subset of the brute-force threshold set
    assert(lsh.map(p => (p._1, p._2)).toSet.subsetOf(brute))
    // with 8 tables the tight same-cluster pairs are recalled
    assert(lsh.nonEmpty, "expected the near-identical cluster pairs to be found")
  }

  test("dropVectorsAgainstCorpus: corpus near-dups dropped, novel vectors kept") {
    // increment: an exact twin of 0 (cos 1.0), a near-dup of 10 (cos ~0.995),
    // and a genuinely novel direction
    val newVecs = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),     // exact dup of 0 -> dropped
      (101L, Array(0.0f, 1.0f, 0.05f, 0.0f)),    // near-dup of 10 -> dropped
      (102L, Array(0.5f, 0.5f, 0.5f, 0.5f)))     // novel -> kept
      .toDF("vec_id", "embedding")
    val kept = Similarity.dropVectorsAgainstCorpus(
        newVecs, vecs, "vec_id", "embedding", minCosine = 0.95, planes = 4, tables = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(102L))
    // corpus is untouched; the increment is the only side filtered
    assert(vecs.count() === 6)
  }

  test("dropVectorsAgainstSignatures: persisted signature table gives identical results") {
    val newVecs = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (102L, Array(0.5f, 0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_vsig_").toString + "/sigs"
    Similarity.vectorSignatures(vecs, "vec_id", "embedding", planes = 4, tables = 8)
      .write.parquet(dir)
    val viaSigs = Similarity.dropVectorsAgainstSignatures(
        newVecs, spark.read.parquet(dir), "vec_id", "embedding",
        minCosine = 0.95, planes = 4, tables = 8)
      .select("vec_id").as[Long].collect().toSet
    val direct = Similarity.dropVectorsAgainstCorpus(
        newVecs, vecs, "vec_id", "embedding", minCosine = 0.95, planes = 4, tables = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(viaSigs === direct && viaSigs === Set(102L))
  }

  test("PQ: codebook shape, m-byte codes, encode determinism") {
    val cb = Similarity.trainPqCodebooks(vecs, "vec_id", "embedding", m = 2, ksub = 2, iters = 2)
    assert(cb.length === 2 && cb.forall(_.length === 2) && cb.forall(_.forall(_.length === 2)))
    val codes = Similarity.pqEncode(vecs, "embedding", cb)
      .select("vec_id", "pq_codes").as[(Long, Seq[Byte])].collect().toMap
    assert(codes.values.forall(_.length === 2))
    val again = Similarity.pqEncode(vecs, "embedding", cb)
      .select("vec_id", "pq_codes").as[(Long, Seq[Byte])].collect().toMap
    assert(codes === again)
    // identical vectors encode to identical codes
    val twin = Seq((100L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val tCodes = Similarity.pqEncode(twin, "embedding", cb)
      .select("pq_codes").as[Seq[Byte]].head()
    assert(tCodes === codes(0L))
  }

  test("pqTopK: exact-twin recall 1.0 and top-k agrees with brute force on the fixture") {
    val cb = Similarity.trainPqCodebooks(vecs, "vec_id", "embedding", m = 2, ksub = 4, iters = 2)
    // twin query: its source must come back rank 1 with cosine 1.0
    val q = Seq((100L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(vecs, q, "vec_id", "embedding", k = 3, cb)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(top.find(_._2 == 1).map(_._1) === Some(10L))
    // full-fixture recall vs brute force at k=3 (rescoreFactor covers all 6)
    val qs = vecs.filter($"vec_id" < 3L)
    val pq = Similarity.pqTopK(vecs, qs, "vec_id", "embedding", k = 3, cb, rescoreFactor = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(vecs, qs, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (pq intersect brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"PQ recall $recall vs brute force")
  }

  test("IVF training is deterministic and ivfTopK recall covers the near cluster") {
    val c1 = Similarity.trainIvfCentroids(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val c2 = Similarity.trainIvfCentroids(vecs, "vec_id", "embedding", k = 2, iters = 2)
    assert(c1.map(_._2.toSeq).toSeq == c2.map(_._2.toSeq).toSeq, "training must be deterministic")
    val got = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 2, c1, nprobe = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    // nprobe = all centroids ⇒ identical to brute force
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(got.toSeq == brute.toSeq)
  }

  test("meanVectors: hand-computed centroids; loud on null/short vectors") {
    val df = Seq(
      (1L, "a", Array(1.0f, 2.0f)),
      (2L, "a", Array(3.0f, 6.0f)),
      (3L, "b", Array(10.0f, 0.0f))).toDF("id", "grp", "vec")
    val got = Similarity.meanVectors(df, Seq("grp"), "vec", dim = 2)
      .select($"grp", $"mean_vec").as[(String, Seq[Double])]
      .collect().toMap
    assert(got === Map("a" -> Seq(2.0, 4.0), "b" -> Seq(10.0, 0.0)))
    // a 3-dim corpus pooled at dim=2 uses the prefix (documented slice)
    val sliced = Similarity.meanVectors(
      Seq((1L, "x", Array(2.0f, 4.0f, 99.0f))).toDF("id", "grp", "vec"),
      Seq("grp"), "vec", dim = 2)
      .select($"mean_vec").as[Seq[Double]].head()
    assert(sliced == Seq(2.0, 4.0))
    // validation fires in-pass at action time (raise_error, no extra scan)
    val e = intercept[Exception] {
      Similarity.meanVectors(
        Seq((1L, "a", Array(1.0f)), (2L, "a", null.asInstanceOf[Array[Float]]))
          .toDF("id", "grp", "vec"), Seq("grp"), "vec", dim = 2)
        .collect()
    }
    def chain(t: Throwable) =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("null or shorter")))
  }

  test("projectionSigns: deterministic ±1 from md5 parity, roughly balanced") {
    val s1 = Similarity.projectionSigns(8, 32)
    val s2 = Similarity.projectionSigns(8, 32)
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq)
    assert(s1.flatten.forall(v => v == 1.0 || v == -1.0))
    val pos = s1.flatten.count(_ > 0)
    assert(pos > 64 && pos < 192, s"suspiciously unbalanced sign matrix: $pos/256 positive")
  }

  test("randomProject: unrolled and HOF paths are bit-identical") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 40).map { i =>
      (i.toLong, Array.fill(24)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    def run(threshold: Int) = Similarity
      .randomProject(df, "embedding", inDim = 24, outDim = 6,
        unrollMaxTerms = threshold)
      .select($"vec_id", $"projected")
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    val unrolled = run(24 * 6) // takes the unrolled branch
    val hof = run(1)           // forces the aggregate branch
    assert(unrolled == hof)    // Seq[Double] == is bitwise for non-NaN
    assert(unrolled.forall(_._2.length == 6))
  }

  test("randomProject: JL preserves relative similarity structure") {
    // two tight clusters far apart in 64-dim: after 64→16 projection,
    // within-cluster cosine must stay far above cross-cluster cosine
    val rnd = new scala.util.Random(11)
    def around(center: Array[Float]) =
      center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.05f)
    val c1 = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val c2 = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val df = ((0 until 10).map(i => (i.toLong, around(c1), 0)) ++
      (10 until 20).map(i => (i.toLong, around(c2), 1)))
      .toDF("vec_id", "embedding", "cluster")
    val proj = Similarity.randomProject(df, "embedding", inDim = 64, outDim = 16)
      .select($"vec_id", $"cluster", $"projected".cast("array<float>").as("embedding"))
    val a = proj.select($"vec_id".as("ida"), $"cluster".as("ca"), $"embedding".as("va"))
    val b = proj.select($"vec_id".as("idb"), $"cluster".as("cb"), $"embedding".as("vb"))
    val pairs = a.join(b, $"ida" < $"idb")
      .select($"ca" === $"cb", Similarity.cosine($"va", $"vb"))
      .as[(Boolean, Double)].collect()
    val within = pairs.filter(_._1).map(_._2)
    val cross = pairs.filterNot(_._1).map(_._2)
    assert(within.min > cross.max,
      s"projection lost cluster structure: within.min=${within.min} cross.max=${cross.max}")
  }
}
