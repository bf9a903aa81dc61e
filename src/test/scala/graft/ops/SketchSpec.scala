package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.pipeline.SparkTestBase
import scala.util.Random

/** HLL sketch + HyperBall semantics. The repo's bit-exact rule applies
  * even to the "approximate" operators: the REGISTER STATE is a pure
  * deterministic function of the input set, so the distributed plans are
  * checked for exact equality against straight-line sequential references
  * (and partition invariance); only the float ESTIMATOR is judged by an
  * error bound, and that bound is the textbook 1.04/sqrt(m) times a
  * 3-sigma margin. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Sequential reference: registers of a string set at precision p. */
  private def seqRegisters(values: Iterable[String], p: Int): Array[Byte] = {
    val regs = new Array[Byte](1 << p)
    values.foreach { s =>
      val h = SketchOps.hash64(s)
      val b = SketchOps.bucketOf(h, p)
      val r = SketchOps.rhoOf(h, p)
      if ((regs(b) & 0xFF) < (r & 0xFF)) regs(b) = r
    }
    regs
  }

  test("bucketOf/rhoOf match a BigInt bit-twiddling reference") {
    val rnd = new Random(2026)
    val hashes = Seq.fill(2000)(rnd.nextLong()) ++
      Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue, 1L << 51, (1L << 52) - 1)
    for (p <- Seq(4, 8, 12); h <- hashes) {
      val big = BigInt(h) & ((BigInt(1) << 64) - 1)
      val expBucket = (big >> (64 - p)).toInt
      val suffix = big & ((BigInt(1) << (64 - p)) - 1)
      val expRho =
        if (suffix == 0) 64 - p + 1
        else (64 - p) - (suffix.bitLength - 1)
      assert(SketchOps.bucketOf(h, p) === expBucket, s"bucket h=$h p=$p")
      assert((SketchOps.rhoOf(h, p) & 0xFF) === expRho, s"rho h=$h p=$p")
    }
  }

  test("summarize: split harmonic sum reconstructs exactly") {
    val rnd = new Random(7)
    for (p <- Seq(8, 12)) {
      val regs = Array.fill((1 << p))(rnd.nextInt(64 - p + 2).toByte)
      val s = SketchOps.summarize(regs, p)
      val sum = (BigInt(s.s_hi) << 28) + BigInt(s.s_lo)
      val expected = regs.map(r => BigInt(1) << (64 - p + 1 - (r & 0xFF))).sum
      assert(sum === expected)
      assert(s.n_zero === regs.count(_ == 0))
    }
  }

  test("distinctSketch: partition-invariant and equal to the sequential reference") {
    import spark.implicits._
    val rnd = new Random(11)
    val rows = (0 until 5000).map { i =>
      val g = s"g${i % 3}"
      (g, s"$g-value-${rnd.nextInt(800)}") // duplicates on purpose
    }
    val df1 = rows.toDF("grp", "v").repartition(1)
    val df13 = rows.toDF("grp", "v").repartition(13)
    val a = SketchOps.distinctSketch(df1, "grp", "v", p = 12)
      .as[(String, Long, Long, Long)].collect().toSet
    val b = SketchOps.distinctSketch(df13, "grp", "v", p = 12)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(a === b, "register state must not depend on partitioning")
    val exp = rows.groupBy(_._1).map { case (g, xs) =>
      val s = SketchOps.summarize(seqRegisters(xs.map(_._2).distinct, 12), 12)
      (g, s.n_zero, s.s_hi, s.s_lo)
    }.toSet
    assert(a === exp, "distributed registers must equal the sequential fold")
  }

  test("estimate: <5% relative error at p=12 on 20k distinct values") {
    import spark.implicits._
    val n = 20000
    val df = (0 until n).map(i => ("all", s"distinct-item-$i")).toDF("grp", "v")
    val Array((zeros, hi, lo)) = SketchOps.distinctSketch(df, "grp", "v", p = 12)
      .select("n_zero", "s_hi", "s_lo").as[(Long, Long, Long)].collect()
    val est = SketchOps.estimate(SketchOps.HllSummary(zeros, hi, lo), 12)
    val err = math.abs(est - n) / n
    // sigma = 1.04/sqrt(4096) = 1.6%; 5% is >3 sigma. Deterministic: the
    // hash is fixed, so this is a pinned regression value, not a flake.
    assert(err < 0.05, s"estimate $est vs $n (err $err)")
  }

  test("estimate: linear-counting branch engages for tiny cardinalities") {
    val s = SketchOps.summarize(seqRegisters((0 until 40).map("lc" + _), 12), 12)
    val est = SketchOps.estimate(s, 12)
    assert(math.abs(est - 40) / 40.0 < 0.05, s"lc estimate $est vs 40")
  }

  test("hyperBall: registers equal exact BFS ball sets pushed through the same math") {
    import spark.implicits._
    // Deterministic scale-free-ish random digraph + a hub with fan-in.
    val rnd = new Random(5)
    val n = 120
    val edges = (
      (0 until n).map(i => (s"n$i", s"n${(i * 7 + 3) % n}")) ++ // ring-ish
        Seq.fill(150)((s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")) ++
        (0 until 60).map(i => (s"n${rnd.nextInt(n)}", "hub")) // skewed fan-in
      ).filter { case (a, b) => a != b }.distinct
    val triples = edges.map { case (s1, o) =>
      (s1, "http://p", 0, o, null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String])
    }.toDF("subj", "pred", "objKind", "objValue", "objDatatype", "objLang", "graph")
      .repartition(9)

    val radius = 2
    val p = 8
    val got = SketchOps.hyperBall(triples, radius, p)
      .as[(String, Long, Long, Long)].collect()
      .map { case (k, z, h, l) => k -> ((z, h, l)) }.toMap

    // Sequential reference: exact ball sets by BFS, then seqRegisters.
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val exp = nodes.map { v =>
      var ball = Set(v)
      var frontier = Set(v)
      for (_ <- 1 to radius) {
        frontier = frontier.flatMap(u => adj.getOrElse(u, Set.empty)) -- ball
        ball ++= frontier
      }
      val s = SketchOps.summarize(seqRegisters(ball, p), p)
      v -> ((s.n_zero, s.s_hi, s.s_lo))
    }.toMap
    assert(got.keySet === exp.keySet)
    val bad = got.collect { case (k, v) if exp(k) != v => k }
    assert(bad.isEmpty, s"register mismatch at ${bad.take(5)}")

    // And the estimator tracks the true ball sizes within the p=8 bound.
    val errs = nodes.map { v =>
      var ball = Set(v); var frontier = Set(v)
      for (_ <- 1 to radius) {
        frontier = frontier.flatMap(u => adj.getOrElse(u, Set.empty)) -- ball
        ball ++= frontier
      }
      val (z, h, l) = got(v)
      math.abs(SketchOps.estimate(SketchOps.HllSummary(z, h, l), p) - ball.size) / ball.size.toDouble
    }
    // p=8: sigma = 6.5%; median over 100+ nodes should sit well inside it.
    val sortedErrs = errs.sorted
    assert(sortedErrs(errs.size / 2) < 0.10,
      s"median HyperBall error ${sortedErrs(errs.size / 2)}")
  }

  /** Sequential CMS reference matrix over a value multiset. */
  private def seqCms(values: Seq[String], d: Int, w: Int): Array[Long] = {
    val m = new Array[Long](d * w)
    values.foreach { s =>
      val h = SketchOps.hash64(s)
      (0 until d).foreach(j => m(j * w + SketchOps.cmsCol(h, j, w)) += 1L)
    }
    m
  }

  test("cmsCol: matches a BigInt reference; h2 forced odd so no row degenerates") {
    val rnd = new Random(2027)
    val hashes = Seq.fill(2000)(rnd.nextLong()) ++
      Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue, 0xFFFFFFFF00000000L)
    for (w <- Seq(64, 1024); j <- 0 until 4; h <- hashes) {
      val big = BigInt(h) & ((BigInt(1) << 64) - 1)
      val h1 = big >> 32
      val h2 = (big & 0xFFFFFFFFL) | 1
      val expect = ((h1 + j * h2) % w).toInt
      assert(SketchOps.cmsCol(h, j, w) === expect, s"h=$h j=$j w=$w")
    }
  }

  test("cmsRegisters: partition-invariant and equal to the sequential fold") {
    import spark.implicits._
    val rnd = new Random(17)
    val values = (0 until 8000).map(_ => s"item-${rnd.nextInt(300)}") // heavy repeats
    val (d, w) = (4, 256)
    val a = SketchOps.cmsRegisters(values.toDF("v").repartition(1), "v", d, w)
    val b = SketchOps.cmsRegisters(values.toDF("v").repartition(13), "v", d, w)
    assert(a.toSeq === b.toSeq, "counter matrix must not depend on partitioning")
    assert(a.toSeq === seqCms(values, d, w).toSeq,
      "distributed matrix must equal the sequential fold")
    // every row counts every item exactly once
    (0 until d).foreach { j =>
      assert((j * w until (j + 1) * w).map(a(_)).sum === values.size.toLong, s"row $j")
    }
  }

  test("cmsHeavyHitters: never underestimates; heavy set is a superset of the truth") {
    import spark.implicits._
    val rnd = new Random(23)
    // planted frequencies: 5 heavy (>=400), a mid band, and a long tail
    val values =
      (0 until 5).flatMap(i => Seq.fill(400 + i * 50)(s"heavy-$i")) ++
        (0 until 20).flatMap(i => Seq.fill(30)(s"mid-$i")) ++
        (0 until 2000).map(i => s"tail-$i-${rnd.nextInt(4)}")
    val items = new Random(3).shuffle(values).toDF("v").repartition(7)
    val truth = values.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val (d, w, threshold) = (4, 1024, 100L)
    val got = SketchOps.cmsHeavyHitters(items, items.distinct(), "v", "v", d, w, threshold)
      .as[(String, Long)].collect().toMap
    // CMS point estimates are min over d rows of (true + collisions) >= true
    got.foreach { case (v, est) => assert(est >= truth(v), s"$v underestimated") }
    val trueHeavy = truth.filter(_._2 >= threshold).keySet
    assert(trueHeavy.subsetOf(got.keySet),
      s"missing true heavy hitters: ${trueHeavy -- got.keySet}")
    // at this load factor (2k distinct on 4x1024 counters) the estimates
    // should be near-exact: allow only the standard eps*N slack
    val n = values.size.toLong
    val eps = math.E / w
    got.foreach { case (v, est) =>
      assert(est - truth(v) <= (eps * n).toLong + 1, s"$v over by ${est - truth(v)}")
    }
  }

  /** Sequential Bloom reference. */
  private def seqBloom(keys: Seq[String], mBits: Int, k: Int): Array[Long] = {
    val w = new Array[Long](mBits >>> 6)
    keys.foreach { s =>
      val h = SketchOps.hash64(s)
      (0 until k).foreach { i =>
        val idx = SketchOps.cmsCol(h, i, mBits)
        w(idx >>> 6) |= 1L << (idx & 63)
      }
    }
    w
  }

  test("bloomBits: partition-invariant and equal to the sequential fold") {
    import spark.implicits._
    val keys = (0 until 3000).map(i => s"key-$i")
    val (m, k) = (1 << 15, 4)
    val a = SketchOps.bloomBits(keys.toDF("v").repartition(1), "v", m, k)
    val b = SketchOps.bloomBits((keys ++ keys).toDF("v").repartition(11), "v", m, k)
    assert(a.toSeq === b.toSeq, "bit array must not depend on partitioning or multiplicity")
    assert(a.toSeq === seqBloom(keys, m, k).toSeq)
  }

  test("bloom probe: zero false negatives; false positives reproduce the reference exactly") {
    import spark.implicits._
    val keys = (0 until 100).map(i => s"member-$i")
    // deliberately tiny filter (256 bits, k=2, 100 keys -> ~50% fill) so
    // false positives are GUARANTEED — the determinism claim is that the
    // engine and the sequential reference agree on exactly which ones
    val (m, k) = (256, 2)
    val words = SketchOps.bloomBits(keys.toDF("v"), "v", m, k)
    keys.foreach(s => assert(SketchOps.bloomProbe(words, s, k), s"false negative: $s"))
    val probes = (0 until 400).map(i => s"nonmember-$i")
    val fps = probes.filter(SketchOps.bloomProbe(words, _, k))
    assert(fps.nonEmpty, "test setup should force false positives")
    assert(fps.size < probes.size / 2, "fill factor sanity")
    // distributed codegen'd probe == driver-side probe, row for row
    val viaExpr = probes.toDF("v")
      .filter(graft.functions.BloomExpression.bloomMightContain(col("v"), words, k))
      .as[String].collect().toSet
    assert(viaExpr === fps.toSet, "codegen probe must match the sequential probe")
  }

  test("bloom probe expression: null input filtered, non-string input refused at analysis") {
    import spark.implicits._
    val words = SketchOps.bloomBits(Seq("x").toDF("v"), "v", 256, 2)
    val withNull = Seq(Some("x"), None).toDF("v")
      .filter(graft.functions.BloomExpression.bloomMightContain(col("v"), words, 2))
      .as[String].collect()
    assert(withNull.toSeq === Seq("x"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1, 2).toDF("n")
        .filter(graft.functions.BloomExpression.bloomMightContain(col("n"), words, 2))
        .collect()
    }
    assert(e.getMessage.contains("graft_bloom_might_contain"))
  }

  test("hyperBall: astral code points are refused loudly") {
    import spark.implicits._
    val triples = Seq(
      ("n😀", "http://p", 0, "b", null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("subj", "pred", "objKind", "objValue", "objDatatype", "objLang", "graph")
    val e = intercept[Exception] {
      SketchOps.hyperBall(triples, radius = 1, p = 8).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("astral"),
      s"unexpected error: ${e.getMessage}")
  }
}
