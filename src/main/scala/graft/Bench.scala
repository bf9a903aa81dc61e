package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr
import graft.pipeline.{PageGen, TripleEmit}

/** Driver-run benchmark: times every SparkEntry query on the sf dir plus
  * the KG-construction pipeline throughput, printing ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 200k pages: large enough that JIT + per-job fixed costs amortize
    // (20k pages measured 26k-116k t/s across 4 passes purely from
    // compilation in the timed region; 200k reaches ~0.5M t/s by pass 2,
    // within ~1.6x of the 6M-page scaling-bench steady state — the round-2
    // "150x gap" was short-job warmup, not a pipeline regression)
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- session-health sentinel (VERDICT r4 #3) ----------------------
    // A fixed CPU-bound probe (no IO, no parquet, deterministic work)
    // whose healthy per-core-normalized time is known on this host; when
    // it runs far over bound the HOST window is degraded and the artifact
    // must say so itself — BENCH_r04 recorded a window where a 0.75 s
    // join measured 9.7-19 s, indistinguishable in the JSON from a code
    // regression. Bound: 3 s at 32 cores on a healthy box (measured
    // 0.4-0.8 s; 4-7x headroom for ordinary jitter — the degraded windows
    // this flags run 5-20x over). The probe scales near-linearly with
    // cores, so the bound is normalized by 32/cores.
    val sentinelBoundSec = 3.0 * 32.0 / cpus.toDouble
    def sentinelProbe(): Double = time {
      // bit_xor, not sum: summing 400M 64-bit hashes overflows ANSI mode
      spark.range(0L, 400000000L, 1L, cpus.toInt)
        .select(expr("bit_xor(xxhash64(id))")).collect(): Unit
    }._2
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString("[", ",", "]")
      catch { case _: Exception => "[]" }

    // KG pipeline throughput: pages -> extract -> expand -> toRDF -> dedup.
    // Warmup first so the reported tps reflects steady state, not JIT.
    // Multi-pass with min-report, like ScalingBench: this host's run-to-run
    // noise reaches 6× on a minutes timescale, and round 2's single-pass
    // number landed 150× under the pinned scaling-bench figure purely from
    // a cold first pass (round-2 verdict #6) — the min over >=2 passes is
    // the honest steady-state estimate.
    val partitions = cpus.toInt * 4
    val kgRuns = math.max(1, sys.env.getOrElse("SPARK_GRAFT_KG_PASSES", "3").toInt)
    TripleEmit.pipeline(PageGen.pages(spark, 20000, 7L, 64)).count()

    // pre-measurement sentinel (after JIT warmup): a degraded first probe
    // gets ONE 30 s backoff + retry — a transient spike must not mark the
    // whole session, but a persistently slow host must be recorded as such
    val sentinelWarm = sentinelProbe() // JIT for the probe itself
    var sentinelPre = sentinelProbe()
    val loadPre = loadavg()
    var sentinelRetried = false
    if (sentinelPre > sentinelBoundSec) {
      System.err.println(
        f"[sentinel] pre-probe $sentinelPre%.2fs over bound $sentinelBoundSec%.2fs — backing off 30s and retrying")
      Thread.sleep(30000)
      sentinelPre = sentinelProbe()
      sentinelRetried = true
    }
    val kgPasses = (1 to kgRuns).map { _ =>
      time { TripleEmit.pipeline(PageGen.pages(spark, nPages, 42L, partitions)).count() }
    }
    val nTriples = kgPasses.head._1
    val kgSec = kgPasses.map(_._2).min
    val kgPassesJson = kgPasses.map(p => f"${p._2}%.3f").mkString("[", ",", "]")
    val triplesPerSec = nTriples / math.max(kgSec, 1e-9)

    // aux tables built outside the timed region (build-once artifacts,
    // not per-query cost — the probe queries read them as persisted input)
    AuxTables.ensure(spark, sfDir)

    // per-query guard mirroring Verify: one runaway query must not zero
    // the round's bench output (round 1: BENCH_r01.json was rc=124)
    val timeoutMs = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "240").toLong * 1000L

    // session warm-up OUTSIDE the timed region: the alphabetically-first
    // measured query otherwise absorbs planner/codegen JIT (~5-9 s
    // observed on q1_agg), misattributing session cost to one query
    QueryGuard.run(spark, "warmup", timeoutMs) {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag").count().count()
      spark.read.parquet(s"$sfDir/documents.parquet").count(): Unit
    }

    // Multi-pass per query, min reported (VERDICT r3 #6): this host's
    // run-to-run noise reaches 6× on a minutes timescale, so a single
    // pass makes a 2× "regression" on unchanged code undecidable. All
    // passes are published alongside the min — no selection.
    val qPasses = math.max(1, sys.env.getOrElse("SPARK_GRAFT_QUERY_PASSES", "3").toInt)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to qPasses).map { _ =>
        val t0 = System.nanoTime()
        val ok = QueryGuard.run(spark, name, timeoutMs) { fn(spark, sfDir).count(): Unit }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      name -> times
    }
    // min over SUCCESSFUL passes only — a pass that threw or timed out
    // returns fast and must not masquerade as the steady-state min
    // (review r4); with ZERO successes the query reports null and is
    // excluded from total (ADVICE r4: a max-elapsed headline value was
    // indistinguishable from a successful timing), with the name listed
    // under failed_queries.
    def minOk(v: Seq[(Boolean, Double)]): Option[Double] = {
      val ok = v.filter(_._1).map(_._2)
      if (ok.nonEmpty) Some(ok.min) else None
    }
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + minOk(v).map(d => f"$d%.3f").getOrElse("null")
    }.mkString("{", ",", "}")
    val qp = results.map { case (k, v) =>
      "\"" + k + "\":" + v.map { case (ok, t) => if (ok) f"$t%.3f" else f"-$t%.3f" }
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = results.filter(r => minOk(r._2).isEmpty).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.flatMap(r => minOk(r._2)).sum + kgSec

    // post-measurement sentinel: a session that DEGRADED mid-run (the
    // r4 failure mode) is caught here even when the pre-probe was clean
    val sentinelPost = sentinelProbe()
    val degraded = sentinelPre > sentinelBoundSec || sentinelPost > sentinelBoundSec
    val sentinelJson =
      f"""{"warm_sec":$sentinelWarm%.3f,"pre_sec":$sentinelPre%.3f,"post_sec":$sentinelPost%.3f,"bound_sec":$sentinelBoundSec%.3f,"loadavg_pre":$loadPre,"loadavg_post":${loadavg()},"retried":$sentinelRetried,"degraded":$degraded}"""
    if (degraded)
      System.err.println("[sentinel] SESSION DEGRADED — treat this artifact's timings as a bad host window, not code")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"query_passes":$qp,"failed_queries":$failed,"sentinel":$sentinelJson,"sf":"$sfDir","kg":{"pages":$nPages,"triples":$nTriples,"seconds":$kgSec%.3f,"passes_sec":$kgPassesJson,"triples_per_sec":$triplesPerSec%.1f,"cores":$cpus}}""")
    spark.stop()
  }
}

/** Scaling-evidence run (BASELINE.md protocol): same seeded input, one
  * parallelism level per invocation; run at local[8] then local[32] and
  * compute E = (tps32/tps8)/4. */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val nPages = if (args.length > 1) args(1).toLong else 60000L
    val partitionsArg = if (args.length > 2) args(2).toInt else 128
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      // shuffle partitions FIXED across both runs and sized so each final
      // dedup hash-agg task holds a bounded slice (shuffle.partitions ==
      // cores would put the whole distinct set in memory at once — the
      // exact spill trap the 100TB sizing guidance warns about)
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fixed partition count across runs: the INPUT is identical; only the
    // executor-thread count varies (the sandbox stand-in for N vs 4N executors)
    val partitions = partitionsArg
    val passes = if (args.length > 3) args(3).toInt else 3
    // warmup (JIT + codegen caches)
    TripleEmit.pipeline(PageGen.pages(spark, 2000, 7L, 16)).count()
    // Multiple measured passes per JVM: this host's run-to-run noise is
    // up to 6× on a minutes timescale (BENCH/BASELINE.md note 4), so a
    // single pass per 15-minute JVM startup wastes the sample budget.
    // Per-pass JSON lines let the analyst take min/median across passes.
    (1 to passes).foreach { pass =>
      val t0 = System.nanoTime()
      val n = TripleEmit.pipeline(PageGen.pages(spark, nPages, 42L, partitions)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"bench":"scaling","cores":$cores,"pass":$pass,"pages":$nPages,"partitions":$partitions,"triples":$n,"seconds":$sec%.3f,"triples_per_sec":${n / sec}%.1f,"cpus_allowed":"${cpusAllowed()}"}""")
    }
    spark.stop()
  }

  /** The OS-level CPU affinity of THIS JVM, read from /proc/self/status —
    * stamped into every pass line so a scaling artifact proves its own
    * pinning. Round 5 found a session where `taskset -c 0-7 sbt ...`
    * launched through a background supervisor did NOT propagate to the
    * JVM (observed affinity 0-31): without self-reporting, that session's
    * "8-core" half would have silently recorded unrestricted numbers and
    * wrecked the N-vs-4N efficiency computation. Non-Linux → "n/a". */
  private def cpusAllowed(): String =
    try {
      val src = scala.io.Source.fromFile("/proc/self/status")
      try src.getLines().collectFirst {
        case l if l.startsWith("Cpus_allowed_list:") => l.split(":\\s*", 2)(1).trim
      }.getOrElse("n/a")
      finally src.close()
    } catch { case _: java.io.IOException => "n/a" }
}
