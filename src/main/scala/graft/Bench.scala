package graft

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  * Failures are NOT silently folded into timings (the round-1 harness
  * swallowed exceptions into wall time): a failed query reports -1,
  * lands in `failures`, and the process exits nonzero.
  *
  * Each query is forced via a full-column xxhash64 checksum aggregate,
  * not `count()` — under count() Catalyst prunes unreferenced computed
  * columns, so pure-projection queries would time row counting instead
  * of their actual work. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Gate.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    var failures = List.empty[String]
    // dev loop: SPARK_GRAFT_ONLY=q1,q2 times just those queries
    val selected = SparkEntry.selected(sys.env.get("SPARK_GRAFT_ONLY"))
    // untimed warmup: the first query otherwise pays one-off session
    // costs (codegen/JIT compiler, shuffle + broadcast machinery,
    // window exec, parquet footer caches — measured ~6s billed to the
    // alphabetically-first query), which pollutes per-query regression
    // tracking across rounds. Exercises GENERIC machinery only, on
    // synthetic 1k-row inputs — no gate query's actual work is
    // pre-computed.
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy("n_regionkey").count().collect()
      val a = spark.range(1000).select(col("id"),
        array(col("id").cast("float"), lit(1.0f)).as("v"))
      val b = spark.range(100).select(col("id"), lit("x").as("tag"))
      a.join(broadcast(b), Seq("id"))
        .withColumn("t", transform(col("v"), x => x * 2.0f))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("id") % 7).orderBy(col("id"))))
        .groupBy("tag").agg(count(lit(1)), max("rk")).collect()
    } catch { case scala.util.control.NonFatal(_) => () }
    // Min-of-N per query: identical cold runs swing ±20% on this box
    // (pipeline_e2e measured 26–38s across identical r6-session runs),
    // which drowns real round-over-round regressions. The min of N runs
    // is the stable estimator of a query's plan cost. Re-runs are
    // skipped for queries whose FIRST run exceeds the cutoff — the
    // heavyweights are exactly where doubling the wall time hurts, and
    // their absolute size already dominates their variance. N and the
    // per-query run counts are recorded in the output.
    // 3 (r15): same-HEAD driver-vs-committed runs diverged 31% total /
    // 5.5x per-query under min-of-2 — the min of three is measurably
    // more robust to one contended run landing on a query.
    val benchRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    // Host-load sentinel: the SAME fixed calibration query timed before
    // and after the whole sweep, recorded in the artifact. Its cost is
    // sf-independent pure compute + one small shuffle, so a sentinel
    // reading far above its cross-round norm (or end >> start) marks
    // the run as host-contaminated — the r14 driver/committed gap
    // (273.7 vs 208.8 s, same code) was undetectable from the artifact
    // alone. Calibrates AFTER warmup so it measures the host, not JIT.
    def sentinel(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 32)
        .select(((col("id") * 2654435761L) % 1000003L).as("h"))
        .groupBy(pmod(col("h"), lit(101))).agg(count(lit(1)), sum("h"))
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    // 15 (not 10): ann_recall's FIRST run lands near 11s on a cold
    // session — almost entirely one-time JIT/codegen for its plan
    // shapes (4.8s warm, AnnProbe) — and a 10s cutoff froze exactly
    // that inflated number into the artifact. Only the true
    // heavyweights (pipeline_e2e ~30s) stay single-run.
    val rerunCutoffSec = 15.0
    // Cold-session guard (round-10 postmortem): the cutoff froze a cold
    // 31.4s FIRST run of mv_join_sql (5.6s committed min-of-3) straight
    // into the driver's artifact — a single bad cold session nearly read
    // as a 2× regression. A first run over the cutoff therefore STILL
    // earns one re-run when the previous committed BENCH.json (read
    // below, best-effort) says the query normally lands under the
    // cutoff; with no prior file, multi-statement session-state entries
    // (mv_*, *_sql) — the shapes most inflated by a cold catalog — get
    // the same one re-run. True heavyweights (prior best ≥ cutoff)
    // stay single-run as before.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    val priorBest: Map[String, Double] =
      try {
        val p = java.nio.file.Paths.get(outFile)
        if (!java.nio.file.Files.exists(p)) Map.empty
        else {
          val root = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(java.nio.file.Files.readAllBytes(p))
          val qs = root.path("queries")
          if (!qs.isObject) Map.empty
          else {
            val b = Map.newBuilder[String, Double]
            qs.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asDouble(-1.0))
            b.result()
          }
        }
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] prior $outFile unreadable (${e.getMessage}); cold-run guard uses name heuristic only")
        Map.empty
      }
    def coldRerunEligible(name: String): Boolean =
      // a prior value < 0 is a recorded FAILURE, not a measurement —
      // treat it as absent, or a query that failed last round and runs
      // cold this round would be denied the re-run the name heuristic
      // grants and commit its inflated first-run time
      priorBest.get(name).filter(_ >= 0) match {
        case Some(b) => b < rerunCutoffSec
        // absent from the prior artifact = a NEW entry (or no prior
        // file at all): one warm re-run beats freezing a cold first
        // run into the committed number — exactly the defect the
        // cold-session guard exists for (r15: a brand-new entry's
        // first-ever measurement billed two codebook trainings'
        // codegen warmup as steady-state cost)
        case None    => true
      }
    // Divergence-aware reruns (r15 postmortem): the r15 driver run
    // froze a 40.3s measurement of a query whose same-HEAD committed
    // best is 1.0s — its FIRST run (75s, inside a sustained host-load
    // window the sentinel recorded as 2.6x skew) exceeded the cutoff,
    // so the one rule meant to save wall time on heavyweights denied
    // exactly the inflated entries their re-runs. When an entry's best
    // still exceeds `divergenceK`x its committed prior (plus an
    // absolute floor so sub-second noise can't trigger it), keep
    // re-running up to a hard total-run cap regardless of the cutoff,
    // and time the sentinel AT THAT MOMENT so a contaminated window is
    // attributable per entry in the artifact.
    val divergenceK = 3.0
    val divergenceFloorSec = 0.5
    val maxRunsDiverged = 5
    // sweep-wide budget: a handful of outliers is the r15 failure mode
    // this mechanism exists for; if EVERYTHING diverges the host is
    // gone for the whole window and more reruns only stretch it
    var divergenceBudget = 24
    var divSentinels = List.empty[(String, Double, Double)] // name, prior, sentinel
    val sentinelStart = sentinel()
    // sentinelTrace (r16 verdict ask #5): the start/end sentinel pair
    // proves a host-load window EXISTED but not which entries it
    // covered (r16's broad 1.24x-median inflation was unattributable
    // entry-by-entry). Sampling the same sub-second sentinel every
    // ~decile of the sweep makes a contaminated window attributable to
    // the entries measured inside it — ~10 extra sub-second runs,
    // untimed with respect to the total.
    var sentinelTrace = List.empty[(Int, String, Double)] // idx, next entry, sec
    val sentinelEvery = math.max(1, selected.size / 10)
    val results = selected.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((name, fn), entryIdx) =>
      if (entryIdx > 0 && entryIdx % sentinelEvery == 0)
        sentinelTrace ::= ((entryIdx, name, sentinel()))
      def once(recordFailure: Boolean): Double = {
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          // bit_xor, not sum: ANSI mode (Spark 4 default) throws on long
          // overflow, and a 60k-row sum of 64-bit hashes overflows.
          df.agg(org.apache.spark.sql.functions.bit_xor(
            org.apache.spark.sql.functions.xxhash64(
              df.columns.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)))
            .head()
          (System.nanoTime() - t0) / 1e9
        }
        // NonFatal only: an OOM must abort the run — recording it as
        // one failure and continuing with a wedged session would turn
        // every later query into a bogus regression
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          if (recordFailure) failures ::= name
          -1.0
        }
      }
      val first = once(recordFailure = true)
      var best = first
      var runs = 1
      // r17: a cold-inflated first run used to earn only ONE extra run
      // (r16 driver: pipeline_e2e first 25.2s -> second 19.1s FROZEN,
      // both carrying costs the committed 7.7s min-of-3 never sees).
      // An entry whose committed prior is under the cutoff (or which
      // has no prior) now gets its full min-of-N regardless of the
      // first run — only true heavyweights (prior >= cutoff) stay
      // single-run. r18 refinement: when there is NO prior artifact at
      // all (fresh checkout), a first run >= the cutoff is evidence of
      // a genuine heavyweight, not cold-start — cap those at 2 runs so
      // a fresh-checkout sweep doesn't triple its wall on, e.g., a 30s
      // pipeline_e2e first measurement.
      val rerunCap =
        if (first >= rerunCutoffSec && priorBest.isEmpty) math.min(2, benchRuns)
        else benchRuns
      while (best >= 0 && runs < rerunCap &&
          (first < rerunCutoffSec || coldRerunEligible(name))) {
        val t = once(recordFailure = false) // a flaky re-run keeps run 1's time
        runs += 1
        if (t >= 0 && t < best) best = t
      }
      // divergence-aware reruns (see above): prior < 0 is a recorded
      // failure, not a measurement
      priorBest.get(name).filter(_ >= 0).foreach { prior =>
        if (best >= 0 && best > divergenceK * prior &&
            best - prior > divergenceFloorSec && divergenceBudget > 0) {
          divSentinels ::= ((name, prior, sentinel()))
          while (runs < maxRunsDiverged && best > divergenceK * prior &&
              divergenceBudget > 0) {
            val t = once(recordFailure = false)
            runs += 1
            divergenceBudget -= 1
            if (t >= 0 && t < best) best = t
          }
        }
      }
      (name, first, best, runs)
    }
    val sentinelEnd = sentinel()
    import Gate.jstr
    val timed = results.filter(_._3 >= 0)
    val qs = results.map { case (k, _, v, _) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")
    val runCounts = results.map { case (k, _, _, n) => s"${jstr(k)}:$n" }
      .mkString("{", ",", "}")
    // firstRuns alongside best: makes cold-vs-warm auditable per query
    // (a large firstRun/best ratio is session cold-start, not plan cost)
    val firstRuns = results.map { case (k, f, _, _) => s"${jstr(k)}:$f" }
      .mkString("{", ",", "}")
    val fails = failures.map(jstr).mkString("[", ",", "]")
    val total = timed.map(_._3).sum
    // per-phase wall-times for pipeline_e2e (the one query with ±50%
    // cold-run swings on this box — the artifact attributes the swing
    // to a phase instead of leaving a bare number to argue about).
    // Reflects the LAST run of the query; `best` may be an earlier run.
    // Locale.ROOT formatting throughout: the f"" interpolator uses the
    // default locale, and a comma-decimal locale would render 3,14 —
    // invalid JSON in the committed artifact
    def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val phased = Seq(
      "pipeline_e2e" -> Queries.lastPipelinePhases,
      "mor_delete" -> Queries.lastMorPhases,
      "stream_ingest_parity" -> Queries.lastStreamIngestPhases,
      "stream_sink_parity" -> Queries.lastStreamSinkPhases,
      "ann_recall_real" -> Queries.lastAnnRecallPhases,
      "mv_join_minmax" -> Queries.lastMvJoinMinmaxPhases,
      "embedding_ann_pq" -> Queries.lastAnnPqPhases,
      "pq_retrain_trigger" -> Queries.lastPqTriggerPhases,
      "snapshot_compact" -> Queries.lastCompactStats)
      .filter(_._2.nonEmpty)
    val phases =
      if (phased.isEmpty) ""
      else phased.map { case (q, ps) =>
        ps.map { case (k, v) => s"${jstr(k)}:${f2(v)}" }
          .mkString(s"${jstr(q)}:{", ",", "}")
      }.mkString(""","phases":{""", ",", "}")
    val sentinelJson =
      s""""sentinel":{"start":${f2(sentinelStart)},"end":${f2(sentinelEnd)}}"""
    // per-decile sentinel samples, sweep order: `i` = how many entries
    // (alphabetical) had completed when the sample ran, `at` = the
    // entry about to run
    val sentinelTraceJson = sentinelTrace.reverse.map { case (i, n, sv) =>
      s"""{"i":$i,"at":${jstr(n)},"sec":${f2(sv)}}"""
    }.mkString(""","sentinelTrace":[""", ",", "]")
    // entries that triggered divergence reruns, with the prior best
    // they diverged from and the sentinel timed INSIDE the divergence
    // window — a sentinel well above its cross-round norm attributes
    // the outlier to host load, not the plan
    val divergentJson =
      if (divSentinels.isEmpty) ""
      else divSentinels.reverse.map { case (n, p, sv) =>
        s"${jstr(n)}:{" + s""""prior":${f2(p)},"sentinel":${f2(sv)}}"""
      }.mkString(""","divergent":{""", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fails,"benchRuns":$benchRuns,$sentinelJson$sentinelTraceJson$divergentJson,"runCounts":$runCounts,"firstRuns":$firstRuns$phases,"sf":${jstr(sfDir)}}"""
    // Full JSON first: if a capture window keeps the HEAD of the output
    // this line is complete there.
    println(json)
    // The committed round artifact must be SELF-CONTAINED: the round
    // driver captures only a ~2,000-char TAIL of stdout, and with 100+
    // queries the one-liner above outgrew that window (BENCH_r08/r09
    // kept the tail of the line — unparseable). The full JSON is
    // therefore also written to a file (default BENCH.json in the
    // working dir, committed per round).
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    // LAST line: a complete JSON object sized to fit the tail window
    // (≤ ~1,800 chars). Carries the totals verbatim plus as many
    // per-query times as fit, slowest first (the sub-second tail is
    // what gets dropped); `queriesOmitted`/`queriesOmittedSec` make the
    // truncation explicit and `full` points at the complete artifact.
    val budget = 1800
    val slowestFirst = results.filter(_._3 >= 0).sortBy(-_._3)
    // divergentN in the tail line: the driver's capture window keeps
    // only this compact object, and "how many entries needed
    // divergence reruns" is the one-number contamination signal (the
    // per-entry prior/sentinel detail lives in the full artifact)
    val fixedHead = s"""{"metric":"total","value":$total,"unit":"sec","failures":$fails,"benchRuns":$benchRuns,$sentinelJson,"divergentN":${divSentinels.size},"nQueries":${results.size},"full":${jstr(outFile)},"sf":${jstr(sfDir)},"queries":{"""
    var compactQs = List.empty[String]
    var used = fixedHead.length + 80 // closing braces + omitted fields
    var omitted = 0; var omittedSec = 0.0
    slowestFirst.foreach { case (k, _, v, _) =>
      val frag = s"${jstr(k)}:${f2(v)}"
      if (used + frag.length + 1 <= budget) { compactQs ::= frag; used += frag.length + 1 }
      else { omitted += 1; omittedSec += v }
    }
    val compact = fixedHead + compactQs.reverse.mkString(",") +
      s"""},"queriesOmitted":$omitted,"queriesOmittedSec":${f2(omittedSec)}}"""
    println(compact)
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
