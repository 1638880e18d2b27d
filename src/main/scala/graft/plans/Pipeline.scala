package graft.plans

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.Tables
import graft.operators.{Dedup, Integrity, Validation}

/** The reference's orchestration as a driver-side sequence (T4;
  * reference: src/step_functions.json:3-94 — ProcessProducts →
  * ProcessOrders → ProcessOrderItems → ArchiveFiles → validation
  * queries). Each step is the corresponding Glue job's logic
  * (product_etl.py / orders_etl.py / order_items_etl.py):
  * schema-enforced CSV scan → validate → [RI for order_items] → dedup →
  * MERGE upsert, with rejects side-written as CSV.
  *
  * Scale notes (100 TB): per-job data flow is one pass —
  * validation is shuffle-free, RI joins broadcast the dim key set, dedup
  * is the only keyed shuffle, and the upsert rewrites only touched
  * partitions. The driver does no data work (no collect in the loop);
  * post-load gates are aggregates pushed to the engine and run
  * concurrently (T7, step_functions.json:183-237).
  */
object Pipeline {

  /** One ETL job spec (≈ one Glue job in the reference).
    *
    * `clusterCol` is the reference's partition key (`date` /
    * `department_id`, orders_etl.py:74) — kept as the table's RANGE
    * CLUSTERING key with manifest min/max stats rather than Hive
    * directory partitioning. Same pruning (a date predicate skips
    * files on manifest metadata alone), none of the small-file
    * explosion: the reference's daily `date` key fans a single batch
    * out to thousands of near-empty partition dirs (measured ~2,400
    * dirs × 2 tables ≈ 70% of the whole pipeline's wall time in
    * filesystem metadata), while the clustered layout writes a
    * handful of right-sized files per batch and the stats-scoped
    * merge still rewrites only the files the batch's date range
    * touches — Iceberg hidden-partitioning / Delta liquid-clustering
    * shape, the one that survives 100 TB. */
  final case class JobSpec(
      name: String,
      schema: StructType,
      primaryKey: String,
      clusterCol: String,
      /** (fact FK column, dim table name, dim key column) — checked
        * against the freshly-written dim (order_items_etl.py:66-90). */
      foreignKeys: Seq[(String, String, String)] = Nil)

  /** The reference's three jobs, in dependency order (T4). */
  val referenceJobs: Seq[JobSpec] = Seq(
    JobSpec("products", Tables.products, "product_id", "department_id"),
    JobSpec("orders", Tables.orders, "order_id", "date"),
    JobSpec("order_items", Tables.orderItems, "id", "date",
      foreignKeys = Seq(
        ("order_id", "orders", "order_id"),
        ("product_id", "products", "product_id"))))

  final case class JobResult(
      name: String, read: Long, valid: Long, rejected: Long,
      orphaned: Long, loaded: Long)

  /** T5 — retry with exponential backoff (reference:
    * step_functions.json:14-23 — 3 attempts, 30s interval, ×2 backoff
    * per Glue job). The warehouse tables commit atomically
    * (SnapshotTable: one manifest rename per upsert), so a crashed
    * attempt leaves the previous snapshot fully visible and the retry
    * simply re-runs the idempotent merge — transient failures must
    * actually re-run, not fail the pipeline.
    *
    * Reject side-writes that happened before the failure re-append on
    * retry, exactly as a re-run Glue job re-appends its reject objects
    * in the reference. `sleep` is injectable for tests. */
  def retry[A](name: String, attempts: Int = 3, initialDelayMs: Long = 30000,
               sleep: Long => Unit = Thread.sleep)(body: => A): A = {
    var i = 1
    var delay = initialDelayMs
    var result: Option[A] = None
    while (result.isEmpty) {
      try result = Some(body)
      catch {
        case scala.util.control.NonFatal(e) =>
          if (i >= attempts) throw e
          println(s"[pipeline] $name attempt $i/$attempts failed " +
            s"(${e.getMessage}); retrying in ${delay}ms")
          sleep(delay)
          delay *= 2
          i += 1
      }
    }
    result.get
  }

  /** `phases` — wall seconds per pipeline phase (`"<job>.<phase>"` for
    * per-job read/validate/ri/upsert, plus run-level `archive` /
    * `vacuum` / `gates`), recorded for the bench artifact so cold-run variance can
    * be attributed to a phase instead of guessed at. Defaulted so
    * existing positional constructions keep compiling. */
  final case class Report(jobs: Seq[JobResult], gatesPassed: Boolean,
                          phases: Seq[(String, Double)] = Nil)

  /** Run the full pipeline: for each job, raw CSVs under
    * `$rawDir/<name>/` are validated, RI-checked, deduped and
    * merged into `$warehouseDir/<name>`; rejects append under
    * `$rejectedDir/<name>`; raws then move to `$archivedDir` (T3); and
    * the post-load COUNT(*)/LIMIT 10 gates run in parallel (A3/T7).
    *
    * `onTerminal` is the T8 notification hook (reference:
    * step_functions.json:249-269 publishes success/failure to SNS):
    * invoked EXACTLY ONCE per run, with `Success(report)` after the
    * gates resolve or `Failure(cause)` when a job exhausts its retries
    * — the driver-side seam where a deployment wires its SNS/pager
    * publish. A hook that itself throws does not mask the outcome. */
  def run(spark: SparkSession, rawDir: String, warehouseDir: String,
          rejectedDir: String, archivedDir: String,
          jobs: Seq[JobSpec] = referenceJobs,
          retryAttempts: Int = 3, retryDelayMs: Long = 30000,
          onTerminal: scala.util.Try[Report] => Unit = _ => ()): Report = {
    val outcome = scala.util.Try(runJobs(spark, rawDir, warehouseDir,
      rejectedDir, archivedDir, jobs, retryAttempts, retryDelayMs))
    try onTerminal(outcome)
    catch {
      case scala.util.control.NonFatal(e) =>
        println(s"[pipeline] onTerminal hook failed: ${e.getMessage}")
    }
    outcome.get
  }

  private def runJobs(spark: SparkSession, rawDir: String, warehouseDir: String,
          rejectedDir: String, archivedDir: String,
          jobs: Seq[JobSpec],
          retryAttempts: Int, retryDelayMs: Long): Report = {
    // SnapshotTable over LakehouseTable here: the manifest commit
    // (parallel per-file metadata + one rename) makes each job's
    // upsert atomic, which the retry loop relies on. CLUSTERED layout
    // over Hive partitioning (see JobSpec.clusterCol): the daily date
    // key stays prunable via manifest min/max stats without fanning
    // every batch out to thousands of near-empty partition dirs.
    val tables = jobs.map { j =>
      j.name -> SnapshotTable(spark, s"$warehouseDir/${j.name}", j.primaryKey,
        partitionCol = None, Some(Tables.asNullable(j.schema)),
        statsCols = Seq(j.clusterCol), clusterBy = Seq(j.clusterCol))
    }.toMap
    // one read per freshly-written table, shared by downstream RI checks
    // and the post-load gates. Only DIM tables (those some later job's
    // foreign keys probe) are PERSISTED: the RI path re-reads exactly
    // those, while a fact table is only touched again by its two light
    // gate queries — at 100 TB caching the fact table is pure memory
    // churn for nothing (the manifest-planned re-read is cheap).
    val dimNames = jobs.flatMap(_.foreignKeys.map(_._2)).toSet
    // TrieMap: concurrently-running jobs of one wave each publish their
    // own entry (distinct keys — a job owns its table)
    val written = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
    // phase wall-times for the Report; jobs in one wave run concurrently,
    // so the sink must be thread-safe. Seq-of-pairs (not a map) keeps
    // arrival order for the artifact.
    val phaseLog = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]
    // released in the finally below — also when a job exhausts its
    // retries, so earlier jobs' caches don't outlive a failed pipeline
    try {

    def runOne(job: JobSpec): JobResult =
      retry(job.name, retryAttempts, retryDelayMs) {
      val t0 = System.nanoTime()
      var lastLap = t0
      // laps buffer per ATTEMPT and flush into phaseLog only on
      // success: a retried job would otherwise publish its failed
      // attempts' partial phases too — duplicate keys in the bench
      // artifact's phases map, double-counted cold cost
      val attemptLaps = scala.collection.mutable.Buffer.empty[(String, Double)]
      def lap(tag: String): Unit = {
        val now = System.nanoTime()
        attemptLaps += ((s"${job.name}.$tag", (now - lastLap) / 1e9))
        lastLap = now
        println(f"[pipeline] ${job.name} $tag ${(now - t0) / 1e9}%.1fs")
      }
      val raw = Tables.readCsv(spark, job.schema, s"$rawDir/${job.name}/")
      val readCount = raw.count()
      lap("read")

      // validate (§2.12) — one cached pass, rejects written once (K3)
      val vr = Validation.validate(raw, job.schema, job.primaryKey)
      // unpersist on the FAILURE path too: a failed attempt otherwise
      // leaves its cached blocks behind and each retry stacks more
      val cachedKeys = scala.collection.mutable.Buffer
        .empty[org.apache.spark.sql.Dataset[_]]
      try {
        // count first: the reject count then comes free (read − valid)
        // and writeRejected skips its emptiness probe — one less job
        // over the cached validation split
        val validCount = vr.valid.count()
        Validation.writeRejected(vr.rejected, s"$rejectedDir/${job.name}",
          knownCount = Some(readCount - validCount))
        lap("validate")

        // RI against the freshly-written dims (J1/J2) — semi/anti split;
        // the dim key set is persisted so the orphan count and the upsert
        // lineage don't each re-list + re-scan the partitioned dim table
        // ALL FK probes in ONE cached pass. Each dim's key set
        // left-joins with its own hit flag (null-unsafe: null/missing
        // FK rows get a null flag → orphans, exactly the anti-join
        // semantics, and FK i applies only to rows that passed FKs
        // < i, preserving the chained-split contract); every orphan
        // count comes from ONE aggregate over the materialization, and
        // the per-FK reject writes plus the final upsert read the same
        // cache. The previous per-FK semi/anti PAIR re-executed the
        // whole upstream chain in every consumer — the write job alone
        // re-ran every FK join plus the dedup. O(batch) rows cached,
        // released in the finally. AQE still picks broadcast-vs-
        // shuffle per dim size; a FORCED broadcast of orders' distinct
        // keys would be O(orders table) driver memory and cannot hold
        // at the 100 TB shape.
        import org.apache.spark.sql.functions.{col => c, lit, sum, when}
        var kept = vr.valid
        var orphaned = 0L
        if (job.foreignKeys.nonEmpty) {
          val cols = kept.columns.toIndexedSeq.map(c)
          var joined = kept
          val hits = job.foreignKeys.map { case (fk, dimName, dimKey) =>
            // distinct() only when the FK probes a NON-key dim column:
            // when dimKey IS the dim table's primary key (the reference
            // shape for both FKs) the merged table already holds one
            // row per key — dropping the redundant distinct removes a
            // full shuffle + two HashAggregates per FK from the RI path
            // (guide §2.4, "a distinct on data that is already unique");
            // uniqueness is load-bearing for the left_outer fan-out and
            // guaranteed by the PK merge, not assumed from the batch
            val dimRead = written.getOrElse(dimName, tables(dimName).read)
              .select(c(dimKey).as(fk))
            val keys =
              if (tables(dimName).primaryKey == dimKey) dimRead
              else dimRead.distinct()
            val hit = s"__graft_ri_hit_$fk"
            joined = joined.join(
              keys.withColumn(hit, lit(true)), Seq(fk), "left_outer")
            hit
          }
          val marked = joined.persist()
          cachedKeys += marked
          // one aggregate fills the cache AND yields every FK's orphan
          // count: orphan(i) = passed FKs < i, missed FK i
          def orphanCond(i: Int) =
            hits.take(i).map(c(_)).foldLeft(c(hits(i)).isNull)(
              (acc, prev) => acc && prev)
          val counts = marked.agg(
            sum(when(orphanCond(0), 1L).otherwise(0L)),
            hits.indices.drop(1).map(i =>
              sum(when(orphanCond(i), 1L).otherwise(0L))): _*).head()
          job.foreignKeys.zipWithIndex.foreach { case ((fk, _, _), i) =>
            val n = if (counts.isNullAt(i)) 0L else counts.getLong(i)
            if (n > 0)
              Validation.writeRejected(
                marked.filter(orphanCond(i)).select(cols: _*),
                s"$rejectedDir/${job.name}_ri_$fk", knownCount = Some(n))
            orphaned += n
          }
          kept = marked.filter(hits.map(c(_)).reduce(_ && _))
            .select(cols: _*)
        }
        lap("ri")

        // dedup (A2) then MERGE upsert (K2)
        val deduped = Dedup.arbitrary(kept, Seq(job.primaryKey))
        tables(job.name).upsert(deduped)
        val fresh = tables(job.name).read
        written(job.name) =
          if (dimNames(job.name)) fresh.persist() else fresh
        lap("upsert")
        attemptLaps.foreach(phaseLog.add) // the attempt SUCCEEDED
        JobResult(job.name, readCount, validCount,
          readCount - validCount, orphaned, loaded = -1L)
      } finally {
        vr.unpersist()
        cachedKeys.foreach(_.unpersist())
      }
      }

    // Topological WAVES: a job waits only for the tables its foreign
    // keys probe; everything else in a wave runs CONCURRENTLY in the
    // one session (Spark's scheduler interleaves their stages over the
    // same executor pool — products ∥ orders here, then order_items).
    // Dependency ORDER (T4) is exactly preserved: no job starts before
    // every table it reads has committed, and a wave failure (after
    // per-job retries) aborts before any dependent starts. At 100 TB
    // the pipeline's wall time is its critical path, not the sum of
    // its jobs — sequential execution left the cluster idle for every
    // independent load.
    val jobNames = jobs.map(_.name).toSet
    val done = scala.collection.mutable.Set.empty[String]
    val resultsByName = scala.collection.mutable.Map.empty[String, JobResult]
    var remaining = jobs
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(
        _.foreignKeys.forall { case (_, dim, _) =>
          done(dim) || !jobNames(dim) })
      require(ready.nonEmpty, "dependency cycle among pipeline jobs: " +
        remaining.map(_.name).mkString(", "))
      // SETTLE every job in the wave before acting on any failure:
      // Future.sequence fails fast, which would run the finally's
      // cache cleanup (and the terminal hook) while sibling jobs are
      // still mid-flight — a sibling's later `written(...) = persist()`
      // would then leak its cache for the session lifetime, and work
      // would keep committing after the pipeline reported failure.
      // Waiting for the stragglers costs nothing on success and makes
      // failure cleanup deterministic.
      val wave = Await.result(
        Future.sequence(ready.map(j =>
          Future(scala.util.Try(j.name -> runOne(j))))),
        Duration.Inf)
      wave.collectFirst { case scala.util.Failure(e) => throw e }
      wave.foreach {
        case scala.util.Success((n, r)) => resultsByName(n) = r; done += n
        case _ => ()
      }
      remaining = blocked
    }
    val results = jobs.map(j => resultsByName(j.name))

    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      phaseLog.add((tag, (System.nanoTime() - t0) / 1e9))
      r
    }
    timed("archive")(archive(spark, rawDir, archivedDir))

    // post-load validation gates, fanned out concurrently (A3/T7); the
    // COUNT(*) gate doubles as the per-table loaded count. r18: the
    // count is answered from MANIFEST METADATA — Σ(file:rows) −
    // Σ(DV cardinality) over the just-committed snapshot, the same
    // exact contract [[graft.sources.MetadataOnlyCount]] gives SQL
    // COUNT(*) — so the three gates cost O(manifest) driver work, not
    // three full table scans (at 100 TB a post-load COUNT(*) scan per
    // table would dwarf the loads themselves). A manifest predating
    // row-count recording falls back to the scan.
    jobs.foreach(j =>
      written.getOrElse(j.name, tables(j.name).read)
        .createOrReplaceTempView(j.name))
    val gates = jobs.map { j =>
      Future {
        val n = SnapshotTable.metadataRowCount(tables(j.name).candidateFiles())
          .getOrElse(spark.sql(s"SELECT COUNT(*) AS cnt FROM ${j.name}")
            .head().getLong(0))
        // the LIMIT 10 probe is logically implied by n > 0, but it is
        // the reference's OWN second validation query
        // (step_functions.json:193) — kept for behavioral parity; its
        // cost is one 10-row scan
        val sample = spark.sql(s"SELECT * FROM ${j.name} LIMIT 10").count()
        (n, n > 0 && sample > 0)
      }
    }
    val gateResults =
      timed("gates")(Await.result(Future.sequence(gates), Duration.Inf))
    val withLoaded = results.zip(gateResults).map { case (r, (n, _)) =>
      r.copy(loaded = n)
    }
    // bound version history: each run commits a full rewrite per table,
    // so without reclamation the warehouse grows by O(table files) per
    // run and every later merge pays for the garbage. Two versions stay
    // time-travelable; retention 0 is safe here because each table has
    // exactly one writer (the job that owns it, reference semantics —
    // a shared-table deployment would keep the default retention).
    if (gateResults.forall(_._2))
      timed("vacuum")(
        tables.values.foreach(_.vacuum(keepVersions = 2, retentionMs = 0)))
    Report(withLoaded, gateResults.forall(_._2),
      phases = phaseLog.toArray(Array.empty[(String, Double)]).toSeq)

    } finally written.values.foreach(_.unpersist())
  }

  /** T3 — archive-after-success: move everything under raw/ to archived/
    * (reference: lambda_function.py:11-52; its delete is commented out,
    * making "move" a copy — we do the real move the code intends).
    *
    * Directory collisions MERGE: run 2's `raw/products` must land its
    * files inside the `archived/products` run 1 created — a bare
    * dir-level rename either nests (HDFS) or returns false (local FS),
    * and an UNCHECKED false silently leaves raws behind to be
    * re-ingested next run. File-name collisions get a unique prefix;
    * every rename result is checked. */
  def archive(spark: SparkSession, rawDir: String, archivedDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(rawDir)
    val fs = src.getFileSystem(conf)
    if (!fs.exists(src)) return
    def moveInto(from: Path, destDir: Path): Unit = {
      if (!fs.exists(destDir)) fs.mkdirs(destDir)
      fs.listStatus(from).foreach { st =>
        if (st.isDirectory) moveInto(st.getPath, new Path(destDir, st.getPath.getName))
        else {
          val plain = new Path(destDir, st.getPath.getName)
          val dest =
            if (!fs.exists(plain)) plain
            else new Path(destDir,
              s"${System.currentTimeMillis()}-${st.getPath.getName}")
          if (!fs.rename(st.getPath, dest))
            throw new IllegalStateException(
              s"archive failed: ${st.getPath} -> $dest")
        }
      }
      // the delete must be as loud as the renames: a false return (a
      // leftover the walk didn't move — e.g. a dot-file the next run
      // would half-re-process) is exactly the silent-partial-archive
      // class this rewrite exists to kill
      if (!fs.delete(from, false) && fs.exists(from))
        throw new IllegalStateException(
          s"archive failed: source dir $from not empty after moving " +
            s"its files (leftover: ${fs.listStatus(from).take(3)
              .map(_.getPath.getName).mkString(", ")})")
    }
    moveInto(src, new Path(archivedDir))
    fs.mkdirs(src) // keep the landing root for the next arrival
  }
}
