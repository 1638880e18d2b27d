package graft

import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

/** r18 sub-second-tail audit: for a sample of tail bench entries,
  * split the measured wall into (plan build = the queries() call),
  * (first action = analyze+optimize+codegen+execute), and (repeat
  * action = execute only, warm plan). The delta between first and
  * repeat action is per-entry fixed compile cost the bench's
  * min-of-N cannot amortize away because each run rebuilds the frame. */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val spark = Gate.session("32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "limit_topk", "set_ops", "funnel_steps_windowed",
      "multimodal_audio_resample", "multimodal_features", "bpe_train",
      "validation_rejected", "multimodal_image_neardup", "zorder_scan", "doc_repetition")
    def t[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    names.foreach(n => { // session warmup: one full pass untimed
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.agg(bit_xor(xxhash64(df.columns.toIndexedSeq.map(col): _*))).head()
    })
    println(f"[tail] ${"entry"}%-28s build firstAct repeatAct total")
    names.foreach { n =>
      val (tBuild, df) = t(SparkEntry.queries(n)(spark, sfDir))
      def act() = t(df.agg(bit_xor(xxhash64(
        df.columns.toIndexedSeq.map(col): _*))).head())._1
      val tFirst = act()
      val tRepeat = math.min(act(), act())
      println(f"[tail] $n%-28s ${tBuild}%5.2f ${tFirst}%8.2f " +
        f"${tRepeat}%9.2f ${tBuild + tFirst}%5.2f")
    }
    spark.stop()
  }
}
