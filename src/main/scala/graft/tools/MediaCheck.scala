package graft.tools
object MediaCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("media-check")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    Seq("q_image_phash","q_audio_phash","q_video_mosaic","q_image_dedup","q_video_dedup","q_media_crossmodal").foreach { q =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"[mediacheck] $q%-20s rows=$n%-6d ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    // planted ground truth visibility
    val vd = graft.SparkEntry.queries("q_video_dedup")(spark, dir)
    val planted = vd.filter(org.apache.spark.sql.functions.col("media_b") - org.apache.spark.sql.functions.col("media_a") === graft.operators.Multimodal.DupIdOffset).count()
    println(s"[mediacheck] video planted pairs found: $planted")
    val cm = graft.SparkEntry.queries("q_media_crossmodal")(spark, dir)
    val thumb = cm.filter(org.apache.spark.sql.functions.col("image_id") - org.apache.spark.sql.functions.col("video_id") === graft.operators.Multimodal.ThumbIdOffset).count()
    println(s"[mediacheck] thumbnail matches found: $thumb")
    spark.stop()
  }
}
