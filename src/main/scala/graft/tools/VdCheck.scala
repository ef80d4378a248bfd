object VdCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("vd-check")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val n = graft.SparkEntry.queries("q_video_dedup")(spark, sf).count()
      val nx = graft.SparkEntry.queries("q_media_crossmodal")(spark, sf).count()
      val ni = graft.SparkEntry.queries("q_image_dedup")(spark, sf).count()
      println(s"[vd] $sf video_dedup=$n crossmodal=$nx image_dedup=$ni")
    }
    spark.stop()
  }
}
