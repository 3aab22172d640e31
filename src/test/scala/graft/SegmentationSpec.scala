package graft

import graft.operators.Segmentation
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class SegmentationSpec extends SparkTestBase {
  import spark.implicits._

  test("writeSegments materializes every segment in ONE pass; replay preserves order") {
    val df = (0 until 250).map(i => (i, s"row$i")).toDF("k", "v")
    val staged = tmpDir("seg-staged")
    Segmentation.writeSegments(df, 100, Seq("k"), staged)
    val dirs = new java.io.File(staged).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("segment=")).sorted
    assert(dirs.toSeq == Seq("segment=0", "segment=1", "segment=2"))

    val live = tmpDir("seg-live")
    val n = Segmentation.replay(spark, staged, live, delayMillis = 0)
    assert(n == 3)
    val replayed = spark.read.option("header", "true").csv(s"$live/*")
    assert(replayed.count() == 250)
    // cover property: every key arrives exactly once
    assert(replayed.select("k").distinct().count() == 250)
  }

  test("cosine_sim / vec_dot usable from SQL after registration") {
    VectorOps.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
                vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
  }

  test("session/e3 + near-dup/d5 + bpeish/t7 queries run on fixtures") {
    val dir = "/root/testdata/sf0.001"
    assert(SparkEntry.queries("e3_session_window")(spark, dir).count() > 0)
    assert(SparkEntry.queries("d5_embedding_neardup")(spark, dir).count() > 0)
    assert(SparkEntry.queries("t7_token_bpeish")(spark, dir).count() > 0)
  }
}
