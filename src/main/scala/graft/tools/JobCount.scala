package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger
object JobCount {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = n.incrementAndGet()
    })
    spark.range(100).count()
    for (q <- args.toSeq) {
      // warm staging first so job counts measure the steady-state build
      graft.SparkEntry.queries(q)(spark, d).count()
      Thread.sleep(300); n.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[jobcount] $q%-24s jobs=${n.get}%3d  time=$dt%.3f")
    }
    spark.stop()
  }
}
