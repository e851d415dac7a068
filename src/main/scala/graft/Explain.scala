package graft
import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: `runMain graft.Explain <query-name> [sfDir]`
  * prints the formatted physical plan of a SparkEntry query — used to
  * check pushdown (`PushedFilters`, `ReadSchema`), join strategies
  * (broadcast vs sort-merge), and whole-stage-codegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
