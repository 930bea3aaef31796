package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch probe (not part of the library surface). */
object Experiment {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("exp_wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def one(sql: String): Unit = {
      try {
        val r = Graft.execute(spark, sql)
        println(s"OK   $sql -> ${r.map(_.collect().toSeq.take(6)).getOrElse("cmd")}")
      } catch {
        case e: Exception =>
          println(s"FAIL $sql -> ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    operators.Txn.reset(spark)
    one("DROP TABLE IF EXISTS txn_part")
    one("CREATE TABLE txn_part (v INT, k INT) " +
      "DISTRIBUTED BY (v) PARTITION BY LIST(k) " +
      "(PARTITION p1 VALUES(1), PARTITION p2 VALUES(2), " +
      "PARTITION p3 VALUES(3))")
    println("partCols=" + spark.catalog.listColumns("txn_part").collect()
      .filter(_.isPartition).map(_.name).toSeq)
    one("INSERT INTO txn_part SELECT i, 1 + i % 3 FROM generate_series(1, 90) i")
    one("BEGIN")
    one("DELETE FROM txn_part WHERE k = 2")
    println("regions=" + operators.Txn.snapshotRegions)
    one("ROLLBACK")
    one("DROP TABLE txn_part")
    spark.stop()
  }
}
