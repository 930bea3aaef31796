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
        println(s"OK   ${sql.take(80)} -> ${r.map(_.count()).getOrElse(-1L)} rows")
      } catch {
        case e: Exception =>
          println(s"FAIL ${sql.take(80)} -> ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    one("CREATE TABLE sale (cn int, vn int, pn int, dt date, qty int, prc int)")
    one("CREATE TABLE vendor (vn int, vname text, loc text)")
    one("INSERT INTO sale VALUES (1, 10, 100, '1401-03-01', 1, 0)")
    one("INSERT INTO vendor VALUES (10, 'v', 'l')")
    val stmt =
      """SELECT DISTINCT sale.vn,sale.dt,sale.prc, TO_CHAR(COALESCE(STDDEV_SAMP(floor(sale.pn+sale.vn)),0),'99999999.9999999')
        |FROM sale,vendor
        |WHERE sale.vn=vendor.vn
        |GROUP BY GROUPING SETS(CUBE((sale.pn),(sale.dt,sale.qty),(sale.vn,sale.vn,sale.cn),(sale.cn),(sale.pn,sale.vn))),ROLLUP((sale.cn,sale.dt,sale.prc),(sale.pn,sale.pn,sale.cn),(sale.dt,sale.vn,sale.pn),(sale.dt,sale.cn),(sale.dt,sale.prc,sale.pn),(sale.vn,sale.qty)),CUBE((sale.vn,sale.cn),(sale.qty,sale.prc),(sale.qty),(sale.cn,sale.vn),(sale.vn,sale.cn),(sale.qty,sale.cn))""".stripMargin
    // run on a thread with the SAME default stack size the forked test
    // JVM uses, and print the full trace so the guilty regex frame shows
    val t = new Thread(null, () => {
      try {
        val r = Graft.execute(spark, stmt)
        println("OK rows=" + r.map(_.count()).getOrElse(-1L))
      } catch {
        case e: Throwable =>
          println("THROWN " + e.getClass.getName)
          val frames = e.getStackTrace
          frames.filter(f => f.getClassName.startsWith("graft"))
            .take(20).foreach(f => println("  graft frame: " + f))
          frames.take(8).foreach(f => println("  top: " + f))
      }
    }, "probe")
    t.start(); t.join()
    spark.stop()
  }
}
