package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch probe (not part of the library surface). */
object Experiment {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def one(sql: String): Unit = {
      try {
        val r = Graft.execute(spark, sql)
        println(s"OK   $sql -> ${r.map(_.collect().toSeq.take(6)).getOrElse("cmd")}")
      } catch {
        case e: Exception =>
          println(s"FAIL $sql -> ${String.valueOf(e.getMessage).take(150)}")
      }
    }
    one("SELECT (array[4])[1]")
    one("SELECT (array[10,20,30])[2]")
    one("SELECT (array[1])[5]")
    one("SELECT ('{1,2,3}'::int[])[3]")
    one("SELECT * FROM generate_series(1,3)")
    one("SELECT i FROM generate_series(1,3) AS i")
    one("SELECT x FROM generate_series(2,8,3) g(x)")
    one("SELECT * FROM generate_series(5,1)")
    one("SELECT * FROM generate_series(5,1,-2)")
    one("SELECT generate_series(1,3)")
    one("SELECT 'k', generate_series(1,2)")
    one("CREATE TEMP TABLE tmp_exp1 (a int)")
    one("INSERT INTO tmp_exp1 SELECT generate_series(1,4)")
    one("SELECT count(*) FROM tmp_exp1")
    one("SELECT sum(i) FROM tmp_exp1 t JOIN generate_series(1,4) i ON t.a = i")
    one("CREATE TABLE tmp_exp2 (f1 int)")
    one("INSERT INTO tmp_exp2 VALUES (1), (2), (3)")
    one("SELECT * FROM tmp_exp2 a JOIN tmp_exp2 b ON (a.f1 = (SELECT f1 FROM tmp_exp2 c WHERE c.f1 = b.f1 AND c.f1 < 3))")
    one("SELECT * FROM gp_dist_random('tmp_exp2') WHERE f1 = 2")
    one("DROP TABLE tmp_exp1")
    one("DROP TABLE tmp_exp2")
    spark.stop()
  }
}
