package graft

import org.scalatest.funsuite.AnyFunSuite

/** CREATE RULE ALSO/INSTEAD semantics (reference rewriteHandler.c:
  * only INSTEAD rules replace the original query; ALSO rules — PG's
  * default when the keyword is absent — fire IN ADDITION), cascaded
  * rule firing across tables, named trigger drops, and the
  * has_table_privilege existence check. */
class RulesTriggersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sql(s: String) = Graft.execute(spark, s)
  private def rows(s: String): Seq[Seq[Any]] =
    sql(s).get.collect().toSeq.map(r => (0 until r.length).map(r.get))

  test("unqualified DO ALSO rule fires action AND keeps the original insert") {
    sql("DROP TABLE IF EXISTS ralso_t"); sql("DROP TABLE IF EXISTS ralso_log")
    sql("CREATE TABLE ralso_t (a int, b int)")
    sql("CREATE TABLE ralso_log (a int, b int)")
    sql("CREATE RULE r1 AS ON INSERT TO ralso_t DO ALSO " +
      "INSERT INTO ralso_log VALUES (new.a, new.b)")
    sql("INSERT INTO ralso_t VALUES (1, 10), (2, 20)")
    assert(rows("SELECT count(*) FROM ralso_t").head.head == 2L)
    assert(rows("SELECT count(*) FROM ralso_log").head.head == 2L)
    sql("DROP TABLE ralso_t"); sql("DROP TABLE ralso_log")
  }

  test("qualified ALSO rule does not exclude matching rows from the target") {
    sql("DROP TABLE IF EXISTS rqa_t"); sql("DROP TABLE IF EXISTS rqa_log")
    sql("CREATE TABLE rqa_t (a int)")
    sql("CREATE TABLE rqa_log (a int)")
    // no DO keyword modifier at all — PG defaults to ALSO
    sql("CREATE RULE r1 AS ON INSERT TO rqa_t WHERE new.a > 5 DO " +
      "INSERT INTO rqa_log VALUES (new.a)")
    sql("INSERT INTO rqa_t VALUES (1), (9)")
    assert(rows("SELECT a FROM rqa_t ORDER BY a") == Seq(Seq(1), Seq(9)))
    assert(rows("SELECT a FROM rqa_log") == Seq(Seq(9)))
    sql("DROP TABLE rqa_t"); sql("DROP TABLE rqa_log")
  }

  test("qualified INSTEAD rule still claims its rows") {
    sql("DROP TABLE IF EXISTS rqi_t"); sql("DROP TABLE IF EXISTS rqi_c")
    sql("CREATE TABLE rqi_t (a int)")
    sql("CREATE TABLE rqi_c (a int)")
    sql("CREATE RULE r1 AS ON INSERT TO rqi_t WHERE new.a > 5 DO INSTEAD " +
      "INSERT INTO rqi_c VALUES (new.a)")
    sql("INSERT INTO rqi_t VALUES (1), (9)")
    assert(rows("SELECT a FROM rqi_t") == Seq(Seq(1)))
    assert(rows("SELECT a FROM rqi_c") == Seq(Seq(9)))
    sql("DROP TABLE rqi_t"); sql("DROP TABLE rqi_c")
  }

  test("rule action into a child with its own rules cascades") {
    sql("DROP TABLE IF EXISTS rc_a"); sql("DROP TABLE IF EXISTS rc_b")
    sql("DROP TABLE IF EXISTS rc_c")
    sql("CREATE TABLE rc_a (x int)")
    sql("CREATE TABLE rc_b (x int)")
    sql("CREATE TABLE rc_c (x int)")
    sql("CREATE RULE ra AS ON INSERT TO rc_a DO INSTEAD " +
      "INSERT INTO rc_b VALUES (new.x)")
    sql("CREATE RULE rb AS ON INSERT TO rc_b DO ALSO " +
      "INSERT INTO rc_c VALUES (new.x)")
    sql("INSERT INTO rc_a VALUES (7)")
    assert(rows("SELECT count(*) FROM rc_a").head.head == 0L)
    assert(rows("SELECT x FROM rc_b") == Seq(Seq(7)))
    // rc_b's OWN rule must fire even though it ran inside ra's action
    assert(rows("SELECT x FROM rc_c") == Seq(Seq(7)))
    sql("DROP TABLE rc_a"); sql("DROP TABLE rc_b"); sql("DROP TABLE rc_c")
  }

  test("DROP TRIGGER removes only the named trigger") {
    sql("DROP TABLE IF EXISTS trg_t")
    sql("CREATE TABLE trg_t (a int, b int)")
    sql("CREATE FUNCTION trg_f1() RETURNS TRIGGER AS $$ BEGIN " +
      "NEW.a = NEW.a + 100; RETURN NEW; END; $$ LANGUAGE plpgsql")
    sql("CREATE FUNCTION trg_f2() RETURNS TRIGGER AS $$ BEGIN " +
      "NEW.b = NEW.b + 1000; RETURN NEW; END; $$ LANGUAGE plpgsql")
    sql("CREATE TRIGGER t1 BEFORE INSERT ON trg_t FOR EACH ROW " +
      "EXECUTE PROCEDURE trg_f1()")
    sql("CREATE TRIGGER t2 BEFORE INSERT ON trg_t FOR EACH ROW " +
      "EXECUTE PROCEDURE trg_f2()")
    sql("DROP TRIGGER t1 ON trg_t")
    sql("INSERT INTO trg_t VALUES (1, 1)")
    // t1 dropped (no +100), t2 kept (+1000)
    assert(rows("SELECT a, b FROM trg_t") == Seq(Seq(1, 1001)))
    sql("DROP TABLE trg_t")
  }

  test("has_table_privilege: constant true on live tables, errors on missing") {
    sql("DROP TABLE IF EXISTS priv_t")
    sql("CREATE TABLE priv_t (a int)")
    assert(rows("SELECT has_table_privilege('priv_t', 'select')")
      .head.head == true)
    val ex = intercept[Exception] {
      sql("SELECT has_table_privilege('no_such_table_xyz', 'select')")
    }
    assert(ex.getMessage.contains("does not exist"))
    // a spelling inside a string literal must NOT be rewritten
    assert(rows("SELECT 'has_table_privilege(''x'',''y'')'").head.head
      .toString.contains("has_table_privilege"))
    sql("DROP TABLE priv_t")
  }
}
