package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftStrings

/** Semantics of the custom Catalyst expressions (SURVEY §7.2 gap fns). */
class ExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("jsonb_contains: recursive @> semantics per JsonbDeepContains") {
    import graft.functions.JsonbDeep.contains
    // nested object recursion
    assert(contains("""{"a":{"b":{"c":1},"d":2}}""", """{"a":{"b":{"c":1}}}"""))
    assert(!contains("""{"a":{"b":{"c":1}}}""", """{"a":{"b":{"c":2}}}"""))
    assert(!contains("""{"a":{"b":1}}""", """{"a":{"b":1,"x":1}}"""))
    // empty object/array needles are contained in any object/array
    assert(contains("""{"a":1}""", "{}"))
    assert(contains("""[1,2]""", "[]"))
    // array containment: every needle element in SOME target element
    assert(contains("""[1,2,3]""", "[3,1]"))
    assert(!contains("""[1,2,3]""", "[4]"))
    assert(contains("""{"t":[{"k":1},{"k":2}]}""", """{"t":[{"k":2}]}"""))
    // top-level array contains a primitive, but NOT nested (PG special case)
    assert(contains("""[1,2]""", "1"))
    assert(!contains("""{"a":[1,2]}""", """{"a":1}"""))
    // numbers compare numerically, not textually
    assert(contains("""{"n":1.0}""", """{"n":1}"""))
    assert(!contains("""{"n":"1"}""", """{"n":1}"""))
    // scalar type mismatches
    assert(!contains("""{"b":true}""", """{"b":"true"}"""))
    // SQL surface through codegen
    Tables.register(spark, TestSpark.sf0001)
    assert(spark.sql(
      """SELECT jsonb_contains('{"a":{"b":1}}', '{"a":{}}') AS c""")
      .head().getBoolean(0))
  }

  test("trigram similarity: identical, near, disjoint, empty") {
    assert(GraftStrings.trigramSimilarity("abc", "abc") == 1.0)
    // '  abc ' grams {  a, ab,abc,bc }, '  abd ' -> inter {  a, ab}, union 6
    assert(math.abs(GraftStrings.trigramSimilarity("abc", "abd") - 2.0 / 6) < 1e-15)
    assert(GraftStrings.trigramSimilarity("abc", "xyz") == 0.0)
    assert(GraftStrings.trigramSimilarity("", "") == 1.0) // both pad to '   '
    // case-insensitive by construction
    assert(GraftStrings.trigramSimilarity("ABC", "abc") == 1.0)
  }

  test("similarity() SQL surface + null handling + codegen path") {
    val df = Seq(("hello world", "hello world"), ("hello world", "help word"),
      (null, "x")).toDF("a", "b")
    val out = df.selectExpr("similarity(a, b) AS s").collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).getDouble(0) > 0.2 && out(1).getDouble(0) < 1.0)
    assert(out(2).isNullAt(0))
  }

  test("simhash64: deterministic, permutation-insensitive-ish, null-safe") {
    val h1 = GraftStrings.simhash64("the quick brown fox jumps")
    assert(h1 == GraftStrings.simhash64("the quick brown fox jumps"))
    // one-token change flips few bits
    val h2 = GraftStrings.simhash64("the quick brown fox leaps")
    assert(java.lang.Long.bitCount(h1 ^ h2) < 24)
    // disjoint text is far
    val h3 = GraftStrings.simhash64("zzz yyy xxx www vvv")
    assert(java.lang.Long.bitCount(h1 ^ h3) > 10)
    val r = Seq(Tuple1[String](null)).toDF("t").selectExpr("simhash64(t)").head()
    assert(r.isNullAt(0))
  }

  test("linear_interpolate: midpoint, degenerate, null propagation") {
    val rows = spark.sql(
      """SELECT linear_interpolate(15.0, 10.0, 100.0, 20.0, 200.0) AS mid,
        |       linear_interpolate(15.0, 10.0, 100.0, 10.0, 999.0) AS degen,
        |       linear_interpolate(10.0, 10.0, 100.0, 10.0, 100.0) AS pin,
        |       linear_interpolate(15.0, 10.0, 100.0, CAST(NULL AS DOUBLE), 200.0) AS nul
        |""".stripMargin).head()
    assert(rows.getDouble(0) == 150.0)
    // equal abscissas: NULL unless x == x0 AND y0 == y1
    // (interpolate.c linterp_abscissa eq_bounds/eq_abscissas)
    assert(rows.isNullAt(1))
    assert(rows.getDouble(2) == 100.0)
    assert(rows.isNullAt(3))
  }

  test("lang_id: CJK detection and stopword scoring") {
    val df = Seq("the cat and the dog is in a house that is big",
      "el gato y la casa de que los perros en un dia",
      "中文文本内容测试").toDF("t")
    val out = df.selectExpr("lang_id(t) AS l").collect().map(_.getString(0))
    assert(out(0) == "en")
    assert(out(1) == "es")
    assert(out(2) == "zh")
  }

  test("wavg aggregator matches manual decimal formula") {
    val df = Seq((10.0, 2.0), (20.0, 3.0), (30.0, 5.0)).toDF("x", "w")
    df.createOrReplaceTempView("wavg_in")
    val got = spark.sql("SELECT wavg(x, w) FROM wavg_in").head().getDouble(0)
    assert(math.abs(got - (10 * 2 + 20 * 3 + 30 * 5) / 10.0) < 1e-12)
  }

  test("to_char_pg numeric templates (formatting.c subset)") {
    val r = spark.sql(
      """SELECT to_char_pg(1234.5, 'FM9,999.00') AS a,
        |       to_char_pg(-12.34, 'FM9999.99') AS b,
        |       to_char_pg(0.5, 'FM990.99') AS c,
        |       to_char_pg(1234567.0, '9999') AS d,
        |       to_char_pg(45.0, 'FM$999.00') AS e""".stripMargin).head()
    assert(r.getString(0) == "1,234.50")
    assert(r.getString(1) == "-12.34")
    assert(r.getString(2) == "0.50")
    assert(r.getString(3) == "####") // template overflow, PG-style
    assert(r.getString(4) == "$45.00")
  }

  test("german_stem follows the published snowball German algorithm") {
    import graft.functions.GermanStemmer.stem
    // hand-derived through the published steps (regions, suffix groups,
    // niss proviso, st-ending, d-suffixes, umlaut strip)
    val pairs = Seq(
      "laufen" -> "lauf",          // step1(b) en in R1
      "kinder" -> "kind",          // step1(a) er
      "kindern" -> "kind",         // step1(a) ern (longest wins)
      "häuser" -> "haus",          // er + umlaut strip
      "hauses" -> "haus",          // es
      "geheimnisse" -> "geheimnis", // e + the niss proviso
      "kleinste" -> "klein",       // e, then step2 st after valid ending
      "aufeinander" -> "aufeinand",
      "bezeichnung" -> "bezeichn", // step3 ung in R2
      "schönheit" -> "schonheit",  // heit NOT in R2 -> kept, umlaut strips
      "könig" -> "konig",          // ig not in R2 -> kept
      "freundlich" -> "freundlich", // lich NOT in R2 (R2 starts at 9)
      "widerlich" -> "wid",        // lich in R2, then er in R1
      "möglichkeit" -> "moglich",  // keit in R2 (lich survives: not in R2)
      "verstehen" -> "versteh",    // en
      "straße" -> "strass",        // ß -> ss, then e
      "trauung" -> "trauung",      // marked U blocks; ung not in R2
      "und" -> "und", "der" -> "der") // too short / no suffix
    for ((w, want) <- pairs)
      assert(stem(w) == want, s"stem($w) = ${stem(w)}, want $want")
    // codegen expression + the german lexize configuration
    val r = spark.sql("SELECT german_stem('Kindern') AS a").head()
    assert(r.getString(0) == "kind")
    import graft.functions.TsLexize
    val lx = spark.sql("SELECT 1").select(
      TsLexize.lexize(org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.lit(
          "die Kinder laufen und die Häuser"), " "), "german").as("l")).head()
    assert(lx.getSeq[String](0) == Seq("kind", "lauf", "haus"))
    assert(TsLexize.stemTerms(Seq("häusern", "laufen"), "german") ==
      Seq("haus", "lauf"))
  }

  test("french_stem follows the published snowball French algorithm") {
    import graft.functions.FrenchStemmer.stem
    // hand-derived through the published steps (prelude marking, RV
    // provisos, suffix groups and their chains, verb steps, residual
    // step, undouble, un-accent)
    val pairs = Seq(
      "continuellement" -> "continuel", // ement in RV, then undouble ell
      "majestueux" -> "majestu",        // eux in R2
      "chanterions" -> "chant",         // step2b erions in RV
      "finissions" -> "fin",            // step2a issions, non-vowel in RV
      "évidemment" -> "évident",        // emment -> ent in RV
      "sensibilité" -> "sensibil",      // ité in R2
      "chapeaux" -> "chapeau",          // eaux -> eau
      "animaux" -> "animal",            // aux -> al in R1
      "jouer" -> "jou",                 // prelude joUer, step2b er in RV
      "yeux" -> "yeux",                 // Yeux: eux not in R2; unmark
      "aimables" -> "aimabl",           // step4: s off, then e in RV
      "nationalisation" -> "nationalis", // ation in R2, no ic chain
      "diplomatiqUes" -> "diplomat",    // hmm: exercised via lexize below
      "volontairement" -> "volontair",  // ement in RV, no chain applies
      "et" -> "et", "de" -> "de")       // too short
    for ((w, want) <- pairs if w != "diplomatiqUes")
      assert(stem(w) == want, s"stem($w) = ${stem(w)}, want $want")
    // iqUe chain through the prelude: diplomatiques -> prelude leaves
    // 'qu' marked -> iqUes matches in R2 -> diplomat
    assert(stem("diplomatiques") == "diplomat",
      s"got ${stem("diplomatiques")}")
    // codegen expression registered
    val r = spark.sql("SELECT french_stem('Chanterions') AS a").head()
    assert(r.getString(0) == "chant")
    import graft.functions.TsLexize
    assert(TsLexize.stemTerms(Seq("chapeaux", "chanterions"), "french") ==
      Seq("chapeau", "chant"))
  }

  test("porter_stem matches the published algorithm's examples (Porter 1980)") {
    import graft.functions.PorterStemmer.stem
    // step-by-step examples from the paper, carried to the final stem
    val pairs = Seq(
      // 1a
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      // 1b + cleanup
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file",
      // 1c
      "happy" -> "happi", "sky" -> "sky",
      // 2
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "digitizer" -> "digit",
      "differently" -> "differ", "vilely" -> "vile",
      "analogously" -> "analog", "vietnamization" -> "vietnam",
      "predication" -> "predic", "operator" -> "oper",
      "feudalism" -> "feudal", "decisiveness" -> "decis",
      "hopefulness" -> "hope", "callousness" -> "callous",
      "formality" -> "formal", "sensitivity" -> "sensit",
      "sensibility" -> "sensibl",
      // 3
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electricity" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      // 4
      "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "homologou" -> "homolog",
      "communism" -> "commun", "activate" -> "activ",
      "angularity" -> "angular", "effective" -> "effect",
      "bowdlerize" -> "bowdler",
      // 5
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll",
      // the paper's own worked multi-step examples
      "generalizations" -> "gener", "oscillators" -> "oscil")
    for ((w, want) <- pairs)
      assert(stem(w) == want, s"stem($w) = ${stem(w)}, want $want")
    // as a codegen expression, and the lexize chain drops stopwords
    val r = spark.sql("SELECT porter_stem('Querying') AS a").head()
    assert(r.getString(0) == "queri")
    import graft.functions.TsLexize
    val lx = spark.sql("SELECT 1").select(
      TsLexize.lexize(org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.lit(
          "the merges of a querying filter"), " ")).as("l")).head()
    assert(lx.getSeq[String](0) == Seq("merg", "queri", "filter"))
    assert(TsLexize.stemTerms(Seq("Querying", "the", "merges")) ==
      Seq("queri", "merg"))
    // to_tsquery family built on the same dictionary
    assert(TsLexize.plaintoTsquery("the Querying of merges") == "queri & merg")
    assert(TsLexize.phrasetoTsquery("big data queries") == "big <-> data <-> queri")
    // the generated tsquery strings run through the parser/compiler
    val stemmed = spark.sql("SELECT 1").select(
      graft.functions.TsLexize.lexize(org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.lit("big data query engine"), " ")).as("l"))
    assert(stemmed.where(graft.functions.Ranges.tsMatchQuery(
      org.apache.spark.sql.functions.col("l"),
      TsLexize.phrasetoTsquery("big data queries"))).count() == 1)
    // phraseto keeps original word distances across dropped stopwords
    // (PG: phraseto_tsquery('fat of rats') = 'fat <2> rat')
    assert(TsLexize.phrasetoTsquery("fat of rats") == "fat <2> rat")
    assert(TsLexize.phrasetoTsquery("the fat of the rats") == "fat <3> rat")
    assert(TsLexize.phrasetoTsquery("of the") == "")
    // websearch grammar: AND words, quoted phrases, OR, -negation
    assert(TsLexize.websearchToTsquery("big data") == "big & data")
    assert(TsLexize.websearchToTsquery("\"big data\" engine")
      == "big <-> data & engin")
    assert(TsLexize.websearchToTsquery("cats OR dogs") == "cat | dog")
    assert(TsLexize.websearchToTsquery("scan -merges") == "scan & !(merg)")
    assert(TsLexize.websearchToTsquery("scan -\"hash join\"")
      == "scan & !(hash <-> join)")
    // always-succeeds contract: unclosed quote, stopword-only atoms
    assert(TsLexize.websearchToTsquery("\"big data") == "big <-> data")
    assert(TsLexize.websearchToTsquery("the of") == "")
    assert(TsLexize.websearchToTsquery("scan OR the") == "scan")
    // the generated strings compile and match positionally
    val ws = spark.sql("SELECT 1").select(
      graft.functions.TsLexize.lexize(org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.lit("big data query engine"), " ")).as("l"))
    assert(ws.where(graft.functions.Ranges.tsMatchQuery(
      org.apache.spark.sql.functions.col("l"),
      TsLexize.websearchToTsquery("\"big data\" -merges"))).count() == 1)
    assert(ws.where(graft.functions.Ranges.tsMatchQuery(
      org.apache.spark.sql.functions.col("l"),
      TsLexize.websearchToTsquery("\"data big\""))).count() == 0)
  }

  test("uuid v3/v5: RFC 4122 published vectors for the DNS namespace") {
    import graft.functions.UuidOssp
    import org.apache.spark.sql.functions.lit
    val r = spark.sql("SELECT 1").select(
      UuidOssp.uuidV3(UuidOssp.NamespaceDns, lit("www.example.com")).as("v3"),
      UuidOssp.uuidV5(UuidOssp.NamespaceDns, lit("www.example.com")).as("v5"),
      UuidOssp.uuidV3(UuidOssp.NamespaceDns, lit("python.org")).as("v3py"))
      .head()
    // the widely-published reference vectors (RFC 4122 appendix style,
    // reproduced in the Python uuid module docs)
    assert(r.getString(0) == "5df41881-3aed-3515-88a7-2f4a814cf09e")
    assert(r.getString(1) == "2ed6657d-e927-568b-95e1-2665a8aea6a2")
    assert(r.getString(2) == "6fa459ea-ee8a-3ca4-894e-db77e160355e")
  }

  test("soundex: re-derivation pinned to published examples, agrees with builtin") {
    import graft.functions.Soundex.soundexRef
    // the canonical American Soundex examples (Knuth TAOCP vol.3 §6;
    // the same set the fuzzystrmatch docs use)
    assert(soundexRef("Robert") == "R163")
    assert(soundexRef("Rupert") == "R163")
    assert(soundexRef("Ashcraft") == "A261") // H transparent to the digit run
    assert(soundexRef("Ashcroft") == "A261")
    assert(soundexRef("Tymczak") == "T522")
    assert(soundexRef("Pfister") == "P236") // P,F same digit: collapsed
    assert(soundexRef("Honeyman") == "H555")
    assert(soundexRef("Euler") == "E460")
    assert(soundexRef("Gauss") == "G200")
    // re-derivation == Spark builtin over the parts vocabulary
    import org.apache.spark.sql.functions.{col, soundex}
    val vocab = Seq("anvil", "blue", "bolt", "cold", "gear", "gizmo",
      "hot", "large", "new", "old", "plate", "red", "ring", "rod",
      "small", "widget")
    val rows = vocab.toDF("w").select(col("w"), soundex(col("w"))).collect()
    rows.foreach(r => assert(r.getString(1) == soundexRef(r.getString(0)),
      s"builtin vs ref mismatch for ${r.getString(0)}"))
    // difference(): identical -> 4, disjoint codes -> small
    import graft.functions.Soundex.difference
    import org.apache.spark.sql.functions.lit
    val d = spark.sql("SELECT 1").select(
      difference(lit("Robert"), lit("Rupert")).as("same"),
      difference(lit("anvil"), lit("widget")).as("far")).head()
    assert(d.getInt(0) == 4)
    assert(d.getInt(1) <= 1)
  }

  test("adjacent_uniq: intarray uniq() semantics as a codegen expression") {
    val r = spark.sql(
      """SELECT adjacent_uniq(array(1, 1, 2, 2, 1, 3, 3)) AS a,
        |  adjacent_uniq(sort_array(array(1, 1, 2, 2, 1, 3, 3))) AS b,
        |  adjacent_uniq(array(CAST(NULL AS INT), NULL, 1, NULL)) AS c,
        |  adjacent_uniq(CAST(array() AS array<int>)) AS d,
        |  adjacent_uniq(array(7)) AS e""".stripMargin).head()
    assert(r.getSeq[Int](0) == Seq(1, 2, 1, 3)) // non-adjacent repeat kept
    assert(r.getSeq[Int](1) == Seq(1, 2, 3))    // uniq(sort(a)) full dedup
    assert(r.getSeq[Any](2) == Seq(null, 1, null)) // adjacent nulls collapse
    assert(r.getSeq[Int](3) == Seq())
    assert(r.getSeq[Int](4) == Seq(7))
  }

  test("inet: mask arithmetic, bare-address default, containment edges") {
    import graft.functions.Inet._
    import org.apache.spark.sql.functions.{col, lit}
    val r = spark.sql("SELECT 1").select(
      host(lit("192.168.1.7/24")).as("h"),
      masklen(lit("192.168.1.7/24")).as("m24"),
      masklen(lit("192.168.1.7")).as("m32"), // bare address -> /32
      network(lit("192.168.1.7/24")).as("nw"),
      broadcast(lit("192.168.1.7/24")).as("bc"),
      netmask(lit("192.168.1.7/24")).as("nm"),
      hostmask(lit("192.168.1.7/24")).as("hm"),
      network(lit("1.2.3.4/0")).as("nw0"), // len 0: everything masked
      containedInEq(lit("192.168.1.7/24"), lit("192.168.0.0/16")).as("sub"),
      containedIn(lit("192.168.0.0/16"), lit("192.168.0.0/16")).as("strict_self"),
      containedInEq(lit("192.168.0.0/16"), lit("192.168.0.0/16")).as("eq_self"),
      containedInEq(lit("192.169.1.7"), lit("192.168.0.0/16")).as("outside"))
      .head()
    assert(r.getString(0) == "192.168.1.7")
    assert(r.getInt(1) == 24 && r.getInt(2) == 32)
    assert(r.getString(3) == "192.168.1.0/24")
    assert(r.getString(4) == "192.168.1.255/24")
    assert(r.getString(5) == "255.255.255.0")
    assert(r.getString(6) == "0.0.0.255")
    assert(r.getString(7) == "0.0.0.0/0")
    assert(r.getBoolean(8)) // /24 inside /16
    assert(!r.getBoolean(9)) // << is strict: a net is not inside itself
    assert(r.getBoolean(10)) // <<= is reflexive
    assert(!r.getBoolean(11))
  }

  test("inet: IPv6 parse/format/mask algebra and cross-family edges") {
    import graft.functions.Inet._
    import org.apache.spark.sql.functions.lit
    val r = spark.sql("SELECT 1").select(
      family(lit("2001:db8::1")).as("f6"),
      family(lit("10.0.0.1")).as("f4"),
      masklen(lit("2001:db8::1")).as("m128"), // bare v6 -> /128
      masklen(lit("2001:db8::/48")).as("m48"),
      network(lit("2001:db8:aa:bb:cc::7/48")).as("nw"),
      broadcast(lit("2001:db8:aa::/48")).as("bc"),
      netmask(lit("::/64")).as("nm"),
      hostmask(lit("::/96")).as("hm"),
      network(lit("::ffff:10.1.2.3/112")).as("v4mapped"),
      network(lit("8000::/1")).as("nonbyte"), // mask not on byte boundary
      containedInEq(lit("2001:db8:aa::5"), lit("2001:db8:aa::/48")).as("sub"),
      containedInEq(lit("2001:db8:bb::5"), lit("2001:db8:aa::/48")).as("out"),
      containedInEq(lit("10.0.0.1"), lit("2001:db8::/32")).as("xfam"))
      .head()
    assert(r.getInt(0) == 6 && r.getInt(1) == 4)
    assert(r.getInt(2) == 128 && r.getInt(3) == 48)
    assert(r.getString(4) == "2001:db8:aa::/48")
    assert(r.getString(5) == "2001:db8:aa:ffff:ffff:ffff:ffff:ffff/48")
    assert(r.getString(6) == "ffff:ffff:ffff:ffff::")
    assert(r.getString(7) == "::255.255.255.255") // v4-compatible form (inet_net_ntop)
    assert(r.getString(8) == "::ffff:10.1.0.0/112") // embedded-v4 form kept
    assert(r.getString(9) == "8000::/1")
    assert(r.getBoolean(10))
    assert(!r.getBoolean(11))
    assert(!r.getBoolean(12)) // cross-family containment is false, not an error
    // round-trip: compression picks the longest, leftmost run
    val rt = spark.sql("SELECT 1").select(
      host(lit("2001:0:0:1:0:0:0:1/64")).as("h1"),
      network(lit("2001:0:0:1:0:0:0:1/128")).as("h2")).head()
    assert(rt.getString(0) == "2001:0:0:1:0:0:0:1") // host is textual
    assert(rt.getString(1) == "2001:0:0:1::1/128")  // formatter compresses
  }

  test("jsonb_set: setPath semantics incl. negative index and strict steps") {
    def set(doc: String, path: String, v: String): String =
      spark.sql(s"SELECT jsonb_set('$doc', '$path', '$v') AS r").head().getString(0)
    assert(set("""{"a":{"b":1},"c":[1,2,3]}""", "{a,b}", "9")
      == """{"a":{"b":9},"c":[1,2,3]}""")
    // negative index counts from the end (PG semantics)
    assert(set("""{"c":[1,2,3]}""", "{c,-1}", "7") == """{"c":[1,2,7]}""")
    // index past either end appends/prepends
    assert(set("""{"c":[1,2]}""", "{c,10}", "3") == """{"c":[1,2,3]}""")
    assert(set("""{"c":[1,2]}""", "{c,-10}", "0") == """{"c":[0,1,2]}""")
    // final step creates a missing key; intermediate steps must exist
    assert(set("""{"a":1}""", "{b}", "true") == """{"a":1,"b":true}""")
    intercept[Exception](set("""{"a":1}""", "{x,y}", "1"))
  }

  test("unaccent folds ligatures; pg format quoting and positional args") {
    import org.apache.spark.sql.functions.{lit, col}
    import graft.functions.{Unaccent, PgFormat}
    // PG's unaccent.rules fold ligatures too (ICU strip_accents does not
    // — the catalog oracle sticks to the agreed diacritic subset)
    val r = spark.sql("SELECT 1").select(
      Unaccent.unaccent(lit("œuvre ß Æther ﬁn")).as("a"),
      Unaccent.unaccent(lit("Ångström façade naïve")).as("b")).head()
    assert(r.getString(0) == "oeuvre ss AEther fin")
    assert(r.getString(1) == "Angstrom facade naive")
    // format: %% literal, %I quotes only when needed, %L maps NULL,
    // %n$ repositions the implicit counter (PG text_format)
    val f = spark.sql("SELECT 1").select(
      PgFormat.format("%s is 100%% %I %L", lit("x"), lit("Mixed Case"),
        lit(null).cast("string")).as("a"),
      PgFormat.format("%2$s then %s",
        lit("first"), lit("second"), lit("third")).as("b"),
      PgFormat.format("%I", lit("safe_name")).as("c")).head()
    assert(f.getString(0) == "x is 100% \"Mixed Case\" NULL")
    assert(f.getString(1) == "second then third") // %2$ repositions to 3
    assert(f.getString(2) == "safe_name")
    intercept[IllegalArgumentException](PgFormat.format("%d", lit(1)))
    intercept[IllegalArgumentException](PgFormat.format("%s %s", lit(1)))
  }

  test("SIMILAR TO pattern translation (regexp.c similar_escape)") {
    import graft.functions.SimilarTo.similarToRegex
    val re = similarToRegex("%(a|b)_c%")
    assert(re == "^(?:.*(a|b).c.*)$", re)
    // literals that are regex metachars get escaped; escape char protects
    assert(similarToRegex("a.b") == "^(?:a\\.b)$")
    assert(similarToRegex("""10\%""") == "^(?:10\\Q%\\E)$")
    assert(similarToRegex("x[0-9]{2,3}y") == "^(?:x[0-9]{2,3}y)$")
    // behavior through RLIKE
    import graft.functions.SimilarTo.similarTo
    val r = spark.sql("SELECT 1")
      .select(
        similarTo(org.apache.spark.sql.functions.lit("abc"), "a_c").as("a"),
        similarTo(org.apache.spark.sql.functions.lit("abc"), "a_d").as("b"),
        similarTo(org.apache.spark.sql.functions.lit("50%"), """50\%""").as("c"),
        similarTo(org.apache.spark.sql.functions.lit("abc"), "ab").as("d"))
      .head()
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && !r.getBoolean(3))
  }

  test("tsquery phrase operators <-> and <N> (tsquery.c phrase distance)") {
    import graft.functions.Ranges.tsMatchQuery
    val df = Seq((1L, "big data query engine"), (2L, "query on big data"))
      .toDF("id", "text")
      .withColumn("words", org.apache.spark.sql.functions.split(col("text"), " "))
    def ids(q: String): Set[Long] =
      df.where(tsMatchQuery(col("words"), q)).select("id")
        .collect().map(_.getLong(0)).toSet
    assert(ids("data <-> query") == Set(1L)) // adjacency is ordered
    assert(ids("query <-> data") == Set.empty)
    assert(ids("big <2> query") == Set(1L)) // exact distance, not "within"
    assert(ids("big <-> query") == Set.empty)
    assert(ids("big <-> data <-> query") == Set(1L)) // left-nested chains
    assert(ids("query <3> data") == Set(2L)) // query .. .. data exactly
    assert(ids("query <2> data") == Set.empty)
    assert(ids("(engine | on) <-> big") == Set(2L)) // OR operand positions
    assert(ids("dat:* <-> query") == Set(1L)) // prefix operand
    assert(ids("engine & big <2> query") == Set(1L)) // <-> binds tighter than &
    // NOT inside a phrase has no position set — rejected, not mis-answered
    intercept[IllegalArgumentException](ids("!big <-> data"))
  }

  test("to_number_pg inverts to_char_pg (formatting.c:43 numeric_to_number)") {
    // roundtrip property: for values that fit the template,
    // to_number(to_char(v, fmt), fmt) == v rounded to the template scale
    val fmts = Seq("9,999,999.99", "FM9,999,999.99", "9999999.99MI",
      "$9,999,999.99", "FM$9999999.99", "0009999.999")
    val vals = Seq(0.0, 1.0, -1.0, 0.5, -0.5, 123.456, -123.456,
      9999.99, -9999.99, 1234567.89, 0.004, -0.004, 42.0)
    val sql = (for {
      (f, fi) <- fmts.zipWithIndex
      (v, vi) <- vals.zipWithIndex
    } yield s"to_number_pg(to_char_pg($v, '$f'), '$f') AS r_${fi}_$vi")
      .mkString("SELECT ", ", ", "")
    val row = spark.sql(sql).head()
    var k = 0
    for { f <- fmts; v <- vals } {
      val scale = if (f.endsWith(".999")) 3 else 2
      val want = new java.math.BigDecimal(math.abs(v))
        .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue() *
        (if (v < 0) -1 else 1)
      assert(row.getDouble(k) == want, s"fmt=$f v=$v got=${row.getDouble(k)}")
      k += 1
    }
    // template caps how much input is read, as PG's NUM_processor does
    val caps = spark.sql(
      """SELECT to_number_pg('12345', '999') AS a,
        |       to_number_pg('$1,234.567', '$9,999.99') AS b,
        |       to_number_pg('123-', '999MI') AS c,
        |       to_number_pg('  42 ', '9999') AS d""".stripMargin).head()
    assert(caps.getDouble(0) == 123.0)
    assert(caps.getDouble(1) == 1234.56)
    assert(caps.getDouble(2) == -123.0)
    assert(caps.getDouble(3) == 42.0)
  }

  test("to_date_pg/to_timestamp_pg invert to_char_dt (formatting.c:914)") {
    // roundtrip at each template's own resolution, across padded names,
    // FM variable width, 12-hour clock, day-of-year and julian forms
    val ts = Seq("2024-05-05 00:07:09.042000", "1999-12-31 23:59:59.000000",
      "2024-02-29 12:00:00.000000", "1970-01-01 00:00:00.000000",
      "2038-07-04 15:30:45.123456")
    val dateFmts = Seq("YYYY-MM-DD", "DD Mon YYYY", "FMMonth DD, YYYY",
      "DDD YYYY", "J", "Dy DD Mon YYYY")
    for (t0 <- ts; f <- dateFmts) {
      val r = spark.sql(
        s"""SELECT CAST(to_date_pg(to_char_dt(TIMESTAMP '$t0', '$f'), '$f') AS STRING) AS d,
           |       CAST(CAST(TIMESTAMP '$t0' AS DATE) AS STRING) AS want""".stripMargin).head()
      assert(r.getString(0) == r.getString(1), s"fmt=$f ts=$t0")
    }
    val tsFmts = Seq("YYYY-MM-DD HH24:MI:SS", "YYYY-MM-DD HH12:MI:SS PM",
      "FMDD FMMonth YYYY HH24:MI:SS", "YYYY-MM-DD HH24:MI:SS.MS",
      "YYYY-MM-DD HH24:MI:SS.US", "YYYY-MM-DD SSSS")
    for (t0 <- ts; f <- tsFmts) {
      val trunc =
        if (f.endsWith(".US")) "microsecond"
        else if (f.endsWith(".MS")) "millisecond"
        else "second"
      val r = spark.sql(
        s"""SELECT CAST(to_timestamp_pg(to_char_dt(TIMESTAMP '$t0', '$f'), '$f') AS STRING) AS t,
           |       CAST(date_trunc('$trunc', TIMESTAMP '$t0') AS STRING) AS want""".stripMargin)
        .head()
      assert(r.getString(0) == r.getString(1), s"fmt=$f ts=$t0")
    }
    // YY century rule: <70 → 20xx, >=70 → 19xx (PG DCH_YY)
    val yy = spark.sql(
      """SELECT CAST(to_date_pg('05-01-02', 'YY-MM-DD') AS STRING) AS a,
        |       CAST(to_date_pg('85-06-07', 'YY-MM-DD') AS STRING) AS b""".stripMargin)
      .head()
    assert(yy.getString(0) == "2005-01-02" && yy.getString(1) == "1985-06-07")
  }

  test("tsquery booleans: precedence, parens, negation, prefix (tsquery.c)") {
    import graft.functions.Ranges.tsMatchQuery
    val df = Seq(
      (1L, "big data query engine"),
      (2L, "sql error log"),
      (3L, "sql query planner"),
      (4L, "data error dump")).toDF("id", "text")
    def ids(q: String): Set[Long] =
      df.where(tsMatchQuery(split(col("text"), " "), q))
        .select("id").as[Long].collect().toSet
    assert(ids("data & query") == Set(1L))
    assert(ids("data | sql") == Set(1L, 2L, 3L, 4L))
    // precedence: & binds tighter than | -> sql | (data & query)
    assert(ids("sql | data & query") == Set(1L, 2L, 3L))
    assert(ids("(sql | data) & query") == Set(1L, 3L))
    assert(ids("!error & quer:*") == Set(1L, 3L))
    assert(ids("!(data | sql)") == Set.empty)
    intercept[IllegalArgumentException](graft.functions.TsQuery.parse("a & (b"))
  }

  test("to_char_dt DCH templates: padding, FM, 12-hour clock, names") {
    def f(fmt: String): String = spark.sql(
      s"SELECT to_char_dt(TIMESTAMP '2024-05-05 00:07:09.042',  '$fmt') AS s")
      .head().getString(0)
    assert(f("YYYY-MM-DD HH24:MI:SS") == "2024-05-05 00:07:09")
    assert(f("Month") == "May      ") // blank-padded to 9, PG-style
    assert(f("FMMonth DD, YYYY") == "May 05, 2024") // FM applies to next element only
    assert(f("FMDD") == "5")
    assert(f("HH12:MI AM") == "12:07 AM") // midnight = 12 on the 12h clock
    assert(f("Day") == "Sunday   ")
    assert(f("Dy DY dy") == "Sun SUN sun")
    assert(f("MS US") == "042 042000")
    assert(f("\"at \"HH24\" hrs\"") == "at 00 hrs")
    assert(f("D ID Q") == "1 7 2") // D: Sunday=1; ID: ISO Sunday=7
  }

  test("age_pg: calendar diff, sign symmetry, month borrow (timestamp.c:4205)") {
    val row = spark.sql(
      """SELECT age_pg(TIMESTAMP '2024-03-01 00:00:30.5',
        |              TIMESTAMP '2024-01-31 23:59:45.25') AS a""".stripMargin)
      .select("a.*").head()
    // PG: 1 mon 0 days 00:00:45.25 (days borrow from Jan = 31 days)
    assert(row == Row(0, 1, 0, 0, 0, 45250000L), row.toString)
    val neg = spark.sql(
      """SELECT age_pg(TIMESTAMP '2024-01-31 23:59:45.25',
        |              TIMESTAMP '2024-03-01 00:00:30.5') AS a""".stripMargin)
      .select("a.*").head()
    assert(neg == Row(0, -1, 0, 0, 0, -45250000L), neg.toString)
    // leap-February borrow
    val leap = spark.sql(
      """SELECT age_pg(TIMESTAMP '2024-03-10 00:00:00',
        |              TIMESTAMP '2024-02-28 00:00:00') AS a""".stripMargin)
      .select("a.*").head()
    assert(leap == Row(0, 0, 11, 0, 0, 0L), leap.toString)
  }

  test("justify_days/hours/interval match the PG-doc examples (timestamp.c:3436)") {
    // justify_days(interval '35 days') = 1 mon 5 days
    val jd = spark.sql("SELECT justify_days(0, 35, 0) AS j").select("j.*").head()
    assert(jd == Row(1, 5, 0L), jd.toString)
    // justify_hours(interval '27 hours') = 1 day 03:00:00
    val jh = spark.sql("SELECT justify_hours(0, 0, 97200000000) AS j")
      .select("j.*").head()
    assert(jh == Row(0, 1, 10800000000L), jh.toString)
    // justify_interval(interval '1 mon -1 hour') = 29 days 23:00:00
    val ji = spark.sql("SELECT justify_interval(1, 0, -3600000000) AS j")
      .select("j.*").head()
    assert(ji == Row(0, 29, 82800000000L), ji.toString)
    // negative-dominant: justify_interval(interval '-1 mon 1 hour')
    val jn = spark.sql("SELECT justify_interval(-1, 0, 3600000000) AS j")
      .select("j.*").head()
    assert(jn == Row(0, -29, -82800000000L), jn.toString)
  }

  test("ltree: ancestry algebra, lca fold, lquery star/alternation compile") {
    import graft.functions.Ltree
    Tables.register(spark, TestSpark.sf0001)
    def m(path: String, q: String): Boolean =
      spark.range(1).select(Ltree.matches(lit(path), q)).head().getBoolean(0)
    // star matches ZERO or more labels; bounded star is exact
    assert(m("a.b.c", "a.*.c") && m("a.c", "a.*.c") && !m("a.c.d", "a.*.c"))
    assert(m("a.b.c", "a.*{1}.c") && !m("a.c", "a.*{1}.c"))
    assert(m("a.b.b.c", "a.*{1,2}.c") && !m("a.b.b.b.c", "a.*{1,2}.c"))
    assert(m("a.x.c", "a.x|y.c") && m("a.y.c", "a.x|y.c") && !m("a.z.c", "a.x|y.c"))
    // labels are literal — regex metacharacters cannot inject
    assert(!m("a.xc", "a.x|y.c") && !m("aXb.c", "a*b.c".replace("*", ".")))
    val row = spark.range(1).select(
      Ltree.nlevel(lit("a.b.c")).as("n"),
      Ltree.subpath(lit("a.b.c.d"), 1, 2).as("sp"),
      Ltree.isAncestor(lit("a.b"), lit("a.b.c")).as("anc"),
      Ltree.isAncestor(lit("a.b"), lit("a.bc")).as("not_anc"),
      Ltree.lca(lit("a.b.c"), lit("a.b.d")).as("l1"),
      Ltree.lca(lit("a.b"), lit("x.y")).as("l2"),
      Ltree.lca(lit("a.b"), lit("a.b.c")).as("l3")).head()
    assert(row.getInt(0) == 3 && row.getString(1) == "b.c")
    assert(row.getBoolean(2) && !row.getBoolean(3))
    assert(row.getString(4) == "a.b" && row.getString(5) == "" &&
      row.getString(6) == "a.b")
  }

  test("lower-bound arrays: subscript translation, NULL out-of-bounds, slice clamping") {
    import graft.functions.PgArrays._
    Tables.register(spark, TestSpark.sf0001)
    val df = Seq((1, Seq("a", "b", "c")), (2, Seq.empty[String])).toDF("id", "xs")
      .withColumn("a", lbArray(col("xs"), -2))
    val rows = df.select(col("id"),
      arrayLower(col("a")).as("lo"), arrayUpper(col("a")).as("hi"),
      lbDims(col("a")).as("dims"),
      lbSubscript(col("a"), lit(-2)).as("e1"),
      lbSubscript(col("a"), lit(-5)).as("under"),
      lbSubscript(col("a"), lit(3)).as("over"),
      array_join(lbSlice(col("a"), lit(-9), lit(9)), ",").as("all"),
      array_join(lbSlice(col("a"), lit(0), lit(-1)), ",").as("inverted"))
      .orderBy("id").collect()
    assert(rows(0).getInt(1) == -2 && rows(0).getInt(2) == 0)
    assert(rows(0).getString(3) == "[-2:0]")
    assert(rows(0).getString(4) == "a")
    assert(rows(0).isNullAt(5) && rows(0).isNullAt(6))
    assert(rows(0).getString(7) == "a,b,c")
    assert(rows(0).getString(8) == "")
    // empty array: lower/upper/dims are NULL, as in PG
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(3))
    // array_fill with an explicit lower bound
    val f = spark.range(1).select(
      arrayLower(arrayFillLb(lit("x"), 3, 5)).as("lo"),
      arrayUpper(arrayFillLb(lit("x"), 3, 5)).as("hi"),
      lbSubscript(arrayFillLb(lit("x"), 3, 5), lit(7)).as("e")).head()
    assert(f.getInt(0) == 5 && f.getInt(1) == 7 && f.getString(2) == "x")
  }

  test("crypt/gen_salt: MD5-crypt matches glibc crypt(3) vectors; roundtrip verifies") {
    import graft.functions.Md5Crypt
    // pinned against glibc's independent implementation of the same
    // published algorithm (python3 crypt.crypt(pw, '$1$<salt>$'))
    assert(Md5Crypt.crypt("password", "$1$saltsalt$") ==
      "$1$saltsalt$qjXMvbEw8oaL.CzflDtaK/")
    assert(Md5Crypt.crypt("my secret", "$1$abcdefgh$") ==
      "$1$abcdefgh$DeVVblSn2VmVEIlUInrix0")
    assert(Md5Crypt.crypt("", "$1$12345678$") ==
      "$1$12345678$xek.CpjQUVgdf/P2N9KQf/")
    assert(Md5Crypt.crypt("Customer#000000001", "$1$AbCd./01$") ==
      "$1$AbCd./01$RtL2PYeJYOxYiVPKzz/I7.")
    // crypt(pw, stored_hash) re-uses the stored salt — the verify idiom
    val h = Md5Crypt.crypt("s3cret", "$1$AbCd./01$")
    assert(Md5Crypt.crypt("s3cret", h) == h)
    assert(Md5Crypt.crypt("wrong", h) != h)
    // SQL surface: gen_salt draws fresh salts, roundtrip still verifies
    Tables.register(spark, TestSpark.sf0001)
    val rows = spark.sql(
      """SELECT h, crypt('pw', h) = h AS ok, crypt('no', h) = h AS bad
        |FROM (SELECT crypt('pw', gen_salt('md5')) AS h
        |      FROM range(20))""".stripMargin).collect()
    assert(rows.forall(r => r.getBoolean(1) && !r.getBoolean(2)))
    // salts are actually random (20 draws, no collision plausible)
    assert(rows.map(_.getString(0)).distinct.length == 20)
  }

  test("crypt/gen_salt: bcrypt matches published vectors; roundtrip verifies") {
    import graft.functions.BcryptAlg
    // the P-array/S-box seed IS π's hex expansion — the Machin-formula
    // derivation must reproduce the published leading words
    assert(BcryptAlg.piWords(0) == 0x243f6a88)
    assert(BcryptAlg.piWords(17) == 0x8979fb1b) // last P word
    assert(BcryptAlg.piWords(18) == 0xd1310ba6) // first S word
    // pinned against the OpenBSD/jBCrypt published test vectors
    assert(BcryptAlg.crypt("", "$2a$06$DCq7YPn5Rq63x1Lad4cll.") ==
      "$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s.")
    assert(BcryptAlg.crypt("a", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO") ==
      "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe")
    // salt spec may be a full stored hash: the verify idiom holds
    val h = BcryptAlg.crypt("s3cret", "$2a$06$DCq7YPn5Rq63x1Lad4cll.")
    assert(BcryptAlg.crypt("s3cret", h) == h)
    assert(BcryptAlg.crypt("wrong", h) != h)
    // minor versions b/y are accepted (identical for UTF-8 input)
    assert(BcryptAlg.crypt("pw", "$2b$06$DCq7YPn5Rq63x1Lad4cll.").startsWith("$2b$06$"))
    intercept[IllegalArgumentException] {
      BcryptAlg.crypt("pw", "$2x$06$DCq7YPn5Rq63x1Lad4cll.")
    }
    // SQL surface: scheme dispatch + fresh 'bf' salts, roundtrip verifies
    val rows = spark.sql(
      """SELECT h, crypt('pw', h) = h AS ok, crypt('no', h) = h AS bad
        |FROM (SELECT crypt('pw', gen_salt('bf')) AS h
        |      FROM range(8))""".stripMargin).collect()
    assert(rows.forall(r => r.getString(0).startsWith("$2a$06$")))
    assert(rows.forall(r => r.getBoolean(1) && !r.getBoolean(2)))
    assert(rows.map(_.getString(0)).distinct.length == 8)
  }

  test("Spanish stemmer matches hand-derived snowball vectors") {
    import graft.functions.SpanishStemmer.stem
    // derived by hand from the published algorithm description
    assert(stem("niños") == "niñ")           // residual os
    assert(stem("canciones") == "cancion")   // verb-suffix es
    assert(stem("trabajando") == "trabaj")   // verb-suffix ando
    assert(stem("guerra") == "guerr")        // residual a
    assert(stem("importancia") == "import")  // ancia in R2
    assert(stem("lógico") == "logic")        // ico outside R2; residual o + unaccent
    assert(stem("rápidamente") == "rapid")   // amente in R1
    assert(stem("agradables") == "agrad")    // ables in R2
    assert(stem("tuya") == "tuy")            // y-step blocked (no u); residual a
    assert(stem("vayan") == "vay")           // verb-suffix an
    assert(stem("diciéndoselo") == "dic")    // pronoun after accented iéndo
    // the accented ending must START inside RV — here ándo begins at 1
    // so the pronoun stays and only the residual o drops
    assert(stem("dándoselo") == "dandosel")
    // lexize chain: stopwords drop, stems apply
    Tables.register(spark, TestSpark.sf0001)
    val lexed = spark.sql(
      "SELECT array_join(filter(transform(split('las canciones muy lógicas', ' '), " +
        "w -> CASE WHEN w IN ('las','muy') THEN '' ELSE spanish_stem(w) END), " +
        "x -> x <> ''), ' ') AS l").head().getString(0)
    assert(lexed == "cancion logic")
  }

  test("Russian stemmer matches hand-derived snowball vectors") {
    import graft.functions.RussianStemmer.stem
    // each traced by hand through the published algorithm (suffix
    // tables cross-checked against the compiled stem_UTF_8_russian.c)
    assert(stem("книга") == "книг")          // noun а
    assert(stem("книги") == "книг")          // noun и
    assert(stem("важная") == "важн")         // adjective ая
    assert(stem("красивое") == "красив")     // adjective ое
    assert(stem("бегала") == "бега")         // verb ла after а (а kept)
    assert(stem("делать") == "дела")         // verb ть after а
    assert(stem("читавшийся") == "чита")     // reflexive + adj + participle вш
    assert(stem("возможность") == "возможн") // noun ь + derivational ост in R2
    assert(stem("злость") == "злост")        // derivational BLOCKED outside R2
    // adjective ый, then the я-context participle нн strips too
    assert(stem("деревянный") == "деревя")
    // е-context blocks the participle нн; step 4 undoubles instead
    assert(stem("осеннюю") == "осен")
    // superlative ейш removal, then нн undouble
    assert(stem("увереннейший") == "уверен")
    assert(stem("начинается") == "начина")   // reflexive ся + verb ет after а
    assert(stem("линии") == "лин")           // noun ии (longest match over и)
    assert(stem("прочитав") == "прочита")    // perfective gerund в after а
    assert(stem("красивейший") == "красив")  // adjective + superlative ейш
    assert(stem("ёлка") == "елк")            // ё → е preliminary
    // lexize chain: russian config drops stopwords, stems the rest
    Tables.register(spark, TestSpark.sf0001)
    val out = graft.functions.TsLexize.stemTerms(
      Seq("и", "книги", "не", "бегала"), "russian")
    assert(out == Seq("книг", "бега"))
    // ts_lexize dictionary probe
    val r = spark.sql("SELECT ts_lexize('russian_stem', 'книги')").head()
    assert(r.getSeq[String](0).toSeq == Seq("книг"))
  }

  test("Portuguese stemmer matches hand-derived snowball vectors") {
    import graft.functions.PortugueseStemmer.stem
    // hand-traced through the published algorithm (suffix tables
    // cross-checked against the compiled stem_UTF_8_portuguese.c)
    assert(stem("gatos") == "gat")             // residual os
    assert(stem("bonita") == "bonit")          // residual a
    assert(stem("meninas") == "menin")         // verb-table as
    assert(stem("desenvolvimento") == "desenvolv") // imento in R2
    assert(stem("felizmente") == "feliz")      // mente in R2
    assert(stem("referência") == "referent")   // ência→ente + final e
    assert(stem("bandeira") == "bandeir")      // ira→ir after e
    assert(stem("organização") == "organiz")   // nasal aça~o in R2
    assert(stem("cantando") == "cant")         // verb ando in RV
    assert(stem("falaríamos") == "fal")        // verb aríamos
    assert(stem("antigamente") == "antig")     // amente in R1
    assert(stem("alugue") == "alug")           // final e + gu undouble
    assert(stem("administrativas") == "administr") // ivas + at in R2
    assert(stem("abraço") == "abrac")          // residual o + ç→c
    assert(stem("irmã") == "irmã")             // nasal survives untouched
    // lexize chain: portuguese config drops stopwords, stems the rest
    Tables.register(spark, TestSpark.sf0001)
    val out = graft.functions.TsLexize.stemTerms(
      Seq("as", "meninas", "não", "cantando"), "portuguese")
    assert(out == Seq("menin", "cant"))
    val r = spark.sql("SELECT ts_lexize('portuguese_stem', 'gatos')").head()
    assert(r.getSeq[String](0).toSeq == Seq("gat"))
  }

  test("Italian stemmer matches hand-derived snowball vectors") {
    import graft.functions.ItalianStemmer.stem
    // hand-traced through the published algorithm (tables cross-checked
    // against the compiled stem_UTF_8_italian.c)
    assert(stem("abbandonata") == "abbandon")  // verb ata
    assert(stem("cantando") == "cant")         // verb ando
    assert(stem("felicità") == "felic")        // ità in R2
    assert(stem("nazione") == "nazion")        // azione BLOCKED outside R2
    assert(stem("organizzazione") == "organizz") // azione in R2
    assert(stem("mangiarlo") == "mang")        // pronoun lo after ar → e
    assert(stem("quale") == "qual")            // qu → qU marking
    assert(stem("violenza") == "violenz")      // enza blocked outside R2
    assert(stem("allenamento") == "allen")     // amento in RV
    assert(stem("attiva") == "attiv")          // final vowel only
    assert(stem("rapidamente") == "rapid")     // amente in R1
    assert(stem("psicologia") == "psicolog")   // final a then preceding i
    assert(stem("gioia") == "gioi")            // intervocalic I survives
    assert(stem("luoghi") == "luog")           // final i + gh → g
    assert(stem("amiche") == "amic")           // final e + ch → c
    Tables.register(spark, TestSpark.sf0001)
    val out = graft.functions.TsLexize.stemTerms(
      Seq("le", "amiche", "non", "cantando"), "italian")
    assert(out == Seq("amic", "cant"))
    val r = spark.sql("SELECT ts_lexize('italian_stem', 'cantando')").head()
    assert(r.getSeq[String](0).toSeq == Seq("cant"))
  }

  test("Dutch stemmer matches hand-derived snowball vectors") {
    import graft.functions.DutchStemmer.stem
    // hand-traced through the published algorithm (tables cross-checked
    // against the compiled stem_UTF_8_dutch.c)
    assert(stem("lichamelijk") == "licham")       // lijk in R2 + e-ending
    assert(stem("lichamelijke") == "licham")      // step-2 e then lijk
    assert(stem("lichamelijkheden") == "licham")  // heden→heid→(3a)→lijk
    assert(stem("mogelijkheden") == "mogelijk")   // heid off, lijk outside R2
    assert(stem("mogelijkheid") == "mogelijk")    // heid in R2, not after c
    assert(stem("opheldering") == "ophelder")     // ing in R2
    assert(stem("aandeel") == "aandel")           // step-4 ee undouble
    assert(stem("openbaar") == "open")            // baar in R2 (R2 = 4)
    assert(stem("openbaarheid") == "open")        // heid then baar
    assert(stem("onzichtbaar") == "onzicht")      // baar in R2
    assert(stem("onzichtbare") == "onzicht")      // bar only after e-removal
    assert(stem("kostbare") == "kostbar")         // bar BLOCKED outside R2
    assert(stem("vrouwen") == "vrouw")            // en after non-vowel
    assert(stem("huizen") == "huiz")
    assert(stem("bakken") == "bak")               // kk undouble after en
    assert(stem("heden") == "heden")              // heden BLOCKED outside R1
    assert(stem("gemeente") == "gemeent")         // step-2 e, nt stays
    assert(stem("gemen") == "gemen")              // gem guard blocks en
    assert(stem("jongens") == "jongen")           // valid s-ending
    assert(stem("mayonaise") == "mayonais")       // y→Y marking; se after
                                                  // vowel blocked, e removed
    assert(stem("draaien") == "draai")            // intervocalic i→I is a
                                                  // consonant for en-ending
    assert(stem("politie") == "politie")          // e after vowel survives
    assert(stem("lopen") == "lop")
    assert(stem("uitbarsting") == "uitbarst")     // ing; bar not re-matched
    assert(stem("voortdurend") == "voortdur")     // end in R2
    assert(stem("matige") == "matig")             // ig outside R2 survives
    Tables.register(spark, TestSpark.sf0001)
    val out = graft.functions.TsLexize.stemTerms(
      Seq("de", "vrouwen", "het", "huizen"), "dutch")
    assert(out == Seq("vrouw", "huiz"))
    val r2 = spark.sql("SELECT ts_lexize('dutch_stem', 'bakken')").head()
    assert(r2.getSeq[String](0).toSeq == Seq("bak"))
  }

  test("json builders: build/agg/pretty/strip_nulls/array_elements") {
    Tables.register(spark, TestSpark.sf0001)
    val r = spark.sql(
      "SELECT json_build_object('a', 1, 'b', 'x', 'c', nullif(1,1)) AS o, " +
        "json_build_array(1, 2, 3) AS a, " +
        "json_strip_nulls(json_build_object('a', 1, 'c', nullif(1,1))) AS s, " +
        "jsonb_pretty('{\"a\":[1,2],\"b\":{}}') AS p").head()
    assert(r.getString(0) == """{"a":1,"b":"x","c":null}""")
    assert(r.getString(1) == "[1,2,3]")
    assert(r.getString(2) == """{"a":1}""")
    assert(r.getString(3) ==
      "{\n    \"a\": [\n        1,\n        2\n    ],\n    \"b\": {}\n}")
    // aggregate spellings: order pinned by a single sorted partition
    val agg = spark.sql(
      """SELECT json_agg(v) AS ja, json_object_agg(k, v) AS oa
        |FROM (SELECT * FROM VALUES ('x', 1), ('y', 2), ('z', 3) AS t(k, v)
        |      ORDER BY k) """.stripMargin).coalesce(1).head()
    assert(agg.getString(0) == "[1,2,3]")
    assert(agg.getString(1) == """{"x":1,"y":2,"z":3}""")
    // the SRF form explodes per element, objects re-serialized intact
    val rows = spark.sql(
      "SELECT json_array_elements('[{\"a\":1},2,\"s\"]') AS e").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("""{"a":1}""", "2", "\"s\""))
  }

  test("crypt/gen_salt: DES and extended DES match libcrypt vectors") {
    import graft.functions.DesCrypt
    // traditional DES crypt, pinned against libcrypt's independent
    // implementation (python3 crypt.crypt(pw, '<2-char salt>'))
    assert(DesCrypt.crypt("password", "ab") == "abJnggxhB/yWI")
    assert(DesCrypt.crypt("", "./") == "./Una9Fi.seRo")
    assert(DesCrypt.crypt("topsecret99", "Zz") == "Zznqlr2.mL.nY")
    assert(DesCrypt.crypt("Customer#000000001", "ab") == "ab/lLmWJ9gctE")
    // >8-char passwords truncate (the scheme's documented weakness)
    assert(DesCrypt.crypt("topsecret99", "Zz") == DesCrypt.crypt("topsecre", "Zz"))
    // BSDi extended: '_' + 4 count chars + 4 salt chars; long
    // passwords FOLD (encrypt-then-XOR) instead of truncating
    assert(DesCrypt.xcrypt("password", "_J9..SALT") == "_J9..SALT3cfudkaV5sE")
    assert(DesCrypt.xcrypt("xyzzy", "_J9..SALT") == "_J9..SALTQzqLs1Yv0yQ")
    assert(DesCrypt.xcrypt("", "_J9..SALT") == "_J9..SALTxR6uiWkKh62")
    assert(DesCrypt.xcrypt("topsecret99", "_J9..SALT") == "_J9..SALTacYpryzbqkg")
    assert(DesCrypt.xcrypt("a much longer passphrase here", "_J9..SALT") ==
      "_J9..SALTOSpXz7jajgg")
    assert(DesCrypt.xcrypt("pw", "_1111....") == "_1111....w0rVFiTpu7w")
    // SQL surface: prefix dispatch hits both schemes; the stored-hash
    // verify idiom works because crypt() reuses the leading salt chars
    Tables.register(spark, TestSpark.sf0001)
    val rows = spark.sql(
      """SELECT hd, hx, crypt('pw', hd) = hd AS okd, crypt('no', hd) = hd AS badd,
        |       crypt('pw', hx) = hx AS okx, crypt('no', hx) = hx AS badx
        |FROM (SELECT crypt('pw', gen_salt('des')) AS hd,
        |             crypt('pw', gen_salt('xdes')) AS hx
        |      FROM range(12))""".stripMargin).collect()
    assert(rows.forall(r => r.getBoolean(2) && !r.getBoolean(3) &&
      r.getBoolean(4) && !r.getBoolean(5)))
    assert(rows.forall(_.getString(1).startsWith("_J9..")), "default 725 rounds")
    assert(rows.map(_.getString(0)).distinct.length == 12)
  }

  test("ts_rewrite: subtree substitution with commutative AND/OR match") {
    import graft.functions.TsQuery
    import graft.functions.TsQuery._
    def show(n: Node): String = n match {
      case Term(t, p) => if (p) s"$t:*" else t
      case And(l, r) => s"(${show(l)} & ${show(r)})"
      case Or(l, r) => s"(${show(l)} | ${show(r)})"
      case Not(c) => s"!${show(c)}"
      case Phrase(l, r, d) => s"(${show(l)} <$d> ${show(r)})"
    }
    // term-level synonym expansion, every occurrence
    assert(show(rewriteAll("a & b & a", Seq("a" -> "(a | a2)"))) ==
      "(((a | a2) & b) & (a | a2))")
    // commutative subtree match: 'b & a' finds target 'a & b'
    assert(show(rewriteAll("b & a", Seq("a & b" -> "ab"))) == "ab")
    // nested occurrence under NOT and phrase distance preserved
    assert(show(rewriteAll("!x & (p <2> x)", Seq("x" -> "y"))) ==
      "(!y & (p <2> y))")
    // rules apply in order, each over the previous output
    assert(show(rewriteAll("a", Seq("a" -> "b", "b" -> "c"))) == "c")
    // no match leaves the query untouched; prefix terms are distinct
    assert(show(rewriteAll("a:* & b", Seq("a" -> "z"))) == "(a:* & b)")
    // compiled result matches documents the literal query misses
    Tables.register(spark, TestSpark.sf0001)
    val df = Seq("data scan table", "data retrieval", "big join")
      .toDF("text").withColumn("words", split(col("text"), " "))
    val out = df.select(
      graft.functions.Ranges.tsMatchQuery(col("words"), "data & retrieval")
        .as("lit"),
      graft.functions.Ranges.tsMatchRewritten(col("words"),
        "data & retrieval", Seq("retrieval" -> "(scan | retrieval)"))
        .as("rew")).collect()
    assert(out.map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq ==
      Seq((false, true), (true, true), (false, false)))
  }

  test("generate_subscripts on an empty outer array yields the empty range under ANSI") {
    import graft.functions.PgArrays._
    Tables.register(spark, TestSpark.sf0001) // sets spark.sql.ansi.enabled
    val df = Seq((1, Seq(Seq(1, 2), Seq(3, 4))), (2, Seq.empty[Seq[Int]]))
      .toDF("id", "m")
    // dim-2 descent through an EMPTY outer array must not raise
    // INVALID_ARRAY_INDEX (try_element_at), it returns the empty range
    val out = df.select(col("id"),
      size(generateSubscripts(col("m"), 1)).as("n1"),
      size(generateSubscripts(col("m"), 2)).as("n2"))
      .orderBy("id").collect()
    assert(out(0) == Row(1, 2, 2))
    assert(out(1) == Row(2, 0, 0))
  }

  test("scalar subquery >1 row fails at runtime (AssertOp analog)") {
    Tables.register(spark, TestSpark.sf0001)
    val e = intercept[Exception] {
      spark.sql("SELECT (SELECT n_nationkey FROM nation) AS x").collect()
    }
    assert(e.getMessage.toLowerCase.contains("more than one row") ||
      e.getMessage.contains("SCALAR_SUBQUERY_TOO_MANY_ROWS"))
  }
}
