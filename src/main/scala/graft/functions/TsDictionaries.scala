package graft.functions

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** User-configurable text-search dictionaries + `ts_lexize` — the
  * specialized dictionary templates the reference ships beyond the
  * snowball stemmers:
  *
  *  - `intdict_template` (`contrib/dict_int/dict_int.c`): integers
  *    trimmed to MAXLEN digits, or rejected outright with REJECTLONG;
  *  - `xsyn_template` (`contrib/dict_xsyn/dict_xsyn.c`): extended
  *    synonyms — a rules file of `word syn1 syn2 ...` lines with the
  *    MATCHORIG/KEEPORIG/MATCHSYNONYMS/KEEPSYNONYMS axes;
  *  - `synonym` (`src/backend/tsearch/dict_synonym.c`): one-to-one
  *    word → synonym mapping;
  *  - `thesaurus` (`src/backend/tsearch/dict_thesaurus.c`): multi-word
  *    phrase substitution with subdictionary normalization, `?`
  *    stopword wildcards, and `*` use-as-is substitutes — the phrase
  *    pass over a token array is `ts_thesaurus_apply`;
  *  - the built-in stemmer dictionaries (english_stem etc.) and
  *    `simple`, so `ts_lexize` can probe any configured chain.
  *
  * DDL: `CREATE/ALTER/DROP TEXT SEARCH DICTIONARY` routed from
  * [[graft.Graft.execute]] (`commands/tsearchcmds.c`).
  *
  * Scale note: every (re)configuration re-registers `ts_lexize` with an
  * IMMUTABLE snapshot of the registry captured in the UDF closure, so
  * the dictionaries ship to executors with the task like any broadcast
  * metadata — lookups never consult driver-side mutable state at run
  * time. Dictionary files are bounded metadata (like the reference's
  * $SHAREDIR/tsearch_data), read once on the driver at DDL time. */
object TsDictionaries {

  sealed trait Dict extends Serializable
  final case class IntDict(maxlen: Int = 6, rejectLong: Boolean = false)
    extends Dict
  /** groups: each rules line as (key, synonyms). */
  final case class XsynDict(groups: Seq[(String, Seq[String])],
                            matchOrig: Boolean = true,
                            keepOrig: Boolean = true,
                            matchSynonyms: Boolean = false,
                            keepSynonyms: Boolean = true) extends Dict
  final case class SynonymDict(pairs: Map[String, String],
                               caseSensitive: Boolean = false) extends Dict
  final case class StemDict(language: String) extends Dict
  case object SimpleDict extends Dict
  /** Thesaurus (`src/backend/tsearch/dict_thesaurus.c`): multi-word
    * sample phrases → substitute lexemes. Each sample token is either
    * a subdictionary-normalized word or None for the `?` stopword
    * wildcard; substitutes are stored fully resolved (the `*` use-as-is
    * marker is applied at load). `subLang` is the subdictionary's
    * language, used to normalize input tokens and test stopwords. */
  final case class ThesaurusDict(
      entries: Seq[(Seq[Option[String]], Seq[String])],
      subLang: String) extends Dict
  /** ispell template (`dict_ispell.c` + `spell.c`): affix-stripping
    * morphology with controlled compound splitting — see
    * [[IspellDict]]. */
  final case class IspellD(data: IspellDict.IspellData) extends Dict

  private val registry = TrieMap[String, Dict](
    // contrib defaults available right after CREATE EXTENSION
    "intdict" -> IntDict(),
    "xsyn" -> XsynDict(Nil),
    "simple" -> SimpleDict,
    "english_stem" -> StemDict("english"),
    "german_stem" -> StemDict("german"),
    "french_stem" -> StemDict("french"),
    "spanish_stem" -> StemDict("spanish"),
    "russian_stem" -> StemDict("russian"),
    "portuguese_stem" -> StemDict("portuguese"),
    "italian_stem" -> StemDict("italian"),
    "dutch_stem" -> StemDict("dutch"),
    "danish_stem" -> StemDict("danish"),
    "norwegian_stem" -> StemDict("norwegian"),
    "swedish_stem" -> StemDict("swedish"),
    "finnish_stem" -> StemDict("finnish"),
    "hungarian_stem" -> StemDict("hungarian"),
    "romanian_stem" -> StemDict("romanian"),
    "turkish_stem" -> StemDict("turkish"))

  /** PG ts_lexize contract: None = dictionary does not recognize the
    * token (SQL NULL); Some(Nil) = recognized and discarded. */
  private[functions] def lexizeWith(dicts: Map[String, Dict], dict: String,
                                    token: String): Option[Seq[String]] = {
    dicts.get(dict.toLowerCase) match {
      case None =>
        throw new IllegalArgumentException(
          s"text search dictionary \"$dict\" does not exist")
      case Some(IntDict(maxlen, rejectLong)) =>
        if (token.length > maxlen)
          if (rejectLong) Some(Nil) else Some(Seq(token.substring(0, maxlen)))
        else Some(Seq(token))
      case Some(XsynDict(groups, matchOrig, keepOrig, matchSyn, keepSyn)) =>
        val w = token.toLowerCase
        groups.collectFirst {
          case (key, syns) if (matchOrig && key == w) ||
            (matchSyn && syns.contains(w)) =>
            (if (keepOrig) Seq(key) else Nil) ++ (if (keepSyn) syns else Nil)
        }
      case Some(SynonymDict(pairs, cs)) =>
        pairs.get(if (cs) token else token.toLowerCase).map(Seq(_))
      case Some(StemDict(lang)) =>
        Some(Seq(TsLexize.stemmerFor(lang)(token.toLowerCase)))
      case Some(SimpleDict) => Some(Seq(token.toLowerCase))
      case Some(IspellD(data)) => IspellDict.lexize(data, token)
      case Some(ThesaurusDict(entries, subLang)) =>
        // single-token lexize matches single-word samples only (the
        // reference's stateful multi-token protocol lives in
        // thesaurusApply; tsdicts.out pins ts_lexize('thesaurus',
        // 'one') = {1})
        val norm = TsLexize.stemmerFor(subLang)(token.toLowerCase)
        entries.collectFirst {
          case (Seq(Some(s)), subst) if s == norm => subst
        }
    }
  }

  /** The thesaurus phrase pass (`dict_thesaurus.c` thesaurus_lexize's
    * accumulating state machine, flattened over an in-hand token
    * array): greedy LONGEST sample match at each position — matched
    * phrases emit their substitute lexemes, `?` sample tokens match
    * any stopword, unmatched tokens fall through to the
    * subdictionary chain (stopword drop + stem), exactly the standard
    * `thesaurus, <lang>_stem` configuration mapping the reference's
    * tsdicts regress test wires up. */
  private[functions] def thesaurusApplyWith(dicts: Map[String, Dict],
                                            dict: String,
                                            words: Seq[String]): Seq[String] = {
    val d = dicts.get(dict.toLowerCase) match {
      case Some(t: ThesaurusDict) => t
      case Some(_) => throw new IllegalArgumentException(
        s"text search dictionary \"$dict\" is not a thesaurus")
      case None => throw new IllegalArgumentException(
        s"text search dictionary \"$dict\" does not exist")
    }
    val stem = TsLexize.stemmerFor(d.subLang)
    val stop = TsLexize.stopwordSet(d.subLang)
    val lower = words.map(_.toLowerCase)
    val norm = lower.map(stem)
    // longest sample first; ties keep file order (checkMatch walks
    // variants longest-last, returning the full-phrase hit)
    val ordered = d.entries.sortBy(-_._1.length)
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < lower.length) {
      val hit = ordered.find { case (sample, _) =>
        sample.length <= lower.length - i && sample.indices.forall { j =>
          sample(j) match {
            case Some(s) => s == norm(i + j)
            case None => stop.contains(lower(i + j)) // '?' wildcard
          }
        }
      }
      hit match {
        case Some((sample, subst)) =>
          out ++= subst
          i += sample.length
        case None =>
          if (!stop.contains(lower(i))) out += stem(lower(i))
          i += 1
      }
    }
    out.result()
  }

  /** (Re)register ts_lexize + the thesaurus phrase pass over an
    * immutable registry snapshot. */
  def refresh(spark: SparkSession): Unit = {
    val snapshot: Map[String, Dict] = registry.toMap
    spark.udf.register("ts_lexize", (dict: String, token: String) =>
      if (dict == null || token == null) null
      else lexizeWith(snapshot, dict, token).map(_.toArray).orNull)
    spark.udf.register("ts_thesaurus_apply",
      (dict: String, words: Seq[String]) =>
        if (dict == null || words == null) null
        else thesaurusApplyWith(snapshot, dict,
          words.filter(_ != null)).toArray)
    ()
  }

  /** `key = value` option list inside the DDL parens; values may be
    * single-quoted or bare. */
  private def options(body: String): Map[String, String] =
    "([\\w]+)\\s*=\\s*(?:'([^']*+(?:''[^']*+)*+)'|([\\w.\\-/]+))".r
      .findAllMatchIn(body).map { m =>
        m.group(1).toLowerCase ->
          Option(m.group(2)).map(_.replace("''", "'")).getOrElse(m.group(3))
      }.toMap

  private def readRules(path: String): Seq[(String, Seq[String])] = {
    val f = new java.io.File(path)
    require(f.isFile, s"rules file not found: $path")
    scala.io.Source.fromFile(f, "UTF-8").getLines().flatMap { raw =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#")) None
      else {
        val ws = line.toLowerCase.split("\\s+").toSeq
        Some(ws.head -> ws.tail)
      }
    }.toSeq
  }

  private def readSynonyms(path: String,
                           caseSensitive: Boolean): Map[String, String] = {
    val f = new java.io.File(path)
    require(f.isFile, s"synonym file not found: $path")
    scala.io.Source.fromFile(f, "UTF-8").getLines().flatMap { raw =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#")) None
      else line.split("\\s+").toSeq match {
        case Seq(w, s, _*) =>
          Some((if (caseSensitive) w else w.toLowerCase) ->
            (if (caseSensitive) s else s.toLowerCase))
        case _ => None
      }
    }.toMap
  }

  /** `.ths` file: `sample words : substitute words` per line, `#`
    * comments; `?` sample token = stopword wildcard, `*`-prefixed
    * substitute = use as-is (no subdictionary normalization)
    * (dict_thesaurus.c thesaurusRead, and the format comment in the
    * reference's own thesaurus_sample.ths). */
  private def readThesaurus(path: String,
                            subLang: String): Seq[(Seq[Option[String]], Seq[String])] = {
    val f = new java.io.File(path)
    require(f.isFile, s"thesaurus file not found: $path")
    val stem = TsLexize.stemmerFor(subLang)
    scala.io.Source.fromFile(f, "UTF-8").getLines().flatMap { raw =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#") || !line.contains(":")) None
      else {
        val Array(sample, subst) = line.split(":", 2)
        val sampleToks = sample.trim.toLowerCase.split("\\s+").toSeq
          .filter(_.nonEmpty)
          .map(w => if (w == "?") None else Some(stem(w)))
        val substToks = subst.trim.split("\\s+").toSeq.filter(_.nonEmpty)
          .map { w =>
            if (w.startsWith("*")) w.substring(1).toLowerCase
            else stem(w.toLowerCase)
          }
        if (sampleToks.isEmpty || substToks.isEmpty) None
        else Some(sampleToks -> substToks)
      }
    }.toSeq
  }

  private def bool(v: String): Boolean =
    v.equalsIgnoreCase("true") || v.equalsIgnoreCase("t") ||
      v.equalsIgnoreCase("on") || v == "1" || v.equalsIgnoreCase("yes")

  private def buildFromOptions(template: String, opts: Map[String, String],
                               base: Option[Dict]): Dict =
    template match {
      case "intdict_template" | "intdict" =>
        val prior = base.collect { case d: IntDict => d }.getOrElse(IntDict())
        val maxlen = opts.get("maxlen").map(_.toInt).getOrElse(prior.maxlen)
        require(maxlen >= 1, "maxlen value has to be >= 1")
        IntDict(maxlen,
          opts.get("rejectlong").map(bool).getOrElse(prior.rejectLong))
      case "xsyn_template" | "xsyn" =>
        val prior = base.collect { case d: XsynDict => d }
          .getOrElse(XsynDict(Nil))
        XsynDict(
          opts.get("rules").map(readRules).getOrElse(prior.groups),
          opts.get("matchorig").map(bool).getOrElse(prior.matchOrig),
          opts.get("keeporig").map(bool).getOrElse(prior.keepOrig),
          opts.get("matchsynonyms").map(bool).getOrElse(prior.matchSynonyms),
          opts.get("keepsynonyms").map(bool).getOrElse(prior.keepSynonyms))
      case "synonym" =>
        val cs = opts.get("casesensitive").map(bool).getOrElse(false)
        SynonymDict(opts.get("synonyms").map(readSynonyms(_, cs))
          .getOrElse(Map.empty), cs)
      case "snowball" =>
        StemDict(opts.get("language")
          .orElse(base.collect { case StemDict(l) => l })
          .getOrElse("english"))
      case "simple" => SimpleDict
      case "thesaurus" =>
        val subLang = opts.get("dictionary")
          .map(_.toLowerCase.stripPrefix("public.").stripSuffix("_stem"))
          .orElse(base.collect { case ThesaurusDict(_, l) => l })
          .getOrElse("english")
        val prior = base.collect { case d: ThesaurusDict => d.entries }
        ThesaurusDict(
          opts.get("dictfile").map(readThesaurus(_, subLang))
            .orElse(prior).getOrElse(Nil),
          subLang)
      case "ispell" =>
        def readLines(path: String, ext: String): Seq[String] = {
          val tries = Seq(path, path + ext)
          val f = tries.map(new java.io.File(_)).find(_.isFile)
            .getOrElse(throw new IllegalArgumentException(
              s"ispell file not found: $path"))
          scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq
        }
        (opts.get("dictfile"), opts.get("afffile")) match {
          case (Some(dp), Some(ap)) =>
            val stop = opts.get("stopwords")
              .map(readLines(_, ".stop").map(_.trim).filter(_.nonEmpty)
                .map(_.toLowerCase).toSet)
              .getOrElse(Set.empty[String])
            IspellD(IspellDict.build(
              readLines(dp, ".dict"), readLines(ap, ".affix"), stop))
          case _ =>
            base.collect { case d: IspellD => d }.getOrElse(
              throw new IllegalArgumentException(
                "ispell template requires DictFile and AffFile"))
        }
      case other =>
        throw new IllegalArgumentException(
          s"unsupported text search template \"$other\"")
    }

  /** CREATE TEXT SEARCH DICTIONARY name (TEMPLATE = t, opt = v, ...). */
  def create(spark: SparkSession, ddl: String): Unit = {
    val m = ("(?is)^CREATE\\s+TEXT\\s+SEARCH\\s+DICTIONARY\\s+" +
      "(?:IF\\s+NOT\\s+EXISTS\\s+)?([\\w.\"]+)\\s*\\((.*)\\)\\s*;?\\s*$").r
      .findFirstMatchIn(ddl.trim).getOrElse(throw new IllegalArgumentException(
        s"cannot parse CREATE TEXT SEARCH DICTIONARY: $ddl"))
    val name = m.group(1).replace("\"", "").toLowerCase.stripPrefix("public.")
    val opts = options(m.group(2))
    val template = opts.getOrElse("template",
      throw new IllegalArgumentException("TEMPLATE option is required"))
      .toLowerCase.stripPrefix("public.")
    registry.put(name, buildFromOptions(template, opts - "template", None))
    refresh(spark)
  }

  /** ALTER TEXT SEARCH DICTIONARY name (opt = v, ...) — re-configure
    * in place, keeping unnamed options (tsearchcmds.c AlterTSDictionary). */
  def alter(spark: SparkSession, ddl: String): Unit = {
    val m = ("(?is)^ALTER\\s+TEXT\\s+SEARCH\\s+DICTIONARY\\s+" +
      "([\\w.\"]+)\\s*\\((.*)\\)\\s*;?\\s*$").r
      .findFirstMatchIn(ddl.trim).getOrElse(throw new IllegalArgumentException(
        s"cannot parse ALTER TEXT SEARCH DICTIONARY: $ddl"))
    val name = m.group(1).replace("\"", "").toLowerCase.stripPrefix("public.")
    val base = registry.getOrElse(name, throw new IllegalArgumentException(
      s"text search dictionary \"$name\" does not exist"))
    val template = base match {
      case _: IntDict => "intdict_template"
      case _: XsynDict => "xsyn_template"
      case _: SynonymDict => "synonym"
      case StemDict(_) => "snowball"
      case SimpleDict => "simple"
      case _: ThesaurusDict => "thesaurus"
      case _: IspellD => "ispell"
    }
    registry.put(name,
      buildFromOptions(template, options(m.group(2)), Some(base)))
    refresh(spark)
  }

  def drop(spark: SparkSession, ddl: String): Unit = {
    val m = ("(?is)^DROP\\s+TEXT\\s+SEARCH\\s+DICTIONARY\\s+" +
      "(?:IF\\s+EXISTS\\s+)?([\\w.\"]+)").r.findFirstMatchIn(ddl.trim)
      .getOrElse(throw new IllegalArgumentException(
        s"cannot parse DROP TEXT SEARCH DICTIONARY: $ddl"))
    registry.remove(
      m.group(1).replace("\"", "").toLowerCase.stripPrefix("public."))
    refresh(spark)
  }
}
