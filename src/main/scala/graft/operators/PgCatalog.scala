package graft.operators

import org.apache.spark.sql.SparkSession

/** pg_catalog / gp_toolkit compatibility views — the introspection
  * surface every migrating client pokes first (psql's `\d` runs over
  * `pg_class`/`pg_namespace`; ORMs and BI tools read `pg_tables` and
  * `information_schema`; Greengage utilities read
  * `gp_segment_configuration` — reference `src/include/catalog/
  * pg_class.h`, `gp_segment_config.h`).
  *
  * The views are plain temp views derived from the Spark session
  * catalog on the driver (catalog listings are small by definition).
  * They snapshot at registration; [[graft.Graft.execute]] re-registers
  * before any statement that mentions one, so a query always sees the
  * current catalog. "Segments" are the session's shuffle partitions —
  * the same identification the engine uses everywhere else
  * (GRAFT_SEGMENT_ID in external protocols).
  */
object PgCatalog {

  val viewNames: Seq[String] = Seq(
    "pg_tables", "pg_views", "pg_namespace", "pg_class", "pg_attribute",
    "gp_segment_configuration", "gp_id", "information_schema",
    "pg_partitions", "pg_settings", "pg_type", "pg_authid", "pg_indexes",
    "pg_partition_templates", "pg_stats", "pg_partition_columns",
    "pg_partition")

  // role registry (CREATE/DROP ROLE record here; the statements are
  // otherwise no-ops) — oid is a stable surrogate for the
  // pg_type.typowner = pg_authid.oid join
  private val roles =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  roles.put("gpadmin", 10L) // the bootstrap superuser (pg_authid.h)

  def recordRole(name: String): Unit = {
    roles.putIfAbsent(name.toLowerCase,
      (name.toLowerCase.hashCode.toLong & 0x7fffffffL) | 0x10000L)
    ()
  }

  def dropRole(name: String): Unit = {
    if (name.toLowerCase != "gpadmin") roles.remove(name.toLowerCase)
    ()
  }

  // table ACLs (aclchk.c): GRANT ON a partitioned table reaches its
  // children through the parent lookup below (and so covers children
  // added later, like GP's cascading GRANT); a per-child REVOKE
  // carves an exception without touching siblings
  private val aclGrants =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()
  private val aclRevokes =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  private def aclKey(role: String, rel: String): String =
    role.toLowerCase + "#" + rel.toLowerCase.replace("\"", "")
      .replaceAll("^public\\.", "")

  def recordGrant(role: String, rel: String, privs: Set[String]): Unit = {
    aclGrants.merge(aclKey(role, rel), privs, (a, b) => a ++ b)
    aclRevokes.computeIfPresent(aclKey(role, rel), (_, p) => p -- privs)
    ()
  }

  def recordRevoke(role: String, rel: String, privs: Set[String]): Unit = {
    aclRevokes.merge(aclKey(role, rel), privs, (a, b) => a ++ b)
    aclGrants.computeIfPresent(aclKey(role, rel),
      (_, p) => if (privs.contains("all")) Set.empty else p -- privs)
    ()
  }

  /** True when `role` holds `priv` on `rel`: a direct grant, or an
    * inherited grant from the partition parent, minus any per-rel
    * revoke. Unrecorded roles (the session superuser) hold everything. */
  def roleHasPrivilege(role: String, rel: String, priv: String): Boolean = {
    val r = role.toLowerCase
    if (!roles.containsKey(r)) return true
    val p = priv.toLowerCase
    def revoked(k: String) = Option(aclRevokes.get(k))
      .exists(s => s.contains("all") || s.contains(p))
    def granted(k: String) = Option(aclGrants.get(k))
      .exists(s => s.contains("all") || s.contains(p))
    val k = aclKey(r, rel)
    if (revoked(k)) false
    else if (granted(k)) true
    else GreengageDdl.childTarget(rel.toLowerCase.replace("\"", ""))
      .exists { case (parent, _) => roleHasPrivilege(r, parent, p) }
  }

  def isRecordedRole(role: String): Boolean =
    roles.containsKey(role.toLowerCase)

  // ANALYZE-computed per-column statistics for the pg_stats view
  // (commands/analyze.c → pg_statistic → the system view): ONE agg
  // pass per relation — null counts and NDVs for every column at once
  private val statsReg = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(String, String, String, Double, Int, Double)]]()

  /** Record pg_stats rows for `table` and (when partitioned) its
    * child relations, as GP's analyze does for the whole hierarchy. */
  def recordStats(spark: SparkSession, table: String): Unit = try {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    def widthOf(dt: DataType): Int = dt match {
      case BooleanType => 1
      case ShortType => 2
      case IntegerType | FloatType | DateType => 4
      case LongType | DoubleType | TimestampType | TimestampNTZType => 8
      case _: DecimalType => 10
      case _ => 32
    }
    def one(rel: String, display: String): Seq[(String, String, String,
        Double, Int, Double)] = try {
      val df = spark.table(rel)
      val fields = df.schema.fields.toSeq
      if (fields.isEmpty) return Seq.empty
      val aggs = count(lit(1)).as("__n") +: fields.flatMap(f => Seq(
        sum(when(col(f.name).isNull, 1L).otherwise(0L)),
        count_distinct(col(f.name))))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(0)
      if (n == 0) return Seq.empty
      val schema = {
        val i = rel.lastIndexOf('.')
        if (i > 0) rel.substring(0, i)
        else (try spark.sessionState.catalog.getTempViewOrPermanentTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(rel))
          .identifier.database
        catch { case scala.util.control.NonFatal(_) => None })
          .filterNot(_ == "default").getOrElse("public")
      }
      fields.zipWithIndex.map { case (f, i) =>
        val nulls = row.getLong(1 + i * 2)
        val d = row.getLong(2 + i * 2)
        val nonNull = n - nulls
        // PG's compute_scalar_stats: all-distinct → -1; >10% of rows
        // distinct → the negative RATIO; otherwise the absolute count
        val ndv =
          if (nonNull > 0 && d == nonNull) -1.0
          else if (nonNull > 0 && d.toDouble / nonNull > 0.1)
            -(d.toDouble / nonNull)
          else d.toDouble
        (schema, display.split("\\.").last, f.name,
          if (n == 0) 0.0 else nulls.toDouble / n, widthOf(f.dataType), ndv)
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
    val key = table.toLowerCase.replace("\"", "")
    statsReg.put(key, one(key, key))
    // the child relations analyze with the root (analyze.c inh pass)
    GreengageDdl.childRelationsOf(key).foreach { child =>
      statsReg.put(child, one(child, child))
    }
    ()
  } catch { case scala.util.control.NonFatal(_) => () }

  /** True if `sql` mentions any catalog view outside string literals —
    * the router's refresh trigger. */
  def mentionsCatalog(sql: String): Boolean = {
    val lower = sql.toLowerCase
    viewNames.exists(lower.contains)
  }

  def register(spark: SparkSession): Unit = {
    import spark.implicits._
    def f(n: String) = org.apache.spark.sql.types.StructField(
      n, org.apache.spark.sql.types.StringType)
    val db = spark.catalog.currentDatabase
    // EVERY schema's relations (pg_class spans the database; a
    // mid-script SET search_path must not hide public's tables) —
    // temp views appear once, under the current db listing
    val tables = {
      val dbs = (spark.catalog.listDatabases().collect().map(_.name)
        .toSeq :+ db).distinct
      val seen = scala.collection.mutable.Set[String]()
      dbs.flatMap { d =>
        try spark.catalog.listTables(d).collect().toSeq.filter { t =>
          val k = s"${Option(t.database).getOrElse("")}.${t.name}" +
            t.isTemporary
          seen.add(k)
        }
        catch { case scala.util.control.NonFatal(_) => Seq.empty }
      }
    }

    // relkind: 'r' table, 'v' view (pg_class.h relkind values); oid is
    // a deterministic surrogate (name hash) — stable within a snapshot,
    // which is all a catalog join needs; relisshared is false for every
    // user relation (only global catalogs are shared, pg_class.h)
    val classes = tables.map { t =>
      // partition-child relations are VIEWS over the parent here, but
      // GP stores them as real child heaps — pg_class/pg_tables
      // report them as tables
      val isChild = GreengageDdl.childTarget(t.name).isDefined
      val kind =
        if ((t.tableType == "VIEW" || t.isTemporary) && !isChild) "v" else "r"
      // Spark's 'default' database IS PG's 'public' schema
      val ns = Option(t.database).filterNot(_ == "default").getOrElse("public")
      (t.name, ns, kind)
    }.toSeq
    classes.map { case (n, ns, k) =>
      ((n.hashCode.toLong & 0x7fffffffL), n, ns, k, false)
    }.toDF("oid", "relname", "relnamespace", "relkind", "relisshared")
      .createOrReplaceTempView("pg_class")

    classes.filter(_._3 == "r")
      .map { case (n, ns, _) => (ns, n, "graft", null: String, false, false, false) }
      .toDF("schemaname", "tablename", "tableowner", "tablespace",
        "hasindexes", "hasrules", "hastriggers")
      .createOrReplaceTempView("pg_tables")

    classes.filter(_._3 == "v")
      .map { case (n, ns, _) => (ns, n, "graft", "") }
      .toDF("schemaname", "viewname", "viewowner", "definition")
      .createOrReplaceTempView("pg_views")

    (Seq("pg_catalog", "public", db) ++
      spark.catalog.listDatabases().collect().map(_.name).toSeq)
      .distinct.map(n => ((n.hashCode.toLong & 0x7fffffffL), n))
      .toDF("oid", "nspname")
      .createOrReplaceTempView("pg_namespace")

    // gp_id (gp_id.h): the cluster-identity singleton scripts read for
    // a one-row relation; local mode is one "segment"
    Seq(("graft", 1, 1, -1))
      .toDF("gpname", "numsegments", "dbid", "content")
      .createOrReplaceTempView("gp_id")

    // attributes for every relation, 1-based attnum (pg_attribute.h);
    // typname is the Spark SQL type lowercased — close enough for the
    // introspection queries that read it
    val attrs = tables.flatMap { t =>
      try spark.catalog.listColumns(t.name).collect().toSeq.zipWithIndex.map {
        case (c, i) => (t.name, c.name, c.dataType.toLowerCase, i + 1,
          !c.nullable)
      } catch {
        case scala.util.control.NonFatal(_) =>
          Seq.empty[(String, String, String, Int, Boolean)]
      }
    }.toSeq
    attrs.toDF("relname", "attname", "typname", "attnum", "attnotnull")
      // attrelid: regclass degrades to the relation NAME ('r'::regclass
      // → 'r'), so the join key is the name itself
      .withColumn("attrelid", org.apache.spark.sql.functions.col("relname"))
      .createOrReplaceTempView("pg_attribute")

    // information_schema (upstream PG information_schema.sql): the SQL
    // front door maps information_schema.X to these views. PG-style
    // type names for data_type (infschema column domains).
    def pgTypeName(spark0: String): String = spark0.toLowerCase match {
      case "int" | "integer" => "integer"
      case "bigint" => "bigint"
      case "smallint" => "smallint"
      case "double" => "double precision"
      case "float" => "real"
      case "string" => "text"
      case "binary" => "bytea"
      case "timestamp_ntz" => "timestamp without time zone"
      case "timestamp" => "timestamp with time zone"
      case s if s.startsWith("decimal") =>
        s.replace("decimal", "numeric")
      case s if s.startsWith("varchar") || s.startsWith("char") =>
        "character varying"
      case s if s.startsWith("array") => "ARRAY"
      case other => other
    }
    def pgSchema(ns: String): String = if (ns == "default") "public" else ns
    classes.map { case (n, ns, k) =>
      ("graft", pgSchema(ns), n, if (k == "v") "VIEW" else "BASE TABLE")
    }.toDF("table_catalog", "table_schema", "table_name", "table_type")
      .createOrReplaceTempView("__is_tables")
    attrs.map { case (rel, col, typ, num, notnull) =>
      ("graft", "public", rel, col, num, pgTypeName(typ),
        if (notnull) "NO" else "YES")
    }.toDF("table_catalog", "table_schema", "table_name", "column_name",
      "ordinal_position", "data_type", "is_nullable")
      .createOrReplaceTempView("__is_columns")
    classes.filter(_._3 == "v").map { case (n, ns, _) =>
      ("graft", pgSchema(ns), n, null: String)
    }.toDF("table_catalog", "table_schema", "table_name", "view_definition")
      .createOrReplaceTempView("__is_views")
    (spark.catalog.listDatabases().collect().map(_.name).toSeq :+ "public")
      .distinct.map(("graft", _)).toDF("catalog_name", "schema_name")
      .createOrReplaceTempView("__is_schemata")
    // information_schema.table_constraints from the declared-constraint
    // registry (constraints parse + record, never enforce)
    GreengageDdl.allConstraints(spark).map { case (t, cn, ct) =>
      val (sch, bare) = {
        val i = t.lastIndexOf('.')
        if (i > 0) (t.substring(0, i), t.substring(i + 1)) else ("public", t)
      }
      ("graft", sch, cn, sch, bare, ct)
    }.toDF("constraint_catalog", "constraint_schema", "constraint_name",
      "table_schema", "table_name", "constraint_type")
      .createOrReplaceTempView("__is_table_constraints")

    // pg_partitions (system_views.sql:763): the partition
    // introspection view every GP maintenance script reads. Rows come
    // from the bound registry GreengageDdl records at CREATE — the
    // child tables are virtual (dynamic value partitioning stores the
    // data), but their DECLARED identity (name, rank, bounds,
    // boundary text) is exactly what the reference reports.
    val partRows = GreengageDdl.partChildren(spark).map { c =>
      (c.schemaname, c.tablename, c.schemaname, c.partitiontablename,
        c.partitionname, c.parentchild, c.parentname, c.partitiontype,
        c.partitionlevel,
        c.partitionrank.map(java.lang.Long.valueOf).orNull,
        c.partitionposition,
        GreengageDdl.displayListVals(c.partitionlistvalues),
        c.partitionrangestart,
        c.partitionstartinclusive.map(java.lang.Boolean.valueOf).orNull,
        c.partitionrangeend,
        c.partitionendinclusive.map(java.lang.Boolean.valueOf).orNull,
        c.partitioneveryclause, c.partitionisdefault, c.partitionboundary,
        "pg_default", "pg_default")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(partRows.map(org.apache.spark.sql.Row
        .fromTuple), 1),
      org.apache.spark.sql.types.StructType(Seq(
        f("schemaname"), f("tablename"), f("partitionschemaname"),
        f("partitiontablename"), f("partitionname"),
        f("parentpartitiontablename"), f("parentpartitionname"),
        f("partitiontype"),
        org.apache.spark.sql.types.StructField("partitionlevel",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("partitionrank",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("partitionposition",
          org.apache.spark.sql.types.LongType),
        f("partitionlistvalues"), f("partitionrangestart"),
        org.apache.spark.sql.types.StructField("partitionstartinclusive",
          org.apache.spark.sql.types.BooleanType),
        f("partitionrangeend"),
        org.apache.spark.sql.types.StructField("partitionendinclusive",
          org.apache.spark.sql.types.BooleanType),
        f("partitioneveryclause"),
        org.apache.spark.sql.types.StructField("partitionisdefault",
          org.apache.spark.sql.types.BooleanType),
        f("partitionboundary"), f("parenttablespace"),
        f("partitiontablespace"))))
      .createOrReplaceTempView("pg_partitions")

    // pg_partition_templates (system_views.sql): declared SUBPARTITION
    // TEMPLATE items, one row per item per level
    val tmplRows = GreengageDdl.partTemplates(spark).map { c =>
      (c.schemaname, c.tablename, c.partitionname, c.partitiontype,
        c.partitionlevel,
        c.partitionrank.map(java.lang.Long.valueOf).orNull,
        c.partitionposition,
        GreengageDdl.displayListVals(c.partitionlistvalues),
        c.partitionrangestart,
        c.partitionstartinclusive.map(java.lang.Boolean.valueOf).orNull,
        c.partitionrangeend,
        c.partitionendinclusive.map(java.lang.Boolean.valueOf).orNull,
        c.partitioneveryclause, c.partitionisdefault, c.partitionboundary)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        tmplRows.map(org.apache.spark.sql.Row.fromTuple), 1),
      org.apache.spark.sql.types.StructType(Seq(
        f("schemaname"), f("tablename"), f("partitionname"),
        f("partitiontype"),
        org.apache.spark.sql.types.StructField("partitionlevel",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("partitionrank",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("partitionposition",
          org.apache.spark.sql.types.LongType),
        f("partitionlistvalues"), f("partitionrangestart"),
        org.apache.spark.sql.types.StructField("partitionstartinclusive",
          org.apache.spark.sql.types.BooleanType),
        f("partitionrangeend"),
        org.apache.spark.sql.types.StructField("partitionendinclusive",
          org.apache.spark.sql.types.BooleanType),
        f("partitioneveryclause"),
        org.apache.spark.sql.types.StructField("partitionisdefault",
          org.apache.spark.sql.types.BooleanType),
        f("partitionboundary"))))
      .createOrReplaceTempView("pg_partition_templates")

    // pg_stats (system_views.sql over pg_statistic): the engine's CBO
    // statistics live in Spark's own catalog, not pg_statistic — the
    // compat view is schema-complete but EMPTY (clients that read it
    // get "no stats", never an error)
    {
      import scala.jdk.CollectionConverters._
      statsReg.asScala.toSeq.flatMap { case (tbl, rows) =>
        val exists = try spark.catalog.tableExists(tbl)
          catch { case scala.util.control.NonFatal(_) => false }
        if (exists) rows else { statsReg.remove(tbl); Seq.empty }
      }.map { case (sc, tn, at, nf, aw, nd) =>
        (sc, tn, at, nf, aw, nd, null: String, null: String,
          null: String, null: java.lang.Double)
      }.toDF("schemaname", "tablename", "attname", "null_frac",
        "avg_width", "n_distinct", "most_common_vals",
        "most_common_freqs", "histogram_bounds", "correlation")
        .createOrReplaceTempView("pg_stats")
    }

    // pg_partition_columns (system_views.sql): one row per declared
    // partition-key column per level
    GreengageDdl.partColumnRows(spark)
      .toDF("schemaname", "tablename", "columnname",
        "partitionlevel", "position_in_partition_key")
      .createOrReplaceTempView("pg_partition_columns")

    // pg_settings (guc.c show_all_settings): the GUC metadata + the
    // session's live values
    Guc.pgSettingsRows(spark)
      .toDF("name", "setting", "unit", "category", "vartype", "boot_val")
      .createOrReplaceTempView("pg_settings")

    // pg_authid (pg_authid.h) from the role registry; pg_type
    // (pg_type.h) from the user-type registry with recorded owners —
    // the `alter type .. owner to` introspection join reads these
    {
      import scala.jdk.CollectionConverters._
      val roleRows = roles.asScala.toSeq.map { case (n, oid) =>
        (oid.longValue, n) }
      roleRows.toDF("oid", "rolname").createOrReplaceTempView("pg_authid")
      val byRole = roleRows.map(_.swap).toMap
      // every TABLE also owns a composite row type ('c'/'C') and its
      // array type ('_name', 'b'/'A') — pg_type.h typtype/typcategory;
      // partition children are views here and get neither
      val tableTypeRows = (try {
        val db = spark.catalog.currentDatabase
        spark.sessionState.catalog.listTables(db)
          .filter { ti =>
            try spark.sessionState.catalog
              .getTableMetadata(ti).tableType.name == "MANAGED"
            catch { case scala.util.control.NonFatal(_) => false }
          }
          .map(_.table.toLowerCase)
      } catch { case scala.util.control.NonFatal(_) => Seq.empty })
        .flatMap(t => Seq((t, 10L, "c", "C"), ("_" + t, 10L, "b", "A")))
      val userTypeRows = PgTypes.allTypes.map { case (n, owner) =>
        (n, byRole.getOrElse(owner.toLowerCase, 10L), "b", "U")
      }
      (userTypeRows ++ tableTypeRows
        .filterNot(r => userTypeRows.exists(_._1 == r._1)))
        .toDF("typname", "typowner", "typtype", "typcategory")
        .createOrReplaceTempView("pg_type")
    }

    // pg_indexes (system_views.sql): the recorded CREATE INDEX /
    // UNIQUE / PRIMARY KEY surface (a dropped table's lingering
    // records filter out). An index on a partitioned table cascades
    // one row per LEAF child (DefineIndex builds a child index per
    // heap, named <child>_<cols>_idx / _key / <child>_pkey).
    GreengageDdl.indexDefs.filter { case (_, (tbl, _, _, _, _)) =>
      try spark.catalog.tableExists(tbl)
      catch { case scala.util.control.NonFatal(_) => false }
    }.flatMap { case (idx, (tbl, method, cols, unique, kind)) =>
      val (schema, bare) = {
        val i = tbl.lastIndexOf('.')
        if (i > 0) (tbl.substring(0, i), tbl.substring(i + 1))
        else ("public", tbl)
      }
      val u = if (unique) "UNIQUE " else ""
      def defOf(name: String, rel: String) =
        s"CREATE ${u}INDEX $name ON $schema.$rel USING $method " +
          s"(${cols.mkString(", ")})"
      val parentRow = (schema, bare, idx, null: String, defOf(idx, bare))
      val childRows = GreengageDdl.leafChildRelationsOf(tbl).map { ch =>
        val cn = kind match {
          case "pkey" => s"${ch}_pkey"
          case "key" => (ch +: cols).mkString("_") + "_key"
          case _ => (ch +: cols).mkString("_") + "_idx"
        }
        (schema, ch, cn, null: String, defOf(cn, ch))
      }
      parentRow +: childRows
    }.toDF("schemaname", "tablename", "indexname", "tablespace", "indexdef")
      .createOrReplaceTempView("pg_indexes")

    // pg_partition / pg_partition_rule (GP's raw partition catalogs,
    // cdbpartition.c): one pg_partition row per (table, level), one
    // rule row per child. parrelid/parchildrelid carry the relation
    // NAMES (regclass casts map to STRING here), oids are name-hash
    // surrogates — stable within a snapshot, which is all the
    // introspection joins need.
    {
      val kids = GreengageDdl.partChildren(spark)
      def oidOf(s: String): Long = s.hashCode.toLong & 0x7fffffffL
      val parRows = kids.map(c => (c.tablename, c.partitionlevel)).distinct
        .map { case (t, lvl) =>
          (oidOf(s"$t#$lvl"), t, lvl, false)
        }
      parRows.toDF("oid", "parrelid", "parlevel", "paristemplate")
        .createOrReplaceTempView("pg_partition")
      kids.map { c =>
        (oidOf(c.partitiontablename),
          oidOf(s"${c.tablename}#${c.partitionlevel}"),
          c.partitiontablename, c.partitionname,
          c.partitionisdefault, c.partitionposition)
      }.toDF("oid", "paroid", "parchildrelid", "parname",
        "parisdefault", "parruleord")
        .createOrReplaceTempView("pg_partition_rule")
    }

    // one primary row per "segment" (= shuffle partition) + the master
    val nSeg = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    ((-1 until nSeg).map { content =>
      (content + 2, content, "p", "p", "u", "localhost")
    }).toDF("dbid", "content", "role", "preferred_role", "status", "hostname")
      .createOrReplaceTempView("gp_segment_configuration")
  }
}
