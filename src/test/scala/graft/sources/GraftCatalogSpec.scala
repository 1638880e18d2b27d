package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.plans.SnapshotTable

/** The `graft` TableCatalog + ProcedureCatalog: the SQL-only lakehouse
  * surface — DDL, DML, time travel and maintenance, all by name. */
class GraftCatalogSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft_catalog_wh").toString
    GraftCatalog.register(spark, "graft", wh)
    wh
  }

  private def sql(q: String) = spark.sql(q)

  test("CREATE TABLE + INSERT merges by primaryKey property; SELECT by name") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.sales")
    sql("""CREATE TABLE graft.sales.orders
           (id BIGINT, status STRING, amount DOUBLE)
           PARTITIONED BY (status)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("""INSERT INTO graft.sales.orders
           VALUES (1, 'open', 10.0), (2, 'open', 20.0), (3, 'done', 30.0)""")
    // a second insert of id=2 MERGEs (replaces), not duplicates —
    // within its partition: the partition-scoped upsert contract
    sql("INSERT INTO graft.sales.orders VALUES (2, 'open', 99.0)")
    val rows = sql("""SELECT id, status, amount FROM graft.sales.orders
                      ORDER BY id""").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq ==
      Seq((1L, "open", 10.0), (2L, "open", 99.0), (3L, "done", 30.0)))
    // the partitioning and merge key came from the manifest, not the
    // session: a fresh path-based handle sees the same metadata
    val snap = SnapshotTable(spark, s"$warehouse/sales/orders", "id")
    assert(snap.properties.get("primaryKey").contains("id"))
  }

  test("keyless table: INSERT INTO is a blind append (duplicates kept)") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.raw")
    sql("CREATE TABLE graft.raw.events_log (id BIGINT, msg STRING)")
    sql("INSERT INTO graft.raw.events_log VALUES (1, 'a'), (2, 'b')")
    sql("INSERT INTO graft.raw.events_log VALUES (2, 'b2')")
    assert(sql("SELECT count(*) FROM graft.raw.events_log")
      .head().getLong(0) == 3)
  }

  test("CALL graft.system.files lists the live snapshot with DV counts") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.fp")
    sql("""CREATE TABLE graft.fp.t (id BIGINT, v STRING)
           PARTITIONED BY (v) TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.fp.t VALUES (1, 'a'), (2, 'b')")
    SnapshotTable(spark, s"$warehouse/fp/t", "id")
      .deleteMoR(org.apache.spark.sql.functions.col("id") === 1)
    val rows = sql("CALL graft.system.files('fp.t')").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) > 0), "bytes missing")
    assert(rows.map(_.getLong(3)).sum == 1, "DV count wrong")
    assert(rows.exists(_.getString(1).nonEmpty), "partition value missing")
  }

  test("SELECT from `t$branch_<name>` reads the branch line; unknown branch loud") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.bi")
    sql("""CREATE TABLE graft.bi.t (id BIGINT, v STRING)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.bi.t VALUES (1, 'a')")
    sql("CALL graft.system.create_branch('bi.t', 'dev')")
    SnapshotTable(spark, s"$warehouse/bi/t", "id").forBranch("dev")
      .upsert(Seq((2L, "b")).toDF("id", "v"))
    assert(sql("SELECT count(*) FROM graft.bi.`t$branch_dev`")
      .head().getLong(0) == 2)
    assert(sql("SELECT count(*) FROM graft.bi.t").head().getLong(0) == 1)
    val e1 = intercept[Exception](
      sql("SELECT * FROM graft.bi.`t$branch_ghost`").collect())
    assert(e1.getMessage.contains("no branch 'ghost'"), e1.getMessage)
  }

  test("branch DML matrix: INSERT/UPDATE/DELETE/MERGE commit on the branch; time travel resolves branch-locally") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.bdml")
    sql("""CREATE TABLE graft.bdml.t (id BIGINT, status STRING, amount DOUBLE)
           PARTITIONED BY (status)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("""INSERT INTO graft.bdml.t
           VALUES (1, 'open', 10.0), (2, 'open', 20.0), (3, 'done', 30.0)""")
    sql("CALL graft.system.create_branch('bdml.t', 'stage')")
    // the full DML matrix, all on the branch identifier
    sql("INSERT INTO graft.bdml.`t$branch_stage` VALUES (4, 'open', 40.0)")
    sql("UPDATE graft.bdml.`t$branch_stage` SET amount = amount + 1 WHERE id = 1")
    sql("DELETE FROM graft.bdml.`t$branch_stage` WHERE id = 3")
    sql("""MERGE INTO graft.bdml.`t$branch_stage` tgt
           USING (SELECT 2L AS id, 'open' AS status, 99.0D AS amount) src
           ON tgt.id = src.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
    val staged = sql("""SELECT id, amount FROM graft.bdml.`t$branch_stage`
                        ORDER BY id""").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(staged == Seq(1L -> 11.0, 2L -> 99.0, 4L -> 40.0), s"got $staged")
    // main is untouched by every staged mutation
    val main = sql("SELECT id, amount FROM graft.bdml.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(main == Seq(1L -> 10.0, 2L -> 20.0, 3L -> 30.0), s"got $main")
    // VERSION AS OF on the branch identifier resolves the BRANCH's
    // version sequence (v1 = the fork state)
    assert(sql("SELECT count(*) FROM graft.bdml.`t$branch_stage` VERSION AS OF 1")
      .head().getLong(0) == 3)
    // publish completes the pure-SQL WAP loop
    sql("CALL graft.system.publish_branch('bdml.t', 'stage')")
    sql("REFRESH TABLE graft.bdml.t")
    val published = sql("SELECT id, amount FROM graft.bdml.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(published == Seq(1L -> 11.0, 2L -> 99.0, 4L -> 40.0),
      s"got $published")
  }

  test("CALL graft.system.create_branch/branches/drop_branch round-trips") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.bp")
    sql("""CREATE TABLE graft.bp.t (id BIGINT, v STRING)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.bp.t VALUES (1, 'a')")            // v2
    sql("CALL graft.system.create_branch('bp.t', 'dev')")
    SnapshotTable(spark, s"$warehouse/bp/t", "id").forBranch("dev")
      .upsert(Seq((2L, "b")).toDF("id", "v"))
    val listed = sql("CALL graft.system.branches('bp.t')").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(listed == Seq("dev" -> 2L), s"got $listed")
    // main unchanged; branch readable through the DSv2 option
    assert(sql("SELECT count(*) FROM graft.bp.t").head().getLong(0) == 1)
    assert(spark.read.format("graft").option("branch", "dev")
      .load(s"$warehouse/bp/t").count() == 2)
    // write-audit-publish through SQL: fast-forward main to the branch
    sql("CALL graft.system.create_branch('bp.t', 'wap')")
    SnapshotTable(spark, s"$warehouse/bp/t", "id").forBranch("wap")
      .upsert(Seq((3L, "c")).toDF("id", "v"))
    sql("CALL graft.system.publish_branch('bp.t', 'wap')")
    spark.sql("REFRESH TABLE graft.bp.t")
    // main = the wap branch's state: (1,'a') + (3,'c') — dev's row
    // was never published
    assert(sql("SELECT count(*) FROM graft.bp.t").head().getLong(0) == 2)
    sql("CALL graft.system.drop_branch('bp.t', 'wap')")
    sql("CALL graft.system.drop_branch('bp.t', 'dev')")
    assert(sql("CALL graft.system.branches('bp.t')").count() == 0)
  }

  test("CALL graft.system.tag/tags/drop_tag round-trips through SQL") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.tp")
    sql("""CREATE TABLE graft.tp.t (id BIGINT, v STRING)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.tp.t VALUES (1, 'a')")            // v2
    sql("CALL graft.system.tag('tp.t', 'rel')")              // pin head
    sql("INSERT INTO graft.tp.t VALUES (1, 'b')")            // v3
    sql("CALL graft.system.tag('tp.t', 'first', 1)")         // explicit v
    val listed = sql("CALL graft.system.tags('tp.t')").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(listed == Seq("first" -> 1L, "rel" -> 2L))
    assert(sql("SELECT v FROM graft.tp.t VERSION AS OF 'rel'")
      .head().getString(0) == "a")
    sql("CALL graft.system.drop_tag('tp.t', 'first')")
    assert(sql("CALL graft.system.tags('tp.t')").count() == 1)
  }

  test("SQL time travel by TAG: VERSION AS OF 'name' resolves the pin") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.tags")
    sql("""CREATE TABLE graft.tags.t (id BIGINT, v STRING)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.tags.t VALUES (1, 'a')")          // v2
    SnapshotTable(spark, s"$warehouse/tags/t", "id").tag("rel")
    sql("INSERT INTO graft.tags.t VALUES (1, 'b')")          // v3 merge
    assert(sql("SELECT v FROM graft.tags.t VERSION AS OF 'rel'")
      .head().getString(0) == "a")
    assert(sql("SELECT v FROM graft.tags.t").head().getString(0) == "b")
    val e = intercept[Exception](
      sql("SELECT * FROM graft.tags.t VERSION AS OF 'ghost'").collect())
    assert(e.getMessage.contains("neither a numeric manifest id nor a tag"),
      e.getMessage)
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.tt")
    sql("""CREATE TABLE graft.tt.t (id BIGINT, v STRING)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.tt.t VALUES (1, 'one')") // v2 (v1 = empty create)
    Thread.sleep(20) // manifest mtimes are the commit clock
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(20)
    sql("INSERT INTO graft.tt.t VALUES (1, 'ONE'), (2, 'two')") // v3
    assert(sql("SELECT count(*) FROM graft.tt.t").head().getLong(0) == 2)
    assert(sql("SELECT v FROM graft.tt.t VERSION AS OF 2")
      .collect().map(_.getString(0)).toSeq == Seq("one"))
    val ts = new java.sql.Timestamp(betweenMs)
    val atTs = sql(
      s"SELECT v FROM graft.tt.t TIMESTAMP AS OF '$ts'")
      .collect().map(_.getString(0))
    assert(atTs.toSeq == Seq("one"))
    // DML against a pinned read is rejected, head DML still fine
    assertThrows[Exception](
      sql("DELETE FROM graft.tt.t VERSION AS OF 2 WHERE id = 1"))
  }

  test("MERGE INTO / UPDATE / DELETE resolve through the catalog") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    sql("""CREATE TABLE graft.dml.t (id BIGINT, v STRING)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.dml.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sql("""MERGE INTO graft.dml.t t USING (SELECT * FROM VALUES
             (2, 'B'), (4, 'd') AS s(id, v)) s
           ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
    sql("UPDATE graft.dml.t SET v = upper(v) WHERE id = 1")
    sql("DELETE FROM graft.dml.t WHERE id = 3")
    val rows = sql("SELECT id, v FROM graft.dml.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "A"), (2L, "B"), (4L, "d")))
  }

  test("ALTER TABLE: ADD COLUMNS evolves, SET/UNSET TBLPROPERTIES commit") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.alt")
    sql("""CREATE TABLE graft.alt.t (id BIGINT, v STRING)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.alt.t VALUES (1, 'a')")
    sql("ALTER TABLE graft.alt.t ADD COLUMNS (note STRING)")
    // old rows read the new column as null; inserts can fill it
    sql("INSERT INTO graft.alt.t VALUES (2, 'b', 'fresh')")
    val rows = sql("SELECT id, note FROM graft.alt.t ORDER BY id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq((1L, None), (2L, Some("fresh"))))
    sql("ALTER TABLE graft.alt.t SET TBLPROPERTIES ('owner.team' = 'data')")
    assert(SnapshotTable(spark, s"$warehouse/alt/t", "id")
      .properties.get("owner.team").contains("data"))
    sql("ALTER TABLE graft.alt.t UNSET TBLPROPERTIES ('owner.team')")
    assert(!SnapshotTable(spark, s"$warehouse/alt/t", "id")
      .properties.contains("owner.team"))
  }

  test("CALL repartition_to / migrate_spec: the full partition-spec " +
      "evolution loop in pure SQL") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.evo")
    sql("""CREATE TABLE graft.evo.t (id BIGINT, v STRING, p1 STRING,
           p2 STRING) USING graft PARTITIONED BY (p1)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("""INSERT INTO graft.evo.t VALUES
           (1, 'a', 'x', 'm'), (2, 'b', 'y', 'n')""")
    sql("CALL graft.system.repartition_to('evo.t', 'p2')")
    // new writes land under the NEW layout; the snapshot now mixes
    sql("INSERT INTO graft.evo.t VALUES (3, 'c', 'x', 'm')")
    // the single-spec SQL scan refuses the mixed snapshot with the
    // CALLable remedy...
    val e = intercept[Exception](
      sql("SELECT * FROM graft.evo.t").collect())
    assert(e.getMessage.contains("migrateSpec"), e.getMessage)
    // ...and the remedy is one CALL away
    val status = sql("CALL graft.system.migrate_spec('evo.t')").collect()
    assert(status.head.getLong(2) > 0, "no live files after migration")
    val rows = sql("SELECT id, v, p1, p2 FROM graft.evo.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq((1L, "a", "x", "m"), (2L, "b", "y", "n"),
      (3L, "c", "x", "m")))
    // DE-partition through the same CALL (empty spec = evolve to
    // unpartitioned, logged as the explicit flat marker). The next
    // INSERT's merge scope is the whole table, so it also completes
    // the flat rewrite — SQL serves without an explicit migrate.
    sql("CALL graft.system.repartition_to('evo.t', '')")
    sql("INSERT INTO graft.evo.t VALUES (4, 'd', 'z', 'o')")
    val flat = sql("SELECT id, p2 FROM graft.evo.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(flat.toSeq == Seq((1L, "m"), (2L, "n"), (3L, "m"), (4L, "o")))
    // and the table stays explicitly flat for fresh handles
    assert(sql("SELECT * FROM graft.evo.t").schema.fieldNames.length == 4)
    sql("CALL graft.system.migrate_spec('evo.t')") // no-op on uniform flat
    assert(sql("SELECT count(*) FROM graft.evo.t").head().getLong(0) == 4L)
  }

  test("ALTER TABLE ALTER COLUMN TYPE widens metadata-only; narrowing rejects") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.widen")
    sql("""CREATE TABLE graft.widen.t (id BIGINT, q INT, p FLOAT)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.widen.t VALUES (1, 10, 0.5), (2, 20, 1.5)")
    sql("ALTER TABLE graft.widen.t ALTER COLUMN q TYPE BIGINT")
    sql("ALTER TABLE graft.widen.t ALTER COLUMN p TYPE DOUBLE")
    val sch = sql("SELECT * FROM graft.widen.t").schema
    assert(sch("q").dataType == org.apache.spark.sql.types.LongType)
    assert(sch("p").dataType == org.apache.spark.sql.types.DoubleType)
    // old int/float bytes and a beyond-int insert unify
    sql(s"INSERT INTO graft.widen.t VALUES (3, ${1L << 40}, 2.5)")
    val rows = sql("SELECT id, q FROM graft.widen.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 1L << 40)))
    // narrowing dies in Spark's own analyzer (canUpCast check) ...
    val e = intercept[Exception](
      sql("ALTER TABLE graft.widen.t ALTER COLUMN q TYPE INT"))
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"),
      e.getMessage)
    // ... but the analyzer ALLOWS lossless non-widening upcasts like
    // long->string, which would reinterpret committed bytes — the
    // catalog's own guard must refuse those
    val e2 = intercept[Exception](
      sql("ALTER TABLE graft.widen.t ALTER COLUMN q TYPE STRING"))
    assert(e2.getMessage.contains("widening"), e2.getMessage)
    assert(sql("SELECT count(*) FROM graft.widen.t").head().getLong(0) == 3)
    // the wider lattice: decimal precision/scale growth, date→ntz,
    // int→decimal — committed narrow bytes serve the wide schema
    sql("""CREATE TABLE graft.widen.t2
           (id BIGINT, price DECIMAL(10,2), d DATE, q INT)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("""INSERT INTO graft.widen.t2 VALUES
           (1, 12.34, DATE'2021-03-04', 7), (2, 56.78, DATE'2021-03-05', 8)""")
    sql("ALTER TABLE graft.widen.t2 ALTER COLUMN price TYPE DECIMAL(16,4)")
    sql("ALTER TABLE graft.widen.t2 ALTER COLUMN d TYPE TIMESTAMP_NTZ")
    sql("ALTER TABLE graft.widen.t2 ALTER COLUMN q TYPE DECIMAL(12,1)")
    val r = sql("""SELECT CAST(price AS STRING), CAST(d AS STRING),
                   CAST(q AS STRING) FROM graft.widen.t2 WHERE id = 1""")
      .head()
    assert(r == org.apache.spark.sql.Row("12.3400", "2021-03-04 00:00:00",
      "7.0"), r.toString)
    val e3 = intercept[Exception](
      sql("ALTER TABLE graft.widen.t2 ALTER COLUMN price TYPE DECIMAL(12,4)"))
    assert(e3.getMessage.contains("widening") ||
      e3.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), e3.getMessage)
    // row-level DML rewrites NARROW-vintage files under the WIDE
    // schema: the decimal predicate hits scale-2 bytes, the update
    // writes scale-4 files, and both vintages keep unifying
    sql("UPDATE graft.widen.t2 SET q = 9.5 WHERE id = 1")
    sql("DELETE FROM graft.widen.t2 WHERE price = 56.78")
    val after = sql(
      """SELECT id, CAST(price AS STRING), CAST(q AS STRING)
         FROM graft.widen.t2 ORDER BY id""").collect().toSeq
    assert(after == Seq(org.apache.spark.sql.Row(1L, "12.3400", "9.5")),
      after.toString)
  }

  test("DEFAULT columns through SQL: pre-add rows read the default, " +
      "INSERT resolves CURRENT_DEFAULT, CREATE TABLE accepts DEFAULT") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.defs")
    sql("""CREATE TABLE graft.defs.t (id BIGINT, v STRING)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.defs.t VALUES (1, 'a'), (2, 'b')")
    sql("ALTER TABLE graft.defs.t ADD COLUMN q INT DEFAULT 7")
    sql("ALTER TABLE graft.defs.t ADD COLUMN fee DECIMAL(8,2) DEFAULT 1.50")
    // committed (pre-add) rows read the frozen defaults — no rewrite
    assert(sql("SELECT q, CAST(fee AS STRING) FROM graft.defs.t WHERE id = 1")
      .head() == org.apache.spark.sql.Row(7, "1.50"))
    // INSERT omitting the columns resolves CURRENT_DEFAULT; the DEFAULT
    // keyword resolves positionally
    sql("INSERT INTO graft.defs.t (id, v) VALUES (3, 'c')")
    sql("INSERT INTO graft.defs.t VALUES (4, 'd', DEFAULT, 9.99)")
    val rows = sql(
      """SELECT id, q, CAST(fee AS STRING) FROM graft.defs.t ORDER BY id""")
      .collect().toSeq
    assert(rows == Seq(
      org.apache.spark.sql.Row(1L, 7, "1.50"),
      org.apache.spark.sql.Row(2L, 7, "1.50"),
      org.apache.spark.sql.Row(3L, 7, "1.50"),
      org.apache.spark.sql.Row(4L, 7, "9.99")), rows.toString)
    // CREATE TABLE with DEFAULT in the DDL lands the same metadata
    sql("""CREATE TABLE graft.defs.t2 (id BIGINT, tag STRING DEFAULT 'x')
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.defs.t2 (id) VALUES (1)")
    assert(sql("SELECT tag FROM graft.defs.t2").head().getString(0) == "x")
    // SET DEFAULT moves only the CURRENT default: future inserts get
    // the new value, rows predating the column keep reading the FROZEN
    // initial default
    sql("ALTER TABLE graft.defs.t ALTER COLUMN q SET DEFAULT 11")
    sql("INSERT INTO graft.defs.t (id, v) VALUES (5, 'e')")
    assert(sql("SELECT q FROM graft.defs.t WHERE id = 1").head().getInt(0)
      == 7, "SET DEFAULT must not rewrite pre-add rows")
    assert(sql("SELECT q FROM graft.defs.t WHERE id = 5").head().getInt(0)
      == 11)
    // DROP DEFAULT: later inserts omitting the column get null; frozen
    // history still intact
    sql("ALTER TABLE graft.defs.t ALTER COLUMN q DROP DEFAULT")
    sql("INSERT INTO graft.defs.t (id, v) VALUES (6, 'f')")
    assert(sql("SELECT q FROM graft.defs.t WHERE id = 6").head().isNullAt(0))
    assert(sql("SELECT q FROM graft.defs.t WHERE id = 1").head().getInt(0)
      == 7)
    // SET DEFAULT on a column that never had one: pre-existing rows
    // were committed under null semantics and MUST stay null
    sql("ALTER TABLE graft.defs.t2 ADD COLUMN n INT")
    sql("ALTER TABLE graft.defs.t2 ALTER COLUMN n SET DEFAULT 3")
    assert(sql("SELECT n FROM graft.defs.t2 WHERE id = 1").head().isNullAt(0),
      "SET DEFAULT invented history for a defaultless column")
    sql("INSERT INTO graft.defs.t2 (id) VALUES (2)")
    assert(sql("SELECT n, tag FROM graft.defs.t2 WHERE id = 2").head() ==
      org.apache.spark.sql.Row(3, "x"))
    // NOT NULL adds stay rejected even with a DEFAULT: the manifest
    // deliberately relaxes nullability at commit, so the constraint
    // could not be retained — refusing beats silently dropping it
    val e4 = intercept[Exception](
      sql("ALTER TABLE graft.defs.t2 ADD COLUMN req INT NOT NULL DEFAULT 5"))
    assert(e4.getMessage.contains("nullable"), e4.getMessage)
  }

  test("mixed multi-change ALTER is pre-validated whole: a later invalid " +
      "change leaves earlier changes uncommitted") {
    warehouse
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
    sql("CREATE NAMESPACE IF NOT EXISTS graft.mixedalter")
    sql("""CREATE TABLE graft.mixedalter.t (id BIGINT, q INT, p FLOAT)
           TBLPROPERTIES ('primaryKey' = 'id',
                          'graft.columnMapping' = 'id')""")
    sql("INSERT INTO graft.mixedalter.t VALUES (1, 10, 0.5)")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array("mixedalter"), "t")
    // rename (valid alone) + a byte-reinterpreting widen (invalid):
    // the statement must fail WHOLE — per-change commits would leave
    // the rename in and only then hit the widen validation
    val e = intercept[Exception](cat.alterTable(ident,
      TableChange.renameColumn(Array("q"), "q2"),
      TableChange.updateColumnType(Array("p"),
        org.apache.spark.sql.types.StringType)))
    assert(e.getMessage.contains("widening"), e.getMessage)
    val sch = sql("SELECT * FROM graft.mixedalter.t").schema
    assert(sch.fieldNames.contains("q") && !sch.fieldNames.contains("q2"),
      s"failed mixed ALTER committed its earlier rename: $sch")
    // a VALID mixed sequence applies — including an op that references
    // the name a PRIOR op in the same statement introduced (the
    // dry-run must validate against the evolving schema)
    cat.alterTable(ident,
      TableChange.renameColumn(Array("q"), "q2"),
      TableChange.updateColumnType(Array("q2"),
        org.apache.spark.sql.types.LongType),
      TableChange.updateColumnType(Array("p"),
        org.apache.spark.sql.types.DoubleType))
    val sch2 = sql("SELECT * FROM graft.mixedalter.t").schema
    assert(sch2("q2").dataType == org.apache.spark.sql.types.LongType)
    assert(sch2("p").dataType == org.apache.spark.sql.types.DoubleType)
    assert(sql("SELECT q2 FROM graft.mixedalter.t").head().getLong(0) == 10L)
    // rename + a BROKEN default in one statement: same whole-statement
    // stance — the rename must not land when the default fails
    val e2 = intercept[Exception](cat.alterTable(ident,
      TableChange.renameColumn(Array("q2"), "q3"),
      TableChange.updateColumnDefaultValue(Array("q3"), "id + 1")))
    val sch3 = sql("SELECT * FROM graft.mixedalter.t").schema
    assert(sch3.fieldNames.contains("q2") && !sch3.fieldNames.contains("q3"),
      s"failed mixed ALTER committed its earlier rename: $sch3 ($e2)")
  }

  test("ALTER TABLE RENAME/DROP COLUMN on an id-mapped table; time travel spans the evolution") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.map")
    sql("""CREATE TABLE graft.map.t (id BIGINT, v STRING, score DOUBLE)
           TBLPROPERTIES ('primaryKey' = 'id',
                          'graft.columnMapping' = 'id')""")
    sql("INSERT INTO graft.map.t VALUES (1, 'a', 0.5), (2, 'b', 0.9)")
    sql("ALTER TABLE graft.map.t RENAME COLUMN v TO label")
    // old files (written as 'v') resolve by field id under the new name
    val renamed = sql("SELECT id, label FROM graft.map.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(renamed.toSeq == Seq((1L, "a"), (2L, "b")))
    // inserts after the rename land under the new name; vintages unify
    sql("INSERT INTO graft.map.t VALUES (3, 'c', 0.1)")
    assert(sql("SELECT count(*) FROM graft.map.t WHERE label IS NOT NULL")
      .head().getLong(0) == 3)
    sql("ALTER TABLE graft.map.t DROP COLUMN score")
    assert(sql("SELECT * FROM graft.map.t").columns.toSeq
      == Seq("id", "label"))
    // re-ADD the dropped name: fresh field id — the dropped column's
    // bytes must NOT resurface as the new column's values
    sql("ALTER TABLE graft.map.t ADD COLUMNS (score DOUBLE)")
    assert(sql("SELECT count(*) FROM graft.map.t WHERE score IS NOT NULL")
      .head().getLong(0) == 0,
      "dropped column's bytes resurfaced after re-add")
    // time travel crosses the whole evolution: v2 (pre-rename) still
    // serves the ORIGINAL shape
    val v2 = sql("SELECT * FROM graft.map.t VERSION AS OF 2")
    assert(v2.columns.toSeq == Seq("id", "v", "score"))
    assert(v2.count() == 2)
    // unmapped tables reject rename with the remedy in the message
    sql("""CREATE TABLE graft.map.plain (id BIGINT, v STRING)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    val e = intercept[Exception](
      sql("ALTER TABLE graft.map.plain RENAME COLUMN v TO w"))
    assert(e.getMessage.contains("not column-id mapped"), e.getMessage)
  }

  test("DDL guard rails: bad primaryKey, NOT NULL / positioned adds, missing version") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.guard")
    // a primaryKey typo fails at CREATE, not at the first INSERT
    val pkErr = intercept[Exception] {
      sql("""CREATE TABLE graft.guard.bad_pk (id BIGINT, v STRING)
             TBLPROPERTIES ('primaryKey' = 'idd')""")
    }
    assert(pkErr.getMessage.contains("primaryKey 'idd'"))
    sql("""CREATE TABLE graft.guard.t (id BIGINT, v STRING)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.guard.t VALUES (1, 'one')")
    // ADD COLUMNS rejects what the table cannot honor instead of
    // silently rewriting the DDL
    val nnErr = intercept[Exception] {
      sql("ALTER TABLE graft.guard.t ADD COLUMNS (x INT NOT NULL)")
    }
    assert(nnErr.getMessage.contains("must be nullable"))
    val posErr = intercept[Exception] {
      sql("ALTER TABLE graft.guard.t ADD COLUMNS (y INT AFTER id)")
    }
    assert(posErr.getMessage.contains("FIRST/AFTER"))
    // VERSION AS OF a version that never existed: a clean resolution
    // error naming the fact, not a scan-time FileNotFoundException
    val vErr = intercept[Exception] {
      sql("SELECT * FROM graft.guard.t VERSION AS OF 99").collect()
    }
    assert(vErr.getMessage.contains("no retained snapshot v99"))
  }

  test("CTAS, SHOW TABLES, RENAME, DROP") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
    sql("""CREATE TABLE graft.ddl.src AS
           SELECT id, id * 2 AS dbl FROM range(5)""")
    assert(sql("SELECT sum(dbl) FROM graft.ddl.src").head().getLong(0) == 20)
    val shown = sql("SHOW TABLES IN graft.ddl").collect()
      .map(_.getString(1)).toSet
    assert(shown.contains("src"))
    sql("ALTER TABLE graft.ddl.src RENAME TO ddl.dst")
    assert(sql("SELECT count(*) FROM graft.ddl.dst").head().getLong(0) == 5)
    sql("DROP TABLE graft.ddl.dst")
    assert(sql("SHOW TABLES IN graft.ddl").collect().isEmpty)
  }

  test("CALL graft.system.{history, restore, compact, vacuum}") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    sql("""CREATE TABLE graft.maint.t (id BIGINT, v STRING)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.maint.t VALUES (1, 'a')") // v2
    sql("INSERT INTO graft.maint.t VALUES (2, 'b')") // v3
    val hist = sql("CALL graft.system.history(table => 'maint.t')").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L))
    // restore to v2: only id=1 remains, history extends to v4
    val restored = sql(
      "CALL graft.system.restore(table => 'maint.t', version => 2)").head()
    assert(restored.getLong(1) == 4L)
    assert(sql("SELECT id FROM graft.maint.t").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // put the second row back (a fresh insert), compact the small files
    sql("INSERT INTO graft.maint.t VALUES (2, 'b')")
    val compacted = sql(
      "CALL graft.system.compact(table => 'maint.t', " +
        "target_file_bytes => 134217728, min_files => 2)").head()
    assert(compacted.getLong(2) == 1L, "two tiny files should bin-pack to 1")
    // dry_run FIRST: lists reclaimable files, touches nothing
    val dry = sql("CALL graft.system.vacuum(table => 'maint.t', " +
      "keep_versions => 1, retention_ms => 0, dry_run => true)").collect()
    assert(dry.nonEmpty && dry.forall(r =>
      r.getString(0).endsWith(".parquet")), dry.mkString("; "))
    assert(sql("SELECT count(*) FROM graft.maint.t").head().getLong(0) == 2)
    sql("CALL graft.system.vacuum(table => 'maint.t', " +
      "keep_versions => 1, retention_ms => 0)")
    // the table still reads fine after reclamation, and a second dry
    // run has nothing left to list
    assert(sql("SELECT count(*) FROM graft.maint.t").head().getLong(0) == 2)
    assert(sql("CALL graft.system.vacuum(table => 'maint.t', " +
      "keep_versions => 1, retention_ms => 0, dry_run => true)")
      .collect().isEmpty)
  }

  test("writeStream.toTable streams into a catalog table through the native sink") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.live")
    sql("""CREATE TABLE graft.live.events (id BIGINT, v STRING)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    val srcRoot = Files.createTempDirectory("graft_totable").toString
    val src = SnapshotTable(spark, s"$srcRoot/src", "id")
    src.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    src.append(Seq((3L, "c")).toDF("id", "v"))

    val q = spark.readStream.format("graft").load(s"$srcRoot/src")
      .writeStream
      .option("checkpointLocation", s"$srcRoot/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("graft.live.events")
    q.awaitTermination(120000)

    assert(sql("SELECT id, v FROM graft.live.events ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the sink's epoch high-water mark is logged table metadata
    val t = SnapshotTable(spark, s"$warehouse/live/events", "id")
    assert(t.properties.keys.exists(_.startsWith("stream.epoch.")))
  }

  test("readStream.table tails a catalog table; DESCRIBE EXTENDED shows logged properties") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.tail")
    sql("""CREATE TABLE graft.tail.t (id BIGINT, v STRING)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.tail.t VALUES (1, 'a'), (2, 'b')")

    val root = Files.createTempDirectory("graft_tailout").toString
    val q = spark.readStream.table("graft.tail.t")
      .writeStream.format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.read.parquet(s"$root/out").count() == 2)

    // the logged primaryKey property is visible through the V2 table
    val desc = sql("DESCRIBE TABLE EXTENDED graft.tail.t").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.get("Table Properties").exists(_.contains("primaryKey=id")),
      s"properties not surfaced: $desc")
  }

  test("CREATE TABLE declares a clustered layout; SQL-defined MV refreshes via CALL") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.mvns")
    sql("""CREATE TABLE graft.mvns.src
           (id BIGINT, grp STRING, amount BIGINT)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.mvns.src VALUES " +
      "(1, 'a', 10), (2, 'a', 20), (3, 'b', 5)")
    // the view: schema + clustered layout + full definition, pure SQL
    sql(s"""CREATE TABLE graft.mvns.daily
           (`__mv_key` STRING, grp STRING, total BIGINT, `__mv_count` BIGINT)
           TBLPROPERTIES (
             'primaryKey' = '__mv_key',
             'clusterBy' = '__mv_key', 'clusterFiles' = '4',
             'graft.mv.source' = '$warehouse/mvns/src',
             'graft.mv.mode' = 'additive',
             'graft.mv.keys' = 'grp',
             'graft.mv.measure.total' = 'CAST(amount AS BIGINT)')""")
    // first refresh folds the source from scratch into the empty view
    val st1 = sql("CALL graft.system.refresh_mv('mvns.daily')").head()
    assert(st1.getLong(2) >= 1L)
    sql("REFRESH TABLE graft.mvns.daily")
    def state() = sql(
      "SELECT grp, total, `__mv_count` FROM graft.mvns.daily ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(state() == Seq(("a", 30L, 2L), ("b", 5L, 1L)))
    // the CREATEd layout actually clusters: the view's files carry
    // key stats (the stats-scoped merge's precondition)
    val vt = SnapshotTable(spark, s"$warehouse/mvns/daily",
      graft.plans.MaterializedAgg.KeyCol)
    assert(vt.candidateFiles().forall(
      _.stats.contains(graft.plans.MaterializedAgg.KeyCol)),
      "clusterBy TBLPROPERTY did not produce key stats")
    // mutate and catch up, still pure SQL; the emptied group leaves
    sql("DELETE FROM graft.mvns.src WHERE grp = 'b'")
    sql("INSERT INTO graft.mvns.src VALUES (4, 'a', 1)")
    sql("CALL graft.system.refresh_mv('mvns.daily')")
    sql("REFRESH TABLE graft.mvns.daily")
    assert(state() == Seq(("a", 31L, 3L)))
    // a clusterBy column missing from the schema fails at CREATE
    val e = intercept[Exception] {
      sql("""CREATE TABLE graft.mvns.bad (id BIGINT)
             TBLPROPERTIES ('clusterBy' = 'nope')""")
    }
    assert(e.getMessage.contains("clusterBy column"))
  }

  test("malformed materialized-view declarations fail at CREATE/ALTER, " +
      "not at first refresh") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.mvv")
    sql("""CREATE TABLE graft.mvv.fact (id BIGINT, fk BIGINT, amt BIGINT)
           TBLPROPERTIES ('primaryKey' = 'id')""")
    sql("INSERT INTO graft.mvv.fact VALUES (1, 1, 10)")
    sql("""CREATE TABLE graft.mvv.dim (fk BIGINT, name STRING)
           TBLPROPERTIES ('primaryKey' = 'fk')""")
    sql("INSERT INTO graft.mvv.dim VALUES (1, 'x')")
    def declare(extra: String): Unit =
      sql(s"""CREATE TABLE graft.mvv.v (`__mv_key` STRING, name STRING,
             |  total BIGINT, `__mv_count` BIGINT)
             |TBLPROPERTIES (
             |  'primaryKey' = '__mv_key',
             |  'graft.mv.source' = '$warehouse/mvv/fact',
             |  'graft.mv.keys' = 'name',
             |  'graft.mv.measure.total' = 'CAST(amt AS BIGINT)'
             |  $extra)""".stripMargin)
    def failing(extra: String, want: String): Unit = {
      val e = intercept[Exception](declare(extra))
      assert(e.getMessage.contains(want),
        s"for TBLPROPERTIES [$extra]: ${e.getMessage}")
      sql("DROP TABLE IF EXISTS graft.mvv.v")
    }
    // mistyped mode
    failing(", 'graft.mv.mode' = 'aditive'", "unknown graft.mv.mode")
    // join mode with NO dim list at all
    failing(", 'graft.mv.mode' = 'recomputeJoin'", "graft.mv.dimCount")
    // dim list missing one required key
    failing(""", 'graft.mv.mode' = 'additiveJoin',
      'graft.mv.dimCount' = '1',
      'graft.mv.dim.0.path' = '""" + warehouse + """/mvv/dim',
      'graft.mv.dim.0.factKey' = 'fk'""",
      "missing 'graft.mv.dim.0.dimKey'")
    // a dim index past dimCount: the refresh would silently never
    // join it — reject the typo at declaration
    failing(""", 'graft.mv.mode' = 'additiveJoin',
      'graft.mv.dimCount' = '1',
      'graft.mv.dim.0.path' = '""" + warehouse + """/mvv/dim',
      'graft.mv.dim.0.factKey' = 'fk',
      'graft.mv.dim.0.dimKey' = 'fk',
      'graft.mv.dim.1.path' = '/nowhere'""",
      "outside graft.mv.dimCount=1")
    // a dim path that is not a table
    failing(""", 'graft.mv.mode' = 'additiveJoin',
      'graft.mv.dimCount' = '1',
      'graft.mv.dim.0.path' = '/nowhere',
      'graft.mv.dim.0.factKey' = 'fk',
      'graft.mv.dim.0.dimKey' = 'fk'""",
      "not a committed graft table")
    // an unparseable measure
    failing(""", 'graft.mv.mode' = 'additive',
      'graft.mv.measure.bad' = 'CAST(amt AS'""", "does not parse")
    // dims declared on a non-join mode
    failing(""", 'graft.mv.mode' = 'additive',
      'graft.mv.dimCount' = '1',
      'graft.mv.dim.0.path' = '""" + warehouse + """/mvv/dim',
      'graft.mv.dim.0.factKey' = 'fk',
      'graft.mv.dim.0.dimKey' = 'fk'""", "takes no dimensions")
    // the WELL-FORMED declaration passes CREATE and refreshes
    declare(""", 'graft.mv.mode' = 'additiveJoin',
      'graft.mv.dimCount' = '1',
      'graft.mv.dim.0.path' = '""" + warehouse + """/mvv/dim',
      'graft.mv.dim.0.factKey' = 'fk',
      'graft.mv.dim.0.dimKey' = 'fk'""")
    sql("CALL graft.system.refresh_mv('mvv.v')")
    assert(sql("SELECT name, total FROM graft.mvv.v").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("x", 10L)))
    // ALTER validates the MERGED state: breaking one key fails loudly
    val e = intercept[Exception](
      sql("ALTER TABLE graft.mvv.v SET TBLPROPERTIES " +
        "('graft.mv.mode' = 'bogus')"))
    assert(e.getMessage.contains("unknown graft.mv.mode"), e.getMessage)
  }

  test("CALL graft.system.zorder: rewrite makes box predicates prune on both columns") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graft.zm")
    sql("""CREATE TABLE graft.zm.pts (x BIGINT, y BIGINT)
           TBLPROPERTIES ('primaryKey' = 'x')""")
    // a 64×64 grid scattered in insertion order: without clustering,
    // every file spans the whole value space and nothing prunes
    sql("""INSERT INTO graft.zm.pts
           SELECT (id * 37) % 64 AS x, (id * 53) % 64 AS y
           FROM range(4096)""")
    val before = sql("SELECT sum(x + y) FROM graft.zm.pts").head().getLong(0)

    sql("CALL graft.system.zorder(table => 'zm.pts', cols => 'x,y', " +
      "num_files => 16)")

    // contents untouched by the rewrite
    assert(sql("SELECT sum(x + y) FROM graft.zm.pts").head().getLong(0)
      == before)
    val t = SnapshotTable(spark, s"$warehouse/zm/pts", "x")
    val box = Seq(("x", 0L, 15L), ("y", 0L, 15L))
    val total = t.candidateFiles().size
    val hit = t.candidateFiles(box: _*).size
    assert(total >= 8, s"expected a multi-file rewrite, got $total")
    assert(hit < total / 2,
      s"curve clustering should prune most files: $hit of $total in box")
    // the box read returns exactly the grid points inside the box
    assert(t.readWhere(box: _*).count() ==
      sql("SELECT count(*) FROM graft.zm.pts WHERE x BETWEEN 0 AND 15 " +
        "AND y BETWEEN 0 AND 15").head().getLong(0))
  }
}
