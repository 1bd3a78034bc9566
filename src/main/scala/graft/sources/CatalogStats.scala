package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Catalog-statistics integration (VERDICT r4 item 5): the `ANALYZE TABLE`
 * path that feeds real row counts into every stats-driven planning
 * decision — Spark's own join reorder / broadcast promotion AND the
 * graft similarity rewrite ([[graft.plans.SimilarityJoinRewrite]]), whose
 * auto arm reads `child.stats.rowCount` and falls back to a
 * `sizeInBytes / 280` estimate only when no row count is present.
 *
 * Wiring: a path-based `spark.read.parquet(dir)` carries ONLY
 * `sizeInBytes` (there is nowhere to persist more), so at 100 TB every
 * estimate is a guess scaled from bytes. Registering the directory as an
 * external catalog table and running ANALYZE persists row/column stats
 * in the metastore; with `spark.sql.cbo.enabled` those surface as
 * `Statistics.rowCount`/`attributeStats` on every logical plan over the
 * table — no counting job at query time, which is exactly the contract
 * a 1000-executor cluster needs (stats are computed once per load, read
 * by every query).
 *
 * Staleness follows Spark's own model: stats describe the table as of
 * the last ANALYZE; after appends they under-count until re-analyzed
 * (the auto arm then errs toward the exact plan — re-run [[analyze]]
 * after bulk loads, as on any warehouse).
 */
object CatalogStats {

  /** Conf holding the directory whose ten tables are currently
    * registered + ANALYZEd in the session catalog. When
    * [[graft.Tables.load]] is asked for exactly this directory it
    * resolves through the catalog (`spark.table`), so the persisted
    * rowCounts reach every stats-driven decision — the simjoin/tokjoin
    * auto arms, hyperplane band widths, IVF geometry — with no
    * counting job at query time. Any other directory keeps the plain
    * path read (tests, ad-hoc corpora). */
  val CatalogDirKey = "spark.graft.catalog.dir"

  /** Catalog name for a testdata table (prefixed: the bucketed-join
    * CTAS tables own the bare names' namespace). */
  def tableName(table: String): String = s"graft_$table"

  /** Register + ANALYZE the testdata tables of `dir` that exist on disk
    * and point [[CatalogDirKey]] at it — the measured-path entry (VERDICT
    * r5 item 4): Verify/Bench/StressBench call this at setup so committed
    * artifacts plan on true rowCounts, not leaf-byte estimates. One
    * counting scan per table at LOAD time (the ANALYZE contract);
    * re-registering an already-current dir is a no-op.
    *
    * Only tables whose `$dir/$n.parquet` exists are registered (stress
    * corpora carry 5 of the 10 names, s100 only documents+embeddings);
    * a per-table analyze failure skips that table rather than silently
    * degrading the whole dir to path reads — ADVICE r6 found the
    * all-or-nothing version made every stress-scale ANALYZE a no-op.
    * The registered set is logged so artifacts record what actually
    * planned on catalog stats. */
  def registerAndAnalyze(spark: SparkSession, dir: String): Unit =
    if (!spark.conf.getOption(CatalogDirKey).contains(dir)) {
      graft.Tables.tune(spark)
      enableCbo(spark)
      // Drop ALL names first: a table registered for a previously
      // analyzed dir but absent from this one must not survive and
      // serve the old dir's data through Tables.load's catalog path.
      graft.Tables.names.foreach(n =>
        spark.sql(s"DROP TABLE IF EXISTS ${tableName(n)}"))
      val present = graft.Tables.names.filter(n =>
        new java.io.File(s"$dir/$n.parquet").exists())
      val registered = present.filter { n =>
        try {
          register(spark, tableName(n), s"$dir/$n.parquet")
          analyze(spark, tableName(n))
          true
        } catch { case e: Throwable =>
          spark.sql(s"DROP TABLE IF EXISTS ${tableName(n)}")
          System.err.println(s"[catalog] analyze of $dir/$n.parquet " +
            s"failed (that table stays a path read): $e")
          false
        }
      }
      if (registered.nonEmpty) {
        spark.conf.set(CatalogDirKey, dir)
        System.err.println(s"[catalog] $dir: registered+analyzed " +
          s"${registered.mkString(",")}")
      } else {
        spark.conf.unset(CatalogDirKey)
        System.err.println(s"[catalog] $dir: no tables registered " +
          s"(all reads fall back to path + size estimation)")
      }
    }

  /** Session confs that let persisted catalog stats reach logical-plan
    * `Statistics` (rowCount propagation through Project/Filter/Join). */
  def enableCbo(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
  }

  /** Idempotently register a parquet directory as an external catalog
    * table — the prerequisite for persisting statistics (a path-based
    * read has no metastore entry to hold them). The LOCATION is
    * absolutized first: Spark resolves a relative catalog location
    * against the warehouse dir, not the process cwd, so a relative
    * `stressdata/s1/...` registered an empty location and every stress
    * ANALYZE failed with UNABLE_TO_INFER_SCHEMA (the r6 no-op, take 2 —
    * the driver's absolute `/root/testdata/...` paths masked it).
    *
    * Layout repair (round 8): the 2026-08-13 testdata regeneration also
    * collapsed every table to ONE parquet file with ONE row group — and
    * a row group is the unit of parquet read parallelism, so every leaf
    * scan became a single task and all the per-row work Catalyst fuses
    * into the scan stage (tokenize/minhash/quality in the curate chain)
    * serialized onto one core: a uniform ~1.8× tide across the whole
    * suite, pipeline_curate 25 → 74 s. When the source is a single
    * file, registration therefore CTASes a REPARTITIONED managed copy
    * (byte-sized partition count, capped at defaultParallelism) instead
    * of pointing LOCATION at the pathological layout — the standard
    * warehouse-ingest fix (a production loader targets ~128 MB files at
    * 100 TB; same mechanism, different constant). One-time cost per
    * load, reported inside analyze_sec, never in a per-query window.
    * Multi-file sources (our stress corpora) keep zero-copy external
    * registration. */
  def register(spark: SparkSession, table: String, path: String): Unit = {
    val f = new java.io.File(path).getAbsoluteFile
    if (f.isFile) {
      val p = math.max(1L, math.min(
        spark.sparkContext.defaultParallelism.toLong,
        f.length / (16 * 1024))).toInt
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val warehousePath = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      warehousePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(warehousePath, true)
      spark.read.parquet(f.getPath).repartition(p)
        .write.mode("overwrite").format("parquet").saveAsTable(table)
    } else
      spark.sql(s"CREATE TABLE IF NOT EXISTS $table USING parquet " +
        s"LOCATION '${f.getPath}'")
  }

  /** `ANALYZE TABLE` — table-level row count + per-column NDV/min/max
    * for `columns` (equi-height histograms are a further conf away).
    * One scan at load time; every subsequent query plans on the result. */
  def analyze(spark: SparkSession, table: String,
      columns: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS " +
        s"FOR COLUMNS ${columns.mkString(", ")}")
  }

  /** The row count this frame's logical plan carries, if any — i.e.
    * what stats-driven rules (including the simjoin auto arm) will see.
    * None ⇒ they fall back to size-based estimation. */
  def planRowCount(df: DataFrame): Option[BigInt] =
    df.queryExecution.analyzed.stats.rowCount
}
