package graft.table

import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.FunctionCatalog
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.file.{Files, Paths}

/** Catalog plugin mapping a base directory of lake tables into Spark's
  * catalog namespace — the piece that turns the engine's tables into
  * first-class SQL citizens AND unlocks STORAGE-PARTITIONED JOINS:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.lake.base", "/data/tables")
  *   spark.sql("SELECT * FROM lake.events VERSION AS OF 3")
  *   spark.table("lake.events").join(spark.table("lake.labels"),
  *     Seq("conv_id", "turn_idx"))   // ZERO-shuffle SPJ when layouts match
  * }}}
  *
  * Why a catalog and not just `format("lake")`: Spark resolves a reported
  * `KeyGroupedPartitioning` whose key is a `bucket(...)` transform through
  * the FUNCTION CATALOG of the table's catalog — a path-based (TableProvider)
  * relation has none, so its reported partitioning is silently dropped and
  * every table⋈table join shuffles BOTH sides. Tables loaded through this
  * catalog resolve `bucket` to [[LakeBucketFunction]]; two scans whose
  * transforms agree (same function canonical name, same numBuckets, same key
  * columns) are co-partitioned BY CONSTRUCTION, and Spark plans the join
  * with no exchange on either side — at 10^10×10^10 rows the difference
  * between a cluster-wide double shuffle and a metadata decision.
  *
  * Identifier → path: `lake.ns1.tbl` → `<base>/ns1/tbl`. Tables are CREATED
  * by the engine's writers (MergeApplier against a `LakeTable(root)`), not
  * via SQL DDL — createTable/alterTable fail loudly; dropTable/renameTable
  * are metadata-destructive and deliberately unsupported too.
  */
final class LakeCatalog extends TableCatalog with FunctionCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {
  private var catalogName: String = _
  private var base: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    base = options.get("base")
    require(base != null && base.nonEmpty,
      s"catalog '$name' requires option spark.sql.catalog.$name.base = tables root dir")
  }
  override def name(): String = catalogName

  private def rootFor(ident: Identifier): String =
    (base +: (ident.namespace() :+ ident.name())).mkString("/")

  private def isLakeTable(root: String): Boolean =
    LakeTable.open(root).currentSnapshot().nonEmpty

  override def loadTable(ident: Identifier): Table = {
    // Iceberg-style metadata tables: `SELECT … FROM cat.`tbl$history``
    def metaRoot(suffix: String): String = {
      val r = rootFor(Identifier.of(ident.namespace(), ident.name().stripSuffix(suffix)))
      if (!isLakeTable(r)) throw new NoSuchTableException(ident)
      r
    }
    if (ident.name().endsWith("$history"))
      return new LakeMetaTable(metaRoot("$history"), "history",
        t => t.history(org.apache.spark.sql.SparkSession.active))
    if (ident.name().endsWith("$files"))
      return new LakeMetaTable(metaRoot("$files"), "files", { t =>
        val spark = org.apache.spark.sql.SparkSession.active
        import spark.implicits._
        val s = t.currentSnapshot().get
        t.resolveFiles(s).toSeq
          .flatMap { case (b, fs) =>
            fs.map(f => (b, f.path, f.bytes, s.bucketRows.getOrElse(b, 0L))) }
          .sortBy(r => (r._1, r._2))
          .toDF("bucket", "path", "bytes", "bucket_rows")
      })
    val root = rootFor(ident)
    // one snapshot resolution for existence probe + pinned snap + handle —
    // loadTable runs once per table REFERENCE during analysis, so tripling
    // the meta-directory probes multiplies real I/O on remote storage
    val t = LakeTable.open(root)
    val snap = t.currentSnapshot().getOrElse(throw new NoSuchTableException(ident))
    new LakeSourceTable(root, CaseInsensitiveStringMap.empty(), Some((t, snap)))
  }

  /** SQL time travel: `VERSION AS OF v`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootFor(ident)
    if (!isLakeTable(root)) throw new NoSuchTableException(ident)
    new LakeSourceTable(root,
      new CaseInsensitiveStringMap(java.util.Map.of("asOfVersion", version)))
  }

  /** SQL time travel: `TIMESTAMP AS OF t` (Spark hands MICROseconds).
    * Resolves to the max commit-stamped retained version at-or-before `t`
    * (Iceberg's contract), then reads it through the same `asOfVersion`
    * path as version travel — one resolution rule, two SQL spellings.
    * Pre-stamp snapshots (no `commitMs`) and vacuumed versions are not
    * time-resolvable; asking before the earliest stamp fails loudly.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootFor(ident)
    val t = LakeTable.open(root)
    if (t.currentSnapshot().isEmpty) throw new NoSuchTableException(ident)
    val askMs = timestamp / 1000L
    val v = t.versions().sorted.reverse.iterator
      .flatMap(t.snapshotAt(_)) // a concurrent vacuum may expire a listed version
      .find(_.metrics.get("commitMs").exists(_ <= askMs))
      .map(_.version)
      .getOrElse(throw new IllegalArgumentException(
        s"no retained snapshot of lake table at $root committed at or before " +
          s"${java.time.Instant.ofEpochMilli(askMs)} (earliest retained stamp wins only " +
          "at-or-after it; vacuumed or pre-stamp versions are not time-resolvable)"))
    new LakeSourceTable(root,
      new CaseInsensitiveStringMap(java.util.Map.of("asOfVersion", v.toString)))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = Paths.get((base +: namespace).mkString("/"))
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => Files.isDirectory(p) && isLakeTable(p.toString))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
    } finally s.close()
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "lake tables are created by the engine's writers (MergeApplier), not DDL")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE is not supported on lake tables")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("DROP TABLE is not supported on lake tables")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported on lake tables")

  // The layout's bucket function (resolved by Spark for storage-partitioned
  // joins) plus the curation scalars (token/quality/langid/fingerprint/PII)
  // — the SQL face of graft.functions.Text. Namespace is not significant
  // for functions (Iceberg's convention: resolvable at the catalog root and
  // under `system` alike).
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    ("bucket" +: LakeTextFunctions.Names).map(Identifier.of(namespace, _)).toArray
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name() == "bucket") LakeBucketFunction
    else LakeTextFunctions(ident.name())
      .getOrElse(throw new NoSuchFunctionException(ident))

  // ---- maintenance procedures: `CALL cat.system.compact('tbl')` etc. ----
  // The table argument resolves relative to the catalog base ("tbl" or
  // "ns.tbl"), through the same path mapping as table identifiers.
  private def resolveTableArg(arg: String): String =
    (base +: arg.split('.').toSeq).mkString("/")

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    LakeProcedures.Names.map(n => Identifier.of(Array("system"), n)).toArray

  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"lake procedures live under the 'system' namespace, got ${ident.namespace().mkString(".")}")
    LakeProcedures(ident.name(), resolveTableArg)
  }
}

/** Metadata tables (`tbl$history` — the commit log with lineage and the
  * per-writer ledger; `tbl$files` — the current snapshot's per-bucket file
  * inventory) as queryable relations: DESCRIBE HISTORY / ops dashboards via
  * plain SQL. Rows come from O(metadata) driver-side reads, served through
  * [[org.apache.spark.sql.connector.read.LocalScan]] — no executor work for
  * a metadata read.
  */
private final class LakeMetaTable(root: String, kind: String,
    df: LakeTable => org.apache.spark.sql.DataFrame)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}

  private def metaDf = df(LakeTable.open(root))

  override def name(): String = s"lake(`$root`$$$kind)"
  // Spark calls schema() repeatedly during analysis; rebuilding the full
  // metadata frame (for $history: one JSON read per retained snapshot) on
  // every call multiplies metadata I/O by the resolution count. The schema
  // is fixed per kind, so one build per table load suffices — the scan
  // still pins FRESH rows at build time.
  private lazy val tableSchema: StructType = metaDf.schema
  override def schema(): StructType = tableSchema
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        private val pinned = metaDf // metadata pinned at scan build
        override val readSchema: StructType = pinned.schema
        override val rows: Array[org.apache.spark.sql.catalyst.InternalRow] = {
          val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToCatalystConverter(pinned.schema)
          pinned.collect().map(conv(_).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
        }
        override def description(): String = s"LakeMeta(`$root`, $kind)"
      }
    }
}

/** The table layout's bucket function as a catalog V2 function — the
  * resolvable meaning of the `bucket(numBuckets, conv_id, turn_idx)`
  * transform every lake scan reports. MUST agree bit-for-bit with
  * `LakeTable.bucketFor` / `bucketCol` (murmur3 seed 42 over (conv_id,
  * turn_idx), positive pmod): Spark may evaluate it to align partially
  * clustered distributions, and a drifted result would silently mis-join.
  */
object LakeBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, conv_id, turn_idx): murmur3(seed 42) pmod numBuckets"

  override def bind(inputType: StructType): BoundFunction = {
    val types = inputType.fields.map(_.dataType)
    require(types.length == 3 &&
      types(0) == IntegerType && types(1) == StringType && types(2) == IntegerType,
      s"bucket expects (int numBuckets, string conv_id, int turn_idx), got " +
        types.mkString("(", ", ", ")"))
    BucketConvTurn
  }
}

object BucketConvTurn extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.lake.bucket(conv_id,turn_idx)"
  override def inputTypes(): Array[DataType] = Array(IntegerType, StringType, IntegerType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false

  override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): Integer =
    invoke(input.getInt(0), input.getUTF8String(1), input.getInt(2))

  /** Codegen fast path (ScalarFunction magic method). Identical fold to
    * catalyst's Murmur3Hash(Seq(conv, turn), 42) via the same primitive
    * hasher it delegates to: the string hashes with seed 42, the int hashes
    * with that result as its seed.
    */
  def invoke(n: Int, conv: UTF8String, turn: Int): Int = {
    val h1 = Murmur3_x86_32.hashUnsafeBytes(
      conv.getBaseObject, conv.getBaseOffset, conv.numBytes(), 42)
    val h = Murmur3_x86_32.hashInt(turn, h1)
    ((h % n) + n) % n
  }
}
