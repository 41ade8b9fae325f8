package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.functions.Cols._

/** Static GTFS ingestion (SURVEY.md §2.1 S2/S3, §2.2 P1-P4, §2.8 F8,
  * §2.4 A8): all-string CSV scan, ID normalization, referential-integrity
  * semi-join filters, typed casts, key dedup, GTFS clock parsing, and
  * base-demand seeding — the reference's pandas `process` step
  * (src/dag/gtfs-static-job.py:46-145) as pure DataFrame functions.
  *
  * Scale notes: RI filtering is four left_semi joins in the reference's
  * order — at scale the dimension side (routes/calendar/trips keys)
  * broadcasts; stop_times (the fact table) never shuffles.
  */
object GtfsStatic {

  /** S2 — all-string CSV read ("" and " " → null, schema-on-write happens
    * in the typed-cast step). Ref: gtfs-static-job.py:61-76.
    */
  def readCsv(spark: SparkSession, path: String, columns: Seq[String]): DataFrame =
    spark.read
      .schema(StructType(columns.map(StructField(_, StringType, nullable = true))))
      .option("header", "true")
      .option("nullValue", "")
      .csv(path)
      // pandas na_values also nulls single-space cells
      .select(columns.map(c => when(trim(col(c)) === "", lit(null)).otherwise(col(c)).as(c)): _*)

  /** P1 — ID normalization: trim + string cast. Ref: :111-121. */
  def normalizeIds(df: DataFrame, idCols: Seq[String]): DataFrame =
    idCols.foldLeft(df)((d, c) => d.withColumn(c, trim(col(c).cast("string"))))

  /** P2 — referential integrity, reference order (:123-126): trips whose
    * route exists, stop_times whose trip and stop exist, trips whose
    * service exists.
    */
  def referentialFilter(
      routes: DataFrame, stops: DataFrame, trips: DataFrame,
      stopTimes: DataFrame, calendar: DataFrame): (DataFrame, DataFrame) = {
    val t1 = trips.join(routes.select("route_id"), Seq("route_id"), "left_semi")
    val st = stopTimes
      .join(t1.select("trip_id"), Seq("trip_id"), "left_semi")
      .join(stops.select("stop_id"), Seq("stop_id"), "left_semi")
    val t2 = t1.join(calendar.select("service_id"), Seq("service_id"), "left_semi")
    (t2, st)
  }

  /** P3 + F8 — typed casts for stops/stop_times: lat/lon double,
    * stop_sequence int, GTFS clocks to seconds-since-midnight (>24:00:00
    * preserved as integers — never TimestampType). Ref: :128-131,182-186.
    */
  def typedStops(stops: DataFrame): DataFrame =
    stops
      .withColumn("stop_lat", col("stop_lat").cast("double"))
      .withColumn("stop_lon", col("stop_lon").cast("double"))

  def typedStopTimes(stopTimes: DataFrame): DataFrame =
    stopTimes
      .withColumn("stop_sequence", col("stop_sequence").cast("int"))
      .withColumn("arrival_seconds", gtfsTimeToSeconds(col("arrival_time")))
      .withColumn("departure_seconds", gtfsTimeToSeconds(col("departure_time")))

  /** P4 — key dedup, deterministic representative (min natural order of
    * remaining columns is unnecessary — reference drop_duplicates keeps
    * the first row; file order is meaningless post-shuffle, so any
    * representative is acceptable and dropDuplicates is the idiomatic
    * choice). Ref: :140-145.
    */
  def dedupKeys(
      routes: DataFrame, stops: DataFrame, trips: DataFrame,
      stopTimes: DataFrame): (DataFrame, DataFrame, DataFrame, DataFrame) =
    (routes.dropDuplicates("route_id"),
      stops.dropDuplicates("stop_id"),
      trips.dropDuplicates("trip_id"),
      stopTimes.dropDuplicates("trip_id", "stop_id", "stop_sequence"))

  /** F20 — calendar day flags → boolean: TRUE iff the cell is exactly
    * "1" ("0", "", "true", garbage, and NULL all map to false — the
    * reference's `c.get(day) == "1"` where a missing/None cell compares
    * False, so the null-safe equality, not `===`, is the faithful
    * translation). Only the day columns actually present are cast.
    * Ref: :276-282.
    */
  def typedCalendar(calendar: DataFrame): DataFrame =
    Seq("monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday")
      .filter(calendar.columns.contains)
      .foldLeft(calendar)((d, c) => d.withColumn(c, col(c) <=> "1"))

  /** S3 — feed version identity: sha256 hex of the raw feed bytes
    * (driver-side, the zip is one small file). Ref: :79-84.
    */
  def sha256Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString

  /** S3 versioned flow — stamp every row with the feed's version_id (the
    * sha256 of the raw feed, [[sha256Hex]]): the reference keeps a
    * gtfs_versions registry and a version_id column on every static
    * table so multiple feed snapshots coexist.
    * Ref: initdb/init-postgis.sql:4-12, src/dag/gtfs-static-job.py:79-84.
    */
  def stampVersion(df: DataFrame, versionId: String): DataFrame =
    df.withColumn("version_id", lit(versionId))

  /** Versioned parquet sink: append partitioned by version_id, so each
    * feed snapshot lands in its own partition directory and a
    * version-pinned read prunes to one directory at the scan (no data
    * from other versions is even listed, let alone read) — the parquet
    * re-expression of the reference's per-version upsert tables.
    * Ref: src/dag/gtfs-static-job.py:204-244.
    */
  def writeVersioned(df: DataFrame, versionId: String, path: String): Unit =
    stampVersion(df, versionId)
      .write.mode("append").partitionBy("version_id").parquet(path)

  /** Fixture-CSV writer for the S2/F20 oracle round trips: emits the
    * on-disk shape the reference's pandas reader consumes — header row,
    * empty cells written UNQUOTED (so the all-string read's nullValue ""
    * applies; Spark's default emptyValue would write a quoted `""`,
    * which the reader keeps as an empty string, not null), and
    * whitespace preserved verbatim (the writer's ignore*WhiteSpace
    * options default to TRUE and would silently trim " " cells — the
    * very cells pandas' na_values [" "] nulls).
    */
  def writeCsvFixture(df: DataFrame, path: String): Unit =
    df.write
      .option("header", "true")
      .option("emptyValue", "")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .mode("overwrite")
      .csv(path)

  /** Version-pinned read: the version_id equality lands in the scan's
    * PartitionFilters (spec-asserted), making the read cost proportional
    * to one version regardless of how many snapshots the table holds.
    */
  def readVersion(spark: SparkSession, path: String, versionId: String): DataFrame =
    spark.read.parquet(path).filter(col("version_id") === versionId)

  /** S3 oracle leg — the version-stamp derivation end-to-end on engine
    * data: the "feed file" is the region table rendered to canonical
    * CSV-ish lines, its sha256 hex is the version_id ([[sha256Hex]]'s
    * column-algebra twin — sha2() here, sha256() in DuckDB), and every
    * nation row gets stamped with it ([[stampVersion]]). The digest is
    * a 1-row aggregate broadcast onto the stamped table, so the stamp
    * never shuffles the fact side.
    * Ref: src/dag/gtfs-static-job.py:79-84.
    */
  def versionStamp(region: DataFrame, nation: DataFrame): DataFrame = {
    // sort the collected lines by the NUMERIC key (struct sort_array
    // orders by the first field), matching the oracle's ORDER BY
    // r_regionkey — sorting the rendered strings would diverge as soon
    // as a key reaches 10 ("10,…" < "2,…" lexicographically)
    val keyed = struct(col("r_regionkey"),
      concat_ws(",", col("r_regionkey"), col("r_name")).as("line"))
    val feed = region.agg(
      sha2(array_join(transform(sort_array(collect_list(keyed)), _.getField("line")),
        "\n"), 256).as("version_id"))
    nation.crossJoin(broadcast(feed))
      .select(col("n_nationkey"), col("n_name"), col("version_id"))
      .orderBy("n_nationkey")
  }

  val versionStampSql: String =
    """WITH feed AS (
      |  SELECT sha256(string_agg(r_regionkey || ',' || r_name,
      |                           chr(10) ORDER BY r_regionkey)) AS version_id
      |  FROM region)
      |SELECT n_nationkey, n_name, version_id
      |FROM nation, feed ORDER BY n_nationkey""".stripMargin

  /** A8 — base-demand seeding: LEAST(50, GREATEST(5, stop_time_count*3)).
    * Ref: initdb/init-postgis.sql:170-176.
    */
  def stopBaseDemand(stopTimes: DataFrame): DataFrame =
    stopTimes.groupBy("stop_id")
      .agg(count(lit(1)).as("n"))
      .select(col("stop_id"), baseDemandWeight(col("n")).as("base_demand"))
}
