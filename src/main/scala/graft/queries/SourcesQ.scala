package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink round-trips (SURVEY §2.3 "Sources / sinks"): csv and json
  * scans with explicit schemas, and a parquet write+read. Each query
  * round-trips a fixture table through the format and selects it back, so
  * the DuckDB oracle is simply the original table — content equality IS
  * the format-fidelity check. Writes land under java.io.tmpdir, keyed by
  * the sf dir, so Verify/Bench runs don't collide.
  */
object SourcesQ {

  private def scratch(d: String, name: String): String = {
    val key = d.replaceAll("[^a-zA-Z0-9]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft-io/$key/$name"
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "src_csv_roundtrip",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation") { (s, d) =>
      val path = scratch(d, "nation_csv")
      Tables.nation(s, d).write.mode("overwrite").option("header", "true").csv(path)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      graft.io.Sources.csv(s, path, schema)
    },

    QueryDef(
      "src_json_roundtrip",
      "SELECT r_regionkey, r_name FROM region") { (s, d) =>
      val path = scratch(d, "region_json")
      Tables.region(s, d).write.mode("overwrite").json(path)
      val schema = StructType(Seq(
        StructField("r_regionkey", IntegerType),
        StructField("r_name", StringType)))
      graft.io.Sources.json(s, path, schema)
    },

    // XML round-trip (r9): Spark 4 ships the spark-xml connector as a
    // built-in data source — the config/feed-ingest format the csv/json
    // rows don't cover. Same fidelity pattern: write the table as XML
    // (one <nation> element per row), scan it back with an explicit
    // schema, oracle = the original table.
    QueryDef(
      "src_xml_roundtrip",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation") { (s, d) =>
      val path = scratch(d, "nation_xml")
      Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").option("rowTag", "nation").format("xml").save(path)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      graft.io.Sources.xml(s, path, schema, rowTag = "nation")
    },

    QueryDef(
      "src_parquet_roundtrip",
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier") { (s, d) =>
      val path = scratch(d, "supplier_parquet")
      graft.io.Sinks.parquet(Tables.supplier(s, d), path)
      graft.io.Sources.parquet(s, path)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    },

    // ORC round-trip: Spark's second first-class columnar format (same
    // pushdown/pruning machinery — predicate pushdown via ORC
    // SearchArguments). The filter exercises pushdown through the ORC
    // reader; the oracle reads the original table.
    QueryDef(
      "src_orc_roundtrip",
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
        |FROM customer WHERE c_acctbal > 1000""".stripMargin) { (s, d) =>
      val path = scratch(d, "customer_orc")
      graft.io.Sinks.orc(
        Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
        path)
      graft.io.Sources.orc(s, path).filter(col("c_acctbal") > 1000)
    },

    // binaryFile source (SURVEY §2.3 multimodal: "Parquet binaryFile
    // source"): raw files scanned as (path, modificationTime, length,
    // content) rows — the ingest path for image/audio payloads that
    // don't arrive in parquet. Five fixture documents are materialized
    // as .bin files and scanned back; the oracle recomputes length and
    // md5 from the documents table, so content fidelity through the
    // file round-trip is hash-verified.
    QueryDef(
      "src_binaryfile",
      """SELECT doc_id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_len,
        |       md5(text) AS payload_md5
        |FROM documents WHERE doc_id < 5""".stripMargin) { (s, d) =>
      val dir = new java.io.File(scratch(d, "docs_bin"))
      if (dir.exists()) dir.listFiles().foreach(_.delete()) else dir.mkdirs()
      Tables.documents(s, d).filter(col("doc_id") < 5)
        .select(col("doc_id"), col("text")).collect() // 5 rows, bounded
        .foreach { r =>
          java.nio.file.Files.write(
            new java.io.File(dir, s"${r.getLong(0)}.bin").toPath,
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      s.read.format("binaryFile").load(dir.getAbsolutePath)
        .select(
          regexp_extract(col("path"), "(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
          col("length").as("payload_len"),
          md5(col("content")).as("payload_md5"))
    },

    // Partitioned parquet write + partition-pruned read: the layout that
    // carries 100 TB (pruning skips whole directories at the scan).
    QueryDef(
      "src_partitioned_pruned",
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderstatus = 'O'""".stripMargin) { (s, d) =>
      val path = scratch(d, "orders_part")
      graft.io.Sinks.parquet(Tables.orders(s, d), path, partitionBy = Seq("o_orderstatus"))
      graft.io.Sources.parquet(s, path)
        .filter(col("o_orderstatus") === "O") // prunes to one partition dir
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    }
  )
}
