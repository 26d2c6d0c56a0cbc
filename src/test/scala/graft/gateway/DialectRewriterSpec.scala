package graft.gateway

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/backend/tests/test_query_conversion.py. */
class DialectRewriterSpec extends AnyFunSuite {

  private val noCatalog = ConnectionConfig(
    storageType = "minio", endpoint = "http://localhost:9000",
    accessKey = "k", secretKey = "s")
  private val restCatalog = noCatalog.copy(
    catalogType = "rest",
    catalogEndpoint = Some("https://cat/v1"),
    namespace = Some("analytics"))

  test("read_parquet single-star glob becomes iceberg_scan") {
    val in = "SELECT * FROM read_parquet('s3://movies/demo/data/*.parquet')"
    assert(DialectRewriter.convertReadParquet(in, noCatalog) ==
      "SELECT * FROM iceberg_scan('s3://movies/demo/data')")
  }

  test("read_parquet recursive glob becomes iceberg_scan") {
    val in = "SELECT * FROM read_parquet('s3://b/wh/tbl/**/*.parquet')"
    assert(DialectRewriter.convertReadParquet(in, noCatalog) ==
      "SELECT * FROM iceberg_scan('s3://b/wh/tbl')")
  }

  test("read_parquet with REST catalog becomes catalog table ref") {
    val in = "SELECT * FROM read_parquet('s3://b/wh/movies/*.parquet')"
    assert(DialectRewriter.convertReadParquet(in, restCatalog) ==
      "SELECT * FROM iceberg_catalog.analytics.movies")
  }

  test("double quotes and mixed case handled") {
    val in = """SELECT * FROM READ_PARQUET("s3://b/t/*.parquet")"""
    assert(DialectRewriter.convertReadParquet(in, noCatalog) ==
      "SELECT * FROM iceberg_scan('s3://b/t')")
  }

  test("non-matching SQL passes through unchanged") {
    val in = "SELECT * FROM iceberg_scan('s3://b/t') WHERE x = 'read_parquet'"
    assert(DialectRewriter.convertReadParquet(in, noCatalog) == in)
    val local = "SELECT * FROM read_parquet('/local/path/file.parquet')"
    assert(DialectRewriter.convertReadParquet(local, noCatalog) == local)
  }
}
