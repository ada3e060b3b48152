package graft

import graft.tables.{Catalog, Tables}

class CatalogSpec extends SparkSpec {

  test("initSchema registers all tables idempotently; existence probe works") {
    Catalog.initSchema(spark, sf)
    Catalog.initSchema(spark, sf) // idempotent re-run
    assert(Catalog.TableNames.forall(Catalog.tableExists(spark, _)))
    assert(!Catalog.tableExists(spark, "no_such_table"))
    // registered views are queryable through SQL
    assert(spark.sql("SELECT count(*) FROM events").head().getLong(0) > 0)
  }

  test("JSON sink emits one parseable line per row") {
    val out = Catalog.toJsonLines(
      Tables.customer(spark, sf).limit(3)).collect().map(_.getString(0))
    assert(out.length === 3)
    assert(out.forall(s => s.startsWith("{") && s.contains("\"c_custkey\"")))
  }
}
