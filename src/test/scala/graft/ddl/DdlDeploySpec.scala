package graft.ddl

import org.scalatest.funsuite.AnyFunSuite

class DdlDeploySpec extends AnyFunSuite {

  test("rewrite: skip CREATE DATABASE / FILENAME / short USE [master]") {
    assert(DdlDeploy.rewriteBatch("CREATE DATABASE [X]", "A", "B").isEmpty)
    assert(DdlDeploy.rewriteBatch(
      "ALTER DATABASE x MODIFY FILE (FILENAME = 'c:/x.mdf')", "A", "B").isEmpty)
    assert(DdlDeploy.rewriteBatch("USE [master]", "A", "B").isEmpty)
    // long batches that merely mention USE [master] are kept
    val long = "USE [master]\nSELECT 1 FROM somewhere_else_entirely"
    assert(DdlDeploy.rewriteBatch(long, "A", "B").isDefined)
  }

  test("rewrite: database retargeting, bracketed and bare") {
    val b = DdlDeploy.rewriteBatch("USE [LINKERPFINSAT]; EXEC x 'LINKERPFINSAT'",
      "LINKERPFINSAT", "TARGETDB").get
    assert(b == "USE [TARGETDB]; EXEC x 'TARGETDB'")
  }

  test("prepare on the reference script yields executable batches") {
    val batches = DdlDeploy.prepare("/root/reference/script.sql",
      "LINKERPFINSAT", "GRAFTDB")
    // 85 CREATE TABLE + 131×2 FK batches + indexes etc., none skipped-empty
    assert(batches.count(_.contains("CREATE TABLE")) == 85)
    assert(batches.forall(_.nonEmpty))
    assert(!batches.exists(_.toUpperCase.contains("CREATE DATABASE")))
    assert(!batches.exists(_.contains("LINKERPFINSAT")))
  }
}
