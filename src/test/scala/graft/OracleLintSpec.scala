package graft

import org.scalatest.funsuite.AnyFunSuite

/** Folds the oracle TYPE lint into `sbt test`: DESCRIBEs every registered
  * oracle in DuckDB and fails on HUGEINT/DECIMAL result columns — the
  * q63/q35/q22 bug class (DuckDB integer `sum()` widens to HUGEINT, Spark
  * emits BIGINT; values equal, driver hash different) dies at commit time
  * even without the driver's tooling pass. Skips with a message when the
  * local python has no duckdb module.
  */
class OracleLintSpec extends AnyFunSuite {

  test("every oracle plans without HUGEINT/DECIMAL result columns (lint_oracles.py)") {
    import scala.sys.process._
    val devNull = ProcessLogger(_ => (), _ => ())
    val hasDuck =
      try Process(Seq("python3", "-c", "import duckdb")).!(devNull) == 0
      catch { case _: java.io.IOException => false }
    assume(hasDuck, "python3/duckdb not available locally — lint runs driver-side")
    val sfDir = SparkTestBase.sfDir
    val tmp = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    try {
      java.nio.file.Files.writeString(tmp, Verify.oracleJson(sfDir))
      val out = new StringBuilder
      val log = ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n'))
      val code = Process(
        Seq("python3", "tools/lint_oracles.py", sfDir, tmp.toString),
        new java.io.File(".")).!(log)
      assert(code == 0, s"oracle lint failed:\n$out")
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}
