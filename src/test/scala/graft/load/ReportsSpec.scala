package graft.load

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.integrate.{JoinOp, UnionOp, ValidatorReport}

class ReportsSpec extends AnyFunSuite {

  test("validator report serializes to the snake_case JSON contract (K3)") {
    val report = ValidatorReport(
      inputCount = 2,
      inputShapes = Seq((10L, 3), (5L, 2)),
      unionOperations = Seq(UnionOp("union", "Group0", 0.91, 15L, 3)),
      stage1Operations = Seq(JoinOp(Seq(0, 1), compatible = true, 1.2, 6L, 6L, 5)),
      stage2Operations = Nil,
      earlyTermination = false,
      stage2Skipped = true,
      outputCount = 1,
      outputShapes = Seq((6L, 5)))
    val json = Reports.toJson(report)
    // golden contract: snake_case keys, nested op objects, no camelCase
    assert(json.contains("\"input_count\" : 2"))
    assert(json.contains("\"early_termination\" : false"))
    assert(json.contains("\"stage2_skipped\" : true"))
    assert(json.contains("\"union_operations\""))
    assert(json.contains("\"result_cols\" : 3"))
    assert(json.contains("\"retention\" : 1.2"))
    // keys are snake_case (no camelCase keys survive)
    assert(!json.contains("\"inputCount\"") && !json.contains("\"resultCols\""))
  }

  test("load report golden JSON") {
    val report = LoadReport("success", "jdbc:derby:memory:x", 1, 2L, 0,
      Seq(LoadResult(0, "table_0", 2L, 3, "success", 2L,
        tableExisted = false, action = "create")))
    val expected =
      """{
        |  "status" : "success",
        |  "db_path" : "jdbc:derby:memory:x",
        |  "tables_loaded" : 1,
        |  "total_rows_loaded" : 2,
        |  "total_errors" : 0,
        |  "results" : [ {
        |    "index" : 0,
        |    "table_name" : "table_0",
        |    "rows" : 2,
        |    "columns" : 3,
        |    "status" : "success",
        |    "rows_loaded" : 2,
        |    "table_existed" : false,
        |    "action" : "create"
        |  } ]
        |}""".stripMargin
    assert(Reports.toJson(report) == expected)
  }

  test("write creates parent dirs and round-trips") {
    val dir = Files.createTempDirectory("graft_reports")
    val path = s"$dir/run1/load_report.json"
    Reports.write(LoadReport("no_data", "url", 0, 0L, 0, Nil), path)
    val txt = Files.readString(Paths.get(path))
    assert(txt.contains("\"status\" : \"no_data\""))
  }
}
