package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class JsonSpec extends SparkSpec {

  private def write(dir: String, name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.writeString(p, content)
    p.toString
  }

  test("S1: JSONL read gives one row per line") {
    val dir = tmpDir("jsonl")
    val path = write(dir, "data.jsonl",
      """{"id": 1, "name": "Ada"}
        |{"id": 2, "name": "Bob"}
        |""".stripMargin)
    val df = Json.readJsonl(spark, path)
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("id", "name"))
  }

  test("S2+QBO: multi-line JSON document, explode QueryResponse entity") {
    val dir = tmpDir("qbo")
    val path = write(dir, "raw.json",
      """{
        |  "QueryResponse": {
        |    "Invoice": [
        |      {"Id": "1", "TotalAmt": 100.0, "TxnDate": "2026-01-04"},
        |      {"Id": "2", "TotalAmt": 250.5, "TxnDate": "2026-01-05"}
        |    ],
        |    "startPosition": 1, "maxResults": 2
        |  },
        |  "time": "2026-01-05T00:00:00Z"
        |}""".stripMargin)
    val doc = Json.readJsonDoc(spark, path)
    val invoices = Json.extractQueryResponse(doc, "Invoice")
    assert(invoices.count() == 2)
    assert(invoices.columns.toSet == Set("Id", "TotalAmt", "TxnDate"))
  }

  test("S7: bare array, data/items/results wrappers all normalize; bad shape errors") {
    val dir = tmpDir("variant")
    val bare = write(dir, "bare.json", """[{"id": 1}, {"id": 2}]""")
    assert(Json.readItems(spark, bare).count() == 2)

    Json.WrapperFields.foreach { w =>
      val p = write(dir, s"$w.json", s"""{"$w": [{"id": 1}, {"id": 2}, {"id": 3}]}""")
      val out = Json.readItems(spark, p)
      assert(out.count() == 3, s"wrapper $w")
      assert(out.columns.toSet == Set("id"))
    }

    val bad = write(dir, "bad.json", """{"foo": 1}""")
    assertThrows[IllegalArgumentException] {
      Json.readItems(spark, bad)
    }
  }
}
