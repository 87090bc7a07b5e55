package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FormatsSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"
  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docsSorted(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).sortBy(_.head.toString)

  test("JSONL round-trip (gzip) preserves the documents table exactly") {
    val out = tmp("graft-jsonl")
    val docs = Tables.documents(spark, d)
    Formats.writeJsonl(docs, out)
    val back = Formats.readJsonl(spark, out,
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    val (clean, corrupt) = Formats.partitionCorrupt(back)
    assert(corrupt.count() == 0)
    assert(docsSorted(clean).toSeq == docsSorted(docs).toSeq)
  }

  test("JSONL corrupt lines are isolated, counted, and don't poison clean rows") {
    val dir = tmp("graft-dirty")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "part0.jsonl"),
      """{"doc_id": 1, "text": "good row", "lang": "en"}
        |this is not json at all
        |{"doc_id": 2, "text": "also good", "lang": "de"}
        |{"doc_id": oops}
        |""".stripMargin)
    val (clean, corrupt) = Formats.partitionCorrupt(
      Formats.readJsonl(spark, dir, "doc_id BIGINT, text STRING, lang STRING"))
    assert(clean.count() == 2 && corrupt.count() == 2)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("CSV round-trip preserves the documents table (text has no delimiter collisions)") {
    val out = tmp("graft-csv")
    val docs = Tables.documents(spark, d)
    Formats.writeCsv(docs, out)
    val back = Formats.readCsv(spark, out,
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    assert(docsSorted(back).toSeq == docsSorted(docs).toSeq)
  }

  test("ORC round-trip preserves lineitem exactly, including doubles and timestamps") {
    val out = tmp("graft-orc")
    val li = Tables.lineitem(spark, d)
    Formats.writeOrc(li, out)
    val back = Formats.readOrc(spark, out)
    assert(back.schema == li.schema)
    assert(back.count() == li.count())
    val key = Seq("l_orderkey", "l_linenumber")
    assert(back.orderBy(key.map(col): _*).collect().map(_.toSeq).toSeq ==
      li.orderBy(key.map(col): _*).collect().map(_.toSeq).toSeq)
  }
}
