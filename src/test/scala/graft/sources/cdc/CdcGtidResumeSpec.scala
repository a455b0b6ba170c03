package graft.sources.cdc

import java.io.ByteArrayOutputStream

import graft.SparkTestSession
import graft.sources.cdc.testkit.MockMaxScaleServer
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

/** Per-schema-version GTID resume (the avro router keys its files by
  * schema version, one file per version): offsets checkpoint the GTID
  * (`domain-server_id-sequence`, carried by every DML envelope) and the
  * schema version of their last event, and a restarted source issues
  * `REQUEST-DATA db.table.<version> <gtid>` derived from the checkpoint
  * — no manually configured GTID needed, and the request lands in the
  * right version's file. */
object CdcGtidResumeProbe {
  val rows = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
}

class CdcGtidResumeSpec extends AnyFunSuite with SparkTestSession {

  private def ddl(version: Int, extraField: String = "") =
    s"""{"namespace":"MaxScaleChangeDataSchema.avro","type":"record","name":"ChangeRecord","table":"users","database":"example","version":$version,"gtid":"0-1-$version","fields":[{"name":"id","type":"int"},{"name":"name","type":["null","string"]}$extraField]}"""
  private def dml(seq: Int, id: Int, name: String) =
    s"""{"domain":0,"server_id":1,"sequence":$seq,"event_number":1,"timestamp":1754956800,"event_type":"insert","id":$id,"name":"$name"}"""

  test("CdcOffset json round-trips the resume position and reads legacy offsets") {
    val full = CdcOffset(17L, "0-1-9", Int.box(2))
    assert(CdcOffset.parse(full.json()) == full)
    val noVersion = CdcOffset(3L, "0-1-2", null)
    assert(CdcOffset.parse(noVersion.json()) == noVersion)
    // no position at all -> legacy bare index, both ways
    assert(CdcOffset(5L).json() == "5")
    assert(CdcOffset.parse("5") == CdcOffset(5L))
  }

  test("restart resumes with a version-qualified REQUEST-DATA from the checkpointed GTID") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-gtid").toString
    CdcGtidResumeProbe.rows.clear()
    def run(server: MockMaxScaleServer, expectTotal: Int): Unit = {
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", server.port)
        .option("user", "u").option("password", "p")
        .option("database", "example").option("table", "users")
        .load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => CdcGtidResumeProbe.rows.add(r.getAs[String]("payload")))
          ()
        }
        .option("checkpointLocation", ckpt).start()
      try {
        val deadline = System.currentTimeMillis() + 15000
        while (CdcGtidResumeProbe.rows.size < expectTotal && System.currentTimeMillis() < deadline) {
          Thread.sleep(100); q.processAllAvailable()
        }
        assert(CdcGtidResumeProbe.rows.size == expectTotal,
          s"got ${CdcGtidResumeProbe.rows.size}, want $expectTotal")
      } finally q.stop()
    }

    // run 1: schema v1, two inserts, schema v2 (adds a column), one more
    // insert — last committed event is seq 3 under schema version 2
    run(new MockMaxScaleServer(events = Seq(
      ddl(1), dml(1, 1, "a"), dml(2, 2, "b"),
      ddl(2, """,{"name":"email","type":["null","string"]}"""), dml(3, 3, "c"))), 5)

    // run 2: the fresh connection must subscribe AT the checkpointed
    // position — version-qualified with the v2 schema and the GTID of
    // the last committed DML — with no gtid/version options configured
    val server2 = new MockMaxScaleServer(events = Seq(dml(4, 4, "d"), dml(5, 5, "e")))
    run(server2, 7)
    assert(server2.requestDataReceived == "REQUEST-DATA example.users.2 0-1-3",
      s"resume request was: ${server2.requestDataReceived}")
    // exactly-once at the probe: sequences 1..5, no duplicates
    val seqs = CdcGtidResumeProbe.rows.toArray.map(_.toString)
      .filter(_.contains("sequence"))
      .map(p => "\"sequence\":(\\d+)".r.findFirstMatchIn(p).get.group(1).toInt).sorted.toSeq
    assert(seqs == Seq(1, 2, 3, 4, 5), s"sequences: $seqs")
  }

  test("AVRO wire mode resumes version-qualified too (DML-derived GTID)") {
    // avro containers carry no DDL gtid — the resume GTID must come from
    // the DML envelopes (domain-server_id-sequence), and the version
    // from the container schema's schema_version prop
    def schemaJson(version: Int, extra: String = "") =
      s"""{"type":"record","name":"users","namespace":"example","schema_version":"$version",
         |"fields":[
         |  {"name":"domain","type":"int"},
         |  {"name":"server_id","type":"int"},
         |  {"name":"sequence","type":"long"},
         |  {"name":"event_number","type":"long"},
         |  {"name":"timestamp","type":"long"},
         |  {"name":"event_type","type":"string"},
         |  {"name":"id","type":"long"}$extra
         |]}""".stripMargin
    def container(schema: Schema, seqs: Range, extraPut: GenericRecord => Unit): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      seqs.foreach { i =>
        val r = new GenericData.Record(schema)
        r.put("domain", 0); r.put("server_id", 1); r.put("sequence", i.toLong)
        r.put("event_number", 1L); r.put("timestamp", 1754956800L)
        r.put("event_type", "insert"); r.put("id", i.toLong)
        extraPut(r)
        w.append(r)
      }
      w.close()
      out.toByteArray
    }
    val v1 = new Schema.Parser().parse(schemaJson(1))
    val v2 = new Schema.Parser().parse(schemaJson(2,
      """,{"name":"email","type":["null","string"]}"""))
    // one stream: v1 container (seq 1-3), then v2 container (seq 4-6) —
    // the mid-stream header is the schema-version rotation
    val out = new ByteArrayOutputStream()
    out.write(container(v1, 1 to 3, _ => ()))
    out.write(container(v2, 4 to 6, r => r.put("email", "x@y.io")))

    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-gtid-avro").toString
    CdcGtidResumeProbe.rows.clear()
    def run(server: MockMaxScaleServer, expectTotal: Int): Unit = {
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", server.port)
        .option("user", "u").option("password", "p")
        .option("database", "example").option("table", "users")
        .option("wireType", "AVRO")
        .load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => CdcGtidResumeProbe.rows.add(
            s"${r.getAs[String]("kind")}:${r.getAs[Any]("sequence")}"))
          ()
        }
        .option("checkpointLocation", ckpt).start()
      try {
        val deadline = System.currentTimeMillis() + 15000
        while (CdcGtidResumeProbe.rows.size < expectTotal && System.currentTimeMillis() < deadline) {
          Thread.sleep(100); q.processAllAvailable()
        }
        assert(CdcGtidResumeProbe.rows.size == expectTotal,
          s"got ${CdcGtidResumeProbe.rows.size}, want $expectTotal")
      } finally q.stop()
    }

    // run 1: 6 DMLs + 2 schema DDLs; last event under schema_version 2
    run(new MockMaxScaleServer(events = Nil, avroPayload = Some(out.toByteArray)), 8)

    // run 2: resume request carries .2 and the GTID of seq 6
    val server2 = new MockMaxScaleServer(events = Nil,
      avroPayload = Some(container(v2, 7 to 8, r => r.put("email", "z@y.io"))))
    run(server2, 11) // +1 ddl (the fresh container header) +2 dml
    assert(server2.requestDataReceived == "REQUEST-DATA example.users.2 0-1-6",
      s"resume request was: ${server2.requestDataReceived}")
  }
}
