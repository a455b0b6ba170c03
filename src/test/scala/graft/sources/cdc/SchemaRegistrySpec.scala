package graft.sources.cdc

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** DDL decode + schema mapping against the FIXTURES.md DDL event (the
  * three Avro field-type shapes of `types.go:68-117`). */
class SchemaRegistrySpec extends AnyFunSuite {

  val ddlJson: String =
    """{"namespace": "MaxScaleChangeDataSchema.avro", "type": "record",
      | "name": "ChangeRecord", "table": "users", "database": "example",
      | "version": 1, "gtid": "0-1-42",
      | "fields": [
      |   {"name": "id", "type": "int", "real_type": "int", "length": -1, "unsigned": false},
      |   {"name": "big", "type": "int", "real_type": "int", "length": -1, "unsigned": true},
      |   {"name": "name", "type": ["null", "string"], "real_type": "varchar", "length": 255},
      |   {"name": "state", "type": {"type": "enum", "name": "state_enum", "symbols": ["active", "disabled"]}}
      | ]}""".stripMargin

  test("DDL event decodes all three field-type shapes") {
    val ev = CdcEvent.decode(ddlJson).toOption.get.asInstanceOf[DdlEvent]
    assert(ev.eventType == "ddlEvent")
    assert(ev.database == "example" && ev.table == "users" && ev.version == 1)
    assert(ev.gtid == "0-1-42")
    val byName = ev.fields.map(f => f.name -> f).toMap
    assert(byName("id").avroType == "int" && !byName("id").nullable)
    assert(byName("name").avroType == "string" && byName("name").nullable)
    assert(byName("name").realType.contains("varchar") && byName("name").length.contains(255))
    // intended enum semantics — the reference drops the decoded enum
    // (`types.go:105-113`); we keep it
    assert(byName("state").avroType == "enum")
    assert(byName("state").enumSymbols == Seq("active", "disabled"))
  }

  test("registry maps to StructType with refinements and versioning") {
    val reg = new SchemaRegistry
    val ev = CdcEvent.decode(ddlJson).toOption.get.asInstanceOf[DdlEvent]
    val st = reg.register(ev)
    assert(st("id").dataType == IntegerType)
    assert(st("big").dataType == LongType) // unsigned int widens
    assert(st("name").dataType == StringType && st("name").nullable)
    assert(st("state").dataType == StringType)
    assert(st("state").metadata.getStringArray("enumValues").toSeq ==
      Seq("active", "disabled"))
    assert(reg.get("example", "users", 1).contains(st))
    assert(reg.latest("example", "users").contains(st))

    val v2 = ev.copy(version = 2, fields = ev.fields.take(1))
    reg.register(v2)
    assert(reg.latest("example", "users").get.fields.length == 1)
    assert(reg.get("example", "users", 1).get.fields.length == 4)
  }

  test("unsupported complex types error, unknown primitives degrade") {
    val bad = """{"namespace":"x","type":"record","name":"n","table":"t",
      |"database":"d","version":1,"gtid":"",
      |"fields":[{"name":"m","type":{"type":"map"}}]}""".stripMargin
    assert(CdcEvent.decode(bad).isLeft)
  }

  test("property: random DDL field specs round-trip to the expected StructType") {
    import scala.util.Random
    import org.apache.spark.sql.types._
    val r = new Random(7)
    val primitives = Seq(
      "int" -> IntegerType, "long" -> LongType, "string" -> StringType,
      "float" -> FloatType, "double" -> DoubleType, "boolean" -> BooleanType,
      "bytes" -> BinaryType)
    for (iter <- 0 until 200) {
      val n = 1 + r.nextInt(6)
      val specs = (0 until n).map { i =>
        val (avro, spark) = primitives(r.nextInt(primitives.length))
        r.nextInt(3) match {
          case 0 => // plain
            (s"""{"name":"c$i","type":"$avro"}""", StructField(s"c$i", spark, nullable = false))
          case 1 => // null union
            (s"""{"name":"c$i","type":["null","$avro"]}""", StructField(s"c$i", spark, nullable = true))
          case 2 => // enum
            (s"""{"name":"c$i","type":{"type":"enum","name":"e$i","symbols":["x","y"]}}""",
              StructField(s"c$i", StringType, nullable = false))
        }
      }
      val json = s"""{"namespace":"ns","type":"record","name":"R","table":"t",
        |"database":"d","version":$iter,"gtid":"0-0-$iter",
        |"fields":[${specs.map(_._1).mkString(",")}]}""".stripMargin
      CdcEvent.decode(json) match {
        case Right(ddl: DdlEvent) =>
          val st = SchemaRegistry.toStructType(ddl)
          specs.map(_._2).zip(st.fields).foreach { case (want, got) =>
            assert(got.name == want.name && got.dataType == want.dataType &&
              got.nullable == want.nullable, s"iter $iter: want $want got $got")
          }
        case other => fail(s"decode failed at iter $iter: $other")
      }
    }
  }

  test("malformed event JSON yields a decode error, not an exception") {
    assert(CdcEvent.decode("""{"domain": bad}""").isLeft)
    assert(CdcEvent.decode("""{"unknown": 1}""").isLeft)
    assert(CdcEvent.decode("not json at all").isLeft)
  }

  test("DML event decodes envelope and keeps raw JSON") {
    val dml = """{"domain": 0, "server_id": 1, "sequence": 42, "event_number": 7,
      | "timestamp": 1754956800, "event_type": "insert",
      | "id": 7, "name": "John Doe", "state": "active"}""".stripMargin
    val ev = CdcEvent.decode(dml).toOption.get.asInstanceOf[DmlEvent]
    assert(ev.eventType == "dmlEvent")
    assert(ev.sequence == 42L && ev.eventNumber == 7L)
    assert(ev.eventKind == "insert")
    assert(ev.timestamp == 1754956800L)
    assert(ev.rawJson.contains("John Doe"))
  }
}
