package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.config._
import graft.expressions.PyJsonDumpsImpl
import graft.functions.Conversions
import graft.operators.Envelope
import graft.sources.MessageSource

/** Golden tests for [[graft.expressions.PyJsonDumps]] /
  * [[graft.expressions.PyJsonQuote]]: every expected string below was
  * produced by CPython's `json.dumps(json.loads(raw), ensure_ascii=False)`
  * (with the reference's drop/flag mutations from
  * `/root/reference/src/kafka_source.py:85-100` applied between parse and
  * dump), so a pass certifies byte parity with the reference's persisted
  * `kafka_message`, not with our own reading of the spec.
  */
class PyJsonDumpsSpec extends SparkSpec {

  // Physical backslash-u in raw JSON text without tripping Scala's own
  // unicode-escape pre-processing.
  private val U = "\\" + "u"

  private def emit(raw: String, drop: Seq[String] = Nil, flag: Seq[String] = Nil): String = {
    val r = PyJsonDumpsImpl.emit(UTF8String.fromString(raw),
      PyJsonDumpsImpl.cfgOf(drop, flag, "."))
    if (r == null) null else r.toString
  }

  test("separators, insertion order, nesting — json.dumps parity") {
    assert(emit("""{"a":1,"b":[1,{"c":2}],"d":"x"}""") === """{"a": 1, "b": [1, {"c": 2}], "d": "x"}""")
    // key order is the row's own, NOT schema/alphabetical order
    assert(emit("""{"z":1,"a":2}""") === """{"z": 1, "a": 2}""")
    assert(emit("""{"x":[[1,2],[3]]}""") === """{"x": [[1, 2], [3]]}""")
    assert(emit("{}") === "{}")
    assert(emit("[]") === "[]")
    assert(emit("""{"o":{}}""") === """{"o": {}}""")
    // input whitespace is irrelevant; output layout is canonical
    assert(emit("""  {  "s" : "v" , "t" : [ 1 , 2 ] }  """) === """{"s": "v", "t": [1, 2]}""")
  }

  test("float repr — Python shortest round-trip with Python display rules") {
    val cases = Seq(
      "1e16" -> "1e+16", "1.5e16" -> "1.5e+16", "1e15" -> "1000000000000000.0",
      "1e-4" -> "0.0001", "1e-5" -> "1e-05", "0.0001" -> "0.0001",
      "62.4375" -> "62.4375", "62.0" -> "62.0", "2.5e16" -> "2.5e+16",
      "1e-7" -> "1e-07", "100.0" -> "100.0", "0.1" -> "0.1",
      "1e100" -> "1e+100", "123456789.123" -> "123456789.123",
      "3.141592653589793" -> "3.141592653589793",
      "1.7976931348623157e308" -> "1.7976931348623157e+308",
      "5e-324" -> "5e-324", "-0.0" -> "-0.0",
      // float overflow behaves like Python float("1e999") -> inf
      "1e999" -> "Infinity", "-1e999" -> "-Infinity",
      // regression (differential fuzz seed 100): JDK %.{p}e double-rounds
      // through Double.toString's 17 digits, so the correctly rounded
      // 16-digit form (…849) was never tried and 17 digits shipped.
      "4.7356337844798495E18" -> "4.735633784479849e+18",
      "4.735633784479849e+18" -> "4.735633784479849e+18",
      // non-finite literals CPython's parser accepts round-trip
      "NaN" -> "NaN", "Infinity" -> "Infinity", "-Infinity" -> "-Infinity")
    cases.foreach { case (in, out) => assert(emit(in) === out, s"for $in") }
  }

  test("integers pass through at arbitrary precision; -0 normalizes like int('-0')") {
    assert(emit("""{"n":-0,"big":123456789012345678901234567890,"f":-0.0,"g":100.0,"h":5e-324}""")
      === """{"n": 0, "big": 123456789012345678901234567890, "f": -0.0, "g": 100.0, "h": 5e-324}""")
    assert(emit("9007199254740993") === "9007199254740993")
  }

  test("string escapes decode + re-encode canonically (ensure_ascii=False)") {
    // \u00e6 -> raw æ, \/ -> /, \u0041 -> A, tab escape canonical
    assert(emit(s"""{"y":"r${U}00e6v ${"\\"}/ ${U}0041","z":"tab${"\\"}there"}""")
      === "{\"y\": \"r\u00e6v / A\", \"z\": \"tab\\there\"}")
    // C0 controls re-escape with lowercase hex; DEL and non-ASCII stay raw
    assert(emit(s""""a${U}0007b ${U}001f ${U}007f"""") === "\"a" + U + "0007b " + U + "001f \u007f\"")
    // surrogate pair decodes to the astral char, emitted raw
    assert(emit(s""""${U}d83d${U}de00"""") === "\"\ud83d\ude00\"")
    // quote + backslash escapes
    assert(emit(s""""q${"\\"}"w${"\\"}${"\\"}e"""") === s""""q${"\\"}"w${"\\"}${"\\"}e"""")
  }

  test("F1 drops and F2 flags by cleaned keypath, array-crossing") {
    assert(emit(
      """{"z":7,"a":{"keep":"x","secret":"s"},"arr":[{"f":1.5,"d":0},{"f":2.5e16}],"pi":1e-7,"nil":null,"ok":true}""",
      drop = Seq("a.secret", "arr.d"), flag = Seq("nil", "ok"))
      === """{"z": 7, "a": {"keep": "x"}, "arr": [{"f": 1.5}, {"f": 2.5e+16}], "pi": 1e-07, "nil": 0, "ok": 1}""")
    // flag on a container replaces the container; deep drop inside arrays
    assert(emit("""{"a":[1,2,3],"b":{"c":{"d":[{"e":null}]}}}""",
      drop = Seq("b.c.d.e"), flag = Seq("a"))
      === """{"a": 1, "b": {"c": {"d": [{}]}}}""")
    // dropping the whole subtree, object can become first-key-less
    assert(emit("""{"drop_all":{"a":1},"keep":2}""", drop = Seq("drop_all"))
      === """{"keep": 2}""")
    // flag on empty dict: non-null -> 1
    assert(emit("""{"o":{}}""", flag = Seq("o")) === """{"o": 1}""")
    // drop of every key leaves {}
    assert(emit("""{"a":1,"b":2}""", drop = Seq("a", "b")) === "{}")
  }

  test("malformed JSON yields null (routed to the ST5 corrupt channel)") {
    assert(emit("""{"a":""") === null)
    assert(emit("""{"a":1,}""") === null)
    assert(emit("""{'a':1}""") === null)
    assert(emit("""{"a":1} trailing""") === null)
    assert(emit("") === null)
    assert(PyJsonDumpsImpl.emit(null, PyJsonDumpsImpl.cfgOf(Nil, Nil, ".")) === null)
  }

  test("number tokens validate against CPython's grammar — loose digit soup rejects") {
    // All of these raise in json.loads; previously they were re-emitted
    // verbatim as INVALID canonical bytes.
    Seq("""{"a":1-2}""", "+5", "007", "00", "--1", "-", """{"a":.5}""",
      """{"a":5.}""", "1.e5", "1e", "1e+", "1.2.3", "0x10", "-+1", "1e5-2")
      .foreach(bad => assert(emit(bad) === null, s"should reject: $bad"))
    // ...while every form the grammar does admit still round-trips,
    // including optional exponent sign and zero int part with frac.
    assert(emit("""{"a":0.5,"b":1e5,"c":1E-5,"d":-0.25e+2,"e":0}""")
      === """{"a": 0.5, "b": 100000.0, "c": 1e-05, "d": -25.0, "e": 0}""")
    // strict grammar also applies inside DROPPED subtrees (skipNumber path)
    assert(emit("""{"d":{"x":007},"k":1}""", drop = Seq("d")) === null)
  }

  test("duplicate object keys resolve keep-LAST at FIRST position — CPython dict semantics") {
    // json.loads({"a":1,"a":2}) == {"a": 2}: last value, first position.
    // The rewind-and-buffer fallback re-parses only the offending object.
    assert(emit("""{"a":1,"a":2}""") === """{"a": 2}""")
    assert(emit("""{"a":1,"b":0,"a":2}""") === """{"a": 2, "b": 0}""")
    assert(emit("""{"a":1,"b":{"c":1,"c":2}}""") === """{"a": 1, "b": {"c": 2}}""")
    assert(emit("""[{"k":1},{"k":2},{"k":1,"k":1}]""")
      === """[{"k": 1}, {"k": 2}, {"k": 1}]""")
    // triplicate: still one emission, the last value
    assert(emit("""{"x":1,"x":2,"x":3}""") === """{"x": 3}""")
    // container values buffer and replace wholesale, not merge
    assert(emit("""{"a":{"p":1},"a":{"q":2}}""") === """{"a": {"q": 2}}""")
    // duplicates INSIDE the replaced (earlier, discarded) value still parse
    assert(emit("""{"a":{"d":1,"d":2},"a":7}""") === """{"a": 7}""")
    // same key at different depths / in sibling objects is NOT a duplicate
    assert(emit("""{"a":{"a":1},"b":{"a":2}}""") === """{"a": {"a": 1}, "b": {"a": 2}}""")
    // F1 drop of a duplicated key removes it regardless of occurrence (the
    // reference drops AFTER loads, when only the keep-last survivor exists)
    assert(emit("""{"s":1,"s":2,"k":3}""", drop = Seq("s")) === """{"k": 3}""")
    // F2 flag of a duplicated key: flag computed per occurrence, keep-last —
    // {"f": null, "f": 5} loads to {"f": 5}, flagged as present (1)
    assert(emit("""{"f":null,"f":5,"k":0}""", flag = Seq("f")) === """{"f": 1, "k": 0}""")
    assert(emit("""{"f":5,"f":null,"k":0}""", flag = Seq("f")) === """{"f": 0, "k": 0}""")
    // malformedness inside an object that triggered the rewind still rejects
    assert(emit("""{"a":1,"a":2,}""") === null)
    assert(emit("""{"a":1,"a":007}""") === null)
  }

  test("raw C0 controls inside string tokens reject (CPython strict mode)") {
    assert(emit("\"ab\"") === null)
    assert(emit("{\"k\":\"x\ny\"}") === null) // literal newline inside token
    // escaped forms of the same characters remain fine
    assert(emit(s""""a${U}0001b"""") === "\"a" + U + "0001b\"")
    assert(emit(s""""x${"\\"}ny"""") === s""""x${"\\"}ny"""")
  }

  test("PyJsonQuote — json.dumps(bare_string) parity incl. lowercase control hex") {
    def q(s: String): String = PyJsonDumpsImpl.quote(UTF8String.fromString(s)).toString
    assert(q("hello") === "\"hello\"")
    assert(q("r\u00e6v") === "\"r\u00e6v\"")
    assert(q("a\u0007b") === "\"a" + U + "0007b\"")
    assert(q("q\"w\\e\nt") === "\"q\\\"w\\\\e\\nt\"")
    assert(PyJsonDumpsImpl.quote(null) === null)
  }

  test("codegen path: expression runs inside a projection with config applied") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("""{"z":1,"a":{"secret":"s","keep":true},"nil":null}"""),
        org.apache.spark.sql.Row("""{"b":2.5e16}"""),
        org.apache.spark.sql.Row("not json"),
        org.apache.spark.sql.Row(null)),
      StructType(Seq(StructField("raw", StringType))))
    val got = df.select(Conversions.pyJsonCanonical(col("raw"),
        drop = Seq("a.secret"), flag = Seq("nil")).as("m"))
      .collect().map(r => Option(r.getString(0)).orNull)
    assert(got.toSeq === Seq(
      """{"z": 1, "a": {"keep": true}, "nil": 0}""",
      """{"b": 2.5e+16}""",
      null, null))
    // SQL registry surface (no-config variant)
    val sql = spark.sql("""SELECT graft_py_json('{"q":1e-7,"w":[1,{"e":2}]}') AS m""")
      .collect()(0).getString(0)
    assert(sql === """{"q": 1e-07, "w": [1, {"e": 2}]}""")
  }

  test("Envelope.json canonicalMessage opt-in: byte-exact filtered kafka_message") {
    val schema = StructType(Seq(
      StructField("z", LongType), StructField("a",
        StructType(Seq(StructField("keep", StringType), StructField("secret", StringType)))),
      StructField("nil", StringType)))
    val rawJson = s"""{"z":7,"a":{"keep":"r${U}00e6v","secret":"x"},"nil":null}"""
    val raw = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(
        "k".getBytes("UTF-8"), rawJson.getBytes("UTF-8"), "t", 0, 1L, 1000L)),
      MessageSource.schema)
    val cfg = SourceConfig(topic = "t",
      messageFieldsFilter = Seq("a.secret"), flagFieldConfig = Seq("nil"),
      canonicalMessage = true)
    val out = Envelope.json(raw, cfg, schema).select("kafka_message").collect()(0).getString(0)
    // golden from CPython: json.dumps of the filtered dict
    assert(out === "{\"z\": 7, \"a\": {\"keep\": \"r\u00e6v\"}, \"nil\": 0}")
    // default path unchanged: schema-ordered compact to_json
    val legacy = Envelope.json(raw, cfg.copy(canonicalMessage = false), schema)
      .select("kafka_message").collect()(0).getString(0)
    assert(legacy.startsWith("{\"z\":7"))
  }

  test("t7 gate plan contains the native LenientDate expression (wiring guard)") {
    // Round-10 replaced the 45-branch coalesce ladder with the native
    // expression; this assert makes a silent wiring regression (which would
    // restore the ~8 s ladder) fail loudly. The builtin ladder remains
    // test-only as the property oracle.
    val plan = SparkEntry.queries("t7_datetime_no")(spark, "/root/testdata/sf0.001")
      .queryExecution.analyzed.toString
    assert(plan.contains("graft_lenient_date"),
      s"t7 plan no longer uses the native LenientDate expression:\n$plan")
  }
}
