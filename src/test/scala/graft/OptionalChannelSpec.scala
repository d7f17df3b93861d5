package graft

import graft.cel.Cel
import graft.streaming.Channels

class OptionalChannelSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private val NOW = 1704067200000000L
  private def run(p: String, state: String = "null") = Cel.evalOnce(p, state, NOW)

  test("optional types: .? traversal, orValue, hasValue (testdata/optional_types.txt shapes)") {
    val state = """{"a":{"b":1}}"""
    assert(run("state.?a.?b.orValue(99)", state) == "1")
    assert(run("state.?a.?missing.orValue(99)", state) == "99")
    assert(run("state.?missing.b.orValue(99)", state) == "99")
    assert(run("state.?a.hasValue()", state) == "true")
    assert(run("state.?zz.hasValue()", state) == "false")
    assert(run("optional.of(5).orValue(1)") == "5")
    assert(run("optional.none().orValue(1)") == "1")
    assert(run("is_error(optional.none().value())") == "true")
  }

  test("channels: send_to/drain/close (reference lib/send.go analog)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Channels.sendTo("test-ch", df)
    val got = Channels.drain("test-ch")
    assert(got.toSet == Set("""{"id":1,"v":"a"}""", """{"id":2,"v":"b"}"""))
    assert(Channels.poll("test-ch").isEmpty)
    Channels.sendTo("test-ch", df.limit(1))
    Channels.close("test-ch")
    assert(Channels.drain("test-ch").isEmpty)
  }

  test("channels: CEL send_to/close bindings (lib/send.go:149-197)") {
    val out = graft.cel.Cel.evalOnce(
      """{"sent": {"k": 1}.send_to("cel-ch"), "closed": "x".close("cel-ch")}""",
      "null", 1704067200000000L)
    assert(out == """{"closed":true,"sent":{"k":1}}""")
    // double close is an error (drain would auto-recreate, so check first)
    assert(graft.cel.Cel.evalOnce("""try("x".close("cel-ch"))""",
      "null", 1704067200000000L) == "\"no channel cel-ch\"")
    // channel was closed: nothing left to drain
    assert(Channels.drain("cel-ch").isEmpty)
    // send_to leaves the value on the channel for the driver to drain
    graft.cel.Cel.evalOnce(""""payload".send_to("cel-ch2")""", "null", 1704067200000000L)
    assert(Channels.drain("cel-ch2") == Seq("\"payload\""))
  }

  test("channels: send_refval_to is send_to in the rendered-value model (send.go:148-177)") {
    // the reference's two sends differ only in whether the value crosses
    // the channel as a raw ref.Val or converted to a native Go value;
    // every V here is already rendered, so the observable behavior is
    // identical: value returned unchanged, one message on the channel
    val out = graft.cel.Cel.evalOnce(
      """{"a": {"k": 1}.send_refval_to("rv-ch"), "b": send_refval_to(2, "rv-ch")}""",
      "null", 1704067200000000L)
    assert(out == """{"a":{"k":1},"b":2}""")
    assert(Channels.drain("rv-ch") == Seq("""{"k":1}""", "2"))
    // NonStrict like send_to: error values pass through in-band
    assert(graft.cel.Cel.evalOnce(
      """try(state.nope.send_refval_to("rv-ch"))""",
      "{}", 1704067200000000L) == "\"no such key: nope\"")
  }

  test("channels: streaming foreachBatch path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ch-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/region.parquet"),
      dir.resolve("region.parquet"))
    val stream = spark.readStream
      .schema(spark.read.parquet(dir.toString).schema)
      .parquet(dir.toString)
    val q = Channels.sendToStream("stream-ch", stream).start()
    try q.processAllAvailable() finally q.stop()
    val got = Channels.drain("stream-ch")
    assert(got.size == spark.read.parquet(dir.toString).count())
  }
}
