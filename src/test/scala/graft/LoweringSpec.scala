package graft

import graft.cel.Cel
import org.apache.spark.sql.functions._

/** Parity harness for the CEL → Catalyst lowering: every lowerable
  * program must produce byte-identical rendered output to the
  * interpreter on real data, and the programs the subset can't host
  * must decline (None) rather than mis-lower.
  */
class LoweringSpec extends SparkSpec {

  private val NOW = 1704067200000000L

  // programs inside the lowerable subset, exercised over events.props
  private val lowerable = Seq(
    "'hello world'",
    "42",
    "true",
    "null",
    "3.5",
    "state",
    "state.k",
    """{"greeting":"hello world"}""",
    """{"a":{"b":{"c":{"d":{"e":"hello world"}}}}}""",
    """{"a":{"b":{"c":{"d":{"e":"hello world"}}}}}.encode_json()""",
    """{"a":{"b":{"c":{"d":{"e":"hello world"}}}}}.collate('a.b.c.d.e')""",
    """{"state": state}.collate('state.k')""",
    "state.encode_json()",
    """[1, "two", {"three": 3}]""",
    """[[1], [2, 3]].flatten()""",
    """{"b": 2, "a": 1}.keys()""",
    """{"b": 2, "a": 1}.values()""",
    """[3, 1, 2].min()""",
    """[3, 1, 2].max()""",
    """["a","b"].zip([1, 2])""",
    """{"a": 1, "b": 2}.drop("a")""",
    """{"a": 1, "b": {"c": 2}}.drop(["b.c"])""",
    """{"a": [], "b": 1, "c": {}}.drop_empty()""",
    """{"a": 1}.with({"b": 2})""",
    """{"a": 1}.with_update({"a": 9, "b": 2})""",
    """{"a": 1}.with_replace({"a": 9, "b": 2})""",
    """state.as(s, {"doc": s, "k": s.k})""",
    // `as` evaluates the target strictly: a target error propagates even
    // when the body never references the binding (VOps.asSeq)
    "state.nope.as(s, 1)",
    "(1 / 0).as(x, 'ok')",
    "state.k.as(x, 2)",
    // error paths: missing key, bad index — in-band error values
    "state.nope",
    "state.k.nope",
    "[1, 2][5]",
    """{"a": 1}["b"]""",
    """[1, 2][1]""",
    // operators (VOps dispatches to the interpreter's own op implementations)
    "1 + 2 * 3",
    "state.k + 1",
    "state.k == 69",
    "state.k >= 50 && state.k < 100",
    "'b' in ['a', 'b']",
    "'k' in state",
    "1 / 0",
    "7 % 3 + 1.5",
    "true || (1 / 0 == 1)",
    "(1 / 0 == 1) || true",
    "false && (1 / 0 == 1)",
    "!(state.k == 69)",
    "-state.k",
    "state.k > 50 ? 'big' : 'small'",
    "1 ? 2 : 3",
    "size('héllo')",
    "size(state)",
    "[1, 2, 3].size()",
    "state.k == 69 ? state : {\"other\": true}",
    // comprehensions: bodies run inside transform(), folds in the kernel
    "[1, 2, 3].map(x, x * 10)",
    "[1, 2, 3].map(x, x > 1, x * 10)",
    "[1, 2, 3].filter(x, x > 1)",
    "[1, 2, 3].all(x, x > 0)",
    "[1, 2, 3].exists(x, x == 2)",
    "[1, 2, 3].exists_one(x, x == 2)",
    """{"b": 2, "a": 1}.map(k, k)""",
    "[1, 0, 2].map(x, 10 / x)",
    "[1, 0, 2].filter(x, 10 / x > 1)",
    "[false, true].all(x, x)",
    "[1, 2].map(x, [x, x]).flatten()",
    "state.k.map(x, x)",
    // strings/json methods through the generic strict-method bridge
    "'Hello World'.to_lower()",
    "'hello world'.to_title()",
    "'  x  '.trim_space()",
    "'xaax'.trim('x')",
    "'hello'.has_prefix('he')",
    "'a,b,c'.split(',')",
    "'a,b,c'.split(',').join('|')",
    "'héllo'.substring(1, 3)",
    "'mississippi'.count('ss')",
    "'mississippi'.index('ss')",
    "'one two  three'.fields()",
    "'ab'.repeat(3)",
    "'aAbB'.equal_fold('AaBb')",
    """'{"b":1,"a":2}'.decode_json()""",
    """'{"a":1} 2 "x"'.decode_json_stream()""",
    "'abc'.substring(5, 9)", // strict bounds -> in-band error
    "state.k.to_lower()",    // error: to_lower on an int
    // casts over the JSON universe
    "int('42') + 1",
    "int(3.9)",
    "int('nope')",
    "double('1.25') + 1.5",
    "string(state.k)",
    "string(12.5)",
    "string(true)",
    "bool('true') && true",
    "bool(1)",
    "dyn(state)",
    // NonStrict error handlers + has()
    "try(1 / 0)",
    "try(1 / 0, 'err')",
    "try(state.k)",
    "is_error(1 / 0)",
    "is_error(state.k)",
    "has(state.k)",
    "has(state.nope)",
    // typed intermediates flow as V objects: bytes/timestamp/duration
    // literals and producers lower directly (no fused special cases)
    "b\"abc\"",
    "timestamp('2024-01-01T00:00:00Z')",
    "timestamp('2024-01-01T00:00:00Z') + duration('90s')",
    "duration('1m30s')",
    "'2024-01-01'.parse_time('DateOnly')",
    "'x'.md5()",
    "uint('7')",
    "int(duration('1s'))",
    "hmac('data', 'sha256', 'key').hex()",
    "'uryyb'.mime('text/rot13')",
    "'https://u:p@h.example:8080/p?q=1#f'.parse_url()",
    """{"b": ["2"], "a": ["1", "3"]}.format_query()""",
    "'GET'.request('https://example.com').basic_authentication('u', 'p')",
    "[10, 20, 30][state.k % 3]",
    // time ops (typed VTimestamp intermediates)
    "'2024-03-05T06:07:08Z'.parse_time('RFC3339').format('Kitchen')",
    "'2024-03-05'.parse_time(['RFC3339', 'DateOnly']).format('RFC3339')",
    "'not a date'.parse_time('RFC3339').format('Kitchen')", // in-band error
    "format(parse_time('2024-03-05', 'DateOnly'), 'DateTime')",
    "now.format('RFC3339')",
    "now.format(time_layout.Kitchen)",
    "'2024-03-05'.parse_time(time_layout.DateOnly).format('RFC3339')",
    "time_layout.RFC1123",
    "state.k.parse_time('RFC3339').format('Kitchen')", // error: target int
    // fused digest+encode pairs (digestEncode) and bare encodes
    "'hello world'.md5().hex()",
    "'hello world'.sha256().base64()",
    "'hello'.sha1().base64_raw()",
    "hex(md5('abc'))",
    "state.encode_json().md5().hex()",
    "state.k.md5().hex()", // error: digest of an int
    "'hello'.hex()",
    "'hello'.base64()",
    // fused optional chains (VOps select chains)
    "state.?k.orValue(-1)",
    "state.?missing.orValue('d')",
    "state.?missing.hasValue()",
    "state.?k.hasValue()",
    "state.?k.value()",
    "state.?missing.value()",          // error: none dereference
    "state.?missing.?deeper.orValue(1)",
    "state.nope.?x.orValue(1)",        // strict select error propagates
    "optional.of(42).orValue(0)",
    "optional.none().orValue('x')",
    "optional.none().hasValue()",
    "optional.of(state.k).value()",
    "state.k.orValue(9)",              // orValue on non-optional passes through
    "5.orValue(1 / 0)",                // strict default: error propagates
    // optMap/optFlatMap parse-time expansions lower through the existing
    // as/ternary/optional surface
    "state.?k.optMap(x, x + 1).orValue(-1)",
    "state.?missing.optMap(x, x + 1).orValue(-1)",
    "optional.of(5).optMap(x, x * 2).value()",
    "state.?k.optFlatMap(x, optional.of(x * 10)).orValue(-1)",
    "state.?missing.optFlatMap(x, optional.of(x)).hasValue()",
    "optional.of(1).optFlatMap(x, optional.none()).orValue('d')",
    "state.nope.optMap(x, x)",         // strict target error propagates
    // optional index `[?k]`, or(), ofNonZeroValue (cel-go OptionalTypes)
    "[1, 2, 3][?1].orValue(0)",
    "[1, 2, 3][?9].orValue(-1)",
    "[1, 2, 3][?(0 - 1)].hasValue()",
    """{"a": 1}[?"a"].orValue(0)""",
    """{"a": 1}[?"z"].hasValue()""",
    "state[?'k'].orValue(-1)",
    "state[?'nope'].orValue(-1)",
    "[[1, 2]][?0][?1].orValue(-1)",    // chaining through an optional target
    "state.?k[?0].orValue(-1)",        // error: optional-index into an int
    "state.?k.or(optional.of(5)).orValue(-1)",
    "state.?nope.or(optional.of(5)).orValue(-1)",
    "state.?nope.or(state.?k).orValue(-1)",
    "optional.none().or(optional.none()).hasValue()",
    "state.k.or(optional.of(1))",      // error: or on a non-optional
    "optional.ofNonZeroValue(0).hasValue()",
    "optional.ofNonZeroValue(0u).hasValue()",
    "optional.ofNonZeroValue(0.0).hasValue()",
    "optional.ofNonZeroValue('').hasValue()",
    "optional.ofNonZeroValue(b'').hasValue()",
    "optional.ofNonZeroValue(false).hasValue()",
    "optional.ofNonZeroValue([]).hasValue()",
    "optional.ofNonZeroValue({}).hasValue()",
    "optional.ofNonZeroValue(null).hasValue()",
    "optional.ofNonZeroValue(duration('0s')).hasValue()",
    "optional.ofNonZeroValue(state.k).orValue(-1)",
    "optional.ofNonZeroValue('x').value()",
    // cel-go STANDARD env: string predicates, matches, time accessors
    "'hello'.contains('ell')",
    "'hello'.startsWith('he')",
    "'hello'.endsWith('lo')",
    "'hello'.matches('h.*o')",
    "matches('hello', '^x')",
    "'abc'.matches('[')",              // error: bad pattern, in-band
    "string(state.k).matches('^[0-9]+$')",
    "timestamp(1500000000).getFullYear()",
    "timestamp(1500000000).getMonth()",
    "timestamp(1500000000).getDayOfYear()",
    "timestamp(1500000000).getDayOfMonth()",
    "timestamp(1500000000).getDate()",
    "timestamp(1500000000).getDayOfWeek()",
    "timestamp(1500000000).getHours()",
    "timestamp(1500000000).getHours('America/New_York')",
    "timestamp(1500000000).getMinutes('+05:30')",
    "timestamp(1500000000).getSeconds()",
    "timestamp(1500000000).getMilliseconds()",
    "timestamp(1500000000 + state.k).getHours('bogus/zone')", // error in-band
    "duration('90m').getHours()",
    "duration('-90m').getMinutes()",
    "duration('90m').getSeconds()",
    "duration('1s').getMilliseconds()",
    "timestamp(1500000000 + state.k * 3600).getHours()",
    "state.k.getHours()",              // error: accessor on an int
    // type() and the type-identifier bindings flow through both tiers
    "type(state.k) == int",
    "type(state) == map ? 'doc' : 'other'",
    "[1, 'a', true].map(x, type(x))",
    "type(state.k)",
    // int-keyed maps: typed keys survive keys()/values()/iteration in
    // BOTH tiers (VOps.items must use typedKeys — numeric order, VInt)
    """{2: "b", 10: "a", 1: "c"}.keys()""",
    """{2: "b", 10: "a"}.values()""",
    """{2: "b", 10: "a", 1: "c"}.map(k, k)""",
    """{1: "a", 2: "b"}.map(k, k > 1, k * 10)""",
    """{1: "a"} == {"1": "a"}""",      // key type is part of map equality
    """{1: "a", 2: "b"}.exists(k, k == 2)""",
    // duplicate keys are in-band errors in BOTH tiers (Eval.mapFromPairs
    // is the one shared core: interpreter MapLit, VOps.mapOf, Compile)
    """{1: "a", 1: "b"}""",
    """{"a": 1, "a": 2}""",
    """{1: "a", 1u: "b"}""",
    """{1: "a", "1": "b"}""",
    """try({"k": 1, "k": 2})""",
    // the wide-program bench shape: must stay lowerable so Bench's
    // auto_wide_chain_state (.get, no fallback) keeps measuring the tier
    Bench.wideChain)

  // constructs the subset must DECLINE (fall back to the interpreter):
  // env-dependent (now without a fixed nowMicros, file/dir), side-effecting
  // (send_to/close, executing HTTP, debug), or non-deterministic (uuid)
  private val notLowerable = Seq(
    "now",
    "now.format('RFC3339')",
    "uuid()",
    "file('x.txt')",
    "dir('.')",
    "debug('tag', 1)",
    "state.send_to('ch')",
    "'ch'.close()",
    "'https://example.com'.get()",
    "{\"URL\": \"https://example.com\"}.do_request()",
    "state.rate_limit('okta', duration('1m'))")

  test("lowered output is byte-identical to the interpreter on events") {
    val props = Tables(spark, sf).events.select(col("props")).limit(200).cache()
    lowerable.foreach { program =>
      val lowered = Cel.lower(program, col("props"), nowMicros = Some(NOW))
      assert(lowered.isDefined, s"expected lowerable: $program")
      val both = props.select(
        lowered.get.as("low"),
        Cel(program, col("props"), nowMicros = NOW).as("interp"))
      val diff = both.filter(col("low") =!= col("interp") ||
        col("low").isNull =!= col("interp").isNull)
      val bad = diff.take(1)
      assert(bad.isEmpty,
        s"$program diverged: lowered=${bad.headOption.map(_.get(0))} interpreted=${bad.headOption.map(_.get(1))}")
    }
  }

  test("NULL state column: lowered containers null out like the interpreter") {
    // CreateArray does not propagate element nulls, so listOf/mapOf must
    // null the whole result themselves — matching the interpreter's
    // null-in/null-out row behavior (and not crashing renderV)
    val df = spark.range(1).select(lit(null).cast("string").as("props"))
    Seq("""{"doc": state}""", "[state]", """[1, state, "x"]""",
      "state.k", "state",
      // comprehensions whose body/pred nulls out element-wise under a
      // NULL state (finish's null guards; a literal target keeps the
      // comprehension itself alive)
      "[1, 2].map(i, state.k + i)",
      "[1, 2].map(i, i > state.k, i)",
      "[1, 2].filter(i, i > state.k)",
      "[1, 2].all(i, i > state.k)",
      "[1, 2].exists(i, i > state.k)",
      "[1, 2].exists_one(i, i > state.k)").foreach { p =>
      val both = df.select(
        Cel.lower(p, col("props"), nowMicros = Some(NOW)).get.as("low"),
        Cel(p, col("props"), nowMicros = NOW).as("interp"))
      val r = both.take(1).head
      assert(r.isNullAt(0) && r.isNullAt(1), s"$p: $r")
    }
  }

  test("regexp methods lower with a plan-time registry") {
    val re = Map("word" -> "([a-z]+)", "digits" -> "[0-9]+")
    val programs = Seq(
      "'food fight'.re_match('word')",
      "'a1b22c333'.re_find_all('digits')",
      "'food'.re_find_submatch('word')",
      "'food fight'.re_replace_all('word', 'X')",
      "state.encode_json().re_find('digits')")
    val props = Tables(spark, sf).events.select(col("props")).limit(100)
    programs.foreach { program =>
      val lowered = Cel.lower(program, col("props"), re)
      assert(lowered.isDefined, s"expected lowerable: $program")
      val both = props.select(lowered.get.as("low"),
        Cel(program, col("props"), re, NOW).as("interp"))
      assert(both.filter(col("low") =!= col("interp")).take(1).isEmpty, program)
    }
    // unknown pattern name -> decline (interpreter reports the error)
    assert(Cel.lower("'x'.re_match('nope')", col("props"), re).isEmpty)
  }

  test("out-of-subset programs decline to lower") {
    notLowerable.foreach { p =>
      assert(Cel.lower(p, col("props")).isEmpty, s"must not lower: $p")
    }
  }

  test("auto picks the lowered plan for lowerable programs") {
    val c = Cel.auto("state.k", col("props"), NOW)
    val plan = Tables(spark, sf).events.select(c.as("x"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("VOps.select"), s"expected lowered kernel in plan:\n$plan")
    assert(!plan.contains("CelEval"), "auto should not fall back for state.k")
  }

  /** Every production program that is SUPPOSED to run the lowered tier:
    * the Bench auto shapes (Cel.auto — a regression there silently
    * re-points the benchmark at the interpreter), the lowered-tier
    * inventory gate queries (q58/q76/q77/q79/q80/q81), and this spec's
    * own lowerable corpus. */
  private def tierTable: Seq[(String, String)] =
    (Bench.autoShapePrograms ++
      graft.queries.CelFunctions.loweredGatePrograms.toSeq.sortBy(_._1) ++
      lowerable.zipWithIndex.map { case (p, i) => s"corpus_$i" -> p })
      .map { case (name, p) =>
        name -> Cel.tierOf(Cel.auto(p, col("props"), NOW)) }

  test("tier coverage gate: the lowered set cannot silently shrink") {
    // Cel.auto hides a lowering regression by falling back to the
    // interpreter with identical output — correctness stays green, the
    // codegen tier silently stops being tested or benchmarked. This
    // gate EMITS which tier each production program actually ran and
    // fails if any expected-lowered program reports "interpreted".
    val fallen = tierTable.filter(_._2 != "lowered")
    info(s"${tierTable.size} gate programs, ${fallen.size} interpreted")
    assert(fallen.isEmpty,
      s"programs fell back to the interpreter: ${fallen.map(_._1)}")
  }

  test("a deliberately broken lowering rule trips the coverage gate") {
    // simulate the failure mode end-to-end: with lowering broken,
    // Cel.auto still returns a working (interpreter) column — only the
    // tier gate can notice. It must.
    graft.cel.Lowering.breakForTest = true
    try {
      val table = tierTable
      assert(table.nonEmpty && table.forall(_._2 == "interpreted"),
        "breakForTest should force every program onto the interpreter")
      // and the broken tier still computes the right answer (auto's
      // fallback is semantics-preserving — that is WHY it is silent)
      val c = Cel.auto("state.k + 1", col("props"), NOW)
      assert(Cel.tierOf(c) == "interpreted")
      val ok = Tables(spark, sf).events.orderBy(col("event_id")).limit(1)
        .select(c.cast("string").as("x")).head().getString(0)
      assert(ok.nonEmpty)
    } finally graft.cel.Lowering.breakForTest = false
    // gate restored: the same table must be all-lowered again
    assert(tierTable.forall(_._2 == "lowered"))
  }
}
