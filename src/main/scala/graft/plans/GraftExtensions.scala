package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{And, BitwiseAnd, Cast, Concat, CreateNamedStruct, EqualTo, Expression, ExpressionInfo, GreaterThan, GreaterThanOrEqual, If, IsNull, LambdaFunction, LessThan, LessThanOrEqual, Literal, Not, Or, RaiseError, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StringType}

/** Session-extension entry point (SURVEY §7.3): registers the engine's
  * native expressions into the SQL function registry so `spark.sql`
  * users get them too. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or programmatically via `withExtensions`.
  *
  * Besides the native codegen'd expressions, three of the LLM-pipeline
  * primitives are registered as composed SQL functions so spark.sql
  * users get the exact Scala-API semantics: `chunk_spans` (the
  * [[graft.operators.Chunker]] window math as an array of structs —
  * explode with `inline(...)` for the table form), `mixture_keep`
  * (the [[graft.operators.Sampling.weightedMixture]] per-row keep
  * decision), and `bloom_might_contain` (the
  * [[graft.operators.BloomContamination]] per-gram membership probe
  * against a filter-word array — the corpus-side decontamination
  * pipeline in pure SQL: `word_shingles` → explode →
  * `bloom_might_contain` filter → count per doc), and `bpe_merge`
  * (the [[graft.operators.BpeTrainer.applyMerge]] leftmost-greedy
  * fold, so a learned merge list applies from SQL by chaining
  * `bpe_merge(bpe_merge(syms, 'a', 'b'), 'ab', 'c')`). All are emitted as
  * the same parser-shaped trees (`UnresolvedFunction` + lambda
  * variables) SQL text would produce, so the analyzer resolves them
  * exactly like handwritten SQL; value-parity with the Scala APIs is
  * pinned by SqlParitySpec.
  *
  * Deliberately NOT registered: [[graft.operators.SequencePacker]].
  * Its contract is a whole-relation transform — a two-phase
  * distributed prefix sum (per-block running-sum window, block-offset
  * window over the block totals, broadcast join back) — not a row-local
  * scalar, so no parser-shaped expression tree can express it; a
  * scalar `pack_bin` would only wrap the trivial final
  * `(cum - weight) div budget` while hiding the part that matters (the
  * plan shape that avoids a single-task global window at 100 TB). SQL
  * users get the real thing by materializing `SequencePacker.pack`'s
  * output as a view.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Foldable-int argument (the same contract as word_shingles' n). */
  private def intArg(e: Expression, fn: String, name: String): Int = e match {
    case x if x.foldable && x.dataType == org.apache.spark.sql.types.IntegerType =>
      x.eval().asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$fn $name must be an integer literal, got $other")
  }

  /** Parser-style builtin call: resolved by the analyzer's normal
    * function-resolution pass, like the identical tree from SQL text. */
  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args, isDistinct = false)

  /** One-variable SQL lambda `name -> body(name)`. */
  private def lam(name: String)(body: Expression => Expression): LambdaFunction = {
    val v = UnresolvedNamedLambdaVariable(Seq(name))
    LambdaFunction(body(v), Seq(v))
  }

  /** Two-variable SQL lambda `(n1, n2) -> body(n1, n2)` (aggregate's
    * merge function). */
  private def lam2(n1: String, n2: String)(
      body: (Expression, Expression) => Expression): LambdaFunction = {
    val v1 = UnresolvedNamedLambdaVariable(Seq(n1))
    val v2 = UnresolvedNamedLambdaVariable(Seq(n2))
    LambdaFunction(body(v1, v2), Seq(v1, v2))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => VectorDotRewrite)
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vector_dot(a, b) takes two arguments")
        VectorDot(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("hex_hash60"),
      new ExpressionInfo(classOf[HexHash60].getName, "hex_hash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "hex_hash60(s) takes one argument")
        HexHash60(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("hex_hash64"),
      new ExpressionInfo(classOf[HexHash64].getName, "hex_hash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "hex_hash64(s) takes one argument")
        HexHash64(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("hex_hash60_pair"),
      new ExpressionInfo(classOf[HexHash60Pair].getName, "hex_hash60_pair"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "hex_hash60_pair(s) takes one argument")
        HexHash60Pair(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(s, n) takes two arguments")
        val n = args(1) match {
          case e if e.foldable &&
              e.dataType == org.apache.spark.sql.types.IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"word_shingles n must be an integer literal, got $other")
        }
        WordShingles(args.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("chunk_spans"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "chunk_spans"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "chunk_spans(text, chunk_size, overlap) takes three arguments")
        val chunkSize = intArg(args(1), "chunk_spans", "chunk_size")
        val overlap = intArg(args(2), "chunk_spans", "overlap")
        require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
          s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
        val step = chunkSize - overlap
        // same shapes as Chunker.chunk: tokenize once (the array is the
        // lambda variable, so the regex split runs once per row), then
        // n_chunks = 1 + max(0, n - chunkSize + step - 1) div step,
        // chunk i = tokens [i·step, i·step + chunkSize)
        val wordsE = fn("split",
          fn("trim", fn("lower", fn("coalesce", args.head, Literal("")))),
          Literal("\\s+"))
        val spans = fn("element_at",
          fn("transform", fn("array", wordsE), lam("gw") { w =>
            def n = Cast(fn("size", w), LongType)
            val nChunks = fn("+", Literal(1L),
              fn("div",
                fn("+",
                  fn("greatest", Literal(0L), fn("-", n, Literal(chunkSize.toLong))),
                  Literal(step - 1L)),
                Literal(step.toLong)))
            fn("transform",
              fn("sequence", Literal(0L), fn("-", nChunks, Literal(1L))),
              lam("gi") { i =>
                CreateNamedStruct(Seq(
                  Literal("chunk_idx"), Cast(i, IntegerType),
                  Literal("chunk_text"), fn("concat_ws", Literal(" "),
                    fn("slice", w,
                      Cast(fn("+", fn("*", i, Literal(step.toLong)), Literal(1L)),
                        IntegerType),
                      Literal(chunkSize))),
                  Literal("n_tokens"), Cast(
                    fn("least", Literal(chunkSize.toLong),
                      fn("-", n, fn("*", i, Literal(step.toLong)))),
                    IntegerType)))
              })
          }),
          Literal(1))
        spans
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bloom_might_contain(bits, gram) takes two arguments")
        val bits = args.head
        // same probe family as BloomContamination.flagged: one md5 per
        // gram (hex_hash60_pair), positions h1 + i·(h2 div 32) mod m,
        // 32 bits per stored word. m derives from the array (size·32) —
        // pass the words produced by BloomContamination.buildBits (a
        // power-of-two word count; any other source changes fpp only,
        // never correctness of the no-false-negative guarantee).
        // The transform-over-one-element-array wrapper binds the hash
        // pair to a lambda variable so the md5 runs once per gram, not
        // once per probe.
        val m = Cast(fn("*", fn("size", bits), Literal(32)), LongType)
        fn("element_at",
          fn("transform", fn("array", HexHash60Pair(args(1))), lam("bmc_hp") { hp =>
            val h1 = fn("element_at", hp, Literal(1))
            val h2d = fn("div", fn("element_at", hp, Literal(2)), Literal(32L))
            (0 until graft.operators.BloomContamination.HashK).map { i =>
              val pos = fn("%", fn("+", h1, fn("*", Literal(i.toLong), h2d)), m)
              val word = fn("element_at", bits,
                Cast(fn("+", fn("shiftright", pos, Literal(5)), Literal(1L)),
                  IntegerType))
              val mask = fn("shiftleft", Literal(1L),
                Cast(fn("%", pos, Literal(32L)), IntegerType))
              Not(EqualTo(BitwiseAnd(Cast(word, LongType), mask), Literal(0L)))
            }.reduce[Expression](And(_, _))
          }),
          Literal(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "winnow_fps"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "winnow_fps(text, k, w) takes three arguments")
        val k = intArg(args(1), "winnow_fps", "k")
        val w = intArg(args(2), "winnow_fps", "w")
        require(k >= 1 && w >= 1, s"winnow_fps: need k >= 1 and w >= 1, got k=$k w=$w")
        // same trees as Winnowing.fingerprintSet: tokenize → k-gram →
        // hex_hash60 → windowed min → distinct, each array bound once
        // as a lambda variable (null text flows to an empty result
        // through size(null)'s null condition, like the Column API)
        val wordsE = fn("split",
          fn("trim", fn("lower", args.head)), Literal("\\s+"))
        val gramsE = fn("element_at",
          fn("transform", fn("array", wordsE), lam("wf_w") { wv =>
            If(GreaterThanOrEqual(fn("size", wv), Literal(k)),
              fn("transform",
                fn("sequence", Literal(0), fn("-", fn("size", wv), Literal(k))),
                lam("wf_i") { i =>
                  fn("concat_ws", (Literal(" ") +: (0 until k).map(j =>
                    fn("element_at", wv, fn("+", i, Literal(j + 1))))): _*)
                }),
              Cast(fn("array"), ArrayType(StringType)))
          }),
          Literal(1))
        val hashesE = fn("transform", gramsE, lam("wf_g") { g => HexHash60(g) })
        fn("element_at",
          fn("transform", fn("array", hashesE), lam("wf_hs") { hs =>
            If(GreaterThanOrEqual(fn("size", hs), Literal(w)),
              fn("array_distinct", fn("transform",
                fn("sequence", Literal(1),
                  fn("+", fn("-", fn("size", hs), Literal(w)), Literal(1))),
                lam("wf_j") { j =>
                  fn("array_min", fn("slice", hs, j, Literal(w))) })),
              If(GreaterThan(fn("size", hs), Literal(0)),
                fn("array", fn("array_min", hs)),
                Cast(fn("array"), ArrayType(LongType))))
          }),
          Literal(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("cdc_starts"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "cdc_starts"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cdc_starts(text, divisor) takes two arguments")
        val divisor = intArg(args(1), "cdc_starts", "divisor")
        require(divisor >= 2, s"cdc_starts: need divisor >= 2, got $divisor")
        // Chunker.contentDefined's boundary rule as a scalar: 1-based
        // chunk-start token positions (position 1 always; p >= 2 iff
        // hex_hash60(token_p) % divisor == 0). Null text == empty text
        // == single start [1], the every-row-survives contract.
        val wordsE = fn("split",
          fn("trim", fn("lower", fn("coalesce", args.head, Literal("")))),
          Literal("\\s+"))
        fn("element_at",
          fn("transform", fn("array", wordsE), lam("cdc_w") { wv =>
            fn("concat",
              fn("array", Literal(1)),
              If(GreaterThanOrEqual(fn("size", wv), Literal(2)),
                fn("filter", fn("sequence", Literal(2), fn("size", wv)),
                  lam("cdc_p") { p =>
                    EqualTo(
                      fn("%", HexHash60(fn("element_at", wv, p)),
                        Literal(divisor.toLong)),
                      Literal(0L))
                  }),
                Cast(fn("array"), ArrayType(IntegerType))))
          }),
          Literal(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("mixture_keep"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "mixture_keep"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "mixture_keep(seed, id, rate) takes three arguments")
        // mirror Sampling.weightedMixture's rate bounds. Foldable rates
        // (a literal) fail at plan time like the Scala require; the
        // primary real-world form is NON-foldable (a CASE over the
        // stratum column, a joined weights column), so the same check
        // also runs per row — past 1.0 the 2⁶⁰ threshold saturates and
        // a typo'd rate would otherwise silently keep every row. A null
        // rate stays null (row filtered), matching the plain arithmetic.
        val rate = Cast(args(2), DoubleType)
        if (args(2).foldable) {
          val r = rate.eval()
          if (r != null) {
            val d = r.asInstanceOf[Double]
            require(d >= 0.0 && d <= 1.0,
              s"mixture_keep: rates must be in [0, 1], got $d")
          }
        }
        val rateOk = Or(IsNull(rate), And(
          GreaterThanOrEqual(rate, Literal(0.0)), LessThanOrEqual(rate, Literal(1.0))))
        val checkedRate = If(rateOk, rate, Cast(new RaiseError(Concat(Seq(
          Literal("mixture_keep: rates must be in [0, 1], got "),
          Cast(rate, StringType)))), DoubleType))
        // identical hash input and threshold arithmetic to
        // Sampling.weightedMixture: hash("<seed>:<id>") < rate · 2⁶⁰
        // (double multiply then truncate, matching the Scala .toLong)
        val h = HexHash60(Concat(Seq(
          Cast(args(0), StringType), Literal(":"), Cast(args(1), StringType))))
        val thr = Cast(
          fn("*", checkedRate, Literal((1L << 60).toDouble)),
          LongType)
        LessThan(h, thr)
      }))
    ext.injectFunction((
      FunctionIdentifier("bpe_merge"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "bpe_merge"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "bpe_merge(syms, a, b) takes three arguments")
        def strArg(e: Expression, name: String): String = e match {
          case x if x.foldable && x.dataType == StringType &&
              x.eval() != null => x.eval().toString
          case other => throw new IllegalArgumentException(
            s"bpe_merge $name must be a non-null string literal, got $other")
        }
        val a = strArg(args(1), "a")
        val b = strArg(args(2), "b")
        // BpeTrainer.applyMerge's leftmost-greedy fold as the same
        // parser-shaped tree: append each symbol, but when the
        // accumulator ends with `a` and the symbol is `b`, replace the
        // tail with the merged symbol
        fn("aggregate", args.head,
          Cast(fn("array"), ArrayType(StringType)),
          lam2("bpe_acc", "bpe_x") { (acc, x) =>
            If(
              And(And(
                GreaterThan(fn("size", acc), Literal(0)),
                EqualTo(fn("element_at", acc, Literal(-1)), Literal(a))),
                EqualTo(x, Literal(b))),
              fn("concat",
                fn("slice", acc, Literal(1), fn("-", fn("size", acc), Literal(1))),
                fn("array", Literal(a + b))),
              fn("concat", acc, fn("array", x)))
          })
      }))
  }
}
