package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.formula.{Formula, FormulaAst, FormulaParseException}
import graft.model.Schemas

class FormulaSpec extends SparkSpec {

  private def check(prop: Prop, minTests: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }
  import FormulaAst._

  test("parses precedence and associativity") {
    assert(Formula.parse("$1 + $2 * 3") ===
      BinOp('+', Ref(1), BinOp('*', Ref(2), Num(3))))
    assert(Formula.parse("$1 - $2 - $3") ===
      BinOp('-', BinOp('-', Ref(1), Ref(2)), Ref(3)))
    assert(Formula.parse("($1 + $2) / 2") ===
      BinOp('/', BinOp('+', Ref(1), Ref(2)), Num(2)))
  }

  test("$1 vs $10 do not collide (reference database.py:581-583 bug fixed)") {
    assert(Formula.refs("$10 + $1") === Seq(1, 10))
    assert(Formula.parse("$10") === Ref(10))
  }

  test("unary minus and decimals") {
    assert(Formula.parse("-$2") === BinOp('-', Num(0), Ref(2)))
    assert(Formula.parse("0.5 * $1") === BinOp('*', Num(0.5), Ref(1)))
  }

  test("rejects malformed input") {
    intercept[FormulaParseException](Formula.parse("$"))
    intercept[FormulaParseException](Formula.parse("$1 +"))
    intercept[FormulaParseException](Formula.parse("(1"))
    intercept[FormulaParseException](Formula.parse("$1 $2"))
    intercept[FormulaParseException](Formula.parse("a + b"))
  }

  // -- property: render(ast) reparses to the same tree --------------------
  private val genAst: Gen[FormulaAst] = {
    def gen(depth: Int): Gen[FormulaAst] =
      if (depth <= 0) Gen.oneOf(
        Gen.choose(1, 20).map(Ref(_)),
        Gen.choose(0, 999).map(n => Num(n.toDouble)))
      else Gen.frequency(
        2 -> gen(0),
        3 -> (for {
          op <- Gen.oneOf('+', '-', '*', '/')
          l <- gen(depth - 1); r <- gen(depth - 1)
        } yield BinOp(op, l, r)))
    Gen.choose(0, 4).flatMap(gen)
  }

  private def render(a: FormulaAst): String = a match {
    case Ref(id) => s"$$$id"
    case Num(v) => if (v == v.floor && !v.isInfinite) v.toLong.toString else v.toString
    case BinOp(op, l, r) => s"(${render(l)} $op ${render(r)})"
  }

  test("property: parse(render(ast)) == ast") {
    check(Prop.forAll(genAst)(a => Formula.parse(render(a)) == a))
  }

  // -- property: compiled Column ≡ Formula.eval interpreter ---------------
  // Both raise on division by zero (Spark 4 ANSI / PostgreSQL semantics);
  // a raise on one side must be a raise on the other.
  test("property: compiled Column matches Formula.eval, including /0 raise") {
    val sess = spark
    import sess.implicits._
    val env = (1 to 20).map(i => i -> i * 1.5).toMap
    val df = Seq(env.toSeq.sortBy(_._1).map(_._2)).toDF("vs")
      .select((1 to 20).map(i => element_at($"vs", i).as(s"attr_$i")): _*)
    df.cache().count()
    check(Prop.forAll(genAst) { a =>
      val f = render(a)
      val expected: Either[String, Double] =
        try Right(Formula.eval(f, env))
        catch { case _: ArithmeticException => Left("div0") }
      val got: Either[String, Double] =
        try Right(df.select(Formula.compile(f).as("v")).head().getDouble(0))
        catch {
          case e: Throwable if Option(e.getMessage).exists(_.contains("DIVIDE_BY_ZERO")) =>
            Left("div0")
        }
      (expected, got) match {
        case (Left(x), Left(y)) => x == y
        case (Right(e), Right(g)) => e == g || (e - g).abs < 1e-9 || (e.isNaN && g.isNaN)
        case _ => false
      }
    }, minTests = 30)
  }

  test("backfill computes derived rows with NULL gate (inner semantics)") {
    val sess = spark
    val rows = Seq(
      Row(1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      Row(1, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 20.0),
      // attr 2 missing at 00:01 -> gated out
      Row(2, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2.0))
    val archive = sess.createDataFrame(
      sess.sparkContext.parallelize(rows), Schemas.archive)
    val out = Formula.backfill(archive, "$1 + $2", derivedId = 7)
      .orderBy("timestamp").collect()
    assert(out.length === 1)
    assert(out(0).getInt(0) === 7)
    assert(out(0).getDouble(2) === 12.0)
  }

  test("validateRefs raises on missing attribute ids") {
    val sess = spark
    import sess.implicits._
    val attrs = Seq((1, 1, "a"), (1, 2, "b")).toDF("element_id", "attribute_id", "name")
    Formula.validateRefs("$1 + $2", attrs) // ok
    val e = intercept[FormulaParseException](Formula.validateRefs("$1 + $9", attrs))
    assert(e.getMessage.contains("9"))
  }
}
