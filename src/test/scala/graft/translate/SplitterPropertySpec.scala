package graft.translate

import org.scalacheck.Prop.propBoolean
import org.scalacheck.{Gen, Prop, Properties}

import graft.translate.StatementSplitter.{Bteq, Sql}

/** ScalaCheck properties for the order-sensitive statement splitter
  * (SURVEY §5 test plan: property-test the splitter against arbitrary
  * script shapes, not just the fixture corpus). */
object SplitterPropertySpec extends Properties("StatementSplitter") {

  private val word: Gen[String] = Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(8))

  private val simpleStmt: Gen[String] = for {
    verb <- Gen.oneOf("SELECT", "INSERT INTO t VALUES", "DELETE FROM")
    w <- word
  } yield s"$verb $w"

  private val commentLine: Gen[String] = word.map(w => s"-- $w")

  private val commentedStmt: Gen[String] =
    Gen.nonEmptyListOf(commentLine).map(_.mkString("\n"))

  property("round trip: every simple statement survives, in order") =
    Prop.forAll(Gen.nonEmptyListOf(simpleStmt)) { stmts =>
      val script = stmts.mkString("", ";\n", ";\n")
      StatementSplitter.split(script, Sql) == stmts
    }

  property("fully-commented statements are dropped in SQL mode") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.either(simpleStmt, commentedStmt))) { mix =>
      val script = mix.map(_.merge).mkString("", ";\n", ";\n")
      val kept = StatementSplitter.split(script, Sql)
      kept == mix.collect { case Left(s) => s }
    }

  property("a commented header does not hide a real statement") =
    Prop.forAll(commentedStmt, simpleStmt) { (header, stmt) =>
      val combined = s"$header\n$stmt"
      StatementSplitter.hasUncommented(combined) &&
        StatementSplitter.split(combined + ";", Sql) == Seq(combined)
    }

  property("no output statement is empty or contains a bare terminator") =
    Prop.forAll(Gen.listOf(Gen.oneOf(simpleStmt, commentedStmt, Gen.const("")))) { parts =>
      val script = parts.mkString(";")
      StatementSplitter.split(script, Sql)
        .forall(s => s.nonEmpty && !s.contains(";"))
    }

  property("BTEQ strips a leading BEGIN but keeps the body") =
    Prop.forAll(simpleStmt) { stmt =>
      // body must not itself contain 'begin' (the reference's split
      // truncates at the next occurrence — documented quirk)
      !stmt.toUpperCase.contains("BEGIN") ==> {
        StatementSplitter.split(s"BEGIN $stmt;", Bteq) == Seq(stmt)
      }
    }

  property("BTEQ skips control statements under SkipAlways") =
    Prop.forAll(Gen.oneOf("END", "EXCEPTION WHEN ERROR THEN x"), simpleStmt) {
      (ctrl, stmt) =>
        StatementSplitter.split(s"$ctrl;$stmt;", Bteq) == Seq(stmt)
    }
}
