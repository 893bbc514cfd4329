package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.TextNative
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM unit tests for the native text kernels (no Spark session). */
class TextNativeUnitSpec extends AnyFunSuite {

  private def ngrams(s: String, n: Int): Seq[String] = {
    val a = TextNative.wordNgrams(UTF8String.fromString(s), n)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  test("basic trigram") {
    assert(ngrams("a b c d", 3) == Seq("a b c", "b c d"))
  }
  test("multi-space and edges") {
    assert(ngrams("  a   bb  c ", 2) == Seq("a bb", "bb c"))
    assert(ngrams("", 3).isEmpty)
    assert(ngrams("a b", 3).isEmpty)
    assert(ngrams("xyz", 1) == Seq("xyz"))
  }
  test("longer tokens") {
    assert(ngrams("alpha beta gamma delta", 3) ==
      Seq("alpha beta gamma", "beta gamma delta"))
  }
}
