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

  private def chargrams(s: String, n: Int): Seq[String] = {
    val a = TextNative.charNgrams(UTF8String.fromString(s), n)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  test("char trigrams: sliding window, stride 1") {
    assert(chargrams("abcde", 3) == Seq("abc", "bcd", "cde"))
    assert(chargrams("abc", 3) == Seq("abc"))
  }
  test("char trigrams: shorter than n is empty") {
    assert(chargrams("", 3).isEmpty)
    assert(chargrams("ab", 3).isEmpty)
  }
  test("char trigrams are code-point safe (2-, 3- and 4-byte UTF-8)") {
    // must slice exactly like SQL substring(text, i, 3): by code point,
    // never by byte or UTF-16 unit
    assert(chargrams("héllo", 3) == Seq("hél", "éll", "llo"))
    assert(chargrams("日本語です", 3) == Seq("日本語", "本語で", "語です"))
    val emoji = "a😀b😁c" // a😀b😁c — 5 code points
    assert(chargrams(emoji, 3) ==
      Seq("a😀b", "😀b😁", "b😁c"))
  }
}
