package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Table from /root/reference/utils_test.go:9-35 (rune-safe truncation). */
class StringsSpec extends AnyFunSuite {
  val cases: Seq[(String, Int, String)] = Seq(
    ("hello world", 5, "hello"),
    ("hello", 10, "hello"),
    ("", 5, ""),
    ("hello", 0, ""),
    ("hello", -1, ""),
    ("🚀🎉✨", 2, "🚀🎉"),
    ("test", 4, "test"),
    ("a", 1, "a"),
    ("ab", 1, "a"),
    ("multi\nline\ntext", 8, "multi\nli"))

  test("truncateString matches the reference table") {
    cases.foreach { case (in, n, want) =>
      assert(Strings.truncateString(in, n) == want, s"input=$in maxLen=$n")
    }
  }
}
