package graft.app

import org.scalatest.funsuite.AnyFunSuite

/** CLI flag semantics mirror /root/reference/cmd/scrape.go:52-66. */
class MainSpec extends AnyFunSuite {

  test("parse: seed url + repeated match/follow flags") {
    val a = Main.parse(List("http://h.test/", "--pages", "/p",
      "--match", "/a/**", "--match", "/b/*", "--follow-match", "/c/**",
      "--limit", "5", "--format", "jsonl"))
    assert(a.seed == "http://h.test/")
    assert(a.pages == "/p")
    assert(a.matches == Vector("/a/**", "/b/*"))
    assert(a.follows == Vector("/c/**"))
    assert(a.limit == 5)
    assert(a.format == "jsonl")
  }

  test("parse: url-file mode + scale flags") {
    val a = Main.parse(List("--pages", "/p", "--url-file", "/tmp/urls.txt",
      "--host-budget", "10", "--robots", "--checkpoint", "/tmp/ck", "--resume"))
    assert(a.urlFile == "/tmp/urls.txt")
    assert(a.seed.isEmpty)
    assert(a.hostBudget == 10)
    assert(a.robots && a.resume)
    assert(a.checkpoint == "/tmp/ck")
  }

  test("parse: unknown flag rejected") {
    intercept[IllegalArgumentException](Main.parse(List("--bogus", "x")))
  }
}
