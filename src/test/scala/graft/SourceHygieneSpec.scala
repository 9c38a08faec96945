package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Repo hygiene gate: every source file under src/ must be plain text
  * to git — zero raw NUL bytes — so every diff renders reviewable.
  *
  * History: TarShards.scala originally embedded 8 raw NULs in tar
  * header literals (git showed "Binary files differ" for its diffs);
  * fixed at cf1692c by switching to backslash-u0000 escapes. NOTE for anyone
  * re-checking by hand: `grep -c $'\x00' file` does NOT test this —
  * bash cannot pass a NUL byte in argv, so the pattern degrades to the
  * empty string and the output is simply the file's LINE count (131
  * for TarShards.scala, misread across several reviews as "131 NUL
  * bytes"). Use `tr -cd '\0' < file | wc -c` or this spec instead.
  */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq

  test("no source file under src/ contains a raw NUL byte") {
    val root = Paths.get("src")
    assert(Files.isDirectory(root), s"run from repo root; no $root")
    val offenders = scalaFiles(root).flatMap { p =>
      val bytes = Files.readAllBytes(p)
      val nuls = bytes.count(_ == 0.toByte)
      if (nuls > 0) Some(s"$p: $nuls NUL bytes") else None
    }
    assert(offenders.isEmpty,
      "binary-to-git source files (diffs unreviewable):\n" +
        offenders.mkString("\n"))
  }
}
