#!/usr/bin/env python3
"""Splice tools/oracle_map_body.scala.txt between the ORACLE-BODY markers
in SparkEntry.scala. Run after `sbt "runMain graft.tools.GenOracleBody"`.
"""
import re, pathlib

root = pathlib.Path(__file__).resolve().parent.parent
entry = root / "src/main/scala/graft/SparkEntry.scala"
body = (root / "tools/oracle_map_body.scala.txt").read_text().rstrip()

src = entry.read_text()
# Comment-line subpattern must be single-line ([^\n]*, not .*): under
# re.S a `.` crosses newlines, so the old `(?:\s*// .*\n)*` swallowed the
# whole generated body into the kept prefix and every regen APPENDED a
# fresh copy instead of replacing (12 accumulated copies by round 3).
pat = re.compile(
    r"(// ORACLE-BODY-BEGIN[^\n]*\n(?:[ \t]*//[^\n]*\n)*)(.*?)(\n\s*// ORACLE-BODY-END)",
    re.S,
)
m = pat.search(src)
assert m, "ORACLE-BODY markers not found"
src = src[: m.start(2)] + body + src[m.end(2):]
entry.write_text(src)
print(f"spliced {body.count(chr(10)) + 1} lines into {entry}")
