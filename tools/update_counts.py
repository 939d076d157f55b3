#!/usr/bin/env python3
"""Rewrite the pinned query/test/suite counts in README.md from gate
artifacts instead of hand-editing (they drifted three rounds running).

Usage:
  python3 tools/update_counts.py <verify_outdir> [sbt_test_log]

- query count   = len(<verify_outdir>/oracle_sql.json)  (the driver gate's
  own denominator — every query carries an oracle entry)
- test/suite counts = parsed from an `sbt test` log containing ScalaTest's
  "Total number of tests run: N" and "Suites: completed M, aborted 0"
  summary lines (omit the log to leave the test pins untouched)

Idempotent: running twice is a no-op. Exits 1 if a pattern it is supposed
to rewrite is missing (so the close gate notices a reworded README instead
of silently not pinning).
"""
import json
import re
import sys


def main(outdir: str, test_log: str | None) -> int:
    with open(f"{outdir}/oracle_sql.json") as f:
        n_queries = len(json.load(f))

    with open("README.md") as f:
        readme = f.read()

    # "ALL 311\n  queries carry a DuckDB oracle" (line-wrapped)
    readme, n1 = re.subn(r"ALL \d+(\s+)queries carry",
                         rf"ALL {n_queries}\1queries carry", readme)
    if n1 != 1:
        print(f"ERROR: 'ALL N queries carry' pattern matched {n1} times")
        return 1

    if test_log:
        with open(test_log) as f:
            log = f.read()
        m_tests = re.findall(r"Total number of tests run: (\d+)", log)
        m_suites = re.findall(r"Suites: completed (\d+), aborted 0", log)
        if not m_tests or not m_suites:
            print("ERROR: test log lacks ScalaTest summary lines")
            return 1
        n_tests, n_suites = m_tests[-1], m_suites[-1]
        readme, n2 = re.subn(r"`sbt test`: \d+ tests across \d+ suites",
                             f"`sbt test`: {n_tests} tests across {n_suites} suites",
                             readme)
        if n2 != 1:
            print(f"ERROR: '`sbt test`: N tests across M suites' matched {n2} times")
            return 1
        print(f"pinned: {n_queries} queries, {n_tests} tests / {n_suites} suites")
    else:
        print(f"pinned: {n_queries} queries (test pins untouched)")

    with open("README.md", "w") as f:
        f.write(readme)
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None))
