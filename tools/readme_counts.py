#!/usr/bin/env python3
"""Regenerate README.md's generated inventory section from the code and
measured artifacts — scripted, not hand-counted (r15 verdict item 7).

Sources:
  - SparkEntry.scala     query registry + oracle SQL map
  - src/test/scala       spec files + test() cases
  - COVERAGE.md          obligation rows
  - SERVE_BENCH.json / SERVE_BENCH_10X.json  measured serving rows

Rewrites the block between the GENERATED-INVENTORY markers in README.md
(appends the block before '## Design notes' if the markers are absent).
"""
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BEGIN = "<!-- BEGIN GENERATED-INVENTORY (tools/readme_counts.py) -->"
END = "<!-- END GENERATED-INVENTORY -->"


def query_counts():
    src = (ROOT / "src/main/scala/graft/SparkEntry.scala").read_text()
    names = re.findall(r'"(q\d+[a-z0-9_]*)"\s*->', src)
    queries = sorted({n for n in names})
    # oracle entries are the same pattern inside the oracleSql map; a
    # name that appears twice (query + oracle) is oracled
    from collections import Counter
    c = Counter(names)
    oracled = sorted(n for n in queries if c[n] >= 2)
    return queries, oracled


def spec_counts():
    tests = 0
    files = 0
    for f in sorted((ROOT / "src/test/scala/graft").glob("*.scala")):
        src = f.read_text()
        n = len(re.findall(r'(?:^|\s)(?:test|property)\s*\(\s*(?:s|f)?"', src))
        if n > 0:
            files += 1
            tests += n
    return files, tests


def coverage_rows():
    p = ROOT / "COVERAGE.md"
    if not p.exists():
        return 0
    return sum(
        1 for line in p.read_text().splitlines()
        if line.startswith("|") and not set(line) <= set("|- :")
    ) - 1  # header


def serving_rows():
    out = []
    for fname, scale in (("SERVE_BENCH.json", "1x"),
                         ("SERVE_BENCH_10X.json", "10x")):
        p = ROOT / fname
        if not p.exists():
            continue
        d = json.loads(p.read_text())
        best = {}
        for r in d.get("results", []):
            key = r["path"]
            if key not in best or r.get("qps", 0) > best[key].get("qps", 0):
                best[key] = r
        for key in sorted(best):
            r = best[key]
            out.append((scale, key, r.get("concurrency", ""),
                        r.get("qps", 0.0), r.get("p50_ms", 0.0)))
    return out


def main():
    queries, oracled = query_counts()
    spec_files, spec_tests = spec_counts()
    cov = coverage_rows()
    serving = serving_rows()

    lines = [BEGIN, "", "## Inventory (generated)", ""]
    rest = ("" if len(oracled) == len(queries) else
            f" ({len(queries) - len(oracled)} rows-only by the documented "
            f"contract)")
    lines.append(
        f"- **{len(queries)} driver-gated queries** in `SparkEntry.queries`, "
        f"**{len(oracled)}** with a DuckDB oracle in "
        f"`SparkEntry.oracleSql`{rest}.")
    lines.append(
        f"- **{spec_files} ScalaTest suites** with **{spec_tests} statically "
        f"declared test/property definitions** under `src/test/scala/graft` "
        f"(parameterized suites register more cases at runtime — "
        f"`sbt test` prints the executed total).")
    if cov:
        lines.append(
            f"- **{cov} obligation rows** tracked line-by-line in "
            f"`COVERAGE.md` (SURVEY §2 obligation → query/spec → status).")
    if serving:
        lines.append("")
        lines.append(
            "Serving-tier matrix — best measured cell per path "
            "(`SERVE_BENCH.json` = reference envelope, "
            "`SERVE_BENCH_10X.json` = 10x corpus; see SCALE.md for the "
            "methodology):")
        lines.append("")
        lines.append("| scale | path | conc | qps | p50 ms |")
        lines.append("|---|---|---|---|---|")
        for scale, path, conc, qps, p50 in serving:
            lines.append(f"| {scale} | `{path}` | {conc} | {qps:,.0f} | {p50:.1f} |")
    lines += ["", END]
    block = "\n".join(lines)

    readme = (ROOT / "README.md").read_text()
    if BEGIN in readme and END in readme:
        pre = readme.split(BEGIN)[0]
        post = readme.split(END)[1]
        readme = pre + block + post
    else:
        anchor = "## Design notes"
        if anchor in readme:
            readme = readme.replace(anchor, block + "\n\n" + anchor, 1)
        else:
            readme = readme.rstrip() + "\n\n" + block + "\n"
    (ROOT / "README.md").write_text(readme)
    print(f"queries={len(queries)} oracled={len(oracled)} "
          f"spec_files={spec_files} spec_tests={spec_tests} coverage_rows={cov} "
          f"serving_rows={len(serving)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
