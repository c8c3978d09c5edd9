#!/usr/bin/env python3
"""Repo-side leak scan with provenance. Mirrors the driver's category
layout (zero hits expected in every category) and adds the two fields
the round-6/7 ADVICE asked for: scan timestamp and the HEAD commit the
scan ran against, so a LEAKCHECK artifact is attributable to a exact
tree state. Patterns are deliberately generic shapes (bucket URIs,
chat-app archive links, credential-looking literals, suspicious env
prefixes) — the scan must not itself embed anything non-public.

Usage: tools/leakcheck.py [outfile]   (default: LEAKCHECK.json)
"""
import datetime
import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

CATEGORIES = {
    # imports outside the allowed public surface (spark/scala/java + this repo)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.spark|org\.apache\.logging|org\.scalatest"
        r"|org\.scalacheck|scala\.|java\.|javax\.|graft\.|spark\.implicits"
        r"|com\.fasterxml\.|com\.sun\.)[a-z][\w.]+",
        re.M),
    "internal-url": re.compile(r"https?://(?!localhost|127\.0\.0\.1|[\w.-]*example\.)[\w.-]+\.(?:corp|internal|intranet)\b"),
    "internal-pkg2": re.compile(r"\bcom\.(?!example\b)[a-z]+\.(?:internal|private)\b"),
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|wasbs?|abfss?)://[\w.-]+"),
    "slack-link": re.compile(r"https?://[\w-]+\.slack\.com/\S+"),
    "api-key": re.compile(r"\b(?:sk|pk|rk)-[A-Za-z0-9]{16,}\b|AKIA[0-9A-Z]{16}"),
    "axon-env": re.compile(r"\bAXON_[A-Z0-9_]+\b"),
}

SCAN_GLOBS = ["src/**/*.scala", "build.sbt", "tools/*.py", "*.md"]


def head_commit() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True,
            text=True, check=True).stdout.strip()
    except Exception:
        return "unknown"


def main(outfile: str) -> int:
    hits = {k: [] for k in CATEGORIES}
    n_files = 0
    for glob in SCAN_GLOBS:
        for path in sorted(ROOT.glob(glob)):
            if path.name == "leakcheck.py":  # the patterns themselves
                continue
            n_files += 1
            text = path.read_text(encoding="utf-8", errors="replace")
            for cat, rx in CATEGORIES.items():
                # the JVM-import shape only means something in JVM sources;
                # applying it to the python tooling flags stdlib imports
                if cat == "internal-import" and path.suffix not in (".scala", ".sbt"):
                    continue
                for m in rx.finditer(text):
                    line = text.count("\n", 0, m.start()) + 1
                    hits[cat].append(f"{path.relative_to(ROOT)}:{line}:{m.group(0)[:80]}")
    out = {
        "generated_at": datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec="seconds"),
        "commit": head_commit(),
        "scanner": "tools/leakcheck.py",
        "files_scanned": n_files,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    Path(outfile).write_text(json.dumps(out, indent=2) + "\n")
    print(f"{out['n_hits']} hits across {n_files} files -> {outfile}")
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else str(ROOT / "LEAKCHECK.json")))
