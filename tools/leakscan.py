#!/usr/bin/env python3
"""Self-evidencing public-knowledge scan over the repo's own sources.

The round driver writes LEAKCHECK.json with hit arrays only; r9 ADVICE
flagged that a hits-only record cannot evidence the scan actually ran
over the round's new code. This local scanner re-implements the same
seven categories and emits scan METADATA alongside the hits — UTC
timestamp, file count, byte count, per-category pattern, git HEAD — so
each round's committed record (LEAKCHECK_LOCAL.json) is self-evidencing.

Usage: python3 tools/leakscan.py [outfile]
"""
import hashlib
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Seven categories mirroring the driver's LEAKCHECK hit keys: anything
# non-public (internal imports/packages, private hosts/buckets, chat
# links, credentials, internal env vars) must never appear in sources.
PATTERNS = {
    "internal-import": r"import\s+(com|net|org)\.(anthropic|anthro)\b",
    "internal-url": r"https?://[a-z0-9.-]*\.(corp|internal|intranet)\b",
    "internal-pkg2": r"\b(anthropic|claude)[-_.](internal|private|prod)\b",
    "internal-bucket": r"\b(s3|gs|gcs)://[a-z0-9-]*(internal|private|corp)(?=$|[^a-z])",
    "slack-link": r"\bslack\.com/archives/[A-Z0-9]+",
    "api-key": r"\b(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16})\b",
    "axon-env": r"\b[A-Z_]*(?:ANTHROPIC|AXON)[A-Z_]*=",
}

SCAN_DIRS = ["src", "tools", "project"]
SCAN_FILES = ["build.sbt", "README.md", "SURVEY.md", "STATUS.md"]
EXTS = {".scala", ".sbt", ".py", ".sh", ".md", ".json", ".conf"}


def iter_files():
    for d in SCAN_DIRS:
        for dirpath, _, names in os.walk(os.path.join(ROOT, d)):
            for n in names:
                if os.path.splitext(n)[1] in EXTS:
                    yield os.path.join(dirpath, n)
    for f in SCAN_FILES:
        p = os.path.join(ROOT, f)
        if os.path.exists(p):
            yield p


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "LEAKCHECK_LOCAL.json")
    hits = {k: [] for k in PATTERNS}
    files = 0
    total_bytes = 0
    digest = hashlib.sha256()
    for path in sorted(set(iter_files())):
        rel = os.path.relpath(path, ROOT)
        files += 1
        with open(path, "rb") as fh:
            raw = fh.read()
        total_bytes += len(raw)
        digest.update(rel.encode() + b"\0" + raw)
        text = raw.decode("utf-8", errors="replace")
        for cat, pat in PATTERNS.items():
            for i, line in enumerate(text.splitlines(), 1):
                if re.search(pat, line, re.IGNORECASE):
                    hits[cat].append(f"{rel}:{i}")
    try:
        head = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=ROOT).decode().strip()
    except Exception:
        head = "unknown"
    record = {
        "scanned_at_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_head": head,
        "files_scanned": files,
        "bytes_scanned": total_bytes,
        "content_sha256": digest.hexdigest(),
        "patterns": PATTERNS,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(out, "w") as fh:
        json.dump(record, fh, indent=2)
        fh.write("\n")
    print(f"[leakscan] {files} files, {total_bytes} bytes, "
          f"{record['n_hits']} hits -> {out}")
    return 0 if record["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
