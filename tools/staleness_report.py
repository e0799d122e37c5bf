"""Correctness-window staleness report.

The driver verifies only the first 50 registry entries per round, so
the `_PRIORITY` window in __spark_entry__.py decides which queries get
a fresh oracle verdict. Its head comment used to be hand-maintained
(and was wrong once in round 5); this tool derives the facts the
window must be composed from:

  per query:
    latest_green   — newest CORRECTNESS_r{N}.json round where rows,
                     schema, and hash all matched with no error
                     (None = never driver-verified);
    kernel_round   — the round of the newest git commit touching any
                     file in the query's kernel (the suite module that
                     registers it plus the package modules that module
                     imports);
    stale          — True when kernel_round > latest_green, i.e. the
                     code under the verdict changed after it was
                     issued.

  ordering rule for the next window (printed last):
    never-verified first, then stale (kernel changed since green),
    then oldest latest_green — the same never > changed > stale
    priority the round-5 window spec prescribes.

Since round 9 the full local verify sweep is archived per round as
VERIFYLOCAL_r{N}.jsonl (one line per query, all 183 checked every
sweep), so the report also derives:

    latest_local_green — newest archived sweep round where the query
                         passed the strict local oracle check;
    UNCHECKED          — kernel_round postdates BOTH the driver green
                         and the local green, i.e. no check of any
                         kind has run on the current code. This is
                         the flag that matters operationally; a
                         merely-STALE query still holds a local green
                         newer than its kernel.

The 50-slot driver window is still composed from driver greens alone
(the driver verdict is the judged artifact); the local column exists
so out-of-window queries are auditable rather than trusted.

A commit's round is inferred from the driver's `round N:` marker
commits: everything after marker N-1 (exclusive) belongs to round N.

Usage: python tools/staleness_report.py [--json]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "workhop2_etl_spark"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], check=True, capture_output=True, text=True
    ).stdout


def commit_rounds() -> dict[str, int]:
    """Map every commit sha -> round number via the driver's
    'round N:' marker commits (markers close their round; commits
    after marker N belong to round N+1)."""
    lines = _git("log", "--format=%H %s", "--reverse").splitlines()
    rounds: dict[str, int] = {}
    current = 1
    for line in lines:
        sha, _, subject = line.partition(" ")
        rounds[sha] = current
        m = re.match(r"round (\d+):", subject)
        if m:
            current = int(m.group(1)) + 1
    return rounds


def latest_greens() -> dict[str, int | None]:
    """query -> newest round with a fully-green driver verdict."""
    greens: dict[str, int | None] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for name, v in data.items():
            ok = (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
                and not v.get("err")
            )
            if ok:
                greens[name] = max(rnd, greens.get(name) or 0)
            else:
                greens.setdefault(name, None)
    return greens


def latest_local_greens() -> dict[str, int]:
    """query -> newest archived local sweep round with pass=true
    (VERIFYLOCAL_r{N}.jsonl, committed per round since r09)."""
    greens: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "VERIFYLOCAL_r*.jsonl"))):
        rnd = int(re.search(r"_r(\d+)\.jsonl$", path).group(1))
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("pass") and "query" in rec:
                    greens[rec["query"]] = max(rnd, greens.get(rec["query"], 0))
    return greens


_IMPORT_RE = re.compile(
    rf"^\s*(?:from|import)\s+({PKG}(?:\.[A-Za-z0-9_]+)*)", re.M
)


def _module_files(module: str) -> list[str]:
    rel = module.replace(".", "/")
    for cand in (f"{rel}.py", f"{rel}/__init__.py"):
        if os.path.exists(os.path.join(REPO, cand)):
            return [cand]
    return []


#: shared by every query (or near enough) — including them would mark
#: the whole registry stale any round they are touched, which is true
#: but not actionable at 50 slots; a change there warrants a full
#: local verify sweep instead (verify skill gotcha list).
_SHARED = {f"{PKG}/session.py", f"{PKG}/suite/__init__.py"}


def kernel_files() -> dict[str, list[str]]:
    """query -> registering suite file + its package-internal imports
    (one level — the operator/function modules the suite module calls
    into). File granularity: a touch anywhere in a suite module marks
    every query it registers, which over-approximates; the report is
    facts for composing the window, not the window itself."""
    out: dict[str, list[str]] = {}
    suite_dir = os.path.join(REPO, PKG, "suite")
    for path in sorted(glob.glob(os.path.join(suite_dir, "*.py"))):
        src = open(path).read()
        rel = os.path.relpath(path, REPO)
        deps = {rel}
        for m in _IMPORT_RE.finditer(src):
            deps.update(f for f in _module_files(m.group(1)) if f not in _SHARED)
        # query registrations in this module: query(\n? "name"
        for m in re.finditer(r"query\(\s*\n?\s*\"([a-z0-9_]+)\"", src):
            out[m.group(1)] = sorted(deps)
    return out


def file_round(path: str, rounds: dict[str, int], cache: dict) -> int:
    if path not in cache:
        sha = _git("log", "-1", "--format=%H", "--", path).strip()
        cache[path] = rounds.get(sha, max(rounds.values(), default=1))
    return cache[path]


def main() -> None:
    as_json = "--json" in sys.argv
    rounds = commit_rounds()
    this_round = max(rounds.values(), default=1)
    greens = latest_greens()
    local_greens = latest_local_greens()
    kernels = kernel_files()
    cache: dict[str, int] = {}

    rows = []
    for name in sorted(kernels):
        files = kernels[name]
        k_round = max(file_round(f, rounds, cache) for f in files)
        k_file = max(files, key=lambda f: file_round(f, rounds, cache))
        green = greens.get(name)
        local = local_greens.get(name)
        best = max(green or 0, local or 0)
        rows.append(
            {
                "query": name,
                "latest_green": green,
                "latest_local_green": local,
                "kernel_round": k_round,
                "kernel_file": k_file,
                "stale": green is not None and k_round > green,
                "unchecked": k_round > best,
            }
        )

    # never-verified first, then oldest green (stale ones leading
    # within the same round — file-granular staleness over-triggers,
    # so it breaks ties rather than jumping the queue)
    def key(r):
        if r["latest_green"] is None:
            return (0, 0, 0, r["query"])
        return (1, r["latest_green"], 0 if r["stale"] else 1, r["query"])

    rows.sort(key=key)
    if as_json:
        for r in rows:
            print(json.dumps(r))
        return
    print(f"# staleness report (current round = r{this_round:02d})")
    print(f"{'query':<34} {'green':>5} {'local':>5} {'kernel':>6}  flag")
    for r in rows:
        g = f"r{r['latest_green']:02d}" if r["latest_green"] else "NEVER"
        lg = f"r{r['latest_local_green']:02d}" if r["latest_local_green"] else "-"
        flag = "UNCHECKED" if r["unchecked"] else ("STALE" if r["stale"] else "")
        print(
            f"{r['query']:<34} {g:>5} {lg:>5} r{r['kernel_round']:02d}     {flag}"
        )
    window = [r["query"] for r in rows[:50]]
    print("\n# proposed 50-slot window (never > stale > oldest-green):")
    for q in window:
        print(f'    "{q}",')


if __name__ == "__main__":
    main()
