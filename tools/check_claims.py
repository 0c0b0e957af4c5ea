#!/usr/bin/env python3
"""Verify SURVEY.md's newest round-block claims against the artifacts
they cite — the structural fix for hand-tallied-number drift (VERDICT
r10 item 3: a "10/10" ledger claim and a 216-vs-217 test count both
slipped past review in one round).

Checks, each FAILING LOUDLY (exit 1) on mismatch:
  1. "N scalatest cases"      vs  count of `test("` definitions in src/test
  2. "N queries (... M oracle-verified" header counts
                              vs  newest CORRECTNESS_r*.json rows
  3. "sfK oracle ledger A/B"  vs  bench/sfK_check_r*.txt (newest):
       A = PASS rows, B = adjudicated rows (PASS + FAIL + documented
       OMIT + ORACLE-TIMEOUT). A claim is also WRONG if the ledger's
       companion verify log names queries with no adjudication row at
       all — "ran under Spark" is not "adjudicated".

SCOPE: §8's header paragraph and the NEWEST "### Round-N additions"
block (historical blocks state what was true in their round — except
ledger claims, which name a specific committed artifact and are checked
wherever they appear).

Usage: python3 tools/check_claims.py   (from the repo root)
Dev harness only — not part of the library.
"""
import glob, json, os, re, statistics, sys

fails = []


def fail(msg):
    fails.append(msg)
    print(f"CLAIM-MISMATCH: {msg}")


survey_full = open("SURVEY.md").read()
# §8 header paragraph (up to its first subsection) + the newest round block
hdr = re.search(r"## 8\..*?(?=\n###)", survey_full, re.S)
blocks = list(re.finditer(r"### Round-(\d+) additions.*?(?=\n### |\Z)", survey_full, re.S))
newest = max(blocks, key=lambda m: int(m.group(1))) if blocks else None
survey = (hdr.group(0) if hdr else "") + "\n" + (newest.group(0) if newest else "")

# ---- 1. scalatest case count -------------------------------------------
actual_tests = 0
for f in glob.glob("src/test/scala/graft/*.scala"):
    with open(f, "rb") as fh:
        actual_tests += len(re.findall(rb'test\("', fh.read()))
for m in re.finditer(r"(\d+)\s+scalatest cases", survey):
    claimed = int(m.group(1))
    if claimed != actual_tests:
        fail(f"SURVEY says '{claimed} scalatest cases'; src/test defines {actual_tests}")

# ---- 2. query / oracle-verified counts vs newest CORRECTNESS ------------
corrs = sorted(glob.glob("CORRECTNESS_r*.json"))
if corrs:
    corr = json.load(open(corrs[-1]))
    n_total = len(corr)
    n_green = sum(1 for v in corr.values() if v.get("hash_match") is True)
    # the §8 header and the newest round block both state these
    for m in re.finditer(r"(\d+)\s+queries?,?\s*\(?(\d+)\s+oracle-verified", survey):
        ct, cg = int(m.group(1)), int(m.group(2))
        if (ct, cg) != (n_total, n_green):
            fail(f"SURVEY says '{ct} queries, {cg} oracle-verified'; "
                 f"{os.path.basename(corrs[-1])} has {n_total} rows, {n_green} green")

# ---- 3. sfN oracle ledger claims vs bench/sfN_check_r*.txt --------------
def ledger_counts(sf):
    checks = sorted(glob.glob(f"bench/sf{sf}_check_r*.txt"))
    if not checks:
        return None
    path = checks[-1]
    txt = open(path).read()
    adjudicated, passed = set(), set()
    for line in txt.splitlines():
        mm = re.match(r"(q_\w+)\s+(PASS|FAIL|OMIT|ORACLE-TIMEOUT)", line)
        if mm:
            adjudicated.add(mm.group(1))
            if mm.group(2) in ("PASS", "OMIT"):
                passed.add(mm.group(1))
    # companion verify walls / query lists name the intended scope;
    # queries with a Spark wall but no adjudication row are NOT
    # adjudicated ("ran under Spark" != "oracle-adjudicated")
    scoped = set(re.findall(r"^(q_\w+)\s+rc=\d+", txt, re.M))
    rnd = re.search(r"_r(\d+)\.txt$", path).group(1)
    for companion in (f"bench/sf{sf}_verify_r{rnd}.txt",):
        if os.path.exists(companion):
            scoped |= set(re.findall(r"^(q_\w+)\s+(?:rc=|cached)", open(companion).read(), re.M))
    qfile = f"bench/sf{sf}_queries_r{rnd}.txt"
    if os.path.exists(qfile):
        scoped |= set(open(qfile).read().replace(",", " ").split())
    scoped |= adjudicated
    return path, adjudicated, passed, scoped


for m in re.finditer(r"sf(\d+(?:\.\d+)?)\s+(?:oracle\s+)?ledger[^|\n]*?(\d+)/(\d+)", survey_full):
    sf, a, b = m.group(1), int(m.group(2)), int(m.group(3))
    lc = ledger_counts(sf)
    if lc is None:
        fail(f"SURVEY claims an sf{sf} ledger {a}/{b} but no bench/sf{sf}_check_r*.txt exists")
        continue
    path, adjudicated, passed, scoped = lc
    un = scoped - adjudicated
    if a != len(passed) or b != len(scoped) or un:
        fail(f"SURVEY claims sf{sf} ledger {a}/{b}; {path} adjudicates "
             f"{len(passed)} PASS/OMIT of {len(adjudicated)} rows over a "
             f"{len(scoped)}-query scope"
             + (f"; UNADJUDICATED: {sorted(un)}" if un else ""))

# ---- 4. BASELINE.md sweep totals / medians vs committed bench artifacts -
# (VERDICT r11 item 7) Every sweep-shaped claim "NNN.N s / NNN" or
# "median 0.NNN" inside a section that cites a bench artifact must match
# SOME committed artifact's recomputed numbers — hand-transcription is
# allowed to round, not to drift.
if os.path.exists("BASELINE.md"):
    btxt = open("BASELINE.md").read()
    arts = {}
    for p in glob.glob("bench/bench_full_r*.json") + glob.glob("BENCH_r*.json"):
        try:
            d = json.load(open(p))
        except Exception:
            continue
        qs = d.get("queries") or {}
        if qs:
            arts[p] = (round(sum(qs.values()), 1), len(qs),
                       round(statistics.median(qs.values()), 3))
    for sec in re.split(r"\n(?=#{2,3} )", btxt):
        if not re.search(r"bench/bench_full_r\d+\.json|BENCH_r\d+\.json", sec):
            continue
        for m in re.finditer(r"(\d{2,4}\.\d)\s*s\s*/\s*(\d{3})\b", sec):
            tot, nq = float(m.group(1)), int(m.group(2))
            # claims about sweeps whose artifact was never committed
            # (no artifact has that query count) are historical prose —
            # out of scope; a count matching a committed artifact makes
            # the claim checkable and it must then match one
            if not any(a[1] == nq for a in arts.values()):
                continue
            if not any(abs(a[0] - tot) <= 0.15 and a[1] == nq
                       for a in arts.values()):
                fail(f"BASELINE sweep claim '{m.group(0)}' matches no committed "
                     f"bench artifact (have: {sorted(set(arts.values()))})")
        for m in re.finditer(r"median\s+(0\.\d{3})\b", sec):
            md = float(m.group(1))
            if not any(abs(a[2] - md) <= 0.002 for a in arts.values()):
                fail(f"BASELINE median claim '{m.group(0)}' matches no committed "
                     f"bench artifact")
    # ledger claims that NAME an sfN_check artifact: "A/B PASS (`path`)"
    for m in re.finditer(
            r"(\d+)/(\d+)\s+(?:PASS|ADJUDICATED)\s*\(`(bench/sf[\d.]+_check_r\d+\.txt)`\)",
            btxt):
        a, b, path = int(m.group(1)), int(m.group(2)), m.group(3)
        if not os.path.exists(path):
            fail(f"BASELINE names missing ledger artifact {path}")
            continue
        txt = open(path).read()
        adjud, passed = set(), set()
        for line in txt.splitlines():
            mm = re.match(r"(q_\w+)\s+(PASS|FAIL|OMIT|ORACLE-TIMEOUT)", line)
            if mm:
                adjud.add(mm.group(1))
                if mm.group(2) in ("PASS", "OMIT"):
                    passed.add(mm.group(1))
        if (a, b) != (len(passed), len(adjud)):
            fail(f"BASELINE claims {a}/{b} for {path}; artifact has "
                 f"{len(passed)} PASS/OMIT of {len(adjud)} adjudicated")

# ---- 5. QUERIES.md rows vs newest CORRECTNESS + source registrations ----
# (VERDICT r12 item 1) QUERIES.md claims to be regenerated after query
# adds; r12 shipped it one query stale. Two invariants: (a) every query
# the newest driver artifact adjudicated has a QUERIES.md row — a stale
# file fails loudly; (b) every QUERIES.md row names a query registered
# in source — no ghost rows. (QUERIES.md MAY have rows the artifact
# lacks: queries added since the last driver run, adjudicated next
# round — the same newest-artifact discipline as the §8 header.)
if os.path.exists("QUERIES.md") and corrs:
    qmd = set(re.findall(r"^\| (q_\w+) \|", open("QUERIES.md").read(), re.M))
    missing = sorted(set(corr) - qmd)
    if missing:
        fail(f"QUERIES.md is missing {len(missing)} adjudicated quer(y/ies): "
             f"{missing[:5]}")
    reg = set()
    for f in glob.glob("src/main/scala/graft/queries/Q*.scala") + \
            ["src/main/scala/graft/SparkEntry.scala"]:
        reg |= set(re.findall(r'"(q_\w+)"\s*->', open(f).read()))
    ghosts = sorted(qmd - reg)
    if ghosts:
        fail(f"QUERIES.md has {len(ghosts)} row(s) with no source "
             f"registration: {ghosts[:5]}")

# ---- 6. sf100 probe claims vs bench/sf100_probe_r*.txt ------------------
# (VERDICT r12 items 2/8) The 1000× scale rows must rest on a committed
# raw artifact, not prose. Contract: in any BASELINE section citing an
# sf100 probe artifact, (a) the artifact exists; (b) every q_* named in
# the section has a [profq] line in it; (c) every BOLD wall "**X s**"
# in a table row naming q_* equals the median of reps 2..n of one of
# that query's [profq] lines (±0.05 — bold marks transcribed steadies;
# rep1 pays one-time staging/codegen and is quoted unbolded).
def probe_steadies(path):
    out = {}
    for line in open(path):
        m = re.match(r"\[profq\] (q_\w+)\s+([\d. ]+)$", line.strip())
        if m:
            reps = [float(x) for x in m.group(2).split()]
            tail = reps[1:] if len(reps) > 1 else reps
            out.setdefault(m.group(1), []).append(
                round(statistics.median(tail), 2))
    return out


if os.path.exists("BASELINE.md"):
    for sec in re.split(r"\n(?=#{2,3} )", open("BASELINE.md").read()):
        arts_cited = set(re.findall(r"bench/sf100_probe_r\d+\.txt", sec))
        if not arts_cited:
            continue
        steadies = {}
        for a in sorted(arts_cited):
            if not os.path.exists(a):
                fail(f"BASELINE cites missing probe artifact {a}")
                continue
            for q, vals in probe_steadies(a).items():
                steadies.setdefault(q, []).extend(vals)
        for row in sec.splitlines():
            qs = re.findall(r"`(q_\w+)`", row)
            if not (qs and row.strip().startswith("|")):
                continue
            q = qs[0]
            if q not in steadies:
                fail(f"BASELINE sf100 row names {q} but the cited probe "
                     f"artifact(s) have no [profq] line for it")
                continue
            for m in re.finditer(r"\*\*(\d+(?:\.\d+)?)\s*s\*\*", row):
                v = float(m.group(1))
                if not any(abs(v - s) <= 0.05 + 0.005 * s for s in steadies[q]):
                    fail(f"BASELINE bold wall '{m.group(0)}' for {q} matches "
                         f"no probe-line steady (have {steadies[q]})")

if fails:
    print(f"\n{len(fails)} claim(s) contradict their artifacts")
    sys.exit(1)
print("all SURVEY claims match their artifacts "
      f"(tests={actual_tests}, correctness={os.path.basename(corrs[-1]) if corrs else 'n/a'})")
