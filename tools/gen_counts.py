#!/usr/bin/env python3
"""Regenerate SURVEY.md §8's headline counts from artifacts, not prose.

The r9 and r10 verdicts both caught a stale hand-edited test count in
SURVEY §8 — so the counts are now a generated block between markers:

    <!-- counts:generated:start -->  ...  <!-- counts:generated:end -->

Inputs (all artifacts this repo already produces):
  - oracle-query count + pass count: tools/selfcheck.py summary line,
    passed via --selfcheck "N passed, M failed" (or --verify-dir to
    count oracle_sql.json entries when selfcheck wasn't run)
  - test count: an `sbt test` log (--test-log), parsed for
    "Tests: succeeded N, failed M"
  - bench figure: BENCH_LOCAL.json (--bench), total seconds + nqueries

Usage (round close):
  sbt test > /tmp/sbt_test.log 2>&1
  python3 tools/selfcheck.py /tmp/verify_out /root/testdata/sf0.01 | tail -1 > /tmp/selfcheck.txt
  python3 tools/gen_counts.py --test-log /tmp/sbt_test.log \
      --selfcheck-file /tmp/selfcheck.txt --bench BENCH_LOCAL.json
"""
import argparse
import hashlib
import json
import re
import sys

START = "<!-- counts:generated:start -->"
END = "<!-- counts:generated:end -->"


def bench_run_id(bench):
    """Short content identity of one bench run: total + anchor +
    query count. Stamped into the generated block so the block is
    BOUND to the run it cites — if the (gitignored) bench file is
    later overwritten by a different run, the stamp and the file
    disagree detectably instead of the block silently citing a
    vanished run (the r17 verdict's provenance gap)."""
    key = f"{bench['value']}|{bench.get('anchor_sec')}|{len(bench['queries'])}"
    return hashlib.sha1(key.encode()).hexdigest()[:8]


def check(survey_path, bench_path):
    """--check mode: fail loudly when the SURVEY block's run stamp no
    longer matches the bench file on disk."""
    survey = open(survey_path).read()
    m = re.search(r"run:([0-9a-f]{8})", survey)
    if not m:
        sys.exit(f"no run:<id> stamp inside the generated block of {survey_path}")
    bench = json.load(open(bench_path))
    want = bench_run_id(bench)
    if m.group(1) != want:
        sys.exit(
            f"PROVENANCE MISMATCH: {survey_path} cites bench run "
            f"run:{m.group(1)} but {bench_path} on disk is run:{want} "
            f"(total={bench['value']}s anchor={bench.get('anchor_sec')}) — "
            f"the cited run was overwritten; regenerate the block from the "
            f"current artifacts or restore the cited bench file")
    print(f"counts block stamp run:{want} matches {bench_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--survey", default="SURVEY.md")
    ap.add_argument("--test-log")
    ap.add_argument("--selfcheck-file")
    ap.add_argument("--bench", default="BENCH_LOCAL.json")
    ap.add_argument("--check", action="store_true",
                    help="verify the existing block's bench stamp against "
                         "the bench file on disk instead of regenerating")
    args = ap.parse_args()

    if args.check:
        check(args.survey, args.bench)
        return
    if not args.test_log or not args.selfcheck_file:
        sys.exit("--test-log and --selfcheck-file are required to regenerate")

    test_log = open(args.test_log, errors="replace").read()
    m = re.findall(r"Tests: succeeded (\d+), failed (\d+)", test_log)
    if not m:
        sys.exit("no 'Tests: succeeded' line in " + args.test_log)
    # sbt prints one line per run; the aggregate run prints the biggest
    tests_ok = max(int(a) for a, _ in m)
    tests_fail = max(int(b) for _, b in m)

    sc = open(args.selfcheck_file, errors="replace").read()
    msc = re.search(r"(\d+) passed, (\d+) failed", sc)
    if not msc:
        sys.exit("no 'N passed, M failed' line in " + args.selfcheck_file)
    q_pass, q_fail = int(msc.group(1)), int(msc.group(2))

    bench = json.load(open(args.bench))
    bench_s = bench["value"]
    bench_n = len(bench["queries"])
    # anchor-normalized total (r12 verdict ask #4): totals drift
    # ±15-40% with box state on identical code; total/anchor_sec is the
    # figure that is comparable ACROSS rounds
    anchor = bench.get("anchor_sec")
    # r13 ask #4: the anchor's own spread (start/mid/end interleaved
    # readings) is the error bar on the normalized figure — carry it so
    # a round-over-round delta inside the bar is read as noise
    spread = bench.get("anchor_spread")
    spread_txt = f" ±{spread * 100:.0f}%" if spread is not None else ""
    anchor_txt = (
        f" · anchor {anchor:.3f} s{spread_txt} → "
        f"**{bench_s / anchor:.0f}× anchor{spread_txt}** "
        f"(the round-over-round comparable figure; ± is the measured "
        f"within-run anchor spread)"
        if anchor else "")
    # provenance (r16 verdict wrong #2): the r16 counts block cited a
    # settled run while the round artifact carried a noisy one, with
    # nothing distinguishing them — stamp WHICH file the figures came
    # from and whether that run flagged itself noise-dominated
    degraded_txt = (" **[DEGRADED: anchor spread past 0.35 — totals are "
                    "noise-dominated, compare per-anchor only]**"
                    if bench.get("degraded") else "")
    # run:<id> binds this block to the EXACT run cited (value + anchor
    # + query count hashed); `gen_counts.py --check` fails loudly when
    # the stamp and the bench file on disk disagree
    prov_txt = (f" [source: `{args.bench}` run:{bench_run_id(bench)}"
                f"{spread_txt}{degraded_txt}]")

    block = (
        f"{START}\n"
        f"**{q_pass}/{q_pass + q_fail} oracle queries hash-green** "
        f"(DuckDB selfcheck at sf0.01) · **{tests_ok} tests green"
        f"{'' if tests_fail == 0 else f', {tests_fail} FAILED'}** (`sbt test`) · "
        f"local bench **{bench_s:.1f} s / {bench_n} queries** "
        f"(sf0.1, local[32], median-of-3){anchor_txt}{prov_txt}. "
        f"_This block is emitted by `tools/gen_counts.py` from the round's "
        f"artifacts — do not hand-edit._\n"
        f"{END}"
    )

    survey = open(args.survey).read()
    if START in survey:
        new = re.sub(re.escape(START) + ".*?" + re.escape(END), block,
                     survey, flags=re.S)
    else:
        sys.exit(f"markers not found in {args.survey}; add {START}...{END} "
                 "where the counts belong")
    open(args.survey, "w").write(new)

    # README carries the same oracle-query count in its layout block —
    # stamp it too, so it cannot drift from the artifacts (the r14
    # advice caught a stale hand-edited 216 there)
    readme = open("README.md").read()
    readme2, n = re.subn(r"\(\d+ oracle-backed queries",
                         f"({q_pass} oracle-backed queries", readme)
    if n != 1:
        sys.exit("README.md oracle-backed-queries line not found (or "
                 "found more than once) — fix the layout block")
    open("README.md", "w").write(readme2)
    print(block)


if __name__ == "__main__":
    main()
