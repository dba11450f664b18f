"""Gates over the committed BENCH_* artifacts and the README perf prose.

Round-4 verdict items: (a) nothing gated the committed bench artifacts, so
a perf regression or a stale artifact could land silently; (b) README's
perf table drifted one evidence-generation behind for three consecutive
rounds.  These tests make both failures loud:

- every *latest-round* BENCH artifact must meet its documented contract
  (BASELINE.json's <5 ms / >=10x for the 640x480 path; the 4K and stream
  thresholds documented in docs/PERF.md);
- every artifact citation in README.md / COMPONENTS.md must point at the
  newest committed round of that artifact family;
- the README perf table's quoted numbers must match the artifact cited on
  the same row.
"""
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Artifact families that accumulate one file per round.  PERF.md is a
# history document (old rounds are narrated deliberately); README.md and
# COMPONENTS.md describe the present, so they must cite the newest round.
_FAMILY_RE = re.compile(r"\b((?:BENCH|GOLDENS|CORPUS|KNOBS|MULTICHIP)"
                        r"(?:_[A-Z0-9]+)*?)_r(\d+)")


def _families():
    """family -> newest committed round number."""
    fams = {}
    for name in os.listdir(ROOT):
        m = _FAMILY_RE.match(name)
        if m and name.endswith(".json"):
            fam, rnd = m.group(1), int(m.group(2))
            fams[fam] = max(fams.get(fam, 0), rnd)
    return fams


def _latest(family):
    fams = _families()
    assert family in fams, f"no committed {family}_r*.json"
    rnd = fams[family]
    for name in os.listdir(ROOT):
        m = _FAMILY_RE.match(name)
        if m and name.endswith(".json") and m.group(1) == family \
                and int(m.group(2)) == rnd:
            return json.load(open(os.path.join(ROOT, name)))
    raise AssertionError(f"unreachable: {family} r{rnd}")


# ---------------------------------------------------------------------------
# Contract gates over the newest committed artifacts
# ---------------------------------------------------------------------------

def test_bench_640_meets_baseline_contract():
    b = _latest("BENCH")
    parsed = b.get("parsed", b)   # driver wraps the JSON line under 'parsed'
    fps = parsed["value"]
    assert fps >= 200.0, f"640x480 deploy p50 >= 5 ms ({1000/fps:.2f} ms)"
    vs = parsed.get("vs_baseline")
    assert vs is None or vs >= 10.0, f"vs_baseline {vs} < BASELINE's 10x"


def test_bench_4k_meets_documented_thresholds():
    b = _latest("BENCH_4K")
    assert b["deploy"]["p50_ms"] <= 60.0
    assert abs(b["deploy"]["force_err_vs_gold_pct"]) <= 1.0
    assert b["parity"]["p50_ms"] <= 3500.0
    assert abs(b["parity"]["force_err_vs_gold_pct"]) <= 0.5
    for scene, row in b.get("per_scene_deploy", {}).items():
        assert row["p50_ms"] <= 60.0, scene


def test_bench_streams_meets_documented_thresholds():
    b = _latest("BENCH_STREAMS")
    assert b["config5_whole_limb"]["whole_limb_hz_one_chip_4_streams"] >= 200.0
    aux = b.get("config5_whole_limb_aux")
    if aux:
        assert aux["whole_limb_hz_one_chip_4_streams"] >= 200.0
    assert b["temperature_4k_deploy"]["p50_ms"] <= 30.0
    assert b["config4_streaming"]["stream_frames_per_sec_per_chip"] >= 800.0


def test_bench_mm_meets_documented_thresholds():
    b = _latest("BENCH_MM")
    assert b["sequential_mm_ms"] <= 90.0
    assert abs(b["force_err_vs_gold_pct"]) <= 1.0


def test_bench_config23_meets_documented_thresholds():
    b = _latest("BENCH_CONFIG23")
    c2 = b["config2_contact_classification"]
    c3 = b["config3_force_map"]
    # same 640x480 deploy scale as bench.py, so BASELINE's <5 ms applies
    assert c2["p50_ms"] <= 5.0
    assert c3["p50_ms"] <= 5.0
    assert c2["n_contact_taxels"] > 0
    # the force map must integrate back to the scalar force prediction
    assert abs(c3["force_map_sum_N"] - c3["force_N"]) <= 1e-3 * abs(c3["force_N"])
    assert "non-goal" in c3["shear_note"]


# ---------------------------------------------------------------------------
# Doc freshness: README/COMPONENTS must cite the newest round per family
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("doc", ["README.md", "COMPONENTS.md"])
def test_doc_citations_are_fresh(doc):
    fams = _families()
    text = open(os.path.join(ROOT, doc)).read()
    stale = []
    for m in _FAMILY_RE.finditer(text):
        fam, rnd = m.group(1), int(m.group(2))
        newest = fams.get(fam)
        if newest is not None and rnd < newest:
            stale.append(f"{doc}: cites {fam}_r{rnd:02d}, newest is r{newest:02d}")
    assert not stale, "\n".join(stale)


# ---------------------------------------------------------------------------
# README perf table numbers must match the cited artifacts
# ---------------------------------------------------------------------------

def _readme_row(workload_substr):
    text = open(os.path.join(ROOT, "README.md")).read()
    for line in text.splitlines():
        if line.startswith("|") and workload_substr in line.split("|")[1]:
            return line
    raise AssertionError(f"README perf row not found: {workload_substr}")


def _bold_numbers(row):
    """All numbers inside **...** spans, with trailing unit word."""
    out = []
    for span in re.findall(r"\*\*([^*]+)\*\*", row):
        for num, unit in re.findall(r"([\d.]+)\s*(ms|s|fps|Hz|fps/chip|"
                                    r"stream-frames/s|×)?", span):
            if num:
                out.append((float(num), unit))
    return out


def _close(quoted, actual, rel=0.02, abs_tol=0.06):
    return abs(quoted - actual) <= max(abs_tol, rel * abs(actual))


def test_readme_640_row_matches_artifact():
    # The 640x480 artifact is DRIVER-written once per round, so the README
    # row can only quote the previous driver run; the measured run-to-run
    # band at this scale is ~10% (r05 refresh: p10 0.96 / p90 1.14 ms on
    # identical code), so gate at the band, not the 2% default.
    b = _latest("BENCH")
    parsed = b.get("parsed", b)
    fps = parsed["value"]
    row = _readme_row("640×480 frame→force")
    nums = dict()
    for v, u in _bold_numbers(row):
        nums.setdefault(u, v)
    assert _close(nums["ms"], 1000.0 / fps, rel=0.10), row
    assert _close(nums.get("fps/chip", nums.get("fps")), fps,
                  rel=0.10, abs_tol=1.0), row


def test_readme_4k_rows_match_artifact():
    b = _latest("BENCH_4K")
    row = _readme_row("3840×2160 frame→force (deploy)")
    nums = _bold_numbers(row)
    assert _close(nums[0][0], b["deploy"]["p50_ms"], abs_tol=0.1), row
    row_p = _readme_row("3840×2160 frame→force (parity)")
    nums_p = _bold_numbers(row_p)
    assert _close(nums_p[0][0], b["parity"]["p50_ms"] / 1000.0), row_p


def test_readme_temperature_row_matches_artifact():
    b = _latest("BENCH_STREAMS")
    row = _readme_row("3840×2160 frame→temperature")
    nums = _bold_numbers(row)
    assert _close(nums[0][0], b["temperature_4k_deploy"]["p50_ms"],
                  abs_tol=0.1), row


def test_readme_mm_row_matches_artifact():
    b = _latest("BENCH_MM")
    row = _readme_row("multimodal step")
    nums = _bold_numbers(row)
    assert _close(nums[0][0], b["sequential_mm_ms"], abs_tol=0.1), row


def test_readme_stream_rows_match_artifact():
    b = _latest("BENCH_STREAMS")
    row4 = _readme_row("config 4")
    nums4 = _bold_numbers(row4)
    assert _close(nums4[0][0], b["config4_streaming"]["step_p50_ms"],
                  abs_tol=0.05), row4
    row5 = _readme_row("config 5")
    nums5 = _bold_numbers(row5)
    hz = b["config5_whole_limb"]["whole_limb_hz_one_chip_4_streams"]
    assert _close(nums5[0][0], hz, abs_tol=1.0), row5
