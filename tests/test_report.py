"""The one-command research deliverable (cli/report.py).

Mirrors the reference's packaging workflow end to end
(reference: package_results_for_caren.sh; research_summary_table.md):
two tiny trained runs -> full analysis suite -> research summary +
executive summary + performance txt -> dated package directory.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from sls_tpu.cli.report import main as report_main


@pytest.fixture(scope="module")
def deliverable(tmp_path_factory):
    out = tmp_path_factory.mktemp("deliverables")
    rc = report_main([
        "--demo", "--out", str(out),
        "--num_samples", "12", "--batch_size", "8",
    ])
    dirs = sorted(out.glob("results_*"))
    return rc, out, dirs


def test_demo_report_completes(deliverable):
    rc, out, dirs = deliverable
    assert rc == 0, "a failed analysis section must fail the command"
    assert len(dirs) == 1


def test_package_contents_mirror_reference_shape(deliverable):
    """The deliverable carries every artifact class the reference's
    package script collected: summary, metrics txt, analysis reports,
    PNG dashboards, manifest."""
    _, _, dirs = deliverable
    dest = dirs[0]
    names = {p.name for p in dest.iterdir()}

    assert "RESEARCH_SUMMARY.md" in names
    assert "EXECUTIVE_SUMMARY.txt" in names
    assert "PERFORMANCE.txt" in names
    assert "SUMMARY.md" in names  # package manifest + training-log digest
    assert "training_log.csv" in names

    # one JSON per analysis section (incl. the two-run comparison)
    for section in ("inspect", "temporal", "sparsity", "importance",
                    "attribution", "failure", "global_cues", "probe",
                    "handcrafted", "overlap", "compare"):
        assert f"{section}.json" in names, f"missing {section}.json"
        json.loads((dest / f"{section}.json").read_text())

    pngs = [n for n in names if n.endswith(".png")]
    assert len(pngs) >= 4, f"expected PNG dashboards, found {pngs}"


def test_research_summary_has_measured_tables(deliverable):
    _, _, dirs = deliverable
    text = (dirs[0] / "RESEARCH_SUMMARY.md").read_text()
    assert "Jaccard similarity" in text
    assert "Feature lifetime" in text
    assert "Optimal window" in text
    assert "primary vs" in text  # the two-run comparison table
    # measured numbers, not placeholders
    assert "%" in text and "nan" not in text.lower()


def test_compare_section_contains_both_variants(deliverable):
    _, _, dirs = deliverable
    cmp_rep = json.loads((dirs[0] / "compare.json").read_text())
    assert "primary" in cmp_rep and "secondary" in cmp_rep
    assert "delta" in cmp_rep and cmp_rep["delta"]
    for v in cmp_rep["delta"].values():
        assert np.isfinite(v)
