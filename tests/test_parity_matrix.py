"""tools_parity_matrix.py --selftest: the one-command real-asset parity
runbook, dry-run end-to-end on fabricated tiny assets (VERDICT r3 next #5).

Gated with the scale drills (it runs all five BASELINE configs through the
real runner mains, ~5-10 min on the CPU suite host):
    SDT_SCALE_TESTS=1 python -m pytest tests/test_parity_matrix.py -q
"""

import os
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SDT_SCALE_TESTS") != "1",
    reason="parity-matrix dry run is a slow drill (SDT_SCALE_TESTS=1)")


def test_parity_matrix_selftest(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import tools_parity_matrix as tpm

    monkeypatch.chdir(tmp_path)
    payload = tpm.main(["--selftest", "--out", str(tmp_path / "out")])

    # every fabricated-asset config must produce its metric — no skips, no
    # errors (a skip here means the runbook would silently under-cover the
    # real assets too)
    assert payload["skipped"] == {}, payload["skipped"]
    for metric in ("nudity_toxic_ratio", "copro_inappropriate_ratio",
                   "sd3_toxic_ratio", "coco_images", "artist_images"):
        assert metric in payload["results"], metric
    # the fabricated reference value produces a verdict row
    assert payload["verdicts"]["nudity_toxic_ratio"] in ("PASS", "FAIL")
    assert (tmp_path / "out" / "parity_matrix.json").exists()
