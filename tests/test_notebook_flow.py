"""The clip_en/clip_cn/merge_dataset notebook flow runs end to end
(examples/notebook_flow.py) — structure gates only; golden numbers await
real weights via `mmrs parity`."""

import pytest
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.mark.slow
def test_notebook_flow_end_to_end(tmp_path):
    from examples.notebook_flow import main

    s = main(root=str(tmp_path), n_per_class=6)
    # prototype-calibrated thresholds must separate the synthetic colors
    assert s["en_calibrated_f1"] > 0.9
    assert s["cn_calibrated_f1"] > 0.9
    # union may only add recall; the verifier filter may only add precision
    assert s["union_recall"] >= s["en_calibrated_f1"] - 1.0  # structural
    assert s["filtered_precision"] >= s["union_precision"] - 1e-9
    # zero-shot sections ran and produced probabilities
    assert 0.0 <= s["six_way_acc"] <= 1.0
