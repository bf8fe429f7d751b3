import json
import os

import numpy as np

from rnd_semantic_segmentation_tpu.eval.pr_curves import dump_pr_curves, pr_curve


def test_pr_curve_perfect_classifier():
    preds = np.array([0.9, 0.8, 0.2, 0.1])
    labels = np.array([1, 1, 0, 0])
    c = pr_curve(preds, labels, num_thresholds=11)
    # at threshold 0.5: tp=2, predicted pos=2 -> precision 1, recall 1
    i = c["thresholds"].index(0.5)
    assert c["precision"][i] == 1.0
    assert c["recall"][i] == 1.0


def test_dump_pr_curves(tmp_path, rng):
    pred = rng.rand(500, 3).astype(np.float32)
    pred /= pred.sum(axis=1, keepdims=True)
    label = rng.randint(0, 3, size=(500,))
    curves = dump_pr_curves(pred, label, {"0": "bg", "1": "a", "2": "b"},
                            str(tmp_path))
    assert set(curves) == {"bg", "a", "b"}
    assert os.path.exists(tmp_path / "pr_curves.json")
    data = json.load(open(tmp_path / "pr_curves.json"))
    assert len(data["bg"]["precision"]) == 127
