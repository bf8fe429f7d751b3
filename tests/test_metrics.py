import numpy as np

import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.eval import (
    AverageMeter,
    confusion_matrix,
    intersection_and_union,
)


def _reference_iu(output, target, K, ignore_index=255):
    """numpy port of utility.py:133-146 as the oracle."""
    output = output.reshape(-1).copy()
    target = target.reshape(-1)
    output[target == ignore_index] = 255
    intersection = output[output == target]
    area_intersection, _ = np.histogram(intersection, bins=np.arange(K + 1))
    area_output, _ = np.histogram(output, bins=np.arange(K + 1))
    area_target, _ = np.histogram(target, bins=np.arange(K + 1))
    area_union = area_output + area_target - area_intersection
    return area_intersection, area_union, area_target, area_output


def test_intersection_union_matches_reference(rng):
    K = 5
    out = rng.randint(0, K, size=(2, 16, 16)).astype(np.int32)
    tgt = rng.randint(0, K, size=(2, 16, 16)).astype(np.int32)
    tgt[0, :4] = 255
    inter, union, t, o = intersection_and_union(jnp.asarray(out), jnp.asarray(tgt), K)
    ri, ru, rt, ro = _reference_iu(out, tgt, K)
    np.testing.assert_array_equal(np.asarray(inter), ri)
    np.testing.assert_array_equal(np.asarray(union), ru)
    np.testing.assert_array_equal(np.asarray(t), rt)
    np.testing.assert_array_equal(np.asarray(o), ro)


def test_confusion_matrix_bincount(rng):
    K = 4
    pred = rng.randint(0, K, size=(100,)).astype(np.int32)
    tgt = rng.randint(0, K, size=(100,)).astype(np.int32)
    tgt[:10] = 255
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(tgt), K))
    ref = np.zeros((K, K), np.int64)
    for t, p in zip(tgt, pred):
        if t != 255:
            ref[t, p] += 1
    np.testing.assert_array_equal(cm, ref)


def test_average_meter_perfect_prediction():
    m = AverageMeter(2)
    inter = np.array([10.0, 5.0])
    m.update(inter, inter, inter, inter)  # perfect: union == intersection
    s = m.summary()
    assert abs(s["macro_miou"] - 1.0) < 1e-6
    assert abs(s["micro_mf1"] - 1.0) < 1e-6


def test_plot_helpers(tmp_path, rng):
    from rnd_semantic_segmentation_tpu.utils.plots import (
        LineChartPlotter, plot_confusion_matrix, preds2ignorepreds,
        threshold_mask)
    assert threshold_mask(np.array([100, 200]), 128).tolist() == [0, 1]
    gt = np.array([[7, 8], [0, 33]])
    pd = np.array([[0, 1], [2, 3]])
    g2, p2 = preds2ignorepreds({"7": 0, "8": 1, "33": 18}, gt, pd)
    assert g2.tolist() == [[0, 1], [255, 18]]
    assert p2.tolist() == [[0, 1], [255, 3]]
    cm = rng.rand(3, 3) * 100
    out = plot_confusion_matrix(cm, ["a", "b", "c"],
                                out_path=str(tmp_path / "cm.png"))
    import os
    assert os.path.exists(out)
    lp = LineChartPlotter("t", "x", "y", str(tmp_path / "lc.png"))
    lp.add_chart({"x": [0, 1], "y": [1.0, 0.5], "label": "loss"})
    lp.display()
    assert os.path.exists(tmp_path / "lc.png")


def test_cal_params_flops():
    """XLA cost-model FLOPs counter (the thop CalParams replacement)."""
    import jax
    import jax.numpy as jnp
    from rnd_semantic_segmentation_tpu.utils.profiling import (
        cal_params, clever_format, count_params)

    def f(w, x):
        return x @ w

    w = jnp.zeros((64, 128), jnp.float32)
    x = jnp.zeros((32, 64), jnp.float32)
    stats = cal_params(f, w, x)
    # 2*M*N*K = 2*32*128*64 = 524288 flops
    assert abs(stats["flops"] - 524288) / 524288 < 0.5
    assert count_params({"w": w}) == 64 * 128
    assert clever_format(1_500_000) == "1.500M"
