"""Detector model stack: shapes, parameter scale, NMS semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_representation_study_tpu.models import build_model
from event_representation_study_tpu.ops.nms import non_max_suppression
from event_representation_study_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def cfg():
    # scaled-down variant: full graph topology, CPU-testable size
    return load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )


@pytest.fixture(scope="module")
def small_model(cfg):
    import functools

    model = build_model(cfg, num_classes=2)
    x = jnp.zeros((1, 128, 128, 12))
    # jitted init: eager init dispatches hundreds of individually-compiled
    # convs on CPU (~10x slower than one fused compile)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), x
    )
    return model, variables


def test_eval_output_shape(small_model):
    model, variables = small_model
    x = jnp.zeros((2, 128, 128, 12))
    out = model.apply(variables, x, False)
    a = 16**2 + 8**2 + 4**2 + 2**2
    assert out.shape == (2, a, 7)  # 4 box + 1 obj + 2 cls
    assert np.all(np.asarray(out[..., 4]) == 1.0)


def test_train_output_shapes(small_model):
    model, variables = small_model
    x = jnp.zeros((2, 128, 128, 12))
    (feats, cls, reg), _ = model.apply(x=x, train=True, variables=variables, mutable=["batch_stats"])
    a = 16**2 + 8**2 + 4**2 + 2**2
    assert cls.shape == (2, a, 2)
    assert reg.shape == (2, a, 4 * 17)
    assert [f.shape[-1] for f in feats] == [16, 32, 64, 128]  # width x0.125


def test_cls_bias_prior(small_model):
    """Class logits start near the prior probability (effidehead.py:60-67)."""
    model, variables = small_model
    x = jnp.zeros((1, 128, 128, 12))
    out = model.apply(variables, x, False)
    cls = np.asarray(out[..., 5:])
    np.testing.assert_allclose(cls, 0.01, atol=5e-3)


def test_nms_basic():
    # two overlapping boxes same class -> keep best; one separate other class
    def cand(cx, cy, w, h, c0, c1):
        return [cx, cy, w, h, 1.0, c0, c1]

    pred = jnp.asarray(
        [[
            cand(50, 50, 20, 20, 0.9, 0.0),
            cand(52, 50, 20, 20, 0.8, 0.0),   # iou ~0.8 with first -> suppressed
            cand(150, 150, 30, 30, 0.0, 0.7),
            cand(250, 250, 10, 10, 0.01, 0.0),  # below conf
        ]]
    )
    dets, n = non_max_suppression(pred, conf_thres=0.03, iou_thres=0.65, max_det=10,
                                  pre_nms_topk=8)
    assert int(n[0]) == 2
    d = np.asarray(dets[0])
    assert d[0, 4] == pytest.approx(0.9)
    assert d[0, 5] == 0.0
    assert d[1, 4] == pytest.approx(0.7)
    assert d[1, 5] == 1.0


def test_nms_cross_class_no_suppression():
    def cand(cx, cy, w, h, c0, c1):
        return [cx, cy, w, h, 1.0, c0, c1]

    pred = jnp.asarray([[cand(50, 50, 20, 20, 0.9, 0.85)]])
    dets, n = non_max_suppression(pred, conf_thres=0.03, iou_thres=0.65, max_det=10,
                                  pre_nms_topk=4)
    # multi-label: same box detected for both classes, no cross-class NMS
    assert int(n[0]) == 2
