"""Aux subsystems: learned representation, RepVGG fusion, export, viz."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_learned_representation_trains():
    from event_representation_study_tpu.events import (
        from_structured,
        generate_fake_events,
        stack_blocks,
    )
    from event_representation_study_tpu.models.learned_repr import (
        QuantizationLayer,
        ValueLayer,
        pretrain_value_layer,
        trilinear_kernel,
    )

    # pretraining fits the trilinear kernel
    params = pretrain_value_layer(jax.random.PRNGKey(1), num_channels=12, steps=200)
    ts = jnp.linspace(-0.3, 0.3, 64)
    pred = ValueLayer().apply({"params": params}, ts)
    err = float(jnp.abs(pred - trilinear_kernel(ts, 12)).mean())
    assert err < 0.1, err

    # quantization layer: differentiable end-to-end
    H, W = 32, 48
    evs = [generate_fake_events(500, H, W, seed=i) for i in range(2)]
    blocks = stack_blocks([from_structured(e, 512) for e in evs])
    layer = QuantizationLayer(num_bins=4, height=H, width=W)
    variables = layer.init(jax.random.PRNGKey(0), blocks)
    out = layer.apply(variables, blocks)
    assert out.shape == (2, H, W, 8)

    def loss(p):
        return jnp.sum(layer.apply({"params": p}, blocks) ** 2)

    g = jax.grad(loss)(variables["params"])
    gnorm = float(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_repvgg_fusion_equivalence():
    from event_representation_study_tpu.models.layers import RepVGGBlock
    from event_representation_study_tpu.utils.reparam import fuse_repvgg_block

    block = RepVGGBlock(out_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    variables = block.init(jax.random.PRNGKey(1), x, False)
    # put nontrivial BN stats
    bs = jax.tree.map(
        lambda a: a + 0.3 * jax.random.uniform(jax.random.PRNGKey(2), a.shape),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    want = block.apply(variables, x, False)
    kernel, bias = fuse_repvgg_block(variables["params"], variables["batch_stats"])
    got = jax.nn.relu(
        jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + bias
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_export_roundtrip(tmp_path):
    from event_representation_study_tpu.utils.export import (
        export_serving_graph,
        load_serving_graph,
    )

    def f(x):
        return jnp.tanh(x) * 2.0

    x = jnp.ones((4, 8))
    path = tmp_path / "serving.bin"
    export_serving_graph(f, x, path)
    g = load_serving_graph(path)
    np.testing.assert_allclose(np.asarray(g(x)), np.asarray(f(x)), rtol=1e-6)


def test_viz_binary_histo_and_boxes():
    from event_representation_study_tpu.events import generate_fake_events
    from event_representation_study_tpu.utils.viz import draw_boxes, make_binary_histo

    ev = generate_fake_events(500, 40, 60, seed=0)
    img = make_binary_histo(ev, 40, 60)
    assert img.shape == (40, 60, 3)
    assert set(np.unique(img)) <= {0, 127, 255}
    out = draw_boxes(img, np.array([[5, 5, 20, 20]]))
    assert (out[5, 5:20] == (0, 255, 0)).all()


def test_gwd_correlation_figure(tmp_path):
    from event_representation_study_tpu.utils.viz import gwd_map_correlation_figure

    gwd = {"a": 0.3, "b": 0.4, "c": 0.6}
    mAP = {"a": 0.5, "b": 0.44, "c": 0.35}
    fig, r = gwd_map_correlation_figure(gwd, mAP, path=tmp_path / "fig.png")
    assert r < -0.9  # anti-correlated by construction
    assert (tmp_path / "fig.png").exists()


@pytest.mark.slow
def test_get_model_info():
    """The reference's thop "Model Summary" analog (torch_utils.py:97-112):
    params in M + GFLOPs from a 64x64 probe scaled to img_size."""
    import re

    import jax
    import jax.numpy as jnp

    from event_representation_study_tpu.models import build_model
    from event_representation_study_tpu.utils.config import load_config
    from event_representation_study_tpu.utils.profiling import get_model_info

    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )
    m = build_model(cfg, num_classes=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 12)), True)
    info = get_model_info(
        m, {"params": v["params"], "batch_stats": v["batch_stats"]},
        img_size=640, channels=12)
    g = re.match(r"Params: ([\d.]+)M(, Gflops: ([\d.]+))?", info)
    assert g, info
    assert float(g.group(1)) > 0.5
    if g.group(3):  # cost analysis available on this backend
        # quadratic scaling: 640^2/64^2 = 100x the probe
        info64 = get_model_info(
            m, {"params": v["params"], "batch_stats": v["batch_stats"]},
            img_size=64, channels=12)
        g64 = re.match(r".*Gflops: ([\d.]+)", info64)
        # 100x modulo the 2-decimal formatting of the small probe value
        ratio = float(g.group(3)) / max(float(g64.group(1)), 1e-9)
        assert 70 < ratio < 140, info64
