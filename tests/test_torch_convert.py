"""Torch-checkpoint import: a synthetic reference-style state_dict (built
with torch modules so layouts are authentic) must convert onto the model
tree with every shape matching, and a converted ConvBNAct must reproduce
torch's forward exactly."""
import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tree_paths(d, prefix=()):
    for k, v in d.items():
        if isinstance(v, dict):
            yield from _tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def test_convbn_forward_parity():
    import jax
    import jax.numpy as jnp
    import torch.nn as tnn

    from event_representation_study_tpu.models.layers import ConvBNAct
    from event_representation_study_tpu.utils.torch_convert import convert_state_dict

    tconv = tnn.Sequential()
    tconv.add_module("conv", tnn.Conv2d(4, 8, 3, stride=2, padding=1, bias=False))
    tconv.add_module("bn", tnn.BatchNorm2d(8))
    tconv.eval()
    with torch.no_grad():
        tconv.bn.running_mean.uniform_(-0.5, 0.5)
        tconv.bn.running_var.uniform_(0.5, 1.5)
        tconv.bn.weight.uniform_(0.5, 1.5)
        tconv.bn.bias.uniform_(-0.5, 0.5)

    sd = {f"m.{k}": v for k, v in tconv.state_dict().items()}
    params, batch_stats = convert_state_dict(sd)

    x = np.random.default_rng(0).normal(size=(2, 16, 16, 4)).astype(np.float32)
    mod = ConvBNAct(8, 3, 2, act="silu")
    out = mod.apply(
        {"params": params["m"], "batch_stats": batch_stats["m"]},
        jnp.asarray(x), False,
    )
    with torch.no_grad():
        want = tnn.functional.silu(tconv(torch.tensor(x.transpose(0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.asarray(out), want.numpy().transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-5
    )


def test_full_model_name_mapping():
    """Synthesize a reference-style state_dict from our model tree's inverse
    transforms and reference names; conversion must round-trip every shape."""
    import jax
    import jax.numpy as jnp

    from event_representation_study_tpu.models import build_model
    from event_representation_study_tpu.utils.config import load_config
    from event_representation_study_tpu.utils.torch_convert import (
        convert_state_dict,
        verify_against_tree,
    )

    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )
    model = build_model(cfg, num_classes=2)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False),
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 12)),
    )

    # inverse name map: our path -> reference torch key
    def to_torch_key(path):
        name = ".".join(path)
        import re

        name = re.sub(r"^backbone\.down_(\d)\.", lambda m: f"backbone.ERBlock_{int(m.group(1))+1}.0.", name)
        name = re.sub(r"^backbone\.stage_(\d)\.", lambda m: f"backbone.ERBlock_{int(m.group(1))+1}.1.", name)
        name = re.sub(r"^backbone\.sppf\.", "backbone.ERBlock_6.2.sppf.", name)
        name = re.sub(r"^head\.stem_(\d)\.", lambda m: f"detect.stems.{m.group(1)}.", name)
        name = re.sub(r"^head\.cls_conv_(\d)\.", lambda m: f"detect.cls_convs.{m.group(1)}.", name)
        name = re.sub(r"^head\.reg_conv_(\d)\.", lambda m: f"detect.reg_convs.{m.group(1)}.", name)
        name = re.sub(r"^head\.cls_pred_(\d)\.", lambda m: f"detect.cls_preds.{m.group(1)}.", name)
        name = re.sub(r"^head\.reg_pred_(\d)\.", lambda m: f"detect.reg_preds.{m.group(1)}.", name)
        name = name.replace(".upsample.upsample.", ".upsample.upsample_transpose.")
        name = re.sub(r"\.m\.block_(\d+)\.", lambda m: f".m.block.{m.group(1)}.", name)
        name = name.replace(".conv.kernel", ".block.conv.weight")
        name = name.replace(".bn.scale", ".block.bn.weight")
        name = name.replace(".bn.bias", ".block.bn.bias")
        name = name.replace(".bn.mean", ".block.bn.running_mean")
        name = name.replace(".bn.var", ".block.bn.running_var")
        name = name.replace(".kernel", ".weight")
        return name

    sd = {}
    for path, leaf in _tree_paths(variables["params"]):
        shape = leaf.shape
        arr = np.zeros(shape, np.float32)
        key = to_torch_key(path)
        if key.endswith(".weight") and len(shape) == 4:
            if "upsample_transpose" in key:
                arr = np.zeros((shape[2], shape[3], shape[0], shape[1]), np.float32)
            else:
                arr = np.zeros((shape[3], shape[2], shape[0], shape[1]), np.float32)
        sd[key] = arr
    for path, leaf in _tree_paths(variables.get("batch_stats", {})):
        sd[to_torch_key(path)] = np.zeros(leaf.shape, np.float32)

    params, batch_stats = convert_state_dict(sd)
    assert "__unmatched__" not in params, params.get("__unmatched__")
    problems = verify_against_tree(params, variables["params"])
    assert not problems, problems[:10]
    problems = verify_against_tree(batch_stats, variables.get("batch_stats", {}))
    assert not problems, problems[:10]
