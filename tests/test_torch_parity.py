"""Full-scale forward parity against the reference torch detector.

Instantiates the REFERENCE model (imported read-only from
/root/reference/ev-YOLOv6, paper config swinv2_yolov6l6_finetune = conv_silu
CSP backbone + CSPRepBiFPANNeck_P6 + 4-level DFL head), converts its live
state_dict through utils/torch_convert.py, and asserts the decoded eval
outputs (B, A, 4+1+nc) of the two frameworks agree at 640x640 — the de-risk
for the 0.506-mAP claim (VERDICT r1 item 3). Numerics: both run f32 on CPU;
only conv/BN/SiLU/sigmoid/softmax are involved, so parity is tight.
"""
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: see pytest.ini fast lane

torch = pytest.importorskip("torch")

REF = "/root/reference/ev-YOLOv6"


def _stub_modules():
    """The reference imports wandb/addict at module scope; neither is
    installed (nor needed for a forward pass) — provide minimal stand-ins."""
    if "wandb" not in sys.modules:
        w = types.ModuleType("wandb")
        w.init = w.log = w.watch = lambda *a, **k: None
        sys.modules["wandb"] = w
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            p = types.ModuleType("pkg_resources")
            p.parse_version = lambda v: tuple(v.split("."))
            sys.modules["pkg_resources"] = p
    if "timm" not in sys.modules:
        try:
            import timm  # noqa: F401
        except ImportError:
            t = types.ModuleType("timm")
            tm = types.ModuleType("timm.models")
            tl = types.ModuleType("timm.models.layers")

            class DropPath(torch.nn.Module):
                def __init__(self, drop_prob=0.0):
                    super().__init__()
                    self.drop_prob = drop_prob

                def forward(self, x):
                    if self.drop_prob == 0.0 or not self.training:
                        return x
                    keep = 1 - self.drop_prob
                    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                    mask = torch.floor(keep + torch.rand(shape, device=x.device))
                    return x / keep * mask

            tl.DropPath = DropPath
            tl.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
            tl.trunc_normal_ = torch.nn.init.trunc_normal_
            t.models = tm
            tm.layers = tl
            sys.modules["timm"] = t
            sys.modules["timm.models"] = tm
            sys.modules["timm.models.layers"] = tl
    if "addict" not in sys.modules:
        a = types.ModuleType("addict")

        class Dict(dict):
            def __init__(self, *args, **kwargs):
                super().__init__()
                for src in args + (kwargs,):
                    for k, v in dict(src).items():
                        self[k] = self._wrap(v)

            @classmethod
            def _wrap(cls, v):
                if isinstance(v, dict) and not isinstance(v, Dict):
                    return cls(v)
                if isinstance(v, (list, tuple)):
                    return type(v)(cls._wrap(x) for x in v)
                return v

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = self._wrap(v)

        a.Dict = Dict
        sys.modules["addict"] = a


@pytest.fixture(scope="module")
def reference_model():
    _stub_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from yolov6.models.yolo import Model
    from yolov6.utils.config import Config

    cfg = Config.fromfile(f"{REF}/configs/swinv2_yolov6l6_finetune.py")
    args = types.SimpleNamespace(representation="OptimizedRepresentation",
                                 img_size=640)
    torch.manual_seed(0)
    model = Model(cfg, channels=12, num_classes=2, fuse_ab=False,
                  distill_ns=False, args=args)
    model.eval().float()
    return model


def test_forward_parity_full_scale(reference_model):
    from event_representation_study_tpu.models import build_model
    from event_representation_study_tpu.utils.config import load_config
    from event_representation_study_tpu.utils.torch_convert import (
        convert_state_dict,
        verify_against_tree,
    )

    S = 640
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 12, S, S)).astype(np.float32)

    with torch.no_grad():
        out_t, _featmaps = reference_model(torch.from_numpy(x))
    out_t = out_t.numpy()  # (1, A, 4+1+nc) decoded xywh

    params, batch_stats = convert_state_dict(
        {k: v.numpy() for k, v in reference_model.state_dict().items()}
    )
    assert "__unmatched__" not in params, params.get("__unmatched__")

    import functools

    import jax
    import jax.numpy as jnp

    cfg = load_config("configs/gen1_optimized.py")
    model = build_model(cfg, num_classes=2)
    ref_tree = jax.eval_shape(
        functools.partial(model.init, train=False),
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 12)),
    )
    problems = verify_against_tree(params, ref_tree["params"])
    assert not problems, problems[:10]

    out_j = jax.jit(lambda v, im: model.apply(v, im, False))(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    out_j = np.asarray(out_j)

    assert out_j.shape == out_t.shape, (out_j.shape, out_t.shape)
    # boxes are xywh in input pixels; scores in [0, 1]
    box_diff = np.abs(out_j[..., :4] - out_t[..., :4]).max()
    cls_diff = np.abs(out_j[..., 5:] - out_t[..., 5:]).max()
    assert box_diff < 0.5, f"box decode diverges: {box_diff}"  # px at 640
    assert cls_diff < 1e-3, f"cls scores diverge: {cls_diff}"
    np.testing.assert_allclose(out_j[..., 4], out_t[..., 4], atol=1e-6)


def test_nms_coco_parity_on_converted_outputs(reference_model):
    """Continue the pipeline past decode: NMS + COCO accumulate on the
    jax outputs produced from converted weights (evaler.py:512-543 path)."""
    import functools

    import jax
    import jax.numpy as jnp

    from event_representation_study_tpu.metrics.coco import CocoEvaluator
    from event_representation_study_tpu.models import build_model
    from event_representation_study_tpu.ops.image import scale_coords_back
    from event_representation_study_tpu.ops.nms import non_max_suppression
    from event_representation_study_tpu.utils.config import load_config
    from event_representation_study_tpu.utils.torch_convert import convert_state_dict

    S = 640
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 12, S, S)).astype(np.float32)
    params, batch_stats = convert_state_dict(
        {k: v.numpy() for k, v in reference_model.state_dict().items()}
    )
    cfg = load_config("configs/gen1_optimized.py")
    model = build_model(cfg, num_classes=2)
    preds = jax.jit(lambda v, im: model.apply(v, im, False))(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    dets, counts = jax.jit(
        lambda p: non_max_suppression(p, conf_thres=0.03, iou_thres=0.65)
    )(preds)
    dets = np.asarray(dets)
    n = int(np.asarray(counts)[0])
    d = dets[0, :n].copy()
    d[:, :4] = scale_coords_back(d[:, :4], S, 240, 304)
    coco = CocoEvaluator(num_classes=2)
    g = np.array([[0, 10, 10, 60, 60]], float)
    coco.add_image(d, g)
    stats = coco.summarize()
    assert np.isfinite(stats["AP"])


def test_efficientrep_repvgg_parity(reference_model):
    """RepVGG-family conversion (rbr_dense/rbr_1x1/identity branches,
    RepBlock tails, SimSPPF) — feature-level parity for the EfficientRep
    backbone the non-paper configs use."""
    del reference_model  # only to reuse the module's sys.path/stub setup
    import functools

    import jax
    import jax.numpy as jnp

    from yolov6.models.efficientrep import EfficientRep as TorchEffRep

    from event_representation_study_tpu.models.backbones import EfficientRep
    from event_representation_study_tpu.utils.torch_convert import (
        convert_state_dict,
    )

    ch = [16, 32, 64, 64, 128]
    reps = [1, 2, 3, 2, 2]
    torch.manual_seed(1)
    tm = TorchEffRep(in_channels=12, channels_list=ch, num_repeats=reps,
                     fuse_P2=True)
    tm.eval().float()

    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (1, 12, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_feats = [f.numpy() for f in tm(torch.from_numpy(x))]

    state = {f"backbone.{k}": v.numpy() for k, v in tm.state_dict().items()}
    params, batch_stats = convert_state_dict(state)
    assert "__unmatched__" not in params, params.get("__unmatched__")

    jm = EfficientRep(channels_list=ch, num_repeats=reps, fuse_P2=True)
    ref_tree = jax.eval_shape(
        functools.partial(jm.init, train=False),
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 12)),
    )
    j_feats = jm.apply(
        {"params": params["backbone"], "batch_stats": batch_stats["backbone"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), False,
    )
    assert len(j_feats) == len(t_feats) == 4
    for jf, tf in zip(j_feats, t_feats):
        diff = np.abs(np.asarray(jf) - tf.transpose(0, 2, 3, 1)).max()
        assert diff < 2e-4, diff
