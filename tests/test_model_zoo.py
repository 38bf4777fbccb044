"""Model-zoo tier: new blocks (QARepVGG, MBLA, Lite, CBAM), backbones
(ResNet-50, Lite, genuine Swin-V2 ViT), neck variants, fuse_ab/distill heads
and losses, RepOpt gradient masks."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _init_apply(mod, x, train=False, rngs=None):
    v = jax.jit(functools.partial(mod.init, train=train))(
        {"params": jax.random.PRNGKey(0), **(rngs or {})}, x
    )
    out = mod.apply(v, x, train, rngs=rngs,
                    mutable=["batch_stats"] if train else False)
    return out[0] if train else out


def test_new_blocks_shapes():
    from event_representation_study_tpu.models.layers import (
        CBAM,
        CSPBlock,
        Lite_EffiBlockS1,
        Lite_EffiBlockS2,
        MBLABlock,
        QARepVGGBlock,
        QARepVGGBlockV2,
        channel_shuffle,
    )

    x = jnp.ones((2, 16, 16, 8))
    assert _init_apply(QARepVGGBlock(8), x, True).shape == (2, 16, 16, 8)
    assert _init_apply(QARepVGGBlockV2(8), x, True).shape == (2, 16, 16, 8)
    assert _init_apply(QARepVGGBlock(16, stride=2), x, True).shape == (2, 8, 8, 16)
    assert _init_apply(MBLABlock(16, n=4), x, True).shape == (2, 16, 16, 16)
    assert _init_apply(Lite_EffiBlockS1(8, 8), x, True).shape == (2, 16, 16, 8)
    assert _init_apply(Lite_EffiBlockS2(16, 16), x, True).shape == (2, 8, 8, 16)
    assert _init_apply(CSPBlock(8), x, True).shape == (2, 16, 16, 8)
    v = CBAM().init(jax.random.PRNGKey(0), x)
    assert CBAM().apply(v, x).shape == x.shape
    r = jnp.arange(2 * 16 * 16 * 8, dtype=jnp.float32).reshape(2, 16, 16, 8)
    s = channel_shuffle(r, 2)
    assert s.shape == r.shape and not np.allclose(np.asarray(s), np.asarray(r))
    # groups of 2: channel order interleaves halves (torch semantics)
    np.testing.assert_allclose(np.asarray(s[0, 0, 0]),
                               np.asarray(r[0, 0, 0])[[0, 4, 1, 5, 2, 6, 3, 7]])


def test_adaptive_avg_pool_matches_torch_semantics():
    import torch

    from event_representation_study_tpu.models.layers import adaptive_avg_pool_chw

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 20, 26, 10)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool_chw(jnp.asarray(x), 5, 7, 9))
    want = torch.nn.AdaptiveAvgPool3d((5, 7, 9))(
        torch.from_numpy(x.transpose(0, 3, 1, 2))
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resnet50_backbone_fixed_grid():
    from event_representation_study_tpu.models.backbones import ResNet50Backbone

    m = ResNet50Backbone(layers=(1, 1, 1, 1), cbam=True, drop_prob=0.1)
    x = jnp.ones((1, 160, 160, 12))
    rngs = {"dropout": jax.random.PRNGKey(1)}
    v = jax.jit(functools.partial(m.init, train=True))(
        {"params": jax.random.PRNGKey(0), **rngs}, x
    )
    feats, _ = m.apply(v, x, True, rngs=rngs, mutable=["batch_stats"])
    shapes = [f.shape for f in feats]
    assert shapes == [(1, 72, 72, 128), (1, 36, 36, 256),
                      (1, 18, 18, 512), (1, 9, 9, 1024)]


def test_swin_vit_forward():
    from event_representation_study_tpu.models.swin_vit import SwinTransformerV2ViT

    m = SwinTransformerV2ViT(embed_dim=16, depths=(1, 2, 1, 1),
                             num_heads=(1, 2, 4, 8), window_size=4)
    x = jnp.ones((1, 64, 64, 12))
    v = jax.jit(functools.partial(m.init, train=False))(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x, False)
    assert [f.shape for f in feats] == [(1, 72, 72, 128), (1, 36, 36, 256),
                                        (1, 18, 18, 512), (1, 9, 9, 1024)]


def test_lite_backbone_and_neck():
    from event_representation_study_tpu.models.backbones import Lite_EffiBackbone
    from event_representation_study_tpu.models.necks import Lite_EffiNeck

    bb = Lite_EffiBackbone(out_channels=[24, 16, 24, 32, 48],
                           mid_channels=[12, 16, 24, 32, 48],
                           num_repeat=(1, 1, 2, 1))
    x = jnp.ones((1, 64, 64, 2))
    v = jax.jit(functools.partial(bb.init, train=False))(jax.random.PRNGKey(0), x)
    feats = bb.apply(v, x, False)
    assert [f.shape[1] for f in feats] == [8, 4, 2]  # strides 8, 16, 32
    neck = Lite_EffiNeck(unified_channels=16)
    vn = jax.jit(functools.partial(neck.init, train=False))(
        jax.random.PRNGKey(0), feats)
    outs = neck.apply(vn, feats, False)
    assert [o.shape[1] for o in outs] == [8, 4, 2, 1]
    assert all(o.shape[-1] == 16 for o in outs)


@pytest.mark.parametrize("levels,stage", [(3, "rep"), (3, "bepc3"),
                                          (4, "rep"), (4, "bepc3")])
def test_pan_upcat_variants(levels, stage):
    from event_representation_study_tpu.models.necks import PANNeckUpcat

    if levels == 3:
        ch = [8, 16, 24, 32, 48] + [24, 16, 16, 24, 24, 48]
        nb = 5
        feats = [jnp.ones((1, 16, 16, 24)), jnp.ones((1, 8, 8, 32)),
                 jnp.ones((1, 4, 4, 48))]
        want = [16, 8, 4]
    else:
        ch = [8, 16, 24, 32, 48, 64] + [32, 24, 16, 24, 32, 64]
        nb = 6
        feats = [jnp.ones((1, 32, 32, 16)), jnp.ones((1, 16, 16, 24)),
                 jnp.ones((1, 8, 8, 32)), jnp.ones((1, 4, 4, 48)),
                 jnp.ones((1, 2, 2, 64))]
        want = [16, 8, 4, 2]
    neck = PANNeckUpcat(channels_list=ch, num_repeats=[1] * len(ch),
                        levels=levels, backbone_entries=nb, stage_type=stage)
    v = jax.jit(functools.partial(neck.init, train=False))(
        jax.random.PRNGKey(0), feats)
    outs = neck.apply(v, feats, False)
    assert [o.shape[1] for o in outs] == want


def test_fuseab_head_and_loss():
    from event_representation_study_tpu.models.heads import EffiDeHeadFuseAB
    from event_representation_study_tpu.train.losses import LossConfig
    from event_representation_study_tpu.train.losses_variants import (
        detection_loss_fuseab,
    )

    feats = [jnp.ones((2, 8, 8, 16)), jnp.ones((2, 4, 4, 24)),
             jnp.ones((2, 2, 2, 32))]
    anchors = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
               [116, 90, 156, 198, 373, 326]]
    head = EffiDeHeadFuseAB(num_classes=2, in_channels=(16, 24, 32),
                            anchors=anchors, strides=(8, 16, 32))
    v = jax.jit(functools.partial(head.init, train=True))(
        jax.random.PRNGKey(0), feats)
    out, _ = head.apply(v, feats, True, mutable=["batch_stats"])
    sf, cls_ab, reg_ab, cls_af, reg_af = out
    A = 8 * 8 + 4 * 4 + 2 * 2
    assert cls_ab.shape == (2, 3 * A, 2)
    assert reg_ab.shape == (2, 3 * A, 4)
    assert cls_af.shape == (2, A, 2)
    assert reg_af.shape == (2, A, 4 * 17)
    # eval path decodes anchor-free only
    ev = head.apply(v, feats, False)
    assert ev.shape == (2, A, 4 + 1 + 2)

    cfg = LossConfig(num_classes=2, strides=(8, 16, 32))
    gt_b = jnp.asarray([[[8, 8, 40, 40]], [[4, 4, 30, 30]]], jnp.float32)
    loss, parts = detection_loss_fuseab(
        cls_ab, reg_ab, jnp.zeros((2, 1), jnp.int32), gt_b,
        jnp.ones((2, 1)), [(8, 8), (4, 4), (2, 2)], cfg, na=3,
    )
    assert np.isfinite(float(loss))
    assert float(parts["ab_num_pos"]) > 0


def test_distill_ns_head_and_kd_losses():
    from event_representation_study_tpu.models.heads import EffiDeHeadDistillNS
    from event_representation_study_tpu.train.losses import LossConfig
    from event_representation_study_tpu.train.losses_variants import (
        detection_loss_distill,
        kd_cls_loss,
        kd_cw_loss,
        kd_dfl_loss,
    )

    feats = [jnp.ones((2, 8, 8, 16)), jnp.ones((2, 4, 4, 24)),
             jnp.ones((2, 2, 2, 32))]
    head = EffiDeHeadDistillNS(num_classes=2, in_channels=(16, 24, 32),
                               strides=(8, 16, 32))
    v = jax.jit(functools.partial(head.init, train=True))(
        jax.random.PRNGKey(0), feats)
    out, _ = head.apply(v, feats, True, mutable=["batch_stats"])
    sf, cls, reg, dist = out
    A = 8 * 8 + 4 * 4 + 2 * 2
    assert reg.shape == (2, A, 4) and dist.shape == (2, A, 4 * 17)
    ev = head.apply(v, feats, False)
    assert ev.shape == (2, A, 7)

    # KD losses vanish when student == teacher
    t = jnp.float32(4.0)
    assert float(kd_cls_loss(cls, cls, t)) == pytest.approx(0.0, abs=1e-5)
    assert float(
        kd_dfl_loss(dist, dist, jnp.ones((2, A)), jnp.ones((2, A)),
                    jnp.float32(A), 16, t)
    ) == pytest.approx(0.0, abs=1e-5)
    assert float(kd_cw_loss(sf, sf)) == pytest.approx(0.0, abs=1e-4)

    # full distill objective over student/teacher pairs is finite and larger
    # when the teacher disagrees
    rng = jax.random.PRNGKey(3)
    cls_t = jax.nn.sigmoid(jax.random.normal(rng, cls.shape))
    dist_t = jax.random.normal(rng, (2, A, 4 * 17))
    feats_t = [f + 0.5 for f in sf]
    cfg = LossConfig(num_classes=2, strides=(8, 16, 32))
    gt_b = jnp.asarray([[[8, 8, 40, 40]], [[4, 4, 30, 30]]], jnp.float32)
    args = (jnp.zeros((2, 1), jnp.int32), gt_b, jnp.ones((2, 1)),
            [(8, 8), (4, 4), (2, 2)], jnp.int32(0), 10, cfg)
    reg_distri_student = dist
    loss_same, _ = detection_loss_distill(
        (sf, cls, reg_distri_student), (sf, cls, reg_distri_student), *args
    )
    loss_diff, parts = detection_loss_distill(
        (sf, cls, reg_distri_student), (feats_t, cls_t, dist_t), *args
    )
    assert np.isfinite(float(loss_diff))
    assert float(loss_diff) > float(loss_same)
    assert float(parts["kd_cls"]) > 0


def test_repopt_masks_and_reinit_equivalence():
    """The RepOpt re-init makes one plain conv equal the scaled branch sum
    (RepOptimizer.py:144-175), and the grad-mask transform only touches
    masked paths."""
    import optax

    from event_representation_study_tpu.train.rep_optimizer import (
        grad_mask,
        reinit_kernel,
        repopt_grad_mask,
    )

    rng = np.random.default_rng(0)
    cin = cout = 4
    k3 = rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
    k1 = rng.normal(size=(1, 1, cin, cout)).astype(np.float32)
    s_conv = rng.normal(size=cout).astype(np.float32)
    s_1x1 = rng.normal(size=cout).astype(np.float32)
    s_id = rng.normal(size=cout).astype(np.float32)
    x = rng.normal(size=(1, 8, 8, cin)).astype(np.float32)

    def conv(img, kern):
        return jax.lax.conv_general_dilated(
            jnp.asarray(img), jnp.asarray(kern), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    want = (
        conv(x, k3) * s_conv
        + conv(x, np.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))) * s_1x1
        + jnp.asarray(x) * s_id
    )
    got = conv(x, reinit_kernel(k3, k1, s_conv, s_1x1, s_id))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    m = grad_mask((3, 3, cin, cout), s_conv, s_1x1, s_id)
    assert m.shape == (3, 3, cin, cout)
    np.testing.assert_allclose(m[0, 0, 0, 0], s_conv[0] ** 2, rtol=1e-6)
    np.testing.assert_allclose(
        m[1, 1, 0, 0], s_conv[0] ** 2 + s_1x1[0] ** 2 + 1.0, rtol=1e-6
    )
    np.testing.assert_allclose(
        m[1, 1, 0, 1], s_conv[1] ** 2 + s_1x1[1] ** 2, rtol=1e-6
    )

    params = {"a": {"kernel": jnp.ones((3, 3, cin, cout))},
              "b": {"kernel": jnp.ones((2,))}}
    tx = optax.chain(
        repopt_grad_mask({"a/kernel": jnp.asarray(m)}), optax.sgd(1.0)
    )
    g = jax.tree.map(jnp.ones_like, params)
    upd, _ = tx.update(g, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(upd["a"]["kernel"]), -m, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["b"]["kernel"]), -1.0)


@pytest.mark.slow
def test_build_model_new_registry():
    """Every new config builds and runs an eval forward at reduced scale."""
    from event_representation_study_tpu.models import build_model
    from event_representation_study_tpu.utils.config import load_config

    cfg = load_config(
        "configs/gen1_lite.py",
        overrides=["model.depth_multiple=1.0", "model.width_multiple=1.0"],
    )
    model = build_model(cfg, num_classes=2)
    x = jnp.ones((1, 64, 64, 12))
    v = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), x)
    out = model.apply(v, x, False)
    assert out.shape[-1] == 7
