"""PTQ analog: int8 weight quantization round trip, fake-quant accuracy, and
activation calibration (the reference's calibrate path, engine.py:916-942)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_quantize_round_trip_and_error_bound():
    from event_representation_study_tpu.utils.quantize import (
        dequantize_params,
        fake_quant_params,
        quantize_params,
    )

    rng = np.random.default_rng(0)
    params = {
        "conv": {"kernel": rng.normal(0, 0.1, (3, 3, 8, 16)).astype(np.float32),
                 "bias": rng.normal(size=16).astype(np.float32)},
        "bn": {"scale": np.ones(16, np.float32)},
    }
    q, meta = quantize_params(params)
    assert "conv/kernel" in meta
    assert q["conv"]["kernel"]["q"].dtype == np.int8
    # bias / bn untouched
    np.testing.assert_array_equal(q["conv"]["bias"], params["conv"]["bias"])

    deq = dequantize_params(q)
    w = params["conv"]["kernel"]
    # per-channel symmetric int8: error bounded by scale/2 per channel
    scale = np.abs(w).max(axis=(0, 1, 2)) / 127
    err = np.abs(deq["conv"]["kernel"] - w)
    assert (err <= scale[None, None, None, :] * 0.5 + 1e-9).all()

    fq = fake_quant_params(params, skip=lambda name: name.startswith("conv"))
    np.testing.assert_array_equal(fq["conv"]["kernel"], w)  # skipped


@pytest.mark.slow
def test_fake_quant_detector_accuracy():
    """int8 weights perturb the tiny detector's decoded outputs only
    slightly — the PTQ-then-eval sanity the reference runs."""
    from event_representation_study_tpu.models import build_model
    from event_representation_study_tpu.utils.config import load_config
    from event_representation_study_tpu.utils.quantize import fake_quant_params

    cfg = load_config(
        "configs/gen1_optimized.py",
        overrides=["model.depth_multiple=0.2", "model.width_multiple=0.125"],
    )
    model = build_model(cfg, num_classes=2)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 12)),
                    jnp.float32)
    v = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), x)
    out = np.asarray(model.apply(v, x, False))
    vq = {"params": fake_quant_params(v["params"]),
          "batch_stats": v.get("batch_stats", {})}
    out_q = np.asarray(model.apply(vq, x, False))
    # scores shift by less than a few percent, boxes by a few pixels
    assert np.abs(out_q[..., 5:] - out[..., 5:]).max() < 0.05
    assert np.abs(out_q[..., :4] - out[..., :4]).max() < 4.0


def test_calibrate_activations():
    from event_representation_study_tpu.utils.quantize import calibrate_activations

    def apply_fn(variables, batch):
        return {"act": batch * variables["w"]}

    batches = [jnp.full((4,), float(i + 1)) for i in range(3)]
    ranges = calibrate_activations(apply_fn, {"w": 2.0}, batches)
    assert ranges["act"] == pytest.approx(6.0)
    r99 = calibrate_activations(apply_fn, {"w": 2.0}, batches, percentile=50)
    assert r99["act"] <= 6.0
