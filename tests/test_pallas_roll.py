"""Per-row roll DMA kernel (ops/pallas_roll.py): interpret-mode kernel vs
the XLA-gather twin, including start clamping (CLIP semantics) and the
non-multiple row-count padding path."""
import numpy as np
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize("R,rb", [(16, 8), (20, 8), (3, 8)])
def test_roll_rows_matches_xla(R, rb):
    from event_representation_study_tpu.ops.pallas_roll import (
        roll_rows,
        roll_rows_xla,
    )

    rng = np.random.default_rng(R)
    x = jnp.asarray(rng.uniform(0, 255, (2, R, 40, 12)), jnp.float32)
    # include out-of-range starts: both impls clamp (CLIP semantics)
    s = jnp.asarray(rng.integers(-5, 30, (2, R)), jnp.int32)
    got = np.asarray(roll_rows(x, s, 24, rb=rb, interpret=True))
    want = np.asarray(roll_rows_xla(x, s, 24))
    np.testing.assert_allclose(got, want)


def test_roll_rows_bf16():
    from event_representation_study_tpu.ops.pallas_roll import (
        roll_rows,
        roll_rows_xla,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (1, 8, 32, 4)), jnp.bfloat16)
    s = jnp.asarray(rng.integers(0, 8, (1, 8)), jnp.int32)
    got = np.asarray(roll_rows(x, s, 24, interpret=True).astype(jnp.float32))
    want = np.asarray(roll_rows_xla(x, s, 24).astype(jnp.float32))
    np.testing.assert_allclose(got, want)


def test_roll_rows_odd_channels():
    """16-bit inputs with an odd channel count exercise the pad-one-lane
    branch of the int32 bitcast packing (Mosaic's rotate is 32-bit only)."""
    import numpy as np

    from event_representation_study_tpu.ops.pallas_roll import (
        roll_rows,
        roll_rows_xla,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 255, (2, 12, 40, 11)), jnp.bfloat16)
    s = jnp.asarray(rng.integers(0, 16, (2, 12)), jnp.int32)
    got = np.asarray(roll_rows(x, s, 24, interpret=True), np.float32)
    want = np.asarray(roll_rows_xla(x, s, 24), np.float32)
    np.testing.assert_array_equal(got, want)
