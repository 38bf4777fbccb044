"""_topk_khot (iterative-argmax k-hot) must be bit-equal to the sort-based
_topk_mask on the TAL call pattern (per-ROW validity, tal_assigner.py:142-155
select_topk_candidates with mask_gt.repeat(1,1,topk)).

The khot path replaces a full per-row lax.top_k sort over 8400 anchors
(5.7 ms of the 6.5 ms assigner on v5e, scripts/assigner_bench.py) with
``topk`` linear argmax passes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_representation_study_tpu.train.assigners import (
    _topk_khot,
    _topk_mask,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("shape,k", [((2, 7, 64), 5), ((3, 4, 200), 13)])
def test_khot_matches_topk_mask(seed, shape, k):
    rng = np.random.default_rng(seed)
    m = rng.uniform(0, 1, shape).astype(np.float32)
    # the TAL metric is align*mask_in_gts: mostly zeros with sparse positives
    m = np.where(rng.uniform(0, 1, shape) < 0.8, 0.0, m)
    # exact duplicated values to exercise tie-breaking
    n_dup = min(m[..., ::7].shape[-1], m[..., 1::7].shape[-1])
    m[..., : 7 * n_dup : 7] = m[..., 1 : 7 * n_dup : 7]
    valid = rng.uniform(0, 1, shape[:2]) < 0.7  # some padded gt rows
    tm = np.broadcast_to(valid[..., None], (*shape[:2], k))

    ref = _topk_mask(jnp.asarray(m), k, jnp.asarray(tm))
    new = _topk_khot(jnp.asarray(m), k, jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))


def test_khot_all_invalid_rows_zero():
    m = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, 3, 32)),
                    jnp.float32)
    out = _topk_khot(m, 4, jnp.zeros((1, 3), bool))
    assert float(jnp.sum(out)) == 0.0


def test_khot_selects_exactly_k():
    m = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (2, 5, 100)),
                    jnp.float32)
    out = _topk_khot(m, 9, jnp.ones((2, 5), bool))
    np.testing.assert_array_equal(np.asarray(jnp.sum(out, -1)),
                                  np.full((2, 5), 9.0))
