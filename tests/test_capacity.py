import jax
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.core.capacity import (
    masked_select_capacity,
    scatter_onehot_2d,
    topk_select,
)


def test_masked_select_basic():
    mask = jnp.array([False, True, False, True, True, False])
    idx, valid = masked_select_capacity(mask, 4)
    assert np.asarray(idx[:3]).tolist() == [1, 3, 4]
    assert np.asarray(valid).tolist() == [True, True, True, False]


def test_masked_select_overflow_truncates():
    mask = jnp.ones(10, bool)
    idx, valid = masked_select_capacity(mask, 4)
    assert np.asarray(idx).tolist() == [0, 1, 2, 3]
    assert bool(valid.all())


def test_masked_select_empty():
    mask = jnp.zeros(10, bool)
    idx, valid = masked_select_capacity(mask, 4)
    assert not bool(valid.any())


def test_masked_select_jit_vmap():
    masks = jnp.array([[True, False, True], [False, False, True]])
    idx, valid = jax.jit(jax.vmap(lambda m: masked_select_capacity(m, 2)))(masks)
    assert np.asarray(idx).tolist() == [[0, 2], [2, 0]]
    assert np.asarray(valid).tolist() == [[True, True], [True, False]]


def test_topk_select():
    score = jnp.array([0.1, 0.9, 0.5, 0.7])
    valid = jnp.array([True, False, True, True])
    idx, v = topk_select(score, valid, 2)
    assert np.asarray(idx).tolist() == [3, 2]
    assert bool(v.all())


def test_topk_select_few_valid():
    score = jnp.array([0.1, 0.9, 0.5])
    valid = jnp.array([False, False, True])
    idx, v = topk_select(score, valid, 2)
    assert np.asarray(idx[0]) == 2
    assert np.asarray(v).tolist() == [True, False]


def test_scatter_onehot():
    m = scatter_onehot_2d((3, 4), jnp.array([0, 2]), jnp.array([1, 3]),
                          jnp.array([True, True]))
    assert float(m[0, 1]) == 1.0 and float(m[2, 3]) == 1.0
    assert float(m.sum()) == 2.0


def test_scatter_onehot_invalid_dropped():
    m = scatter_onehot_2d((3, 4), jnp.array([0, 2]), jnp.array([1, 3]),
                          jnp.array([True, False]))
    assert float(m.sum()) == 1.0
