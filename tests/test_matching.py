"""Brute-force matcher tests (replaces cv2 BF/FLANN; reference features_utils)."""
import numpy as np
import jax.numpy as jnp

from simpleslam_tpu.core.types import Features
from simpleslam_tpu.ops.matching import (bf_match, hamming_matrix,
                                         knn_distances, l2sq_matrix,
                                         unpack_bits)


def _feats_from_desc(desc, n_pad=None):
    n = desc.shape[0]
    kpts = np.arange(2 * n, dtype=np.float32).reshape(n, 2)
    return Features.from_arrays(kpts, desc, n_pad=n_pad or n)


def test_hamming_matrix_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, size=(17, 32), dtype=np.uint8)
    b = rng.integers(0, 256, size=(23, 32), dtype=np.uint8)
    got = np.asarray(hamming_matrix(unpack_bits(jnp.asarray(a)),
                                    unpack_bits(jnp.asarray(b))))
    want = np.zeros((17, 23))
    for i in range(17):
        for j in range(23):
            want[i, j] = bin(int.from_bytes((a[i] ^ b[j]).tobytes(), "big")).count("1")
    np.testing.assert_array_equal(got, want)


def test_l2sq_matrix_exact():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(9, 16)).astype(np.float32)
    b = rng.normal(size=(11, 16)).astype(np.float32)
    got = np.asarray(l2sq_matrix(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, None] - b[None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bf_match_binary_crosscheck():
    rng = np.random.default_rng(2)
    base = rng.integers(0, 256, size=(20, 32), dtype=np.uint8)
    perm = rng.permutation(20)
    # train set = permuted copies with 1 flipped bit each
    noisy = base[perm].copy()
    noisy[:, 0] ^= 1
    f0 = _feats_from_desc(base, n_pad=32)
    f1 = _feats_from_desc(noisy, n_pad=32)
    m = bf_match(f0, f1)
    v = np.asarray(m.valid)
    assert v.sum() == 20
    i0 = np.asarray(m.idx0)[v]
    i1 = np.asarray(m.idx1)[v]
    # every match must map i -> position of i in perm
    inv = np.argsort(perm)
    np.testing.assert_array_equal(i1, inv[i0])
    # distances are 1 bit and sorted ascending
    s = np.asarray(m.score)[v]
    assert (s == 1).all()


def test_bf_match_respects_padding():
    rng = np.random.default_rng(3)
    d0 = rng.normal(size=(5, 8)).astype(np.float32)
    f0 = _feats_from_desc(d0, n_pad=16)
    f1 = _feats_from_desc(d0, n_pad=16)
    m = bf_match(f0, f1)
    v = np.asarray(m.valid)
    assert v.sum() == 5
    assert np.asarray(m.idx0)[v].max() < 5
    assert np.asarray(m.idx1)[v].max() < 5


def test_bf_match_sorted_by_distance():
    rng = np.random.default_rng(4)
    d0 = rng.normal(size=(10, 8)).astype(np.float32)
    noise = rng.normal(size=(10, 8)).astype(np.float32) * np.linspace(0, 0.3, 10)[:, None]
    f0 = _feats_from_desc(d0)
    f1 = _feats_from_desc(d0 + noise)
    m = bf_match(f0, f1)
    s = np.asarray(m.score)[np.asarray(m.valid)]
    assert (np.diff(s) >= -1e-6).all()


def test_knn_distances():
    d0 = np.eye(4, dtype=np.float32)
    f0 = _feats_from_desc(d0)
    f1 = _feats_from_desc(d0)
    dist, idx = knn_distances(f0, f1, k=2)
    assert np.asarray(dist).shape == (4, 2)
    np.testing.assert_allclose(np.asarray(dist)[:, 0], 0.0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(4))
