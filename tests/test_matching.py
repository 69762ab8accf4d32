import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.ops import matching


def rand_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint32))


def np_hamming(a, b):
    ax = np.asarray(a)[:, None, :] ^ np.asarray(b)[None, :, :]
    return np.vectorize(lambda v: bin(int(v)).count('1'))(ax).sum(-1)


def flip_bits(rng, desc, k):
    """Flip k random bits in each descriptor."""
    d = np.asarray(desc).copy()
    for i in range(d.shape[0]):
        for b in rng.choice(256, size=k, replace=False):
            d[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return jnp.asarray(d)


def test_hamming_matrix_exact(rng):
    a = rand_desc(rng, 37)
    b = rand_desc(rng, 23)
    H = np.asarray(matching.hamming_matrix(a, b))
    np.testing.assert_array_equal(H.astype(np.int32), np_hamming(a, b))


def test_match_identity_with_noise(rng):
    base = rand_desc(rng, 100)
    noisy = flip_bits(rng, base, 10)
    perm = rng.permutation(100)
    res = matching.match_masked(base, noisy[perm], max_dist=30, ratio=0.8)
    idx = np.asarray(res.idx)
    inv = np.empty(100, int)
    inv[perm] = np.arange(100)
    # nearly all should match back to their permuted position
    good = (idx == inv).sum()
    assert good > 90, good


def test_ratio_test_rejects_ambiguous(rng):
    a = rand_desc(rng, 4)
    # b holds a noisy copy of each of a's descs, plus a SECOND equally-noisy
    # copy of a[0] -> a[0]'s best and second-best distances tie, ratio kills it
    b = np.asarray(flip_bits(rng, a, 6))
    extra = np.asarray(a[:1]).copy()
    for bit in [7, 40, 77, 130, 200, 250]:
        extra[0, bit // 32] ^= np.uint32(1) << np.uint32(bit % 32)
    b = jnp.asarray(np.concatenate([b, extra], axis=0))
    res = matching.match_masked(a, b, max_dist=50, ratio=0.8)
    assert int(res.idx[0]) == -1          # ambiguous
    assert int(res.idx[1]) == 1           # unambiguous ones survive


def test_window_mask(rng):
    uv_a = jnp.asarray([[10.0, 10.0], [100.0, 100.0]])
    uv_b = jnp.asarray([[12.0, 11.0], [50.0, 50.0], [98.0, 104.0]])
    m = np.asarray(matching.window_mask(uv_a, uv_b, 5.0))
    assert m.tolist() == [[True, False, False], [False, False, True]]
    # per-row radius
    m2 = np.asarray(matching.window_mask(uv_a, uv_b, jnp.asarray([1.0, 50.0])))
    assert m2.tolist() == [[False, False, False], [False, True, True]]


def test_masked_match_respects_allow(rng):
    a = rand_desc(rng, 10)
    b = flip_bits(rng, a, 5)
    allow = jnp.zeros((10, 10), bool).at[jnp.arange(10), jnp.arange(10)].set(True)
    res = matching.match_masked(a, b, allow=allow, max_dist=30)
    np.testing.assert_array_equal(np.asarray(res.idx), np.arange(10))
    # forbid everything -> nothing matches
    res2 = matching.match_masked(a, b, allow=jnp.zeros((10, 10), bool))
    assert int(res2.count()) == 0


def test_dedup_columns(rng):
    # two rows both matching column 0; better one wins
    a = rand_desc(rng, 2)
    b = a[:1]
    d0 = np.asarray(matching.hamming_matrix(a, b))
    res = matching.match_masked(a, b, max_dist=300)
    idx = np.asarray(res.idx)
    assert (idx >= 0).sum() == 1
    assert idx[np.argmin(d0[:, 0])] == 0


def test_rotation_consistency(rng):
    n = 60
    base = rand_desc(rng, n)
    noisy = flip_bits(rng, base, 6)
    ang_a = jnp.zeros((n,))
    # most matches rotate by 0.5 rad; 4 outliers (< 0.1 * 56) rotate wildly
    ang_b = jnp.full((n,), -0.5).at[jnp.arange(4)].set(2.1)
    res = matching.match_masked(base, noisy, max_dist=30,
                                angle_a=ang_a, angle_b=ang_b)
    idx = np.asarray(res.idx)
    # outlier-rotation matches killed (bin count 4 < 0.1*56), rest kept
    assert (idx[:4] == -1).all()
    assert (idx[4:] == np.arange(4, n)).mean() > 0.9


def test_mutual_and_jit(rng):
    a = rand_desc(rng, 64)
    b = flip_bits(rng, a, 8)
    f = jax.jit(lambda x, y: matching.match_masked(x, y, max_dist=40,
                                                   mutual=True))
    res = f(a, b)
    assert int(res.count()) > 55


def test_validity_masks(rng):
    a = rand_desc(rng, 20)
    b = flip_bits(rng, a, 4)
    va = jnp.arange(20) < 10
    res = matching.match_masked(a, b, valid_a=va, max_dist=30)
    idx = np.asarray(res.idx)
    assert (idx[10:] == -1).all()
    assert (idx[:10] == np.arange(10)).all()
