"""ORBvoc interop: DBoW2 text/binary vocabulary loading + scale.

The reference loads a 10^6-word ORB vocabulary (k=10, L=6) via
TemplatedVocabulary::loadFromTextFile/loadFromBinaryFile
(Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1362,1478).  The vocabulary
file itself is not shipped (Vocabulary/download_link.txt), so these tests
write synthetic files in the exact same formats — including ragged
branches and shallow leaves — and verify the loader, the word mapping,
and that quantization compiles and runs fast at the full k=10, L=6 scale.
"""

import struct
import time

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_dualcam_tpu.vocab import bow, orbvoc


def _make_ragged_tree(rng, k=3, L=3, prune=0.25):
    """Emit DBoW2-ordered node rows (parent, is_leaf, desc32, weight) for a
    ragged tree, mirroring how create() appends nodes level by level."""
    rows = []          # (parent_id, is_leaf, desc_bytes, weight)
    # node ids are 1-based in file order; root = 0 (implicit)
    frontier = [0]     # node ids that may get children
    next_id = 1
    for level in range(L):
        new_frontier = []
        for p in frontier:
            n_kids = k if rng.uniform() > prune else int(rng.integers(1, k))
            for _ in range(n_kids):
                leaf = level == L - 1 or (level > 0 and rng.uniform() < 0.1)
                desc = rng.integers(0, 256, 32).astype(np.uint8)
                w = float(rng.uniform(0.01, 2.0)) if leaf else 0.0
                rows.append((p, leaf, desc, w))
                if not leaf:
                    new_frontier.append(next_id)
                next_id += 1
        frontier = new_frontier
    return rows


def _write_text(path, k, L, rows):
    with open(path, "w") as f:
        f.write(f"{k} {L} 0 0\n")
        for p, leaf, d, w in rows:
            f.write(f"{p} {1 if leaf else 0} " +
                    " ".join(str(int(x)) for x in d) + f" {w}\n")


def _write_binary(path, k, L, rows):
    with open(path, "wb") as f:
        size_node = 4 + 32 + 4 + 1
        f.write(struct.pack("<IIiiii", len(rows), size_node, k, L, 0, 0))
        for p, leaf, d, w in rows:
            f.write(struct.pack("<i", p) + bytes(d.tolist()) +
                    struct.pack("<f", w) + struct.pack("<?", leaf))


@pytest.fixture
def ragged(tmp_path):
    rng = np.random.default_rng(5)
    k, L = 3, 3
    rows = _make_ragged_tree(rng, k, L)
    return tmp_path, k, L, rows, rng


def test_text_binary_agree(ragged):
    tmp, k, L, rows, rng = ragged
    _write_text(str(tmp / "voc.txt"), k, L, rows)
    _write_binary(str(tmp / "voc.bin"), k, L, rows)
    v1 = orbvoc.load_orbvoc(str(tmp / "voc.txt"))
    v2 = orbvoc.load_orbvoc(str(tmp / "voc.bin"))
    assert v1.n_words == v2.n_words == sum(1 for r in rows if r[1])
    for c1, c2 in zip(v1.centroids, v2.centroids):
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(v1.word_map),
                                  np.asarray(v2.word_map))
    np.testing.assert_allclose(np.asarray(v1.idf), np.asarray(v2.idf),
                               rtol=1e-6)


def _reference_transform(rows, k, L, desc_bytes):
    """Host-side replica of TemplatedVocabulary::transform
    (TemplatedVocabulary.h:137-147): greedy per-level Hamming descent over
    the RAGGED tree.  Ground truth for the densified device quantizer."""
    children = {0: []}
    for i, (p, leaf, d, w) in enumerate(rows):
        children.setdefault(p, []).append(i + 1)
        children.setdefault(i + 1, [])
    packed = orbvoc._pack_desc(np.stack([r[2] for r in rows]))
    word_of = {}
    wid = 0
    for i, (p, leaf, d, w) in enumerate(rows):
        if leaf:
            word_of[i + 1] = wid
            wid += 1
    q = orbvoc._pack_desc(desc_bytes[None])[0]

    def ham(a, b):
        return int(np.bitwise_count(a ^ b).sum())

    node = 0
    while children[node]:
        node = min(children[node], key=lambda c: (ham(packed[c - 1], q), c))
    return word_of[node]


def test_quantize_matches_reference_descent(ragged):
    tmp, k, L, rows, rng = ragged
    _write_text(str(tmp / "voc.txt"), k, L, rows)
    voc = orbvoc.load_orbvoc(str(tmp / "voc.txt"))
    qs = rng.integers(0, 256, (64, 32)).astype(np.uint8)
    words, _ = bow.quantize(voc, jnp.asarray(orbvoc._pack_desc(qs)))
    words = np.asarray(words)
    for i in range(len(qs)):
        assert words[i] == _reference_transform(rows, k, L, qs[i]), i


@pytest.mark.slow
def test_orbvoc_full_scale_quantization():
    """k=10, L=6 (10^6 words, ORBvoc geometry): tree construction from
    random centroids + batched quantization of a full frame's descriptors.
    Gates the per-frame quantization latency the reference pays in
    Frame::ComputeBoW."""
    rng = np.random.default_rng(0)
    k, L = 10, 6
    cents = []
    for level in range(L):
        n = k ** (level + 1)
        cents.append(jnp.asarray(
            rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)))
    voc = bow.Vocabulary(branching=k, depth=L, centroids=tuple(cents),
                         idf=jnp.asarray(np.ones(k ** L, np.float32)),
                         direct_level=2)
    desc = jnp.asarray(rng.integers(0, 2 ** 32, (1300, 8), dtype=np.uint32))
    w, n = bow.quantize(voc, desc)
    w.block_until_ready()
    t0 = time.time()
    for _ in range(5):
        w, n = bow.quantize(voc, desc)
        w.block_until_ready()
    dt = (time.time() - t0) / 5
    assert w.shape == (1300,)
    assert int(jnp.max(w)) < k ** L
    # generous CPU-backend gate; on-chip this is ~sub-ms
    assert dt < 0.25, f"quantization too slow at ORBvoc scale: {dt*1e3:.1f}ms"
