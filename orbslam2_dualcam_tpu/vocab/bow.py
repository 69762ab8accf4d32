"""Bag-of-binary-words place recognition: vocabulary tree + quantization.

TPU re-design of DBoW2's TemplatedVocabulary<FORB>
(Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h): a branching-factor-k,
depth-L tree of 256-bit ORB centroids, trained by binary k-means++ (k-majority
voting), used to quantize descriptors to word ids with tf-idf weights and to
build FeatureVectors (node ids at a fixed level) for match gating.

Device-side redesign: the reference descends the tree per descriptor with
scalar Hamming loops (TemplatedVocabulary.h:137-147 transform).  Here the
whole tree is FLATTENED per level into centroid matrices and quantization is
a chain of L masked Hamming-argmin steps, each one an MXU matmul over ALL
descriptors at once (ops/matching.hamming_matrix).  The inverted file stays
host-side (models/kfdb.py), per camera, as in KeyFrameDatabase.cc:56-73.

The vocabulary is trained on-the-fly from dataset descriptors (the reference
ships a pre-trained 1M-word ORBvoc; training our own keeps the system
self-contained — loader/saver for our .npz format included).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from orbslam2_dualcam_tpu.ops import matching


def _popcount64(x: np.ndarray) -> np.ndarray:
    # numpy >= 2 has bitwise_count
    return np.bitwise_count(x)


def hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,8]x[M,8] uint32 -> [N,M] int Hamming (host, for training)."""
    x = a[:, None, :] ^ b[None, :, :]
    return _popcount64(x).sum(-1).astype(np.int32)


def _kmajority(desc: np.ndarray, k: int, rng: np.random.Generator,
               iters: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Binary k-means: k-majority voting on bits. Returns (centroids [k,8],
    assign [N])."""
    n = len(desc)
    k = min(k, n)
    # k-means++ seeding with Hamming distances
    centroids = [desc[rng.integers(n)]]
    d = hamming_np(desc, np.asarray([centroids[0]]))[:, 0].astype(np.float64)
    for _ in range(1, k):
        p = d * d
        s = p.sum()
        idx = rng.integers(n) if s <= 0 else rng.choice(n, p=p / s)
        centroids.append(desc[idx])
        d = np.minimum(d, hamming_np(desc, np.asarray([centroids[-1]]))[:, 0])
    C = np.asarray(centroids)
    assign = np.zeros(n, np.int64)
    bits_lut = ((desc[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1)  # [N,8,32]
    for _ in range(iters):
        D = hamming_np(desc, C)
        assign = D.argmin(1)
        newC = C.copy()
        for j in range(len(C)):
            members = bits_lut[assign == j]
            if len(members) == 0:
                continue
            maj = (members.mean(0) > 0.5).astype(np.uint32)
            newC[j] = (maj << np.arange(32, dtype=np.uint32)[None, :]).sum(1, dtype=np.uint32)
        if np.array_equal(newC, C):
            break
        C = newC
    return C, hamming_np(desc, C).argmin(1)


class Vocabulary(NamedTuple):
    """Flattened per-level tree.

    centroids[l]: [k^(l+1), 8] uint32 — children of level-l nodes laid out
    contiguously (node n's children occupy rows n*k .. n*k+k-1; unused rows
    are filled with the parent centroid so argmin stays in-branch).
    idf: [n_words] float32 tf-idf word weights.

    word_map: optional [k^depth] int32 mapping final-level slots to word
    ids — identity when None.  DBoW2 trees are ragged (clusters smaller
    than k stop early, TemplatedVocabulary.h:251-276); the ORBvoc loader
    (vocab/orbvoc.py) propagates shallow leaves down to full depth, so
    several final slots can share one word id and the map resolves them.
    """

    branching: int
    depth: int
    centroids: tuple          # tuple of jnp [k^(l+1), 8] uint32 per level
    idf: jax.Array            # [n_words]
    direct_level: int         # FeatureVector node level (levels from root)
    word_map: Optional[jax.Array] = None   # [k^depth] int32 slot -> word
    n_words_leaves: int = 0   # actual word count (0 -> k^depth)

    @property
    def n_words(self) -> int:
        return self.n_words_leaves or self.branching ** self.depth


def train_vocabulary(desc: np.ndarray, branching: int = 10, depth: int = 4,
                     seed: int = 42, direct_level: int = 2,
                     weight_docs: Optional[list[np.ndarray]] = None) -> Vocabulary:
    """Train the tree by recursive k-majority (TemplatedVocabulary::create
    semantics). desc: [N, 8] uint32 training descriptors."""
    rng = np.random.default_rng(seed)
    k = branching
    levels: list[np.ndarray] = []
    # groups[i] = indices of desc assigned to node i at current level
    groups = [np.arange(len(desc))]
    for level in range(depth):
        n_nodes = k ** (level + 1)
        cents = np.zeros((n_nodes, 8), np.uint32)
        new_groups: list[np.ndarray] = []
        for node, g in enumerate(groups):
            if len(g) == 0:
                # dead branch: copy parent's centroid into all children
                parent_c = levels[level - 1][node] if level > 0 else np.zeros(8, np.uint32)
                for j in range(k):
                    cents[node * k + j] = parent_c
                    new_groups.append(np.array([], np.int64))
                continue
            C, assign = _kmajority(desc[g], k, rng)
            for j in range(k):
                cents[node * k + j] = C[j] if j < len(C) else C[len(C) - 1]
                new_groups.append(g[assign == j] if j < len(C) else
                                  np.array([], np.int64))
        levels.append(cents)
        groups = new_groups

    n_words = k ** depth
    # idf from training docs (or uniform): DBoW2 TF_IDF weighting
    idf = np.ones(n_words, np.float32)
    if weight_docs:
        counts = np.zeros(n_words, np.float64)
        voc_tmp = Vocabulary(branching, depth,
                             tuple(jnp.asarray(c) for c in levels),
                             jnp.asarray(idf), direct_level)
        for d in weight_docs:
            w = np.unique(np.asarray(quantize(voc_tmp, jnp.asarray(d))[0]))
            counts[w] += 1
        n_docs = len(weight_docs)
        idf = np.log(n_docs / np.maximum(counts, 1e-9)).astype(np.float32)
        idf[counts == 0] = 0.0
    return Vocabulary(branching, depth,
                      tuple(jnp.asarray(c) for c in levels),
                      jnp.asarray(idf), direct_level)


def save_vocabulary(voc: Vocabulary, path: str) -> None:
    extra = {}
    if voc.word_map is not None:
        extra["word_map"] = np.asarray(voc.word_map)
    np.savez_compressed(
        path, branching=voc.branching, depth=voc.depth,
        direct_level=voc.direct_level, idf=np.asarray(voc.idf),
        n_words_leaves=voc.n_words_leaves,
        **{f"level_{i}": np.asarray(c) for i, c in enumerate(voc.centroids)},
        **extra)


def load_vocabulary(path: str) -> Vocabulary:
    z = np.load(path)
    depth = int(z["depth"])
    return Vocabulary(
        branching=int(z["branching"]), depth=depth,
        centroids=tuple(jnp.asarray(z[f"level_{i}"]) for i in range(depth)),
        idf=jnp.asarray(z["idf"]), direct_level=int(z["direct_level"]),
        word_map=(jnp.asarray(z["word_map"]) if "word_map" in z else None),
        n_words_leaves=int(z["n_words_leaves"])
        if "n_words_leaves" in z else 0)


# ---------------------------------------------------------------------------
# device-side quantization
# ---------------------------------------------------------------------------

def quantize(voc: Vocabulary, desc: jax.Array):
    """Quantize descriptors down the tree. desc [N, 8] uint32.

    Returns (word [N] int32, node [N] int32) where `node` is the tree node
    id at `direct_level` (the FeatureVector grouping used for match gating,
    Frame.cc:393-408).

    Each level GATHERS every descriptor's k candidate children [N, k, 8]
    and resolves the argmin with XOR+popcount on the VPU — O(N*k*L) work
    independent of tree width, so an ORBvoc-scale tree (k=10, L=6, 1e6
    words) costs the same per level as a toy one.  (A dense Hamming
    matmul over a level's full centroid matrix would be O(N * k^(l+1)) —
    1.3e9 entries at the final ORBvoc level.)"""
    k = voc.branching
    n = desc.shape[0]
    node = jnp.zeros(n, jnp.int32)
    direct = jnp.zeros(n, jnp.int32)
    for level, cents in enumerate(voc.centroids):
        child_idx = node[:, None] * k + jnp.arange(k)[None, :]   # [N, k]
        # jnp view: the tree tables may arrive as host numpy constants
        # (frontend.host_constants), which can't be fancy-indexed by a
        # tracer directly
        cand = jnp.asarray(cents)[child_idx]                     # [N, k, 8]
        d = jax.lax.population_count(
            cand ^ desc[:, None, :]).sum(-1)                     # [N, k]
        node = (node * k + jnp.argmin(d, axis=1).astype(jnp.int32))
        if level + 1 == voc.direct_level:
            direct = node
    word = node if voc.word_map is None else jnp.asarray(voc.word_map)[node]
    return word, direct


class BowVector(NamedTuple):
    """Sparse tf-idf document vector as dense [n_words] weights (L1
    normalized) — small enough for our trees to stay dense on device."""

    weights: jax.Array   # [n_words] float32


def bow_vector(voc: Vocabulary, words: jax.Array, valid: jax.Array) -> jax.Array:
    """tf-idf L1-normalized dense BoW vector [n_words].

    Dense form — fine for toy/test vocabularies; production code paths use
    `sparse_bow` (an ORBvoc-scale tree has 1e6 words = 4 MB/vector)."""
    w = jnp.zeros(voc.n_words, jnp.float32).at[words].add(
        jnp.where(valid, 1.0, 0.0))
    w = w * voc.idf
    s = jnp.sum(jnp.abs(w))
    return w / jnp.where(s > 0, s, 1.0)


def score_l1(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """DBoW2 L1 score (ScoringObject.h:76):
    s = 2 * sum_i (|v1|+|v2|-|v1-v2|) / 2 ... standard form below, in [0,1].
    Accepts [n_words] or batched [..., n_words]."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2), axis=-1)


# ---------------------------------------------------------------------------
# sparse BoW vectors (DBoW2 BowVector semantics, TemplatedVocabulary.h:679-720)
# ---------------------------------------------------------------------------

class SparseBow(NamedTuple):
    """L1-normalized tf-idf document vector in sparse (word -> weight) form,
    the exact representation DBoW2's BowVector uses (a sorted word->value
    map).  At ORBvoc scale (1e6 words) a dense vector is 4 MB; a frame's
    sparse vector is <=n_features entries (~10 KB)."""

    words: np.ndarray     # [m] int32, sorted unique word ids
    weights: np.ndarray   # [m] float32, L1-normalized

    @property
    def nbytes(self) -> int:
        return int(self.words.nbytes + self.weights.nbytes)


_idf_np_cache: dict = {}


def _idf_np(voc: Vocabulary) -> np.ndarray:
    """Host copy of the idf table, cached per vocabulary (zero-copy on the
    CPU backend; one transfer ever on TPU)."""
    key = id(voc.idf)
    hit = _idf_np_cache.get(key)
    if hit is None:
        _idf_np_cache.clear()     # at most one vocabulary live per system
        hit = _idf_np_cache[key] = np.asarray(voc.idf)
    return hit


def sparse_bow(voc: Vocabulary, words: np.ndarray,
               valid: np.ndarray) -> SparseBow:
    """Host-side sparse tf-idf vector from per-feature word ids
    (TemplatedVocabulary::transform -> BowVector::addWeight semantics)."""
    w = np.asarray(words)[np.asarray(valid) & (np.asarray(words) >= 0)]
    if len(w) == 0:
        return SparseBow(np.empty(0, np.int32), np.empty(0, np.float32))
    uw, cnt = np.unique(w, return_counts=True)
    wt = cnt.astype(np.float64) * _idf_np(voc)[uw]
    s = wt.sum()
    if s > 0:
        wt = wt / s
    keep = wt > 0
    return SparseBow(uw[keep].astype(np.int32), wt[keep].astype(np.float32))


def score_sparse(a: SparseBow, b: SparseBow) -> float:
    """L1 score between two L1-normalized sparse vectors.

    For nonnegative L1-normalized vectors,
    1 - 0.5*sum|v1-v2| = sum over common words of min(a_i, b_i) — only the
    intersection matters, which is what makes DBoW2's inverted-file scoring
    cheap (ScoringObject.h:76 evaluated over shared words only)."""
    if len(a.words) == 0 or len(b.words) == 0:
        return 0.0
    _, ia, ib = np.intersect1d(a.words, b.words, assume_unique=True,
                               return_indices=True)
    if len(ia) == 0:
        return 0.0
    return float(np.minimum(a.weights[ia], b.weights[ib]).sum())
