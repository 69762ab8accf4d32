import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.models.kfdb import KeyFrameDatabase
from orbslam2_dualcam_tpu.models.map import Map
from orbslam2_dualcam_tpu.vocab import bow


def rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint32)


def flip(rng, d, k):
    d = d.copy()
    for i in range(len(d)):
        for b in rng.choice(256, k, replace=False):
            d[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return d


def test_vocab_train_quantize(rng):
    train = rand_desc(rng, 2000)
    voc = bow.train_vocabulary(train, branching=5, depth=3, seed=1)
    assert voc.n_words == 125
    # same descriptor -> same word; slightly-perturbed -> usually same word
    q = rand_desc(rng, 100)
    w1, n1 = bow.quantize(voc, jnp.asarray(q))
    w2, _ = bow.quantize(voc, jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    qp = flip(rng, q, 5)
    w3, _ = bow.quantize(voc, jnp.asarray(qp))
    same = (np.asarray(w1) == np.asarray(w3)).mean()
    assert same > 0.5, same
    # words in range, spread over the vocabulary
    w = np.asarray(w1)
    assert (w >= 0).all() and (w < 125).all()
    assert len(np.unique(w)) > 30


def test_bow_vector_scoring(rng):
    train = rand_desc(rng, 1500)
    voc = bow.train_vocabulary(train, branching=4, depth=3, seed=2)
    a = rand_desc(rng, 200)
    b = flip(rng, a, 8)          # similar doc
    c = rand_desc(rng, 200)      # unrelated doc
    va = bow.bow_vector(voc, *bow.quantize(voc, jnp.asarray(a))[:1],
                        jnp.ones(200, bool))
    vb = bow.bow_vector(voc, *bow.quantize(voc, jnp.asarray(b))[:1],
                        jnp.ones(200, bool))
    vc = bow.bow_vector(voc, *bow.quantize(voc, jnp.asarray(c))[:1],
                        jnp.ones(200, bool))
    s_ab = float(bow.score_l1(va, vb))
    s_ac = float(bow.score_l1(va, vc))
    assert 0.0 <= s_ac < s_ab <= 1.0001
    assert float(bow.score_l1(va, va)) > 0.999


def test_vocab_save_load(rng, tmp_path):
    voc = bow.train_vocabulary(rand_desc(rng, 500), branching=3, depth=2)
    p = str(tmp_path / "voc.npz")
    bow.save_vocabulary(voc, p)
    v2 = bow.load_vocabulary(p)
    q = jnp.asarray(rand_desc(rng, 50))
    np.testing.assert_array_equal(np.asarray(bow.quantize(voc, q)[0]),
                                  np.asarray(bow.quantize(v2, q)[0]))


def test_kfdb_cross_camera_query(rng):
    """The asymmetric (query_cam != resp_cam) query central to cross-camera
    relocalization (KeyFrameDatabase.cc:111-370)."""
    train = rand_desc(rng, 1000)
    voc = bow.train_vocabulary(train, branching=4, depth=3, seed=3)
    db = KeyFrameDatabase(n_cameras=2, n_words=voc.n_words)
    m = Map()

    def add_kf(kid, words_by_cam):
        for cam, wd in enumerate(words_by_cam):
            vec = bow.sparse_bow(voc, wd, np.ones(len(wd), bool))
            db.add(kid, cam, wd, vec)

    base = rand_desc(rng, 150)
    w_place, _ = bow.quantize(voc, jnp.asarray(base))
    w_place = np.asarray(w_place)
    # KF 0 saw "the place" with camera 1; other KFs saw random stuff
    add_kf(0, [np.asarray(bow.quantize(voc, jnp.asarray(rand_desc(rng, 150)))[0]),
               w_place])
    for kid in (1, 2, 3):
        add_kf(kid, [np.asarray(bow.quantize(voc, jnp.asarray(rand_desc(rng, 150)))[0]),
                     np.asarray(bow.quantize(voc, jnp.asarray(rand_desc(rng, 150)))[0])])
    # query: camera 0 of a new frame NOW sees the place -> must find KF 0
    # via camera 1's inverted file
    q = flip(rng, base, 6)
    wq, _ = bow.quantize(voc, jnp.asarray(q))
    wq = np.asarray(wq)
    vec = bow.sparse_bow(voc, wq, np.ones(len(wq), bool))
    cands = db.detect_reloc_candidates(wq, vec, query_cam=0, resp_cam=1, mp=m)
    assert cands and cands[0] == 0, cands
    # erase removes it
    db.erase(0)
    cands2 = db.detect_reloc_candidates(wq, vec, 0, 1, m)
    assert 0 not in cands2


def test_sparse_bow_matches_dense(rng):
    """score_sparse == score_l1 on L1-normalized vectors (the sum-of-min
    identity over the word intersection)."""
    train = rand_desc(rng, 1500)
    voc = bow.train_vocabulary(train, branching=4, depth=3, seed=2)
    for _ in range(5):
        a = rand_desc(rng, 120)
        b = rand_desc(rng, 120)
        wa = np.asarray(bow.quantize(voc, jnp.asarray(a))[0])
        wb = np.asarray(bow.quantize(voc, jnp.asarray(b))[0])
        va = bow.bow_vector(voc, jnp.asarray(wa), jnp.ones(120, bool))
        vb = bow.bow_vector(voc, jnp.asarray(wb), jnp.ones(120, bool))
        dense = float(bow.score_l1(va, vb))
        sa = bow.sparse_bow(voc, wa, np.ones(120, bool))
        sb = bow.sparse_bow(voc, wb, np.ones(120, bool))
        assert abs(bow.score_sparse(sa, sb) - dense) < 1e-5
        assert abs(bow.score_sparse(sa, sa) - 1.0) < 1e-5


def test_kfdb_orbvoc_scale(rng):
    """500-KF database at the ORBvoc word count (1e6): BoW storage well
    under 100 MB and queries under 5 ms (VERDICT r2 gate; the reference
    runs DBoW2 BowVectors at exactly this scale,
    TemplatedVocabulary.h:679-720)."""
    import time

    n_words = 1_000_000
    db = KeyFrameDatabase(n_cameras=1, n_words=n_words)
    m = Map()
    idf = np.abs(rng.standard_normal(n_words)).astype(np.float32) + 0.1

    def make_vec(words):
        uw, cnt = np.unique(words, return_counts=True)
        wt = cnt * idf[uw]
        wt = (wt / wt.sum()).astype(np.float32)
        return bow.SparseBow(uw.astype(np.int32), wt)

    n_kf, n_feat = 500, 1300
    for kid in range(n_kf):
        words = rng.integers(0, n_words, n_feat).astype(np.int32)
        db.add(kid, 0, words, make_vec(words))
    assert db.nbytes_bow < 100 * 2 ** 20, db.nbytes_bow

    q = rng.integers(0, n_words, n_feat).astype(np.int32)
    vq = make_vec(q)
    db.detect_reloc_candidates(q, vq, 0, 0, m)        # warm
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        db.detect_reloc_candidates(q, vq, 0, 0, m)
    dt = (time.perf_counter() - t0) / reps
    assert dt < 5e-3, f"query {dt*1e3:.2f} ms"
