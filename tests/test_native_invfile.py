"""Native C++ inverted file vs pure-Python fallback equivalence."""

import numpy as np
import pytest

from orbslam2_dualcam_tpu.models.kfdb import KeyFrameDatabase
from orbslam2_dualcam_tpu.vocab.bow import SparseBow

try:
    from orbslam2_dualcam_tpu.native.invfile import NativeInvertedFile
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False


@pytest.mark.skipif(not HAVE_NATIVE, reason="no C++ toolchain")
def test_native_matches_python(rng):
    n_words = 500
    dbs = [KeyFrameDatabase(2, n_words, use_native=True),
           KeyFrameDatabase(2, n_words, use_native=False)]
    assert dbs[0].native is not None
    assert dbs[1].native is None

    word_sets = {}
    for kid in range(20):
        for cam in range(2):
            words = rng.integers(-1, n_words, size=120).astype(np.int32)
            uw = np.unique(words[words >= 0]).astype(np.int32)
            vec = SparseBow(uw, np.full(len(uw), 1.0 / max(len(uw), 1),
                                        np.float32))
            word_sets[(kid, cam)] = words
            for db in dbs:
                db.add(kid, cam, words, vec)

    for trial in range(10):
        q = rng.integers(-1, n_words, size=100).astype(np.int32)
        excl = set(rng.integers(0, 20, size=3).tolist())
        a = dbs[0]._shared_word_counts(q, trial % 2, excl)
        b = dbs[1]._shared_word_counts(q, trial % 2, excl)
        assert a == dict(b), (trial, a, b)

    # erase must remove postings in both
    for db in dbs:
        db.erase(7)
    q = word_sets[(7, 0)]
    a = dbs[0]._shared_word_counts(q, 0, set())
    b = dbs[1]._shared_word_counts(q, 0, set())
    assert 7 not in a and 7 not in b
    assert a == dict(b)

    for db in dbs:
        db.clear()
    assert dbs[0]._shared_word_counts(q, 0, set()) == {}


@pytest.mark.skipif(not HAVE_NATIVE, reason="no C++ toolchain")
def test_native_speed_sanity(rng):
    """Native index handles a large database without pathological cost."""
    import time
    n_words = 5000
    db = NativeInvertedFile(2, n_words)
    for kid in range(300):
        db.add(kid, 0, rng.integers(0, n_words, 400).astype(np.int32))
    q = rng.integers(0, n_words, 400).astype(np.int32)
    t0 = time.time()
    for _ in range(50):
        out = db.query(0, q)
    dt = (time.time() - t0) / 50
    assert len(out) > 0
    assert dt < 0.01, dt   # sub-10ms per query over 300 KFs
