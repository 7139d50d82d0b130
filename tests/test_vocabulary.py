"""Vocabulary, BoW scoring, loop-candidate detection tests."""

import numpy as np
import jax
import jax.numpy as jnp

from active_orb_slam2_tpu.models.vocabulary import (
    Vocabulary, train_vocabulary, transform, l1_score, detect_candidates)


def make_descs(rng, n=400):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def test_train_shapes(rng):
    voc = train_vocabulary(make_descs(rng), k=4, depth=3, iters=3)
    assert voc.n_words == 64
    assert voc.centers.shape == (4 + 16 + 64, 8)
    assert voc.idf.shape == (64,)


def test_transform_assigns_nearest_leaf(rng):
    desc = make_descs(rng, 300)
    voc = train_vocabulary(desc, k=4, depth=2, iters=4)
    words, bow = transform(voc, jnp.asarray(desc),
                           jnp.ones(300, bool))
    assert words.shape == (300,)
    assert (np.asarray(words) >= 0).all() and (np.asarray(words) < 16).all()
    # bow L1-normalized
    assert abs(float(jnp.abs(bow).sum()) - 1.0) < 1e-5


def test_same_descriptors_same_words(rng):
    desc = make_descs(rng, 100)
    voc = train_vocabulary(desc, k=4, depth=2, iters=4)
    w1, _ = transform(voc, jnp.asarray(desc), jnp.ones(100, bool))
    w2, _ = transform(voc, jnp.asarray(desc[:50]), jnp.ones(50, bool))
    np.testing.assert_array_equal(np.asarray(w1[:50]), np.asarray(w2))


def test_l1_score_properties(rng):
    desc = make_descs(rng, 200)
    voc = train_vocabulary(desc, k=4, depth=2, iters=4)
    _, bow_a = transform(voc, jnp.asarray(desc[:100]), jnp.ones(100, bool))
    _, bow_b = transform(voc, jnp.asarray(desc[100:]), jnp.ones(100, bool))
    # self-similarity = 1, cross < 1
    s_aa = float(l1_score(bow_a, bow_a[None])[0])
    s_ab = float(l1_score(bow_a, bow_b[None])[0])
    assert abs(s_aa - 1.0) < 1e-5
    assert s_ab < s_aa
    # similar image (80% same descriptors) scores between
    mix = np.concatenate([desc[:80], desc[100:120]])
    _, bow_m = transform(voc, jnp.asarray(mix), jnp.ones(100, bool))
    s_am = float(l1_score(bow_a, bow_m[None])[0])
    assert s_ab < s_am < s_aa + 1e-6


def test_detect_candidates_excludes_covis(rng):
    desc = make_descs(rng, 100)
    voc = train_vocabulary(desc, k=4, depth=2, iters=4)
    _, bow = transform(voc, jnp.asarray(desc), jnp.ones(100, bool))
    K = 8
    kf_bow = jnp.tile(bow[None], (K, 1))     # all identical -> score 1
    kf_valid = jnp.ones(K, bool)
    covis = jnp.zeros(K, bool).at[1].set(True).at[2].set(True)
    scores, accept = detect_candidates(bow, kf_bow, kf_valid, covis,
                                       min_score=0.5)
    acc = np.asarray(accept)
    assert not acc[1] and not acc[2]
    assert acc[3]
