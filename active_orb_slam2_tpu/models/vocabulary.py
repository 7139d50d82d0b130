"""Hierarchical binary BoW vocabulary + inverted-index place recognition.

TPU-native equivalent of the reference's vendored DBoW2
(``Thirdparty/DBoW2`` [U], SURVEY.md §2.2): a k-branching hierarchical
k-medians tree over 256-bit ORB descriptors, tf-idf BoW vectors, L1
scoring, and the ``KeyFrameDatabase`` loop/relocalization queries
(``src/KeyFrameDatabase.cc`` [U]).

Differences by design:
  * The reference ships a pretrained 1M-word vocabulary
    (``Vocabulary/ORBvoc.txt``, 145 MB) which is unavailable here and
    whose descriptors come from a different BRIEF pattern anyway
    (ops/orb.py divergence note) — so the vocabulary is TRAINED on the
    fly from the map's own descriptors (k=10, depth 3-4 → 1k-10k
    words).  Loop-closure recall tracks the deployment domain instead
    of a generic corpus; SURVEY.md §7.4 item 4 flags this divergence.
  * ``transform()`` is a batched tree descent: per level one gathered
    Hamming-argmin over the k children — vmapped over all descriptors.
  * DBoW2's FeatureVector node-bucketed matching (levelsup=4) is
    dropped: SearchByBoW runs the full MXU Hamming matrix, which on TPU
    is faster than bucketing.
  * BoW vectors are dense [W] tf-idf rows (fixed shape, matmul-able);
    the "inverted file" is one [K, W] matrix — scoring every keyframe
    against a query is a single matvec.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from active_orb_slam2_tpu.ops.matching import hamming_matrix


class Vocabulary(NamedTuple):
    """Flattened k-ary tree. Level l has k^l nodes, contiguous."""
    centers: jnp.ndarray    # [n_nodes, 8] uint32 (level-major, root absent)
    k: int                  # branching factor
    depth: int              # number of levels below root
    idf: jnp.ndarray        # [k^depth] inverse-document-frequency weights

    @property
    def n_words(self):
        return self.k ** self.depth


def _majority_center(desc_bits, weights):
    """Bitwise weighted majority -> packed uint32[8]."""
    s = (desc_bits * weights[:, None]).sum(0)
    maj = (2 * s > weights.sum()).astype(np.uint32)
    lanes = maj.reshape(8, 32)
    return (lanes << np.arange(32, dtype=np.uint32)).sum(1, dtype=np.uint32)


def _unpack_np(desc):
    bits = (desc[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1
    return bits.reshape(desc.shape[0], 256)


def _hamming_np(a, b):
    """[M, 8] x [N, 8] uint32 -> [M, N] int popcount (numpy oracle)."""
    x = a[:, None, :] ^ b[None, :, :]
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def train_vocabulary(descriptors: np.ndarray, k: int = 10, depth: int = 3,
                     iters: int = 8, seed: int = 0) -> Vocabulary:
    """Hierarchical binary k-medians (DBoW2's build, trimmed).

    ``descriptors`` [N, 8] uint32; duplicates fine.  Host-side training
    (offline path, like the reference's vocabulary creation tooling).
    """
    rng = np.random.default_rng(seed)
    desc = np.asarray(descriptors, dtype=np.uint32)
    bits = _unpack_np(desc)

    levels = []          # level l: [k^(l+1), 8] centers
    assign = np.zeros(desc.shape[0], dtype=np.int64)  # node id at cur level

    for level in range(depth):
        n_parents = k ** level
        centers = np.zeros((n_parents * k, 8), np.uint32)
        new_assign = np.zeros_like(assign)
        for parent in range(n_parents):
            sel = np.where(assign == parent)[0]
            if len(sel) == 0:
                # empty branch: random centers so the tree stays full
                centers[parent * k:(parent + 1) * k] = rng.integers(
                    0, 2**32, (k, 8), dtype=np.uint32)
                continue
            sub = desc[sel]
            sub_bits = bits[sel]
            # k-medians init: random distinct picks
            picks = rng.choice(len(sel), size=min(k, len(sel)),
                               replace=False)
            c = sub[picks]
            if len(picks) < k:
                c = np.concatenate([c, rng.integers(
                    0, 2**32, (k - len(picks), 8), dtype=np.uint32)])
            for _ in range(iters):
                d = _hamming_np(sub, c)
                a = d.argmin(1)
                for j in range(k):
                    mask = a == j
                    if mask.any():
                        c[j] = _majority_center(
                            sub_bits[mask], np.ones(mask.sum()))
            d = _hamming_np(sub, c)
            a = d.argmin(1)
            centers[parent * k:(parent + 1) * k] = c
            new_assign[sel] = parent * k + a
        levels.append(centers)
        assign = new_assign

    all_centers = np.concatenate(levels, axis=0)
    # idf from the training corpus treated as one document per 500 descs
    words = assign
    n_words = k ** depth
    df = np.bincount(words, minlength=n_words).astype(np.float32)
    idf = np.log(float(len(words) + n_words) / (df + 1.0))
    return Vocabulary(centers=jnp.asarray(all_centers), k=k, depth=depth,
                      idf=jnp.asarray(idf))


def transform(voc: Vocabulary, desc, valid):
    """Descriptors [F, 8] -> (word ids [F], bow [W] L1-normalized tf-idf).

    The hot-path equivalent of DBoW2 ``TemplatedVocabulary::transform``.
    """
    k, depth = voc.k, voc.depth
    level_offset = 0
    node = jnp.zeros(desc.shape[0], jnp.int32)   # index within level
    for level in range(depth):
        child_base = level_offset + node[:, None] * k + jnp.arange(k)
        cents = voc.centers[child_base]                    # [F, k, 8]
        x = desc[:, None, :] ^ cents
        d = jax.lax.population_count(x).sum(-1)            # [F, k]
        best = jnp.argmin(d, axis=-1).astype(jnp.int32)
        node = node * k + best
        level_offset += voc.k ** (level + 1)
    words = node
    W = voc.n_words
    counts = jnp.zeros(W).at[words].add(valid.astype(jnp.float32))
    tfidf = counts * voc.idf
    norm = jnp.maximum(jnp.abs(tfidf).sum(), 1e-9)
    return words, tfidf / norm


def l1_score(bow_q, bow_db):
    """DBoW2 L1 similarity: s = 1 - 0.5 * |q - d|_1 for L1-normalized
    vectors.  bow_db may be [K, W]; returns [K]."""
    diff = jnp.abs(bow_q[None, :] - bow_db).sum(-1)
    return 1.0 - 0.5 * diff


def detect_candidates(bow_q, kf_bow, kf_valid, covis_mask, min_score,
                      covis_weights=None, top_n: int = 10):
    """``KeyFrameDatabase::DetectLoopCandidates`` (~L50-150 [U]),
    dense reformulation.

    Scores every valid KF; excludes the query's covisible group; applies
    the reference's accumulated-group-score rule (sum scores over each
    candidate's top-covisible group, keep >= 0.75 * best).

    Args:
      covis_mask [K] bool — KFs connected to the query (excluded).
      covis_weights [K, K] — for group accumulation (optional).
    Returns (scores [K], accept [K] bool).
    """
    s = l1_score(bow_q, kf_bow)
    eligible = kf_valid & ~covis_mask & (s >= min_score)
    s_eff = jnp.where(eligible, s, 0.0)
    if covis_weights is not None:
        # group score: candidate + its top-10 covisible candidates
        W = covis_weights
        topw, topi = jax.lax.top_k(W, top_n)               # [K, top_n]
        member_ok = (topw > 0) & eligible[topi]
        acc = s_eff + (jnp.where(member_ok, s_eff[topi], 0.0)).sum(-1)
        best_acc = jnp.max(acc)
        accept = eligible & (acc >= 0.75 * best_acc) & (best_acc > 0)
    else:
        accept = eligible
    return s, accept
