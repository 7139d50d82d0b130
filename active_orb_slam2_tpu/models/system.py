"""System: the public API + host orchestrator.

Replaces the reference's ``System`` class (``src/System.cc`` [U]) and
its thread fabric: instead of four OS threads sharing a mutexed map
(SURVEY.md §5.2), one single-threaded orchestrator drives jitted device
steps — a fused frame-build + track step per frame, create_keyframe +
mapping_step per keyframe — over an immutable map pytree.  The
reference's "background local BA interruptible by new keyframes"
becomes deterministic bounded BA slices at keyframe rate (SURVEY.md
§5.3).

Asynchrony model (the TPU-native analog of the reference's thread
pipeline, SURVEY.md §2.5): the device link is treated as a deep queue.
Each frame is ONE fused dispatch (ORB extraction + tracking) that never
blocks the host; per-frame scalars (inlier counts, pose, keyframe-
decision inputs) are retired in small batches with a single stacked
device->host pull.  Host-side decisions (keyframe insertion, lost
detection) therefore run a bounded number of frames behind the device —
the same bounded staleness the reference's mapping/loop threads have
behind its tracking thread.  ``flush()`` drains the queue; reading
``System.state`` flushes implicitly so callers observe sequential
semantics.

API surface mirrors the reference: ``track_rgbd(im, depth, t) -> Tcw``,
``save_trajectory_tum``, ``save_keyframe_trajectory_tum``,
``save_trajectory_kitti``, ``activate_localization_mode``, plus
checkpointing the whole map (which stock ORB-SLAM2 famously lacks —
SURVEY.md §5.4).
"""

import numpy as np
import jax
import jax.numpy as jnp

from active_orb_slam2_tpu.config import SlamConfig
from active_orb_slam2_tpu.geometry.se3 import se3_to_mat44
from active_orb_slam2_tpu.io.trajectory import (
    resolve_frame_poses, save_tum, save_kitti)
from active_orb_slam2_tpu.models.frame import build_frame_pipeline
from active_orb_slam2_tpu.models.local_mapping import build_mapping_step
from active_orb_slam2_tpu.models.map_state import empty_map
from active_orb_slam2_tpu.models.tracking import (
    build_create_keyframe, build_track_step, init_track_state)

NOT_INITIALIZED = 0
OK = 1
LOST = 2


def _stats_ready(stats) -> bool:
    """Non-blocking: has this frame's stats array landed on the host?"""
    try:
        return stats.is_ready()
    except AttributeError:
        return True


def host_fetch(*arrays):
    """Pull device arrays to host WITHOUT the synchronous-RPC tax.

    On a tunneled device (axon) any blocking pull — ``np.asarray`` on a
    not-yet-copied array, ``block_until_ready`` — costs a ~25-40 ms
    round trip regardless of size, while ``is_ready`` polls are ~0.4 us
    and ``copy_to_host_async`` + asarray of a landed buffer is free.
    So: start async copies for everything, spin on is_ready (the wait
    then tracks true compute latency, not the sync-RPC floor), then
    read the host-cached buffers.
    """
    import time
    for a in arrays:
        try:
            a.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
    for a in arrays:
        try:
            while not a.is_ready():
                time.sleep(0.0002)
        except AttributeError:
            pass
    out = [np.asarray(a) for a in arrays]
    return out[0] if len(out) == 1 else out


class System:
    """RGB-D / stereo / monocular SLAM engine."""

    def __init__(self, cfg: SlamConfig, use_mapping: bool = True,
                 use_loop_closing: bool = False,
                 pipeline_depth=None, retire_batch=None,
                 vocab_path=None):
        self.cfg = cfg
        self.make_rgbd, self.make_mono = build_frame_pipeline(cfg)
        self.track_step = build_track_step(cfg)
        self.create_kf = build_create_keyframe(cfg)
        self.mapping_step = build_mapping_step(cfg)
        self.loop_closer = None
        if use_loop_closing:
            from active_orb_slam2_tpu.models.loop_closing import LoopCloser
            # vocab_path: pretrained DBoW2 text vocabulary, the analog
            # of the reference System(vocabFile, ...) argument; without
            # it the vocabulary is self-trained from map descriptors
            self.loop_closer = LoopCloser(cfg, vocab_path=vocab_path)
        self.n_loops_closed = 0
        self.relocalizer = None        # built lazily on first LOST frame

        # mapping refinement stages (triangulation / fuse / KF culling)
        from active_orb_slam2_tpu.models.local_mapping import (
            build_create_new_map_points, build_fuse_neighbors,
            build_keyframe_culling)
        self.create_points = build_create_new_map_points(cfg)
        self.fuse_neighbors = build_fuse_neighbors(cfg)
        self.kf_culling = build_keyframe_culling(cfg)
        self.triangulate_new_points = cfg.sensor == "mono"

        # monocular bootstrap (built lazily)
        self._mono_matcher = None
        self._mono_create = None
        self._mono_initializer = None
        self._ref_frame = None
        self._init_key = None
        self.map = empty_map(cfg.map, cfg.orb)
        self.track = init_track_state(cfg.orb.n_features)
        self._state = NOT_INITIALIZED
        self.use_mapping = use_mapping
        self.localization_only = False

        # async pipeline over the device queue.  Monocular tracking
        # depends on prompt keyframe triangulation (new points only
        # exist after a KF lands), so it retires synchronously; RGB-D /
        # stereo synthesize depth points per-KF and tolerate the
        # mapping-thread-style staleness, so they run deep.
        if pipeline_depth is None:
            pipeline_depth = 0 if cfg.sensor == "mono" else 6
        if retire_batch is None:
            retire_batch = 1 if cfg.sensor == "mono" else 4
        self.pipeline_depth = max(int(pipeline_depth), 0)
        self.retire_batch = max(int(retire_batch), 1)
        self._pending = []               # in-flight frame records
        self._fused = {}                 # per-sensor fused jit steps

        self.frame_id = 0
        self.kf_seq = 0                  # monotone keyframe counter
        self.last_kf_slot = -1
        self.last_kf_frame = -10**9
        self.last_kf_inliers = 0
        self.rel_records = []            # (t, ref_kf_slot, Tcr) per frame
        self.kf_records = []             # (t, kf_slot) per keyframe
        self.metrics = []                # per-frame dict

    # ----------------------------------------------------- state / pipeline

    def reset(self):
        """``System::Reset`` [U]: drop the map and all bookkeeping and
        return to NOT_INITIALIZED (the reference's mpTracker->Reset()
        clears Map, KeyFrameDatabase, and relative-pose records)."""
        self.flush()
        self.map = empty_map(self.cfg.map, self.cfg.orb)
        self.track = init_track_state(self.cfg.orb.n_features)
        self._state = NOT_INITIALIZED
        self._ref_frame = None
        self._init_key = None
        self.frame_id = 0
        self.kf_seq = 0
        self.last_kf_slot = -1
        self.last_kf_frame = -10**9
        self.last_kf_inliers = 0
        self.rel_records = []
        self.kf_records = []
        self.metrics = []
        self._pending = []
        if self.loop_closer is not None:
            self.loop_closer.prev_groups = []
            self.loop_closer.loop_edges = []
            self.loop_closer.last_loop_kf_seq = -10
        self.n_loops_closed = 0

    @property
    def state(self):
        """Tracking state; reading it drains the async pipeline so the
        caller observes sequential semantics."""
        self.flush()
        return self._state

    @state.setter
    def state(self, v):
        self._state = v

    def flush(self):
        """Retire every in-flight frame (drains the device queue)."""
        while self._pending:
            self._retire(len(self._pending))

    def _fused_step(self, kind):
        """(host inputs..., map, track) -> (frame, track', stats, map')
        as ONE jitted dispatch: ORB extraction fused with the tracking
        step so the steady-state loop costs a single enqueue."""
        if kind in self._fused:
            return self._fused[kind]
        track_step = self.track_step
        if kind == "rgbd":
            make = self.make_rgbd.packed

            def fused(packed, m, st):
                frame, _ = make(packed)
                st2, stats, m2 = track_step(m, frame, st)
                return frame, st2, stats, m2
        elif kind == "mono":
            make_mono = self.make_mono

            def fused(image, m, st):
                frame, _ = make_mono(image)
                st2, stats, m2 = track_step(m, frame, st)
                return frame, st2, stats, m2
        else:                            # stereo
            make_stereo = self._get_make_stereo()

            def fused(left, right, m, st):
                frame, _ = make_stereo(left, right)
                st2, stats, m2 = track_step(m, frame, st)
                return frame, st2, stats, m2
        self._fused[kind] = jax.jit(fused)
        return self._fused[kind]

    def _stack_stats(self, stats_list):
        """Pull a retirement batch to host.  Each entry's D2H copy was
        started asynchronously at dispatch time (``copy_to_host_async``),
        so with a deep enough pipeline these np.asarray calls read
        host-cached data instead of paying a device round trip.  If a
        copy hasn't landed yet, spin on is_ready instead of blocking
        (a blocking pull costs a ~25-40 ms sync RPC on the tunnel)."""
        import time
        for s in stats_list:
            try:
                while not s.is_ready():
                    time.sleep(0.0002)
            except AttributeError:
                break
        return np.stack([np.asarray(s) for s in stats_list])

    def _retire(self, n):
        """Pop the n oldest in-flight frames and run the host-side state
        machine on their (batched) stats: metrics, LOST detection,
        NeedNewKeyFrame + insertion, trajectory records."""
        import time
        batch = self._pending[:n]
        del self._pending[:n]
        stats = self._stack_stats([e["stats"] for e in batch])
        t_ret = time.perf_counter()
        for e in batch:
            e["t_retired"] = t_ret
        for e, s in zip(batch, stats):
            (n_mm, n_inliers, ok, close_tracked, close_unmatched,
             _n_assoc) = (int(v) for v in s[:6])
            pose_np = s[6:13].astype(np.float32)
            self.metrics.append({
                "frame": e["frame_id"], "ts": float(e["ts"]),
                "n_motion_inliers": n_mm,
                "n_inliers": n_inliers, "state": int(self._state),
                "n_keyframes": self.kf_seq,
                "wall_ms": round((e["t_retired"] - e["t_enq"]) * 1e3, 3)
                if "t_enq" in e else None})
            if not ok:
                self._state = LOST
            else:
                self._state = OK
                if (not self.localization_only and self.use_mapping
                        and self._need_new_keyframe(
                            e["frame_id"], n_inliers, close_tracked,
                            close_unmatched)):
                    self._insert_keyframe(
                        e["frame"], e["st"], e["ts"],
                        e["frame_id"], n_inliers)
            self._record_frame(e["ts"], pose_np)

    def _dispatch_track(self, kind, host_inputs, timestamp):
        """Enqueue one fused frame step; retire a batch if the pipeline
        is deep enough.  Never blocks on the current frame."""
        if self._state == LOST:
            self.flush()
            if self._state == LOST and not self._reloc_from_inputs(
                    kind, host_inputs):
                self.metrics.append({
                    "frame": self.frame_id, "ts": float(timestamp),
                    "n_motion_inliers": 0, "n_inliers": 0,
                    "state": LOST, "n_keyframes": self.kf_seq,
                    "wall_ms": None})
                self._record_frame(
                    timestamp, np.asarray(self.track.pose))
                self.frame_id += 1
                return self.track.pose
        import time
        frame, st, stats, m = self._fused_step(kind)(
            *host_inputs, self.map, self.track)
        self.map, self.track = m, st
        try:
            stats.copy_to_host_async()   # overlap D2H with the queue
        except (AttributeError, NotImplementedError):
            pass
        self._pending.append({
            "frame_id": self.frame_id, "ts": timestamp,
            "frame": frame, "st": st, "stats": stats,
            "t_enq": time.perf_counter()})
        # Retire EAGERLY: pop every frame whose stats already landed on
        # the host (non-blocking poll).  Staleness of the host state
        # machine (keyframe insertion!) then tracks the true device
        # latency — usually 1-2 frames — instead of a fixed deep-queue
        # bound; the queue depth below only caps memory when the device
        # falls far behind.
        n_ready = 0
        for e in self._pending[:-1]:
            if not _stats_ready(e["stats"]):
                break
            n_ready += 1
        if n_ready:
            self._retire(n_ready)
        if len(self._pending) >= self.pipeline_depth + self.retire_batch:
            self._retire(self.retire_batch)
        self.frame_id += 1
        return st.pose

    def _reloc_from_inputs(self, kind, host_inputs) -> bool:
        """Synchronous relocalization attempt (rare path)."""
        if kind == "rgbd":
            frame, _ = self.make_rgbd.packed(*host_inputs)
        elif kind == "mono":
            frame, _ = self.make_mono(*host_inputs)
        else:
            frame, _ = self._get_make_stereo()(*host_inputs)
        return self._try_relocalize(frame)

    # ------------------------------------------------------------- tracking

    def track_rgbd(self, gray, depth, timestamp: float):
        """Process one RGB-D frame; returns Tcw as a (lazy, device-side)
        4x4 array — ``np.asarray`` it to synchronize.

        ``gray`` [H, W] uint8 or float 0..255; ``depth`` metric float
        metres (0 = missing) or uint16 millimetres.  Transfers are
        narrowed to uint8/uint16 on the host side.
        """
        g = np.asarray(gray)
        if g.dtype != np.uint8:
            g = np.clip(g, 0, 255).astype(np.uint8)
        d = np.asarray(depth)
        if d.dtype != np.uint16:
            d = np.clip(d * 1e3, 0, 65535).astype(np.uint16)
        # one host->device transfer for the whole frame
        packed = np.stack([g.astype(np.uint16), d])
        if self._state == NOT_INITIALIZED:
            frame, n_depth = self.make_rgbd.packed(packed)
            pose = self._initialize(frame, int(n_depth), timestamp)
            self.frame_id += 1
        else:
            pose = self._dispatch_track("rgbd", (packed,), timestamp)
        return se3_to_mat44(jnp.asarray(pose))

    def _initialize(self, frame, n_depth, timestamp):
        """StereoInitialization (``src/Tracking.cc`` ~L510 [U]): first
        frame with enough depth points becomes KF 0 at the origin."""
        pose = jnp.asarray(self.track.pose)
        if n_depth < 100:
            self._record_frame(timestamp, np.asarray(pose))
            return pose
        assoc0 = jnp.full((self.cfg.orb.n_features,), -1, jnp.int32)
        self.map, k, ok = self.create_kf(
            self.map, frame, pose, assoc0, self.frame_id, self.kf_seq, -1)
        k, ok = host_fetch(k, ok)
        if not bool(ok):
            self._record_frame(timestamp, np.asarray(pose))
            return pose
        k = int(k)
        self.last_kf_slot = k
        self.kf_seq += 1
        self.last_kf_frame = self.frame_id
        n_obs, kf_pose_np = host_fetch(
            (self.map.kf_point[k] >= 0).sum(), self.map.kf_pose[k])
        self.last_kf_inliers = int(n_obs)
        self.kf_records.append((timestamp, k))
        # seed track state with the KF associations
        self.track = self.track._replace(
            assoc=self.map.kf_point[k],
            ok=jnp.array(True))
        self._state = OK
        self._last_kf_pose_np = kf_pose_np
        self._record_frame(timestamp, np.asarray(pose))
        return pose

    def _need_new_keyframe(self, frame_id, n_inliers, close_tracked,
                           close_unmatched) -> bool:
        """``Tracking::NeedNewKeyFrame`` (~L1010 [U]), host-side scalars.

        Rules kept: max-interval force; tracked-vs-reference ratio 0.9;
        the RGB-D 'need close points' rule (tracked-close < 100 while
        ≥ 70 close candidates are unmatched)."""
        t = self.cfg.tracking
        since = frame_id - self.last_kf_frame
        if since < max(t.kf_min_interval, 1):
            return False
        if self.kf_seq >= self.cfg.map.max_keyframes:
            return False
        if since >= t.kf_max_interval:
            return True
        weak = n_inliers < t.kf_ref_ratio * max(self.last_kf_inliers, 1)
        need_close = close_tracked < 100 and close_unmatched > 70
        return (weak or need_close) and n_inliers > 15

    def _insert_keyframe(self, frame, st, timestamp, frame_id, n_inliers):
        """Insert the retired frame as a keyframe and run the mapping
        stages.  All dispatches are async — the device queue absorbs
        them exactly like the reference's background mapping thread.
        The few scalars the host needs come back through host_fetch
        (async copy + is_ready spin), never a blocking sync RPC."""
        self.map, k, ok = self.create_kf(
            self.map, frame, st.pose, st.assoc,
            frame_id, self.kf_seq, self.last_kf_slot)
        k, ok = host_fetch(k, ok)
        if not bool(ok):
            return
        k = int(k)
        self.kf_seq += 1
        self.last_kf_slot = k
        self.last_kf_frame = frame_id
        self.last_kf_inliers = n_inliers
        self.kf_records.append((timestamp, k))
        victim = None
        if self.use_mapping and self.triangulate_new_points:
            # CreateNewMapPoints + SearchInNeighbors (reference mapping
            # thread order, SURVEY.md §3.3)
            self.map = self.create_points(self.map, k, self.kf_seq)
            self.map = self.fuse_neighbors(self.map, k)
        if self.use_mapping:
            self.map = self.mapping_step(self.map, k, self.kf_seq)
            self.map, victim = self.kf_culling(self.map, k)
        if self.loop_closer is not None:
            if victim is not None:
                self._on_keyframe_culled(int(host_fetch(victim)))
                victim = None
            self.map, closed = self.loop_closer.process_keyframe(
                self.map, k, self.kf_seq)
            if closed:
                self.n_loops_closed += 1
                # KF poses may have jumped: restart the motion model
                # from the corrected reference KF (in-flight frames are
                # pre-correction — same transient the reference has
                # while CorrectLoop runs behind its tracking thread)
                self.track = self.track._replace(
                    pose=self.map.kf_pose[k],
                    vel_ok=jnp.array(False))
        # host cache of the reference-KF pose for per-frame Tcr records;
        # fetch the victim in the same spin (one wait for both)
        if victim is not None:
            vnp, self._last_kf_pose_np = host_fetch(
                victim, self.map.kf_pose[k])
            self._on_keyframe_culled(int(vnp))
        else:
            self._last_kf_pose_np = host_fetch(self.map.kf_pose[k])

    def _on_keyframe_culled(self, victim: int):
        """Culled slots are recycled by later keyframes, so repoint any
        per-frame relative-pose records referencing the victim onto its
        spanning-tree parent (the reference's SaveTrajectoryTUM walks
        ``while (pKF->isBad()) { Trw = Trw*pKF->mTcp; pKF = parent; }``,
        src/System.cc ~L320-480 [U]).  Tcr' = Tcr . Tv . Tp^-1 keeps the
        replayed frame pose identical at cull time and lets it follow
        the parent through later BA / loop corrections."""
        if victim < 0:
            return
        from active_orb_slam2_tpu.utils import np_se3
        parent_a, vpose_a = host_fetch(
            self.map.kf_parent[victim], self.map.kf_pose[victim])
        parent = int(parent_a)
        vpose = np.asarray(vpose_a, np.float64)
        ppose = np.asarray(host_fetch(self.map.kf_pose[parent]),
                           np.float64)
        t_vp = np_se3.se3_compose(vpose, np_se3.se3_inverse(ppose))
        self.rel_records = [
            (t, parent, np_se3.se3_compose(tcr, t_vp)) if ref == victim
            else (t, ref, tcr)
            for (t, ref, tcr) in self.rel_records]
        self.kf_records = [r for r in self.kf_records if r[1] != victim]

    def _record_frame(self, timestamp, pose_np):
        """Store Tcr relative to the reference KF (host-side numpy; the
        cached ref pose may lag device-side BA updates by millimetres —
        the same tolerance the reference's mutex interleaving has)."""
        from active_orb_slam2_tpu.utils import np_se3
        ref = max(self.last_kf_slot, 0)
        ref_pose = getattr(self, "_last_kf_pose_np", None)
        if ref_pose is None:
            ref_pose = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        tcr = np_se3.se3_compose(np.asarray(pose_np, np.float64),
                                 np_se3.se3_inverse(
                                     np.asarray(ref_pose, np.float64)))
        self.rel_records.append((timestamp, ref, tcr))

    # -------------------------------------------------------------- stereo

    def _get_make_stereo(self):
        if not hasattr(self, "_make_stereo"):
            from active_orb_slam2_tpu.models.frame import (
                build_stereo_pipeline)
            self._make_stereo = build_stereo_pipeline(self.cfg)
        return self._make_stereo

    def track_stereo(self, left, right, timestamp: float):
        """Stereo tracking (``System::TrackStereo`` [U]); rectified
        pair -> row-SAD depth -> identical back end to RGB-D."""
        l = np.asarray(left)
        r = np.asarray(right)
        if l.dtype != np.uint8:
            l = np.clip(l, 0, 255).astype(np.uint8)
        if r.dtype != np.uint8:
            r = np.clip(r, 0, 255).astype(np.uint8)
        if self._state == NOT_INITIALIZED:
            frame, n_depth = self._get_make_stereo()(l, r)
            pose = self._initialize(frame, int(n_depth), timestamp)
            self.frame_id += 1
        else:
            pose = self._dispatch_track("stereo", (l, r), timestamp)
        return se3_to_mat44(jnp.asarray(pose))

    # ------------------------------------------------------------ monocular

    def track_mono(self, gray, timestamp: float):
        """Monocular tracking (``System::TrackMonocular`` [U])."""
        g = np.asarray(gray)
        if g.dtype != np.uint8:
            g = np.clip(g, 0, 255).astype(np.uint8)
        if self._state == NOT_INITIALIZED:
            frame, _ = self.make_mono(g)
            pose = self._initialize_mono(frame, timestamp)
            self.frame_id += 1
        else:
            pose = self._dispatch_track("mono", (g,), timestamp)
        return se3_to_mat44(jnp.asarray(pose))

    def _initialize_mono(self, frame, timestamp):
        """MonocularInitialization (~L570 [U]): H/F race vs a reference
        frame, two-KF map, median-depth gauge."""
        from active_orb_slam2_tpu.models.initializer import (
            build_initializer)
        from active_orb_slam2_tpu.models.mono_init import (
            build_create_initial_map, build_mono_matcher)
        if self._mono_matcher is None:
            self._mono_matcher = build_mono_matcher(self.cfg)
            self._mono_create = build_create_initial_map(self.cfg)
            self._mono_initializer = build_initializer(self.cfg.camera)
            self._init_key = jax.random.PRNGKey(3)

        pose = jnp.asarray(self.track.pose)
        n_valid = int(host_fetch(frame.valid.sum()))
        if self._ref_frame is None or n_valid < 100:
            if n_valid >= 100:
                self._ref_frame = frame
            self._record_frame(timestamp, np.asarray(pose))
            return pose

        match_idx, n_m = self._mono_matcher(self._ref_frame, frame)
        if int(n_m) < 100:
            self._ref_frame = frame if n_valid >= 100 else None
            self._record_frame(timestamp, np.asarray(pose))
            return pose

        self._init_key, sub = jax.random.split(self._init_key)
        ref = self._ref_frame
        uv2 = frame.uv[jnp.clip(match_idx, 0)]
        res = self._mono_initializer(
            sub, ref.uv, uv2, match_idx >= 0)
        if not bool(res.ok):
            self._record_frame(timestamp, np.asarray(pose))
            return pose

        self.map, kp1, pose2, n_pts = self._mono_create(
            self.map, ref, frame, res.pose2, res.points,
            res.point_ok, match_idx)
        if int(n_pts) < 80:
            self._record_frame(timestamp, np.asarray(pose))
            return pose
        self.kf_seq = 2
        self.last_kf_slot = 1
        self.last_kf_frame = self.frame_id
        self.last_kf_inliers = int(n_pts)
        self.kf_records.append((timestamp - 1 / 30.0, 0))
        self.kf_records.append((timestamp, 1))
        self.track = self.track._replace(
            pose=pose2, assoc=kp1, ok=jnp.array(True),
            vel_ok=jnp.array(False))
        self._state = OK
        self._last_kf_pose_np = host_fetch(self.map.kf_pose[1])
        self._record_frame(timestamp, np.asarray(pose2))
        return pose2

    def _try_relocalize(self, frame) -> bool:
        """``Tracking::Relocalization`` [U]: BoW candidates -> batched
        PnP RANSAC -> pose refinement; >= 50 inliers to accept."""
        if self.relocalizer is None:
            from active_orb_slam2_tpu.models.relocalization import (
                build_relocalizer)
            self.relocalizer = build_relocalizer(self.cfg)
            self._reloc_key = jax.random.PRNGKey(11)

        n_cand = 4
        lc = self.loop_closer
        if lc is not None and lc.ensure_vocabulary(self.map) is not None:
            # KeyFrameDatabase::DetectRelocalizationCandidates [U] —
            # score against every KF (sparse BoW path for big vocabs)
            scores = np.asarray(lc.score_query(
                self.map, frame.desc, frame.valid)).copy()
            scores[~np.asarray(self.map.kf_valid)] = -1.0
            cands = np.argsort(-scores)[:n_cand].astype(np.int32)
            cands[scores[cands] <= 0] = -1
        else:
            # no vocabulary yet: try the most recent keyframes
            slots = [k for _, k in self.kf_records[-n_cand:]][::-1]
            if not slots:
                # e.g. right after load_map: no host records — fall
                # back to the newest valid slots in the arena itself
                valid = np.flatnonzero(np.asarray(self.map.kf_valid))
                fid = np.asarray(self.map.kf_frame_id)[valid]
                slots = list(valid[np.argsort(-fid)][:n_cand])
            cands = np.full(n_cand, -1, np.int32)
            cands[:len(slots)] = slots
        self._reloc_key, sub = jax.random.split(self._reloc_key)
        res = self.relocalizer(self.map, frame, jnp.asarray(cands), sub)
        if not bool(res.ok):
            return False
        self.track = self.track._replace(
            pose=res.pose, assoc=res.assoc,
            vel_ok=jnp.array(False), ok=jnp.array(True))
        self._state = OK
        return True

    # ------------------------------------------------------------ mode API

    def activate_localization_mode(self):
        self.flush()
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.flush()
        self.localization_only = False

    # ------------------------------------------------------------- outputs

    def frame_trajectory(self):
        """(timestamps, Tcw [N, 7]) with relative poses replayed against
        the final keyframe poses, like SaveTrajectoryTUM."""
        self.flush()
        return resolve_frame_poses(self.rel_records,
                                   np.asarray(self.map.kf_pose))

    def keyframe_trajectory(self):
        self.flush()
        ts = np.array([t for t, _ in self.kf_records])
        poses = np.stack([np.asarray(self.map.kf_pose[k])
                          for _, k in self.kf_records]) \
            if self.kf_records else np.zeros((0, 7))
        return ts, poses

    def save_trajectory_tum(self, path):
        ts, poses = self.frame_trajectory()
        save_tum(path, ts, poses)

    def save_keyframe_trajectory_tum(self, path):
        ts, poses = self.keyframe_trajectory()
        save_tum(path, ts, poses)

    def save_trajectory_kitti(self, path):
        _, poses = self.frame_trajectory()
        save_kitti(path, poses)

    def save_metrics(self, path):
        """Per-frame structured metrics as JSONL (SURVEY.md §5.5 — the
        reference only has stdout banners + viewer counts; we log frame
        state, match/inlier counts, keyframe count, and pipeline wall
        time per frame)."""
        import json
        self.flush()
        with open(path, "w") as f:
            for m in self.metrics:
                f.write(json.dumps(m) + "\n")

    def checkpoint(self):
        """The whole map as a dict of numpy arrays (save/load/resume —
        absent in stock ORB-SLAM2, SURVEY.md §5.4)."""
        self.flush()
        return {f: np.asarray(getattr(self.map, f))
                for f in self.map._fields}

    def restore(self, ckpt: dict):
        self.flush()
        self.map = self.map._replace(
            **{f: jnp.asarray(v) for f, v in ckpt.items()})

    def save_map(self, path):
        """Persist the map arena + host counters to one ``.npz`` file.

        Map save/load is famously absent in stock ORB-SLAM2 (SURVEY.md
        §5.4); the arena design makes it a plain array dump.
        """
        ckpt = self.checkpoint()
        ckpt["_host_kf_seq"] = np.int64(self.kf_seq)
        ckpt["_host_last_kf_slot"] = np.int64(self.last_kf_slot)
        np.savez_compressed(path, **ckpt)

    def load_map(self, path):
        """Load a map saved by :meth:`save_map` and resume against it.

        Tracking restarts in the LOST state, so the next frame
        relocalizes into the loaded map — the map-reuse flow (typically
        combined with ``activate_localization_mode()``).
        """
        data = np.load(path)
        self.restore({k: data[k] for k in data.files
                      if not k.startswith("_host_")})
        self.kf_seq = int(data["_host_kf_seq"])
        self.last_kf_slot = int(data["_host_last_kf_slot"])
        self.last_kf_frame = -10**9
        self.track = init_track_state(self.cfg.orb.n_features)
        self._state = LOST if self.kf_seq > 0 else NOT_INITIALIZED
