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
Each frame is ONE fused dispatch (ORB extraction + tracking +
NeedNewKeyFrame + CreateNewKeyFrame — the keyframe decision and
insertion run ON DEVICE with zero staleness) that never blocks the
host; per-frame scalars (inlier counts, pose, inserted-KF slot,
reference-KF pose) are retired in small batches with a single stacked
device->host pull.  The host state machine (LOST detection, mapping /
loop-closing stages, trajectory records) therefore runs a bounded
number of frames behind the device — the same bounded staleness the
reference's mapping/loop threads have behind its tracking thread.
``flush()`` drains the queue; reading ``System.state`` flushes
implicitly so callers observe sequential semantics.

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

# ONE jitted dispatch for the per-frame pose->Tcw-matrix return value.
# Unjitted, this was ~10 eager ops PER FRAME, each paying the tunneled
# device's dispatch latency — measured ~46 ms/frame of host time in the
# round-3 profile (scripts/profile_r3b.py), dwarfing the 5 ms device
# step.  The result stays a lazy device array; callers np.asarray it.
_to_mat44 = jax.jit(se3_to_mat44)


@jax.jit
def _rebase_pose(pose, old_ref, new_ref):
    """Re-express a carried Tcw in loop-corrected coordinates.

    Tcr = pose . old_ref^-1 is invariant under the correction, so
    pose' = Tcr . new_ref moves the tracking chain by exactly the
    reference keyframe's correction delta.  The constant-velocity
    model (a relative pose) is invariant under this rebase, so the
    motion model survives a loop closure without the round-3 teleport
    (overwriting pose with the corrected KF pose lost the frames the
    device pipeline had tracked past that KF — the verify drive showed
    0.7 m frame-error spikes right after each closure)."""
    from active_orb_slam2_tpu.geometry.se3 import (
        se3_compose, se3_inverse)
    return se3_compose(se3_compose(pose, se3_inverse(old_ref)), new_ref)
from active_orb_slam2_tpu.io.trajectory import (
    resolve_frame_poses, save_tum, save_kitti)
from active_orb_slam2_tpu.models.frame import build_frame_pipeline
from active_orb_slam2_tpu.models.map_state import empty_map
from active_orb_slam2_tpu.models.tracking import (
    STATS_POSE, STATS_REF_FID, STATS_REF_POSE, build_create_keyframe,
    build_track_step, init_track_state)

NOT_INITIALIZED = 0
OK = 1
LOST = 2


def _stats_ready(entry) -> bool:
    """Non-blocking: has this frame's stats batch landed on the host?"""
    b = entry.get("batch")
    if b is None:
        return False                     # not yet grouped into a batch
    try:
        return b["arr"].is_ready()
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
        self.loop_closer = None
        if use_loop_closing:
            from active_orb_slam2_tpu.models.loop_closing import LoopCloser
            # vocab_path: pretrained DBoW2 text vocabulary, the analog
            # of the reference System(vocabFile, ...) argument; without
            # it the vocabulary is self-trained from map descriptors
            self.loop_closer = LoopCloser(cfg, vocab_path=vocab_path)
        self.n_loops_closed = 0
        self.relocalizer = None        # built lazily on first LOST frame

        # keyframe-rate mapping stages (triangulation / fuse / local BA
        # / KF culling), fused into ONE jitted dispatch that computes
        # the covisibility matrix once per keyframe event (round-3
        # verdict: W was recomputed 4-5x per KF across the stages).
        # CreateNewMapPoints runs for EVERY sensor in the reference
        # (LocalMapping::Run is sensor-agnostic, src/LocalMapping.cc
        # ~L210 [U]).  For stereo/RGB-D the depth synthesis at keyframe
        # creation covers close points, so the unmatched features the
        # triangulator sees are exactly the far / no-depth ones — the
        # points KITTI-style sequences need beyond ThDepth*baseline.
        from active_orb_slam2_tpu.models.local_mapping import (
            build_keyframe_culling, build_keyframe_mapping)
        self.triangulate_new_points = True
        self.keyframe_mapping = build_keyframe_mapping(
            cfg, triangulate=True)
        # forced eviction for the arena-full path only (no reference
        # analog; see make_cull_body)
        self.kf_culling_forced = build_keyframe_culling(cfg, force=True)
        self.profile_stages = False
        self.stage_ms = {}             # last per-stage wall ms (profile)

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
        self._stack_fns = {}             # per-size jitted stats stackers
        self._flag_cache = {}            # device-resident bool scalars

        self.frame_id = 0
        self.kf_seq = 0                  # monotone keyframe counter
        self.n_live_kf = 0               # live (valid) keyframe count
        self.last_kf_slot = -1
        self.last_kf_frame = -10**9
        self.last_kf_inliers = 0
        self.rel_records = []            # (t, ref_kf_slot, Tcr) per frame
        self.kf_records = []             # (t, kf_slot) per keyframe
        self._live_slots = set()         # live KF slots (host mirror)
        self._slot_fid = {}              # slot -> source frame id (gen tag)
        # (slot, fid) -> (parent, T_vp, pfid, created_frame).  Entries
        # are path-compressed at cull time and pruned once no in-flight
        # frame can reference that generation (see _prune_redirects) —
        # unpruned, this grew one entry per cull forever (r4 advisor).
        self._cull_redirect = {}
        self._kf_ins_frames = []         # frame ids of KF insertions
        self._pending_culls = []         # deferred cull victims (device)
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
        self.n_live_kf = 0
        self.last_kf_slot = -1
        self.last_kf_frame = -10**9
        self.last_kf_inliers = 0
        self.rel_records = []
        self.kf_records = []
        self._live_slots = set()
        self._slot_fid = {}
        self._cull_redirect = {}
        self._kf_ins_frames = []
        self._pending_culls = []
        self.metrics = []
        self._pending = []
        if self.loop_closer is not None:
            self.loop_closer.reset_state()
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
        self._seal_stats_batch()
        while self._pending:
            self._retire(len(self._pending))
        self._process_pending_culls()

    def _flag(self, b):
        """Device-resident cached bool scalar (see _dispatch_track)."""
        key = bool(b)
        if key not in self._flag_cache:
            self._flag_cache[key] = jax.device_put(jnp.asarray(key))
        return self._flag_cache[key]

    def _fused_step(self, kind):
        """(host inputs..., map, track) -> (frame, track', stats, map')
        as ONE jitted dispatch: ORB extraction fused with the tracking
        step so the steady-state loop costs a single enqueue."""
        if kind in self._fused:
            return self._fused[kind]
        track_step = self.track_step
        # the caller-facing Tcw 4x4 is produced INSIDE the fused step:
        # a separate _to_mat44 dispatch per frame paid the tunnel's
        # per-dispatch host overhead (~1-4 ms) for a 16-float transform
        if kind == "rgbd":
            make = self.make_rgbd.packed

            def fused(packed, m, st, allow_kf, loc_mode):
                frame, _ = make(packed)
                st2, stats, m2 = track_step(m, frame, st, allow_kf,
                                            loc_mode)
                return frame, st2, stats, m2, se3_to_mat44(st2.pose)
        elif kind == "mono":
            make_mono = self.make_mono

            def fused(image, m, st, allow_kf, loc_mode):
                frame, _ = make_mono(image)
                st2, stats, m2 = track_step(m, frame, st, allow_kf,
                                            loc_mode)
                return frame, st2, stats, m2, se3_to_mat44(st2.pose)
        else:                            # stereo
            make_stereo = self._get_make_stereo()

            def fused(left, right, m, st, allow_kf, loc_mode):
                frame, _ = make_stereo(left, right)
                st2, stats, m2 = track_step(m, frame, st, allow_kf,
                                            loc_mode)
                return frame, st2, stats, m2, se3_to_mat44(st2.pose)
        self._fused[kind] = jax.jit(fused)
        return self._fused[kind]

    def _seal_stats_batch(self):
        """Stack the open group of per-frame stats into ONE device
        array and start ONE async D2H copy for the whole group.

        Per-frame copy_to_host_async calls each paid a tunnel RPC
        (~9 ms/frame measured, scripts/profile_r3b.py); batching them
        at retire_batch granularity amortizes that to one pull per
        batch — the same batched-retirement idea as round 1, moved from
        the host side to the device side so the wire sees one transfer.
        """
        group = [e for e in self._pending if e.get("batch") is None]
        if not group:
            return
        n = len(group)
        fn = self._stack_fns.get(n)
        if fn is None:
            fn = jax.jit(lambda *xs: jnp.stack(xs))
            self._stack_fns[n] = fn
        arr = fn(*[e["stats"] for e in group])
        try:
            arr.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        batch = {"arr": arr}
        for i, e in enumerate(group):
            e["batch"] = batch
            e["slot"] = i

    def _fetch_stats(self, entries):
        """Host numpy stats rows for retiring entries (batches were
        sealed and copied asynchronously; spin, never block-pull)."""
        import time
        arrs = {id(e["batch"]): e["batch"]["arr"] for e in entries}
        for a in arrs.values():
            try:
                while not a.is_ready():
                    time.sleep(0.0002)
            except AttributeError:
                pass
        host = {k: np.asarray(a) for k, a in arrs.items()}
        return np.stack([host[id(e["batch"])][e["slot"]]
                         for e in entries])

    def _retire(self, n):
        """Pop the n oldest in-flight frames and run the host-side state
        machine on their (batched) stats: metrics, LOST detection,
        mapping/loop stages for device-inserted keyframes, trajectory
        records.  Keyframe DECISION + INSERTION already happened on
        device inside the fused step (zero staleness); the host mirrors
        the counters and runs the keyframe-rate mapping stages — the
        same boundedly-stale relationship the reference's mapping
        thread has to its tracking thread."""
        import time
        batch = self._pending[:n]
        if any(e.get("batch") is None for e in batch):
            self._seal_stats_batch()
        del self._pending[:n]
        stats = self._fetch_stats(batch)
        t_ret = time.perf_counter()
        for e in batch:
            e["t_retired"] = t_ret
        for e, s in zip(batch, stats):
            (n_mm, n_inliers, ok, close_tracked, close_unmatched,
             _n_assoc, kf_slot, ref_slot) = (int(v) for v in s[:8])
            pose_np = s[STATS_POSE].astype(np.float32)
            ref_pose_np = s[STATS_REF_POSE].astype(np.float32)
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
                if kf_slot >= 0:
                    self._register_keyframe(kf_slot, e["ts"],
                                            e["frame_id"], n_inliers)
            # a frame can retire AFTER its device-side reference KF was
            # culled — and the slot may already be RE-TENANTED by a new
            # keyframe, so liveness alone is not enough: the generation
            # tag (source frame id) must match too, else the replay
            # would compose against a different keyframe's pose (the
            # r4 endurance runs replayed km-scale garbage this way).
            # Mismatched records walk the cull-redirect lineage to a
            # live ancestor (freezing them in stale coordinates instead
            # left metre-scale errors after later loop corrections).
            ref_fid = int(s[STATS_REF_FID])
            gen_ok = (ref_slot >= 0
                      and ref_slot in self._live_slots
                      and self._slot_fid.get(ref_slot) == ref_fid)
            if ref_slot >= 0 and not gen_ok:
                from active_orb_slam2_tpu.utils import np_se3
                tcr = np_se3.se3_compose(
                    np.asarray(pose_np, np.float64),
                    np_se3.se3_inverse(
                        np.asarray(ref_pose_np, np.float64)))
                slot, fid = ref_slot, ref_fid
                hops = 0
                for _hop in range(64):       # bounded lineage walk
                    nxt = self._cull_redirect.get((slot, fid))
                    if nxt is None:
                        break
                    p, t_vp, pfid = nxt[0], nxt[1], nxt[2]
                    tcr = np_se3.se3_compose(tcr, t_vp)
                    slot, fid = p, pfid
                    hops += 1
                    if slot < 0:
                        break
                ok_end = (slot >= 0 and slot in self._live_slots
                          and self._slot_fid.get(slot) == fid)
                if ok_end:
                    self.rel_records.append((e["ts"], slot, tcr))
                elif hops > 0 and slot < 0:
                    # lineage ended in an absolute repoint: tcr already
                    # composes to a world pose at cull time
                    self.rel_records.append((e["ts"], -1, tcr))
                else:
                    # no lineage info: freeze at the tracked pose
                    self.rel_records.append(
                        (e["ts"], -1, np.asarray(pose_np, np.float64)))
            else:
                self._record_frame(e["ts"], pose_np,
                                   ref=ref_slot if ref_slot >= 0 else None,
                                   ref_pose=ref_pose_np)
        # arena nearly full: evict a redundant keyframe so the device's
        # (live < max) gate reopens — culling otherwise only runs at
        # keyframe rate and a full arena would deadlock
        if self.n_live_kf >= self.cfg.map.max_keyframes:
            self._cull_for_space()
        self._prune_redirects()

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
                return _to_mat44(jnp.asarray(self.track.pose))
        import time
        # device-cached flag buffers: a fresh np.bool_ argument would
        # be a new tiny H2D transfer EVERY frame (each put pays a
        # tunnel RPC); reusing a committed device scalar costs nothing
        allow_kf = self._flag(self.use_mapping
                              and not self.localization_only)
        loc_mode = self._flag(self.localization_only)
        frame, st, stats, m, mat44 = self._fused_step(kind)(
            *host_inputs, self.map, self.track, allow_kf, loc_mode)
        self.map, self.track = m, st
        self._pending.append({
            "frame_id": self.frame_id, "ts": timestamp,
            "frame": frame, "st": st, "stats": stats,
            "t_enq": time.perf_counter()})
        # group stats D2H at retire_batch granularity: one stacked
        # device array + one async copy per batch (see _seal_stats_batch)
        if sum(1 for e in self._pending
               if e.get("batch") is None) >= self.retire_batch:
            self._seal_stats_batch()
        # Retire EAGERLY: pop every frame whose stats batch already
        # landed on the host (non-blocking poll).  Staleness of the
        # host state machine (keyframe insertion!) then tracks the true
        # device latency instead of a fixed deep-queue bound; the queue
        # depth below only caps memory when the device falls behind.
        n_ready = 0
        for e in self._pending[:-1]:
            if not _stats_ready(e):
                break
            n_ready += 1
        if n_ready:
            self._retire(n_ready)
        if len(self._pending) >= self.pipeline_depth + self.retire_batch:
            self._retire(self.retire_batch)
        self.frame_id += 1
        return mat44

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
        # one host->device transfer for the whole frame, byte-packed:
        # row 0 gray, rows 1/2 depth lo/hi bytes (the tunnel link is
        # bandwidth-bound at ~80 MB/s — every byte counts)
        packed = np.empty((3,) + g.shape, np.uint8)
        packed[0] = g
        packed[1] = (d & 0xFF).astype(np.uint8)
        packed[2] = (d >> 8).astype(np.uint8)
        if self._state == NOT_INITIALIZED:
            frame, n_depth = self.make_rgbd.packed(packed)
            pose = self._initialize(frame, int(n_depth), timestamp)
            self.frame_id += 1
            return _to_mat44(jnp.asarray(pose))
        return self._dispatch_track("rgbd", (packed,), timestamp)

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
        self._live_slots.add(k)
        self._slot_fid[k] = self.frame_id
        self._kf_ins_frames.append(self.frame_id)
        self.kf_seq += 1
        self.n_live_kf += 1
        self.last_kf_frame = self.frame_id
        n_obs, kf_pose_np = host_fetch(
            (self.map.kf_point[k] >= 0).sum(), self.map.kf_pose[k])
        self.last_kf_inliers = int(n_obs)
        self.kf_records.append((timestamp, k))
        # seed track state with the KF associations (+ angles, for the
        # motion-stage rotation-consistency filter) and the device-side
        # keyframe-decision counters
        self.track = self.track._replace(
            assoc=self.map.kf_point[k],
            angle=frame.angle,
            ok=jnp.array(True),
            frame_id=jnp.array(self.frame_id + 1, jnp.int32),
            kf_seq=jnp.array(self.kf_seq, jnp.int32),
            last_kf_slot=jnp.array(k, jnp.int32),
            last_kf_inliers=jnp.array(self.last_kf_inliers, jnp.int32),
            frames_since_kf=jnp.array(0, jnp.int32))
        self._state = OK
        self._last_kf_pose_np = kf_pose_np
        self._record_frame(timestamp, np.asarray(pose))
        return pose

    def _cull_for_space(self) -> bool:
        """Evict one keyframe to make room for a new one (arena-full
        path).  Returns True if a slot was freed.  Prefers the >= 90%-
        redundancy rule; when NOTHING passes it, force-evicts the most
        redundant non-anchor KF anyway — otherwise the device-side
        ``live < max_kf`` insertion gate stays shut forever and mapping
        silently stops (round-3 verdict Weak 3)."""
        if self.last_kf_slot < 0:
            return False
        self.map, victim = self.kf_culling_forced(
            self.map, self.last_kf_slot)
        v = int(host_fetch(victim))
        if v < 0:
            import sys
            print("[active_orb_slam2_tpu] WARNING: keyframe arena full "
                  "and no evictable keyframe found — mapping is stalled "
                  "(raise MapConfig.max_keyframes)", file=sys.stderr)
            return False
        self._on_keyframe_culled(v)
        return True

    def _register_keyframe(self, k, timestamp, frame_id, n_inliers):
        """Mirror a DEVICE-inserted keyframe (the fused track step ran
        NeedNewKeyFrame + CreateNewKeyFrame on device, zero staleness)
        and run the keyframe-rate mapping stages.  All dispatches are
        async — the device queue absorbs them exactly like the
        reference's background mapping thread.

        No stage here blocks on the device: the mapping program's cull
        victim (with its parent/pose snapshots) is copied asynchronously
        and processed at the NEXT keyframe event, and the loop closer
        defers its detect decision the same way — the r4 pipeline
        stalled ~300-500 ms per keyframe on exactly these fetches."""
        import time as _time
        # previous event's cull has landed by now; process it BEFORE
        # the new slot mirrors (the new KF may re-tenant that slot)
        self._process_pending_culls()
        self.kf_seq += 1
        self.n_live_kf += 1
        self._live_slots.add(k)
        self._slot_fid[k] = frame_id
        self._kf_ins_frames.append(frame_id)
        self.last_kf_slot = k
        self.last_kf_frame = frame_id
        self.last_kf_inliers = n_inliers
        self.kf_records.append((timestamp, k))
        W = None
        if self.use_mapping:
            # the fused keyframe-rate mapping program: triangulation +
            # SearchInNeighbors + MapPointCulling/local-BA + KF culling
            # in ONE dispatch, covisibility computed once (round-3
            # verdict item 1); W_out feeds loop detection below
            t0 = _time.perf_counter() if self.profile_stages else 0.0
            (self.map, victim, vparent, vpose, vppose,
             W) = self.keyframe_mapping(self.map, k, self.kf_seq)
            if self.profile_stages:
                jax.block_until_ready(W)
                self.stage_ms["mapping"] = \
                    (_time.perf_counter() - t0) * 1e3
            for a in (victim, vparent, vpose, vppose):
                try:
                    a.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass
            self._pending_culls.append(
                {"victim": victim, "parent": vparent, "pose": vpose,
                 "ppose": vppose})
        if self.loop_closer is not None:
            self.loop_closer.profile = self.profile_stages
            pre_pose_k = self.map.kf_pose[k]   # pre-correction snapshot
            self.map, closed = self.loop_closer.process_keyframe(
                self.map, k, self.kf_seq, W=W,
                n_live_kf=self.n_live_kf, slot_fid=self._slot_fid)
            if self.profile_stages:
                self.stage_ms.update(self.loop_closer.stage_ms)
                self.loop_closer.stage_ms = {}
            if closed:
                self.n_loops_closed += 1
                # KF poses jumped: REBASE the carried tracking chain by
                # this KF's correction delta (see _rebase_pose) —
                # velocity is invariant, associations keep their slots
                # (points moved with the same correction), so tracking
                # continues seamlessly in corrected coordinates
                self.track = self.track._replace(
                    pose=_rebase_pose(self.track.pose, pre_pose_k,
                                      self.map.kf_pose[k]))

    def _process_pending_culls(self):
        """Retire landed cull victims from earlier keyframe events
        (host bookkeeping only; the device-side eviction already
        happened inside the mapping program)."""
        while self._pending_culls:
            e = self._pending_culls.pop(0)
            v = int(host_fetch(e["victim"]))
            if v >= 0:
                self._on_keyframe_culled(
                    v, parent=int(host_fetch(e["parent"])),
                    vpose=np.asarray(host_fetch(e["pose"]), np.float64),
                    ppose=np.asarray(host_fetch(e["ppose"]),
                                     np.float64))

    def _on_keyframe_culled(self, victim: int, parent=None, vpose=None,
                            ppose=None):
        """Culled slots are recycled by later keyframes, so repoint any
        per-frame relative-pose records referencing the victim onto its
        spanning-tree parent (the reference's SaveTrajectoryTUM walks
        ``while (pKF->isBad()) { Trw = Trw*pKF->mTcp; pKF = parent; }``,
        src/System.cc ~L320-480 [U]).  Tcr' = Tcr . Tv . Tp^-1 keeps the
        replayed frame pose identical at cull time and lets it follow
        the parent through later BA / loop corrections.

        The parent slot must be LIVE: under heavy recycling the stored
        parent may itself have been culled and its slot re-tenanted by
        a NEWER keyframe, and composing against the new tenant's pose
        replays garbage (the r4 endurance run hit 25 m ATE this way).
        When no live parent exists the records are frozen as ABSOLUTE
        poses (ref = -1): they keep their cull-time estimate instead of
        following later corrections — the safe degradation."""
        if victim < 0:
            return
        self.n_live_kf = max(self.n_live_kf - 1, 0)
        self._live_slots.discard(victim)
        victim_fid = self._slot_fid.pop(victim, None)
        from active_orb_slam2_tpu.utils import np_se3
        if parent is None or vpose is None:
            # eager fallback (forced-eviction path): slot cannot have
            # been re-tenanted yet, reading the live arena is safe
            parent_a, vpose_a = host_fetch(
                self.map.kf_parent[victim], self.map.kf_pose[victim])
            parent = int(parent_a)
            vpose = np.asarray(vpose_a, np.float64)
        if parent < 0 or parent not in self._live_slots:
            # no live parent: fall back to the TEMPORALLY NEAREST live
            # keyframe.  The old fallback (newest live KF) could sit a
            # whole lap away — the frozen victim->parent relative then
            # spans that entire arc, baking the drift of the epoch into
            # every replayed frame record (the circle endurance, which
            # culls 96% of keyframes, measured p95 frame error ~0.34 m
            # from these long-baseline redirects).  The snapshotted
            # parent pose no longer applies either way.
            vfid = victim_fid if victim_fid is not None else \
                self.frame_id
            parent = min(
                self._live_slots,
                key=lambda s: abs(self._slot_fid.get(s, 0) - vfid)) \
                if self._live_slots else -1
            ppose = None
        if parent >= 0:
            if ppose is None:
                ppose = np.asarray(host_fetch(self.map.kf_pose[parent]),
                                   np.float64)
            t_vp = np_se3.se3_compose(vpose, np_se3.se3_inverse(ppose))
            self.rel_records = [
                (t, parent, np_se3.se3_compose(tcr, t_vp))
                if ref == victim else (t, ref, tcr)
                for (t, ref, tcr) in self.rel_records]
            # in-flight frames referencing this (slot, generation) will
            # retire AFTER the slot may have been re-tenanted; record
            # the repoint so they can follow the same lineage instead
            # of freezing in stale coordinates (the frozen records kept
            # pre-correction poses and dominated endurance ATE)
            if victim_fid is not None:
                self._add_redirect(victim, victim_fid, parent, t_vp,
                                   self._slot_fid.get(parent))
        else:
            self.rel_records = [
                (t, -1, np_se3.se3_compose(tcr, vpose))
                if ref == victim else (t, ref, tcr)
                for (t, ref, tcr) in self.rel_records]
            if victim_fid is not None:
                self._add_redirect(victim, victim_fid, -1, vpose, None)
        self.kf_records = [r for r in self.kf_records if r[1] != victim]

    def _add_redirect(self, victim, victim_fid, parent, t_vp, pfid):
        """Record a cull redirect and path-compress every existing
        entry pointing at the victim's generation, so chains stay one
        hop and pruning one entry never breaks another's lineage."""
        from active_orb_slam2_tpu.utils import np_se3
        self._cull_redirect[(victim, victim_fid)] = (
            parent, t_vp, pfid, self.frame_id)
        vkey = (victim, victim_fid)
        for key, (p, t, pf, cf) in list(self._cull_redirect.items()):
            if key != vkey and (p, pf) == vkey:
                self._cull_redirect[key] = (
                    parent, np_se3.se3_compose(t, t_vp), pfid, cf)

    def _prune_redirects(self):
        """Drop redirect entries no in-flight frame can reference: a
        frame dispatched at frame d carries the device reference KF
        inserted most recently before d, so entry (slot, fid) is dead
        once a NEWER keyframe insertion (frame f > fid) has itself been
        fully retired past (oldest pending frame id > f)."""
        if not self._cull_redirect:
            return
        oldest_pending = (self._pending[0]["frame_id"]
                          if self._pending else self.frame_id)
        # newest insertion frame already strictly before every pending
        # frame; entries whose generation predates it are unreachable
        cutoff = None
        for f in reversed(self._kf_ins_frames):
            if f < oldest_pending:
                cutoff = f
                break
        if cutoff is None:
            return
        for key in [k for k, v in self._cull_redirect.items()
                    if k[1] < cutoff and v[3] < oldest_pending]:
            del self._cull_redirect[key]
        # the insertion-frame list only needs entries >= cutoff
        self._kf_ins_frames = [f for f in self._kf_ins_frames
                               if f >= cutoff]

    def _record_frame(self, timestamp, pose_np, ref=None, ref_pose=None):
        """Store Tcr relative to the reference KF.

        The retired device stats carry (ref slot, ref pose) per frame —
        the exact reference-KF pose the device used at that frame, so
        no host-side pose cache can go stale; host-only paths (init,
        reloc record) fall back to the cached last-KF pose."""
        from active_orb_slam2_tpu.utils import np_se3
        if ref is None:
            ref = max(self.last_kf_slot, 0)
        if ref_pose is None:
            ref_pose = getattr(self, "_last_kf_pose_np", None)
        if ref_pose is None:
            ref_pose = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        tcr = np_se3.se3_compose(np.asarray(pose_np, np.float64),
                                 np_se3.se3_inverse(
                                     np.asarray(ref_pose, np.float64)))
        self.rel_records.append((timestamp, int(ref), tcr))

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
            return _to_mat44(jnp.asarray(pose))
        return self._dispatch_track("stereo", (l, r), timestamp)

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
            return _to_mat44(jnp.asarray(pose))
        return self._dispatch_track("mono", (g,), timestamp)

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
        self.n_live_kf = 2
        self._live_slots.update((0, 1))
        fid0, fid1 = host_fetch(self.map.kf_frame_id[0],
                                self.map.kf_frame_id[1])
        self._slot_fid[0] = int(fid0)
        self._slot_fid[1] = int(fid1)
        self._kf_ins_frames.extend([int(fid0), int(fid1)])
        self.last_kf_slot = 1
        self.last_kf_frame = self.frame_id
        self.last_kf_inliers = int(n_pts)
        self.kf_records.append((timestamp - 1 / 30.0, 0))
        self.kf_records.append((timestamp, 1))
        self.track = self.track._replace(
            pose=pose2, assoc=kp1, angle=frame.angle,
            ok=jnp.array(True), vel_ok=jnp.array(False),
            frame_id=jnp.array(self.frame_id + 1, jnp.int32),
            kf_seq=jnp.array(self.kf_seq, jnp.int32),
            last_kf_slot=jnp.array(1, jnp.int32),
            last_kf_inliers=jnp.array(self.last_kf_inliers, jnp.int32),
            frames_since_kf=jnp.array(0, jnp.int32))
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
            self.relocalizer = build_relocalizer(self.cfg,
                                                 n_candidates=8)
            self._reloc_key = jax.random.PRNGKey(11)

        # reference DetectRelocalizationCandidates returns an unbounded
        # candidate set; 8 batched PnP candidates (round-3 verdict
        # Weak 5 raised this from 4) covers repetitive structure while
        # staying one fixed RANSAC batch
        n_cand = 8
        lc = self.loop_closer
        if lc is not None and lc.ensure_vocabulary(
                self.map, n_kf=self.n_live_kf) is not None:
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
            pose=res.pose, assoc=res.assoc, angle=frame.angle,
            vel_ok=jnp.array(False), ok=jnp.array(True),
            frame_id=jnp.array(self.frame_id, jnp.int32),
            kf_seq=jnp.array(self.kf_seq, jnp.int32),
            last_kf_slot=jnp.array(max(self.last_kf_slot, 0), jnp.int32),
            last_kf_inliers=jnp.array(
                max(self.last_kf_inliers, 1), jnp.int32))
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
        combined with ``activate_localization_mode()``).  All host
        bookkeeping from any previous session (trajectory records,
        metrics, loop-closer state) refers to the old map's slots and is
        dropped; the reference-KF pose cache is rebuilt from the loaded
        arena so per-frame Tcr records compose against the right pose.
        """
        self.flush()
        with np.load(path) as data:
            self.restore({k: data[k] for k in data.files
                          if not k.startswith("_host_")})
            self.kf_seq = int(data["_host_kf_seq"])
            self.last_kf_slot = int(data["_host_last_kf_slot"])
        self.last_kf_frame = -10**9
        self.track = init_track_state(self.cfg.orb.n_features)
        # clear per-session state exactly like reset() — stale records
        # would replay old-map slots against the new arena
        self.rel_records = []
        self.kf_records = []
        self.metrics = []
        self._pending = []
        self._ref_frame = None
        if self.loop_closer is not None:
            self.loop_closer.reset_state()
        self.n_loops_closed = 0
        kf_valid = np.asarray(self.map.kf_valid)
        self.n_live_kf = int(kf_valid.sum())
        self._live_slots = set(int(s) for s in np.flatnonzero(kf_valid))
        fids_all = np.asarray(self.map.kf_frame_id)
        self._slot_fid = {int(s): int(fids_all[s])
                          for s in self._live_slots}
        self._cull_redirect = {}
        self._kf_ins_frames = []
        self._pending_culls = []
        if self.last_kf_slot >= 0 and kf_valid[self.last_kf_slot]:
            self._last_kf_pose_np = np.asarray(
                self.map.kf_pose[self.last_kf_slot])
        else:
            self._last_kf_pose_np = None
        # advance frame_id past every loaded keyframe so frame-id
        # recency ordering (reloc fallback) stays monotone
        if kf_valid.any():
            fids = np.asarray(self.map.kf_frame_id)[kf_valid]
            self.frame_id = int(fids.max()) + 1
        self._state = LOST if self.kf_seq > 0 else NOT_INITIALIZED
