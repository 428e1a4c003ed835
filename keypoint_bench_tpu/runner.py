"""Evaluation orchestrator — the TPU-native replacement for the reference's
LightningModule runtime (models/model_interface.py MInterface + DInterface).

Everything between image decode and final metric scalar runs on device inside
jitted steps; the host loop only feeds numpy batches and collects scalars
(SURVEY.md §3.1 boundary analysis). Dispatch is by typed config (task_type /
model_type / matcher_params.type / data params) through registries instead of
if/elif chains.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from keypoint_bench_tpu.datasets import get_dataset
from keypoint_bench_tpu.geometry.warp import warp_homography, warp_se3
from keypoint_bench_tpu.models import get_model
from keypoint_bench_tpu.models.lightglue import lightglue_match
from keypoint_bench_tpu.ops.detect import DetectParams, detection
from keypoint_bench_tpu.ops.lk import LKParams, optical_flow
from keypoint_bench_tpu.ops.matching import brute_force_match
from keypoint_bench_tpu.tasks.auc import (estimate_pose_pair, pose_auc,
                                          pose_error)
from keypoint_bench_tpu.tasks.fundamental import (fundamental_metrics,
                                                  fundamental_ransac_ratio)
from keypoint_bench_tpu.tasks.mha import mha_pair
from keypoint_bench_tpu.tasks.repeatability import repeatability_pair
from keypoint_bench_tpu.tasks.vo import chain_poses, vo_pair_pose
from keypoint_bench_tpu.weights import load_params


def _crop32(img: np.ndarray) -> np.ndarray:
    """Crop H,W down to multiples of 32 (reference test_step,
    model_interface.py:192-204)."""
    h, w = img.shape[0], img.shape[1]
    return img[: h - h % 32, : w - w % 32]


@dataclass
class EvalConfig:
    model_type: str
    task_type: str
    data_params: dict
    extractor_params: dict = field(default_factory=dict)
    matcher_params: dict = field(default_factory=dict)
    task_params: dict = field(default_factory=dict)
    model_params: dict = field(default_factory=dict)
    weights_dir: str | None = None
    output_dir: str = "output"
    seed: int = 0
    precision: str = "float32"  # "float32" | "bfloat16" (model conv weights)
    debug_nans: bool = False    # jax.debug_nans around the whole run
    resume: bool = False        # skip pairs already in progress.jsonl

    @classmethod
    def from_dict(cls, d: dict) -> "EvalConfig":
        return cls(**d)

    @classmethod
    def from_yaml(cls, path: str) -> "EvalConfig":
        import yaml
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))


class MetricLog:
    """Incremental per-sample metric journal enabling crash resume
    (SURVEY.md §5.4: resume = re-entering the eval loop at sample k; the
    reference has no resume story at all)."""

    def __init__(self, output_dir: str, resume: bool,
                 meta: dict | None = None):
        """`meta` guards resume against config drift: the journal's first
        line records it, and a resume whose meta differs (e.g. MHA `th` list
        changed) discards the journal instead of replaying records whose
        keys/values no longer mean the same thing."""
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "progress.jsonl")
        self.done: dict[int, dict] = {}
        keep = False
        if resume and os.path.exists(self.path):
            journal_meta = None
            recs = []
            with open(self.path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "meta" in rec:
                        journal_meta = rec["meta"]
                    elif "i" in rec:
                        recs.append(rec)
            if meta is None or journal_meta == meta:
                keep = True
                self.done = {rec["i"]: rec for rec in recs}
        if not keep and os.path.exists(self.path):
            os.remove(self.path)
        self._f = open(self.path, "a")
        if not keep and meta is not None:
            self._f.write(json.dumps({"meta": meta}) + "\n")
            self._f.flush()
        self._pending: list[tuple[int, dict]] = []

    def get(self, i: int):
        return self.done.get(i)

    # Values may be device scalars: conversion (float()) forces a device
    # sync, so writes lag by `flush_depth` pairs — the device dispatches
    # ahead while older results drain (a crash loses at most flush_depth
    # journal lines, which simply recompute on resume).
    _FLUSH_DEPTH = 8

    def put(self, i: int, rec: dict):
        self._pending.append((i, rec))
        while len(self._pending) > self._FLUSH_DEPTH:
            self._write(*self._pending.pop(0))
        return rec

    def _write(self, i: int, rec: dict):
        rec = {"i": i, **{k: (v if isinstance(v, (str, int, list, bool))
                              else float(v)) for k, v in rec.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        for i, rec in self._pending:
            self._write(i, rec)
        self._pending = []
        self._f.close()


class Evaluator:
    def __init__(self, cfg: EvalConfig):
        self.cfg = cfg
        self.model_fn = get_model(cfg.model_type)
        if cfg.model_type in ("Harris", "ORB", "SIFT"):
            self.params = dict(cfg.model_params or {})
        else:
            self.params = load_params(cfg.model_type, cfg.weights_dir)
            if cfg.precision == "bfloat16":
                from keypoint_bench_tpu.models.common import cast_params_bf16
                self.params = cast_params_bf16(self.params)
        ep = cfg.extractor_params
        self.detect_params = DetectParams(
            nms_dist=int(ep.get("nms_dist", 4)),
            threshold=float(ep.get("threshold", 0.0)),
            border_dist=int(ep.get("border_dist", 8)),
            top_k=int(ep.get("top_k", 300)),
            min_score=float(ep.get("min_score", 0.0)))
        mp = cfg.matcher_params
        self.matcher_type = mp.get("type", "brute_force")
        bf = mp.get("brute_force_params", {})
        self.bf_max_distance = float(bf.get("max_distance", 5.0))
        of = mp.get("optical_flow_params", {})
        self.lk_params = LKParams(
            distance=float(of.get("distance", 3)),
            win_size=int(of.get("win_size", 3)),
            levels=int(of.get("levels", 1)),
            iterations=int(of.get("interation", of.get("iterations", 40))))
        self.lightglue_params = None
        self.matcher_fallback = None
        if self.matcher_type == "light_glue":
            # reference wires SuperPoint/DISK (model_interface.py:62-63,
            # 80-81) and additionally ships aliked_lightglue.pth — mapped
            # here for the ALIKE family (desc_scale 1, like disk/aliked)
            lg_name = {"SuperPoint": "lightglue_superpoint",
                       "DISK": "lightglue_disk",
                       "Alike": "lightglue_aliked",
                       "Alike_s2d": "lightglue_aliked"}.get(cfg.model_type)
            err = None
            if lg_name is None:
                err = (f"matcher_params.type='light_glue' but no LightGlue "
                       f"adapter exists for model_type="
                       f"{cfg.model_type!r} (supported: SuperPoint, DISK, "
                       f"Alike, Alike_s2d)")
            else:
                try:
                    self.lightglue_params = load_params(lg_name,
                                                        cfg.weights_dir)
                except FileNotFoundError as e:
                    err = (f"matcher_params.type='light_glue' but the "
                           f"{lg_name!r} weights are not available: {e}")
            if err is not None:
                # never silently degrade to brute-force under a light_glue
                # label (round-3 verdict): raise unless the config opts in,
                # and then tag the results with what actually ran
                lg = mp.get("light_glue_params", {})
                if not lg.get("allow_fallback", False):
                    raise RuntimeError(
                        err + ". Set matcher_params.light_glue_params."
                        "allow_fallback: true to run brute-force instead "
                        "(results will be tagged matcher_fallback).")
                import warnings
                warnings.warn(err + " — falling back to brute_force; "
                              "results tagged matcher_fallback.")
                self.matcher_fallback = "brute_force"
        self.desc_scale = 8 if cfg.model_type == "SuperPoint" else 1
        self._key = jax.random.key(cfg.seed)
        self._detect_jit = jax.jit(self._detect_impl)
        # per-instance cache for the pipelined batch jits: building
        # jax.jit(vmap(closure)) inside a _run_* method creates a FRESH
        # function identity per call, so a second run() would recompile the
        # whole vmapped pipeline (~45 s for the 32-frame VO batch on TPU —
        # measured round 4). The closures only capture per-Evaluator
        # constants (scale, intrinsics, matcher params), so caching by
        # name is safe; jax still retraces per input shape.
        self._jit_store: dict = {}

    def _jit_cached(self, key: str, fn):
        cached = self._jit_store.get(key)
        if cached is None:
            cached = jax.jit(fn)
            self._jit_store[key] = cached
        return cached

    # ---------------- device stages ----------------

    def _detect_impl(self, image):
        score, desc = self.model_fn(self.params, image[None])
        kpts, valid = detection(score[0], self.detect_params)
        return score[0], desc[0] if desc is not None else None, kpts, valid

    def detect(self, image: np.ndarray):
        return self._detect_jit(jnp.asarray(image))

    @staticmethod
    def _to_float(images):
        """uint8 frames normalize on DEVICE: host->device transfer through
        the axon tunnel is ~140 MB/s (measured round 5 — 1.45 s of the
        1.50 s detect stage for 32 f32 512^2 frames), so production-layout
        uint8 input cuts the dominant VO detect cost 4x."""
        if images.dtype == jnp.uint8:
            return images.astype(jnp.float32) / 255.0
        return images

    def _detect_batch_impl(self, images):
        from keypoint_bench_tpu.ops.detect import detection_batch
        score, desc = self.model_fn(self.params, self._to_float(images))
        kpts, valid = detection_batch(score, self.detect_params)
        return score, desc, kpts, valid

    def _detect_batch_sparse_impl(self, images):
        """Alike_s2d sparse-descriptor detection: never materializes the
        dense [B, H, W, 64] descriptor map (the bench pipeline's approach,
        ops/sparse_desc.py — keypoint descriptors are exactly equal to
        dense sampling). Returns desc [B, K, 64] instead of a map. On TPU
        the fused channel-major Pallas sampler runs; elsewhere the exact
        XLA composite sampler (the Pallas kernel has no CPU lowering)."""
        from keypoint_bench_tpu.models.alike_s2d import \
            alike_s2d_sparse_detect_batch
        return alike_s2d_sparse_detect_batch(self.params,
                                             self._to_float(images),
                                             self.detect_params)

    def detect_many(self, images: list, chunk: int = 8,
                    sparse: bool = False):
        """Batched detection over equal-shape images (the pipelined
        runners' detect phase): one natively batched forward +
        detection_batch per chunk instead of a batch-1 dispatch per frame
        (31 ms/frame measured at 512^2 on TPU; chunked batching is ~10x).
        Returns STACKED (scores [n,...], descs [n,...]|None, kpts [n,K,3],
        valids [n,K]) — identical values to per-frame detect(); stacked so
        the pipelined runners don't pay a dispatch per frame slicing and
        re-stacking (measured: the slice/re-stack pattern cost more than
        the batched detection itself). With sparse=True (Alike_s2d only)
        descs come back as per-keypoint vectors [n, K, 64] from the fused
        sparse sampler — no dense descriptor map is ever built."""
        jit = self._jit_cached("detect_batch_sparse",
                               self._detect_batch_sparse_impl) if sparse \
            else self._jit_cached("detect_batch", self._detect_batch_impl)
        # stage every chunk's host->device copy up front (device_put is
        # async) so later transfers overlap earlier chunks' compute; frames
        # arriving as uint8 (the production decode layout) transfer 4x
        # fewer bytes and normalize on device (_to_float)
        bufs = [jax.device_put(np.stack(images[i0:i0 + chunk]))
                for i0 in range(0, len(images), chunk)]
        parts = [jit(b) for b in bufs]
        if len(parts) == 1:
            return parts[0]
        s = jnp.concatenate([p[0] for p in parts])
        d = None if parts[0][1] is None \
            else jnp.concatenate([p[1] for p in parts])
        k = jnp.concatenate([p[2] for p in parts])
        v = jnp.concatenate([p[3] for p in parts])
        return s, d, k, v

    def next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _sharded_sparse_opts(self):
        """(sparse, match_dtype) for the sharded eval steps: Alike_s2d runs
        the keypoint-only sparse-descriptor head (no dense [B, H, W, D]
        map — round-4 verdict item 1; disable with
        task_params.sparse_desc=False), and bfloat16 runs match in bf16
        (the same descriptor dtype the dense path would sample from a bf16
        map; the f32-parity suite runs in f32 where match_dtype is None)."""
        sparse = (self.cfg.model_type == "Alike_s2d"
                  and bool(self.cfg.task_params.get("sparse_desc", True)))
        match_dtype = jnp.bfloat16 if (
            sparse and self.cfg.precision == "bfloat16") else None
        return sparse, match_dtype

    def _warp(self, kpts, valid, wp):
        if wp["mode"] == "homo":
            return warp_homography(kpts, valid,
                                   jnp.asarray(wp["homography_matrix"]),
                                   wp["width"], wp["height"])
        return warp_se3(kpts, valid, jnp.asarray(wp["pose01"]),
                        jnp.asarray(wp["bbox0"]), jnp.asarray(wp["bbox1"]),
                        jnp.asarray(wp["depth0"]), jnp.asarray(wp["depth1"]),
                        jnp.asarray(wp["intrinsics0"]),
                        jnp.asarray(wp["intrinsics1"]))

    def _match(self, kpts0, valid0, kpts1, valid1, desc0, desc1, w, h,
               imgs=None):
        """Returns (m_pts0 [K,3], m_pts1 [K,>=2], mask) in normalized coords."""
        if self.matcher_type == "light_glue" and \
                self.lightglue_params is not None:
            lg = self.cfg.matcher_params.get("light_glue_params", {})
            if lg.get("adaptive", False):
                # reference default mode: early exit + width pruning
                from keypoint_bench_tpu.models.lightglue import \
                    sample_descriptors_lg
                from keypoint_bench_tpu.models.lightglue_adaptive import \
                    lightglue_forward_adaptive
                scale = jnp.asarray([w - 1.0, h - 1.0])
                p0 = kpts0[:, 0:2] * scale
                p1 = kpts1[:, 0:2] * scale
                d0 = sample_descriptors_lg(p0, desc0, self.desc_scale)
                d1 = sample_descriptors_lg(p1, desc1, self.desc_scale)
                m0, ms, ok, _ = lightglue_forward_adaptive(
                    self.lightglue_params, p0, valid0, d0, p1, valid1, d1)
                return kpts0, kpts1[jnp.maximum(m0, 0)], ok
            return lightglue_match(self.lightglue_params, kpts0, valid0,
                                   kpts1, valid1, desc0, desc1, w, h,
                                   self.desc_scale)
        if self.matcher_type == "optical_flow":
            src0, src1 = imgs if imgs is not None else (desc0, desc1)
            tracked, _ = optical_flow(src0, src1, kpts0[:, 0:2], kpts0[:, 0:2],
                                      self.next_key(), self.lk_params)
            return kpts0, tracked, valid0
        if self.matcher_type == "optical_flow_cv":
            # the reference's actual LK path (utils/matcher.py optical_flow_cv
            # + visual_odometer.py:44-47 status filter), host-side cv2
            from keypoint_bench_tpu.ops.lk import optical_flow_cv
            src0, src1 = imgs if imgs is not None else (desc0, desc1)
            tracked, status = optical_flow_cv(
                np.asarray(src0), np.asarray(src1), np.asarray(kpts0),
                np.asarray(kpts0), win_size=self.lk_params.win_size,
                levels=self.lk_params.levels)
            return kpts0, jnp.asarray(tracked), \
                valid0 & jnp.asarray(status == 1)
        return brute_force_match(kpts0, valid0, kpts1, valid1, desc0, desc1,
                                 self.bf_max_distance)

    # ---------------- task loops ----------------

    def run(self) -> dict:
        ds = get_dataset(self.cfg.data_params)
        task = self.cfg.task_type
        fn = {
            "repeatability": self._run_repeatability,
            "MHA": self._run_mha,
            "AUC": self._run_auc,
            "FundamentalMatrix": self._run_fundamental,
            "FundamentalMatrixRansac": self._run_fundamental_ransac,
            "visual_odometer": self._run_vo,
            "VisualizeTrackingError": self._run_tracking_error,
        }.get(task)
        if fn is None:
            raise ValueError(f"unknown task_type {task!r}")
        if self.cfg.debug_nans:
            with jax.debug_nans(True):
                results = fn(ds)
        else:
            results = fn(ds)
        if self.matcher_fallback is not None:
            results["matcher_fallback"] = self.matcher_fallback
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        with open(os.path.join(self.cfg.output_dir, "results.json"), "w") as f:
            json.dump({k: v for k, v in results.items()
                       if isinstance(v, (int, float, str, list))}, f,
                      indent=2, default=float)
        return results

    def _pair_maps(self, batch):
        img0 = _crop32(np.asarray(batch["image0"], np.float32))
        img1 = _crop32(np.asarray(batch["image1"], np.float32))
        s0, d0, k0, v0 = self.detect(img0)
        s1, d1, k1, v1 = self.detect(img1)
        return img0, img1, s0, d0, k0, v0, s1, d1, k1, v1

    def _sharded_mesh(self, b: int):
        """'data'-axis mesh over as many devices as divide the batch size."""
        from keypoint_bench_tpu.parallel.mesh import make_mesh
        n_dev = len(jax.devices())
        n_data = max(d for d in range(1, n_dev + 1) if b % d == 0)
        return make_mesh(n_data=n_data, n_model=1,
                         devices=jax.devices()[:n_data]), n_data

    @staticmethod
    def _stack_homo_batch(samples):
        """Stack a homography-pair batch for the sharded steps."""
        imgs0 = jnp.stack([_crop32(np.asarray(s["image0"], np.float32))
                           for s in samples])
        imgs1 = jnp.stack([_crop32(np.asarray(s["image1"], np.float32))
                           for s in samples])
        Hs = jnp.stack([jnp.asarray(s["warp01_params"]["homography_matrix"])
                        for s in samples])
        Hinvs = jnp.stack([jnp.asarray(s["warp10_params"]
                                       ["homography_matrix"])
                           for s in samples])
        sizes = jnp.stack([jnp.asarray(
            [float(s["warp01_params"]["width"]),
             float(s["warp01_params"]["height"])]) for s in samples])
        scales = jnp.asarray([
            float(s["warp01_params"].get("resize",
                                         s["warp01_params"]["width"]))
            for s in samples])
        return imgs0, imgs1, Hs, Hinvs, sizes, scales

    def _rep_pair_record(self, batch, th: float):
        """Per-pair repeatability record (shared by the per-pair loop and the
        sharded path's ragged tail). Returns (record, (k0, v0, k1, v1))."""
        _, _, s0, d0, k0, v0, s1, d1, k1, v1 = self._pair_maps(batch)
        wp01, wp10 = batch["warp01_params"], batch["warp10_params"]
        a0, a01, va = self._warp(k0, v0, wp01)
        b0, b10, vb = self._warp(k1, v1, wp10)
        scale = float(wp01.get("resize", wp01["width"]))
        out = repeatability_pair(k0, v0, k1, v1, a0, a01, va,
                                 b0, b10, vb, scale, th)
        return {"repeatability": out["repeatability"],
                "mean_error": out["mean_error"],
                "num_feat": out["num_feat"]}, (k0, v0, k1, v1)

    def _run_repeatability_sharded(self, ds):
        """Mesh-sharded batched path for homography-pair datasets: pairs are
        stacked `batch_size` at a time and sharded over the 'data' axis
        (enabled with data_params.batch_size > 1). The ragged tail that does
        not fill a batch runs through the per-pair path so the means cover
        EVERY pair (reference protocol: model_interface.py:119-133)."""
        from keypoint_bench_tpu.parallel.evaluate import sharded_eval_step

        th = float(self.cfg.task_params.get("th", 3.0))
        b = int(self.cfg.data_params.get("batch_size", 1))
        mesh, n_data = self._sharded_mesh(b)
        sparse, match_dtype = self._sharded_sparse_opts()
        step = sharded_eval_step(mesh, self.model_fn, self.params,
                                 self.detect_params, th=th,
                                 bf_max_distance=self.bf_max_distance,
                                 sparse=sparse, match_dtype=match_dtype)
        log = MetricLog(self.cfg.output_dir, self.cfg.resume,
                        meta={"task": "repeatability", "th": th})
        recs: dict[int, dict] = {}
        buf: list[tuple[int, dict]] = []

        def flush(buf):
            samples = [s for _, s in buf]
            inputs = self._stack_homo_batch(samples)
            keys = jax.random.split(self.next_key(), b)
            with mesh:
                out = step(*inputs, keys)
            rep = np.asarray(out["repeatability"])
            me = np.asarray(out["mean_error"])
            nf = np.asarray(out["num_feat"])
            for j, (i, _) in enumerate(buf):
                recs[i] = log.put(i, {"repeatability": float(rep[j]),
                                      "mean_error": float(me[j]),
                                      "num_feat": float(nf[j])})

        for i, batch in enumerate(_iter(ds)):
            rec = log.get(i)
            if rec is not None:
                recs[i] = rec
                continue
            buf.append((i, batch))
            if len(buf) == b:
                flush(buf)
                buf = []
        for i, batch in buf:  # ragged tail: per-pair
            rec, _ = self._rep_pair_record(batch, th)
            recs[i] = log.put(i, rec)
        log.close()
        order = sorted(recs)
        reps = [float(recs[i]["repeatability"]) for i in order]
        errs = np.asarray([float(recs[i]["mean_error"]) for i in order])
        feats = [float(recs[i]["num_feat"]) for i in order]
        result = {
            "repeatability": float(np.mean(reps)) if reps else float("nan"),
            "rep_mean_err": float(np.mean(errs[~np.isnan(errs)]))
            if len(errs) else float("nan"),
            "num_feat": float(np.mean(feats)) if feats else float("nan"),
            "per_pair_repeatability": reps,
        }
        print("repeatability", result["repeatability"],
              " rep_mean_err", result["rep_mean_err"],
              f"(sharded, {n_data} devices)")
        return result

    def save_metric_plot(self, values, name):
        """Per-pair metric curve + txt like the reference's plot_* helpers."""
        from keypoint_bench_tpu.utils.visualization import plot_series
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        plot_series(values, os.path.join(self.cfg.output_dir, f"{name}.png"))

    def _run_repeatability(self, ds):
        if int(self.cfg.data_params.get("batch_size", 1)) > 1 and \
                len(ds) > 0 and \
                ds[0]["warp01_params"].get("mode") == "homo":
            # the sharded pipeline stacks homography warps only; SE3-warp
            # datasets fall through to the per-pair loop
            return self._run_repeatability_sharded(ds)
        th = float(self.cfg.task_params.get("th", 3.0))
        log = MetricLog(self.cfg.output_dir, self.cfg.resume,
                        meta={"task": "repeatability", "th": th})
        reps, errs, feats = [], [], []
        for i, batch in enumerate(_iter(ds)):
            rec = log.get(i)
            if rec is None:
                out, (k0, v0, k1, v1) = self._rep_pair_record(batch, th)
                # device scalars go in as-is: MetricLog journals with a lag
                # so the host never blocks on the pair it just dispatched
                rec = log.put(i, out)
                if self.cfg.task_params.get("save_images"):
                    # keypoint overlays like the reference writes per pair
                    # (tasks/repeatability.py:117-121), behind a flag
                    import cv2
                    from keypoint_bench_tpu.utils.visualization import \
                        plot_kps_error
                    show = plot_kps_error(batch["image0"], np.asarray(k0),
                                          np.asarray(v0))
                    cv2.imwrite(os.path.join(
                        self.cfg.output_dir, f"{i}_repeatability_0.png"),
                        show)
                    show = plot_kps_error(batch["image1"], np.asarray(k1),
                                          np.asarray(v1))
                    cv2.imwrite(os.path.join(
                        self.cfg.output_dir, f"{i}_repeatability_1.png"),
                        show)
            reps.append(rec["repeatability"])
            errs.append(rec["mean_error"])
            feats.append(rec["num_feat"])
        log.close()
        errs = np.asarray([float(e) for e in errs])
        result = {
            "repeatability": float(np.mean([float(r) for r in reps])),
            "rep_mean_err": float(np.mean(errs[~np.isnan(errs)]))
            if len(errs) else float("nan"),
            "num_feat": float(np.mean([float(f) for f in feats])),
            "per_pair_repeatability": [float(r) for r in reps],
        }
        print("repeatability", result["repeatability"],
              " rep_mean_err", result["rep_mean_err"])
        return result

    def _dump_matches(self, i, tag, img0, img1, m0, m1, ok):
        """Flag-gated per-pair match overlay, like the reference writes
        behind save_result (FundamentalMatrix.py:25-48, AUC.py:146-148)."""
        import cv2
        from keypoint_bench_tpu.utils.visualization import plot_matches
        okn = np.asarray(ok)
        s0 = np.asarray([img0.shape[1] - 1.0, img0.shape[0] - 1.0])
        s1 = np.asarray([img1.shape[1] - 1.0, img1.shape[0] - 1.0])
        p0 = np.asarray(m0)[:, :2] * s0
        p1 = np.asarray(m1)[:, :2] * s1
        show = plot_matches(img0, img1, p0[okn], p1[okn])
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        cv2.imwrite(os.path.join(self.cfg.output_dir, f"{tag}_{i}.png"),
                    show)

    def _mha_pair_record(self, batch, ths, i=None):
        """Per-pair MHA record (shared by the per-pair loop and the sharded
        path's ragged tail)."""
        img0, img1, s0, d0, k0, v0, s1, d1, k1, v1 = self._pair_maps(batch)
        wp01, wp10 = batch["warp01_params"], batch["warp10_params"]
        a0, _, va = self._warp(k0, v0, wp01)
        b0, _, vb = self._warp(k1, v1, wp10)
        # brute-force on covisible sets (MHA.py:33-39); fixed-K rows,
        # validity = covisible
        m0, m1, ok = self._match(k0, va, k1, vb, d0, d1,
                                 img0.shape[1], img0.shape[0])
        out = mha_pair(m0, m1, ok,
                       jnp.asarray(wp01["homography_matrix"]),
                       wp01["width"], wp01["height"],
                       img0.shape[0], img0.shape[1], self.next_key(),
                       thresholds=ths)
        if self.cfg.task_params.get("save_images") and i is not None:
            self._dump_matches(i, "mha_matches", img0, img1, m0, m1, ok)
        return {f"h{t:g}": out[k] for k, t in enumerate(ths)}

    def _run_mha_sharded(self, ds):
        """Mesh-sharded batched MHA (see _run_repeatability_sharded): the
        ragged tail runs per-pair so the mean hit rates cover every pair."""
        from keypoint_bench_tpu.parallel.evaluate import sharded_mha_step

        ths = tuple(float(t) for t in self.cfg.task_params.get(
            "th", [3, 5, 7]))
        b = int(self.cfg.data_params.get("batch_size", 1))
        mesh, n_data = self._sharded_mesh(b)
        sparse, match_dtype = self._sharded_sparse_opts()
        step = sharded_mha_step(mesh, self.model_fn, self.params,
                                self.detect_params, ths,
                                bf_max_distance=self.bf_max_distance,
                                sparse=sparse, match_dtype=match_dtype)
        log = MetricLog(self.cfg.output_dir, self.cfg.resume,
                        meta={"task": "MHA", "th": list(ths)})
        recs: dict[int, dict] = {}
        buf: list[tuple[int, dict]] = []

        def flush(buf):
            inputs = self._stack_homo_batch([s for _, s in buf])
            keys = jax.random.split(self.next_key(), b)
            with mesh:
                hits = np.asarray(step(*inputs, keys))  # [b, T]
            for j, (i, _) in enumerate(buf):
                recs[i] = log.put(i, {f"h{t:g}": float(hits[j, k])
                                      for k, t in enumerate(ths)})

        for i, batch in enumerate(_iter(ds)):
            rec = log.get(i)
            if rec is not None:
                recs[i] = rec
                continue
            buf.append((i, batch))
            if len(buf) == b:
                flush(buf)
                buf = []
        for i, batch in buf:  # ragged tail: per-pair
            recs[i] = log.put(i, self._mha_pair_record(batch, ths))
        log.close()
        hits = [np.array([float(recs[i][f"h{t:g}"]) for t in ths])
                for i in sorted(recs)]
        mean_hits = np.mean(np.stack(hits), axis=0) if hits \
            else np.full(len(ths), np.nan)
        result = {f"MHA@{t:g}": float(v)
                  for t, v in zip(ths, mean_hits)}
        for t, v in zip(ths, mean_hits):
            print("MHA ", v)
        result["per_pair"] = [list(map(float, h)) for h in hits]
        return result

    def _run_mha(self, ds):
        if int(self.cfg.data_params.get("batch_size", 1)) > 1 and \
                self.matcher_type == "brute_force":
            # the sharded pipeline implements brute-force matching only;
            # other matchers fall through to the per-pair loop
            return self._run_mha_sharded(ds)
        ths = tuple(self.cfg.task_params.get("th", [3, 5, 7]))
        log = MetricLog(self.cfg.output_dir, self.cfg.resume,
                        meta={"task": "MHA", "th": [float(t) for t in ths]})
        hits = []
        for i, batch in enumerate(_iter(ds)):
            rec = log.get(i)
            if rec is None:
                rec = log.put(i, self._mha_pair_record(batch, ths, i))
            hits.append(rec)
        log.close()
        hits = [np.array([float(r[f"h{t:g}"]) for t in ths]) for r in hits]
        result_arr = np.mean(np.stack(hits), axis=0)
        result = {f"MHA@{t:g}": float(v) for t, v in zip(ths, result_arr)}
        for t, v in zip(ths, result_arr):
            print("MHA ", v)
        result["per_pair"] = [list(map(float, h)) for h in hits]
        return result

    def _auc_pair_record(self, batch, i=None):
        """Per-pair AUC record (device scalars; shared by the per-pair loop
        and the sharded path's ragged tail)."""
        img0, img1, s0, d0, k0, v0, s1, d1, k1, v1 = self._pair_maps(batch)
        wp01 = batch["warp01_params"]
        m0, m1, ok = self._match(k0, v0, k1, v1, d0, d1,
                                 img0.shape[1], img0.shape[0])
        if self.cfg.task_params.get("save_images") and i is not None:
            # reference AUC.py:146-148 writes a match overlay per pair
            self._dump_matches(i, "auc_matches", img0, img1, m0, m1, ok)
        h0, w0 = img0.shape[0], img0.shape[1]
        h1, w1 = img1.shape[0], img1.shape[1]
        p0 = m0[:, 0:2] * jnp.asarray([w0 - 1.0, h0 - 1.0])
        p1 = m1[:, 0:2] * jnp.asarray([w1 - 1.0, h1 - 1.0])
        R, t, pm, n_in, okp = estimate_pose_pair(
            p0, p1, ok, jnp.asarray(wp01["intrinsics0"]),
            jnp.asarray(wp01["intrinsics1"]), self.next_key(),
            solver=self.cfg.task_params.get("solver", "8pt"))
        # failure -> 180 deg / 0 inliers decided on device (no per-pair
        # host sync)
        err = jnp.where(okp, pose_error(
            R, t, jnp.asarray(wp01["pose01"])), 180.0)
        return {"error": err, "inliers": jnp.where(okp, n_in, 0)}

    def _run_auc_sharded(self, ds):
        """Mesh-sharded batched AUC (see _run_repeatability_sharded): pairs
        stacked batch_size at a time over the 'data' axis; the tail that
        doesn't fill a batch falls back to the per-pair path so the error
        list (and hence the AUC recall curve) covers every pair. Per-pair
        records are journaled so cfg.resume works like the per-pair path."""
        from keypoint_bench_tpu.parallel.evaluate import sharded_auc_step

        ths = tuple(self.cfg.task_params.get("th", [5, 10, 20]))
        solver = self.cfg.task_params.get("solver", "8pt")
        b = int(self.cfg.data_params.get("batch_size", 1))
        mesh, n_data = self._sharded_mesh(b)
        sparse, match_dtype = self._sharded_sparse_opts()
        step = sharded_auc_step(mesh, self.model_fn, self.params,
                                self.detect_params, solver=solver,
                                bf_max_distance=self.bf_max_distance,
                                sparse=sparse, match_dtype=match_dtype)
        log = MetricLog(self.cfg.output_dir, self.cfg.resume,
                        meta={"task": "AUC", "solver": solver})
        recs: dict[int, dict] = {}
        buf: list[tuple[int, dict]] = []

        def flush(buf):
            samples = [s for _, s in buf]
            imgs0 = jnp.stack([_crop32(np.asarray(s["image0"], np.float32))
                               for s in samples])
            imgs1 = jnp.stack([_crop32(np.asarray(s["image1"], np.float32))
                               for s in samples])
            K0s = jnp.stack([jnp.asarray(s["warp01_params"]["intrinsics0"])
                             for s in samples])
            K1s = jnp.stack([jnp.asarray(s["warp01_params"]["intrinsics1"])
                             for s in samples])
            poses = jnp.stack([jnp.asarray(s["warp01_params"]["pose01"])
                               for s in samples])
            keys = jax.random.split(self.next_key(), b)
            with mesh:
                errs, n_in = step(imgs0, imgs1, K0s, K1s, poses, keys)
            errs = np.asarray(errs)
            n_in = np.asarray(n_in)
            for j, (i, _) in enumerate(buf):
                recs[i] = log.put(i, {"error": float(errs[j]),
                                      "inliers": int(n_in[j])})

        for i, batch in enumerate(_iter(ds)):
            rec = log.get(i)
            if rec is not None:
                recs[i] = rec
                continue
            buf.append((i, batch))
            if len(buf) == b:
                flush(buf)
                buf = []
        for i, batch in buf:  # ragged tail: per-pair
            recs[i] = log.put(i, self._auc_pair_record(batch))
        log.close()
        order = sorted(recs)
        errors = [float(recs[i]["error"]) for i in order]
        inliers = [float(recs[i]["inliers"]) for i in order]
        aucs = pose_auc(errors, ths)
        result = {f"AUC@{t}": float(a) for t, a in zip(ths, aucs)}
        result["AUC_inliers"] = float(np.mean(inliers)) if inliers else 0.0
        for a in aucs:
            print("AUC ", a)
        print("AUC inliers", result["AUC_inliers"])
        result["per_pair_error"] = errors
        return result

    def _run_auc(self, ds):
        if int(self.cfg.data_params.get("batch_size", 1)) > 1 and \
                self.matcher_type == "brute_force":
            # the sharded pipeline implements brute-force matching only;
            # other matchers fall through to the per-pair loop
            return self._run_auc_sharded(ds)
        ths = tuple(self.cfg.task_params.get("th", [5, 10, 20]))
        log = MetricLog(self.cfg.output_dir, self.cfg.resume,
                        meta={"task": "AUC",
                              "solver": self.cfg.task_params.get("solver",
                                                                 "8pt")})
        errors, inliers = [], []
        for i, batch in enumerate(_iter(ds)):
            rec = log.get(i)
            if rec is None:
                rec = log.put(i, self._auc_pair_record(batch, i))
            errors.append(rec["error"])
            inliers.append(rec["inliers"])
        log.close()
        errors = [float(e) for e in errors]
        inliers = [float(v) for v in inliers]
        aucs = pose_auc(errors, ths)
        result = {f"AUC@{t}": float(a) for t, a in zip(ths, aucs)}
        result["AUC_inliers"] = float(np.mean(inliers))
        for a in aucs:
            print("AUC ", a)
        print("AUC inliers", result["AUC_inliers"])
        result["per_pair_error"] = errors
        return result

    def _iter_sequence(self, ds):
        """Frame-delay pairing for sequence datasets (model_interface.py:217-
        228): yields (prev_batch, batch) starting with (b0, b0)."""
        last = None
        for batch in _iter(ds):
            if last is None:
                last = batch
            yield last, batch
            last = batch

    def _seq_maps(self, last, cur):
        """Detect on (prev, cur); the prev frame's maps are cached from the
        previous step (the reference recomputes both every step —
        model_interface.py:220-223, SURVEY.md §3.3 notes the 2x redundancy;
        results are identical, this is pure throughput)."""
        img0 = np.asarray(last["image0"], np.float32)
        img1 = np.asarray(cur["image0"], np.float32)
        cache = getattr(self, "_seq_cache", None)
        if cache is not None and cache[0] is last:
            s0, d0, k0, v0 = cache[1]
        else:
            s0, d0, k0, v0 = self.detect(img0)
        s1, d1, k1, v1 = self.detect(img1)
        self._seq_cache = (cur, (s1, d1, k1, v1))
        return img0, img1, s0, d0, k0, v0, s1, d1, k1, v1

    def _flow_sources(self, img0, img1, d0, d1):
        """Reference matcher-input switch (model_interface.py:261-273): LK
        tracks on raw images except for LETNet/GoodPoint which track on their
        3-channel local descriptor maps."""
        if self.cfg.model_type in ("LETNet", "GoodPoint"):
            return d0, d1
        return jnp.asarray(img0), jnp.asarray(img1)

    def _run_fundamental_pipelined(self, ds):
        """Batched FundamentalMatrix (SURVEY §3.3 pattern): one detection
        pass over all frames, then every consecutive pair's track+epipolar
        metric as a single vmapped device batch. Enabled with
        task_params.pipelined; supports optical_flow and brute_force."""
        th = float(self.cfg.task_params.get("th", 3.0))
        n = len(ds)
        Fs, raw = [], []
        for batch in _iter(ds):
            raw.append(np.asarray(batch["image0"], np.float32))
            Fs.append(np.asarray(batch["fundamental"]))
        sparse = (self.cfg.model_type == "Alike_s2d"
                  and self.matcher_type != "optical_flow"
                  and bool(self.cfg.task_params.get("sparse_desc", True)))
        _, descs_s, kpts_s, valids_s = self.detect_many(raw, sparse=sparse)
        frames_s = jnp.asarray(np.stack(raw))
        Fs_s = jnp.asarray(np.stack(Fs))
        h, w = raw[0].shape[:2]
        scale = jnp.asarray([w - 1.0, h - 1.0])

        def _shift1(x):
            # previous-frame operands as shift-by-one slices (an
            # integer-index gather over the stacked frame/descriptor
            # tensors is per-element-bound — see _run_vo_pipelined)
            return jnp.concatenate([x[:1], x[:-1]])

        if self.matcher_type == "optical_flow":
            src_s = descs_s if self.cfg.model_type in ("LETNet", "GoodPoint") \
                else frames_s

            def lk_batch(src, kpts, valids, Fs, keys):
                # natively batched LK (ops/lk.optical_flow_batch): the
                # Pallas in-kernel tracker on TPU, vmapped XLA elsewhere
                from keypoint_bench_tpu.ops.lk import optical_flow_batch
                k0b = _shift1(kpts)[:, :, 0:2]
                tracked, _ = optical_flow_batch(_shift1(src), src, k0b,
                                                k0b, keys, self.lk_params)
                return jax.vmap(
                    lambda k0, tr, v0, F: fundamental_metrics(
                        k0 * scale, tr * scale, v0, F, th))(
                    k0b, tracked, _shift1(valids), Fs)

            batched = self._jit_cached("fund_lk_pipeline", lk_batch)
            keys = jax.random.split(self.next_key(), n)
            out = batched(src_s, kpts_s, valids_s, Fs_s, keys)
        else:
            from keypoint_bench_tpu.ops.grid_sample import sample_at_points
            from keypoint_bench_tpu.ops.matching import mutual_nn_match

            def bf_batch(kpts, valids, descs, Fs):
                def pair_metric(k0, v0, d0, k1, v1, d1, F):
                    f0 = d0 if d0.ndim == 2 else sample_at_points(d0, k0)
                    f1 = d1 if d1.ndim == 2 else sample_at_points(d1, k1)
                    nn01, ok = mutual_nn_match(f0, f1, v0, v1,
                                               self.bf_max_distance)
                    return fundamental_metrics(k0[:, 0:2] * scale,
                                               k1[nn01][:, 0:2] * scale,
                                               ok, F, th)
                return jax.vmap(pair_metric)(_shift1(kpts), _shift1(valids),
                                             _shift1(descs), kpts, valids,
                                             descs, Fs)

            batched = self._jit_cached("fund_bf_pipeline", bf_batch)
            out = batched(kpts_s, valids_s, descs_s, Fs_s)
        errs = np.asarray(out["fundamental_error"])
        radios = np.asarray(out["fundamental_radio"])
        nums = np.asarray(out["fundamental_num"])
        result = {
            "fundamental_error": float(errs.mean()),
            "fundamental_radio": float(radios.mean()),
            "fundamental_num": float(nums.mean()),
            "per_frame_error": errs.tolist(),
        }
        print("fundamental_error", result["fundamental_error"],
              " fundamental_radio", result["fundamental_radio"],
              " fundamental_num", result["fundamental_num"])
        return result

    def _run_fundamental(self, ds):
        if self.cfg.task_params.get("pipelined"):
            return self._run_fundamental_pipelined(ds)
        th = float(self.cfg.task_params.get("th", 3.0))
        errs, radios, nums = [], [], []
        for last, batch in self._iter_sequence(ds):
            img0, img1, s0, d0, k0, v0, s1, d1, k1, v1 = \
                self._seq_maps(last, batch)
            h, w = img1.shape[0], img1.shape[1]
            if self.matcher_type in ("optical_flow", "optical_flow_cv"):
                src0, src1 = self._flow_sources(img0, img1, d0, d1)
                m0, m1, ok = self._match(k0, v0, k1, v1, d0, d1, w, h,
                                         imgs=(src0, src1))
            else:
                m0, m1, ok = self._match(k0, v0, k1, v1, d0, d1, w, h)
            scale = jnp.asarray([w - 1.0, h - 1.0])
            p0 = m0[:, 0:2] * scale
            p1 = m1[:, 0:2] * scale
            out = fundamental_metrics(p0, p1, ok,
                                      jnp.asarray(batch["fundamental"]), th)
            if self.cfg.task_params.get("save_images"):
                # reference FundamentalMatrix.py:70-84: match overlay +
                # epipolar lines of the matched points, behind save_result
                import cv2
                from keypoint_bench_tpu.utils.visualization import \
                    plot_epipolar_lines
                i = len(errs)
                self._dump_matches(i, "fund_matches", img0, img1, m0, m1, ok)
                okn = np.asarray(ok)
                show = plot_epipolar_lines(
                    img1, np.asarray(p0)[okn], np.asarray(p1)[okn],
                    np.asarray(batch["fundamental"]))
                cv2.imwrite(os.path.join(self.cfg.output_dir,
                                         f"fund_epipolar_{i}.png"), show)
            errs.append(float(out["fundamental_error"]))
            radios.append(float(out["fundamental_radio"]))
            nums.append(int(out["fundamental_num"]))
        result = {
            "fundamental_error": float(np.mean(errs)),
            "fundamental_radio": float(np.mean(radios)),
            "fundamental_num": float(np.mean(nums)),
            "per_frame_error": errs,
        }
        print("fundamental_error", result["fundamental_error"],
              " fundamental_radio", result["fundamental_radio"],
              " fundamental_num", result["fundamental_num"])
        return result

    def _run_fundamental_ransac(self, ds):
        radios = []
        for batch in _iter(ds):
            img0, img1, s0, d0, k0, v0, s1, d1, k1, v1 = self._pair_maps(batch)
            h, w = img0.shape[0], img0.shape[1]
            m0, m1, ok = self._match(k0, v0, k1, v1, d0, d1, w, h)
            scale = jnp.asarray([w - 1.0, h - 1.0])
            out = fundamental_ransac_ratio(m0[:, 0:2] * scale,
                                           m1[:, 0:2] * scale, ok,
                                           self.next_key())
            radios.append(float(out["fundamental_radio"]))
        result = {"fundamental_radio": float(np.mean(radios))}
        print("fundamental_radio", result["fundamental_radio"])
        return result

    def _run_vo_pipelined(self, ds):
        """Batched VO (SURVEY.md §3.3): detect every frame once, then solve
        all consecutive pairs as one vmapped batch on device; only the final
        GT-scale pose compose chain stays serial on host. Enabled with
        task_params.pipelined for brute-force matching (LK tracking needs the
        raw frames pairwise and stays in the sequential path)."""
        import time as _time
        _timing = os.environ.get("KBT_VO_TIMING", "0") == "1"
        _tmarks = [("start", _time.perf_counter())]

        def _mark(label):
            if _timing:
                _tmarks.append((label, _time.perf_counter()))

        n = len(ds)
        metas, raw = [], []
        for batch in _iter(ds):
            img = np.asarray(batch["image0"])
            # keep uint8 frames as-is: they transfer 4x fewer bytes through
            # the tunnel and normalize on device (_to_float)
            raw.append(img if img.dtype == np.uint8
                       else np.asarray(img, np.float32))
            metas.append(batch)
        _mark("load")
        # Alike_s2d: sparse per-keypoint descriptors (identical values to
        # dense sampling, no [n, H, W, 64] map; task_params.sparse_desc
        # opts out)
        sparse = (self.cfg.model_type == "Alike_s2d"
                  and bool(self.cfg.task_params.get("sparse_desc", True)))
        _, descs_s, kpts_s, valids_s = self.detect_many(raw, sparse=sparse)
        jax.block_until_ready(kpts_s)
        _mark("detect")
        h, w = raw[0].shape[:2]
        scale_px = jnp.asarray([w - 1.0, h - 1.0])

        from keypoint_bench_tpu.ops.grid_sample import sample_at_points
        from keypoint_bench_tpu.ops.matching import mutual_nn_match

        def solve_batch(kpts, valids, descs, keys):
            # previous-frame operands via shift-by-one SLICES, not an
            # integer-index gather: descs[prev_idx] on the [n, H, W, C]
            # stacked descriptor tensor is per-element-bound (~0.5 GB
            # gathered -> seconds; round-4 measured the solve at 4.2 s of
            # a 6 s VO run before this)
            def shift1(x):
                return jnp.concatenate([x[:1], x[:-1]])
            k0s, v0s, d0s = shift1(kpts), shift1(valids), shift1(descs)

            def pair_solve(k0, v0, d0, k1, v1, d1, key):
                # d* is either a dense [H, W, C] map (sample at keypoints)
                # or already per-keypoint [K, C] (sparse path)
                f0 = d0 if d0.ndim == 2 else sample_at_points(d0, k0)
                f1 = d1 if d1.ndim == 2 else sample_at_points(d1, k1)
                nn01, ok = mutual_nn_match(f0, f1, v0, v1,
                                           self.bf_max_distance)
                m1 = k1[nn01]
                R, t, n_in, okp = vo_pair_pose(
                    k0[:, 0:2] * scale_px, m1[:, 0:2] * scale_px, ok,
                    jnp.asarray(float(metas[0]["fx"])),
                    jnp.asarray(float(metas[0]["cx"])),
                    jnp.asarray(float(metas[0]["cy"])), key)
                return R, t, n_in, okp, nn01, ok
            return jax.vmap(pair_solve)(k0s, v0s, d0s,
                                        kpts, valids, descs, keys)

        batched = self._jit_cached("vo_pair_solve", solve_batch)
        keys = jax.random.split(self.next_key(), n)
        Rb, tb, n_in, okb, nn01s, mok = batched(kpts_s, valids_s, descs_s,
                                                keys)
        jax.block_until_ready(Rb)
        _mark("solve")

        scales = []
        for batch in metas:
            gt = np.asarray(batch["ground_truth"])
            gt_prev = np.asarray(batch["last_ground_truth"])
            scales.append(float(np.linalg.norm(gt[0:3, 3] - gt_prev[0:3, 3])))
        R_est, t_est = chain_poses(np.asarray(Rb), np.asarray(tb),
                                   np.asarray(okb), np.asarray(scales))
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        from keypoint_bench_tpu.tasks.vo import write_kitti_trajectory
        traj = os.path.join(self.cfg.output_dir, "trajectory.txt")
        write_kitti_trajectory(traj, R_est, t_est)
        result = {"num_frames": n, "trajectory_path": traj,
                  "R_est": R_est, "t_est": t_est}
        _mark("chain+write")

        if self.cfg.task_params.get("ba_refine"):
            # grow VO into windowed bundle adjustment (tasks/vo_ba.py)
            from keypoint_bench_tpu.tasks.vo_ba import (chain_tracks,
                                                        refine_window)
            # cam-from-world chain from the scaled relative poses
            R_w2c = [np.eye(3)]
            t_w2c = [np.zeros(3)]
            Rb_n = np.asarray(Rb)
            tb_n = np.asarray(tb)
            # materialize once: okb[i] on a device array is a per-iteration
            # device fetch (~25 ms each through the tunnel — 0.8-1.6 s for
            # a 32-frame window, measured round 5)
            okb_n = np.asarray(okb)
            for i in range(1, n):
                s = scales[i] if scales[i] >= 0.001 and okb_n[i] else 0.0
                R_w2c.append(Rb_n[i] @ R_w2c[-1])
                t_w2c.append(Rb_n[i] @ t_w2c[-1] + s * tb_n[i])
            R_w2c = np.stack(R_w2c)
            t_w2c = np.stack(t_w2c)
            _mark("ba:pose_chain")
            tracks = chain_tracks(np.asarray(nn01s), np.asarray(mok))
            _mark("ba:chain_tracks")
            fx = float(metas[0]["fx"])
            K = np.array([[fx, 0, float(metas[0]["cx"])],
                          [0, float(metas[0]["fy"]), float(metas[0]["cy"])],
                          [0, 0, 1.0]], np.float32)
            kpts_px = np.asarray(kpts_s)[:, :, :2] * np.asarray(scale_px)
            mesh = None
            if self.cfg.task_params.get("ba_distributed"):
                # refine through the landmark-partitioned Schur solver
                # (ba/distributed.py): window observations shard on 'data',
                # same Huber+LM semantics as single-chip (BASELINE.json
                # config 5: "full VO ... distributed Schur BA")
                from keypoint_bench_tpu.parallel.mesh import make_mesh
                n_dev = len(jax.devices())
                mesh = make_mesh(n_data=n_dev, devices=jax.devices())
            ref = refine_window(kpts_px, tracks, R_w2c, t_w2c, K, mesh=mesh)
            _mark("ba:refine_window")
            if ref is not None:
                Rf, tf, pf, err0, err1 = ref
                result.update({"ba_R_w2c": Rf, "ba_t_w2c": tf,
                               "ba_points": pf,
                               "ba_reproj_before": err0,
                               "ba_reproj_after": err1,
                               "ba_tracks": len(tracks)})
                print(f"BA window: {len(tracks)} tracks, reproj "
                      f"{err0:.2f} -> {err1:.2f} px")
        if _timing:
            parts = " ".join(
                f"{lbl}={(_tmarks[i + 1][1] - _tmarks[i][1]) * 1e3:.0f}ms"
                for i, (lbl, _) in enumerate(_tmarks[1:]))
            print(f"[vo timing] {parts}")
        return result

    def _run_vo(self, ds):
        if self.cfg.task_params.get("pipelined") and \
                self.matcher_type == "brute_force":
            return self._run_vo_pipelined(ds)
        log = MetricLog(self.cfg.output_dir, self.cfg.resume)
        rel_R, rel_t, oks, scales = [], [], [], []
        for i, (last, batch) in enumerate(self._iter_sequence(ds)):
            rec = log.get(i)
            if rec is None:
                img0, img1, s0, d0, k0, v0, s1, d1, k1, v1 = \
                    self._seq_maps(last, batch)
                h, w = img1.shape[0], img1.shape[1]
                if self.matcher_type in ("optical_flow",
                                          "optical_flow_cv"):
                    src0, src1 = self._flow_sources(img0, img1, d0, d1)
                    m0, m1, ok = self._match(k0, v0, k1, v1, d0, d1, w, h,
                                             imgs=(src0, src1))
                    if self.matcher_type == "optical_flow":
                        # device LK has no cv2 status; validity = tracked in
                        # bounds (ATE delta vs the cv2-status path quantified
                        # in RESULTS.md / tests/test_vo_lk_status.py)
                        inb = ((m1[:, 0] >= 0) & (m1[:, 0] <= 1)
                               & (m1[:, 1] >= 0) & (m1[:, 1] <= 1))
                        ok = ok & inb
                else:
                    m0, m1, ok = self._match(k0, v0, k1, v1, d0, d1, w, h)
                scale_px = jnp.asarray([w - 1.0, h - 1.0])
                R, t, n_in, okp = vo_pair_pose(
                    m0[:, 0:2] * scale_px, m1[:, 0:2] * scale_px, ok,
                    jnp.asarray(float(batch["fx"])),
                    jnp.asarray(float(batch["cx"])),
                    jnp.asarray(float(batch["cy"])), self.next_key())
                gt = np.asarray(batch["ground_truth"])
                gt_prev = np.asarray(batch["last_ground_truth"])
                rec = log.put(i, {
                    "R": np.asarray(R).reshape(-1).tolist(),
                    "t": np.asarray(t).tolist(),
                    "ok": bool(okp),
                    "scale": float(np.linalg.norm(gt[0:3, 3]
                                                  - gt_prev[0:3, 3]))})
            rel_R.append(np.asarray(rec["R"]).reshape(3, 3))
            rel_t.append(np.asarray(rec["t"]))
            oks.append(bool(rec["ok"]))
            scales.append(float(rec["scale"]))
        log.close()
        R_est, t_est = chain_poses(np.stack(rel_R), np.stack(rel_t),
                                   np.asarray(oks), np.asarray(scales))
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        from keypoint_bench_tpu.tasks.vo import write_kitti_trajectory
        traj = os.path.join(self.cfg.output_dir, "trajectory.txt")
        write_kitti_trajectory(traj, R_est, t_est)
        return {"num_frames": len(rel_R), "trajectory_path": traj,
                "R_est": R_est, "t_est": t_est}

    def _run_tracking_error(self, ds):
        errs = []
        for batch in _iter(ds):
            img0 = _crop32(np.asarray(batch["image0"], np.float32))
            img1 = _crop32(np.asarray(batch["image1"], np.float32))
            s0, d0, k0, v0 = self.detect(img0)
            s1, d1, k1, v1 = self.detect(img1)
            wp01 = batch.get("warp01_params")
            src0, src1 = self._flow_sources(img0, img1, d0, d1)
            if wp01 is not None:
                a0, a01, va = self._warp(k0, v0, wp01)
                tracked, _ = optical_flow(src0, src1, a0, a01,
                                          self.next_key(), self.lk_params)
                scale = jnp.asarray([img0.shape[1] - 1.0,
                                     img0.shape[0] - 1.0])
                err = jnp.linalg.norm((a01 - tracked) * scale, axis=1)
                n = jnp.maximum(jnp.sum(va), 1)
                errs.append(float(jnp.sum(jnp.where(va, err, 0.0)) / n))
            else:
                errs.append(0.0)
        result = {"track_error": float(np.mean(errs)), "per_pair": errs}
        print("track_error", result["track_error"])
        return result


def _iter(ds):
    for i in range(len(ds)):
        yield ds[i]


def run_eval(config: dict | EvalConfig) -> dict:
    if isinstance(config, dict):
        config = EvalConfig.from_dict(config)
    return Evaluator(config).run()
