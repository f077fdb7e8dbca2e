"""Throughput benchmark: YOLO+UNet pipeline + motion trackers, frames/sec/chip.

Reference baseline: ~35 frames/s for the full YOLO+UNet pipeline on Apple
M-series MPS (paper/main.tex:951-954; BASELINE.md).  North star:
>=5,000 256² frames/sec/chip on TPU v5e-1 (BASELINE.json).

Measurement rules (the round-2 bench violated all three and over-reported by
>3x — see the round-3 VERDICT history):
  * every timed region ends by FETCHING results to host (np.asarray of the
    waveform) — the only completion fence the axon relay cannot elide;
  * every timed repetition runs on DISTINCT video content (fresh uint8
    perturbation per rep), so no rep can ride cached work;
  * the JSON line carries flops_per_frame (XLA cost analysis), device_kind,
    and mfu so the headline number can be physics-checked: fps x
    flops_per_frame must stay below the chip's peak.

Harness rules (added round 5 after BENCH_r04 died rc=1 on ONE transient
relay flake and erased the round's evidence — VERDICT r4 item 1):
  * every stage runs under retry_transient (3 attempts, linear backoff) —
    the relay's "response body closed" class of error is transient;
  * results accumulate into the JSON dict incrementally; a stage that still
    fails after retries contributes nulls + an entry in failed_stages, and
    the bench EXITS 0 with whatever it measured;
  * the headline ``value`` is the most production-shaped number that
    survived: batched (dispatch-ahead cohort serving) > pipelined > serial.
    Serial latency rides the shared relay's per-dispatch round-trip (1.4x
    run-to-run spread with pool contention, BENCH_r03) — it stays visible
    as ``serial_fps`` + ``serial_fps_spread`` but no longer sets the
    headline.  ``headline`` names which protocol ``value`` came from.

Workload: the paper's timing video (502 frames, 256², monochrome HSV;
benchmark_video_speed.py:5) — serial per-video latency (device-resident
input), dispatch-ahead batched cohorts (K in {4, 8}), pipelined end-to-end
throughput (host videos, bandwidth-adaptive prefetch), and the two motion
tracker pipelines.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np

from openglottal_tpu.utils.retry import retry_transient

# dense bf16 peak FLOP/s per chip, by jax device_kind (public spec sheets)
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
}
# int8 peak = 2x bf16 on every listed generation (v4 has no int8 MXU mode —
# conservatively reuse bf16 peak there so mfu_int8 never under-reports >1)
PEAK_INT8 = {k: (v * 2 if k != "TPU v4" else v) for k, v in PEAK_BF16.items()}

T_FRAMES = 502  # paper timing workload (benchmark_video_speed.py:5)
N_VIDEOS = 8    # steady-state per-video workload (analyze_gaw processes 65)
N_COHORT = 16   # cohort workload: >=2 dispatch-ahead batches at K=8
N_BASE = 4      # distinct synthetic base videos (generation is ~15 s each)
K_SWEEP = (4, 8)


class Collector:
    """Accumulate benchmark keys; isolate stage failures.

    Each stage runs under retry (transient relay errors are the observed
    failure class); a stage that exhausts retries is recorded in
    ``failed_stages`` and returns ``default`` so later stages still run and
    the final JSON emits whatever was measured (VERDICT r4 item 1)."""

    def __init__(self, attempts: int = 3):
        self.out: dict = {}
        self.failed: list = []
        self.attempts = attempts

    def stage(self, name: str, fn, default=None):
        def note(i, e):
            print(f"# stage {name}: attempt {i + 1} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)

        try:
            return retry_transient(fn, attempts=self.attempts, backoff_s=3.0,
                                   on_error=note)
        except Exception as e:  # noqa: BLE001 — harness must emit regardless
            self.failed.append({"stage": name,
                                "error": f"{type(e).__name__}: {e}"[:300]})
            return default


def _perturb(video: np.ndarray, rng: np.random.Generator,
             keep_head: int = 0) -> np.ndarray:
    """Distinct content at memcpy speed: fresh low-amplitude uint8 XOR noise.
    Conv/scan work is content-independent, but distinct bytes per rep deny
    the runtime any chance to alias reps to earlier results.

    ``keep_head``: leave the first N frames unperturbed.  The VFT pipeline
    locks its crop size at the first valid detection (reference
    features.py:124-127) and that size is a STATIC shape of the tracker
    graph — ±1 px box jitter on frame 0 forces a fresh ~12-38 s relay
    compile per video (the BENCH_r05 47-fps vft artifact), which is a
    cold-cache cost, not steady-state throughput (production cameras have a
    fixed setup, so crop shapes repeat).  Keeping the head frames stable
    pins the compiled shape while the other ~99% of frames stay distinct."""
    noise = rng.integers(0, 8, size=video.shape, dtype=np.uint8)
    if keep_head:
        noise[:keep_head] = 0
    return video ^ noise


def main() -> None:
    import argparse

    from openglottal_tpu.data.prefetch import adaptive_depth, prefetch_to_device
    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.unet import init_unet
    from openglottal_tpu.models.yolo import init_yolo
    from openglottal_tpu.pipelines import GlottalPipelines

    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None,
                    help="Write a jax.profiler trace of one batch to this dir.")
    ap.add_argument("--reps", type=int, default=5)
    args, _ = ap.parse_known_args()

    col = Collector()
    out = col.out

    dev = jax.devices()[0]
    device_kind = dev.device_kind
    peak = next((v for k, v in PEAK_BF16.items() if device_kind.startswith(k)),
                None)
    peak8 = next((v for k, v in PEAK_INT8.items()
                  if device_kind.startswith(k)), None)
    out["device_kind"] = device_kind

    # decoded monochrome HSV frames — high-speed endoscopy cameras are
    # grayscale, so decode yields (T, 256, 256) uint8 per video; realistic
    # endoscopy-like content (vignette/speculars/fold texture) so every
    # content-dependent stage (gate behavior, blob fixpoint convergence,
    # tracker windowing) runs the way production footage drives it
    base = [np.ascontiguousarray(
        synthetic_video(t=T_FRAMES, size=256, seed=s,
                        realistic=True)[0][..., 0])
        for s in range(N_BASE)]

    # trained in-repo demo weights (scripts/make_demo_weights.py) when
    # present: a trained detector produces glottis-sized gate boxes, which
    # is what the tracker pipelines' windowed fast path and the gate's
    # hold/zero behavior see in production.  FLOPs are weight-independent;
    # the JSON records which weights ran.
    wdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "weights")
    if (os.path.exists(os.path.join(wdir, "demo_unet.npz"))
            and os.path.exists(os.path.join(wdir, "demo_yolo.npz"))):
        from openglottal_tpu.utils.io import (load_unet_weights,
                                              load_yolo_weights)

        uvars = load_unet_weights(os.path.join(wdir, "demo_unet.npz"))
        yvars = load_yolo_weights(os.path.join(wdir, "demo_yolo.npz"))
        out["weights"] = "trained-demo"
    else:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        _, uvars = init_unet(k1, dtype=jnp.bfloat16)
        _, yvars = init_yolo(k2, dtype=jnp.bfloat16)
        out["weights"] = "random-init"
    pipe = GlottalPipelines(unet_variables=uvars, yolo_variables=yvars,
                            dtype=jnp.bfloat16)
    # auto-on for the folded bf16 path: 256²-level U-Net tail windowed to
    # the gate boxes (pipelines._fused_yolo_unet_video_w).  flops_per_frame
    # stays the full-frame ALGORITHMIC count (the windowed graph does less
    # work when boxes fit — mfu keys are algorithmic, never >hardware)
    out["window_decoder"] = bool(pipe._window)

    rng = np.random.default_rng(1234)

    def vids_dev(n: int) -> list:
        vs = [jax.device_put(_perturb(base[i % N_BASE], rng))
              for i in range(n)]
        jax.block_until_ready(vs)
        return vs

    # ── FLOPs per frame (XLA cost analysis) ───────────────────────────────
    # Counted on the plain batched U-Net + YOLO chunk graphs (no loops):
    # cost_analysis counts a lax.map/while BODY once, not x trip-count, so
    # the fused whole-video graph under-reports by T_pad/CHUNK (4x for the
    # 502-frame workload — the round-2 trap).
    def stage_flops():
        from openglottal_tpu.pipelines import (CHUNK, _unet_chunk,
                                               _yolo_chunk_gray)

        g_chunk = jax.ShapeDtypeStruct((CHUNK, 256, 256), jnp.uint8)
        f_unet = float(_unet_chunk.lower(
            pipe.unet_variables, g_chunk, dtype=jnp.bfloat16,
            fuse=pipe._fuse).compile().cost_analysis()["flops"])
        f_yolo = float(_yolo_chunk_gray.lower(
            pipe.yolo_gray_variables, g_chunk, conf=0.25, dtype=jnp.bfloat16,
            fuse=pipe._fuse).compile().cost_analysis()["flops"])
        return (f_unet + f_yolo) / CHUNK

    flops_per_frame = col.stage("flops", stage_flops)
    out["flops_per_frame"] = (round(flops_per_frame)
                              if flops_per_frame else None)

    def mfu_of(fps, p=peak):
        return (round(fps * flops_per_frame / p, 4)
                if fps and flops_per_frame and p else None)

    # ── warmup / compile on content never reused in a timed rep ───────────
    def run_serial(videos_dev) -> float:
        """Device-resident input, strictly serial, fetch-forced per video.
        Returns seconds for all videos."""
        t0 = time.perf_counter()
        for g in videos_dev:
            np.asarray(pipe.yolo_unet_areas_gray(g))  # d2h fetch = fence
        return time.perf_counter() - t0

    def run_e2e(videos_host, depth: int) -> float:
        """Host input, prefetch-to-device at the given depth, outputs fetched
        inside the timed region (dispatch all deferred, then resolve+fetch
        all — no per-video host sync on the speculative windowed path)."""
        t0 = time.perf_counter()
        outs = [pipe.yolo_unet_areas_gray_deferred(g)
                for g in prefetch_to_device(videos_host, size=depth)]
        for o in outs:
            np.asarray(pipe.yolo_unet_areas_resolve(o))
        return time.perf_counter() - t0

    warm = [_perturb(base[i % N_BASE], rng) for i in range(2)]
    col.stage("warmup", lambda: (
        run_e2e(warm, 2), run_serial([jax.device_put(w) for w in warm])))

    if args.profile:
        def stage_profile():
            with jax.profiler.trace(args.profile):
                run_e2e([_perturb(base[i % N_BASE], rng)
                         for i in range(N_VIDEOS)], 2)
            print(f"# trace written to {args.profile}", flush=True)
        col.stage("profile", stage_profile)

    # ── serial compute-path latency; median of 5 because per-dispatch relay
    # latency swings with shared-pool contention ───────────────────────────
    def stage_serial():
        times = []
        for _ in range(5):
            vs = vids_dev(4)
            times.append(run_serial(vs) / len(vs))
        dt = sorted(times)[len(times) // 2]
        return (T_FRAMES / dt, [round(T_FRAMES / max(times), 1),
                                round(T_FRAMES / min(times), 1)])

    serial = col.stage("serial", stage_serial)
    serial_fps = serial[0] if serial else None
    out["serial_fps"] = round(serial_fps, 1) if serial_fps else None
    out["serial_fps_spread"] = serial[1] if serial else None
    out["mfu_serial"] = mfu_of(serial_fps)

    # ── pipelined: dispatch all K device-resident videos, then fetch every
    # waveform INSIDE the timed region — amortises the per-dispatch relay
    # round-trip (~40 ms/video) the serial protocol charges to every video ─
    def stage_pipelined():
        def once():
            vs = vids_dev(N_VIDEOS)
            t0 = time.perf_counter()
            outs = [pipe.yolo_unet_areas_gray_deferred(g) for g in vs]
            for o in outs:
                np.asarray(pipe.yolo_unet_areas_resolve(o))
            return (time.perf_counter() - t0) / len(vs)
        return sorted(once() for _ in range(3))[1]

    dt_pipe = col.stage("pipelined", stage_pipelined)
    pipelined_fps = T_FRAMES / dt_pipe if dt_pipe else None
    out["pipelined_fps"] = round(pipelined_fps, 1) if pipelined_fps else None
    out["mfu_pipelined"] = mfu_of(pipelined_fps)

    # ── batched cohort serving, dispatch-ahead: all sub-batches of K videos
    # dispatch (fetch=False -> device arrays) before the first waveform is
    # fetched, so batch j+1 computes while batch j's results stream back.
    # Swept over K (VERDICT r4 item 2); one graph compile per K ────────────
    def make_stage_batched(pp, k):
        def stage():
            pp.yolo_unet_areas_gray_multi(
                [jax.device_put(w) for w in warm] * (k // 2),
                max_k=k)  # compile
            def once():
                vs = vids_dev(N_COHORT)
                t0 = time.perf_counter()
                # ONE call: all sub-batches dispatch before the first fetch
                # (dispatch-ahead), each sub-batch then fetches as one
                # (K, T_pad) block + its speculation flags — 2 round trips
                # per sub-batch instead of K per-video fetches
                outs = pp.yolo_unet_areas_gray_multi(vs, max_k=k)
                assert len(outs) == N_COHORT
                return (time.perf_counter() - t0) / N_COHORT
            return sorted(once() for _ in range(3))[1]
        return stage

    by_k = {}
    for k in K_SWEEP:
        dt_k = col.stage(f"batched_k{k}", make_stage_batched(pipe, k))
        if dt_k:
            by_k[str(k)] = round(T_FRAMES / dt_k, 1)
    out["batched_fps_by_k"] = by_k or None
    if by_k:
        best_k = max(by_k, key=by_k.get)
        out["batched_k"] = int(best_k)
        out["batched_fps"] = by_k[best_k]
        out["batched_ge_pipelined"] = (
            by_k[best_k] >= out["pipelined_fps"]
            if out.get("pipelined_fps") else None)
    else:
        out["batched_k"] = out["batched_fps"] = None
        out["batched_ge_pipelined"] = None
    out["mfu_batched"] = mfu_of(out.get("batched_fps"))

    # ── int8 serving mode (models/quant.py): same fused path, U-Net
    # post-training-quantized (YOLO stays bf16).  Same fetch-forced
    # protocols; physics-checked against the chip's INT8 peak (2x bf16) —
    # the MAC count per frame is unchanged ────────────────────────────────
    def stage_int8_setup():
        pq = GlottalPipelines(unet_variables=uvars, yolo_variables=yvars,
                              dtype=jnp.bfloat16, quant="int8")
        pq.calibrate(warm[0])
        np.asarray(pq.yolo_unet_areas_gray(jax.device_put(warm[1])))
        return pq

    pipe_q = col.stage("int8_setup", stage_int8_setup)
    if pipe_q is not None:
        def stage_int8_serial():
            times = []
            for _ in range(3):
                vs = vids_dev(4)
                t0 = time.perf_counter()
                for g in vs:
                    np.asarray(pipe_q.yolo_unet_areas_gray(g))
                times.append((time.perf_counter() - t0) / len(vs))
            return sorted(times)[1]

        def stage_int8_pipelined():
            def once():
                vs = vids_dev(N_VIDEOS)
                t0 = time.perf_counter()
                outs = [pipe_q.yolo_unet_areas_gray_deferred(g) for g in vs]
                for o in outs:
                    np.asarray(pipe_q.yolo_unet_areas_resolve(o))
                return (time.perf_counter() - t0) / len(vs)
            return sorted(once() for _ in range(3))[1]

        dt = col.stage("int8_serial", stage_int8_serial)
        out["int8_serial_fps"] = round(T_FRAMES / dt, 1) if dt else None
        dt = col.stage("int8_pipelined", stage_int8_pipelined)
        out["int8_pipelined_fps"] = round(T_FRAMES / dt, 1) if dt else None
        out["mfu_int8"] = mfu_of(out.get("int8_pipelined_fps"), peak8)
        k8 = out.get("batched_k") or 4
        dt = col.stage("int8_batched", make_stage_batched(pipe_q, k8))
        out["int8_batched_fps"] = round(T_FRAMES / dt, 1) if dt else None
    else:
        out["int8_serial_fps"] = out["int8_pipelined_fps"] = None
        out["int8_batched_fps"] = out["mfu_int8"] = None

    # ── h2d bandwidth this run happened to get (observed 0.03-2 GB/s) ─────
    def stage_bandwidth():
        vs = [_perturb(base[i % N_BASE], rng) for i in range(4)]
        t0 = time.perf_counter()
        jax.block_until_ready([jax.device_put(v) for v in vs])
        return sum(v.nbytes for v in vs) / (time.perf_counter() - t0)

    bw = col.stage("bandwidth", stage_bandwidth)
    out["h2d_bandwidth_MBps"] = round(bw / 1e6, 1) if bw else None

    # ── end-to-end throughput (host->device transfers included), prefetch
    # depth adapted to the measured bandwidth (data/prefetch.adaptive_depth);
    # e2e_bound_fps is the physics cap: min(transfer-bound, compute-bound) ─
    bytes_per_video = base[0].nbytes
    depth = adaptive_depth(bytes_per_video, bw or 1e9,
                           dt_pipe or (1.0 / 30.0))
    out["e2e_depth"] = depth
    if bw:
        bound = bw / (bytes_per_video / T_FRAMES)
        if pipelined_fps:
            bound = min(bound, pipelined_fps)
        out["e2e_bound_fps"] = round(bound, 1)
    else:
        out["e2e_bound_fps"] = None

    def stage_e2e():
        times = []
        for _ in range(args.reps):
            vs = [_perturb(base[i % N_BASE], rng) for i in range(N_VIDEOS)]
            times.append(run_e2e(vs, depth))
        return times

    e2e_times = col.stage("e2e", stage_e2e)
    if e2e_times:
        dt = sorted(e2e_times)[len(e2e_times) // 2]
        out["e2e_fps"] = round(T_FRAMES * N_VIDEOS / dt, 1)
        out["e2e_floor_fps"] = round(T_FRAMES * N_VIDEOS / max(e2e_times), 1)
    else:
        out["e2e_fps"] = out["e2e_floor_fps"] = None

    # ── trackers: chip-attributable = device-resident gray input, full
    # per-video compute (detect + gate + tracker; areas come back as host
    # arrays — inherently fetch-forced); realistic synthetic content
    # (fixpoint convergence is content-dependent), distinct per rep.
    # These ARE the production APIs: guided-vft runs the fused one-dispatch
    # graph (_fused_ygvft_video), vft the two-dispatch form its host-side
    # crop-size lock requires ─────────────────────────────────────────────
    def make_stage_tracker(fn):
        def stage():
            # warm/compile inside the retry on BOTH base videos (their
            # locked crop shapes differ; timed reps keep the head frames
            # stable so the shapes — static in the tracker graph — repeat)
            for b in base[:2]:
                fn(jax.device_put(b))
            times = []
            for _ in range(2):
                vs = [jax.device_put(_perturb(b, rng, keep_head=3))
                      for b in base[:2]]
                jax.block_until_ready(vs)
                t0 = time.perf_counter()
                for gd in vs:
                    fn(gd)
                times.append((time.perf_counter() - t0) / len(vs))
            return min(times)
        return stage

    dt = col.stage("vft", make_stage_tracker(pipe.vft_areas_gray))
    out["vft_fps"] = round(T_FRAMES / dt, 1) if dt else None
    dt = col.stage("guided_vft", make_stage_tracker(pipe.guided_vft_areas_gray))
    out["guided_vft_fps"] = round(T_FRAMES / dt, 1) if dt else None

    # guided-vft cohort serving: ONE fused graph per batch of K videos
    # (_fused_ygvft_multi — shared detection chunks, vmapped gate scans,
    # flattened tracker tail); the relay round-trip is paid per batch
    def stage_ygvft_batched():
        kb = 4
        pipe.guided_vft_areas_gray_multi(
            [jax.device_put(w) for w in warm] * (kb // 2))  # compile
        def once():
            vs = vids_dev(kb)
            t0 = time.perf_counter()
            pipe.guided_vft_areas_gray_multi(vs)
            return (time.perf_counter() - t0) / kb
        return min(once() for _ in range(2))

    dt = col.stage("guided_vft_batched", stage_ygvft_batched)
    out["guided_vft_batched_fps"] = round(T_FRAMES / dt, 1) if dt else None

    # ── headline: most production-shaped surviving number ─────────────────
    baseline_fps = 35.0  # reference full pipeline, M-series MPS
    for key in ("batched_fps", "pipelined_fps", "serial_fps"):
        if out.get(key):
            value, headline = out[key], key
            break
    else:
        value, headline = None, None

    result = {
        "metric": "yolo_unet_frames_per_sec_per_chip",
        "value": value,
        "unit": "frames/s",
        "vs_baseline": round(value / baseline_fps, 2) if value else None,
        "headline": headline,
    }
    result.update(out)
    if col.failed:
        result["failed_stages"] = col.failed
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
