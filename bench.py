"""Throughput benchmark: YOLO+UNet pipeline + motion trackers, frames/sec/chip.

Reference baseline: ~35 frames/s for the full YOLO+UNet pipeline on Apple
M-series MPS (paper/main.tex:951-954; BASELINE.md).  North star:
>=5,000 256² frames/sec/chip on TPU v5e-1 (BASELINE.json).

Measurement rules (the round-2 bench violated all three and over-reported by
>3x — see VERDICT.md "What's weak" #1):
  * every timed region ends by FETCHING results to host (np.asarray of the
    waveform) — the only completion fence the axon relay cannot elide;
  * every timed repetition runs on DISTINCT video content (fresh uint8
    perturbation per rep), so no rep can ride cached work;
  * the JSON line carries flops_per_frame (XLA cost analysis), device_kind,
    and mfu so the headline number can be physics-checked: fps x
    flops_per_frame must stay below the chip's peak.

Workload: the paper's timing video (502 frames, 256², monochrome HSV;
benchmark_video_speed.py:5) — serial per-video latency (device-resident
input), pipelined end-to-end throughput (host videos, double-buffered
transfers), and the two motion-tracker pipelines.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np

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
N_VIDEOS = 8    # steady-state batch workload (analyze_gaw processes 65)
N_BASE = 4      # distinct synthetic base videos (generation is ~15 s each)


def _perturb(video: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Distinct content at memcpy speed: fresh low-amplitude uint8 XOR noise.
    Conv/scan work is content-independent, but distinct bytes per rep deny
    the runtime any chance to alias reps to earlier results."""
    noise = rng.integers(0, 8, size=video.shape, dtype=np.uint8)
    return video ^ noise


def main() -> None:
    import argparse

    from openglottal_tpu.data.synthetic import synthetic_video
    from openglottal_tpu.models.gate import GateParams
    from openglottal_tpu.models.unet import init_unet
    from openglottal_tpu.models.yolo import init_yolo
    from openglottal_tpu.pipelines import (
        GlottalPipelines,
        _bucket,
        _fused_yolo_unet_video,
        _pad_to,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None,
                    help="Write a jax.profiler trace of one batch to this dir.")
    ap.add_argument("--reps", type=int, default=5)
    args, _ = ap.parse_known_args()

    dev = jax.devices()[0]
    device_kind = dev.device_kind
    peak = next((v for k, v in PEAK_BF16.items() if device_kind.startswith(k)),
                None)

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
        weights_kind = "trained-demo"
    else:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        _, uvars = init_unet(k1, dtype=jnp.bfloat16)
        _, yvars = init_yolo(k2, dtype=jnp.bfloat16)
        weights_kind = "random-init"
    pipe = GlottalPipelines(unet_variables=uvars, yolo_variables=yvars,
                            dtype=jnp.bfloat16)

    # ── FLOPs per frame (XLA cost analysis) ───────────────────────────────
    # Counted on the plain batched U-Net + YOLO chunk graphs (no loops):
    # cost_analysis counts a lax.map/while BODY once, not x trip-count, so
    # the fused whole-video graph under-reports by T_pad/CHUNK (4x for the
    # 502-frame workload — the round-2 trap, VERDICT.md).
    from openglottal_tpu.pipelines import CHUNK, _unet_chunk, _yolo_chunk_gray

    g_chunk = jax.ShapeDtypeStruct((CHUNK, 256, 256), jnp.uint8)
    try:
        f_unet = float(_unet_chunk.lower(
            pipe.unet_variables, g_chunk, dtype=jnp.bfloat16,
            fuse=pipe._fuse).compile().cost_analysis()["flops"])
        f_yolo = float(_yolo_chunk_gray.lower(
            pipe.yolo_gray_variables, g_chunk, conf=0.25, dtype=jnp.bfloat16,
            fuse=pipe._fuse).compile().cost_analysis()["flops"])
        flops_per_frame = (f_unet + f_yolo) / CHUNK
    except Exception:
        flops_per_frame = None

    from openglottal_tpu.data.prefetch import prefetch_to_device

    rng = np.random.default_rng(1234)

    def run_serial(videos_dev) -> float:
        """Device-resident input, strictly serial, fetch-forced per video.
        Returns seconds for all videos."""
        t0 = time.perf_counter()
        for g in videos_dev:
            np.asarray(pipe.yolo_unet_areas_gray(g))  # d2h fetch = fence
        return time.perf_counter() - t0

    def run_e2e(videos_host) -> float:
        """Host input, double-buffered transfers, outputs fetched inside the
        timed region (dispatch all, then fetch all — overlap preserved)."""
        t0 = time.perf_counter()
        outs = [pipe.yolo_unet_areas_gray(g)
                for g in prefetch_to_device(videos_host, size=2)]
        for o in outs:
            np.asarray(o)
        return time.perf_counter() - t0

    # warmup / compile on content never reused in a timed rep
    warm = [_perturb(base[i % N_BASE], rng) for i in range(2)]
    run_e2e(warm)
    run_serial([jax.device_put(w) for w in warm])

    if args.profile:
        with jax.profiler.trace(args.profile):
            run_e2e([_perturb(base[i % N_BASE], rng) for i in range(N_VIDEOS)])
        print(f"# trace written to {args.profile}", flush=True)

    # serial compute-path latency (the MFU-bearing number); 5 passes because
    # per-dispatch relay latency swings with shared-pool contention and the
    # driver samples this once — median of 5 rides out a bad window
    serial_times = []
    for _ in range(5):
        vids = [jax.device_put(_perturb(base[i % N_BASE], rng))
                for i in range(4)]
        jax.block_until_ready(vids)
        serial_times.append(run_serial(vids) / len(vids))
    dt_serial = sorted(serial_times)[len(serial_times) // 2]
    serial_fps = T_FRAMES / dt_serial
    serial_spread = [round(T_FRAMES / max(serial_times), 1),
                     round(T_FRAMES / min(serial_times), 1)]
    mfu = (serial_fps * flops_per_frame / peak
           if flops_per_frame and peak else None)

    # pipelined chip throughput: dispatch all K device-resident videos, then
    # fetch every waveform INSIDE the timed region (still fetch-forced,
    # distinct content) — amortises the per-dispatch relay round-trip
    # (~40 ms/video, jax.profiler trace) that the serial protocol charges to
    # every video; this is the per-chip number a local-host deployment sees
    # (profiled device time for the fused module: 107.75 ms/video = 4.7k fps)
    def run_pipelined() -> float:
        vids = [jax.device_put(_perturb(base[i % N_BASE], rng))
                for i in range(N_VIDEOS)]
        jax.block_until_ready(vids)
        t0 = time.perf_counter()
        outs = [pipe.yolo_unet_areas_gray(g) for g in vids]
        for o in outs:
            np.asarray(o)
        return (time.perf_counter() - t0) / len(vids)

    dt_pipe = sorted(run_pipelined() for _ in range(3))[1]
    pipelined_fps = T_FRAMES / dt_pipe
    mfu_pipelined = (pipelined_fps * flops_per_frame / peak
                     if flops_per_frame and peak else None)

    # batched multi-video dispatch (the cohort-serving form, e.g. the 65-
    # patient GAW study): ONE fused graph per batch of 4 videos — the relay
    # round-trip is paid per batch, not per video; outputs come back as host
    # arrays inside the call (fetch-forced by construction)
    K_BATCH = 4
    pipe.yolo_unet_areas_gray_multi(
        [jax.device_put(w) for w in warm[:2]] * (K_BATCH // 2))  # compile

    def run_batched() -> float:
        vids = [jax.device_put(_perturb(base[i % N_BASE], rng))
                for i in range(N_VIDEOS)]
        jax.block_until_ready(vids)
        t0 = time.perf_counter()
        for j in range(0, N_VIDEOS, K_BATCH):
            pipe.yolo_unet_areas_gray_multi(vids[j:j + K_BATCH])
        return (time.perf_counter() - t0) / N_VIDEOS

    batched_fps = T_FRAMES / sorted(run_batched() for _ in range(3))[1]
    mfu_batched = (batched_fps * flops_per_frame / peak
                   if flops_per_frame and peak else None)

    # ── int8 serving mode (models/quant.py): same fused path, U-Net
    # post-training-quantized (YOLO stays bf16).  Same fetch-forced
    # protocol; physics-checked against the chip's INT8 peak (2x bf16) —
    # the MAC count per frame is unchanged ────────────────────────────────
    pipe_q = GlottalPipelines(unet_variables=uvars, yolo_variables=yvars,
                              dtype=jnp.bfloat16, quant="int8")
    pipe_q.calibrate(warm[0])
    np.asarray(pipe_q.yolo_unet_areas_gray(jax.device_put(warm[1])))  # compile
    q_serial = []
    for _ in range(3):
        vids = [jax.device_put(_perturb(base[i % N_BASE], rng))
                for i in range(4)]
        jax.block_until_ready(vids)
        t0 = time.perf_counter()
        for g in vids:
            np.asarray(pipe_q.yolo_unet_areas_gray(g))
        q_serial.append((time.perf_counter() - t0) / len(vids))
    int8_serial_fps = T_FRAMES / sorted(q_serial)[1]

    def run_pipelined_q() -> float:
        vids = [jax.device_put(_perturb(base[i % N_BASE], rng))
                for i in range(N_VIDEOS)]
        jax.block_until_ready(vids)
        t0 = time.perf_counter()
        outs = [pipe_q.yolo_unet_areas_gray(g) for g in vids]
        for o in outs:
            np.asarray(o)
        return (time.perf_counter() - t0) / len(vids)

    int8_pipelined_fps = T_FRAMES / sorted(run_pipelined_q()
                                           for _ in range(3))[1]
    peak8 = next((v for k, v in PEAK_INT8.items()
                  if device_kind.startswith(k)), None)
    mfu_int8 = (int8_pipelined_fps * flops_per_frame / peak8
                if flops_per_frame and peak8 else None)

    # int8 + batched cohort dispatch (the fastest serving shape): ONE
    # quantized fused graph per batch of K videos
    pipe_q.yolo_unet_areas_gray_multi(
        [jax.device_put(w) for w in warm[:2]] * (K_BATCH // 2))  # compile

    def run_batched_q() -> float:
        vids = [jax.device_put(_perturb(base[i % N_BASE], rng))
                for i in range(N_VIDEOS)]
        jax.block_until_ready(vids)
        t0 = time.perf_counter()
        for j in range(0, N_VIDEOS, K_BATCH):
            pipe_q.yolo_unet_areas_gray_multi(vids[j:j + K_BATCH])
        return (time.perf_counter() - t0) / N_VIDEOS

    int8_batched_fps = T_FRAMES / sorted(run_batched_q() for _ in range(3))[1]

    # end-to-end pipelined throughput (host->device transfers included);
    # host->device bandwidth through the shared TPU tunnel fluctuates 10-20x
    # with pool contention -> median + worst-of-reps floor
    e2e_times = []
    for _ in range(args.reps):
        vids = [_perturb(base[i % N_BASE], rng) for i in range(N_VIDEOS)]
        e2e_times.append(run_e2e(vids))
    dt = sorted(e2e_times)[len(e2e_times) // 2]
    fps = T_FRAMES * N_VIDEOS / dt
    fps_floor = T_FRAMES * N_VIDEOS / max(e2e_times)

    # trackers: chip-attributable = device-resident gray input, full
    # per-video compute (detect + gate + tracker; areas come back as host
    # arrays — inherently fetch-forced); realistic synthetic content
    # (fixpoint convergence is content-dependent), distinct per rep.
    # These ARE the production APIs: guided-vft runs the fused one-dispatch
    # graph (_fused_ygvft_video), vft the two-dispatch form its host-side
    # crop-size lock requires.
    vft_run = pipe.vft_areas_gray
    ygvft_run = pipe.guided_vft_areas_gray

    def run_tracker(fn) -> float:
        times = []
        for r in range(2):
            vids_dev = [jax.device_put(_perturb(b, rng)) for b in base[:2]]
            jax.block_until_ready(vids_dev)
            t0 = time.perf_counter()
            for gd in vids_dev:
                fn(gd)
            times.append((time.perf_counter() - t0) / len(vids_dev))
        return T_FRAMES / min(times)

    warm_dev = jax.device_put(base[0])
    vft_run(warm_dev)
    ygvft_run(warm_dev)
    vft_fps = run_tracker(vft_run)
    ygvft_fps = run_tracker(ygvft_run)

    # guided-vft cohort serving: ONE fused graph per batch of K videos
    # (_fused_ygvft_multi — shared detection chunks, vmapped gate scans,
    # flattened tracker tail); the relay round-trip is paid per batch.
    # Outputs come back as host arrays inside the call (fetch-forced).
    pipe.guided_vft_areas_gray_multi(
        [jax.device_put(w) for w in warm[:2]] * (K_BATCH // 2))  # compile

    def run_ygvft_batched() -> float:
        vids = [jax.device_put(_perturb(base[i % N_BASE], rng))
                for i in range(K_BATCH)]
        jax.block_until_ready(vids)
        t0 = time.perf_counter()
        pipe.guided_vft_areas_gray_multi(vids)
        return (time.perf_counter() - t0) / K_BATCH

    ygvft_batched_fps = T_FRAMES / min(run_ygvft_batched() for _ in range(2))

    # tunnel bandwidth this run happened to get (observed 0.07-2 GB/s)
    vids = [_perturb(base[i % N_BASE], rng) for i in range(4)]
    t0 = time.perf_counter()
    jax.block_until_ready([jax.device_put(v) for v in vids])
    mbps = sum(v.nbytes for v in vids) / (time.perf_counter() - t0) / 1e6

    baseline_fps = 35.0  # reference full pipeline, M-series MPS
    # headline = the chip-attributable serial fetch-forced number; the
    # end-to-end figure includes host->device transfers whose bandwidth is
    # set by the shared relay tunnel (observed 0.03-2 GB/s), not the chip
    print(json.dumps({
        "metric": "yolo_unet_frames_per_sec_per_chip",
        "value": round(serial_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(serial_fps / baseline_fps, 2),
        # serial latency rides the shared relay's per-dispatch round-trip,
        # which swings with pool contention — the spread makes that visible
        # (the pipelined figures amortise it and are stable run-to-run)
        "serial_fps_spread": serial_spread,
        "pipelined_fps": round(pipelined_fps, 1),
        "mfu_pipelined": (round(mfu_pipelined, 4)
                          if mfu_pipelined is not None else None),
        "batched_fps": round(batched_fps, 1),
        "mfu_batched": (round(mfu_batched, 4)
                        if mfu_batched is not None else None),
        "int8_serial_fps": round(int8_serial_fps, 1),
        "int8_pipelined_fps": round(int8_pipelined_fps, 1),
        "int8_batched_fps": round(int8_batched_fps, 1),
        "mfu_int8": round(mfu_int8, 4) if mfu_int8 is not None else None,
        "e2e_fps": round(fps, 1),
        "e2e_floor_fps": round(fps_floor, 1),
        "vft_fps": round(vft_fps, 1),
        "guided_vft_fps": round(ygvft_fps, 1),
        "guided_vft_batched_fps": round(ygvft_batched_fps, 1),
        "flops_per_frame": (round(flops_per_frame)
                            if flops_per_frame else None),
        "device_kind": device_kind,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "h2d_bandwidth_MBps": round(mbps, 1),
        "weights": weights_kind,
    }))


if __name__ == "__main__":
    main()
