"""Headline benchmark: ONE SpiderFree any-to-many request, end-to-end.

This is BASELINE.json's stated metric ("e2e any-to-many sec/request"; north
star: "one SpiderFree request (text+image+audio+video out) served ... at
>=2x A100 reference latency parity"). The request mirrors the reference
demo flow (qwen2.5omni_spider_web.py predict -> SpiderDecoder dispatch):

  stage 1  8B-architecture decode of the tagged answer (int8 weight-only,
           128-token prompt -> 150 new tokens, jitted prefill+scan)
  stage 2  SD-1.5   512px, 40 steps, CFG  (image)
  stage 3  AudioLDM-l 5.0 s, 40 steps, CFG (audio)
  stage 4  ZeroScope 576x320, 16 frames, 40 steps, CFG (video)

All four run at the reference operating points (BASELINE.md) with REAL
shapes/architectures (random init — weight values don't change the math
executed per step). Stages are measured warm (compile excluded) and
sequentially on this host's ONE chip, with each stage's params resident
only for its stage: the deployment target (v5e-8, north star) keeps every
decoder resident on its own chips, so per-stage residency — not 16-GB
single-chip co-residency — is the serving configuration; the conditioning
handoff between stages is a few KB.

vs_baseline: reference stack latency for the same request on A100-80G,
modeled per stage from its observable operating points and GENEROUS to the
reference (warm resident fp16 pipelines; its actual code re-instantiates
diffusion pipelines per request via .from_pretrained,
spider/models/spider.py:432,448,456, which alone adds tens of seconds):
  decode: 150 tok @ 50 tok/s (HF transformers fp16 8B bs=1; eager
          measures 30-40, we grant 50)                             = 3.0 s
  image:  40 steps @ 25 it/s (diffusers SD-1.5 512px fp16 CFG,
          the commonly reported A100 rate)                         = 1.6 s
  audio:  AudioLDM-l 5 s, 40 steps                                 = 2.5 s
  video:  ZeroScope 40 steps. Grounded two ways: (a) SD-rate
          scaling — 16 frames x 0.7 area + temporal layers
          ~= 14.6 SD-image-equivalents x 42 ms => ~0.61 s/step;
          (b) community A100 reports for the 24-frame default,
          ~0.5 s/step, scaled by 16/24 => ~0.33 s/step. We grant
          the generous end, 0.35 s/step                            =14.0 s
  total                                                            =21.1 s
vs_baseline = 21.1 / measured_seconds  (>1 = we serve the request faster
per chip than the A100 reference stack).

DRIVER-SURVIVAL CONTRACT (rounds 3+4 both died rc=124 with an unparseable
tail — see VERDICT.md r4 Weak #1):
  * a cumulative {"metric", "value", "unit", "vs_baseline", "stages_s"}
    line is re-emitted (flushed) after EVERY completed stage, so the last
    stdout line is parseable no matter when an external timeout kills us;
  * TOTAL wall is capped (SPIDER_BENCH_BUDGET_S, default 1500 s): stages
    that don't fit the remaining budget are skipped with an explanatory
    field. The cap is a SELF-limit for tidy exits only — the per-stage
    cumulative lines above mean an external kill at ANY instant still
    leaves a parseable tail, so the default errs long: relay-side compile
    caching is erratic (measured 2026-08-20: the UNet3D denoise recompiled
    285-600 s in consecutive runs despite a warm local cache — the axon
    remote-compile cache, not ours, decides warmth), and self-capping at
    540 s wasted driver budget whenever the driver allowed more;
  * stage stderr goes to files under output/bench_logs/ (NOT the driver
    tail — round-4's tail was flooded by XLA:CPU AOT mismatch spam);
  * the compile cache is keyed by a machine fingerprint
    (spider_tpu/common/cache.py), so entries compiled on another machine
    are invisible instead of producing load errors;
  * exit code is 0 whenever at least the decode stage produced a number.
"""

import gc
import json
import os
import sys
import time

import jax

from spider_tpu.common.cache import setup_compilation_cache

setup_compilation_cache()
import jax.numpy as jnp

A100_REFERENCE_REQUEST_S = 21.1

PROMPT_LEN = 128
NEW_TOKENS = 150
STEPS = 40

BUDGET_S = float(os.environ.get("SPIDER_BENCH_BUDGET_S", "1500"))
# Skip a stage rather than start it with less than this much wall left:
# TPU client init through the axon tunnel alone is ~15-30 s.
MIN_STAGE_S = float(os.environ.get("SPIDER_BENCH_MIN_STAGE_S", "60"))
LOG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "output", "bench_logs")

_T0 = time.perf_counter()


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - _T0)


def fence(x):
    import numpy as np

    return np.asarray(x)


def stage_decode():
    import dataclasses

    from spider_tpu.models import llama as L
    from spider_tpu.models.decode import GenerateConfig, make_generate_fn

    cfg = dataclasses.replace(L.llama3_8b(), quantization="int8",
                              param_dtype=jnp.bfloat16)
    if jax.default_backend() != "tpu":
        # CPU smoke: shrink so the bench script stays runnable anywhere.
        cfg = dataclasses.replace(cfg, hidden_size=256, intermediate_size=512,
                                  num_hidden_layers=2, num_attention_heads=4,
                                  num_key_value_heads=2, vocab_size=1024)
    model = L.LlamaForCausalLM(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((1, PROMPT_LEN), jnp.int32)
    # on-device pool init instead of flax init: the 8B initializer program
    # is the slowest part of this stage's setup, and weight VALUES don't
    # change the per-step math (weight-only int8; MXU cost is
    # data-independent).
    from spider_tpu.models.factory import random_params_like

    params = random_params_like(model, rng, ids[:, :8], on_device=True)
    gen = make_generate_fn(model, GenerateConfig(max_new_tokens=NEW_TOKENS,
                                                 temperature=0.0))
    embeds = model.apply(params, ids, method=model.embed)
    plen = jnp.full((1,), PROMPT_LEN, jnp.int32)
    out = gen(params, embeds, plen, rng)
    fence(out["tokens"])  # compile+warm
    t0 = time.perf_counter()
    out = gen(params, embeds, plen, jax.random.PRNGKey(1))
    fence(out["tokens"])
    return time.perf_counter() - t0


def stage_image():
    from spider_tpu.models.factory import from_pretrained

    pipe = from_pretrained("sd15", None)
    cap = ["A running horse on a beach"]
    pipe(prompt=cap, num_inference_steps=STEPS, guidance_scale=7.5)
    t0 = time.perf_counter()
    img = pipe(prompt=cap, num_inference_steps=STEPS, guidance_scale=7.5,
               rng=jax.random.PRNGKey(1))
    fence(img)
    return time.perf_counter() - t0


def stage_audio():
    from spider_tpu.models.factory import from_pretrained

    pipe = from_pretrained("audioldm", None)
    cap = ["galloping hooves on sand"]
    pipe(prompt=cap, num_inference_steps=STEPS, audio_length_in_s=5.0)
    t0 = time.perf_counter()
    wave = pipe(prompt=cap, num_inference_steps=STEPS, audio_length_in_s=5.0,
                rng=jax.random.PRNGKey(1))
    fence(wave)
    return time.perf_counter() - t0


def stage_video():
    from spider_tpu.models.factory import from_pretrained

    pipe = from_pretrained("zeroscope", None)
    cap = ["a horse running on a beach"]
    kw = dict(height=320, width=576, num_frames=16)
    pipe(prompt=cap, num_inference_steps=STEPS, **kw)
    t0 = time.perf_counter()
    frames = pipe(prompt=cap, num_inference_steps=STEPS,
                  rng=jax.random.PRNGKey(1), **kw)
    fence(frames)
    return time.perf_counter() - t0


def stage_video_shard():
    """Per-shard workload of the mesh-sharded video denoise (cfg=2 x sp=4;
    pipelines/vd.py::_denoise_fn_sharded, docs/video_speed_of_light.md):
    returns the MODELED 8-way video stage seconds from the measured
    per-shard UNet3D step + VAE share on this chip."""
    import bench_suite

    row = bench_suite.bench_video_shard(n_steps=STEPS)
    return float(row["modeled_v5e8_video_stage_s"])


A100_STAGE_S = {"decode": 3.0, "image": 1.6, "audio": 2.5, "video": 14.0}
# Order by reference-stage share (video 14 s > decode 3 > audio 2.5 >
# image 1.6): stage setup through the axon relay has minutes-level
# VARIANCE (decode setup measured 65 s and 363 s on back-to-back warm
# runs), so when the budget dies early the PARTIAL line should already
# carry the stages that dominate the request.
STAGE_ORDER = ("video", "decode", "audio", "image")


def _emit(obj):
    """One flushed JSON line — every emission must survive a driver timeout
    (round-3 failure mode: everything buffered, rc=124 left an empty tail)."""
    sys.stdout.write(json.dumps(obj) + "\n")
    sys.stdout.flush()


def _emit_cumulative(stages, skipped, final=False, video_shard_s=None):
    """The always-parseable headline line. Re-emitted after every completed
    stage so the tail carries a result no matter when the driver kills us."""
    if not stages:
        return
    total = sum(stages.values())
    ref = sum(A100_STAGE_S[k] for k in stages)
    complete = all(k in stages for k in STAGE_ORDER)
    name = ("e2e any-to-many sec/request (8B int8 decode 150tok + SD-1.5 "
            "512px + AudioLDM-l 5s + ZeroScope 576x320x16f, all 40 steps "
            "CFG, 1 chip, per-stage resident)" if complete else
            f"PARTIAL e2e sec/request ({'+'.join(stages)}; "
            f"vs_baseline is ratio over the same stages)")
    result = {
        "metric": name,
        "value": round(total, 2),
        "unit": "s/request",
        "vs_baseline": round(ref / total, 3),
        "stages_s": {k: round(v, 2) for k, v in stages.items()},
        "elapsed_s": round(time.perf_counter() - _T0, 1),
        "budget_s": BUDGET_S,
    }
    if skipped:
        result["skipped"] = skipped
    if "decode" in stages:
        result["decode_tok_s"] = round(NEW_TOKENS / stages["decode"], 1)
        result["decode_vs_125_target"] = round(
            NEW_TOKENS / stages["decode"] / 125.0, 3)
    if complete:
        # per-stage-residency v5e-8 serving model (decode + slowest stage;
        # mechanics dryrun-validated in serving/orchestrator.py)
        result["modeled_v5e8_request_s"] = round(
            stages["decode"] + max(v for k, v in stages.items()
                                   if k != "decode"), 2)
    if video_shard_s is not None and complete:
        # v5e-8 with the video denoise ALSO mesh-sharded (cfg=2 x sp=4,
        # tests/test_sharded_video.py + dryrun-validated; stage time modeled
        # from the measured per-shard step — docs/video_speed_of_light.md)
        sharded = stages["decode"] + max(
            [v for k, v in stages.items()
             if k not in ("decode", "video")] + [video_shard_s])
        result["modeled_v5e8_sharded_video_stage_s"] = round(video_shard_s, 2)
        result["modeled_v5e8_sharded_request_s"] = round(sharded, 2)
        result["modeled_v5e8_vs_baseline"] = round(
            A100_REFERENCE_REQUEST_S / sharded, 3)
    if not final:
        result["progress"] = True
    _emit(result)


def _run_stage_subprocess(name: str, timeout_s: float) -> float:
    """Each stage runs in its own process: HBM starts clean per stage (the
    per-stage-residency serving model — on the v5e-8 target each decoder
    owns its chips) and one stage's allocator state can't destabilize the
    next (co-resident sequential runs crashed the TPU worker).

    stderr goes to output/bench_logs/<stage>.stderr — NOT inherited: the
    round-4 driver tail was flooded by XLA stderr spam, which pushed every
    JSON line out of the capture window."""
    import subprocess

    os.makedirs(LOG_DIR, exist_ok=True)
    errpath = os.path.join(LOG_DIR, f"{name}.stderr")
    code = (f"import bench, sys, time; t0=time.perf_counter(); "
            f"s=bench.stage_{name}(); "
            f"sys.stdout.write('STAGE_S=%r WALL_S=%r' "
            f"% (s, time.perf_counter()-t0))")
    env = dict(os.environ)
    env.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    t0 = time.perf_counter()
    with open(errpath, "w") as errf:
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                cwd=os.path.dirname(os.path.abspath(__file__)), env=env,
                stdout=subprocess.PIPE, stderr=errf, text=True,
                timeout=timeout_s)
        except subprocess.TimeoutExpired:
            raise RuntimeError(
                f"stage {name} exceeded its {timeout_s:.0f}s slice of the "
                f"{BUDGET_S:.0f}s budget (cold compile cache; see "
                f"{errpath})")
    for line in r.stdout.splitlines():
        if line.startswith("STAGE_S="):
            parts = line.split()
            measured = float(parts[0].split("=", 1)[1])
            wall = float(parts[1].split("=", 1)[1])
            overhead = wall - measured
            _emit({"stage": name, "s": round(measured, 3),
                   "wall_s": round(wall, 1),
                   "setup_compile_s": round(overhead, 1),
                   "cold_cache": overhead > 60.0})
            return measured
    tail = ""
    try:
        with open(errpath) as f:
            tail = f.read()[-400:].replace("\n", " | ")
    except OSError:
        pass
    raise RuntimeError(f"stage {name} failed rc={r.returncode}: {tail}")


def main():
    import subprocess

    # Probe the backend in a THROWAWAY process: the parent must never
    # initialize the TPU client (only one process can hold the chip, and
    # the stage subprocesses need it).
    os.makedirs(LOG_DIR, exist_ok=True)
    with open(os.path.join(LOG_DIR, "probe.stderr"), "w") as errf:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            stdout=subprocess.PIPE, stderr=errf, text=True,
            env=dict(os.environ), timeout=max(120.0, BUDGET_S / 4))
    on_tpu = probe.stdout.strip().splitlines()[-1] == "tpu" \
        if probe.stdout.strip() else False
    cache = jax.config.jax_compilation_cache_dir
    n_cached = len(os.listdir(cache)) if os.path.isdir(cache) else 0
    _emit({"bench": "start", "backend": "tpu" if on_tpu else "cpu",
           "budget_s": BUDGET_S, "jax_cache_entries": n_cached,
           "jax_cache_dir": os.path.basename(cache),
           "note": "cold machine-keyed cache — stages compile fresh"
           if n_cached < 10 else "persistent compile cache present"})
    if not on_tpu:
        # No chip: one clear line, fast CPU smoke of the decode stage only.
        try:
            s = stage_decode()
            _emit({"metric": "CPU smoke: tiny decode stage sec (no TPU "
                             "visible; real bench requires the chip)",
                   "value": round(s, 2), "unit": "s", "vs_baseline": 0.0})
        except Exception as e:  # noqa: BLE001
            _emit({"metric": "no TPU visible and CPU smoke failed",
                   "value": 0.0, "unit": "s", "vs_baseline": 0.0,
                   "error": str(e)[-300:]})
        return 0

    stages, skipped = {}, {}
    for name in STAGE_ORDER:
        left = _remaining()
        if left < MIN_STAGE_S:
            skipped[name] = f"budget exhausted ({left:.0f}s left)"
            continue
        try:
            # Per-stage slice cap: one relay-degraded compile (image once
            # took 1586 s) must not starve every later stage. 650 s covers
            # the worst NORMAL cold compile observed (video ~600 s).
            stages[name] = _run_stage_subprocess(
                name, timeout_s=min(left, 650.0))
        except Exception as e:  # noqa: BLE001
            skipped[name] = str(e)[-300:]
            _emit({"stage": name, "error": str(e)[-300:]})
        gc.collect()
        _emit_cumulative(stages, skipped)

    video_shard_s = None
    if all(k in stages for k in STAGE_ORDER) and _remaining() > MIN_STAGE_S:
        try:
            video_shard_s = _run_stage_subprocess("video_shard",
                                                  timeout_s=_remaining())
        except Exception as e:  # noqa: BLE001
            _emit({"stage": "video_shard", "error": str(e)[-300:],
                   "note": "modeled v5e-8 line omitted; "
                           "single-chip rows stand alone"})
    _emit_cumulative(stages, skipped, final=True, video_shard_s=video_shard_s)
    return 0 if stages else 1


if __name__ == "__main__":
    sys.exit(main())
