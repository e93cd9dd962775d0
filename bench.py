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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import gc
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

A100_REFERENCE_REQUEST_S = 21.1

PROMPT_LEN = 128
NEW_TOKENS = 150
STEPS = 40


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
    params = model.init(rng, ids[:, :8])
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


STAGE_BUDGET_S = 1500  # per-stage wall budget (covers a cold-cache compile)
A100_STAGE_S = {"decode": 3.0, "image": 1.6, "audio": 2.5, "video": 14.0}


def _emit(obj):
    """One flushed JSON line — every emission must survive a driver timeout
    (round-3 failure mode: everything buffered, rc=124 left an empty tail)."""
    import sys

    sys.stdout.write(json.dumps(obj) + "\n")
    sys.stdout.flush()


def _run_stage_subprocess(name: str) -> float:
    """Each stage runs in its own process: HBM starts clean per stage (the
    per-stage-residency serving model — on the v5e-8 target each decoder
    owns its chips) and one stage's allocator state can't destabilize the
    next (co-resident sequential runs crashed the TPU worker).

    stderr is INHERITED (streams live — compile progress and crashes are
    visible in the driver log as they happen); stdout is captured for the
    STAGE_S protocol line. A per-stage wall budget bounds a pathological
    compile so one stage can't eat the whole driver budget silently."""
    import os
    import subprocess
    import sys
    import time as _t

    code = (f"import bench, sys, time; t0=time.perf_counter(); "
            f"s=bench.stage_{name}(); "
            f"sys.stdout.write('STAGE_S=%r WALL_S=%r' "
            f"% (s, time.perf_counter()-t0))")
    t0 = _t.perf_counter()
    try:
        r = subprocess.run([sys.executable, "-c", code], cwd=os.path.dirname(
            os.path.abspath(__file__)), env=dict(os.environ),
            stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
            timeout=STAGE_BUDGET_S)
    except subprocess.TimeoutExpired:
        raise RuntimeError(
            f"stage {name} exceeded its {STAGE_BUDGET_S}s budget "
            f"(likely a cold compile cache — rerun to warm .jax_cache)")
    for line in r.stdout.splitlines():
        if line.startswith("STAGE_S="):
            parts = line.split()
            measured = float(parts[0].split("=", 1)[1])
            wall = float(parts[1].split("=", 1)[1])
            overhead = wall - measured
            _emit({"stage": name, "s": round(measured, 3),
                   "wall_s": round(wall, 1),
                   "setup_compile_s": round(overhead, 1),
                   "cold_cache": overhead > 60.0,
                   "elapsed_total_s": round(_t.perf_counter() - t0, 1)})
            return measured
    raise RuntimeError(f"stage {name} failed rc={r.returncode} "
                       f"(stderr streamed above)")


def main():
    import os
    import subprocess
    import sys

    # Probe the backend in a THROWAWAY process: the parent must never
    # initialize the TPU client (only one process can hold the chip, and
    # the stage subprocesses need it).
    probe = subprocess.run(
        [sys.executable, "-c", "import jax; print(jax.default_backend())"],
        capture_output=True, text=True, env=dict(os.environ))
    on_tpu = probe.stdout.strip().splitlines()[-1] == "tpu" \
        if probe.stdout.strip() else False
    cache = "/root/repo/.jax_cache"
    n_cached = len(os.listdir(cache)) if os.path.isdir(cache) else 0
    _emit({"bench": "start", "backend": "tpu" if on_tpu else "cpu",
           "jax_cache_entries": n_cached,
           "note": "cold cache — stages will spend minutes compiling"
           if n_cached < 10 else "persistent compile cache present"})
    stages = {}
    for name, fn in (("decode", stage_decode), ("image", stage_image),
                     ("audio", stage_audio), ("video", stage_video)):
        if not on_tpu and name != "decode":
            continue  # CPU smoke: the full diffusion stages need the chip
        try:
            stages[name] = _run_stage_subprocess(name) if on_tpu else fn()
        except Exception as e:
            # Emit a best-effort FINAL line from what completed, then stop:
            # a partial number with an explanation beats an empty tail.
            _emit({"stage": name, "error": str(e)[-500:]})
            if stages:
                done = sum(stages.values())
                ref = sum(A100_STAGE_S[k] for k in stages)
                _emit({"metric": f"PARTIAL e2e ({'+'.join(stages)}; "
                                 f"stage '{name}' failed)",
                       "value": round(done, 2), "unit": "s/request",
                       "vs_baseline": round(ref / done, 3),
                       "stages_s": {k: round(v, 2)
                                    for k, v in stages.items()}})
            raise
        gc.collect()
    video_shard_s = None
    if on_tpu:
        try:
            video_shard_s = _run_stage_subprocess("video_shard")
        except Exception as e:
            _emit({"stage": "video_shard", "error": str(e)[-500:],
                   "note": "modeled v5e-8 line omitted; "
                           "single-chip rows stand alone"})

    total = sum(stages.values())
    if on_tpu:
        result = {
            "metric": "e2e any-to-many sec/request (8B int8 decode 150tok + "
                      "SD-1.5 512px + AudioLDM-l 5s + ZeroScope 576x320x16f,"
                      " all 40 steps CFG, 1 chip, per-stage resident)",
            "value": round(total, 2),
            "unit": "s/request",
            "vs_baseline": round(A100_REFERENCE_REQUEST_S / total, 3),
            "stages_s": {k: round(v, 2) for k, v in stages.items()},
            # decode row alongside e2e (r2 review ask): same-stage tok/s
            # and its baseline ratio vs the 125 tok/s A100 target
            "decode_tok_s": round(NEW_TOKENS / stages["decode"], 1),
            "decode_vs_125_target": round(
                NEW_TOKENS / stages["decode"] / 125.0, 3),
            # per-stage-residency v5e-8 serving model (decode + slowest
            # stage; mechanics dryrun-validated in serving/orchestrator.py)
            "modeled_v5e8_request_s": round(
                stages["decode"] + max(v for k, v in stages.items()
                                       if k != "decode"), 2),
        }
        if video_shard_s is not None:
            # v5e-8 with the video denoise ALSO mesh-sharded (cfg=2 x sp=4,
            # tests/test_sharded_video.py + dryrun-validated; stage time
            # modeled from the measured per-shard step on this chip —
            # docs/video_speed_of_light.md)
            sharded = stages["decode"] + max(
                [v for k, v in stages.items()
                 if k not in ("decode", "video")] + [video_shard_s])
            result["modeled_v5e8_sharded_video_stage_s"] = round(
                video_shard_s, 2)
            result["modeled_v5e8_sharded_request_s"] = round(sharded, 2)
            result["modeled_v5e8_vs_baseline"] = round(
                A100_REFERENCE_REQUEST_S / sharded, 3)
    else:
        result = {
            "metric": "e2e decode stage sec (CPU smoke proxy)",
            "value": round(total, 2), "unit": "s", "vs_baseline": 0.0,
        }
    _emit(result)


if __name__ == "__main__":
    main()
