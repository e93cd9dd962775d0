"""Headline benchmark: 8B-architecture decode throughput per chip.

Runs the DeepSeek-R1-Distill-Llama-8B architecture (llama3_8b preset) with
int8 weight-only quantization (fits a single 16-GB v5e chip; decode is
HBM-bandwidth-bound so int8 halves the bytes/token) through the real jitted
prefill+scan-decode path and reports tokens/sec/chip.

vs_baseline compares against the reference deployment's hardware envelope:
an A100-80G serving the same 8B in fp16 is bounded by weights(16 GB) /
HBM-BW(2.0 TB/s) = 125 tokens/s/chip speed-of-light; the reference stack
(HF transformers generate, no batching) achieves well under that, so this is
a conservative denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


A100_8B_FP16_SOL_TOKENS_PER_S = 125.0

MAX_NEW_TOKENS = 128
PROMPT_LEN = 128


def main():
    import dataclasses
    from spider_tpu.models import llama as L
    from spider_tpu.models.decode import GenerateConfig, make_generate_fn

    on_tpu = jax.default_backend() == "tpu"
    cfg = L.llama3_8b()
    cfg = dataclasses.replace(cfg, quantization="int8",
                              param_dtype=jnp.bfloat16)
    if not on_tpu:
        # CPU smoke: shrink so the bench script stays runnable anywhere.
        cfg = dataclasses.replace(cfg, hidden_size=256, intermediate_size=512,
                                  num_hidden_layers=2, num_attention_heads=4,
                                  num_key_value_heads=2, vocab_size=1024)

    model = L.LlamaForCausalLM(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((1, PROMPT_LEN), jnp.int32)
    params = model.init(rng, ids[:, :8])

    gen_cfg = GenerateConfig(max_new_tokens=MAX_NEW_TOKENS, temperature=0.0)
    gen = make_generate_fn(model, gen_cfg)

    embeds = model.apply(params, ids, method=model.embed)
    plen = jnp.full((1,), PROMPT_LEN, jnp.int32)

    import numpy as np

    # Compile + warm up. NOTE: device->host transfer is the completion fence;
    # block_until_ready alone under-reports on the axon relay backend.
    out = gen(params, embeds, plen, rng)
    _ = np.asarray(out["tokens"])

    iters = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for i in range(iters):
        out = gen(params, embeds, plen, jax.random.PRNGKey(i))
        _ = np.asarray(out["tokens"])
    dt = (time.perf_counter() - t0) / iters

    tokens_per_s = MAX_NEW_TOKENS / dt
    result = {
        "metric": "8B decode tokens/sec/chip (int8 weight-only, bs=1)"
                  if on_tpu else
                  "decode tokens/sec/chip (CPU smoke proxy, bs=1)",
        "value": round(tokens_per_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tokens_per_s / A100_8B_FP16_SOL_TOKENS_PER_S, 3)
                       if on_tpu else 0.0,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
