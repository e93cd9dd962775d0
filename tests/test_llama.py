import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spider_tpu.models import llama as L
from spider_tpu.models.decode import GenerateConfig, generate
from spider_tpu.models.tokenizer import (
    DEFAULT_MODALITY_TOKENS, TinyTokenizer, extend_tokenizer)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = L.llama_tiny()
    model = L.LlamaForCausalLM(cfg)
    ids = jnp.array([[1, 5, 9, 3]])
    params = model.init(jax.random.PRNGKey(0), ids)
    return cfg, model, params


def test_forward_shapes_and_hidden_states(tiny_model):
    cfg, model, params = tiny_model
    ids = jnp.array([[1, 5, 9, 3, 7]])
    logits, hidden, cache = model.apply(params, ids, output_hidden_states=True)
    assert logits.shape == (1, 5, cfg.vocab_size)
    assert hidden.shape == (cfg.num_hidden_layers + 1, 1, 5, cfg.hidden_size)
    assert cache is None
    # hidden[0] is the input embeddings
    emb = model.apply(params, ids, method=model.embed)
    np.testing.assert_allclose(np.asarray(hidden[0]), np.asarray(emb), rtol=1e-6)


@pytest.mark.slow
def test_kv_cache_decode_matches_full_forward(tiny_model):
    cfg, model, params = tiny_model
    B, T = 2, 7
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)
    full_logits, _, _ = model.apply(params, ids)

    # prefill first 5, then decode tokens 5, 6 one at a time
    cache = L.init_kv_cache(cfg, B, 16, dtype=jnp.float32)
    prompt_len = jnp.array([5, 5], dtype=jnp.int32)
    logits_p, _, cache = model.apply(
        params, ids[:, :5], positions=jnp.arange(5)[None, :],
        kv_write_index=0, kv_cache=cache, kv_len=prompt_len)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full_logits[:, :5]),
                               rtol=2e-3, atol=2e-3)
    for t in range(5, 7):
        kv_len = jnp.array([t, t], dtype=jnp.int32)
        logits_t, _, cache = model.apply(
            params, ids[:, t:t + 1], positions=kv_len[:, None],
            kv_write_index=kv_len, kv_cache=cache, kv_len=kv_len + 1)
        np.testing.assert_allclose(
            np.asarray(logits_t[:, 0]), np.asarray(full_logits[:, t]),
            rtol=2e-3, atol=2e-3)


def test_ragged_batch_decode(tiny_model):
    """Right-padded prompts with different lengths decode correctly."""
    cfg, model, params = tiny_model
    ids_a = jnp.array([[4, 8, 15, 16, 23]])
    ids_b = jnp.array([[42, 7, 0, 0, 0]])  # true length 2
    batch = jnp.concatenate([ids_a, ids_b], axis=0)
    emb = model.apply(params, batch, method=model.embed)
    out = generate(model, params, emb, jnp.array([5, 2], dtype=jnp.int32),
                   GenerateConfig(max_new_tokens=4))
    # sample b must match an unpadded single run
    emb_b = model.apply(params, ids_b[:, :2], method=model.embed)
    out_b = generate(model, params, emb_b, jnp.array([2], dtype=jnp.int32),
                     GenerateConfig(max_new_tokens=4))
    np.testing.assert_array_equal(np.asarray(out["tokens"][1]),
                                  np.asarray(out_b["tokens"][0]))


def test_generate_greedy_deterministic_and_stops(tiny_model):
    cfg, model, params = tiny_model
    ids = jnp.array([[1, 5, 9]])
    emb = model.apply(params, ids, method=model.embed)
    plen = jnp.array([3], dtype=jnp.int32)
    out1 = generate(model, params, emb, plen, GenerateConfig(max_new_tokens=6))
    out2 = generate(model, params, emb, plen, GenerateConfig(max_new_tokens=6))
    np.testing.assert_array_equal(np.asarray(out1["tokens"]), np.asarray(out2["tokens"]))
    assert out1["tokens"].shape == (1, 6)
    assert out1["step_hidden"].shape == (5, 1, 1, cfg.hidden_size)

    # Force the first generated token to be an eos -> everything else pad.
    first = int(out1["tokens"][0, 0])
    out3 = generate(model, params, emb, plen,
                    GenerateConfig(max_new_tokens=6, eos_ids=(first,), pad_id=0))
    np.testing.assert_array_equal(np.asarray(out3["tokens"][0, 1:]), 0)


def test_lora_params_created_and_grad_only_lora():
    cfg = L.llama_tiny(lora_r=4)
    model = L.LlamaForCausalLM(cfg)
    ids = jnp.array([[1, 2, 3]])
    params = model.init(jax.random.PRNGKey(0), ids)
    flat = jax.tree_util.tree_leaves_with_path(params)
    lora_keys = [jax.tree_util.keystr(p) for p, _ in flat if "lora" in jax.tree_util.keystr(p)]
    assert lora_keys, "expected lora params"
    # lora_b zero-init => forward equals base model at init
    cfg0 = L.llama_tiny(lora_r=0)
    model0 = L.LlamaForCausalLM(cfg0)
    params0 = model0.init(jax.random.PRNGKey(0), ids)

    logits, _, _ = model.apply(params, ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_cross_entropy_loss_masking():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.array([[-100, 2, -100, 3]])
    loss, acc = L.cross_entropy_loss(logits, labels)
    assert float(loss) == pytest.approx(np.log(8), rel=1e-5)
    # Perfect logits -> zero loss, acc 1
    perfect = jnp.full((1, 4, 8), -20.0)
    perfect = perfect.at[0, 0, 2].set(20.0).at[0, 2, 3].set(20.0)
    loss2, acc2 = L.cross_entropy_loss(perfect, labels)
    assert float(loss2) == pytest.approx(0.0, abs=1e-5)
    assert float(acc2) == pytest.approx(1.0)


def test_tiny_tokenizer_roundtrip_and_extension():
    tok = TinyTokenizer()
    idxs = extend_tokenizer(tok, bbox_bins=10)
    assert set(idxs) == set(DEFAULT_MODALITY_TOKENS)
    assert len(idxs["IMAGE"]) == 4
    assert len(idxs["VIDEO"]) == 24
    text = "hello [IMAGE0] world <IMAGE>cat</IMAGE> [END]"
    ids = tok(text, add_special_tokens=False).input_ids
    assert idxs["IMAGE"][0] in ids
    assert tok.decode(ids) == text
    assert tok.decode(tok("héllo", add_special_tokens=False).input_ids) == "héllo"
    # specials skipped on request
    ids2 = tok("hi", add_special_tokens=True).input_ids
    assert tok.decode(ids2, skip_special_tokens=True) == "hi"
    # added tokens are single ids
    one = tok("[INPUT]", add_special_tokens=False).input_ids
    assert len(one) == 1


def test_clip_bpe_tokenizer(tmp_path):
    import gzip

    from spider_tpu.models.clip_tokenizer import CLIPTokenizer

    merges = ["#version: test"]
    merges += ["h e", "l l", "ll o</w>", "he llo</w>",
               "w o", "r l", "wo rl", "worl d</w>"]
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write("\n".join(merges))
    tok = CLIPTokenizer(str(path))
    ids = tok("hello world", add_special_tokens=True).input_ids
    assert ids[0] == tok.bos_token_id and ids[-1] == tok.eos_token_id
    assert tok.decode(ids) == "hello world"
    # merged tokens are single ids where merges apply
    hello_ids = tok.encode("hello", add_special_tokens=False)
    assert len(hello_ids) == 1
    # batch API
    out = tok(["a cat", "a dog"], add_special_tokens=False)
    assert len(out.input_ids) == 2


def test_stream_generate_matches_batch(tiny_model):
    from spider_tpu.models.decode import stream_generate

    cfg, model, params = tiny_model
    ids = jnp.array([[1, 5, 9]])
    emb = model.apply(params, ids, method=model.embed)
    plen = jnp.array([3], dtype=jnp.int32)
    batch = generate(model, params, emb, plen, GenerateConfig(max_new_tokens=5))
    streamed = list(stream_generate(model, params, emb, plen,
                                    GenerateConfig(max_new_tokens=5)))
    np.testing.assert_array_equal(np.asarray(batch["tokens"][0]),
                                  np.asarray(streamed))


def test_gradcam_overlay():
    from spider_tpu.common.gradcam import get_att_map

    img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    att = np.random.default_rng(1).random((8, 8)).astype(np.float32)
    out = get_att_map(img, att)
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_remat_flag_matches_forward_and_grads():
    import dataclasses

    cfg = L.llama_tiny(vocab_size=64)
    rcfg = dataclasses.replace(cfg, remat=True)
    model = L.LlamaForCausalLM(cfg)
    rmodel = L.LlamaForCausalLM(rcfg)
    ids = jnp.array([[1, 5, 9, 3]])
    params = model.init(jax.random.PRNGKey(0), ids)
    a, _, _ = model.apply(params, ids)
    b, _, _ = rmodel.apply(params, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)

    def loss(m):
        def f(p):
            logits, _, _ = m.apply(p, ids)
            return jnp.sum(logits.astype(jnp.float32) ** 2)
        return jax.grad(f)(params)

    ga = jax.tree_util.tree_leaves(loss(model))
    gb = jax.tree_util.tree_leaves(loss(rmodel))
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4,
                                   atol=1e-4)


@pytest.mark.slow  # 18s; serving spec-decode test is the fast representative
def test_prompt_lookup_speculative_matches_greedy():
    """Speculative decode commits the EXACT greedy stream (speculation
    changes latency, never results) — repetitive prompt so the n-gram
    drafts actually accept."""
    import numpy as np

    from spider_tpu.models.decode import GenerateConfig, generate
    from spider_tpu.models.speculative import (PromptLookupConfig,
                                               speculative_generate)

    cfg = L.llama_tiny(vocab_size=64)
    model = L.LlamaForCausalLM(cfg)
    ids = [3, 9, 4, 7, 3, 9, 4, 7, 3, 9]   # repeating 4-gram
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray([ids], jnp.int32))

    N = 24
    embeds = model.apply(params, jnp.asarray([ids], jnp.int32),
                         method=model.embed)
    ref = generate(model, params, embeds,
                   jnp.asarray([len(ids)], jnp.int32),
                   GenerateConfig(max_new_tokens=N, temperature=0.0,
                                  eos_ids=(63,), pad_id=0))
    ref_toks = [int(t) for t in np.asarray(ref["tokens"][0])]
    if 63 in ref_toks:
        ref_toks = ref_toks[:ref_toks.index(63) + 1]

    for gamma in (2, 4, 8):
        got = speculative_generate(
            model, params, ids,
            PromptLookupConfig(max_new_tokens=N, gamma=gamma,
                               eos_ids=(63,), pad_id=0))
        assert got[:len(ref_toks)] == ref_toks, (gamma, got, ref_toks)


def test_prompt_lookup_propose():
    from spider_tpu.models.speculative import propose

    seq = [1, 2, 3, 9, 8, 1, 2, 3]
    assert propose(seq, 2, 3, 0) == [9, 8]     # 3-gram [1,2,3] -> 9,8
    assert propose([5, 6, 7], 3, 3, 0) == [0, 0, 0]  # no repeat -> pads
    assert propose([4, 4], 2, 3, 0) == [4, 0]  # 1-gram fallback


@pytest.mark.slow  # 27s; draft-source stream invariance is the fast gate
def test_speculative_ondevice_matches_host_loop():
    """The single-dispatch while_loop form commits the exact same stream
    as the host-driven speculative loop (which itself equals stepped
    greedy, asserted above)."""
    import numpy as np

    from spider_tpu.models.speculative import (PromptLookupConfig,
                                               speculative_generate,
                                               speculative_generate_ondevice)

    cfg = L.llama_tiny(vocab_size=64)
    model = L.LlamaForCausalLM(cfg)
    ids = [3, 9, 4, 7, 3, 9, 4, 7, 3, 9]
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray([ids], jnp.int32))

    for gamma in (2, 4, 8):
        pc = PromptLookupConfig(max_new_tokens=24, gamma=gamma,
                                eos_ids=(63,), pad_id=0)
        host = speculative_generate(model, params, ids, pc)
        dev = speculative_generate_ondevice(model, params, ids, pc)
        assert dev == host, (gamma, dev, host)


def test_speculative_draft_source_never_changes_stream():
    """Verification is exact greedy, so ANY draft source (n-gram table,
    oracle, corrupted oracle, garbage) must commit the identical stream —
    the invariant that lets bench_suite measure the tok/s-vs-acceptance
    curve honestly."""
    from spider_tpu.models.speculative import (PromptLookupConfig,
                                               speculative_generate_ondevice)

    cfg = L.llama_tiny(vocab_size=64)
    model = L.LlamaForCausalLM(cfg)
    ids = [3, 9, 4, 7, 3, 9, 4, 7, 3, 9]
    params = model.init(jax.random.PRNGKey(1), jnp.asarray([ids], jnp.int32))
    pc = PromptLookupConfig(max_new_tokens=20, gamma=4, eos_ids=(63,))
    ref = speculative_generate_ondevice(model, params, ids, pc)
    for kw in (dict(oracle=ref), dict(oracle=ref, corrupt_every=2),
               dict(oracle=[0] * 20), dict(oracle=list(range(20)))):
        got = speculative_generate_ondevice(model, params, ids, pc, **kw)
        assert got == ref, (kw, got, ref)
