import jax.numpy as jnp
import numpy as np

from spider_tpu.common.profiler import StepTimer, device_memory_stats
from spider_tpu.conversation.conversation import CONV_VISION, Conversation, SeparatorStyle
from spider_tpu.ops.nms import batched_nms, box_iou, nms


def test_box_iou():
    a = jnp.array([[0, 0, 10, 10]], jnp.float32)
    b = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
    iou = np.asarray(box_iou(a, b))[0]
    assert iou[0] == 1.0
    assert 0.1 < iou[1] < 0.2
    assert iou[2] == 0.0


def test_nms_suppresses_overlaps():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                      jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.asarray(nms(boxes, scores, iou_threshold=0.5, max_outputs=3))
    assert keep[0] == 0 and keep[1] == 2 and keep[2] == -1


def test_batched_nms_keeps_cross_class():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    keep = np.asarray(batched_nms(boxes, scores, jnp.array([0, 1]),
                                  iou_threshold=0.5, max_outputs=2))
    assert set(keep.tolist()) == {0, 1}


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t.step():
            pass
    s = t.summary()
    assert s["steps_per_s"] > 0
    assert isinstance(device_memory_stats(), dict)


def test_conversation_prompt():
    conv = CONV_VISION.copy()
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert p.endswith("Assistant:")
    assert "hi" in p
    chat = conv.to_gradio_chatbot()
    assert chat == [["hi", None]]


def test_temporal_attention_matches_einsum():
    """Masked (head,frame)-folded formulation == per-head einsum, both
    code paths (ops/temporal_attention.py)."""
    import jax.numpy as jnp
    import numpy as np

    from spider_tpu.ops.temporal_attention import temporal_attention

    B, F, P, C, H = 2, 6, 320, 32, 4
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(0, 1, (B, F, P, C)), jnp.float32)
               for _ in range(3))
    ref = temporal_attention(q, k, v, H, use_blockdiag=False)
    out = temporal_attention(q, k, v, H, use_blockdiag=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_temporal_attention_pallas_matches():
    """The Pallas per-pixel-fold kernel == per-head einsum (interpret mode
    on CPU), forward and VJP, including a P not divisible by 8."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spider_tpu.ops.temporal_attention import temporal_attention

    rng = np.random.default_rng(1)
    for B, F, P, C, H in [(2, 6, 320, 32, 4), (1, 16, 45, 64, 8)]:
        q, k, v = (jnp.asarray(rng.normal(0, 1, (B, F, P, C)), jnp.float32)
                   for _ in range(3))
        ref = temporal_attention(q, k, v, H, use_pallas=False)
        out = temporal_attention(q, k, v, H, use_pallas=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        gp = jax.grad(lambda q_: temporal_attention(
            q_, k, v, H, use_pallas=True).sum())(q)
        gr = jax.grad(lambda q_: temporal_attention(
            q_, k, v, H, use_pallas=False).sum())(q)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=2e-4, rtol=1e-4)


def test_paged_attention_kernel_matches():
    """Pallas paged decode attention == gather+einsum reference, ragged
    kv_len across slots, GQA (interpret mode on CPU)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spider_tpu.ops.attention import mha_reference
    from spider_tpu.ops.paged_attention import paged_decode_attention

    B, Hq, Hkv, D, page, MP, NB = 3, 8, 2, 16, 8, 4, 12
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, Hq, D)), jnp.float32)
    pool_k = jnp.asarray(rng.normal(0, 1, (NB, page, Hkv, D)), jnp.float32)
    pool_v = jnp.asarray(rng.normal(0, 1, (NB, page, Hkv, D)), jnp.float32)
    # distinct blocks per slot; slot kv_lens ragged incl. page-boundary
    table = jnp.asarray(rng.permutation(NB)[: B * MP].reshape(B, MP),
                        jnp.int32)
    kv_len = jnp.asarray([5, page * 2, page * MP], jnp.int32)

    out = paged_decode_attention(q, pool_k, pool_v, table, kv_len,
                                 interpret=True)

    gk = pool_k[table].reshape(B, MP * page, Hkv, D)
    gv = pool_v[table].reshape(B, MP * page, Hkv, D)
    ref = mha_reference(q[:, None], gk, gv, causal=False,
                        kv_len=kv_len)[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_upsample_nearest_conv_exact():
    """Coarse-resolution phase-conv upsample == nearest-x2 + SAME 3x3 conv
    (diffusers Upsample2D), incl. odd spatial sizes; param tree matches
    nn.Conv so converted checkpoints are unaffected."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spider_tpu.ops.convs import UpsampleNearestConv

    for (H, W, C, Co) in [(5, 9, 16, 12), (4, 4, 8, 8)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, C))
        m = UpsampleNearestConv(features=Co)
        p = m.init(jax.random.PRNGKey(1), x)
        assert set(p["params"]) == {"kernel", "bias"}
        assert p["params"]["kernel"].shape == (3, 3, C, Co)
        y = m.apply(p, x)
        up = jax.image.resize(x, (2, H * 2, W * 2, C), method="nearest")
        ref = nn.Conv(Co, (3, 3), padding=1).apply(
            {"params": p["params"]}, up)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
