# Long-context Spider training over a context-parallel mesh.
#
# The reference handles long sequences by TRUNCATION only
# (/root/reference/spider/models/spider.py:882-888, max_context_len).
# This config instead shards the sequence over a `context` mesh axis and
# runs exact ring attention inside the LLM's training forward
# (spider_tpu/ops/ring_attention.py; wired by runners/runner.py when
# run.mesh declares context > 1). Tested end-to-end on the virtual
# 8-device mesh by tests/test_runner.py::test_runner_context_parallel.

model = dict(
    type="spider",
    preset="tiny",      # swap for preset="full" with converted checkpoints
    lora_r=32,
    max_context_len=2048,   # 4x the demo config — CP removes the ceiling
)

_ib = dict(image_size=28, synthetic_size=32, num_clips=2, num_mels=16,
           target_length=20, sam_size=64)

datasets = dict(
    i2t_cc_sbu=dict(batch_size=2, sample_ratio=1.0, build_info=dict(_ib)),
    t2i_ts_cc_sbu=dict(batch_size=2, sample_ratio=2.0,
                       build_info=dict(_ib)),
)

run = dict(
    task="image_text_pretrain",
    lr_sched="linear_warmup_cosine_lr",
    init_lr=1e-4,
    min_lr=8e-5,
    warmup_steps=100,
    weight_decay=0.05,
    max_epoch=1,
    iters_per_epoch=4,
    seed=42,
    output_dir="output/spider_longctx",
    # dp x cp: sequence shards over `context`, batch over `data`.
    mesh=dict(data=2, context=4),
    amp=True,
)
