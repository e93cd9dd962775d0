# Full any-to-many training config — the analogue of the reference's
# production blob (train_configs/spider_demo_train.py with all dataset
# families; paths are placeholders, synthetic twins run when absent).

model = dict(
    type="spider",
    preset="tiny",     # swap for a converted-checkpoint preset in production
    lora_r=32,
    max_context_len=500,
)

_ib = dict(image_size=28, synthetic_size=32, num_clips=2, num_mels=16,
           target_length=20, sam_size=64)

datasets = dict(
    # X -> T
    i2t_cc_sbu=dict(batch_size=1, sample_ratio=1.0, build_info=dict(_ib)),
    v2t_webvid=dict(batch_size=1, sample_ratio=1.0, build_info=dict(_ib)),
    a2t_audiocap=dict(batch_size=1, sample_ratio=1.0, build_info=dict(_ib)),
    # T -> X
    t2i_cc_sbu=dict(batch_size=1, sample_ratio=2.0, build_info=dict(_ib)),
    t2v_webvid=dict(batch_size=1, sample_ratio=2.0, build_info=dict(_ib)),
    t2a_audiocap=dict(batch_size=1, sample_ratio=2.0, build_info=dict(_ib)),
    # T -> Ts (any-to-many)
    t2i_ts_cc_sbu=dict(batch_size=1, sample_ratio=2.0, build_info=dict(_ib)),
    t2v_ts_webvid=dict(batch_size=1, sample_ratio=2.0, build_info=dict(_ib)),
    t2a_ts_audiocap=dict(batch_size=1, sample_ratio=2.0, build_info=dict(_ib)),
    t2v_ts_mul_webvid=dict(batch_size=1, sample_ratio=1.0, build_info=dict(_ib)),
    t2v_ts_spec_webvid=dict(batch_size=1, sample_ratio=1.0, build_info=dict(_ib)),
    # X -> Ts
    i2t_ts_cc_sbu=dict(batch_size=1, sample_ratio=1.0, build_info=dict(_ib)),
    v2t_ts_webvid=dict(batch_size=1, sample_ratio=1.0, build_info=dict(_ib)),
    a2t_ts_audiocap=dict(batch_size=1, sample_ratio=1.0, build_info=dict(_ib)),
    # grounding
    it2b_refcoco=dict(batch_size=1, sample_ratio=1.0, build_info=dict(_ib)),
    it2m_refcoco=dict(batch_size=1, sample_ratio=1.0, build_info=dict(_ib)),
    it2b_ts_refcoco=dict(batch_size=1, sample_ratio=0.5, build_info=dict(_ib)),
    it2m_ts_refcoco=dict(batch_size=1, sample_ratio=0.5, build_info=dict(_ib)),
    # text-only many-modal + story
    travel_guide=dict(batch_size=1, sample_ratio=0.5, build_info=dict()),
    pororo=dict(batch_size=1, sample_ratio=0.5, build_info=dict(_ib)),
    flintstones=dict(batch_size=1, sample_ratio=0.5, build_info=dict(_ib)),
)

run = dict(
    task="image_text_pretrain",
    lr_sched="warmup_decay_lr",
    init_lr=1e-4,
    min_lr=0.0,
    warmup_steps=500,
    max_epoch=1,
    iters_per_epoch=50000,
    log_freq=50,
    seed=42,
    output_dir="output/spider_train",
    accum_grad_iters=1,
    max_grad_norm=1.0,
    length_bucket=64,
)
