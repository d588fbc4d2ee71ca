"""Configuration system.

Replaces the reference's argparse Namespace + YAML overlay
(`opts.py:10-163`, `main.py:523-526`, `misc/utils.py:50-55`) with a
typed dataclass.  Field names intentionally match the reference CLI
flags so that reference YAML config files (e.g.
`cfgs/anet_res101_vg_feat_10x100prop.yml`) load unchanged.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class GVDConfig:
    # ---- data input (opts.py:13-28) ----
    path_opt: Optional[str] = None
    dataset: str = "anet"
    input_json: str = ""
    input_dic: str = ""
    image_path: str = ""
    proposal_h5: str = ""
    feature_root: str = ""
    seg_feature_root: str = ""
    glove_file: str = ""  # path to glove.6B.300d.txt (optional; deterministic fallback if "")
    data_path: str = "data"
    num_workers: int = 0
    # pack-once ingest cache: when set, each split's fully-packed batch
    # arrays are written here once and memmapped thereafter — segments
    # become pure page-cache memcpy instead of npy parse + pack
    # (docs/DESIGN.md §Ingest; eval feeds need ~an order of magnitude
    # more assembly throughput than train feeds)
    packed_cache_dir: str = ""

    # ---- model dims (opts.py:38-64) ----
    rnn_size: int = 1024
    num_layers: int = 1
    input_encoding_size: int = 512
    att_hid_size: int = 512
    fc_feat_size: int = 3072      # rgb_feat_size + motion_feat_size
    rgb_feat_size: int = 2048
    motion_feat_size: int = 1024
    att_feat_size: int = 2048
    t_attn_size: int = 480
    num_sampled_frm: int = 10
    num_prop_per_frm: int = 100
    prop_thresh: float = 0.2
    glove_dim: int = 300
    loc_encoding_size: int = 300   # loc_fc output width (model.py:75)
    seg_info_size: int = 50

    att_model: str = "topdown"          # topdown | transformer
    att_input_mode: str = "both"        # both | featmap | region | dual_region
    t_attn_mode: str = "bigru"          # bilstm | bigru
    transfer_mode: str = "cls"          # none | cls | glove | both
    region_attn_mode: str = "mix"       # dp | add | cat | mix | mix_mul

    enable_BUTD: bool = False
    obj_interact: bool = False
    exclude_bgd_det: bool = False

    # ---- loss weights (opts.py:70-73) ----
    w_att2: float = 0.0
    w_grd: float = 0.0
    w_cls: float = 0.0
    disable_caption: bool = False

    # ---- optimization (opts.py:76-108) ----
    max_epochs: int = 40
    batch_size: int = 10
    grad_clip: float = 0.1
    drop_prob_lm: float = 0.5
    seq_per_img: int = 1
    seq_length: int = 20
    loc_drop: float = 0.5   # loc_fc dropout (nn.Dropout default, model.py:75-77)
    enc_drop: float = 0.2   # context-enc / obj_interact dropout (model.py:128-148)
    beam_size: int = 1
    optim: str = "adam"                 # sgd | adam | adamax
    learning_rate: float = 5e-4
    learning_rate_decay_start: int = 1
    learning_rate_decay_every: int = 3
    learning_rate_decay_rate: float = 0.8
    optim_alpha: float = 0.9
    optim_beta: float = 0.999
    optim_epsilon: float = 1e-8
    weight_decay: float = 0.0
    finetune_lr_scale: float = 0.1      # ctx2pool_grd / vis_embed param-group LR (main.py:660-669)

    # ---- session / checkpointing (opts.py:111-155) ----
    start_from: Optional[str] = None
    id: str = ""
    train_split: str = "training"
    val_split: str = "validation"
    inference_only: bool = False
    densecap_references: List[str] = field(default_factory=lambda: [
        "./data/anet/anet_entities_val_1.json",
        "./data/anet/anet_entities_val_2.json",
    ])
    densecap_verbose: bool = False
    grd_reference: str = "tools/anet_entities/data/anet_entities_cleaned_class_thresh50_trainval.json"
    split_file: str = "tools/anet_entities/data/split_ids_anet_entities.json"
    eval_obj_grounding_gt: bool = False
    eval_obj_grounding: bool = False
    vis_attn: bool = False
    val_images_use: int = -1
    val_every_epoch: int = 2
    checkpoint_path: str = "save"
    language_eval: bool = False
    load_best_score: int = 1
    disp_interval: int = 100
    losses_log_every: int = 10
    det_oracle: bool = False
    frm_oracle: bool = False
    seed: int = 123

    # ---- TPU-native execution (new; no reference equivalent) ----
    dtype: str = "float32"              # compute dtype: float32 | bfloat16
    use_pallas: bool = False            # fused Pallas kernels for hot attention ops
    # fused Pallas recurrence for the temporal BiGRU/BiLSTM encoder at
    # INFERENCE (training keeps the differentiable scan): measured
    # 1.22x the XLA scan on v5e (docs/DESIGN.md); auto-disabled off-TPU
    use_pallas_rnn: bool = True
    # fused flash self-attention for the obj_interact region encoder
    # at INFERENCE.  Default OFF: measured 74.9 vs 61.4 ms encode on
    # v5e — the (batch*heads) grid of whole-K VMEM steps pays more in
    # per-step overhead than it saves in score traffic; XLA's batched
    # per-head einsums win (docs/DESIGN.md).  Kept as contingency.
    use_pallas_mha: bool = False
    # fused whole-ENCODER-LAYER kernel for obj_interact at INFERENCE
    # (ops/pallas/encoder_layer.py): QKV + per-head attention + out
    # proj + both post-LN residual blocks in ONE pallas_call per
    # layer; (R, R) scores never reach HBM.  Tiles over BATCH only —
    # the round-2 flash-MHA kernel's 1200 tiny (batch*head) grid steps
    # were its downfall (use_pallas_mha above).  Default ON: measured
    # 1.30x the XLA encoder (greedy 1406 -> 1568 caps/s) and inside
    # the bf16 precision envelope (docs/DESIGN.md §bf16 kernel
    # promotion policy); auto-disabled off-TPU and in training.
    use_pallas_encoder: bool = True
    # fused encoder-layer kernel for obj_interact in TRAINING
    # (ops/pallas/encoder_layer_train.py): hand fwd+bwd with in-kernel
    # counter-hash dropout regenerated in the backward — the (B, R, R)
    # prob tensors and their masks never reach HBM as autodiff
    # residuals.  Gradients pinned to a pure-JAX oracle with the exact
    # same masks (tests/test_pallas_train.py).  Default set by
    # hardware measurement (docs/DESIGN.md); auto-disabled off-TPU.
    use_pallas_encoder_train: bool = False
    # fused greedy-decode megakernel (ops/pallas/decode_scan.py): the
    # whole 20-step decode (both LSTM cells, temporal + region
    # attention, logit + UNK-suppressed argmax, next-token embedding)
    # as ONE pallas_call, attention banks resident in VMEM across
    # steps — the XLA scan re-reads ~450 MB of banks from HBM per
    # step (its ~11 ms floor at eval flagship dims).  Applies to the
    # topdown family, att_input_mode 'both', additive region attention,
    # sample_max greedy; auto-falls-back to the scan elsewhere.
    # Default set by hardware measurement (docs/DESIGN.md).
    use_pallas_decode: bool = False
    # attention schedule for obj_interact in TRAINING
    # (ops/pallas/attention_train.py): "xla" (batched einsums + rbg
    # dropout), "pallas" (fused fwd+bwd per-(row, head) attention
    # primitive with in-kernel hash dropout — probs/masks never reach
    # HBM in either pass), or "hybrid" (XLA fwd, Pallas bwd).  This is
    # the structural redesign of the whole-layer train kernel whose
    # backward VMEM-OOMed (docs/DESIGN.md §Training fused
    # encoder-layer kernel); default set by hardware measurement.
    # Auto-falls-back to "xla" off-TPU.
    attn_train_impl: str = "xla"
    quantize_banks: bool = False        # int8 attention banks at decode time
    # int8 scale granularity: columns per abs-max scale group (0 = one
    # scale per row, the round-2 scheme).  128 measured-better at
    # trained weights (QUANTIZE_REPORT.json) but both miss the 0.99
    # promotion bar — docs/DESIGN.md §int8 granularity closure.
    quantize_group_size: int = 128
    # PRNG implementation for the TRAINING dropout stream ("rbg" |
    # "threefry").  Default rbg: XLA's hardware RngBitGenerator draws
    # the large (B, R, R) attention-prob dropout masks ~2.8x faster
    # than threefry on v5e — measured 55.8 -> 36.1 ms per obj_interact
    # microbatch fwd+bwd, ~12% of the whole train step
    # (tools/ablate_objattn.py, docs/DESIGN.md).  Same Bernoulli
    # statistics, different stream; the reference's torch RNG stream
    # was never matched, so this is not a parity deviation.  Param
    # INIT always uses threefry (reproducibility across impls).
    rng_impl: str = "rbg"
    mesh_shape: Optional[List[int]] = None   # e.g. [8] for pure DP, [4, 2] for DP x TP
    mesh_axes: List[str] = field(default_factory=lambda: ["data"])
    # pad the logit head's output width to a multiple of this so the
    # tensor-parallel 'model' axis divides it (ANet vocab 4905 is odd);
    # pad columns are masked to MIN_VALUE before log_softmax, so the
    # distribution over real words is bit-identical to the unpadded head
    vocab_pad_to: int = 1
    donate_buffers: bool = True
    # split each train batch into this many sequential microbatches and
    # accumulate gradients (lax.scan) — fits the reference's global
    # batch 240 (main.py:556, 30/GPU x 8) on one chip.  Loss terms are
    # renormalized by global mask counts, so the update is exactly the
    # full-batch gradient (see Trainer.make_train_step).
    grad_accum: int = 1
    remat: bool = True          # jax.checkpoint the decode scan + obj_interact in training (memory for FLOPs)
    # decode-scan TRAIN schedule (round-4 hardware sweep,
    # docs/DESIGN.md §Decode-scan training bucket): checkpointing the
    # scan body kills the 20 steps' (sb, R, att_hid) attention
    # residual stores, and unrolling the rematerialized scan lets XLA
    # fuse across steps — measured together 15.66 vs 27.61 ms per
    # microbatch fwd+bwd (-43%); either alone is far weaker (remat
    # 25.34, unroll8-no-remat 35.42).  Independent of the whole-model
    # `remat` flag (which also checkpoints encode — a measured LOSS
    # at microbatch 30).
    decode_scan_remat: bool = True
    decode_scan_unroll: int = 8
    # temporal BiRNN (context_enc) scan schedule — same remat/unroll
    # trade, swept on hardware by tools/ablate_temporal.py: the BiGRU
    # is ~94% of the temporal train bucket, and body-remat + unroll 8
    # measured 16.84 vs 18.37 ms/microbatch fwd+bwd (unroll 16/32 add
    # nothing).  unroll applies to inference too (XLA-scan path);
    # remat only affects training (which residuals autodiff stores).
    birnn_remat: bool = True
    birnn_unroll: int = 8
    # selective remat of ONLY the (B, R, R) obj_interact attention
    # probs (scores/softmax/dropout-mask tagged "attn_probs" in
    # models/transformer.py, recomputed in the backward via a
    # names-based checkpoint policy).  Finer point than the whole-model
    # `remat` flag: recompute is one QK^T+softmax per head (~1
    # TFLOP/step) against ~28 GB/step of prob-residual HBM traffic.
    obj_interact_probs_remat: bool = False
    profile_dir: Optional[str] = None   # jax.profiler trace output
    # Host-readback sync after every train step.  Default off: the
    # on-device metric aggregation exists precisely to keep dispatch
    # ahead of the chip (engine/trainer.py fit_epoch).  Turn on when
    # the transfer client retains h2d staging buffers until forced
    # completion — the axon tunnel grew ~3.4 GB host RSS per step
    # (one un-acked batch upload each) until the OOM killer fired in
    # the round-5 integrated rehearsal; a per-step sync bounds
    # in-flight uploads to one batch.
    host_sync_every_step: bool = False
    # Run grounding-metric evals (eval_obj_grounding / _gt) with the
    # fused encoder kernel OFF: those metrics consume region-attention
    # argmaxes, where the kernel's bf16 reordering measurably moves
    # box_accu_att (-13% relative at a trained checkpoint,
    # GROUNDING_KERNEL_DELTA.json) while caption tokens stay >= 0.99.
    # Disable to keep the ~10% faster kernel eval regardless.
    pallas_encoder_grounding_guard: bool = True
    log_jsonl: Optional[str] = None     # metrics JSONL sink
    tensorboard_dir: Optional[str] = None  # optional TB scalar sink
    async_checkpoint: bool = False      # don't block on Orbax writes
    # multi-host (multi-slice) initialization via jax.distributed —
    # DCN coordination; single-host runs leave these at defaults
    coordinator_address: Optional[str] = None
    num_processes: int = 1
    process_id: int = 0

    # ---- populated from the dataset at build time (main.py:599-613) ----
    vocab_size: int = 0
    detect_size: int = 0
    unk_idx: int = -1       # -1 -> vocab_size - 1 (UNK appended last)
    max_gt_box: int = 100
    test_mode: bool = False

    # -------------------------------------------------------------- #

    @property
    def max_proposal(self) -> int:
        return self.num_sampled_frm * self.num_prop_per_frm

    @property
    def vocab_size_padded(self) -> int:
        """Logit-head width: vocab_size rounded up to vocab_pad_to."""
        m = max(self.vocab_pad_to, 1)
        return ((self.vocab_size + m - 1) // m) * m

    @property
    def fc_feat_size_full(self) -> int:
        """fc feature + 4-dim segment-info embedding (model.py:38-39)."""
        return self.fc_feat_size + self.seg_info_size

    @property
    def vis_encoding_size(self) -> int:
        """Visual-word embedding width per transfer mode (model.py:84-91)."""
        if self.transfer_mode in ("none", "cls"):
            return self.att_feat_size
        if self.transfer_mode == "both":
            return self.att_feat_size + self.glove_dim
        if self.transfer_mode == "glove":
            return self.glove_dim
        raise NotImplementedError(self.transfer_mode)

    @property
    def pool_feat_size(self) -> int:
        """Region-feature width fed to pool_embed (model.py:65-69).

        Note: the reference hardcodes att_feat_size here, which only
        agrees with the actual concatenated width when
        vis_encoding_size == att_feat_size (transfer modes 'cls'/'none')
        — other modes would crash it.  We use the true width."""
        if self.enable_BUTD:
            return self.vis_encoding_size
        return self.vis_encoding_size + self.loc_encoding_size + self.detect_size + 1

    def validate(self) -> "GVDConfig":
        if self.enable_BUTD and self.att_input_mode != "region":
            raise ValueError("region attention only under the BUTD mode (main.py:528-529)")
        if self.att_model not in ("topdown", "transformer"):
            raise ValueError(f"unknown att_model {self.att_model!r}")
        if self.att_input_mode not in ("both", "featmap", "region", "dual_region"):
            raise ValueError(f"unknown att_input_mode {self.att_input_mode!r}")
        if self.region_attn_mode not in ("dp", "add", "cat", "mix", "mix_mul"):
            raise ValueError(f"unknown region_attn_mode {self.region_attn_mode!r}")
        if self.transfer_mode not in ("none", "cls", "glove", "both"):
            raise ValueError(f"unknown transfer_mode {self.transfer_mode!r}")
        if self.t_attn_mode not in ("bilstm", "bigru"):
            raise ValueError(f"unknown t_attn_mode {self.t_attn_mode!r}")
        if self.rng_impl not in ("rbg", "threefry"):
            raise ValueError(f"unknown rng_impl {self.rng_impl!r}")
        if self.fc_feat_size != self.rgb_feat_size + self.motion_feat_size:
            raise ValueError("fc_feat_size must equal rgb_feat_size + motion_feat_size")
        if self.grad_accum < 1:
            raise ValueError("grad_accum must be >= 1")
        if self.batch_size % self.grad_accum:
            raise ValueError(
                f"batch_size {self.batch_size} must be divisible by "
                f"grad_accum {self.grad_accum}")
        return self

    # ------------------------------------------------------------------ #

    def replace(self, **kw) -> "GVDConfig":
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_yaml(cls, path: str, **overrides) -> "GVDConfig":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        known = {f.name for f in dataclasses.fields(cls)}
        cfg_kw = {k: v for k, v in raw.items() if k in known and v is not None}
        cfg_kw.update(overrides)
        return cls(**cfg_kw)

    @classmethod
    def from_cli(cls, argv: Optional[List[str]] = None) -> "GVDConfig":
        """Parse CLI flags named after the dataclass fields, then overlay
        the YAML pointed at by --path_opt (same precedence as the
        reference: YAML values override CLI-supplied defaults, explicit
        CLI flags override both)."""
        parser = argparse.ArgumentParser(prog="gvd-tpu")
        for f in dataclasses.fields(cls):
            name = "--" + f.name
            if f.type in ("bool", bool):
                # --flag / --no-flag: default-True fields (remat,
                # donate_buffers) must be disableable from the CLI
                parser.add_argument(name,
                                    action=argparse.BooleanOptionalAction,
                                    default=None)
            elif f.name in ("densecap_references", "mesh_shape", "mesh_axes"):
                parser.add_argument(name, type=str, nargs="+", default=None)
            else:
                typ = {int: int, float: float}.get(f.type, str)
                if f.type in ("int", int):
                    typ = int
                elif f.type in ("float", float):
                    typ = float
                else:
                    typ = str
                parser.add_argument(name, type=typ, default=None)
        args = parser.parse_args(argv)
        explicit = {k: v for k, v in vars(args).items() if v is not None}
        if "mesh_shape" in explicit:
            explicit["mesh_shape"] = [int(x) for x in explicit["mesh_shape"]]

        cfg = cls()
        path_opt = explicit.get("path_opt", cfg.path_opt)
        if path_opt:
            cfg = cls.from_yaml(path_opt)
        cfg = cfg.replace(**{k: v for k, v in explicit.items()
                             if k in {f.name for f in dataclasses.fields(cls)}})
        cfg = cfg.replace(test_mode=cfg.val_split in ("testing", "hidden_test"))
        return cfg.validate()


def tiny_test_config(**overrides) -> GVDConfig:
    """A small config used by the test-suite and synthetic benchmarks."""
    base = dict(
        rnn_size=64,
        input_encoding_size=32,
        att_hid_size=32,
        fc_feat_size=48,
        rgb_feat_size=32,
        motion_feat_size=16,
        att_feat_size=24,
        t_attn_size=16,
        num_sampled_frm=4,
        num_prop_per_frm=5,
        glove_dim=12,
        loc_encoding_size=16,
        seg_info_size=8,
        seq_length=8,
        seq_per_img=1,
        batch_size=2,
        vocab_size=50,
        detect_size=10,
        max_gt_box=6,
        drop_prob_lm=0.0,
        loc_drop=0.0,
        enc_drop=0.0,
    )
    base.update(overrides)
    return GVDConfig(**base).validate()
