"""Shared absl flag definitions — names mirror the reference CLI exactly.

(ref: flag definitions scattered across train.py / eval.py / inference.py /
frame_level_models.py / video_level_models.py; SURVEY.md §5.6.)  Users of the
reference can reuse their command lines: ``--model=NetVLADModelLF
--frame_features=True --feature_names="rgb,audio" --feature_sizes="1024,128"
--netvlad_cluster_size=256 ...``.

Flags are bridged into frozen dataclasses (config.py) so everything under jit
stays hashable/static.
"""

from __future__ import annotations

from absl import flags

from learnablepoolingmethods_tpu.config import FeatureConfig, ModelConfig, TrainingConfig

FLAGS = flags.FLAGS


def define_int8_hidden_flag():
    """--int8_hidden is consumed by eval, inference, AND serving (each can
    be imported in one process, e.g. by the test suite), so the single
    definition lives here behind a define-once guard — per-CLI copies had
    already drifted their help text (review finding)."""
    if "int8_hidden" not in flags.FLAGS:
        flags.DEFINE_bool(
            "int8_hidden",
            False,
            "With the fused forward (--fast_infer/--fast_forward/"
            "--fast_serve) on the giant-hidden-FC models (NetVLADModelLF, "
            "AttentionNetVLADModel, NetFVModelLF, NetRVLADModelLF): store "
            "the hidden FC "
            "weight int8 (per-column scales, convert fused into the dot by "
            "XLA — ops/int8_matmul.py). ~1.8x on the HBM-bound FC stage, "
            "+14% e2e at B=256; |dGAP| inside the 1e-3 budget (BASELINE.md).",
        )


def define_data_flags():
    flags.DEFINE_string(
        "feature_names", "mean_rgb,mean_audio", "Name of the feature columns."
    )
    flags.DEFINE_string(
        "feature_sizes", "1024,128", "Length of the feature vectors."
    )
    flags.DEFINE_bool(
        "frame_features",
        False,
        "If true, input is tf.SequenceExample frame-level features; "
        "otherwise video-level tf.Example.",
    )
    flags.DEFINE_integer("max_frames", 300, "Frame pad/truncate length.")
    flags.DEFINE_integer("num_classes", 3862, "Vocabulary size.")
    flags.DEFINE_integer(
        "num_readers", 8, "How many threads to use for reading input files."
    )
    flags.DEFINE_bool(
        "use_grain",
        False,
        "Read input through the grain DataLoader (random-access TFRecord "
        "source, deterministic global shuffle, multi-host sharding) instead "
        "of the streaming Python reader.",
    )
    flags.DEFINE_integer(
        "grain_worker_count",
        0,
        "grain worker processes (0 = parse in-process).",
    )
    flags.DEFINE_string(
        "packed_cache_dir",
        "",
        "Pre-parse the TFRecords once into memmapped packed arrays here and "
        "read batches from the cache (data/packed_cache.py) — removes proto "
        "parsing from the hot path entirely.",
    )


def define_model_flags():
    flags.DEFINE_string("model", "LogisticModel", "Which model class to use.")
    flags.DEFINE_string(
        "video_level_classifier_model",
        "MoeModel",
        "Video-level classifier used by frame-level models.",
    )
    # MoE
    flags.DEFINE_integer("moe_num_mixtures", 2, "Mixtures per class for MoeModel.")
    flags.DEFINE_float("moe_l2", 1e-8, "L2 penalty for MoeModel.")
    # frame sampling
    flags.DEFINE_integer("iterations", 30, "Number of frames to sample per video.")
    flags.DEFINE_bool(
        "sample_random_frames",
        True,
        "If true sample random frames (with replacement); else a random window.",
    )
    # DBoF
    flags.DEFINE_integer("dbof_cluster_size", 8192, "DBoF projection size.")
    flags.DEFINE_integer("dbof_hidden_size", 1024, "DBoF hidden size.")
    flags.DEFINE_string("dbof_pooling_method", "max", "DBoF pooling: max|average.")
    flags.DEFINE_bool("dbof_add_batch_norm", True, "BN in DBoF.")
    # NetVLAD family
    flags.DEFINE_integer("netvlad_cluster_size", 256, "NetVLAD clusters (rgb).")
    flags.DEFINE_integer("netvlad_hidden_size", 1024, "NetVLAD hidden size.")
    flags.DEFINE_bool("netvlad_add_batch_norm", True, "BN in NetVLAD models.")
    flags.DEFINE_bool("netvlad_relu", False, "relu6 after the hidden layer.")
    flags.DEFINE_integer(
        "netvlad_dimred", -1, "Learned input dim-reduction width (-1 = off)."
    )
    flags.DEFINE_bool("gating", True, "Context gating before the classifier.")
    flags.DEFINE_bool("gating_remove_diag", False, "Zero the gating diagonal.")
    flags.DEFINE_integer("fv_cluster_size", 64, "NetFV clusters.")
    flags.DEFINE_integer("fv_hidden_size", 1024, "NetFV hidden size.")
    flags.DEFINE_bool("fv_relu", False, "relu6 in NetFV tail.")
    flags.DEFINE_bool("fv_couple_weights", False, "Couple FV covar to clusters.")
    flags.DEFINE_float("fv_coupling_factor", 0.01, "FV coupling factor.")
    flags.DEFINE_integer("dbow_cluster_size", 4096, "SoftDBoW clusters.")
    flags.DEFINE_integer("rvlad_cluster_size", 256, "NetRVLAD clusters.")
    # NeXtVLAD (rebuild bonus, arXiv:1811.05014)
    flags.DEFINE_integer("nextvlad_cluster_size", 128, "NeXtVLAD clusters.")
    flags.DEFINE_integer("nextvlad_groups", 8, "NeXtVLAD attention groups.")
    flags.DEFINE_integer("nextvlad_expansion", 2, "NeXtVLAD expansion λ.")
    flags.DEFINE_integer("nextvlad_hidden_size", 1024, "NeXtVLAD hidden FC.")
    # RNN
    flags.DEFINE_integer("lstm_cells", 1024, "LSTM cells per layer.")
    flags.DEFINE_integer("lstm_layers", 2, "LSTM layers.")
    flags.DEFINE_integer("gru_cells", 1024, "GRU cells per layer.")
    flags.DEFINE_integer("gru_layers", 2, "GRU layers.")
    # attention / transformer
    flags.DEFINE_integer("attention_heads", 8, "Attention heads.")
    flags.DEFINE_integer("attention_hidden_size", 1024, "Attention model width.")
    flags.DEFINE_integer("transformer_layers", 2, "Transformer encoder depth.")
    flags.DEFINE_integer("transformer_ff_size", 2048, "Transformer FFN width.")
    flags.DEFINE_integer("attention_cluster_size", 64, "Attention pooling slots.")
    flags.DEFINE_float("attention_dropout", 0.1, "Attention dropout rate.")
    # numerics (rebuild-only)
    flags.DEFINE_string(
        "compute_dtype", "float32", "Model compute dtype: float32|bfloat16."
    )
    flags.DEFINE_bool(
        "fused_train_aggregation",
        False,
        "Custom-VJP Pallas aggregation for NetVLAD/NetRVLAD training (TPU).",
    )
    flags.DEFINE_bool(
        "l2_reg_all_kernels",
        False,
        "Apply the L2 penalty to every matrix param instead of only the "
        "classifier-head kernels (reference regularizes heads only).",
    )


def define_training_flags():
    flags.DEFINE_integer("batch_size", 1024, "Videos per training batch.")
    flags.DEFINE_integer(
        "num_gpu",
        1,
        "Accepted for reference CLI compatibility and ignored: data "
        "parallelism spans every visible device via the jax.sharding mesh "
        "(the reference's tf.split GPU towers — SURVEY.md §2.4).",
    )
    flags.DEFINE_integer(
        "model_parallelism",
        1,
        "Shard large weight matrices' output axis over this many devices "
        "(the 285M-param NetVLAD hidden FC; parallel/mesh.py#shard_params). "
        "devices = dcn × data × model.",
    )
    flags.DEFINE_integer(
        "dcn_parallelism",
        1,
        "Leading multi-slice mesh axis: batch shards over (dcn, data); "
        "gradient all-reduce rides ICI within a slice, one DCN hop across.",
    )
    flags.DEFINE_string("label_loss", "CrossEntropyLoss", "Loss class name.")
    flags.DEFINE_float(
        "regularization_penalty", 1.0, "Multiplier on the regularization loss."
    )
    flags.DEFINE_float("base_learning_rate", 0.01, "Initial learning rate.")
    flags.DEFINE_float(
        "learning_rate_decay",
        0.95,
        "Decay rate applied every learning_rate_decay_examples.",
    )
    flags.DEFINE_float(
        "learning_rate_decay_examples",
        4000000,
        "Examples between learning-rate decays.",
    )
    flags.DEFINE_integer("num_epochs", 5, "Training epochs over the data.")
    flags.DEFINE_integer("max_steps", 0, "Stop after this many steps (0=∞).")
    flags.DEFINE_integer(
        "export_model_steps", 1000, "Export the model every N steps."
    )
    flags.DEFINE_string("optimizer", "AdamOptimizer", "Optimizer class name.")
    flags.DEFINE_float("clip_gradient_norm", 1.0, "Per-gradient norm clip.")
    flags.DEFINE_integer(
        "save_checkpoint_every_n_steps", 1000, "Checkpoint cadence in steps."
    )
    flags.DEFINE_integer(
        "keep_checkpoint_max", 0, "Max checkpoints to keep (0 = all)."
    )
    flags.DEFINE_integer("log_every_n_steps", 10, "Steps between log lines.")
    flags.DEFINE_integer("seed", 0, "PRNG seed.")
    flags.DEFINE_bool(
        "use_remat", False, "Rematerialize the forward pass in backward."
    )
    flags.DEFINE_bool(
        "adam_bf16_momentum", False, "Store Adam's first moment in bfloat16."
    )
    flags.DEFINE_bool(
        "presample_frames",
        False,
        "Sample frames in uint8 space before dequantize+normalize in the "
        "train step (sampling models: DBoF/NetVLAD/NeXtVLAD families). "
        "Mathematically identical reordering; cuts the input stage by "
        "300/iterations.",
    )
    flags.DEFINE_bool(
        "bf16_params",
        False,
        "Store model params in bfloat16 with an fp32 master copy in the "
        "optimizer (halves fwd/bwd weight + grad HBM traffic; Adam math "
        "stays fp32 on the master).",
    )
    flags.DEFINE_integer(
        "grad_accum_steps",
        1,
        "Microbatches accumulated per optimizer step. Peak activation "
        "memory scales with batch_size/grad_accum_steps, so effective "
        "batches past the single-pass activation OOM fit (remat measured "
        "a loss on this family — BASELINE.md; accumulation is the lever). "
        "batch_size must be divisible by this. Note: BatchNorm statistics "
        "and frame sampling are per-microbatch, the standard accumulation "
        "semantics.",
    )
    flags.DEFINE_bool(
        "fused_adam",
        False,
        "HBM-floor Adam: bf16 params updated with stochastic rounding (no "
        "fp32 master) and a stochastically-rounded bf16 second moment "
        "(ops/fused_adam.py; one fused elementwise pass, ~1.3x the optax "
        "update). Implies --bf16_params storage and shards with the params.",
    )


def feature_config_from_flags() -> FeatureConfig:
    return FeatureConfig.from_flag_strings(
        FLAGS.feature_names,
        FLAGS.feature_sizes,
        FLAGS.frame_features,
        FLAGS.max_frames,
    )


def model_config_from_flags() -> ModelConfig:
    return ModelConfig(
        vocab_size=FLAGS.num_classes,
        param_dtype=(
            "bfloat16" if (FLAGS.bf16_params or FLAGS.fused_adam) else "float32"
        ),
        moe_num_mixtures=FLAGS.moe_num_mixtures,
        moe_l2=FLAGS.moe_l2,
        iterations=FLAGS.iterations,
        sample_random_frames=FLAGS.sample_random_frames,
        dbof_cluster_size=FLAGS.dbof_cluster_size,
        dbof_hidden_size=FLAGS.dbof_hidden_size,
        dbof_pooling_method=FLAGS.dbof_pooling_method,
        dbof_add_batch_norm=FLAGS.dbof_add_batch_norm,
        netvlad_cluster_size=FLAGS.netvlad_cluster_size,
        netvlad_hidden_size=FLAGS.netvlad_hidden_size,
        netvlad_add_batch_norm=FLAGS.netvlad_add_batch_norm,
        netvlad_relu=FLAGS.netvlad_relu,
        netvlad_dimred=FLAGS.netvlad_dimred,
        gating=FLAGS.gating,
        gating_remove_diag=FLAGS.gating_remove_diag,
        fv_cluster_size=FLAGS.fv_cluster_size,
        fv_hidden_size=FLAGS.fv_hidden_size,
        fv_relu=FLAGS.fv_relu,
        fv_couple_weights=FLAGS.fv_couple_weights,
        fv_coupling_factor=FLAGS.fv_coupling_factor,
        dbow_cluster_size=FLAGS.dbow_cluster_size,
        rvlad_cluster_size=FLAGS.rvlad_cluster_size,
        nextvlad_cluster_size=FLAGS.nextvlad_cluster_size,
        nextvlad_groups=FLAGS.nextvlad_groups,
        nextvlad_expansion=FLAGS.nextvlad_expansion,
        nextvlad_hidden_size=FLAGS.nextvlad_hidden_size,
        lstm_cells=FLAGS.lstm_cells,
        lstm_layers=FLAGS.lstm_layers,
        gru_cells=FLAGS.gru_cells,
        gru_layers=FLAGS.gru_layers,
        attention_heads=FLAGS.attention_heads,
        attention_hidden_size=FLAGS.attention_hidden_size,
        transformer_layers=FLAGS.transformer_layers,
        transformer_ff_size=FLAGS.transformer_ff_size,
        attention_cluster_size=FLAGS.attention_cluster_size,
        attention_dropout=FLAGS.attention_dropout,
        video_level_classifier_model=FLAGS.video_level_classifier_model,
        compute_dtype=FLAGS.compute_dtype,
        fused_train_aggregation=FLAGS.fused_train_aggregation,
        l2_reg_all_kernels=FLAGS.l2_reg_all_kernels,
    )


def training_config_from_flags() -> TrainingConfig:
    return TrainingConfig(
        batch_size=FLAGS.batch_size,
        base_learning_rate=FLAGS.base_learning_rate,
        learning_rate_decay=FLAGS.learning_rate_decay,
        learning_rate_decay_examples=int(FLAGS.learning_rate_decay_examples),
        optimizer=FLAGS.optimizer,
        clip_gradient_norm=FLAGS.clip_gradient_norm,
        regularization_penalty=FLAGS.regularization_penalty,
        label_loss=FLAGS.label_loss,
        num_epochs=FLAGS.num_epochs,
        max_steps=FLAGS.max_steps,
        export_model_steps=FLAGS.export_model_steps,
        save_checkpoint_every_n_steps=FLAGS.save_checkpoint_every_n_steps,
        keep_checkpoint_max=FLAGS.keep_checkpoint_max,
        use_remat=FLAGS.use_remat,
        adam_bf16_momentum=FLAGS.adam_bf16_momentum,
        # fused_adam keeps no fp32 master (stochastic rounding replaces it)
        fp32_master=FLAGS.bf16_params and not FLAGS.fused_adam,
        presample_frames=FLAGS.presample_frames,
        fused_adam=FLAGS.fused_adam,
        grad_accum_steps=FLAGS.grad_accum_steps,
    )


def make_reader(fcfg: FeatureConfig, num_classes: int):
    from learnablepoolingmethods_tpu.data.readers import (
        YT8MAggregatedFeatureReader,
        YT8MFrameFeatureReader,
    )

    if fcfg.frame_features:
        return YT8MFrameFeatureReader(
            num_classes=num_classes,
            feature_sizes=fcfg.feature_sizes,
            feature_names=fcfg.feature_names,
            max_frames=fcfg.max_frames,
        )
    return YT8MAggregatedFeatureReader(
        num_classes=num_classes,
        feature_sizes=fcfg.feature_sizes,
        feature_names=fcfg.feature_names,
    )


def input_iterator(
    data_pattern: str,
    batch_size: int,
    num_epochs,
    shuffle: bool = False,
    seed: int = 0,
    shard_by_process: bool = False,
):
    """Flag-dispatched batch iterator: ``--use_grain`` → grain DataLoader,
    otherwise the streaming Python reader (data/pipeline.py).  Both emit the
    same batch schema; grain's final partial batch is zero-padded to
    ``batch_size`` with a weights mask so shapes stay XLA-static."""
    import jax

    from learnablepoolingmethods_tpu.data import pipeline
    from learnablepoolingmethods_tpu.parallel import mesh as mesh_lib

    fcfg = feature_config_from_flags()
    if FLAGS.packed_cache_dir and FLAGS.use_grain:
        raise ValueError("--packed_cache_dir and --use_grain are exclusive")
    if FLAGS.packed_cache_dir:
        from learnablepoolingmethods_tpu.data import packed_cache

        if jax.process_count() > 1 and jax.process_index() != 0:
            # only process 0 builds; concurrent builders into one dir corrupt
            # the arrays — the rest wait for the completed meta.json
            cache_dir = packed_cache.wait_for_cache(
                FLAGS.packed_cache_dir, data_pattern
            )
        else:
            cache_dir = packed_cache.build_cache(
                data_pattern,
                FLAGS.packed_cache_dir,
                frame_level=fcfg.frame_features,
                feature_sizes=fcfg.feature_sizes,
                feature_names=fcfg.feature_names,
                num_classes=FLAGS.num_classes,
                max_frames=fcfg.max_frames,
                num_workers=FLAGS.num_readers,
            )
        return packed_cache.packed_batch_iterator(
            cache_dir,
            batch_size,
            num_epochs=num_epochs,
            shuffle=shuffle,
            seed=seed,
            shard_index=jax.process_index() if shard_by_process else 0,
            num_shards=jax.process_count() if shard_by_process else 1,
        )
    if FLAGS.use_grain:
        from learnablepoolingmethods_tpu.data.grain_pipeline import (
            grain_batch_iterator,
        )

        def gen():
            for b in grain_batch_iterator(
                data_pattern,
                batch_size,
                fcfg.frame_features,
                num_epochs=num_epochs,
                shuffle=shuffle,
                seed=seed,
                worker_count=FLAGS.grain_worker_count,
                shard_by_process=shard_by_process,
                feature_sizes=fcfg.feature_sizes,
                feature_names=fcfg.feature_names,
                num_classes=FLAGS.num_classes,
                max_frames=fcfg.max_frames,
            ):
                yield mesh_lib.pad_batch_to_multiple(b, batch_size)

        return gen()

    reader = make_reader(fcfg, FLAGS.num_classes)
    return pipeline.batch_iterator(
        reader,
        data_pattern,
        batch_size,
        num_epochs=num_epochs,
        shuffle=shuffle,
        seed=seed,
        shard_index=jax.process_index() if shard_by_process else 0,
        num_shards=jax.process_count() if shard_by_process else 1,
    )


def get_loss_by_name(name: str):
    from learnablepoolingmethods_tpu import losses as losses_mod

    cls = getattr(losses_mod, name, None)
    if cls is None:
        raise ValueError(f"Unknown label_loss {name!r}")
    return cls()
